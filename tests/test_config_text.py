"""Reference text-ScannConfig ingestion (legacy config canonicalization,
utils/scann_config_utils.cc role; text format from scann_builder.py
create_config, scann_builder.py:385-470)."""

import math

import numpy as np
import pytest

import scann_tpu
from scann_tpu.utils import config_text as ct


def make_db(n=6000, d=32, seed=0):
    rng = np.random.default_rng(seed)
    db = rng.standard_normal((n, d)).astype(np.float32)
    return db / np.linalg.norm(db, axis=1, keepdims=True)


# The exact stanza shapes scann_builder.py emits (tree at
# scann_builder.py:163-239, score_ah at 241-320, reorder at 337-359),
# scaled down to test size.
NOTEBOOK_STYLE = """
  num_neighbors: 10
  distance_measure {distance_measure: "DotProductDistance"}
  partitioning {
    num_children: 32
    min_cluster_size: 20
    max_clustering_iterations: 8
    single_machine_center_initialization: RANDOM_INITIALIZATION
    partitioning_distance {
      distance_measure: "SquaredL2Distance"
    }
    query_spilling {
      spilling_type: FIXED_NUMBER_OF_CENTERS
      max_spill_centers: 8
    }
    expected_sample_size: 6000
    query_tokenization_distance_override {distance_measure: "DotProductDistance"}
    partitioning_type: GENERIC
    query_tokenization_type: FLOAT
  }
  hash {
    asymmetric_hash {
      lookup_type: INT8_LUT16
      use_residual_quantization: True
      use_global_topn: True
      quantization_distance {
        distance_measure: "SquaredL2Distance"
      }
      num_clusters_per_block: 16
      projection {
        input_dim: 32
        projection_type: CHUNK
        num_blocks: 16
        num_dims_per_block: 2
      }
      fixed_point_lut_conversion_options {
        float_to_int_conversion_method: ROUND
      }
      noise_shaping_threshold: 0.2
      expected_sample_size: 6000
      max_clustering_iterations: 6
    }
  }
  exact_reordering {
    approx_num_neighbors: 50
    fixed_point {
      enabled: False
      noise_shaping_threshold: nan
    }
  }
"""


def test_parse_textproto_basics():
    d = ct.parse_textproto(NOTEBOOK_STYLE)
    assert d["num_neighbors"] == 10
    assert d["distance_measure"]["distance_measure"] == "DotProductDistance"
    p = d["partitioning"]
    assert p["num_children"] == 32
    assert p["query_spilling"]["max_spill_centers"] == 8
    ah = d["hash"]["asymmetric_hash"]
    assert ah["use_residual_quantization"] is True
    assert ah["noise_shaping_threshold"] == 0.2
    assert math.isnan(
        d["exact_reordering"]["fixed_point"]["noise_shaping_threshold"])


def test_notebook_config_canonicalizes_and_searches():
    db = make_db()
    b = scann_tpu.builder_from_pbtxt(db, NOTEBOOK_STYLE)
    cfg_ = b.create_config()
    p, ah, r = (cfg_.partitioning, cfg_.asymmetric_hash,
            cfg_.reordering)
    assert p.num_leaves == 32 and p.num_leaves_to_search == 8
    assert p.min_partition_size == 20 and p.training_iterations == 8
    assert ah.dimensions_per_block == 2
    assert ah.anisotropic_quantization_threshold == 0.2
    # Residual quantization derives from tree + dot product, exactly like
    # the reference canonicalizer (scann_config_utils.cc).
    assert ah.residual_quantization
    assert r.reordering_num_neighbors == 50 and r.quantize == "float32"

    s = scann_tpu.searcher_from_pbtxt(db, NOTEBOOK_STYLE)
    q = make_db(64, 32, seed=1)
    idx, _ = s.search_batched(q)
    truth = np.argsort(-(q @ db.T), axis=1)[:, :10]
    recall = np.mean([len(set(idx[i]) & set(truth[i])) / 10
                      for i in range(len(q))])
    # Same corpus + equivalent config through the native builder.
    s2 = (scann_tpu.builder(db, 10, "dot_product")
          .tree(num_leaves=32, num_leaves_to_search=8,
                training_sample_size=6000, min_partition_size=20,
                training_iterations=8)
          .score_ah(2, anisotropic_quantization_threshold=0.2,
                    training_sample_size=6000, training_iterations=6)
          .reorder(50).build())
    idx2, _ = s2.search_batched(q)
    recall2 = np.mean([len(set(idx2[i]) & set(truth[i])) / 10
                       for i in range(len(q))])
    assert abs(recall - recall2) < 0.05, (recall, recall2)


def test_soar_and_variable_blocks():
    db = make_db(d=30)
    text = """
      num_neighbors: 10
      distance_measure {distance_measure: "DotProductDistance"}
      partitioning {
        num_children: 16
        query_spilling {
          spilling_type: FIXED_NUMBER_OF_CENTERS
          max_spill_centers: 4
        }
        expected_sample_size: 6000
        database_spilling {
          spilling_type: TWO_CENTER_ORTHOGONALITY_AMPLIFIED
          orthogonality_amplification_lambda: 1.5
          overretrieve_factor: 2.0
        }
      }
      hash {
        asymmetric_hash {
          lookup_type: INT8_LUT16
          num_clusters_per_block: 16
          projection {
            input_dim: 30
            projection_type: VARIABLE_CHUNK
            variable_blocks {
              num_blocks: 7
              num_dims_per_block: 4
            }
            variable_blocks {
              num_blocks: 1
              num_dims_per_block: 2
            }
          }
          noise_shaping_threshold: nan
          expected_sample_size: 6000
        }
      }
    """
    cfg_ = scann_tpu.builder_from_pbtxt(db, text).create_config()
    assert cfg_.partitioning.soar is not None
    assert cfg_.partitioning.soar.lambda_ == 1.5
    assert cfg_.asymmetric_hash.variable_dims_per_block == (4,) * 7 + (2,)
    s = scann_tpu.searcher_from_pbtxt(db, text)
    idx, _ = s.search_batched(make_db(8, 30, seed=2))
    assert idx.shape == (8, 10)


def test_brute_force_and_bf16_reorder():
    db = make_db(2000)
    text = """
      num_neighbors: 5
      distance_measure {distance_measure: "SquaredL2Distance"}
      brute_force {
        fixed_point {
          enabled: True
        }
      }
      exact_reordering {
        approx_num_neighbors: 30
        bfloat16 {
          enabled: True
        }
      }
    """
    cfg_ = scann_tpu.builder_from_pbtxt(db, text).create_config()
    assert cfg_.brute_force is not None
    assert cfg_.brute_force.quantize == "int8"
    assert cfg_.reordering.quantize == "bfloat16"
    s = scann_tpu.searcher_from_pbtxt(db, text)
    idx, _ = s.search_batched(make_db(4, 32, seed=3))
    assert idx.shape == (4, 5)


def test_autopilot_stanza():
    db = make_db(3000)
    text = """
      num_neighbors: 10
      distance_measure {distance_measure: "DotProductDistance"}
      autopilot {
        tree_ah {
          incremental_mode: NONE
          reordering_dtype: FLOAT32
        }
      }
    """
    b = scann_tpu.builder_from_pbtxt(db, text)
    cfg_ = b.create_config()
    assert cfg_.autopilot is not None
    assert cfg_.autopilot.heuristics == "reference"


def test_clean_errors():
    db = make_db(1000)
    with pytest.raises(ValueError, match="num_neighbors"):
        scann_tpu.builder_from_pbtxt(db, "brute_force { }")
    with pytest.raises(ValueError, match="distance_measure"):
        scann_tpu.builder_from_pbtxt(
            db, 'num_neighbors: 5\n'
                'distance_measure {distance_measure: "Chebyshev"}\n'
                'brute_force { }')
    with pytest.raises(ValueError, match="neither"):
        scann_tpu.builder_from_pbtxt(
            db, 'num_neighbors: 5\n'
                'distance_measure {distance_measure: "DotProductDistance"}')
    with pytest.raises(ValueError, match="unbalanced|expected"):
        ct.parse_textproto("partitioning { num_children: 3")
