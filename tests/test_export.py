"""jax.export graph-embedding surface (reference: SavedModel export via
scann_to_tensors/tensors_to_scann, scann_ops/cc/ops/scann_ops.cc:56-95,
scann_ops.py:41-73): the search program serializes to portable StableHLO
with the index state as plain array inputs, reloads WITHOUT constructing
a searcher, and reproduces the live searcher's results bit-for-bit."""

import numpy as np
import pytest

import scann_tpu
from scann_tpu import export as scann_export


def make_data(n=6000, d=48, nq=40, seed=5):
    rng = np.random.default_rng(seed)
    db = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((nq, d)).astype(np.float32)
    return db, q


@pytest.mark.parametrize("kind", ["tree_ah", "brute_force"])
def test_export_round_trip(tmp_path, kind):
    db, q = make_data()
    if kind == "tree_ah":
        s = (scann_tpu.builder(db, 10, "dot_product")
             .tree(num_leaves=32, num_leaves_to_search=8,
                   training_sample_size=4000)
             .score_ah(2, anisotropic_quantization_threshold=0.2)
             .reorder(50).build())
    else:
        s = (scann_tpu.builder(db, 10, "squared_l2")
             .score_brute_force().build())
    live_idx, live_dist = s.search_batched(q)
    path = str(tmp_path / "exported")
    buckets = scann_export.save_exported_searcher(
        path, s, batch_sizes=(len(q),))
    assert buckets
    ex = scann_export.load_exported_searcher(path)
    idx, dist = ex.search_batched(q)
    np.testing.assert_array_equal(idx, np.asarray(live_idx))
    np.testing.assert_allclose(dist, live_dist, rtol=1e-6, equal_nan=True)
    # Bigger-than-bucket batches chunk transparently.
    q2 = np.concatenate([q, q], axis=0)
    idx2, _ = ex.search_batched(q2)
    np.testing.assert_array_equal(idx2[: len(q)], idx)


def test_export_respects_operating_point(tmp_path):
    db, q = make_data(seed=6)
    s = (scann_tpu.builder(db, 10, "dot_product")
         .tree(num_leaves=32, num_leaves_to_search=4,
               training_sample_size=4000)
         .score_ah(2).reorder(40).build())
    live_idx, _ = s.search_batched(q, leaves_to_search=16,
                                   pre_reorder_num_neighbors=80)
    path = str(tmp_path / "exported_op")
    scann_export.save_exported_searcher(
        path, s, batch_sizes=(len(q),), leaves_to_search=16,
        pre_reorder_num_neighbors=80)
    ex = scann_export.load_exported_searcher(path)
    idx, _ = ex.search_batched(q)
    np.testing.assert_array_equal(idx, np.asarray(live_idx))
