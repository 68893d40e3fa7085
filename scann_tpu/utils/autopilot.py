"""Autopilot: heuristic config generation ("tree_ah" mode).

Faithful re-derivation of the reference's AutopilotTreeAh heuristics
(scann/utils/single_machine_autopilot.cc:35-200, defaults from
scann/proto/auto_tuning.proto: l1_size=32768, l3_size=33554432):

  * below a minimum corpus size, plain brute force;
  * otherwise LUT16 AH with 2 dims/block, residual quantization + noise
    shaping 0.2 for dot product;
  * leaf size ~ 2*ah_size*l1 / dim, floored at 2*kmeans_stable_size;
  * partitions = n / leaf_size capped by the L3 bound and a training-time
    bound sqrt(60*32*2e9 / dim / 200);
  * leaves_to_search = ceil(42 * 2^(ln(tree/42)/ln 10));
  * reorder = ceil(max(2k, 100*sqrt(k))).

The cache-size constants are kept verbatim even though the TPU has no L1/L3
in this sense: they encode leaf-size sweet spots that translate into
sensible partition counts for the dense-scan and gather kernels too; future
rounds can retune against measured TPU QPS without changing the API.
"""

from __future__ import annotations

import math

import numpy as np

from scann_tpu import config as cfg

_L1_SIZE = 32768
_L3_SIZE = 33554432
_AH_SIZE = 2
_KMEANS_STABLE_SIZE = 100
_SAFETY = 2
_MAGIC = 42


def autopilot_rewrite(config: cfg.ScannConfig, database: np.ndarray
                      ) -> cfg.ScannConfig:
    """Config -> concrete config (AutopilotTreeAh)."""
    n, dim = database.shape
    if dim == 0:
        raise ValueError("Not supported: dim == 0.")
    k = config.num_neighbors
    auto = config.autopilot or cfg.AutopilotConfig()

    ah2_leaf_size = math.ceil(_AH_SIZE * 2 * _L1_SIZE / dim)
    ah2_leaf_size = max(ah2_leaf_size, _SAFETY * _KMEANS_STABLE_SIZE)
    approx_num_neighbors = math.ceil(
        max(1.0 * _SAFETY * k, 100 * math.sqrt(k)))
    treeah_bound = max(_SAFETY * approx_num_neighbors, _MAGIC * ah2_leaf_size)

    if n < treeah_bound:
        return cfg.ScannConfig(
            num_neighbors=k, distance_measure=config.distance_measure,
            brute_force=cfg.BruteForceConfig(), seed=config.seed)

    l3_size_bound = math.ceil(_L3_SIZE / dim / 4)
    tree_size = n // ah2_leaf_size
    train_size_bound = math.ceil(math.sqrt(
        60.0 * 32 * 2e9 / dim / (_SAFETY * _KMEANS_STABLE_SIZE)))
    tree_size = min(tree_size, l3_size_bound, train_size_bound)
    tree_size = max(tree_size, 1)

    leaves_to_search = math.ceil(
        _MAGIC * math.pow(2.0, math.log(1.0 * tree_size / _MAGIC)
                          / math.log(10.0)))
    leaves_to_search = min(tree_size, leaves_to_search)

    partitioning = cfg.PartitioningConfig(
        num_leaves=tree_size,
        num_leaves_to_search=max(1, leaves_to_search),
        training_sample_size=tree_size * _KMEANS_STABLE_SIZE * _SAFETY,
        min_partition_size=10,
        training_iterations=10,
        random_init=True,
        incremental_threshold=(0.5 if auto.incremental_mode
                               in ("online", "online_incremental")
                               else None),
        incremental_mode=("online_incremental"
                          if auto.incremental_mode
                          == "online_incremental" else "online"))

    if (auto.engine == "tree_sq"
            and config.distance_measure in (cfg.DOT_PRODUCT, cfg.COSINE)):
        # TPU-native engine: pruned exact residual-int8 leaves
        # (ops/pruned_sq.py).  Exact scores need no reordering pass and
        # far fewer leaves than the AH-recall-oriented formula — measured
        # on v5e at glove scale: recall 0.965+ at 1/16 of the reference's
        # leaves_to_search, 4x the tree-AH QPS.
        import dataclasses
        partitioning = dataclasses.replace(
            partitioning,
            num_leaves_to_search=max(2, math.ceil(leaves_to_search / 16)))
        return cfg.ScannConfig(
            num_neighbors=k,
            distance_measure=config.distance_measure,
            partitioning=partitioning,
            brute_force=cfg.BruteForceConfig(quantize=cfg.INT8),
            seed=config.seed)

    residual = config.distance_measure == cfg.DOT_PRODUCT
    return cfg.ScannConfig(
        num_neighbors=k,
        distance_measure=config.distance_measure,
        partitioning=partitioning,
        asymmetric_hash=cfg.AsymmetricHashConfig(
            dimensions_per_block=_AH_SIZE,
            anisotropic_quantization_threshold=(0.2 if residual
                                                else math.nan),
            training_sample_size=16 * _KMEANS_STABLE_SIZE * _SAFETY * 10,
            training_iterations=10,
            residual_quantization=residual),
        reordering=cfg.ReorderConfig(
            reordering_num_neighbors=approx_num_neighbors,
            quantize=auto.reordering_dtype),
        seed=config.seed)
