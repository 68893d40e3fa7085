"""Autopilot: heuristic config generation.

Two heuristic sets (AutopilotConfig.heuristics):

``"tpu"`` (default) — the MEASURED TPU cost model (VERDICT r3 weak-7):

  * leaf size targets the pruned kernels' tile economics: tiles are
    256 slots (sq) and the merge/plan cost grows with leaves_to_search
    while kernel padding waste grows as leaves shrink below ~2 tiles —
    the measured glove-scale sweet spot is ~500 rows/leaf (1.18M rows /
    ~2350 leaves, STATUS.md round-3 sweeps);
  * num_leaves is additionally capped by the tokenization matmul
    (cost ~ num_leaves * dim per query): 8*sqrt(n) keeps tokenize below
    the scan cost out to the 100M axis;
  * leaves_to_search comes from the glove-hard candidate-recall curve
    (benchmarks/calibrate_corpus.py: scanned fraction 0.04/0.075/0.12/
    0.20 reaches candidate recall 0.90/0.95/0.97/0.98) for the
    configured target_recall;
  * engine "tree_sq" (pruned exact residual-int8, the flagship) needs
    no reordering; "tree_ah" keeps reorder = ceil(max(2k, 100*sqrt(k)))
    (a k-based rule, not a cache rule).

``"reference"`` — verbatim AutopilotTreeAh parity
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

# TPU cost-model constants (measured, see module docstring).
_TPU_LEAF_ROWS = 500       # rows/leaf sweet spot for 256-slot tiles
_TPU_TOKENIZE_CAP = 8.0    # num_leaves <= cap * sqrt(n)
# Glove-hard candidate-recall anchors: (candidate recall, scanned
# fraction of leaves) from the calibrated corpus curve.  Used for
# engines whose end recall sits BELOW candidate recall (AH codes +
# reorder lose a little on top of leaf selection).
_RECALL_CURVE = ((0.90, 0.04), (0.95, 0.075), (0.97, 0.12), (0.98, 0.20))
# Measured END-TO-END anchors for the exact-scoring tree-SQ engine
# (recall ~= candidate recall): r5 chip sweep on the calibrated corpus
# at reference-parity training sample (benchmarks/bench_r5_run2.log,
# 2338-leaf tree: 0.9305 at 50 leaves / 0.9593 at 100 / 0.9705 at 150 /
# 0.9825 at 300).  The candidate anchors overshoot exact engines by
# ~2x scanned leaves at target 0.95 (VERDICT r4 weak-7 re-validation).
_RECALL_CURVE_SQ = ((0.93, 0.021), (0.959, 0.043), (0.970, 0.064),
                    (0.9825, 0.128))


def _scan_fraction(target_recall: float,
                   pts=_RECALL_CURVE) -> float:
    """Scanned-leaf fraction reaching target candidate recall on a
    glove-hard corpus (piecewise-linear over the calibrated anchors)."""
    if target_recall <= pts[0][0]:
        return pts[0][1] * max(target_recall / pts[0][0], 0.25)
    for (r0, f0), (r1, f1) in zip(pts, pts[1:]):
        if target_recall <= r1:
            t = (target_recall - r0) / (r1 - r0)
            return f0 + t * (f1 - f0)
    return pts[-1][1] * 1.5  # beyond 0.98: overscan margin


def autopilot_rewrite(config: cfg.ScannConfig, database: np.ndarray
                      ) -> cfg.ScannConfig:
    """Config -> concrete config (AutopilotTreeAh role)."""
    n, dim = database.shape
    if dim == 0:
        raise ValueError("Not supported: dim == 0.")
    k = config.num_neighbors
    auto = config.autopilot or cfg.AutopilotConfig()
    tpu_mode = getattr(auto, "heuristics", "tpu") != "reference"

    ah2_leaf_size = math.ceil(_AH_SIZE * 2 * _L1_SIZE / dim)
    ah2_leaf_size = max(ah2_leaf_size, _SAFETY * _KMEANS_STABLE_SIZE)
    approx_num_neighbors = math.ceil(
        max(1.0 * _SAFETY * k, 100 * math.sqrt(k)))
    if tpu_mode:
        # Below ~16 leaves' worth of rows a partition buys nothing: the
        # fused full-scan kernel already reads the whole index in a few
        # tiles and tokenize/merge overhead dominates.
        treeah_bound = 16 * _TPU_LEAF_ROWS
    else:
        treeah_bound = max(_SAFETY * approx_num_neighbors,
                           _MAGIC * ah2_leaf_size)

    if n < treeah_bound:
        return cfg.ScannConfig(
            num_neighbors=k, distance_measure=config.distance_measure,
            brute_force=cfg.BruteForceConfig(), seed=config.seed)

    if tpu_mode:
        tree_size = min(n // _TPU_LEAF_ROWS,
                        math.ceil(_TPU_TOKENIZE_CAP * math.sqrt(n)))
        tree_size = max(tree_size, 16)
        exact_sq = (auto.engine == "tree_sq"
                    and config.distance_measure in (cfg.DOT_PRODUCT,
                                                    cfg.COSINE))
        frac = _scan_fraction(min(max(auto.target_recall, 0.5), 0.999),
                              _RECALL_CURVE_SQ if exact_sq
                              else _RECALL_CURVE)
        leaves_to_search = min(tree_size,
                               max(2, math.ceil(frac * tree_size)))
    else:
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
        # (ops/pruned_sq.py).  Exact scores need no reordering pass; the
        # tpu heuristics already derive leaves_to_search from the target
        # candidate recall (exact scoring makes end recall ~= candidate
        # recall), while the reference formula is AH-overscan-oriented
        # and divides down (measured on v5e: recall 0.965+ at 1/16 of
        # the reference's leaves_to_search, 4x the tree-AH QPS).
        import dataclasses
        if not tpu_mode:
            partitioning = dataclasses.replace(
                partitioning,
                num_leaves_to_search=max(
                    2, math.ceil(leaves_to_search / 16)))
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
