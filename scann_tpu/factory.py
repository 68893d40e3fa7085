"""Searcher factory: config -> composed searcher.

TPU-native equivalent of the reference's SingleMachineFactoryScann
(scann/base/single_machine_factory_scann.cc:254-286) and its leaf dispatch
(SingleMachineFactoryLeafSearcher :207-248, TreeXHybridFactory
base/internal/tree_x_hybrid_factory.cc:732-750): exactly one of
{brute_force, hash, partitioning+X} is composed, with optional projection and
reordering attached around it.
"""

from __future__ import annotations

import numpy as np

from scann_tpu import config as cfg


def create_searcher(database, scann_config: cfg.ScannConfig, docids=None):
    """Build a searcher from a config (restoring a serialized index goes
    through scann_tpu.load_searcher, matching the reference split between
    create_searcher and load_searcher, scann_ops_pybind.py:226-273).

    ``database`` may be a plain (n, d) array or a data.dataset.DenseDataset
    (its docids and normalization carry over, like the reference factory
    consuming a TypedDataset, single_machine_factory_scann.cc:254)."""
    from scann_tpu.data import dataset as dataset_mod
    if isinstance(database, dataset_mod.DenseDataset):
        if docids is None:
            docids = database.docids
        database = database.data
    database = np.asarray(database)
    # Typed input datasets (reference TypedDataset<T>, data_format/
    # dataset.h:219; BruteForceSearcher<T>, brute_force.h:41;
    # TreeXHybridSMMD<T>, tree_x_hybrid_smmd.h:51): int8/uint8 rows build
    # and search WITHOUT a full float32 copy on two paths —
    #   * pure brute force: native typed device rows, exact scoring;
    #   * tree + score_brute_force (tree-X): sample/tokenize/split/encode
    #     all cast per chunk after their gathers; leaves store residual
    #     int8 (quantize="int8") or exact bfloat16 rows (float32 mode —
    #     int8/uint8 values are exact in bf16).
    # Everything else (AH — the reference's TreeAHHybridResidual is
    # float-only too, tree_ah_hybrid_residual.h:47 —, reordering,
    # projections, cosine's normalization, autopilot sizing) computes in
    # float and casts up front.
    typed_ok = (database.dtype in (np.int8, np.uint8)
                and scann_config.asymmetric_hash is None
                and scann_config.reordering is None
                and scann_config.projection is None
                and scann_config.autopilot is None
                and scann_config.distance_measure != cfg.COSINE
                and (scann_config.brute_force is None
                     or scann_config.brute_force.quantize
                     in (None, cfg.FLOAT32)
                     or (scann_config.partitioning is not None
                         and scann_config.brute_force.quantize
                         == cfg.INT8)))
    if not typed_ok and database.dtype != np.float32:
        database = np.asarray(database, dtype=np.float32)
    if database.ndim != 2:
        raise ValueError(f"database must be 2d, got shape {database.shape}")
    if scann_config.distance_measure == cfg.COSINE:
        # Cosine = dot product over unit vectors (queries normalize at
        # search time, base.Searcher.search_batched).
        norms = np.linalg.norm(database, axis=1, keepdims=True)
        database = database / np.maximum(norms, 1e-20)
    if scann_config.autopilot is not None:
        from scann_tpu.utils import autopilot as autopilot_mod
        scann_config = autopilot_mod.autopilot_rewrite(
            scann_config, database)

    if scann_config.partitioning is not None:
        if scann_config.asymmetric_hash is not None:
            from scann_tpu.models import tree_ah
            return tree_ah.TreeAHSearcher(database, scann_config,
                                          docids=docids)
        from scann_tpu.models import tree_x
        return tree_x.TreeXSearcher(database, scann_config, docids=docids)
    if scann_config.asymmetric_hash is not None:
        # Pure AH (no partitioning): modelled as tree-AH with a single leaf
        # (the reference routes this through asymmetric_hashing2::Searcher).
        from scann_tpu.models import tree_ah
        return tree_ah.TreeAHSearcher(database, scann_config, docids=docids)
    from scann_tpu.models import brute_force
    return brute_force.BruteForceSearcher(database, scann_config,
                                          docids=docids)
