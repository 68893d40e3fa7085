"""Index serialization: config JSON + npz asset arrays.

TPU-native equivalent of the reference's asset system
(ScannInterface::Serialize, scann_ops/cc/scann.cc:504-601, and the
scann_assets.pbtxt manifest, scann_ops/scann_assets.proto:21-50).  The same
logical assets exist — config, partitioner centers, datapoint_to_token
(2 slots per point under SOAR), packed AH codes + codebook, int8/bf16/f32
reordering datasets with multipliers/norms — stored as one
``scann_config.json`` + ``scann_assets.npz`` + optional ``scann_docids.json``.

The round-trip contract matches the reference's tests: a reloaded searcher
returns bit-identical results (verify_serialization,
scann_ops_pybind_test.py:39-59).
"""

from __future__ import annotations

import json
import os
import jax.numpy as jnp
import numpy as np

from scann_tpu import config as cfg

_CONFIG_FILE = "scann_config.json"
_ASSETS_FILE = "scann_assets.npz"
_DOCIDS_FILE = "scann_docids.json"


def _to_numpy(arr) -> tuple[np.ndarray, str]:
    """Device array -> (numpy-storable array, logical dtype tag).
    bfloat16 has no numpy-native storage; persist as a uint16 view."""
    a = np.asarray(arr)
    if a.dtype == jnp.bfloat16:
        return a.view(np.uint16), "bfloat16"
    return a, str(a.dtype)


def _from_numpy(a: np.ndarray, tag: str):
    from scann_tpu.utils import transfer
    if tag == "bfloat16":
        a = a.view(jnp.bfloat16)
    return transfer.to_device(a, a.dtype)


def collect_assets(searcher):
    """Flatten a searcher into (arrays, blob): every device/host array as
    a numpy tensor plus a JSON-able config+meta blob — the reference's
    searcher -> tensors decomposition (ScannToTensorsOp,
    scann_ops/cc/kernels/scann_ops.cc:57-435, scann_ops.py:41-73)."""
    arrays: dict[str, np.ndarray] = {}
    dtypes: dict[str, str] = {}
    meta: dict = {"type": type(searcher).__name__,
                  "n_points": searcher.n_points, "dims": searcher.dims}

    def put(key, arr):
        if arr is None:
            return
        arrays[key], dtypes[key] = _to_numpy(arr)

    if searcher.reorder_helper is not None:
        rh = searcher.reorder_helper
        put("reorder_db", rh._db)
        put("reorder_inv_mult", rh._inv_mult)
        put("reorder_sq_norms", rh._sq_norms)
        if getattr(rh, "_leaf", None) is not None:
            # Residual int8 reordering: the primary-leaf table + per-row
            # dequant scales (centers reload from the partitioner assets).
            put("reorder_leaf", rh._leaf)
            put("reorder_row_scale", rh._row_scale)
            meta["reorder_residual"] = True
    if searcher.projector is not None:
        put("proj_matrix", searcher.projector.matrix)
        meta["proj_out_dims"] = searcher.projector.out_dims
    if getattr(searcher, "_mut", None) is not None:
        # Vector mirror powering upsert/delete/rebalance (the reference
        # keeps dataset.npy for RetrainAndReindex similarly).
        put("mut_vectors", jnp.asarray(searcher._mut.vectors))
        put("mut_alive", jnp.asarray(searcher._mut.alive))
        meta["mutations_since_rebuild"] = (
            searcher._mut.mutations_since_rebuild)

    tname = meta["type"]
    if tname == "BruteForceSearcher":
        put("bf_db", searcher._db)
        put("bf_inv_mult", searcher._inv_mult)
        put("bf_sq_norms", searcher._sq_norms)
        put("bf_valid", searcher._valid)
    elif tname == "TreeAHSearcher":
        # 4-bit pair-packed on disk (reference stores hashed_dataset.npy in
        # the same packed form, scann_assets.proto).
        from scann_tpu.utils import native
        codes_np = np.asarray(searcher._host["codes"])
        if searcher.ah_cfg.clusters_per_block == 16:
            arrays["codes_packed"] = native.pack4(codes_np)
            dtypes["codes_packed"] = "uint8"
        else:
            arrays["codes"], dtypes["codes"] = codes_np, str(codes_np.dtype)
        meta["num_blocks"] = int(codes_np.shape[1])
        put("slot_dpid", searcher.index.slot_dpid)
        put("slot_leaf", searcher.index.slot_leaf)
        put("codebook", searcher.model.codebooks
            if getattr(searcher, "stacked", False)
            else searcher.model.codebook)
        put("block_dims", getattr(searcher.model, "block_dims", None))
        put("datapoint_to_token", jnp.asarray(searcher.datapoint_to_token))
        meta["model_dims"] = searcher.model.dims
        meta["num_slots"] = searcher._num_slots
        meta["chunk"] = searcher._chunk
        # Health-stats state (avg_quantization_error survives reload).
        meta["quantization_error_sq"] = getattr(
            searcher, "_quantization_error_sq", 0.0)
        meta["encoded_slots"] = getattr(searcher, "_encoded_slots", 0)
        if searcher.partitioner is not None:
            put("centers", searcher.partitioner.centers)
            put("centers_int8", searcher.partitioner.centers_int8)
            put("centers_inv_mult", searcher.partitioner.centers_inv_mult)
            put("upper_centers", searcher.partitioner.upper_centers)
            put("upper_assign", searcher.partitioner.upper_assign)
            meta["query_spilling_type"] = (
                searcher.partitioner.query_spilling_type)
            meta["query_spilling_threshold"] = (
                searcher.partitioner.query_spilling_threshold)
            meta["upper_leaves_to_search"] = (
                searcher.partitioner.upper_leaves_to_search)
    elif tname == "TreeXSearcher":
        put("slot_rows", searcher.slot_rows)
        put("slot_leaf", searcher.slot_leaf)
        put("slot_dpid", searcher.slot_dpid)
        put("tx_inv_mult", searcher._inv_mult)
        put("tx_sq_norms", searcher._sq_norms)
        put("datapoint_to_token", jnp.asarray(searcher.datapoint_to_token))
        meta["num_slots"] = searcher._num_slots
        meta["chunk"] = searcher._chunk
        if getattr(searcher, "_sq_mode", False):
            # Residual int8 tile-major leaves (pruned exact path).
            meta["tx_mode"] = "residual_int8"
            meta["max_ntiles"] = searcher._p_max_ntiles
            meta["num_tiles"] = searcher._p_num_tiles
            put("tx_scale", searcher.slot_scale)
            put("tx_bias2", searcher._bias2)
            put("tx_tile_start", searcher._p_tile_start)
            put("tx_ntiles", searcher._p_ntiles)
        put("centers", searcher.partitioner.centers)
        put("centers_int8", searcher.partitioner.centers_int8)
        put("centers_inv_mult", searcher.partitioner.centers_inv_mult)
        put("upper_centers", searcher.partitioner.upper_centers)
        put("upper_assign", searcher.partitioner.upper_assign)
    else:
        raise ValueError(f"cannot serialize searcher type {tname}")

    meta["dtypes"] = dtypes
    blob = {"config": json.loads(searcher.config.to_json()), "meta": meta}
    return arrays, blob


def save_searcher(searcher, artifacts_dir: str):
    os.makedirs(artifacts_dir, exist_ok=True)
    arrays, blob = collect_assets(searcher)
    with open(os.path.join(artifacts_dir, _CONFIG_FILE), "w") as f:
        f.write(json.dumps(blob, indent=2))
    np.savez(os.path.join(artifacts_dir, _ASSETS_FILE), **arrays)
    if searcher.docids is not None:
        with open(os.path.join(artifacts_dir, _DOCIDS_FILE), "w") as f:
            json.dump(searcher.docids, f)


def searcher_to_tensors(searcher) -> dict:
    """Searcher -> flat dict of numpy tensors, embeddable in any model
    checkpoint (orbax/flax state, tf.Variables, ...): the TPU counterpart
    of the reference's scann_searcher_to_tensors SavedModel export
    (scann_ops/cc/ops/scann_ops.cc:56-95, ScannState, scann_ops.py:41-73).
    The config/meta blob (and docids, when present) travel as uint8
    tensors."""
    arrays, blob = collect_assets(searcher)
    out = dict(arrays)
    out["scann_config_json"] = np.frombuffer(
        json.dumps(blob).encode(), np.uint8).copy()
    if searcher.docids is not None:
        out["scann_docids_json"] = np.frombuffer(
            json.dumps(searcher.docids).encode(), np.uint8).copy()
    return out


def searcher_from_tensors(tensors: dict):
    """Inverse of searcher_to_tensors (the reference's tensors_to_scann)."""
    tensors = dict(tensors)
    blob = json.loads(bytes(np.asarray(tensors.pop("scann_config_json"),
                                       np.uint8)).decode())
    docids = None
    if "scann_docids_json" in tensors:
        docids = json.loads(bytes(np.asarray(
            tensors.pop("scann_docids_json"), np.uint8)).decode())
    dtypes = blob["meta"]["dtypes"]
    arrays = {k: _from_numpy(np.asarray(v), dtypes.get(k, None)
                             or str(np.asarray(v).dtype))
              for k, v in tensors.items()}
    return _restore_searcher(blob, arrays, docids)


def load_searcher(artifacts_dir: str):
    """Reconstruct a searcher without retraining (reference:
    load_searcher -> LoadArtifacts, scann.cc:105-263)."""
    with open(os.path.join(artifacts_dir, _CONFIG_FILE)) as f:
        blob = json.load(f)
    dtypes = blob["meta"]["dtypes"]
    raw = np.load(os.path.join(artifacts_dir, _ASSETS_FILE))
    arrays = {k: _from_numpy(raw[k], dtypes[k]) for k in raw.files}
    docids = None
    docids_path = os.path.join(artifacts_dir, _DOCIDS_FILE)
    if os.path.exists(docids_path):
        with open(docids_path) as f:
            docids = json.load(f)
    return _restore_searcher(blob, arrays, docids)


def _restore_searcher(blob: dict, arrays: dict, docids):
    scann_config = cfg._config_from_dict(blob["config"])
    meta = blob["meta"]
    tname = meta["type"]
    if tname == "BruteForceSearcher":
        from scann_tpu.models import brute_force
        s = object.__new__(brute_force.BruteForceSearcher)
        _init_base(s, scann_config, meta, arrays, docids)
        bf = scann_config.brute_force or cfg.BruteForceConfig()
        s.quantize_mode = bf.quantize
        s._db = arrays["bf_db"]
        s._inv_mult = arrays.get("bf_inv_mult")
        s._sq_norms = arrays.get("bf_sq_norms")
        s._valid = arrays.get("bf_valid")
        if s._valid is None:
            s._valid = jnp.ones((s._db.shape[0],), bool)
        return s
    if tname == "TreeAHSearcher":
        from scann_tpu.models import tree_ah
        s = object.__new__(tree_ah.TreeAHSearcher)
        _init_base(s, scann_config, meta, arrays, docids)
        s.part_cfg = scann_config.partitioning
        s.ah_cfg = scann_config.asymmetric_hash
        s.measure = cfg.internal_measure(
            scann_config.distance_measure)
        s.residual = bool(s.ah_cfg.residual_quantization)
        from scann_tpu.utils import native
        if "codes_packed" in arrays:
            codes_np = native.unpack4(
                np.asarray(arrays["codes_packed"]),
                meta["num_blocks"]).view(np.uint8)
        else:
            codes_np = np.asarray(arrays["codes"])
        s.index = tree_ah.TreeAHIndex(codes=None,
                                      slot_dpid=arrays["slot_dpid"],
                                      slot_leaf=arrays["slot_leaf"])
        s.stacked = (scann_config.asymmetric_hash.quantization_scheme
                     == "stacked")
        if s.stacked:
            from scann_tpu.ops import stacked as stacked_ops
            s.model = stacked_ops.StackedModel(
                codebooks=arrays["codebook"], dims=meta["model_dims"])
        else:
            from scann_tpu.ops import ah as ah_ops
            s.model = ah_ops.AHModel(codebook=arrays["codebook"],
                                     dims=meta["model_dims"],
                                     block_dims=arrays.get("block_dims"))
        s._num_slots = meta["num_slots"]
        s._chunk = meta["chunk"]
        s._quantization_error_sq = meta.get("quantization_error_sq", 0.0)
        s._encoded_slots = meta.get("encoded_slots", 0)
        s.datapoint_to_token = np.asarray(arrays["datapoint_to_token"])
        s.partitioner = _load_partitioner(arrays, scann_config, meta)
        if (s.reorder_helper is not None
                and s.reorder_helper._leaf is not None):
            s.reorder_helper._centers = s.partitioner.centers
        s._host = {"codes": codes_np,
                   "leaf": np.asarray(s.index.slot_leaf),
                   "dpid": np.asarray(s.index.slot_dpid)}
        s._slot_table = None
        s._in_maintenance = False
        s._leaf_mutations = np.zeros(
            (s.partitioner.num_leaves if s.partitioner is not None else 1,),
            np.int64)
        if not (s._recon_mode or s._pruned_available):
            s._ensure_dense_codes()
        s._build_recon()
        if s.ah_cfg.lookup_type == "reconstruct":
            from scann_tpu.ops import fused_scan
            s._min_bucket = fused_scan.QT
        return s
    if tname == "TreeXSearcher":
        from scann_tpu.models import tree_x
        s = object.__new__(tree_x.TreeXSearcher)
        _init_base(s, scann_config, meta, arrays, docids)
        s.part_cfg = scann_config.partitioning
        s.measure = cfg.internal_measure(
            scann_config.distance_measure)
        bf = scann_config.brute_force or cfg.BruteForceConfig()
        s.quantize_mode = bf.quantize
        s.slot_rows = arrays["slot_rows"]
        s.slot_leaf = arrays["slot_leaf"]
        s.slot_dpid = arrays["slot_dpid"]
        s._inv_mult = arrays.get("tx_inv_mult")
        s._sq_norms = arrays.get("tx_sq_norms")
        s._num_slots = meta["num_slots"]
        s._chunk = meta["chunk"]
        s._sq_mode = meta.get("tx_mode") == "residual_int8"
        if s._sq_mode:
            from scann_tpu.utils import transfer
            tile = s.slot_rows.shape[1]
            # Planes live pre-shaped (n, tile, 1) in DEFAULT layout (a
            # layout-mismatched pallas operand is re-copied per dispatch);
            # older saves hold 2-D.
            s.slot_rows = transfer.default_layout(s.slot_rows)
            s.slot_scale = transfer.default_layout(
                arrays["tx_scale"].reshape(-1, tile, 1))
            s._bias2 = transfer.default_layout(
                arrays["tx_bias2"].reshape(-1, tile, 1))
            s._p_tile_start = arrays["tx_tile_start"]
            s._p_ntiles = arrays["tx_ntiles"]
            s._p_max_ntiles = meta["max_ntiles"]
            s._p_num_tiles = meta["num_tiles"]
        s.datapoint_to_token = np.asarray(arrays["datapoint_to_token"])
        s.partitioner = _load_partitioner(arrays, scann_config, meta)
        if (s.reorder_helper is not None
                and s.reorder_helper._leaf is not None):
            s.reorder_helper._centers = s.partitioner.centers
        return s
    raise ValueError(f"unknown searcher type in artifacts: {tname}")


def _init_base(s, scann_config, meta, arrays, docids):
    from scann_tpu.models import base
    s.config = scann_config
    s.n_points = meta["n_points"]
    s.dims = meta["dims"]
    s.docids = docids
    s._compiled = {}
    s._crowding_attrs = None
    s._mut = None
    if "mut_vectors" in arrays:
        from scann_tpu import mutation
        st = mutation.MutationState(np.asarray(arrays["mut_vectors"]),
                                    docids)
        st.alive = np.asarray(arrays["mut_alive"])
        st.docid_to_id = {d: i for i, d in enumerate(docids)
                          if st.alive[i]}
        st.mutations_since_rebuild = meta.get("mutations_since_rebuild", 0)
        s._mut = st
    s.projector = None
    if "proj_out_dims" in meta:
        from scann_tpu.ops import projection as proj_ops
        s.projector = proj_ops.Projector(
            matrix=arrays.get("proj_matrix"),
            out_dims=meta["proj_out_dims"])
    s.reorder_helper = None
    if scann_config.reordering is not None:
        rh = object.__new__(base.ReorderHelper)
        rh.measure = cfg.internal_measure(
            scann_config.distance_measure)
        rh.config = scann_config.reordering
        rh._db = arrays["reorder_db"]
        rh._inv_mult = arrays.get("reorder_inv_mult")
        rh._sq_norms = arrays.get("reorder_sq_norms")
        rh._leaf = arrays.get("reorder_leaf")
        rh._row_scale = arrays.get("reorder_row_scale")
        # Residual mode biases against the partitioner centers; the
        # partitioner loads after _init_base, so the searcher branches
        # sync rh._centers once it exists.
        rh._centers = None
        s.reorder_helper = rh
    s._reorder_deferred = False


def _load_partitioner(arrays, scann_config, meta=None):
    if "centers" not in arrays:
        return None
    meta = meta or {}
    from scann_tpu.partitioning import kmeans_tree
    upper_l = 1
    part = scann_config.partitioning
    if part is not None and part.upper_tree is not None:
        upper_l = part.upper_tree.num_leaves_to_search
    # Hierarchical training derives its own upper fan-out (not present in
    # the upper_tree config); the serialized value wins.
    upper_l = int(meta.get("upper_leaves_to_search", upper_l))
    return kmeans_tree.KMeansTreePartitioner(
        centers=arrays["centers"],
        centers_int8=arrays.get("centers_int8"),
        centers_inv_mult=arrays.get("centers_inv_mult"),
        query_distance=cfg.internal_measure(
            scann_config.distance_measure),
        upper_centers=arrays.get("upper_centers"),
        upper_assign=arrays.get("upper_assign"),
        upper_leaves_to_search=upper_l,
        query_spilling_type=meta.get("query_spilling_type",
                                     "fixed_number"),
        query_spilling_threshold=meta.get("query_spilling_threshold",
                                          0.0))
