"""Tree-X searcher: partitioning + exact (float32/int8/bf16) leaf scoring.

TPU-native equivalent of the reference's TreeXHybridSMMD with brute-force /
scalar-quantized / bf16 leaves (scann/tree_x_hybrid/tree_x_hybrid_smmd.h:51-130,
leaf builders in base/internal/tree_x_hybrid_factory.cc:416-520).  Two
scoring paths:

  * int8 leaves with a partitioner ride the PRUNED exact path
    (ops/pruned_sq.py): residual per-row int8 rows stored tile-major per
    leaf, scored exactly on the MXU for only the selected leaves — the
    TPU-first winner over tree-AH + reorder (exact scores need no rescore
    pass, see ops/pruned_sq.py header).  Index memory ~d+8 B/vector.
    Deviation from the reference's SQ leaves (global per-dimension
    multipliers over raw vectors, scalar_quantization_helpers.h:52-64):
    residual per-row scales are several times finer on clustered data.
  * everything else (float32/bf16 leaves, L2-int8 without a partitioner,
    pathological layouts) uses the dense scan-with-mask design shared with
    tree-AH: leaf-sorted rows scored chunk-by-chunk for the full batch and
    masked by per-query leaf selection.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from scann_tpu import config as cfg
from scann_tpu.models import base
from scann_tpu.ops import quantize as quant_ops
from scann_tpu.ops import topk as topk_ops
from scann_tpu.partitioning import kmeans_tree

_SCORE_CHUNK = 65536
_ENCODE_CHUNK = 131072
# Leaf-tile size for the pruned exact layout: leaves pad to a multiple of
# this.  Smaller than pruned_scan.TILE (512) because tree-SQ leaf counts
# put average leaf sizes near ~n/num_leaves ~ 500: at 512 the average
# leaf wastes ~half its padded slots (kernel work AND index bytes); at
# 256 the waste drops to ~25% while (256, d) x (d, 128) still fills the
# MXU.
_SQ_TILE = 256


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class TreeXSearcher(base.Searcher):
    """Partitioned exact scoring (tree + score_brute_force)."""

    def __init__(self, database: np.ndarray, scann_config: cfg.ScannConfig,
                 docids=None):
        super().__init__(database, scann_config, docids)
        self.part_cfg = scann_config.partitioning
        self.measure = cfg.internal_measure(
            scann_config.distance_measure)
        bf = scann_config.brute_force or cfg.BruteForceConfig()
        self.quantize_mode = bf.quantize
        self._sq_mode = False
        self._build(database)

    def _build(self, database: np.ndarray):
        database = self._project_database(database)
        n, d = database.shape
        # Reuse the base class's one shared device upload when unprojected.
        x_dev = (self._build_x_dev
                 if self.projector is None and self._build_x_dev is not None
                 else database)
        self.partitioner = kmeans_tree.KMeansTreePartitioner.train(
            x_dev, self.part_cfg, self.measure, self.config.seed)
        tokens = np.asarray(self.partitioner.tokenize_database(x_dev))
        if self.quantize_mode == cfg.INT8 and self.partitioner.num_leaves > 1:
            # Max-size bound per partition for the pruned exact path (the
            # kernel's per-leaf tile budget is MAX_NTILES): oversized
            # partitions split via batched device 2-means, one global
            # refinement pass, one more split round (same time-boxed
            # discipline as tree-AH).
            from scann_tpu.ops import pruned_scan
            nl = self.part_cfg.num_leaves
            hard_cap = pruned_scan.MAX_NTILES * _SQ_TILE
            cap = int(min(hard_cap,
                          max(2.0 * n / max(nl, 1), _SQ_TILE)))
            centers_np = np.asarray(self.partitioner.centers)
            tokens, grown = kmeans_tree.split_oversized(
                x_dev, tokens, centers_np, cap)
            if grown.shape[0] != centers_np.shape[0]:
                centers_np = grown
                self._register_centers(centers_np)
                tokens = np.asarray(self.partitioner.tokenize_database(x_dev))
                tokens, grown = kmeans_tree.split_oversized(
                    x_dev, tokens, centers_np, cap)
                if grown.shape[0] != centers_np.shape[0]:
                    centers_np = grown
                    self._register_centers(centers_np)
            counts = np.bincount(tokens, minlength=centers_np.shape[0])
            if counts.max() > hard_cap:
                tokens = kmeans_tree.cap_partition_sizes(
                    database, tokens, centers_np, hard_cap)
        self._finish_deferred_reorder(x_dev, tokens)
        self.datapoint_to_token = tokens[:, None]

        if (self.quantize_mode == cfg.INT8
                and self.partitioner.num_leaves > 1
                and self._build_sq(x_dev, tokens)):
            self._build_x_dev = None
            return
        self._build_x_dev = None

        order = np.argsort(tokens, kind="stable")
        rows = database[order]
        leaf = tokens[order].astype(np.int32)
        dpid = order.astype(np.int32)

        s = n
        self._num_slots = s
        chunk = _SCORE_CHUNK if s >= _SCORE_CHUNK else _round_up(s, 128)
        self._chunk = chunk
        pad = _round_up(s, chunk) - s
        if pad:
            rows = np.pad(rows, ((0, pad), (0, 0)))
            leaf = np.pad(leaf, (0, pad))
            dpid = np.pad(dpid, (0, pad), constant_values=-1)

        self._set_leaf_data(rows, leaf, dpid)

    # ------------------------------------------- residual int8 (tile-major)
    def _build_sq(self, x_dev, tokens) -> bool:
        """Tile-major residual per-row int8 leaves (the pruned exact path,
        ops/pruned_sq.py).  Returns False when the layout cannot be built
        (a leaf outgrew the kernel's tile budget) — callers fall back to
        the dense global-int8 layout."""
        from scann_tpu.ops import fused_scan
        from scann_tpu.ops import pruned_scan

        num_leaves = self.partitioner.num_leaves
        order, tile_start, ntiles, num_tiles = pruned_scan.build_layout_host(
            tokens.astype(np.int64), num_leaves, seed=self.config.seed,
            tile=_SQ_TILE)
        if int(ntiles.max()) > pruned_scan.MAX_NTILES:
            return False
        # Pad the tile count so the dense fallback scan's chunk divides the
        # slot count; the extra tiles sit past every leaf's range, so the
        # pruned plan never touches them and dpid=-1 masks the dense scan.
        chunk_tiles = min(_SCORE_CHUNK // _SQ_TILE,
                          _round_up(num_tiles, 8))
        total_tiles = _round_up(num_tiles, chunk_tiles)
        s_pad = total_tiles * _SQ_TILE
        src = np.full((s_pad,), -1, np.int64)
        src[:order.shape[0]] = order
        leaf = np.where(src >= 0, tokens[np.maximum(src, 0)], 0
                        ).astype(np.int32)
        dpid = np.where(src >= 0, src, -1).astype(np.int32)

        d = self.dims if self.projector is None else self.projector.out_dims
        d_pad = _round_up(d, 8)
        l2 = self.measure == cfg.SQUARED_L2

        def enc(src_c, lf_c, x, c):
            # Cast AFTER the per-chunk gather: typed (int8/uint8)
            # databases residual-encode without an (n, d) f32 device copy
            # (TypedDataset<T> through TreeXHybridSMMD<T>, dataset.h:219,
            # tree_x_hybrid_smmd.h:51).
            xs = jnp.take(x, jnp.maximum(src_c, 0),
                          axis=0).astype(jnp.float32)
            crows = jnp.take(c, lf_c, axis=0)
            delta = jnp.where((src_c >= 0)[:, None], xs - crows, 0.0)
            q8, scale = base._row_quantize(delta)
            deq = q8.astype(jnp.float32) * scale[:, None] + crows
            sq = jnp.sum(deq * deq, axis=-1)
            if d_pad > d:
                q8 = jnp.pad(q8, ((0, 0), (0, d_pad - d)))
            return q8, scale, sq

        fn = jax.jit(enc)
        rows_c, scale_c, sq_c = [], [], []
        for s0 in range(0, s_pad, _ENCODE_CHUNK):
            q8, sc, sq = fn(jnp.asarray(src[s0:s0 + _ENCODE_CHUNK]),
                            jnp.asarray(leaf[s0:s0 + _ENCODE_CHUNK]),
                            x_dev, self.partitioner.centers)
            rows_c.append(q8)
            scale_c.append(sc)
            sq_c.append(sq)
        rows = jnp.concatenate(rows_c, axis=0)
        scale = jnp.concatenate(scale_c, axis=0)
        sq = jnp.concatenate(sq_c, axis=0)
        dpid_dev = jnp.asarray(dpid)
        bias = jnp.where(dpid_dev >= 0,
                         -sq if l2 else jnp.zeros_like(sq),
                         fused_scan._PAD_PENALTY)
        # Planes stored PRE-SHAPED (n, tile, 1) and in DEFAULT layout:
        # reshaping them per call as jit arguments — or letting XLA keep
        # the build program's transposed output layout — copies the whole
        # index on every search dispatch (utils/transfer.default_layout).
        from scann_tpu.utils import transfer
        self.slot_rows = transfer.default_layout(
            rows.reshape(total_tiles, _SQ_TILE, d_pad))
        self.slot_scale = transfer.default_layout(
            scale.reshape(total_tiles, _SQ_TILE, 1))
        self._bias2 = transfer.default_layout(
            bias.reshape(total_tiles, _SQ_TILE, 1))
        self._sq_norms = sq if l2 else None
        self._inv_mult = None
        self.slot_leaf = jnp.asarray(leaf)
        self.slot_dpid = dpid_dev
        self._p_tile_start = jnp.asarray(tile_start)
        self._p_ntiles = jnp.asarray(ntiles)
        self._p_max_ntiles = int(ntiles.max())
        self._p_num_tiles = num_tiles
        self._num_slots = int((dpid >= 0).sum())
        self._chunk = chunk_tiles * _SQ_TILE
        self._sq_mode = True
        return True

    @property
    def _pruned_available(self) -> bool:
        return self._sq_mode

    def _set_leaf_data(self, rows, leaf, dpid):
        from scann_tpu.utils import transfer
        typed = rows.dtype in (np.int8, np.uint8)
        if typed and self.quantize_mode in (None, cfg.FLOAT32):
            # Typed tree-BF leaves: int8/uint8 values are EXACT in
            # bfloat16 (8 significand bits cover |v| <= 256), so the scan
            # scores exactly at 2 B/dim with no f32 copy at any point
            # (TypedDataset<T> leaves under TreeXHybridSMMD<T>).
            rows_dev = transfer.to_device(rows, dtype=jnp.bfloat16)
            self.slot_leaf = jnp.asarray(leaf)
            self.slot_dpid = jnp.asarray(dpid)
            self._inv_mult = None
            self.slot_rows = rows_dev
            self._sq_norms = None
            if self.measure == cfg.SQUARED_L2:
                f32 = rows_dev.astype(jnp.float32)
                self._sq_norms = jnp.sum(f32 * f32, axis=-1)
            return
        rows = transfer.to_device(rows)
        self.slot_leaf = jnp.asarray(leaf)
        self.slot_dpid = jnp.asarray(dpid)
        self._inv_mult = None
        self._sq_norms = None
        if self.quantize_mode == cfg.INT8:
            sq = quant_ops.scalar_quantize(jnp.asarray(rows))
            self.slot_rows = sq.data
            self._inv_mult = sq.inverse_multipliers
            self._sq_norms = sq.sq_norms
        elif self.quantize_mode == cfg.BFLOAT16:
            self.slot_rows = jnp.asarray(rows, jnp.bfloat16)
            self._sq_norms = jnp.sum(
                jnp.asarray(rows, jnp.float32) ** 2, axis=-1)
        else:
            self.slot_rows = jnp.asarray(rows, jnp.float32)
            if self.measure == cfg.SQUARED_L2:
                self._sq_norms = jnp.sum(
                    jnp.asarray(rows, jnp.float32) ** 2, axis=-1)

    def _default_leaves(self) -> int:
        return self.part_cfg.num_leaves_to_search

    def _extra_state(self):
        st = {"tx_rows": self.slot_rows, "tx_leaf": self.slot_leaf,
              "tx_dpid": self.slot_dpid, "tx_inv_mult": self._inv_mult,
              "tx_sq_norms": self._sq_norms,
              "tx_centers": self.partitioner.centers,
              "tx_centers_int8": self.partitioner.centers_int8,
              "tx_centers_inv_mult": self.partitioner.centers_inv_mult,
              "tx_upper_centers": self.partitioner.upper_centers,
              "tx_upper_assign": self.partitioner.upper_assign}
        if self._sq_mode:
            st["tx_scale"] = self.slot_scale
            st["tx_bias2"] = self._bias2
            st["tx_tile_start"] = self._p_tile_start
            st["tx_ntiles"] = self._p_ntiles
        return st

    def _select_candidates(self, queries, state, k_pre: int, leaves: int,
                           full_scan: bool = False):
        if (self._sq_mode and not full_scan
                and leaves < self.partitioner.num_leaves):
            from scann_tpu.ops import pruned_scan
            _, w_pad = pruned_scan.plan_capacities(
                queries.shape[0], min(leaves, self.partitioner.num_leaves),
                self.partitioner.num_leaves, self._p_num_tiles,
                self._p_max_ntiles)
            if w_pad <= pruned_scan.MAX_PLAN_WORK:
                return self._pruned_select(queries, state, k_pre, leaves)
        nq = queries.shape[0]
        partitioner = self.partitioner._replace(
            centers=state["tx_centers"],
            centers_int8=state["tx_centers_int8"],
            centers_inv_mult=state["tx_centers_inv_mult"],
            upper_centers=state["tx_upper_centers"],
            upper_assign=state["tx_upper_assign"])
        num_leaves = partitioner.num_leaves
        leaves = max(1, min(leaves, num_leaves))
        rows_iota = jnp.arange(nq)[:, None]
        if state.get("pre_tokenized") is not None:
            pt = state["pre_tokenized"]
            leaf_ids = jnp.maximum(pt, 0)
            keep = pt >= 0
        else:
            leaf_ids, c_sims = partitioner.tokenize_queries(queries, leaves)
            keep = jnp.ones((nq, leaves), bool)
            if state.get("leaves_dynamic") is not None:
                col = jax.lax.broadcasted_iota(jnp.int32, (nq, leaves), 1)
                keep = col < state["leaves_dynamic"]
            if partitioner.query_spilling_type != "fixed_number":
                keep = jnp.logical_and(keep,
                                       partitioner.spilling_mask(c_sims))
        mask_dense = jnp.zeros((nq, num_leaves), bool
                               ).at[rows_iota, leaf_ids].set(keep)

        rows = state["tx_rows"]
        inv_mult = state["tx_inv_mult"]
        sq_norms = state["tx_sq_norms"]
        sq_res = self._sq_mode  # residual int8 rows (dense fallback path)
        q_sq = jnp.sum(queries * queries, axis=-1)
        if sq_res:
            d_pad = rows.shape[-1]
            rows = rows.reshape(-1, d_pad)
            scale_flat = state["tx_scale"].reshape(-1)  # (n, tile, 1) plane
            pad = d_pad - queries.shape[1]
            q = (jnp.pad(queries, ((0, 0), (0, pad))) if pad
                 else queries).astype(jnp.bfloat16)
            # Exact f32 q.c per leaf, added back per slot via its leaf id.
            q_c = jax.lax.dot_general(
                queries, state["tx_centers"],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)   # (nq, num_leaves)
        elif inv_mult is not None:
            q = queries * inv_mult[None, :]
        elif rows.dtype == jnp.bfloat16:
            q = queries.astype(jnp.bfloat16)
        else:
            q = queries

        chunk = self._chunk
        num_chunks = rows.shape[0] // chunk
        k_fetch = min(k_pre, state["tx_dpid"].shape[0])

        def body(carry, ci):
            vals, slots = carry
            start = ci * chunk
            rows_c = jax.lax.dynamic_slice_in_dim(rows, start, chunk)
            leaf_c = jax.lax.dynamic_slice_in_dim(state["tx_leaf"], start,
                                                  chunk)
            dpid_c = jax.lax.dynamic_slice_in_dim(state["tx_dpid"], start,
                                                  chunk)
            if sq_res:
                dots = jax.lax.dot_general(
                    q, rows_c.astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                sc = jax.lax.dynamic_slice_in_dim(scale_flat, start, chunk)
                qx = (dots * sc[None, :]
                      + jnp.take(q_c, leaf_c, axis=1))   # q . x_hat
                if self.measure == cfg.DOT_PRODUCT:
                    sim = qx
                else:
                    norms_c = jax.lax.dynamic_slice_in_dim(sq_norms, start,
                                                           chunk)
                    sim = 2.0 * qx - norms_c[None, :] - q_sq[:, None]
            else:
                dots = jax.lax.dot_general(
                    q, rows_c, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if self.measure == cfg.DOT_PRODUCT:
                    sim = dots
                else:
                    norms_c = (jax.lax.dynamic_slice_in_dim(
                        sq_norms, start, chunk)
                        if sq_norms is not None
                        else jnp.sum(rows_c * rows_c, axis=-1))
                    sim = -(q_sq[:, None] - 2.0 * dots + norms_c[None, :])
            valid = jnp.logical_and((dpid_c >= 0)[None, :],
                                    jnp.take(mask_dense, leaf_c, axis=1))
            if state.get("restrict") is not None:
                allow = jnp.take(state["restrict"],
                                 jnp.clip(dpid_c, 0,
                                          state["restrict"].shape[0] - 1))
                valid = jnp.logical_and(valid, allow[None, :])
            cvals, cpos = topk_ops.chunk_top_k(
                sim, min(k_fetch, chunk), valid=valid)
            cslot = jnp.where(cpos >= 0, start + cpos, -1)
            return topk_ops.merge_top_k(vals, slots, cvals, cslot,
                                        k_fetch), None

        init = (jnp.full((nq, k_fetch), -jnp.inf, jnp.float32),
                jnp.full((nq, k_fetch), -1, jnp.int32))
        (vals, slots), _ = jax.lax.scan(body, init, jnp.arange(num_chunks))
        dpids = jnp.where(slots >= 0,
                          jnp.take(state["tx_dpid"],
                                   jnp.maximum(slots, 0)), -1)
        return vals, dpids

    def _pruned_select(self, queries, state, k_pre: int, leaves: int):
        """Leaf-gathered EXACT selection over residual int8 rows
        (ops/pruned_sq.py): cost O(B * leaves * avg_leaf) like the tree-AH
        pruned path, but scores are exact — no reordering pass follows."""
        from scann_tpu.ops import pruned_scan
        from scann_tpu.ops import pruned_sq
        partitioner = self.partitioner._replace(
            centers=state["tx_centers"],
            centers_int8=state["tx_centers_int8"],
            centers_inv_mult=state["tx_centers_inv_mult"],
            upper_centers=state["tx_upper_centers"],
            upper_assign=state["tx_upper_assign"])
        num_leaves = partitioner.num_leaves
        leaves = max(1, min(leaves, num_leaves))
        nq = queries.shape[0]
        if state.get("pre_tokenized") is not None:
            pt = state["pre_tokenized"]
            leaf_ids = jnp.maximum(pt, 0)
            valid_sel = pt >= 0
        else:
            leaf_ids, c_sims = partitioner.tokenize_queries(queries, leaves)
            valid_sel = jnp.ones((nq, leaves), bool)
            if state.get("leaves_dynamic") is not None:
                col = jax.lax.broadcasted_iota(jnp.int32, (nq, leaves), 1)
                valid_sel = col < state["leaves_dynamic"]
            if partitioner.query_spilling_type != "fixed_number":
                valid_sel = jnp.logical_and(
                    valid_sel, partitioner.spilling_mask(c_sims))
        # Exact f32 q.c_leaf joins per (query, leaf) at merge time
        # (independent of the tokenizer's ranking scores, so int8/upper
        # tokenization never perturbs the returned distances).
        c_sel = jnp.take(state["tx_centers"], leaf_ids, axis=0)
        pair_bias = jnp.einsum("nd,nld->nl", queries, c_sel,
                               precision=jax.lax.Precision.HIGHEST)
        l2 = self.measure == cfg.SQUARED_L2
        if l2:
            pair_bias = 2.0 * pair_bias

        d_pad = state["tx_rows"].shape[-1]
        pad = d_pad - queries.shape[1]
        q_bf = (jnp.pad(queries, ((0, 0), (0, pad))) if pad
                else queries).astype(jnp.bfloat16)

        merge_hot = pruned_scan.HOT_LEAVES
        if nq * leaves <= pruned_scan.QG:
            plan = pruned_scan.invert_small(
                leaf_ids, valid_sel, state["tx_tile_start"],
                state["tx_ntiles"], self._p_max_ntiles)
            merge_hot = leaves
        else:
            g_pad, w_pad = pruned_scan.plan_capacities(
                nq, leaves, num_leaves, self._p_num_tiles,
                self._p_max_ntiles)
            plan = pruned_scan.invert(
                leaf_ids, valid_sel, state["tx_tile_start"],
                state["tx_ntiles"], self._p_max_ntiles, g_pad, w_pad)
        bias2 = state["tx_bias2"]
        if state.get("restrict") is not None:
            # Allowlists fold into the per-slot bias plane (in-kernel exact
            # masking, the lut16_args.h:74-95 role).
            from scann_tpu.ops import fused_scan
            dp = state["tx_dpid"]
            allow = jnp.take(state["restrict"],
                             jnp.clip(dp, 0, state["restrict"].shape[0] - 1))
            allow = jnp.logical_and(allow, dp >= 0)
            bias2 = bias2 + jnp.where(
                allow.reshape(bias2.shape), 0.0, fused_scan._PAD_PENALTY)
        qg_rows = jnp.take(q_bf, plan.qg_query, axis=0)
        k_fetch = min(k_pre, state["tx_dpid"].shape[0])
        # Exact scores need only enough survivors per slot group to cover
        # the final k (no reorder overretrieve): small kpg cuts both the
        # selection passes and the merge gather volume.  kpg=4 holds the
        # within-group collision loss under ~1e-3 at k=10 (a loss needs
        # 5+ of a query's top-k randomly permuted into one SUBP group);
        # kpg=2 measurably drops triples (~1.4% disagreement vs dense).
        kpg = 4 if k_fetch <= 64 else 8
        interp = getattr(self, "_pruned_interpret", False)
        use_pallas = jax.default_backend() == "tpu" or interp
        if use_pallas:
            packed = pruned_sq.score_work_pallas_sq(
                plan, qg_rows, state["tx_rows"], state["tx_scale"], bias2,
                measure_l2=l2, interpret=interp, kpg=kpg)
        else:
            packed = pruned_sq.score_work_xla_sq(
                plan, qg_rows, state["tx_rows"], state["tx_scale"], bias2,
                measure_l2=l2, kpg=kpg)
        if pruned_scan.fused_merge_enabled(k_fetch):
            # Fused merge: one DMA-gather + in-VMEM top-k kernel replaces
            # the stratified XLA gathers (exact for k_fetch <= 32).
            cand_vals, cand_slots = pruned_scan.merge_candidates_fused(
                plan, packed, leaf_ids, valid_sel, state["tx_tile_start"],
                state["tx_ntiles"], self._p_max_ntiles, k_fetch,
                pair_bias=pair_bias, tile=state["tx_rows"].shape[1],
                use_pallas=use_pallas and not interp, interpret=interp)
        else:
            cand_vals, cand_slots = pruned_scan.merge_candidates(
                plan, packed, leaf_ids, valid_sel, state["tx_tile_start"],
                state["tx_ntiles"], self._p_max_ntiles, k_fetch,
                pair_bias=pair_bias, hot=merge_hot,
                tile=state["tx_rows"].shape[1])
        dpids = jnp.where(cand_slots >= 0,
                          jnp.take(state["tx_dpid"],
                                   jnp.maximum(cand_slots, 0)), -1)
        if l2:
            # Restore the rank-invariant -||q||^2 (true squared distances).
            cand_vals = cand_vals - jnp.sum(queries * queries,
                                            axis=-1)[:, None]
        return cand_vals, dpids
