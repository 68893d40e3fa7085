"""Tree-X searcher: partitioning + exact (float32/int8/bf16) leaf scoring.

TPU-native equivalent of the reference's TreeXHybridSMMD with brute-force /
scalar-quantized / bf16 leaves (scann/tree_x_hybrid/tree_x_hybrid_smmd.h:51-130,
leaf builders in base/internal/tree_x_hybrid_factory.cc:416-520).  The same
dense-scan-with-mask design as tree-AH: database rows live leaf-sorted; each
chunk is scored for the full query batch on the MXU and masked by per-query
leaf selection, with a running global top-k merge.
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
        self._finish_deferred_reorder(x_dev, tokens)
        self._build_x_dev = None
        self.datapoint_to_token = tokens[:, None]

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

    def _set_leaf_data(self, rows, leaf, dpid):
        from scann_tpu.utils import transfer
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
        return {"tx_rows": self.slot_rows, "tx_leaf": self.slot_leaf,
                "tx_dpid": self.slot_dpid, "tx_inv_mult": self._inv_mult,
                "tx_sq_norms": self._sq_norms,
                "tx_centers": self.partitioner.centers,
                "tx_centers_int8": self.partitioner.centers_int8,
                "tx_centers_inv_mult": self.partitioner.centers_inv_mult,
                "tx_upper_centers": self.partitioner.upper_centers,
                "tx_upper_assign": self.partitioner.upper_assign}

    def _select_candidates(self, queries, state, k_pre: int, leaves: int,
                           full_scan: bool = False):
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
        q_sq = jnp.sum(queries * queries, axis=-1)
        if inv_mult is not None:
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
            dots = jax.lax.dot_general(
                q, rows_c, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if self.measure == cfg.DOT_PRODUCT:
                sim = dots
            else:
                norms_c = (jax.lax.dynamic_slice_in_dim(sq_norms, start,
                                                        chunk)
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
