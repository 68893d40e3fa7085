"""Exact brute-force searchers (float32 / int8 / bfloat16).

TPU-native equivalents of the reference's scann/brute_force/ searchers:
BruteForceSearcher (brute_force.h:41), ScalarQuantizedBruteForceSearcher
(scalar_quantized_brute_force.h) and Bfloat16BruteForceSearcher
(bfloat16_brute_force.h).  The batched many-to-many SIMD path
(brute_force.cc:369-445 -> DenseDistanceManyToManyTopK) becomes a single
query x database matmul on the MXU with batched top-k; the database is chunked
with lax.map when the (q, n) score matrix would not fit in HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from scann_tpu import config as cfg
from scann_tpu.models import base
from scann_tpu.ops import distance as dist_ops
from scann_tpu.ops import quantize as quant_ops
from scann_tpu.ops import topk as topk_ops

# Chunk the database axis when scoring would materialize more than ~256M
# scores; each chunk's top-k is merged (the reference streams through
# ManyToManyTopK callbacks instead, many_to_many_common.h).
_MAX_SCORES = 1 << 28


class BruteForceSearcher(base.Searcher):
    """Exact search over a float32/bf16/int8 copy of the dataset."""

    def __init__(self, database: np.ndarray, scann_config: cfg.ScannConfig,
                 docids=None):
        super().__init__(database, scann_config, docids)
        if self.projector is None and self._build_x_dev is not None:
            database = self._build_x_dev  # reuse the shared upload
        else:
            database = jnp.asarray(self._project_database(database),
                                   jnp.float32)
        bf = scann_config.brute_force or cfg.BruteForceConfig()
        self.quantize_mode = bf.quantize
        self._inv_mult = None
        self._sq_norms = None
        if database.dtype in (jnp.int8, jnp.uint8):
            # Native typed dataset (reference TypedDataset<T>,
            # dataset.h:219, searched by the templated BruteForceSearcher,
            # brute_force.h:41): rows stay 1 B/dim on device and convert
            # exactly inside the scoring matmul — no float copy exists.
            self._db = database
            if cfg.internal_measure(scann_config.distance_measure) \
                    == cfg.SQUARED_L2:
                self._sq_norms = jnp.sum(
                    database.astype(jnp.float32) ** 2, axis=-1)
        elif bf.quantize == cfg.INT8:
            sq = quant_ops.scalar_quantize(database)
            self._db = sq.data
            self._inv_mult = sq.inverse_multipliers
            self._sq_norms = sq.sq_norms
        elif bf.quantize == cfg.BFLOAT16:
            self._db = database.astype(jnp.bfloat16)
            self._sq_norms = jnp.sum(database ** 2, axis=-1)
        else:
            self._db = database
        self._valid = jnp.ones((database.shape[0],), bool)
        self._build_x_dev = None

    def _extra_state(self):
        return {"bf_db": self._db, "bf_inv_mult": self._inv_mult,
                "bf_sq_norms": self._sq_norms, "bf_valid": self._valid}

    # ----------------------------------------------------------- mutation
    def _apply_upsert(self, ids: np.ndarray, vecs: np.ndarray):
        raw = np.asarray(vecs, np.float32)
        vecs = np.asarray(self._project_database(raw))
        cap = self._db.shape[0]
        need = int(ids.max()) + 1
        if need > cap:
            grow = max(need - cap, cap // 5 + 1)
            self._db = jnp.concatenate(
                [self._db, jnp.zeros((grow, self._db.shape[1]),
                                     self._db.dtype)], axis=0)
            if self._sq_norms is not None:
                self._sq_norms = jnp.concatenate(
                    [self._sq_norms, jnp.zeros((grow,),
                                               self._sq_norms.dtype)])
            self._valid = jnp.concatenate(
                [self._valid, jnp.zeros((grow,), bool)])
        idx = jnp.asarray(ids, jnp.int32)
        rows = jnp.asarray(vecs, jnp.float32)
        if self.quantize_mode == cfg.INT8:
            q = jnp.clip(jnp.round(rows / self._inv_mult[None, :]),
                         -127, 127).astype(jnp.int8)
            self._db = self._db.at[idx].set(q)
            deq = q.astype(jnp.float32) * self._inv_mult[None, :]
            self._sq_norms = self._sq_norms.at[idx].set(
                jnp.sum(deq * deq, axis=-1))
        elif self._typed_dtype is not None:
            info = jnp.iinfo(self._typed_dtype)
            q = jnp.clip(jnp.round(rows), info.min, info.max).astype(
                self._typed_dtype)
            self._db = self._db.at[idx].set(q)
            if self._sq_norms is not None:
                qf = q.astype(jnp.float32)
                self._sq_norms = self._sq_norms.at[idx].set(
                    jnp.sum(qf * qf, axis=-1))
        else:
            self._db = self._db.at[idx].set(rows.astype(self._db.dtype))
            if self._sq_norms is not None:
                self._sq_norms = self._sq_norms.at[idx].set(
                    jnp.sum(rows * rows, axis=-1))
        self._valid = self._valid.at[idx].set(True)
        if self.reorder_helper is not None:
            self.reorder_helper.ensure_capacity(need)
            self.reorder_helper.update_rows(ids, raw)

    def _apply_delete(self, ids: np.ndarray):
        self._valid = self._valid.at[jnp.asarray(ids, jnp.int32)].set(False)

    @property
    def _typed_dtype(self):
        """Native typed-dataset mode: int8/uint8 rows WITHOUT scalar-
        quantization multipliers (those are quantize_mode == int8)."""
        if (self.quantize_mode in (None, cfg.FLOAT32)
                and self._db.dtype in (jnp.int8, jnp.uint8)):
            return self._db.dtype
        return None

    def _scores(self, queries, state):
        db = state["bf_db"]
        inv_mult = state["bf_inv_mult"]
        sq_norms = state["bf_sq_norms"]
        measure = cfg.internal_measure(
            self.config.distance_measure)
        if self._typed_dtype is not None:
            # Typed rows convert exactly inside the fused matmul (int8/
            # uint8 values are exact in f32); scoring is EXACT like the
            # reference's templated typed search.
            return dist_ops.similarity(
                queries, db.astype(jnp.float32), measure,
                db_sq_norms=sq_norms,
                query_sq_norms=(jnp.sum(queries * queries, axis=-1)
                                if sq_norms is not None else None),
                precision=jax.lax.Precision.HIGHEST)
        if self.quantize_mode == cfg.INT8:
            # Reference folds the inverse multipliers into the query and runs
            # the int8 x float asymmetric kernel
            # (scalar_quantized_brute_force.cc:230-322); here the int8 rows
            # dequantize into a bf16 matmul operand fused by XLA.  The true
            # query norm is supplied separately since the scaled query's norm
            # is meaningless.
            q = queries * inv_mult[None, :]
            return dist_ops.similarity(
                q, db, measure, db_sq_norms=sq_norms,
                query_sq_norms=jnp.sum(queries * queries, axis=-1),
                precision=jax.lax.Precision.DEFAULT)
        if self.quantize_mode == cfg.BFLOAT16:
            return dist_ops.similarity(
                queries.astype(jnp.bfloat16), db, measure,
                db_sq_norms=sq_norms,
                query_sq_norms=jnp.sum(queries * queries, axis=-1),
                precision=jax.lax.Precision.DEFAULT)
        return dist_ops.similarity(queries, db, measure,
                                   precision=jax.lax.Precision.HIGHEST)

    def _select_candidates(self, queries, state, k_pre, leaves,
                           full_scan=False):
        del leaves
        nq = queries.shape[0]
        n = state["bf_db"].shape[0]
        # L1 has no matmul decomposition: the (q, chunk, d) elementwise
        # block is the live cost, so chunk d-times smaller.
        cost = (state["bf_db"].shape[1]
                if cfg.internal_measure(self.config.distance_measure)
                == cfg.L1 else 1)
        if nq * n * cost <= _MAX_SCORES:
            sim = self._scores(queries, state)
            valid = state["bf_valid"]
            if state.get("restrict") is not None:
                r = state["restrict"]
                valid = jnp.logical_and(
                    valid, jnp.pad(r, (0, n - r.shape[0]),
                                   constant_values=False))
            return topk_ops.top_k_with_invalid(
                sim, min(k_pre, n), valid=valid[None, :])
        # Chunked scan over the database axis with running top-k merge.
        chunk = max(1, _MAX_SCORES // (nq * cost))
        chunk = min(chunk, n)
        num_chunks = -(-n // chunk)
        pad_n = num_chunks * chunk

        db = state["bf_db"]
        if pad_n != n:
            db = jnp.pad(db, ((0, pad_n - n), (0, 0)))
        sq_norms = state["bf_sq_norms"]
        if sq_norms is not None and pad_n != n:
            sq_norms = jnp.pad(sq_norms, (0, pad_n - n))
        valid_padded = jnp.pad(state["bf_valid"], (0, pad_n - n))
        if state.get("restrict") is not None:
            r = state["restrict"]
            valid_padded = jnp.logical_and(
                valid_padded, jnp.pad(r, (0, pad_n - r.shape[0]),
                                      constant_values=False))

        measure = cfg.internal_measure(
            self.config.distance_measure)
        inv_mult = state["bf_inv_mult"]
        q = queries
        q_sq = None
        if inv_mult is not None:
            q = queries * inv_mult[None, :]
            q_sq = jnp.sum(queries * queries, axis=-1)
        elif db.dtype == jnp.bfloat16:
            q = queries.astype(jnp.bfloat16)
            q_sq = jnp.sum(queries * queries, axis=-1)

        def body(carry, ci):
            vals, idx = carry
            rows = jax.lax.dynamic_slice_in_dim(db, ci * chunk, chunk)
            norms = (jax.lax.dynamic_slice_in_dim(sq_norms, ci * chunk, chunk)
                     if sq_norms is not None else None)
            prec = (jax.lax.Precision.HIGHEST
                    if self.quantize_mode == cfg.FLOAT32
                    else jax.lax.Precision.DEFAULT)
            sim = dist_ops.similarity(q, rows, measure, db_sq_norms=norms,
                                      query_sq_norms=q_sq, precision=prec)
            base_idx = ci * chunk
            valid_c = jax.lax.dynamic_slice_in_dim(valid_padded, base_idx,
                                                   chunk)
            cvals, cpos = topk_ops.chunk_top_k(
                sim, min(k_pre, chunk), valid=valid_c[None, :])
            cidx = jnp.where(cpos >= 0, base_idx + cpos,
                             topk_ops.INVALID_INDEX)
            return topk_ops.merge_top_k(vals, idx, cvals, cidx, k_pre), None

        init_vals = jnp.full((nq, k_pre), -jnp.inf, jnp.float32)
        init_idx = jnp.full((nq, k_pre), topk_ops.INVALID_INDEX, jnp.int32)
        (vals, idx), _ = jax.lax.scan(
            body, (init_vals, init_idx), jnp.arange(num_chunks))
        return vals, idx
