"""Searcher base: the FindNeighbors pipeline.

TPU-native equivalent of the reference's SingleMachineSearcherBase
(scann/base/single_machine_base.h:69-677): the pipeline is
``score-and-select -> reorder -> sort-and-drop``
(single_machine_base.cc:399-424, ReorderResults :850, SortAndDropResults
:872).  Where the reference dispatches per query over a thread pool, here the
whole batch is one jitted XLA program; per-(k, leaves) overrides become static
arguments of the compiled program, cached per distinct value.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from scann_tpu import config as cfg
from scann_tpu.ops import distance as dist_ops
from scann_tpu.ops import quantize as quant_ops
from scann_tpu.ops import topk as topk_ops


def _next_bucket(n: int) -> int:
    """Pad query batches to power-of-two buckets to bound recompilation."""
    b = 8
    while b < n:
        b *= 2
    return b


class PendingSearch:
    """Handle for an in-flight batched search: the device program is
    already dispatched; .result() materializes the outputs (the one
    host<->device sync) and runs the host-side postprocessing.  Dispatch
    batch N+1 before calling batch N's .result() to double-buffer the
    device (the serving layer and bench use exactly this)."""

    __slots__ = ("_finalize", "_result")

    def __init__(self, finalize):
        self._finalize = finalize
        self._result = None

    def result(self):
        if self._finalize is not None:
            self._result = self._finalize()
            self._finalize = None
        return self._result


# Device-batch cap for the pruned leaf-gather path (its work-plan scratch
# arrays scale with batch * leaves_to_search).  Larger batches also RAISE
# kernel efficiency: leaf-major query groups fill toward QG=128 live
# lanes as batch * leaves / num_leaves grows, so the scoring matmul's
# wasted lanes shrink while the per-tile work stays constant (measured at
# glove scale, exact-sq engine: 522k QPS at 8192 -> 705k at 16384 -> 917k
# at 32768 -> 1.43M at 65536 for leaves=2).  Small calls are unaffected
# (they bucket to the next power of two, not to this cap); the cap bounds
# the plan/packed scratch of huge offline batches.
_PRUNED_MAX_BATCH = 65536
# The plan/packed scratch (and the compiler's HLO temps) grow with
# batch * leaves: 65536 x 20 compiles on a v5e chip, 65536 x 50 OOMs at
# compile time.  Dispatches halve the batch cap until the pair product
# fits this proven budget (32768 x 50).
_PRUNED_PAIR_BUDGET = 32768 * 50


def pruned_dispatch_cap(leaves: int) -> int:
    """Largest pruned dispatch batch for a given leaves_to_search.

    The pair budget is honored all the way down to a 1024 floor (the
    budget only binds above 1600 leaves there), so batch * leaves never
    exceeds the proven compile-memory budget for any realistic
    leaves_to_search (ADVICE r3: an 8192 floor left 8192 * 400 = 3.3M
    pairs reachable vs the 1.64M proven budget)."""
    cap = _PRUNED_MAX_BATCH
    while cap > 1024 and cap * max(int(leaves), 1) > _PRUNED_PAIR_BUDGET:
        cap //= 2
    return cap


def _row_quantize(delta):
    """Per-row symmetric int8: codes = round(delta / scale), scale =
    max|delta_d| / 127 per row (0 for all-zero rows).  Returns (int8
    codes, (n,) f32 dequant scale)."""
    m = jnp.max(jnp.abs(delta), axis=-1)
    scale = m / 127.0
    inv = jnp.where(m > 0, 127.0 / jnp.maximum(m, 1e-30), 0.0)
    q8 = jnp.clip(jnp.round(delta * inv[:, None]), -127, 127
                  ).astype(jnp.int8)
    return q8, scale


class ReorderHelper:
    """Exact/int8/bf16 reordering of candidate lists.

    Reference: ExactReorderingHelper / FixedPointFloatDenseDotProduct- /
    Bfloat16ReorderingHelper (utils/reordering_helper.h:48-157) selected by
    base/reordering_helper_factory.cc.  Owns a compressed copy of the dataset
    and rescores gathered candidate rows on the MXU.
    """

    def __init__(self, database: np.ndarray, measure: str,
                 reorder_cfg: cfg.ReorderConfig,
                 residual_tokens=None, centers=None):
        import math as _math
        self.measure = measure
        self.config = reorder_cfg
        self._leaf = None
        self._centers = None
        self._row_scale = None
        if (reorder_cfg.quantize == cfg.INT8
                and residual_tokens is not None and centers is not None):
            # RESIDUAL int8 reordering (TPU redesign; no reference
            # analogue): quantize x - c_primary instead of x.  Residual
            # norms are a fraction of row norms on clustered data, so the
            # per-dimension int8 steps are several times finer, and the
            # exact q.c_leaf term is added back at rescore time from the
            # float centroids.  Measured on the glove-scale bench this
            # recovers nearly all of the ~3.7pt recall the raw int8
            # rescore loses vs exact f32 rescore, at +4 B/vector (the
            # primary leaf id).  Requires a partitioner and no projection
            # (reorder rows are pre-projection).
            tokens = jnp.asarray(residual_tokens, jnp.int32)
            c = jnp.asarray(centers, jnp.float32)
            x = jnp.asarray(database, jnp.float32)
            c_rows = jnp.take(c, tokens, axis=0)
            delta = x - c_rows
            # Per-ROW scale (max|delta_d| / 127): unlike global per-dim
            # multipliers, a far-from-centroid outlier row coarsens only
            # its own steps — measured ~1.7x lower rescore error on top of
            # the residual gain.
            q8, scale = _row_quantize(delta)
            self._db = q8
            self._inv_mult = None
            self._row_scale = scale
            self._leaf = tokens
            self._centers = c
            # ||x_hat||^2 of the RECONSTRUCTED row c + delta_hat (L2 path).
            deq = q8.astype(jnp.float32) * scale[:, None] + c_rows
            self._sq_norms = jnp.sum(deq * deq, axis=-1)
        elif reorder_cfg.quantize == cfg.INT8:
            thr = reorder_cfg.anisotropic_quantization_threshold
            if not _math.isnan(thr):
                # Noise-shaped int8 reordering dataset (reference:
                # exact_reordering fixed_point noise_shaping_threshold).
                # NOT wrapped in an outer jit: at large n the quantizer
                # host-loops bounded per-chunk programs (ops/quantize.py
                # _NOISE_SHAPING_CHUNK) to stay under the TPU runtime's
                # program hang watchdog.
                sq = quant_ops.scalar_quantize_noise_shaped(
                    jnp.asarray(database), thr)
            else:
                sq = quant_ops.scalar_quantize(jnp.asarray(database))
            self._db = sq.data
            self._inv_mult = sq.inverse_multipliers
            self._sq_norms = sq.sq_norms
        elif reorder_cfg.quantize == cfg.BFLOAT16:
            self._db = jnp.asarray(database, dtype=jnp.bfloat16)
            self._inv_mult = None
            self._sq_norms = jnp.sum(
                jnp.asarray(database, jnp.float32) ** 2, axis=-1)
        else:
            self._db = jnp.asarray(database, dtype=jnp.float32)
            self._inv_mult = None
            self._sq_norms = None

    def state(self):
        """Device arrays as a pytree (passed as jit arguments rather than
        closed over, so compiled programs do not embed the dataset)."""
        return {"db": self._db, "inv_mult": self._inv_mult,
                "sq_norms": self._sq_norms, "leaf": self._leaf,
                "centers": self._centers, "row_scale": self._row_scale}

    def ensure_capacity(self, n: int) -> bool:
        """Grow the compressed dataset to hold at least n rows.  Returns
        True if a re-allocation happened (callers must invalidate compiled
        programs)."""
        cap = self._db.shape[0]
        if n <= cap:
            return False
        new_cap = max(n, int(cap * 1.2) + 128)
        self._db = jnp.concatenate(
            [self._db, jnp.zeros((new_cap - cap, self._db.shape[1]),
                                 self._db.dtype)], axis=0)
        if self._sq_norms is not None:
            self._sq_norms = jnp.concatenate(
                [self._sq_norms, jnp.zeros((new_cap - cap,),
                                           self._sq_norms.dtype)])
        if self._leaf is not None:
            self._leaf = jnp.concatenate(
                [self._leaf, jnp.zeros((new_cap - cap,), jnp.int32)])
        if self._row_scale is not None:
            self._row_scale = jnp.concatenate(
                [self._row_scale, jnp.zeros((new_cap - cap,), jnp.float32)])
        return True

    def update_rows(self, ids, rows, tokens=None):
        """Write/overwrite rows (mutator path; multipliers stay fixed like
        the reference's int8 mutators, scalar_quantized_brute_force_mutator
        .cc).  Residual mode needs the rows' primary leaf ``tokens``."""
        ids = jnp.asarray(ids, jnp.int32)
        rows_f = jnp.asarray(rows, jnp.float32)
        if self._leaf is not None:
            if tokens is None:
                raise ValueError(
                    "residual int8 reordering requires primary tokens on "
                    "update_rows")
            tok = jnp.asarray(tokens, jnp.int32)
            c_rows = jnp.take(self._centers, tok, axis=0)
            delta = rows_f - c_rows
            q, scale = _row_quantize(delta)
            self._db = self._db.at[ids].set(q)
            self._row_scale = self._row_scale.at[ids].set(scale)
            deq = q.astype(jnp.float32) * scale[:, None] + c_rows
            self._sq_norms = self._sq_norms.at[ids].set(
                jnp.sum(deq * deq, axis=-1))
            self._leaf = self._leaf.at[ids].set(tok)
        elif self._inv_mult is not None:
            q = jnp.clip(jnp.round(rows_f / self._inv_mult[None, :]),
                         -127, 127).astype(jnp.int8)
            self._db = self._db.at[ids].set(q)
            deq = q.astype(jnp.float32) * self._inv_mult[None, :]
            self._sq_norms = self._sq_norms.at[ids].set(
                jnp.sum(deq * deq, axis=-1))
        elif self._db.dtype == jnp.bfloat16:
            self._db = self._db.at[ids].set(rows_f.astype(jnp.bfloat16))
            self._sq_norms = self._sq_norms.at[ids].set(
                jnp.sum(rows_f * rows_f, axis=-1))
        else:
            self._db = self._db.at[ids].set(rows_f)
            if self._sq_norms is not None:
                self._sq_norms = self._sq_norms.at[ids].set(
                    jnp.sum(rows_f * rows_f, axis=-1))

    def rescore(self, queries, candidate_idx, state):
        """(q, d) x (q, k_pre) -> (q, k_pre) exact similarities."""
        db = state["db"]
        inv_mult = state["inv_mult"]
        sq_norms = state["sq_norms"]
        if state.get("leaf") is not None:
            # Residual int8: q.x_hat = q.c_leaf (exact f32, one small
            # centroid matmul) + scale_row * (q . int8_row).
            valid = candidate_idx >= 0
            safe = jnp.where(valid, candidate_idx, 0)
            qd = dist_ops.one_to_many_gathered(
                queries, db, candidate_idx,
                cfg.DOT_PRODUCT, precision=jax.lax.Precision.HIGHEST)
            qd = qd * jnp.take(state["row_scale"],
                               safe.reshape(-1)).reshape(safe.shape)
            qc = jax.lax.dot_general(
                queries, state["centers"],
                dimension_numbers=(((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)  # (q, L)
            cl = jnp.take(state["leaf"], safe.reshape(-1)).reshape(
                safe.shape)
            bias = jnp.take_along_axis(qc, cl, axis=-1)
            dots = jnp.where(valid, qd + bias, -jnp.inf)
            if self.measure == cfg.DOT_PRODUCT:
                return dots
            row_sq = jnp.take(sq_norms, safe.reshape(-1)).reshape(
                safe.shape)
            q_sq = jnp.sum(queries * queries, axis=-1, keepdims=True)
            sim = -jnp.maximum(q_sq - 2.0 * dots + row_sq, 0.0)
            return jnp.where(valid, sim, -jnp.inf)
        q_sq = None
        if inv_mult is not None:
            # Fold the inverse multipliers into the query so the cross term
            # is q . dequant(x); the query norm must come from the original
            # query (one_to_many_asymmetric.h int8 kernels do the same).
            q = queries * inv_mult[None, :]
            q_sq = jnp.sum(queries * queries, axis=-1)
        elif db.dtype == jnp.bfloat16:
            q = queries.astype(jnp.bfloat16)
            q_sq = jnp.sum(queries * queries, axis=-1)
        else:
            q = queries
        return dist_ops.one_to_many_gathered(
            q, db, candidate_idx, self.measure, db_sq_norms=sq_norms,
            query_sq_norms=q_sq, precision=jax.lax.Precision.HIGHEST)


class Searcher:
    """Base searcher; subclasses implement _select_candidates()."""

    def __init__(self, database: np.ndarray, scann_config: cfg.ScannConfig,
                 docids=None):
        self.config = scann_config
        self.n_points, self.dims = database.shape
        self.docids = list(docids) if docids is not None else None
        if self.docids is not None and len(self.docids) != self.n_points:
            raise ValueError("docids must have one entry per database row")
        # ONE device upload of the database shared by every build phase
        # (reorder quantization, partitioner training, tokenize/encode):
        # host->device transfer is the scarcest build resource on a
        # tunneled TPU, and each redundant upload of the full database
        # costs minutes at scale.  Chunked: single large transfers can
        # wedge a remote PJRT worker (utils/transfer.py).  Subclasses
        # clear it when the build finishes.
        from scann_tpu.utils import transfer
        self._build_x_dev = transfer.to_device(
            database,
            dtype=(jnp.int8 if database.dtype == np.int8 else
                   jnp.uint8 if database.dtype == np.uint8 else
                   jnp.float32))
        self.reorder_helper: Optional[ReorderHelper] = None
        self._reorder_deferred = False
        if scann_config.reordering is not None:
            # Reordering always rescoring against the *original* vectors
            # (the reference attaches exact_reordering outside the
            # projection, reordering_helper_factory.cc).
            ro = scann_config.reordering
            if (ro.quantize == cfg.INT8
                    and getattr(ro, "residual", True)
                    and scann_config.partitioning is not None
                    and scann_config.projection is None):
                # Residual int8 reordering needs the primary tokens:
                # the subclass build creates the helper once tokenization
                # is done (see TreeAHSearcher._build).
                self._reorder_deferred = True
            else:
                self.reorder_helper = ReorderHelper(
                    self._build_x_dev, cfg.internal_measure(
                        scann_config.distance_measure),
                    scann_config.reordering)
        self.projector = None
        if scann_config.projection is not None:
            from scann_tpu.ops import projection as proj_ops
            self.projector = proj_ops.train_projection(
                database, scann_config.projection, seed=scann_config.seed)
        self._enable_mutation(database, self.docids)
        self._crowding_attrs = None
        self._compiled = {}

    def set_crowding(self, attributes):
        """Attach per-datapoint crowding attributes (reference:
        EnableCrowding, base/single_machine_base.h:126-163; multi-
        dimensional variant utils/crowding_multi_dimensional.h:30).
        attributes: (n_points,) int32 or (n_points, num_dims) int32;
        result caps are then requested per search via
        ``per_crowding_attribute_num_neighbors`` (an int, or one int per
        dimension)."""
        attributes = np.asarray(attributes, np.int32)
        if attributes.ndim == 1:
            attributes = attributes[:, None]
        if attributes.ndim != 2 or attributes.shape[0] != self.n_points:
            raise ValueError(
                f"crowding attributes must have shape ({self.n_points},) "
                f"or ({self.n_points}, num_dims)")
        self._crowding_attrs = jnp.asarray(attributes)

    def _project_database(self, database: np.ndarray) -> np.ndarray:
        if self.projector is None:
            return database
        return np.asarray(self.projector.project(
            jnp.asarray(database, jnp.float32)))

    def _project_queries(self, queries, state):
        if self.projector is None:
            return queries
        proj = self.projector
        if state.get("proj_matrix") is not None:
            proj = proj._replace(matrix=state["proj_matrix"])
        return proj.project(queries)

    # -------------------------------------------------------- overridables
    def _select_candidates(self, queries, state, k_pre: int, leaves: int,
                           full_scan: bool = False):
        """Return (similarities, indices), each (q, >=k_pre), best-first not
        required; indices may contain INVALID_INDEX."""
        raise NotImplementedError

    def _extra_state(self):
        """Subclass device arrays, merged into the jit-argument pytree."""
        return {}

    def _state(self):
        st = dict(self._extra_state())
        if self.reorder_helper is not None:
            st["reorder"] = self.reorder_helper.state()
        if self.projector is not None:
            st["proj_matrix"] = self.projector.matrix
        return st

    def _default_leaves(self) -> int:
        return 0

    def _finish_deferred_reorder(self, x_dev, tokens):
        """Create the residual int8 reorder helper once the primary
        tokenization exists (see ReorderHelper residual mode)."""
        if not self._reorder_deferred:
            return
        self.reorder_helper = ReorderHelper(
            x_dev, cfg.internal_measure(self.config.distance_measure),
            self.config.reordering, residual_tokens=tokens,
            centers=self.partitioner.centers)
        self._reorder_deferred = False

    def _prepare_for_query(self, bucket: int, leaves: int, full_scan: bool,
                           restricted: bool, pre_tokenized: bool):
        """Hook: materialize whichever device layouts the compiled program
        for this (batch, leaves, mode) will read.  Default: nothing."""
        del bucket, leaves, full_scan, restricted, pre_tokenized

    def _register_centers(self, centers_np: np.ndarray):
        """Install a grown/modified center set on the partitioner and
        propagate num_leaves through part_cfg/config (int8 centroids and
        upper-tree assignment recomputed).  Shared by every partitioned
        searcher whose build splits oversized leaves."""
        import dataclasses
        centers_int8 = inv_mult = None
        if self.partitioner.centers_int8 is not None:
            from scann_tpu.ops import quantize as quant_ops
            sq = quant_ops.scalar_quantize(jnp.asarray(centers_np))
            centers_int8, inv_mult = sq.data, sq.inverse_multipliers
        upper_assign = self.partitioner.upper_assign
        if upper_assign is not None:
            old_n = upper_assign.shape[0]
            if centers_np.shape[0] > old_n:
                up = np.asarray(self.partitioner.upper_centers)
                new_c = centers_np[old_n:]
                d = ((new_c[:, None, :] - up[None, :, :]) ** 2).sum(-1)
                if upper_assign.ndim == 2:  # SOAR-spilled upper assignment
                    two = np.argsort(d, axis=1)[:, :2].astype(np.int32)
                    upper_assign = jnp.concatenate(
                        [upper_assign, jnp.asarray(two)], axis=0)
                else:
                    upper_assign = jnp.concatenate(
                        [upper_assign,
                         jnp.asarray(d.argmin(1).astype(np.int32))])
        self.partitioner = self.partitioner._replace(
            centers=jnp.asarray(centers_np), centers_int8=centers_int8,
            centers_inv_mult=inv_mult, upper_assign=upper_assign)
        if (self.reorder_helper is not None
                and self.reorder_helper._leaf is not None):
            # Residual reordering biases q.c_leaf against these centers.
            self.reorder_helper._centers = self.partitioner.centers
        self.part_cfg = dataclasses.replace(
            self.part_cfg, num_leaves=centers_np.shape[0])
        self.config = dataclasses.replace(self.config,
                                          partitioning=self.part_cfg)
        if getattr(self, "_leaf_mutations", None) is not None:
            grow = centers_np.shape[0] - len(self._leaf_mutations)
            if grow > 0:
                self._leaf_mutations = np.concatenate(
                    [self._leaf_mutations, np.zeros((grow,), np.int64)])

    # ------------------------------------------------------------ pipeline
    def _search_impl(self, queries, state, k: int, k_pre: int, leaves: int,
                     crowding_limit=(), full_scan: bool = False,
                     pre_crowding_limit=()):
        # Candidate selection runs in the (possibly projected) index space;
        # exact reordering below uses the raw queries.
        q_proj = self._project_queries(queries, state)
        sim, idx = self._select_candidates(q_proj, state, k_pre, leaves,
                                           full_scan=full_scan)
        if self.reorder_helper is not None:
            # Keep the best k_pre, rescore exactly, then take final k
            # (reference: ReorderResults, single_machine_base.cc:850).
            if sim.shape[-1] > k_pre:
                sim, pos = jax.lax.top_k(sim, k_pre)
                idx = jnp.take_along_axis(idx, pos, axis=-1)
            # Per-query SearchParameters applied before reorder
            # (reference: SearchParameters pre_reordering_num_neighbors /
            # pre_reordering_epsilon, base/search_parameters.h:40-226) —
            # the candidate list is sorted best-first here, so a per-query
            # k_pre is a column mask.
            if state.get("k_pre_vec") is not None:
                if sim.shape[-1] > 1:
                    order = jnp.argsort(-sim, axis=-1)
                    sim = jnp.take_along_axis(sim, order, axis=-1)
                    idx = jnp.take_along_axis(idx, order, axis=-1)
                col = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
                keep = col < state["k_pre_vec"][:, None]
                sim = jnp.where(keep, sim, -jnp.inf)
                idx = jnp.where(keep, idx, topk_ops.INVALID_INDEX)
            if state.get("pre_epsilon") is not None:
                keep = sim >= state["pre_epsilon"][:, None]
                sim = jnp.where(keep, sim, -jnp.inf)
                idx = jnp.where(keep, idx, topk_ops.INVALID_INDEX)
            if pre_crowding_limit and state.get("crowding_attrs") is not None:
                # PRE-reordering crowding: cap per attribute on the AH
                # scores before the exact rescore (reference:
                # per_crowding_attribute_pre_reordering_num_neighbors,
                # single_machine_base.h:126-163).
                attrs = jnp.take(state["crowding_attrs"],
                                 jnp.maximum(idx, 0), axis=0)
                sim, idx = topk_ops.crowding_filter_multi(
                    sim, idx, attrs, pre_crowding_limit)
            sim = self.reorder_helper.rescore(queries, idx, state["reorder"])
        if crowding_limit and state.get("crowding_attrs") is not None:
            attrs = jnp.take(state["crowding_attrs"],
                             jnp.maximum(idx, 0), axis=0)  # (q, k, A)
            sim, idx = topk_ops.crowding_filter_multi(sim, idx, attrs,
                                                      crowding_limit)
        kk = min(k, sim.shape[-1])
        vals, pos = jax.lax.top_k(sim, kk)
        idx = jnp.take_along_axis(idx, pos, axis=-1)
        idx = jnp.where(jnp.isneginf(vals), topk_ops.INVALID_INDEX, idx)
        dist = dist_ops.similarity_to_user_distance(
            vals, self.config.distance_measure)
        dist = jnp.where(idx == topk_ops.INVALID_INDEX, jnp.nan, dist)
        if kk < k:
            pad = k - kk
            idx = jnp.pad(idx, ((0, 0), (0, pad)),
                          constant_values=topk_ops.INVALID_INDEX)
            dist = jnp.pad(dist, ((0, 0), (0, pad)),
                           constant_values=np.nan)
        return idx, dist

    def _get_compiled(self, batch: int, k: int, k_pre: int, leaves: int,
                      crowding_limit=(), full_scan: bool = False,
                      pre_crowding_limit=()):
        key = (batch, k, k_pre, leaves, crowding_limit, full_scan,
               pre_crowding_limit)
        fn = self._compiled.get(key)
        if fn is None:
            fn = jax.jit(functools.partial(
                self._search_impl, k=k, k_pre=k_pre, leaves=leaves,
                crowding_limit=crowding_limit, full_scan=full_scan,
                pre_crowding_limit=pre_crowding_limit))
            self._compiled[key] = fn
        return fn

    def _resolve_params(self, final_num_neighbors, pre_reorder_num_neighbors,
                        leaves_to_search):
        k = self.config.num_neighbors
        if final_num_neighbors is not None and final_num_neighbors > 0:
            k = final_num_neighbors
        if self.reorder_helper is not None:
            k_pre = self.reorder_helper.config.reordering_num_neighbors
        else:
            k_pre = k
        if (pre_reorder_num_neighbors is not None
                and pre_reorder_num_neighbors > 0):
            k_pre = pre_reorder_num_neighbors
        k_pre = max(k_pre, k)
        leaves = self._default_leaves()
        if leaves_to_search is not None and leaves_to_search > 0:
            leaves = leaves_to_search
        return k, k_pre, leaves

    # ------------------------------------------------------------- public
    def search_batched(self, queries, final_num_neighbors=None,
                       pre_reorder_num_neighbors=None, leaves_to_search=None,
                       restrict_allowlist=None,
                       per_crowding_attribute_num_neighbors=None,
                       pre_tokenized_leaves=None,
                       post_reordering_epsilon=None,
                       pre_reordering_epsilon=None,
                       per_crowding_attribute_pre_reordering_num_neighbors
                       =None):
        """Batched search (see search_batched_async for the full parameter
        docs); dispatches and blocks for the results."""
        return self.search_batched_async(
            queries, final_num_neighbors, pre_reorder_num_neighbors,
            leaves_to_search, restrict_allowlist,
            per_crowding_attribute_num_neighbors, pre_tokenized_leaves,
            post_reordering_epsilon, pre_reordering_epsilon,
            per_crowding_attribute_pre_reordering_num_neighbors).result()

    def search_batched_async(self, queries, final_num_neighbors=None,
                             pre_reorder_num_neighbors=None,
                             leaves_to_search=None,
                             restrict_allowlist=None,
                             per_crowding_attribute_num_neighbors=None,
                             pre_tokenized_leaves=None,
                             post_reordering_epsilon=None,
                             pre_reordering_epsilon=None,
                             per_crowding_attribute_pre_reordering_num_neighbors
                             =None):
        """Batched search; mirrors ScannSearcher.search_batched
        (scann_ops_pybind.py:67-90).  ASYNC: the device program is
        dispatched (JAX dispatch is asynchronous) and a PendingSearch is
        returned whose .result() materializes (indices, distances) numpy
        arrays of shape (num_queries, k) — dispatch batch N+1 before
        resolving batch N and the device never idles between batches
        (double-buffered serving; the reference overlaps batches with its
        query thread pool, scann.cc:478-501).

        restrict_allowlist: optional (n_points,) bool mask restricting
        results to allowed datapoints (reference: RestrictAllowlist,
        restricts/restrict_allowlist.h:46-110).
        per_crowding_attribute_num_neighbors: optional cap on results per
        crowding attribute (requires set_crowding; reference:
        SearchParameters::per_crowding_attribute_post_reordering_num_
        neighbors, base/search_parameters.h).
        pre_tokenized_leaves: optional (num_queries, L) int32 of leaf ids
        to search per query, skipping query tokenization; -1 entries mean
        "search fewer leaves for this query" (reference:
        TreeXOptionalParameters::EnablePreTokenization,
        tree_x_hybrid/tree_x_params.h:35-45 — this is also the per-query
        leaves_to_search override).
        post_reordering_epsilon: optional distance cutoff applied to the
        final (reordered) results (reference: SearchParameters
        post_reordering_epsilon, base/search_parameters.h:40-226): under
        dot_product, results with dot < epsilon are dropped; under
        squared_l2/cosine, results with distance > epsilon are dropped.

        Per-QUERY SearchParameters (reference: the per-query
        SearchParameters vector of FindNeighborsBatched,
        search_parameters.h:40-226): final_num_neighbors,
        pre_reorder_num_neighbors, pre_reordering_epsilon and
        post_reordering_epsilon each also accept a (num_queries,) array;
        the compiled program is sized by the max and the per-query values
        apply as masks.  pre_reordering_epsilon drops candidates whose
        APPROXIMATE distance fails the cutoff before the exact rescore;
        per_crowding_attribute_pre_reordering_num_neighbors caps
        per-attribute candidates before reorder (single_machine_base.h:
        126-163)."""
        queries = np.asarray(queries, dtype=np.float32)
        if queries.ndim != 2:
            raise ValueError(f"queries must be 2d, got shape {queries.shape}")

        def _vec_param(v, name):
            """Split an int-or-(nq,)-array param into (static_max, vec)."""
            if v is None or np.isscalar(v):
                return v, None
            arr = np.asarray(v, np.int32)
            if arr.shape != (queries.shape[0],):
                raise ValueError(
                    f"{name} must be an int or a (num_queries,) array, "
                    f"got shape {arr.shape}")
            return int(arr.max()), arr

        final_num_neighbors, k_vec = _vec_param(final_num_neighbors,
                                                "final_num_neighbors")
        pre_reorder_num_neighbors, k_pre_vec = _vec_param(
            pre_reorder_num_neighbors, "pre_reorder_num_neighbors")
        if self.config.distance_measure == cfg.COSINE:
            norms = np.linalg.norm(queries, axis=1, keepdims=True)
            queries = queries / np.maximum(norms, 1e-20)
        if queries.shape[1] != self.query_dims:
            raise ValueError(
                f"query dimensionality {queries.shape[1]} does not match "
                f"database dimensionality {self.query_dims}")
        k, k_pre, leaves = self._resolve_params(
            final_num_neighbors, pre_reorder_num_neighbors, leaves_to_search)
        crowding_limit = ()
        if per_crowding_attribute_num_neighbors is not None:
            if self._crowding_attrs is None:
                raise ValueError(
                    "call set_crowding(attributes) before searching with "
                    "per_crowding_attribute_num_neighbors")
            lim = per_crowding_attribute_num_neighbors
            num_dims = self._crowding_attrs.shape[1]
            if np.isscalar(lim):
                crowding_limit = (int(lim),) * num_dims
            else:
                crowding_limit = tuple(int(x) for x in lim)
                if len(crowding_limit) != num_dims:
                    raise ValueError(
                        f"expected {num_dims} crowding limits, got "
                        f"{len(crowding_limit)}")
        pre_crowding_limit = ()
        if per_crowding_attribute_pre_reordering_num_neighbors is not None:
            if self._crowding_attrs is None:
                raise ValueError(
                    "call set_crowding(attributes) before searching with "
                    "per_crowding_attribute_pre_reordering_num_neighbors")
            lim = per_crowding_attribute_pre_reordering_num_neighbors
            num_dims = self._crowding_attrs.shape[1]
            if np.isscalar(lim):
                pre_crowding_limit = (int(lim),) * num_dims
            else:
                pre_crowding_limit = tuple(int(x) for x in lim)
                if len(pre_crowding_limit) != num_dims:
                    raise ValueError(
                        f"expected {num_dims} pre-reordering crowding "
                        f"limits, got {len(pre_crowding_limit)}")
        nq = queries.shape[0]
        num_leaves = getattr(getattr(self, "part_cfg", None), "num_leaves",
                             0)
        pre_tok = None
        if pre_tokenized_leaves is not None:
            if num_leaves == 0:
                raise ValueError(
                    "pre_tokenized_leaves requires a partitioned searcher")
            pre_tok = np.asarray(pre_tokenized_leaves, np.int32)
            if pre_tok.ndim != 2 or pre_tok.shape[0] != nq:
                raise ValueError(
                    f"pre_tokenized_leaves must be (num_queries, L), got "
                    f"{pre_tok.shape}")
            if pre_tok.max() >= num_leaves:
                raise ValueError("pre_tokenized leaf id out of range")
            if pre_tok.shape[1] > num_leaves:
                # Wider than num_leaves would overflow the pruned plan's
                # capacities (sized from min(leaves, num_leaves)) and
                # silently drop candidates (ADVICE r2).
                raise ValueError(
                    f"pre_tokenized_leaves is wider ({pre_tok.shape[1]}) "
                    f"than num_leaves ({num_leaves})")
            srt = np.sort(np.where(pre_tok < 0, -np.arange(
                1, pre_tok.shape[1] + 1)[None, :], pre_tok), axis=1)
            if np.any(srt[:, 1:] == srt[:, :-1]):
                # The leaf-major invert assumes distinct leaves per row;
                # duplicates would corrupt its group ranking (ADVICE r2).
                raise ValueError(
                    "pre_tokenized_leaves rows must not repeat a leaf id")
            leaves = pre_tok.shape[1]
        full_scan = (pre_tok is None
                     and (leaves == 0 or leaves >= (num_leaves or 1 << 30)))
        # Restricts ride the pruned path too: the allowlist folds into the
        # per-slot bias plane inside the kernel (the reference threads
        # allowlists through its LUT16 kernels the same way,
        # hashes/internal/lut16_args.h:74-95).
        pruned = (not full_scan
                  and getattr(self, "_pruned_available", False))
        disp_cap = pruned_dispatch_cap(leaves) if pruned else nq
        if pruned and nq > disp_cap:
            # The pruned plan's scratch capacity grows with batch * leaves;
            # cap the device batch and loop (calls pipeline on device).
            def _sl(v, i):
                """Slice per-query array params; pass scalars through."""
                if v is None or np.isscalar(v):
                    return v
                return np.asarray(v)[i:i + disp_cap]

            # Enqueue EVERY sub-batch before materializing any: the chunks
            # pipeline on device back-to-back instead of paying one
            # host<->device sync per chunk.
            pending = [self.search_batched_async(
                queries[i:i + disp_cap],
                final_num_neighbors if k_vec is None else _sl(k_vec, i),
                (pre_reorder_num_neighbors if k_pre_vec is None
                 else _sl(k_pre_vec, i)),
                leaves_to_search,
                restrict_allowlist,
                per_crowding_attribute_num_neighbors,
                None if pre_tok is None else _sl(pre_tok, i),
                _sl(post_reordering_epsilon, i),
                _sl(pre_reordering_epsilon, i),
                per_crowding_attribute_pre_reordering_num_neighbors)
                for i in range(0, nq, disp_cap)]

            def _combine():
                outs = [p.result() for p in pending]
                idx_parts = [o[0] for o in outs]
                dist = np.concatenate([o[1] for o in outs], axis=0)
                if self.docids is not None:
                    return [row for part in idx_parts for row in part], dist
                return np.concatenate(idx_parts, axis=0), dist

            return PendingSearch(_combine)
        bucket = _next_bucket(nq)
        if full_scan:
            # Only the fused full-scan kernel needs its query-tile padding;
            # the pruned path's cost scales with the true batch.
            bucket = max(bucket, getattr(self, "_min_bucket", 8))
        # Upload the exact-size batch and pad on device: host->device
        # bandwidth is the scarce resource (especially on tunneled TPUs).
        q_dev = jnp.asarray(queries)
        if bucket != nq:
            q_dev = jnp.pad(q_dev, ((0, bucket - nq), (0, 0)))
        # Leaves bucketing: on the pruned path the leaf count is a static
        # parameter of the program (cost scales with it); on the dense
        # masked path every leaves_to_search override reuses one compiled
        # program (the static program ranks all centroids and masks the
        # tail dynamically).
        leaves_bucket = leaves
        if leaves > 0:
            leaves_bucket = (min(leaves, num_leaves)
                             if (pruned or pre_tok is not None)
                             else (num_leaves or leaves))
        self._prepare_for_query(bucket, leaves_bucket, full_scan,
                                restrict_allowlist is not None,
                                pre_tok is not None)
        fn = self._get_compiled(bucket, k, k_pre, leaves_bucket,
                                crowding_limit, full_scan,
                                pre_crowding_limit)
        state = self._state()
        if k_pre_vec is not None:
            floor = k_vec if k_vec is not None else k
            state["k_pre_vec"] = jnp.asarray(np.pad(
                np.maximum(k_pre_vec, floor), (0, bucket - nq),
                constant_values=k_pre))
        if pre_reordering_epsilon is not None:
            eps_arr = np.broadcast_to(
                np.asarray(pre_reordering_epsilon, np.float32), (nq,))
            # User epsilon is in user-distance terms; convert to the
            # internal similarity cutoff (dot: sim >= eps; L2: sim = -d so
            # sim >= -eps; cosine: d = 1 - sim so sim >= 1 - eps).
            if self.config.distance_measure == cfg.DOT_PRODUCT:
                sim_eps = eps_arr
            elif self.config.distance_measure == cfg.COSINE:
                sim_eps = 1.0 - eps_arr
            else:
                sim_eps = -eps_arr
            state["pre_epsilon"] = jnp.asarray(np.pad(
                sim_eps, (0, bucket - nq), constant_values=-np.inf))
        if pre_crowding_limit:
            state["crowding_attrs"] = self._crowding_attrs
        if pre_tok is not None:
            pt = pre_tok
            if bucket != nq:
                pt = np.pad(pt, ((0, bucket - nq), (0, 0)),
                            constant_values=-1)
            state["pre_tokenized"] = jnp.asarray(pt)
        elif leaves > 0 and not pruned:
            state["leaves_dynamic"] = jnp.int32(min(leaves, leaves_bucket))
        if restrict_allowlist is not None:
            allow = np.asarray(restrict_allowlist, bool)
            if allow.shape != (self.n_points,):
                raise ValueError(
                    f"restrict_allowlist must have shape "
                    f"({self.n_points},)")
            state["restrict"] = jnp.asarray(allow)
        if crowding_limit:
            state["crowding_attrs"] = self._crowding_attrs
        idx_dev, dist_dev = fn(q_dev, state)  # enqueued; not yet synced

        def _finalize():
            idx = np.asarray(idx_dev[:nq])    # the one host<->device sync
            dist = np.asarray(dist_dev[:nq])
            if post_reordering_epsilon is not None:
                eps = np.broadcast_to(
                    np.asarray(post_reordering_epsilon, np.float32),
                    (nq,))[:, None]
                if self.config.distance_measure == cfg.DOT_PRODUCT:
                    bad = ~(dist >= eps)   # NaN-safe: NaN stays dropped
                else:
                    bad = ~(dist <= eps)
                idx = np.where(bad, topk_ops.INVALID_INDEX, idx)
                dist = np.where(bad, np.nan, dist)
            if k_vec is not None:
                # Per-query final_num_neighbors: results are best-first,
                # so the override is a column mask.
                bad = np.arange(idx.shape[1])[None, :] >= k_vec[:, None]
                idx = np.where(bad, topk_ops.INVALID_INDEX, idx)
                dist = np.where(bad, np.nan, dist)
            if self.docids is not None:
                return ([[self.docids[j] if j >= 0 else None for j in row]
                         for row in idx], dist)
            return idx, dist

        return PendingSearch(_finalize)

    # The reference's parallel variant fans the batch over a thread pool
    # (scann.cc:478-501); on TPU a single program already uses the chip, so
    # this is an alias kept for API parity.
    def search_batched_parallel(self, queries, final_num_neighbors=None,
                                pre_reorder_num_neighbors=None,
                                leaves_to_search=None, batch_size=256,
                                **kwargs):
        del batch_size
        return self.search_batched(queries, final_num_neighbors,
                                   pre_reorder_num_neighbors,
                                   leaves_to_search, **kwargs)

    def search(self, q, final_num_neighbors=None,
               pre_reorder_num_neighbors=None, leaves_to_search=None,
               **kwargs):
        """Single-query search (scann_ops_pybind.py:51-65)."""
        q = np.asarray(q, dtype=np.float32)
        if q.ndim != 1:
            raise ValueError(f"query must be 1d, got shape {q.shape}")
        idx, dist = self.search_batched(q[None, :], final_num_neighbors,
                                        pre_reorder_num_neighbors,
                                        leaves_to_search, **kwargs)
        return idx[0], dist[0]

    # ---------------------------------------------------------- mutation
    def _mutation_state(self):
        from scann_tpu import mutation
        if getattr(self, "_mut", None) is None:
            raise ValueError(
                "upsert/delete require the searcher to be built with "
                "docids")
        return self._mut

    def _enable_mutation(self, database, docids):
        from scann_tpu import mutation
        self._mut = (mutation.MutationState(database, docids)
                     if docids is not None else None)

    def upsert(self, docids, database, batch_size=1):
        """Insert or update datapoints (reference: ScannSearcher.upsert,
        scann_ops_pybind.py:130-153 -> ScannNumpy::Upsert).  Auto-rebalances
        when the incremental threshold is exceeded (scann_npy.cc:126-135)."""
        del batch_size
        from scann_tpu import mutation
        if not isinstance(docids, list):
            docids = [docids]
        vecs = np.asarray(database, np.float32)
        if vecs.ndim == 1:
            vecs = vecs[None, :]
        if self.config.distance_measure == cfg.COSINE:
            vecs = vecs / np.maximum(
                np.linalg.norm(vecs, axis=1, keepdims=True), 1e-20)
        st = self._mutation_state()
        existing = mutation.resolve_upsert_ids(st, docids, len(vecs),
                                               self.docids)
        ids = np.empty(len(vecs), np.int64)
        for i, (d, ex) in enumerate(zip(docids, existing)):
            if ex >= 0:
                ids[i] = ex
                st.vectors[ex] = vecs[i]
                st.alive[ex] = True
            else:
                ids[i] = st.append(vecs[i:i + 1])[0]
                st.docid_to_id[d] = int(ids[i])
                self.docids.append(d)
        self._apply_upsert(ids, vecs)
        self.n_points = len(st.vectors)
        st.mutations_since_rebuild += len(vecs)
        part_cfg = getattr(self, "part_cfg", None)
        if mutation.incremental_threshold_exceeded(part_cfg, st,
                                                   self.n_points):
            if (getattr(part_cfg, "incremental_mode", "online")
                    == "online_incremental"
                    and hasattr(self, "incremental_maintenance")):
                # Per-partition maintenance (split oversized + reassign)
                # instead of a full O(N) retrain (reference
                # ONLINE_INCREMENTAL, mutator.h:560-737).
                self.incremental_maintenance()
                st.mutations_since_rebuild = 0
            else:
                self.rebalance()

    def delete(self, docids):
        """Remove datapoints by docid (reference: ScannSearcher.delete ->
        ScannNumpy::Delete; tombstone-then-compact like the reference's
        mutator removal path)."""
        from scann_tpu import mutation
        if not isinstance(docids, list):
            docids = [docids]
        st = self._mutation_state()
        ids = []
        for d in docids:
            if d not in st.docid_to_id:
                raise ValueError(f"unknown docid: {d!r}")
            i = st.docid_to_id.pop(d)
            st.alive[i] = False
            ids.append(i)
        self._apply_delete(np.asarray(ids, np.int64))
        st.mutations_since_rebuild += len(ids)
        part_cfg = getattr(self, "part_cfg", None)
        if (mutation.incremental_threshold_exceeded(part_cfg, st,
                                                    self.n_points)
                and getattr(part_cfg, "incremental_mode", "online")
                == "online_incremental"
                and hasattr(self, "incremental_maintenance")):
            # Deletes strand capacity in shrinking leaves; the maintenance
            # pass merges underfull partitions away (mutator.h:676-781).
            self.incremental_maintenance()
            st.mutations_since_rebuild = 0

    def rebalance(self):
        """Full retrain + reindex from the live vectors (reference:
        Rebalance == RetrainAndReindexSearcher, scann.cc:433-448).  Also
        compacts delete tombstones; datapoint indices are renumbered."""
        st = self._mutation_state()
        live, keep, _ = st.live_database()
        docids = [self.docids[i] for i in keep]
        from scann_tpu import factory
        fresh = factory.create_searcher(live, self.config, docids=docids)
        self.__dict__.update(fresh.__dict__)

    def _apply_upsert(self, ids: np.ndarray, vecs: np.ndarray):
        raise NotImplementedError(
            f"{type(self).__name__} does not support dynamic updates yet")

    def _apply_delete(self, ids: np.ndarray):
        raise NotImplementedError(
            f"{type(self).__name__} does not support dynamic updates yet")

    def set_metadata(self, getter):
        """Attach a data.dataset.MetadataGetter (reference:
        metadata/metadata_getter.h); results can then be enriched via
        ``metadata_for``."""
        self._metadata = getter

    def metadata_for(self, indices):
        """Per-neighbor metadata payloads for a result index array (None
        entries for invalid indices)."""
        getter = getattr(self, "_metadata", None)
        if getter is None:
            raise ValueError("call set_metadata(getter) first")
        idx = np.asarray(indices)
        flat = [getter.get(int(i)) if i >= 0 else None
                for i in idx.reshape(-1)]
        return np.asarray(flat, dtype=object).reshape(idx.shape)

    def get_health_stats(self):
        """Partition imbalance + quantization error stats
        (reference: get_health_stats, scann_ops_pybind.py:121-127)."""
        from scann_tpu.utils import health
        return health.compute_health_stats(self).as_dict()

    def initialize_health_stats(self):
        """API parity with the reference; stats here are derived on demand,
        so initialization is a no-op."""
        return None

    def serialize(self, artifacts_dir, relative_path=False):
        """Write config + asset arrays for later load_searcher()
        (reference: ScannSearcher.serialize, scann_ops_pybind.py:114-119)."""
        del relative_path  # paths are always relative in this format
        from scann_tpu.utils import serialization
        serialization.save_searcher(self, artifacts_dir)

    @property
    def query_dims(self) -> int:
        """Dimensionality expected of queries (pre-projection)."""
        return self.dims
