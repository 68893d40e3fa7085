"""Pruned EXACT scoring over residual per-row int8 leaves (tree-SQ).

TPU-native redesign of the reference's Tree-X + scalar-quantized
brute-force leaves (scann/tree_x_hybrid/tree_x_hybrid_smmd.h:51-130 with
ScalarQuantizedBruteForceSearcher leaves built at
base/internal/tree_x_hybrid_factory.cc:416-520, scored by the int8xfloat
one-to-many kernels, distance_measures/one_to_many_asymmetric.h:50-77).

Why this beats LUT16-style AH + separate reorder on TPU: the MXU makes a
full-precision int8 scan of the selected leaves CHEAPER than emulating a
16-way table lookup (the one-hot expansion is an 8x wider contraction than
the rows themselves), and exact scores need no reordering pass — the
gather-bound rescore stage (~1/3 of batch latency at small leaf counts)
disappears entirely, and the kernel only has to keep a handful of
survivors per slot group (kpg 2-4 instead of 8-16), cutting the merge
gather volume by the same factor.

Storage is the residual per-row int8 scheme (models/base.py ReorderHelper
residual mode, a TPU redesign with no reference analogue): row = c_leaf +
scale_row * int8[d].  The kernel scores scale_row * (q . int8_row) on the
MXU (int8 rows converted to bf16 in-kernel — exact, |code| <= 127) and the
exact f32 q.c_leaf bias joins per (query, leaf) at merge time
(pruned_scan.merge_candidates pair_bias).  Under squared L2 the kernel
folds -||x_hat||^2 into the per-slot bias plane and the merge bias carries
2 q.c_leaf; the rank-invariant -||q||^2 is restored by the caller.

Work plan, packed survivor encoding, and stratified merge are shared with
ops/pruned_scan.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scann_tpu.ops import pruned_scan as ps


def _kernel(work_tile_ref, work_active_ref, qg_rows_ref, rows_ref,
            scale_ref, bias_ref, out_ref, *, smult, mnt, kpg, tile):
    w = pl.program_id(0)

    @pl.when(work_active_ref[w] == 1)
    def _():
        # int8 -> bf16 is exact for |code| <= 127; one (tile, d) x (d, QG)
        # MXU matmul replaces both the one-hot LUT expansion AND the
        # downstream exact rescore.
        rows_bf = rows_ref[0].astype(jnp.bfloat16)
        dots = jax.lax.dot_general(
            rows_bf, qg_rows_ref[0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # (tile, QG)
        scores = dots * (scale_ref[0] * smult) + bias_ref[0]
        grouped = scores.reshape(tile // ps.SUBP, ps.SUBP, ps.QG)
        packed = ps._group_top_packed(grouped, w % mnt, axis=1,
                                      cat_axis=0, kpg=kpg)
        # Survivor-major block (kpg*gp, QG): with kpg*gp < 128 a
        # query-major (1, QG, kpg*gp) block would violate Mosaic's
        # 128-divisible last-dim rule, and this also drops the per-step
        # transpose; one XLA transpose after the kernel restores the
        # merge layout.
        out_ref[...] = packed.reshape(1, -1, ps.QG)


def score_work_pallas_sq(plan, qg_rows, rows3, scale2, bias2, *,
                         measure_l2: bool, interpret: bool = False,
                         kpg: int = 4):
    """Pallas exact-int8 scorer.  qg_rows: (G_pad, QG, d) bf16 gathered
    query groups; rows3: (num_tiles, tile, d) int8 residual rows (tile
    inferred from the array; 256 for the sq layout); scale2:
    (num_tiles, tile) f32 per-row dequant scales; bias2: (num_tiles, tile)
    f32 per-slot bias (pad penalty; under L2 also -||x_hat||^2).  Returns
    packed survivor scores (G_pad, QG, mnt*kpg*gp) int32 (contract of
    pruned_scan._pack)."""
    w_pad = plan.work_tile.shape[0]
    g_pad = plan.qg_query.shape[0]
    mnt = w_pad // g_pad
    tile = rows3.shape[1]
    d = rows3.shape[-1]
    seg = kpg * (tile // ps.SUBP)
    # Callers hold these planes pre-shaped (n, tile, 1): reshaping a jit
    # ARGUMENT to a trailing-1 layout is a full relayout copy per call
    # (measured 2.5 ms/call on 2x 6.4 MB planes — the whole single-query
    # latency budget).
    scale3 = (scale2 if scale2.ndim == 3
              else scale2.reshape(scale2.shape[0], tile, 1))
    bias3 = (bias2 if bias2.ndim == 3
             else bias2.reshape(bias2.shape[0], tile, 1))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(w_pad,),
        in_specs=[
            pl.BlockSpec((1, ps.QG, d), lambda w, wt, wa: (w // mnt, 0, 0)),
            pl.BlockSpec((1, tile, d), lambda w, wt, wa: (wt[w], 0, 0)),
            pl.BlockSpec((1, tile, 1), lambda w, wt, wa: (wt[w], 0, 0)),
            pl.BlockSpec((1, tile, 1), lambda w, wt, wa: (wt[w], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, seg, ps.QG),
                         lambda w, wt, wa: (w // mnt, w % mnt, 0)),
        ],
    )
    (packed_t,) = pl.pallas_call(
        functools.partial(_kernel, smult=2.0 if measure_l2 else 1.0,
                          mnt=mnt, kpg=kpg, tile=tile),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((g_pad, mnt * seg, ps.QG), jnp.int32),
        ],
        interpret=interpret,
    )(plan.work_tile, plan.work_active, qg_rows, rows3, scale3, bias3)
    return jnp.transpose(packed_t, (0, 2, 1))


_XLA_WORK_CHUNK = 128


def score_work_xla_sq(plan, qg_rows, rows3, scale2, bias2, *,
                      measure_l2: bool, kpg: int = 4):
    """Gather + batched-matmul fallback with identical outputs (CPU tests,
    non-TPU backends)."""
    w_pad = plan.work_tile.shape[0]
    mnt = w_pad // plan.qg_query.shape[0]
    smult = 2.0 if measure_l2 else 1.0
    pad = -(-w_pad // _XLA_WORK_CHUNK) * _XLA_WORK_CHUNK - w_pad
    wt = jnp.pad(plan.work_tile, (0, pad))
    wq = jnp.pad(plan.work_qg, (0, pad))
    wi = jnp.arange(w_pad + pad, dtype=jnp.int32) % mnt

    tile = rows3.shape[1]
    gp = tile // ps.SUBP
    scale2 = scale2.reshape(scale2.shape[0], tile)
    bias2 = bias2.reshape(bias2.shape[0], tile)

    def chunk(args):
        wt_c, wq_c, wi_c = args
        r = jnp.take(rows3, wt_c, axis=0).astype(jnp.bfloat16)
        q = jnp.take(qg_rows, wq_c, axis=0)     # (C, QG, d)
        sc = jnp.take(scale2, wt_c, axis=0)     # (C, tile)
        b = jnp.take(bias2, wt_c, axis=0)
        dots = jax.lax.dot_general(
            r, q, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (C, tile, QG)
        s = dots * (sc * smult)[:, :, None] + b[:, :, None]
        g = s.reshape(s.shape[0], gp, ps.SUBP, ps.QG)
        packed = ps._group_top_packed(g, wi_c[:, None, None, None],
                                      axis=2, cat_axis=1, kpg=kpg)
        return jnp.transpose(packed, (0, 2, 1))

    n_chunks = (w_pad + pad) // _XLA_WORK_CHUNK
    packed = jax.lax.map(
        chunk, (wt.reshape(n_chunks, -1), wq.reshape(n_chunks, -1),
                wi.reshape(n_chunks, -1)))
    packed = packed.reshape(-1, ps.QG, kpg * gp)[:w_pad]
    g = w_pad // mnt
    return jnp.transpose(
        packed.reshape(g, mnt, ps.QG, kpg * gp),
        (0, 2, 1, 3)).reshape(g, ps.QG, mnt * kpg * gp)
