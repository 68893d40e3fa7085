"""Memory-lean pruned scoring: decode the 4-bit codes inside the kernel.

The recon-mode pruned path (ops/pruned_scan.py) stores decoded bf16 rows
(2 B/dim of HBM).  This variant keeps ONLY the packed AH codes in HBM
(0.5 B/dim logical; one uint8 center id per 2-dim block as stored) — the
reference's index memory (hashes/asymmetric_hashing2/querying.h packed
dataset) — and reconstructs each tile on the fly inside the Pallas kernel:

    one_hot(codes_tile) @ codebook   ->  recon tile (TILE, d)   # MXU
    recon @ queries^T                ->  scores (TILE, QG)      # MXU

The one-hot expansion IS the TPU's table lookup: 8 code blocks at a time
expand to a (TILE, 128) int8 operand (``jnp.repeat`` along lanes + an
iota compare, no relayout), contracting against a (128, d) codebook slice
at full MXU occupancy.  Under residual quantization the per-(query, leaf)
q.c_leaf bias is added at merge time (merge_candidates pair_bias), so the
kernel scores residual dots only.  Unlike the reference's int8-quantized
LUTs (ConvertLookupToFixedPoint), decoding reproduces FLOAT-lookup
semantics exactly — there is no per-query fixed-point error.

Compute per tile is ~6x the recon kernel's scoring matmul (the decode
matmul dominates), traded for 5x less HBM per slot; use this mode when
index memory is the constraint (AsymmetricHashConfig.lookup_type="int8"
with a partitioned searcher).

Everything else — work plan, packed survivor encoding, stratified merge —
is shared with ops/pruned_scan.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scann_tpu.ops import pruned_scan as ps

# Code blocks expanded per MXU pass: 8 blocks x 16 centers = 128 lanes.
_BLK = 8
_PAD_CODE = 255  # matches no center id; padded blocks contribute nothing


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pack_codes_tiles(codes_flat, num_tiles: int):
    """(num_tiles*TILE, B) uint8 codes -> kernel layout
    (num_tiles, TILE, B_pad) with 255-padded tail blocks."""
    import numpy as np
    b = codes_flat.shape[1]
    b_pad = _round_up(b, _BLK)
    out = np.full((codes_flat.shape[0], b_pad), _PAD_CODE, np.uint8)
    out[:, :b] = codes_flat
    return out.reshape(num_tiles, ps.TILE, b_pad)


def expand_codebook(codebook, d_pad: int, b_pad: int):
    """(B, C, dpb) codebook (C = 16 or 256 centers/block) ->
    (b_pad*C, d_pad) decode matrix: row j*C+c holds center c of block j
    embedded at its dimension offset."""
    import numpy as np
    cb = np.asarray(codebook, np.float32)
    b, cpb, dpb = cb.shape
    out = np.zeros((b_pad * cpb, d_pad), np.float32)
    for blk in range(b):
        out[blk * cpb:(blk + 1) * cpb,
            blk * dpb:(blk + 1) * dpb] = cb[blk]
    return out


def _kernel(work_tile_ref, work_active_ref, qg_rows_ref, codes_ref,
            cb_ref, mean_ref, bias_ref, out_ref, *, scale, mnt, kpg,
            b_pad, d, cpb):
    w = pl.program_id(0)

    @pl.when(work_active_ref[w] == 1)
    def _():
        # pltpu.repeat TILES the 8 code lanes cpb times: lane c holds the
        # code of block c % 8; comparing against c // 8 one-hots center
        # (c // 8) of block (c % 8) — the decode matrix rows are permuted
        # to this lane order by the wrapper.  cpb = 16 (LUT16 codes) or
        # 256 (lut256 codes, searcher.cc:366-400 INT8-lookup role).
        val16 = jax.lax.broadcasted_iota(
            jnp.int32, (ps.TILE, _BLK * cpb), 1) // _BLK
        recon = jnp.zeros((ps.TILE, d), jnp.float32)
        for j in range(b_pad // _BLK):
            blk = codes_ref[0][:, j * _BLK:(j + 1) * _BLK].astype(jnp.int32)
            rep = pltpu.repeat(blk, cpb, axis=1)   # (TILE, _BLK * cpb)
            oh = (rep == val16).astype(jnp.bfloat16)
            recon = recon + jax.lax.dot_general(
                oh, cb_ref[0][j * _BLK * cpb:(j + 1) * _BLK * cpb, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        recon = recon - mean_ref[0]
        recon_bf = recon.astype(jnp.bfloat16)
        scores = jax.lax.dot_general(
            recon_bf, qg_rows_ref[0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # (TILE, QG)
        if scale != 1.0:  # squared-L2: 2 q.x - ||x||^2 (+ -||q||^2 later)
            sq = jnp.sum(recon * recon, axis=1, keepdims=True)
            scores = scale * scores - sq
        scores = scores + bias_ref[0]                  # pad penalty
        grouped = scores.reshape(ps.GP, ps.SUBP, ps.QG)
        packed = ps._group_top_packed(grouped, w % mnt, axis=1,
                                      cat_axis=0, kpg=kpg)
        out_ref[...] = jnp.transpose(packed, (1, 0)).reshape(1, ps.QG, -1)


def score_work_pallas_codes(plan, qg_rows, codes3, cb_mat, mean, bias2, *,
                            measure_l2: bool, interpret: bool = False,
                            kpg: int = ps.KPG):
    """Pallas scorer over packed codes.  codes3: (num_tiles, TILE, b_pad)
    uint8; cb_mat: (b_pad*16, d) decode matrix (bf16); mean: (d,) f32
    subtracted from every decoded row (zeros when unused); bias2:
    (num_tiles, TILE) f32 pad penalties.  Returns packed scores
    (G_pad, QG, mnt*kpg*GP) int32 (same contract as pruned_scan)."""
    import numpy as np
    w_pad = plan.work_tile.shape[0]
    g_pad = plan.qg_query.shape[0]
    mnt = w_pad // plan.qg_query.shape[0]
    b_pad = codes3.shape[-1]
    d = cb_mat.shape[-1]
    cpb = cb_mat.shape[0] // b_pad  # 16 (LUT16) or 256 (lut256)
    bias3 = (bias2 if bias2.ndim == 3
             else bias2.reshape(bias2.shape[0], ps.TILE, 1))
    # Permute decode-matrix rows from standard (block*cpb + center) order
    # into the kernel's tiled lane order (see _kernel).
    ridx = np.arange(b_pad * cpb)
    w1 = _BLK * cpb
    g, within = ridx // w1, ridx % w1
    src = (g * _BLK + within % _BLK) * cpb + within // _BLK
    cb3 = jnp.take(cb_mat, jnp.asarray(src), axis=0).reshape(
        1, b_pad * cpb, d).astype(jnp.bfloat16)
    mean2 = mean.reshape(1, d).astype(jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(w_pad,),
        in_specs=[
            pl.BlockSpec((1, ps.QG, d), lambda w, wt, wa: (w // mnt, 0, 0)),
            pl.BlockSpec((1, ps.TILE, b_pad),
                         lambda w, wt, wa: (wt[w], 0, 0)),
            pl.BlockSpec((1, b_pad * cpb, d), lambda w, wt, wa: (0, 0, 0)),
            pl.BlockSpec((1, d), lambda w, wt, wa: (0, 0)),
            pl.BlockSpec((1, ps.TILE, 1), lambda w, wt, wa: (wt[w], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, ps.QG, kpg * ps.GP),
                         lambda w, wt, wa: (w // mnt, 0, w % mnt)),
        ],
    )
    (packed,) = pl.pallas_call(
        functools.partial(_kernel, scale=2.0 if measure_l2 else 1.0,
                          mnt=mnt, kpg=kpg, b_pad=b_pad, d=d, cpb=cpb),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((g_pad, ps.QG, mnt * kpg * ps.GP),
                                 jnp.int32),
        ],
        interpret=interpret,
    )(plan.work_tile, plan.work_active, qg_rows, codes3, cb3, mean2, bias3)
    return packed


_XLA_WORK_CHUNK = 64


# ===================================================================== int8
# The int8-LUT variant (lookup_type="int8"): the reference's fixed-point
# LUT16 semantics (ConvertLookupToFixedPoint,
# hashes/internal/asymmetric_hashing_impl.cc:590-646 + the LUT16 kernels,
# lut16_avx2.inc:56-120) mapped onto the MXU:
#
#   * HBM holds 4-bit codes pair-packed two-per-byte
#     (num_tiles, TILE, b_pad/2) uint8 — the reference's PackedDataset
#     index memory (querying.h:73-105), half the decode path's bytes.
#   * Per query group the kernel builds the per-query LUT ONCE (at the
#     group's first tile, persisted in VMEM scratch across the group's
#     sequential grid steps): lut = cb_expanded @ q^T, one (W, d) x (d, QG)
#     bf16 matmul, then per-query symmetric int8 quantization
#     (multiplier 127/max|entry| — multiplier_quantile 1.0, ROUND).
#   * Scoring is one int8 x int8 MXU matmul with int32 accumulation:
#     onehot(codes) (TILE, W) @ lut_i8 (W, QG), W = b_pad * 16.  This runs
#     at twice bf16 rate and replaces BOTH matmuls of the decode path
#     (which costs ~8x the recon path's scoring matmul per work item).
#
# Unlike the reference there is no int16 saturation guard: the MXU
# accumulates int32 natively (CanUseInt16Accumulator is moot).


def pack_codes_nibble(codes_flat, num_tiles: int):
    """(num_tiles*TILE, num_blocks) uint8 center ids -> pair-packed kernel
    layout (num_tiles, TILE, b_pad/2) uint8 with byte k holding blocks
    2k (low nibble) and 2k+1 (high nibble); pad blocks/slots are code 0
    (their LUT entries are built to be exactly zero)."""
    import numpy as np
    b = codes_flat.shape[1]
    b_pad = _round_up(b, _BLK)
    full = np.zeros((codes_flat.shape[0], b_pad), np.uint8)
    full[:, :b] = codes_flat
    packed = (full[:, 0::2] | (full[:, 1::2] << 4)).astype(np.uint8)
    return packed.reshape(num_tiles, ps.TILE, b_pad // 2)


def _lane_maps(b_pad: int):
    """Kernel lane order of the single-shot one-hot: lane c of the
    (TILE, W = b_pad*16) expansion holds (block = 2*(c % b2) + copy % 2,
    center = copy // 2) with copy = c // b2, b2 = b_pad // 2 — the layout
    produced by pltpu.repeat(codes_packed, 32, axis=1).  Returns the
    permutation src such that standard-order LUT row src[r] lands at kernel
    row r."""
    import numpy as np
    b2 = b_pad // 2
    r = np.arange(b_pad * 16)
    copy = r // b2
    block = 2 * (r % b2) + (copy % 2)
    center = copy // 2
    return block * 16 + center


def _lut_kernel(work_tile_ref, work_active_ref, qg_t_ref, codes_ref,
                cb_ref, csq_ref, shift_ref, targ_ref, bias_ref, out_ref,
                lut_ref, inv_ref, *, scale, mnt, kpg, b_pad):
    w = pl.program_id(0)

    @pl.when(jnp.logical_and(work_active_ref[w] == 1, w % mnt == 0))
    def _build_lut():
        # (W, d) x (d, QG) -> per-query LUT columns; scale folds the L2
        # factor 2 so lut = 2 q.c - ||c||^2 under L2, q.c under dot.
        lutf = jax.lax.dot_general(
            cb_ref[0], qg_t_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        lutf = scale * lutf - csq_ref[0]
        m = jnp.max(jnp.abs(lutf), axis=0, keepdims=True)  # (1, QG)
        m = jnp.maximum(m, 1e-20)
        lut_ref[:] = jnp.clip(jnp.round(lutf * (127.0 / m)),
                              -127, 127).astype(jnp.int8)
        inv_ref[:] = m * (1.0 / 127.0)

    @pl.when(work_active_ref[w] == 1)
    def _score():
        codes = codes_ref[0].astype(jnp.int32)          # (TILE, b2)
        rep = pltpu.repeat(codes, 32, axis=1)           # (TILE, W)
        # Nibble-select and one-hot against PRECOMPUTED lane planes
        # (shift = 4*(copy%2), target = copy//2) instead of deriving them
        # from a broadcasted iota each step — 5 VPU passes over the
        # (TILE, W) plane instead of ~9.
        nib = (rep >> shift_ref[0]) & 15
        oh = (nib == targ_ref[0]).astype(jnp.int8)
        acc = jax.lax.dot_general(
            oh, lut_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)            # (TILE, QG)
        scores = acc.astype(jnp.float32) * inv_ref[:] + bias_ref[0]
        grouped = scores.reshape(ps.GP, ps.SUBP, ps.QG)
        packed = ps._group_top_packed(grouped, w % mnt, axis=1,
                                      cat_axis=0, kpg=kpg)
        out_ref[...] = jnp.transpose(packed, (1, 0)).reshape(1, ps.QG, -1)


def _centered_cb(cb_mat, mean, dims_per_block: int):
    """Centered expanded codebook + per-row squared norms (both in
    STANDARD row order; callers permute for the kernel).  Row (j, c) =
    embed(c_{j,c}) - embed_j(mean): pad-block rows stay exactly zero
    because mean is zero on their dims."""
    w, d_pad = cb_mat.shape
    row_block = jnp.arange(w, dtype=jnp.int32) // 16
    dim_block = jnp.arange(d_pad, dtype=jnp.int32) // dims_per_block
    mask = row_block[:, None] == dim_block[None, :]
    # Pad-block rows stay zero: their dims lie beyond the real
    # dimensionality where mean is zero by construction.
    cb_c = cb_mat - jnp.where(mask, mean[None, :], 0.0)
    csq = jnp.sum(cb_c * cb_c, axis=1, keepdims=True)
    return cb_c, csq


def score_work_pallas_lut(plan, qg_t, codes3p, cb_mat, mean, bias2, *,
                          dims_per_block: int, measure_l2: bool,
                          interpret: bool = False, kpg: int = ps.KPG):
    """int8-LUT Pallas scorer.  qg_t: (G_pad, d, QG) bf16 TRANSPOSED query
    groups (centered under L2); codes3p: (num_tiles, TILE, b_pad/2) uint8
    pair-packed codes; cb_mat: (b_pad*16, d) f32 expanded codebook in
    standard row order (pre-centering); mean: (d,) f32; bias2:
    (num_tiles, TILE) f32 pad penalties.  Returns packed survivor scores
    (G_pad, QG, mnt*kpg*GP) int32 (same contract as pruned_scan)."""
    w_pad = plan.work_tile.shape[0]
    g_pad = plan.qg_query.shape[0]
    mnt = w_pad // plan.qg_query.shape[0]
    b_pad = codes3p.shape[-1] * 2
    wdim = b_pad * 16
    d = cb_mat.shape[-1]
    bias3 = (bias2 if bias2.ndim == 3
             else bias2.reshape(bias2.shape[0], ps.TILE, 1))
    cb_c, csq = _centered_cb(cb_mat, mean, dims_per_block)
    if not measure_l2:
        csq = jnp.zeros_like(csq)  # dot-product LUT is just q.c
    perm = jnp.asarray(_lane_maps(b_pad))
    cb_k = jnp.take(cb_c, perm, axis=0).astype(jnp.bfloat16)[None]
    csq_k = jnp.take(csq, perm, axis=0)[None]  # (1, W, 1)
    import numpy as np
    b2 = b_pad // 2
    copy = np.arange(wdim, dtype=np.int32) // b2
    shift_k = jnp.asarray(((copy % 2) * 4)[None, :])   # (1, W)
    targ_k = jnp.asarray((copy // 2)[None, :])          # (1, W)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(w_pad,),
        in_specs=[
            pl.BlockSpec((1, d, ps.QG), lambda w, wt, wa: (w // mnt, 0, 0)),
            pl.BlockSpec((1, ps.TILE, b_pad // 2),
                         lambda w, wt, wa: (wt[w], 0, 0)),
            pl.BlockSpec((1, wdim, d), lambda w, wt, wa: (0, 0, 0)),
            pl.BlockSpec((1, wdim, 1), lambda w, wt, wa: (0, 0, 0)),
            pl.BlockSpec((1, wdim), lambda w, wt, wa: (0, 0)),
            pl.BlockSpec((1, wdim), lambda w, wt, wa: (0, 0)),
            pl.BlockSpec((1, ps.TILE, 1), lambda w, wt, wa: (wt[w], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, ps.QG, kpg * ps.GP),
                         lambda w, wt, wa: (w // mnt, 0, w % mnt)),
        ],
        scratch_shapes=[
            pltpu.VMEM((wdim, ps.QG), jnp.int8),
            pltpu.VMEM((1, ps.QG), jnp.float32),
        ],
    )
    (packed,) = pl.pallas_call(
        functools.partial(_lut_kernel, scale=2.0 if measure_l2 else 1.0,
                          mnt=mnt, kpg=kpg, b_pad=b_pad),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((g_pad, ps.QG, mnt * kpg * ps.GP),
                                 jnp.int32),
        ],
        interpret=interpret,
    )(plan.work_tile, plan.work_active, qg_t, codes3p, cb_k, csq_k,
      shift_k, targ_k, bias3)
    return packed


def score_work_xla_lut(plan, qg_t, codes3p, cb_mat, mean, bias2, *,
                       dims_per_block: int, measure_l2: bool,
                       kpg: int = ps.KPG):
    """XLA fallback for the int8-LUT path (CPU tests, non-TPU backends).
    Mirrors the kernel op-for-op in standard block order (the kernel's lane
    permutation cancels between its one-hot and LUT operands)."""
    w_pad = plan.work_tile.shape[0]
    bias2 = bias2.reshape(bias2.shape[0], -1)
    mnt = w_pad // plan.qg_query.shape[0]
    scale = 2.0 if measure_l2 else 1.0
    b_pad = codes3p.shape[-1] * 2
    cb_c, csq = _centered_cb(cb_mat, mean, dims_per_block)
    if not measure_l2:
        csq = jnp.zeros_like(csq)
    cb_bf = cb_c.astype(jnp.bfloat16)
    pad = _round_up(w_pad, _XLA_WORK_CHUNK) - w_pad
    wt = jnp.pad(plan.work_tile, (0, pad))
    wq = jnp.pad(plan.work_qg, (0, pad))
    wi = jnp.arange(w_pad + pad, dtype=jnp.int32) % mnt

    def chunk(args):
        wt_c, wq_c, wi_c = args
        packed_c = jnp.take(codes3p, wt_c, axis=0).astype(jnp.int32)
        q = jnp.take(qg_t, wq_c, axis=0)                 # (C, d, QG)
        b = jnp.take(bias2, wt_c, axis=0)
        lutf = jax.lax.dot_general(
            jnp.broadcast_to(cb_bf, (q.shape[0],) + cb_bf.shape), q,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # (C, W, QG)
        lutf = scale * lutf - csq[None, :, :]
        m = jnp.maximum(jnp.max(jnp.abs(lutf), axis=1, keepdims=True),
                        1e-20)
        lut_i8 = jnp.clip(jnp.round(lutf * (127.0 / m)),
                          -127, 127).astype(jnp.int8)
        # Unpack nibbles to (C, TILE, b_pad) standard block order.
        lo = packed_c & 15
        hi = packed_c >> 4
        codes = jnp.stack([lo, hi], axis=-1).reshape(
            packed_c.shape[0], ps.TILE, b_pad)
        oh = (codes[..., None]
              == jnp.arange(16, dtype=jnp.int32)).astype(jnp.int8)
        oh = oh.reshape(codes.shape[0], ps.TILE, b_pad * 16)
        acc = jax.lax.dot_general(
            oh, lut_i8, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)            # (C, TILE, QG)
        s = acc.astype(jnp.float32) * (m * (1.0 / 127.0)) + b[:, :, None]
        g = s.reshape(s.shape[0], ps.GP, ps.SUBP, ps.QG)
        packed = ps._group_top_packed(g, wi_c[:, None, None, None],
                                      axis=2, cat_axis=1, kpg=kpg)
        return jnp.transpose(packed, (0, 2, 1))

    n_chunks = (w_pad + pad) // _XLA_WORK_CHUNK
    packed = jax.lax.map(
        chunk, (wt.reshape(n_chunks, -1), wq.reshape(n_chunks, -1),
                wi.reshape(n_chunks, -1)))
    packed = packed.reshape(-1, ps.QG, kpg * ps.GP)[:w_pad]
    g = w_pad // mnt
    return jnp.transpose(
        packed.reshape(g, mnt, ps.QG, kpg * ps.GP),
        (0, 2, 1, 3)).reshape(g, ps.QG, mnt * kpg * ps.GP)


def score_work_xla_codes(plan, qg_rows, codes3, cb_mat, mean, bias2, *,
                         measure_l2: bool, kpg: int = ps.KPG):
    """XLA fallback with identical outputs (CPU tests, non-TPU)."""
    w_pad = plan.work_tile.shape[0]
    bias2 = bias2.reshape(bias2.shape[0], -1)
    mnt = w_pad // plan.qg_query.shape[0]
    scale = 2.0 if measure_l2 else 1.0
    b_pad = codes3.shape[-1]
    cpb = cb_mat.shape[0] // b_pad  # 16 or 256 centers/block
    pad = _round_up(w_pad, _XLA_WORK_CHUNK) - w_pad
    wt = jnp.pad(plan.work_tile, (0, pad))
    wq = jnp.pad(plan.work_qg, (0, pad))
    wi = jnp.arange(w_pad + pad, dtype=jnp.int32) % mnt
    cb_bf = cb_mat.astype(jnp.bfloat16)

    def chunk(args):
        wt_c, wq_c, wi_c = args
        codes = jnp.take(codes3, wt_c, axis=0).astype(jnp.int32)
        q = jnp.take(qg_rows, wq_c, axis=0)
        b = jnp.take(bias2, wt_c, axis=0)
        oh = (codes[..., None]
              == jnp.arange(cpb, dtype=jnp.int32)).astype(jnp.bfloat16)
        oh = oh.reshape(codes.shape[0], ps.TILE, b_pad * cpb)
        recon = jax.lax.dot_general(
            oh, cb_bf, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        recon = recon - mean[None, None, :]
        s = jax.lax.dot_general(
            recon.astype(jnp.bfloat16), q,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        if scale != 1.0:
            s = scale * s - jnp.sum(recon * recon, axis=-1, keepdims=True)
        s = s + b[:, :, None]
        g = s.reshape(s.shape[0], ps.GP, ps.SUBP, ps.QG)
        packed = ps._group_top_packed(g, wi_c[:, None, None, None],
                                      axis=2, cat_axis=1, kpg=kpg)
        return jnp.transpose(packed, (0, 2, 1))

    n_chunks = (w_pad + pad) // _XLA_WORK_CHUNK
    packed = jax.lax.map(
        chunk, (wt.reshape(n_chunks, -1), wq.reshape(n_chunks, -1),
                wi.reshape(n_chunks, -1)))
    packed = packed.reshape(-1, ps.QG, kpg * ps.GP)[:w_pad]
    g = w_pad // mnt
    return jnp.transpose(
        packed.reshape(g, mnt, ps.QG, kpg * ps.GP),
        (0, 2, 1, 3)).reshape(g, ps.QG, mnt * kpg * ps.GP)
