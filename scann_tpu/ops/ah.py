"""Asymmetric hashing (product quantization): training, encoding, LUTs.

TPU-native equivalent of the reference's AH stack:
  * codebook training: AhImpl::TrainAsymmetricHashing
    (scann/hashes/internal/asymmetric_hashing_impl.cc:60-198) — per-block
    k-means over (residual) vectors, here one vmapped batched k-means.
  * plain encoding: AhImpl::IndexDatapoint (:200-246) — per-block argmin,
    here one einsum + argmin.
  * anisotropic (noise-shaped) encoding: AhImpl::IndexDatapointNoiseShaped
    (:434-503) — score-aware coordinate descent minimizing
    eta * ||r_par||^2 + ||r_perp||^2, vmapped with a fixed round budget.
  * lookup tables: AhImpl::CreateRawFloatLookupTable (:505-568) and
    ConvertLookupToFixedPoint (:590-646) — similarity-convention LUTs with
    per-query symmetric int8 quantization.

Chunking layout: a d-dim vector is split into ``num_blocks`` contiguous
blocks of ``dims_per_block`` (reference CHUNK projection,
projection/chunking_projection.h:40-90).  A ragged tail block is handled by
zero-padding the dimensionality — equivalent to the reference's
VARIABLE_CHUNK final block because centers of all-zero padded coordinates
train to zero and contribute nothing to either distance.

VARIABLE_CHUNK proper (per-block widths, chunking_projection.h:40-90) is
the ``block_dims`` table on AHModel: block b owns the feature dims
``block_dims[b]`` (padded to the max width with a sentinel column that is
always zero), so every chunked op is one gather instead of a reshape and
the downstream math — per-block k-means, encode argmins, LUT builds,
one-hot scoring — is width-agnostic.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from scann_tpu import config as cfg
from scann_tpu.ops import kmeans as kmeans_ops


class AHModel(NamedTuple):
    codebook: jax.Array  # (num_blocks, clusters_per_block, max_block_width)
    dims: int  # original (unpadded) dimensionality
    # VARIABLE_CHUNK: (num_blocks, max_block_width) int32 feature-dim ids
    # per block, sentinel ``dims`` on padding slots (reads a zero column).
    # None = fixed contiguous dims_per_block chunks.
    block_dims: Optional[jax.Array] = None

    @property
    def num_blocks(self) -> int:
        return self.codebook.shape[0]

    @property
    def clusters_per_block(self) -> int:
        return self.codebook.shape[1]

    @property
    def dims_per_block(self) -> int:
        return self.codebook.shape[2]

    @property
    def padded_dims(self) -> int:
        return self.num_blocks * self.dims_per_block


def pad_to_blocks(x, dims_per_block: int):
    """Zero-pad the feature axis to a whole number of blocks."""
    d = x.shape[-1]
    pad = (-d) % dims_per_block
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    return x


def chunk(x, dims_per_block: int):
    """(..., d) -> (..., num_blocks, dims_per_block) with zero tail pad."""
    x = pad_to_blocks(x, dims_per_block)
    return x.reshape(x.shape[:-1] + (-1, dims_per_block))


def make_block_dims(dims: int, widths: Sequence[int]):
    """Variable-chunk dim table: block b owns ``widths[b]`` consecutive
    feature dims (reference VARIABLE_CHUNK, chunking_projection.h:40-90).
    Returns (num_blocks, max_width) int32 with sentinel ``dims`` padding."""
    import numpy as np
    widths = [int(w) for w in widths]
    if any(w <= 0 for w in widths):
        raise ValueError("variable chunk widths must be positive")
    if sum(widths) != dims:
        raise ValueError(
            f"variable chunk widths must sum to the dimensionality: "
            f"sum({widths}) = {sum(widths)} != {dims}")
    max_w = max(widths)
    table = np.full((len(widths), max_w), dims, np.int32)
    off = 0
    for b, w in enumerate(widths):
        table[b, :w] = np.arange(off, off + w)
        off += w
    return table


def chunk_model(x, model: AHModel):
    """(..., d) -> (..., num_blocks, width) under the model's chunking
    (fixed reshape, or a block_dims gather for VARIABLE_CHUNK)."""
    if model.block_dims is None:
        return chunk(x, model.dims_per_block)
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, 1)])  # zero sentinel
    return jnp.take(xp, model.block_dims, axis=-1)


def train_ah_model(key, sample, dims_per_block: int,
                   clusters_per_block: int = 16, iterations: int = 10,
                   dims: int | None = None,
                   variable_dims_per_block=None) -> AHModel:
    """Train per-block codebooks on a (residual) sample.

    Reference: TrainAsymmetricHashing runs one k-means per block
    (asymmetric_hashing_impl.cc:60-198) with kmeans++ init under squared L2;
    here the blocks train as one vmapped batched k-means.
    ``variable_dims_per_block``: optional per-block widths (VARIABLE_CHUNK);
    padding slots read zeros so their center coordinates train to zero.
    """
    if dims is None:
        dims = sample.shape[-1]
    block_dims = None
    if variable_dims_per_block is not None:
        block_dims = jnp.asarray(
            make_block_dims(dims, variable_dims_per_block))
        probe = AHModel(codebook=jnp.zeros(
            (block_dims.shape[0], clusters_per_block,
             block_dims.shape[1])), dims=dims, block_dims=block_dims)
        xc = chunk_model(sample.astype(jnp.float32), probe)
    else:
        xc = chunk(sample.astype(jnp.float32), dims_per_block)
    num_blocks = xc.shape[-2]
    xb = jnp.swapaxes(xc, 0, 1)  # (num_blocks, n, width)
    keys = jax.random.split(key, num_blocks)

    def train_block(k, xblk):
        res = kmeans_ops.kmeans(k, xblk, k=clusters_per_block,
                                iterations=iterations, init="kmeans++")
        return res.centers

    codebook = jax.vmap(train_block)(keys, xb)
    if block_dims is not None:
        # Padding slots carry exact zeros (k-means on a zero column can
        # leave numerically-tiny noise from empty-cluster reseeding).
        live = (block_dims < dims)[:, None, :]
        codebook = jnp.where(live, codebook, 0.0)
    return AHModel(codebook=codebook, dims=dims, block_dims=block_dims)


def _block_stats(vectors, originals, model: AHModel):
    """Residual stats per (point, block, center): squared residual norm and
    parallel residual component (ComputeResidualStats,
    asymmetric_hashing_impl.cc:300-348).

    vectors: the vectors being encoded (residuals in tree-AH); originals: the
    original datapoints defining the "parallel" direction.
    """
    cb = model.codebook  # (B, J, d)
    vc = chunk_model(vectors, model)  # (n, B, d)
    oc = chunk_model(originals, model)
    v_dot_c = jnp.einsum("nbd,bjd->nbj", vc, cb,
                         preferred_element_type=jnp.float32)
    o_dot_c = jnp.einsum("nbd,bjd->nbj", oc, cb,
                         preferred_element_type=jnp.float32)
    v_sq = jnp.sum(vc * vc, axis=-1)  # (n, B)
    c_sq = jnp.sum(cb * cb, axis=-1)  # (B, J)
    rn = v_sq[:, :, None] - 2.0 * v_dot_c + c_sq[None, :, :]
    inv_norm = 1.0 / jnp.maximum(
        jnp.linalg.norm(originals, axis=-1), 1e-20)  # (n,)
    v_dot_o = jnp.sum(vc * oc, axis=-1)  # (n, B)
    pc = (v_dot_o[:, :, None] - o_dot_c) * inv_norm[:, None, None]
    return rn, pc


def encode(vectors, model: AHModel):
    """Plain per-block nearest-center encoding -> (n, num_blocks) int8
    codes (AhImpl::IndexDatapoint, asymmetric_hashing_impl.cc:200-246)."""
    cb = model.codebook
    vc = chunk_model(vectors.astype(jnp.float32), model)
    dots = jnp.einsum("nbd,bjd->nbj", vc, cb,
                      preferred_element_type=jnp.float32)
    c_sq = jnp.sum(cb * cb, axis=-1)
    # argmin ||v - c||^2 == argmin (-2 v.c + ||c||^2)
    return jnp.argmin(c_sq[None, :, :] - 2.0 * dots,
                      axis=-1).astype(jnp.uint8)


_NOISE_SHAPING_ROUNDS = 10  # kMaxRounds, asymmetric_hashing_impl.cc:475


def encode_noise_shaped(vectors, originals, model: AHModel,
                        threshold: float, eta: float = math.nan):
    """Anisotropic (score-aware) encoding via coordinate descent.

    Faithful port of the *algorithm* of AhImpl::IndexDatapointNoiseShaped
    (asymmetric_hashing_impl.cc:434-503): init at per-block min residual
    norm, process blocks in decreasing initial-residual order, switch a
    block's center only when it strictly lowers
    eta * d(par^2) + d(perp^2), for up to 10 rounds.  Vectorized over points
    with a lax.scan over (round, block) steps; the only sequential state is
    the scalar parallel residual component per point.
    """
    n = vectors.shape[0]
    rn, pc = _block_stats(vectors.astype(jnp.float32),
                          originals.astype(jnp.float32), model)
    num_blocks = model.num_blocks
    sq_norms = jnp.sum(originals.astype(jnp.float32) ** 2, axis=-1)
    if math.isnan(eta):
        eta_v = _parallel_cost_multiplier(threshold, sq_norms, model.dims)
    else:
        eta_v = jnp.full((n,), eta, jnp.float32)

    codes0 = jnp.argmin(rn, axis=-1).astype(jnp.int32)  # (n, B)
    p0 = jnp.sum(jnp.take_along_axis(pc, codes0[:, :, None],
                                     axis=-1)[:, :, 0], axis=-1)  # (n,)
    init_rn = jnp.take_along_axis(rn, codes0[:, :, None], axis=-1)[:, :, 0]
    order = jnp.argsort(-init_rn, axis=-1)  # (n, B) blocks by desc residual

    # Permute each row's blocks into visit order ONCE so the scan below
    # reads one contiguous block-slab per step (dynamic_slice) instead of
    # a per-row gather over the whole (n, B, J) tables — that gather
    # makes XLA stream the full tables every step (500 steps), which
    # dominated encode time at glove scale.  Switch decisions are
    # bit-identical; only the indexing changes.
    rn_pm = jnp.take_along_axis(rn, order[:, :, None], axis=1)
    pc_pm = jnp.take_along_axis(pc, order[:, :, None], axis=1)
    codes0_pm = jnp.take_along_axis(codes0, order, axis=1)

    def step(carry, s):
        codes, p = carry  # (n, B) permuted-space, (n,)
        j = s % num_blocks

        def slab(a):
            return jax.lax.dynamic_slice_in_dim(a, j, 1, axis=1)[:, 0]

        rn_b = slab(rn_pm)  # (n, J)
        pc_b = slab(pc_pm)
        cur = slab(codes)  # (n,)
        cur_rn = jnp.take_along_axis(rn_b, cur[:, None], axis=1)[:, 0]
        cur_pc = jnp.take_along_axis(pc_b, cur[:, None], axis=1)[:, 0]
        new_p = p[:, None] - cur_pc[:, None] + pc_b  # (n, J)
        pnd = new_p * new_p - (p * p)[:, None]
        rnd = rn_b - cur_rn[:, None]
        cost = eta_v[:, None] * pnd + (rnd - pnd)
        # Reference skips candidates that increase the parallel norm
        # (OptimizeSingleSubspace: `if parallel_norm_delta > 0 continue`)
        # and keeps the current center unless strictly better.
        cost = jnp.where(pnd > 0.0, jnp.inf, cost)
        j_idx = jax.lax.broadcasted_iota(jnp.int32, cost.shape, 1)
        cost = jnp.where(j_idx == cur[:, None], jnp.inf, cost)
        best_j = jnp.argmin(cost, axis=-1).astype(jnp.int32)
        best_cost = jnp.take_along_axis(cost, best_j[:, None], axis=1)[:, 0]
        switch = best_cost < 0.0
        new_code = jnp.where(switch, best_j, cur)
        codes = jax.lax.dynamic_update_slice_in_dim(
            codes, new_code[:, None], j, axis=1)
        p = jnp.where(
            switch,
            jnp.take_along_axis(new_p, best_j[:, None], axis=1)[:, 0], p)
        return (codes, p), None

    steps = jnp.arange(_NOISE_SHAPING_ROUNDS * num_blocks)
    (codes_pm, _), _ = jax.lax.scan(step, (codes0_pm, p0), steps)
    codes = jnp.take_along_axis(codes_pm, jnp.argsort(order, axis=-1),
                                axis=1)
    return codes.astype(jnp.uint8)


def _parallel_cost_multiplier(threshold, squared_norms, dims):
    """eta(T) (ComputeParallelCostMultiplier, noise_shaping_utils.h:31-38)."""
    sq = jnp.maximum(squared_norms, 1e-20)
    parallel_cost = (threshold * threshold) / sq
    perp_cost = (1.0 - parallel_cost) / (dims - 1.0)
    return parallel_cost / jnp.maximum(perp_cost, 1e-20)


def reconstruct(codes, model: AHModel):
    """Decode (n, B) codes back to approximate vectors (Indexer's
    reconstruction path, asymmetric_hashing2/indexing.cc)."""
    cb = model.codebook
    gathered = jnp.take_along_axis(
        cb[None, :, :, :],
        codes.astype(jnp.int32)[:, :, None, None].repeat(
            cb.shape[-1], axis=-1), axis=2)[:, :, 0, :]
    flat = gathered.reshape(codes.shape[0], -1)
    if model.block_dims is None:
        return flat[:, :model.dims]
    # VARIABLE_CHUNK: scatter-add each block's values back to its owned
    # dims (every real dim is owned by exactly one block; padding slots
    # land on the dropped sentinel column).
    out = jnp.zeros((codes.shape[0], model.dims + 1), flat.dtype)
    out = out.at[:, model.block_dims.reshape(-1)].add(flat)
    return out[:, :model.dims]


# --------------------------------------------------------------------- LUTs
class LookupTables(NamedTuple):
    """Per-query lookup tables in the *similarity* convention
    (lut[q, b, j] = similarity contribution of center j of block b).

    int8 quantization follows ConvertLookupToFixedPoint
    (asymmetric_hashing_impl.cc:590-646): symmetric scale
    127/max|entry| per query (multiplier_quantile == 1.0, ROUND), with the
    reference's +128 uint8 bias replaced by signed int8 since the MXU
    accumulates int32 natively (no int16 saturation guard needed).
    """
    int8: jax.Array | None  # (q, B, J) int8
    raw: jax.Array | None  # (q, B, J) f32 (kept when lookup is float)
    inv_multiplier: jax.Array  # (q,) f32: accum * inv_multiplier -> f32
    base: jax.Array  # (q,) f32 additive per-query constant


def build_luts(queries, model: AHModel, measure: str,
               lookup_dtype: str = cfg.INT8) -> LookupTables:
    """Queries -> per-block lookup tables (CreateRawFloatLookupTable,
    asymmetric_hashing_impl.cc:505-568).

    dot_product: lut = q_b . c (similarity form of DotProductDistance).
    squared_l2: lut = -(||q_b - c||^2); the per-query ||q||^2 constant is
    carried in ``base`` exactly.
    """
    qf = queries.astype(jnp.float32)
    qc = chunk_model(qf, model)  # (q, B, d)
    cb = model.codebook
    dots = jnp.einsum("qbd,bjd->qbj", qc, cb,
                      preferred_element_type=jnp.float32)
    nq = qf.shape[0]
    if measure == cfg.DOT_PRODUCT:
        raw = dots
        base = jnp.zeros((nq,), jnp.float32)
    elif measure == cfg.SQUARED_L2:
        c_sq = jnp.sum(cb * cb, axis=-1)
        raw = 2.0 * dots - c_sq[None, :, :]
        base = -jnp.sum(qf * qf, axis=-1)
    else:
        raise ValueError(f"unsupported measure: {measure}")

    return quantize_luts(raw, base, lookup_dtype)


def quantize_luts(raw, base, lookup_dtype: str) -> LookupTables:
    """Apply the per-query fixed-point conversion to raw (q, B, J) tables
    (ConvertLookupToFixedPoint semantics, multiplier 127/max|entry|).

    Before quantizing, each block's entries are centered on the block's
    midpoint and the sum of midpoints folds into ``base`` — exactly one
    entry per block contributes to a score, so the sum is unchanged while
    the per-query fixed-point step shrinks to the largest within-block
    half-range (the reference's int8 conversion subtracts per-block
    offsets the same way, ConvertLookupToFixedPoint)."""
    nq = raw.shape[0]
    if lookup_dtype == cfg.INT8:
        mid = 0.5 * (jnp.max(raw, axis=2, keepdims=True)
                     + jnp.min(raw, axis=2, keepdims=True))  # (q, B, 1)
        centered = raw - mid
        base = base + jnp.sum(mid[:, :, 0], axis=1)
        max_abs = jnp.maximum(
            jnp.max(jnp.abs(centered), axis=(1, 2)),
            jnp.sqrt(jnp.finfo(jnp.float32).eps))
        mult = 127.0 / max_abs
        q8 = jnp.clip(jnp.round(centered * mult[:, None, None]),
                      -127, 127).astype(jnp.int8)
        return LookupTables(int8=q8, raw=None, inv_multiplier=1.0 / mult,
                            base=base)
    return LookupTables(int8=None, raw=raw,
                        inv_multiplier=jnp.ones((nq,), jnp.float32),
                        base=base)
