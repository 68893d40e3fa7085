"""Fused score + sub-block-max Pallas kernel.

The dense scoring paths (models/tree_ah.py, models/tree_x.py) bottleneck on
HBM and on top-k: XLA cannot fuse a reduction into a matmul consumer, so the
(num_queries, num_slots) score matrix round-trips through HBM (38 GB per
16k-query batch at glove scale) and approx_max_k reads it all again.  This
kernel keeps each score tile in VMEM and reduces it to one (max, argmax)
candidate per SUB-slot group before anything is written back:

    grid (Q/QT, S/BS):
        scores = q_tile (QT, D) @ rows_block (BS, D)^T + bias   # MXU
        reshape (QT, BS/SUB, SUB); max+argmax over SUB          # VPU, 2 passes
        out[(qt, sb)] = (vals (QT, BS/SUB), idx (QT, BS/SUB))

HBM traffic for scores drops by SUB(=256)x; the VPU reduction is two linear
passes (cheap next to an argmax-loop top-T).  A final approx/exact top-k
over the (Q, S/SUB) candidates runs in XLA.

``bias`` is a per-slot additive term: -||x||^2 for squared-L2 similarity
(the 2*q.x cross term is produced by scaling inside the kernel), and a
large negative value for padding slots so they can never be selected.

Correctness contract: the caller stores slots in RANDOM order (the tree-AH
layout permutes slots when this kernel is enabled).  Keeping only the top-1
per SUB random slots loses a true top-k candidate only when two of them
collide in one group: expected losses ~ k^2 * SUB / (2 S) (~1 of the top
100 at glove scale), absorbed by the reordering overretrieve, and
recall-neutral in expectation for the final top-10.

This is the TPU counterpart of the reference's LUT16 + FastTopNeighbors
fusion (lut16_avx2.inc:56-120 feeding fast_top_neighbors.h buffers): the
reference fuses lookup-accumulate with a top-k push per 32-datapoint group;
here the fusion is one MXU matmul + a grouped VPU max per (256-query,
2048-slot) tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile sizes: scores tile (QT, BS) f32 = 2 MB VMEM; rows block 512 KB bf16.
QT = 256
BS = 2048
SUB = 256  # slots per candidate group (one survivor each)
_PAD_PENALTY = -1e30


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(q_ref, rows_ref, bias_ref, vals_ref, idx_ref, *, scale):
    # Compute scores transposed — (BS, QT) with queries on the lane dim —
    # so the SUB-grouping splits the *sublane* dimension (free in Mosaic's
    # tiled layout) and the reductions run along sublanes; grouping the
    # lane dim instead would force a relayout copy of every score tile.
    scores = jax.lax.dot_general(
        rows_ref[:], q_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (BS, QT)
    scores = scale * scores + bias_ref[:].reshape(-1, 1)
    grouped = scores.reshape(BS // SUB, SUB, QT)
    vals_ref[0] = jnp.max(grouped, axis=1)  # (G, QT)
    idx_ref[0] = jnp.argmax(grouped, axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("measure_l2", "interpret"))
def fused_scan_groupmax(queries, rows, bias, *, measure_l2=False,
                        interpret=False):
    """queries (Q, D) bf16, rows (S, D) bf16, bias (S,) f32.

    Q must be a multiple of QT, S a multiple of BS, D a multiple of 128
    (callers pad).  Returns (vals (Q, S//SUB) f32, idx int32 global slot
    ids): the best slot of every SUB-slot group, unsorted.  For squared L2
    the bias holds -||x||^2 and the per-query -||q||^2 constant is omitted
    (rank-invariant; callers that need true distances add it back).
    """
    q, d = queries.shape
    s, d2 = rows.shape
    assert d == d2 and q % QT == 0 and s % BS == 0 and d % 128 == 0, (
        queries.shape, rows.shape)
    ns_b = s // BS
    groups_per_block = BS // SUB
    scale = 2.0 if measure_l2 else 1.0

    vals, idx = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=(q // QT, ns_b),
        in_specs=[
            pl.BlockSpec((QT, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BS, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BS,), lambda i, j: (j,),
                         memory_space=pltpu.VMEM),
        ],
        # Outputs are (steps, G, QT): per-step blocks (1, G, QT) have
        # Mosaic-aligned trailing dims (G % 8 == 0, QT % 128 == 0).
        out_specs=[
            pl.BlockSpec((1, groups_per_block, QT),
                         lambda i, j: (i * ns_b + j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, groups_per_block, QT),
                         lambda i, j: (i * ns_b + j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(((q // QT) * ns_b, groups_per_block, QT),
                                 jnp.float32),
            jax.ShapeDtypeStruct(((q // QT) * ns_b, groups_per_block, QT),
                                 jnp.int32),
        ],
        interpret=interpret,
    )(queries, rows, bias)
    # (q_tiles*ns_b, G, QT) -> (Q, ns_b*G); group-local -> global slot ids.
    g = groups_per_block
    vals = vals.reshape(q // QT, ns_b * g, QT)
    idx = idx.reshape(q // QT, ns_b * g, QT)
    vals = jnp.transpose(vals, (0, 2, 1)).reshape(q, ns_b * g)
    idx = jnp.transpose(idx, (0, 2, 1)).reshape(q, ns_b * g)
    group_base = (jnp.arange(ns_b * g, dtype=jnp.int32) * SUB)[None, :]
    return vals, idx + group_base


def build_bias(valid: np.ndarray, sq_norms=None) -> np.ndarray:
    """Per-slot additive bias: -||x||^2 under L2, plus the padding penalty
    for invalid slots."""
    bias = np.zeros(valid.shape[0], np.float32)
    if sq_norms is not None:
        bias -= np.asarray(sq_norms, np.float32)
    bias[~valid] = _PAD_PENALTY
    return bias


def pad_for_kernel(rows_np: np.ndarray):
    """Pad (S, D) to kernel-aligned shapes; returns (rows_padded, s_pad)."""
    s, d = rows_np.shape
    s_pad = _round_up(s, BS)
    d_pad = _round_up(d, 128)
    if s_pad == s and d_pad == d:
        return rows_np, s_pad
    out = np.zeros((s_pad, d_pad), rows_np.dtype)
    out[:s, :d] = rows_np
    return out, s_pad
