"""LUT16 scoring: table-lookup accumulation as one-hot matmuls on the MXU.

This replaces the reference's hand-written LUT16 SIMD kernels
(scann/hashes/internal/lut16_avx2.inc Avx2LUT16BottomLoop :56-120,
lut16_sse4.inc, lut16_avx512.inc, dispatched via LUT16Interface,
lut16_interface.h:40-135).  The x86 trick — `_mm256_shuffle_epi8` as a
16-way parallel table lookup — has no TPU analogue; instead the lookup
``sum_b lut[q, b, code[s, b]]`` is reformulated as

    scores[q, s] = onehot(codes[s]) . lut[q]        # (S, B*J) x (B*J, Q)

an int8 x int8 matmul with int32 accumulation that runs at MXU rate.  The
one-hot expansion is materialized only per database chunk (a few MB of VMEM
-friendly operand), never for the whole index, so index memory stays at one
int8 code per block (the 4-bit pair-packed HBM layout is a further 2x and
is handled at the storage layer).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from scann_tpu.ops import ah as ah_ops


def one_hot_codes(codes, clusters_per_block: int, dtype=jnp.int8):
    """(m, B) int codes -> (m, B * J) one-hot."""
    j = jax.lax.broadcasted_iota(
        jnp.int32, codes.shape + (clusters_per_block,), codes.ndim)
    oh = (codes[..., None].astype(jnp.int32) == j).astype(dtype)
    return oh.reshape(codes.shape[0], -1)


def score_codes_chunk(codes_chunk, luts: ah_ops.LookupTables,
                      clusters_per_block: int):
    """Score one chunk of codes against every query's LUT.

    codes_chunk: (m, B) int8; returns (q, m) f32 similarities
    (without the per-query ``base`` constant — callers add it once).

    Equivalent work to LUT16Interface::GetFloatDistances
    (lut16_interface.h:40-135) for a whole query batch at once.
    """
    if luts.int8 is not None:
        oh = one_hot_codes(codes_chunk, clusters_per_block, jnp.int8)
        lut_flat = luts.int8.reshape(luts.int8.shape[0], -1)  # (q, B*J)
        accum = jax.lax.dot_general(
            lut_flat, oh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)  # (q, m)
        return accum.astype(jnp.float32) * luts.inv_multiplier[:, None]
    oh = one_hot_codes(codes_chunk, clusters_per_block, jnp.bfloat16)
    lut_flat = luts.raw.reshape(luts.raw.shape[0], -1).astype(jnp.bfloat16)
    return jax.lax.dot_general(
        lut_flat, oh,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
