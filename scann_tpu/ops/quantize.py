"""Scalar (int8) and bfloat16 dataset quantization.

TPU-native equivalent of the reference's
scann/utils/scalar_quantization_helpers.{h,cc} (ScalarQuantizeFloatDataset,
ComputeMaxQuantizationMultipliers, :52-90) and
scann/utils/bfloat16_helpers.{h,cc} (Bfloat16Quantize, :30-59).  Batched over
the dataset as pure XLA; the noise-shaped variants implement the same
parallel/perpendicular cost trade-off as the reference's per-datapoint
coordinate descent (utils/noise_shaping_utils.h) in vmapped fixed-round form.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp


class ScalarQuantizedData(NamedTuple):
    """int8 database + per-dimension multipliers (+ squared norms of the
    dequantized rows, as stored by ScalarQuantizedBruteForceSearcher)."""
    data: jax.Array  # (n, d) int8
    inverse_multipliers: jax.Array  # (d,) f32
    sq_norms: jax.Array  # (n,) f32 squared L2 norms of dequantized rows


def compute_multipliers(dataset, quantile: float = 1.0):
    """Per-dimension multipliers 127 / max|x_d| (reference:
    ComputeMaxQuantizationMultipliers / ComputeQuantiledQuantizationMultipliers,
    utils/scalar_quantization_helpers.cc)."""
    abs_x = jnp.abs(dataset.astype(jnp.float32))
    if quantile >= 1.0:
        bound = jnp.max(abs_x, axis=0)
    else:
        bound = jnp.quantile(abs_x, quantile, axis=0)
    bound = jnp.maximum(bound, 1e-20)
    return 127.0 / bound


def scalar_quantize(dataset, quantile: float = 1.0) -> ScalarQuantizedData:
    """Quantize a float dataset to int8 with per-dimension multipliers."""
    x = dataset.astype(jnp.float32)
    mult = compute_multipliers(x, quantile)
    q = jnp.clip(jnp.round(x * mult[None, :]), -127, 127).astype(jnp.int8)
    inv = 1.0 / mult
    deq = q.astype(jnp.float32) * inv[None, :]
    sq_norms = jnp.sum(deq * deq, axis=-1)
    return ScalarQuantizedData(q, inv, sq_norms)


def bfloat16_quantize(dataset):
    """Round-to-nearest bf16 compression (reference: Bfloat16Quantize,
    utils/bfloat16_helpers.h:30-48)."""
    return dataset.astype(jnp.bfloat16)


def parallel_cost_multiplier(threshold, squared_norms, dims):
    """eta(T): relative cost of parallel vs perpendicular quantization error.

    Reference: ComputeParallelCostMultiplier (utils/noise_shaping_utils.h:31-38)
    == (T^2/||x||^2) / ((1 - T^2/||x||^2)/(d-1)).
    """
    if math.isnan(threshold):
        return jnp.ones_like(squared_norms)
    parallel_cost = (threshold * threshold) / squared_norms
    perp_cost = (1.0 - parallel_cost) / (dims - 1.0)
    return parallel_cost / perp_cost
