"""Stacked (additive) quantization.

TPU-native equivalent of the reference's StackedQuantizers
(scann/hashes/internal/stacked_quantizers.h:38 + .cc, selected by
quantization_scheme: STACKED in AsymmetricHasherConfig): instead of product
quantization's disjoint dimension blocks, M full-dimensional codebooks are
summed, x_hat = sum_m C_m[code_m].  Training is stage-wise greedy k-means on
the running residual (the reference's initialization pass) — batched here as
M sequential k-means fits.  Codes share the tree-AH storage layout ((n, M)
uint8), LUT scoring shape ((q, M, J) tables) and the reconstruct scoring
mode, so the whole searcher stack applies unchanged.

Dot-product LUT scoring is exact for additive codes
(q . x_hat = sum_m q . C_m[code_m]); squared-L2 LUT scoring is not (the
||x_hat||^2 cross terms couple stages), so L2 with stacked quantization
requires the reconstruct scoring mode — enforced by the searcher.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from scann_tpu.ops import kmeans as kmeans_ops


class StackedModel(NamedTuple):
    codebooks: jax.Array  # (num_stages, centers_per_stage, dims)
    dims: int

    @property
    def num_stages(self) -> int:
        return self.codebooks.shape[0]

    @property
    def centers_per_stage(self) -> int:
        return self.codebooks.shape[1]


def train_stacked(key, sample, num_stages: int, centers_per_stage: int = 16,
                  iterations: int = 10) -> StackedModel:
    """Stage-wise greedy training: each stage fits k-means to the residual
    left by the previous stages."""
    x = sample.astype(jnp.float32)
    d = x.shape[1]
    keys = jax.random.split(key, num_stages)
    books = []
    residual = x
    for m in range(num_stages):
        res = kmeans_ops.kmeans(keys[m], residual, k=centers_per_stage,
                                iterations=iterations, init="kmeans++")
        books.append(res.centers)
        residual = residual - jnp.take(res.centers, res.assignments, axis=0)
    return StackedModel(codebooks=jnp.stack(books), dims=d)


def encode_stacked(vectors, model: StackedModel):
    """Greedy per-stage nearest-center encoding -> (n, num_stages) uint8."""
    x = vectors.astype(jnp.float32)
    codes = []
    residual = x
    for m in range(model.num_stages):
        cb = model.codebooks[m]
        a, _ = kmeans_ops.assign(residual, cb)
        codes.append(a)
        residual = residual - jnp.take(cb, a, axis=0)
    return jnp.stack(codes, axis=1).astype(jnp.uint8)


def reconstruct_stacked(codes, model: StackedModel):
    """x_hat = sum_m C_m[code_m]."""
    out = jnp.zeros((codes.shape[0], model.dims), jnp.float32)
    for m in range(model.num_stages):
        out = out + jnp.take(model.codebooks[m],
                             codes[:, m].astype(jnp.int32), axis=0)
    return out


def build_stacked_luts(queries, model: StackedModel):
    """Dot-product LUTs: lut[q, m, j] = q . C_m[j] (exact for additive
    codes).  Shape-compatible with ops/lut16 scoring."""
    return jnp.einsum("qd,mjd->qmj", queries.astype(jnp.float32),
                      model.codebooks, preferred_element_type=jnp.float32)
