"""Batched k-means clustering on the MXU.

TPU-native replacement for the reference's GmmUtils k-means engine
(scann/utils/gmm_utils.cc: ComputeKmeansClustering :786-944, partition
assignment via many-to-many Top1 :508-535, ReinitializeCenters :1204-1232).
Where the reference runs threaded SIMD loops, here each Lloyd iteration is
one (sample x centers) matmul + argmin + segment-sum, and the whole training
loop is a single jitted lax.fori_loop.

Deliberate deviations from the reference, chosen for XLA-friendliness:
  * center reinitialization for empty / below-min-size clusters uses
    deterministic farthest-point reseeding (points with the largest distance
    to their current center) instead of the reference's random / PCA-split
    reassignment — same invariant (no undersized cluster keeps its center),
    static shapes, no host round-trip.
  * convergence_epsilon early-exit is not used; iteration count is static.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class KMeansResult(NamedTuple):
    centers: jax.Array  # (k, d) f32
    assignments: jax.Array  # (n,) int32
    counts: jax.Array  # (k,) int32


def assign(x, centers, x_sq=None, *, block_rows=None):
    """Nearest-center (squared L2) assignment: one matmul + argmin.

    Equivalent of GmmUtils' UnbalancedFloat32PartitionAssignment
    (gmm_utils.cc:508-535).  Returns (assignments, sq_distances_to_center).

    ``block_rows`` bounds the (rows, centers) f32 distance intermediate:
    when set, rows are processed in lax.map blocks of that many rows so
    peak memory is block_rows*k*4 bytes instead of n*k*4 (at n=250k,
    k=10k the full intermediate is 10 GB — past single-chip HBM).
    """
    if block_rows is not None and x.shape[0] > block_rows:
        n = x.shape[0]
        pad = (-n) % block_rows
        xp = jnp.pad(x, ((0, pad), (0, 0)))
        xsq = (jnp.sum(xp * xp, axis=-1) if x_sq is None
               else jnp.pad(x_sq, (0, pad)))
        nb = xp.shape[0] // block_rows
        a, dsq = jax.lax.map(
            lambda args: assign(args[0], centers, args[1]),
            (xp.reshape(nb, block_rows, -1),
             xsq.reshape(nb, block_rows)))
        return a.reshape(-1)[:n], dsq.reshape(-1)[:n]
    c_sq = jnp.sum(centers * centers, axis=-1)
    dots = jax.lax.dot_general(
        x, centers, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    # ||x-c||^2 - ||x||^2 = -2 x.c + ||c||^2 : the ||x||^2 term is constant
    # per row and does not affect the argmin.
    partial = c_sq[None, :] - 2.0 * dots
    a = jnp.argmin(partial, axis=-1).astype(jnp.int32)
    if x_sq is None:
        x_sq = jnp.sum(x * x, axis=-1)
    best = jnp.take_along_axis(partial, a[:, None], axis=-1)[:, 0]
    return a, jnp.maximum(best + x_sq, 0.0)


def _update_centers(x, a, k):
    sums = jax.ops.segment_sum(x, a, num_segments=k)
    counts = jax.ops.segment_sum(jnp.ones((x.shape[0],), jnp.float32), a,
                                 num_segments=k)
    centers = sums / jnp.maximum(counts, 1.0)[:, None]
    return centers, counts.astype(jnp.int32)


def _reseed_bad_centers(x, centers, a, counts, sq_dists, min_size):
    """Replace centers of clusters with < min_size members by the points
    currently farthest from their assigned centers (rank r bad cluster gets
    the r-th farthest point)."""
    k = centers.shape[0]
    bad = counts < min_size  # (k,)
    num_bad = jnp.sum(bad.astype(jnp.int32))
    # Rank bad clusters 0..num_bad-1 in index order.
    bad_rank = jnp.cumsum(bad.astype(jnp.int32)) - 1  # valid where bad
    # Farthest points, best first.
    order = jnp.argsort(-sq_dists)
    # For bad cluster with rank r: new center = x[order[r]].
    seed_idx = jnp.take(order, jnp.clip(bad_rank, 0, x.shape[0] - 1))
    seeds = jnp.take(x, seed_idx, axis=0)  # (k, d)
    new_centers = jnp.where(bad[:, None], seeds, centers)
    changed = num_bad > 0
    return new_centers, changed


def kmeans(key, x, k, *, iterations=12, init="random", spherical=False,
           min_cluster_size=1, block_rows=None):
    """Train k-means centers over ``x`` ((n, d) f32).

    init: "random" (RANDOM_INITIALIZATION) or "kmeans++"
    (DEFAULT_KMEANS_PLUS_PLUS); spherical normalizes centers each round
    (partitioning_type SPHERICAL, gmm_utils.cc spherical handling).
    min_cluster_size mirrors GmmUtils options (gmm_utils.h:42-95) with the
    reference's cap ``min(min_cluster_size, n / k)``
    (gmm_utils.cc:829-830).
    """
    n, d = x.shape
    if k > n:
        raise ValueError(f"cannot train {k} centers from {n} points")
    min_size = max(1, min(min_cluster_size, n // k))
    x = x.astype(jnp.float32)
    x_sq = jnp.sum(x * x, axis=-1)

    if init == "kmeans++":
        centers = _kmeanspp_init(key, x, k, x_sq)
    else:
        perm = jax.random.permutation(key, n)[:k]
        centers = jnp.take(x, perm, axis=0)

    def normalize(c):
        if not spherical:
            return c
        norms = jnp.linalg.norm(c, axis=-1, keepdims=True)
        return c / jnp.maximum(norms, 1e-20)

    centers = normalize(centers)

    def body(_, centers):
        a, sq_dists = assign(x, centers, x_sq, block_rows=block_rows)
        new_centers, counts = _update_centers(x, a, k)
        # Keep old center for empty clusters before reseeding (division
        # guard above zeroed them).
        new_centers = jnp.where((counts > 0)[:, None], new_centers, centers)
        new_centers, _ = _reseed_bad_centers(
            x, new_centers, a, counts, sq_dists, min_size)
        return normalize(new_centers)

    centers = jax.lax.fori_loop(0, iterations, body, centers)
    a, _ = assign(x, centers, x_sq, block_rows=block_rows)
    _, counts = _update_centers(x, a, k)
    return KMeansResult(centers, a, counts)


def _kmeanspp_init(key, x, k, x_sq):
    """Standard k-means++ D^2 seeding as a lax.scan over k draws
    (reference: GmmUtils::KMeansPPInitializeCenters)."""
    n, d = x.shape
    key, sub = jax.random.split(key)
    first = jax.random.randint(sub, (), 0, n)
    c0 = x[first]
    min_sq = jnp.maximum(
        x_sq - 2.0 * (x @ c0) + jnp.sum(c0 * c0), 0.0)

    def step(carry, sub):
        min_sq = carry
        probs = min_sq / jnp.maximum(jnp.sum(min_sq), 1e-30)
        idx = jax.random.categorical(sub, jnp.log(probs + 1e-30))
        c = x[idx]
        sq = jnp.maximum(x_sq - 2.0 * (x @ c) + jnp.sum(c * c), 0.0)
        return jnp.minimum(min_sq, sq), c

    keys = jax.random.split(key, k - 1)
    min_sq, rest = jax.lax.scan(step, min_sq, keys)
    return jnp.concatenate([c0[None, :], rest], axis=0)


def sample_rows(key, n_total, sample_size):
    """Uniform row sample without replacement (reference: reservoir sampling
    with expected_sample_size, partitioner_factory_base.cc:34-76)."""
    if sample_size >= n_total:
        return jnp.arange(n_total, dtype=jnp.int32)
    return jax.random.permutation(key, n_total)[:sample_size].astype(jnp.int32)
