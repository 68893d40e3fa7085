"""Top-k selection utilities.

TPU-native replacement for the reference's FastTopNeighbors / TopNeighbors
structures (utils/fast_top_neighbors.h:43-260, utils/top_n_amortized_constant.h).
Where the reference maintains an epsilon-pruned SIMD buffer per query, on TPU
the idiomatic form is a full batched top-k: ``jax.lax.top_k`` for exact
selection and ``jax.lax.approx_max_k`` (hardware-accelerated on TPU) for the
wide cross-leaf merge, with the recall slack absorbed into the reordering
overretrieve budget.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Invalid-candidate sentinel in result index arrays (the reference uses
# kInvalidDatapointIndex == uint32 max; -1 is the int32 twin).
INVALID_INDEX = -1


def top_k(scores, k, approx=False, recall_target=0.95):
    """Per-row top-k of a (..., n) similarity array (higher is better).

    Returns (values, indices), best first.  ``approx=True`` uses the TPU
    approx_max_k kernel; callers compensate with overretrieve the same way the
    reference compensates approximate LUT16 scoring with reordering.
    """
    n = scores.shape[-1]
    k = min(k, n)
    if approx and k < n:
        vals, idx = jax.lax.approx_max_k(scores, k,
                                         recall_target=recall_target)
    else:
        vals, idx = jax.lax.top_k(scores, k)
    return vals, idx.astype(jnp.int32)


def top_k_with_invalid(scores, k, valid=None, approx=False,
                       recall_target=0.95):
    """top_k that first masks invalid entries to -inf and reports them as
    INVALID_INDEX in the output indices."""
    if valid is not None:
        scores = jnp.where(valid, scores, -jnp.inf)
    vals, idx = top_k(scores, k, approx=approx, recall_target=recall_target)
    idx = jnp.where(jnp.isneginf(vals), INVALID_INDEX, idx)
    return vals, idx


def merge_top_k(vals_a, idx_a, vals_b, idx_b, k):
    """Merge two per-row candidate lists into the best k (by similarity).

    The cross-leaf / cross-shard top-k merge (reference: AddLeafResultsToTopN,
    tree_x_hybrid/internal/batching.h:43) as a concat + top_k, which XLA
    lowers to an efficient sort-based merge.
    """
    vals = jnp.concatenate([vals_a, vals_b], axis=-1)
    idx = jnp.concatenate([idx_a, idx_b], axis=-1)
    v, pos = jax.lax.top_k(vals, min(k, vals.shape[-1]))
    return v, jnp.take_along_axis(idx, pos, axis=-1)


def sort_results(vals, idx):
    """Final best-first ordering with invalid entries pushed to the end
    (reference: SortAndDropResults, base/single_machine_base.cc:872)."""
    order = jnp.argsort(-vals, axis=-1, stable=True)
    return (jnp.take_along_axis(vals, order, axis=-1),
            jnp.take_along_axis(idx, order, axis=-1))


def dedup_candidates(vals, idx):
    """Suppress duplicate indices per row, keeping the best-scored copy.

    Needed for SOAR spilled assignment where a datapoint lives in two leaves
    (reference: DeduplicateDatabaseSpilledResults,
    tree_x_hybrid/tree_ah_hybrid_residual.cc:779-783).  Sorts by (index,
    -score) and masks later copies of equal indices.
    """
    # Primary key: index; secondary: descending score. Use a compound sort.
    n = idx.shape[-1]
    # Sort by score descending first (stable), then by index (stable) =>
    # within equal indices, best score first.
    order1 = jnp.argsort(-vals, axis=-1, stable=True)
    idx1 = jnp.take_along_axis(idx, order1, axis=-1)
    vals1 = jnp.take_along_axis(vals, order1, axis=-1)
    order2 = jnp.argsort(idx1, axis=-1, stable=True)
    idx2 = jnp.take_along_axis(idx1, order2, axis=-1)
    vals2 = jnp.take_along_axis(vals1, order2, axis=-1)
    dup = jnp.concatenate(
        [jnp.zeros_like(idx2[..., :1], dtype=bool),
         idx2[..., 1:] == idx2[..., :-1]], axis=-1)
    dup = jnp.logical_or(dup, idx2 == INVALID_INDEX)
    vals2 = jnp.where(dup, -jnp.inf, vals2)
    idx2 = jnp.where(dup, INVALID_INDEX, idx2)
    return vals2, idx2
