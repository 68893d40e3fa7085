"""Batched distance kernels.

TPU-native replacement for the reference's SIMD distance stack
(scann/distance_measures/): the hand-written one-to-many / many-to-many
AVX kernels (one_to_many_asymmetric.h:50-103, many_to_many/many_to_many.h)
become plain XLA matmuls that land on the MXU; "many to many" is a single
``dot_general`` over the batch, and the asymmetric int8xfloat / bf16xfloat
variants become dequantize-into-matmul fusions.

Internal convention: every scoring function returns **similarity** (higher is
closer).  The reference's DistanceMeasure convention (lower is closer;
DotProductDistance == -dot, distance_measure_base.h:38-52) maps to
``similarity = -distance``.  The user-facing sign is restored at the API
boundary (see models/base.py), mirroring the result-sign multiplier in
scann_ops/cc/scann.cc.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from scann_tpu import config as cfg

Precision = jax.lax.Precision


def _matmul(a, b_t, precision):
    """a: (m, d), b_t: (n, d) -> (m, n) in f32 on the MXU."""
    return jax.lax.dot_general(
        a, b_t,
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=precision,
        preferred_element_type=jnp.float32,
    )


def dot_products(queries, database, precision=Precision.HIGHEST):
    """(q, d) x (n, d) -> (q, n) dot products.

    Reference: DenseDotProductDistanceOneToMany / ManyToMany
    (one_to_many_symmetric.h, many_to_many.h) modulo the sign flip.
    """
    return _matmul(queries, database, precision)


def squared_l2(queries, database, db_sq_norms=None, query_sq_norms=None,
               precision=Precision.HIGHEST):
    """(q, d) x (n, d) -> (q, n) squared L2 distances.

    Uses the ||q||^2 - 2 q.x + ||x||^2 expansion so the inner product rides
    the MXU; ``db_sq_norms`` may be precomputed (the reference's scalar
    quantized searcher stores them, scalar_quantized_brute_force.h).

    For asymmetric scoring (int8 database with the inverse multipliers folded
    into the query) pass ``query_sq_norms`` of the *original* queries: the
    scaled query only reproduces the cross term, not its own norm.
    """
    if db_sq_norms is None:
        db_sq_norms = jnp.sum(
            database.astype(jnp.float32) ** 2, axis=-1)
    if query_sq_norms is None:
        query_sq_norms = jnp.sum(
            queries.astype(jnp.float32) ** 2, axis=-1)
    dots = _matmul(queries, database, precision)
    d = query_sq_norms[:, None] - 2.0 * dots + db_sq_norms[None, :]
    return jnp.maximum(d, 0.0)


def similarity(queries, database, measure, db_sq_norms=None,
               query_sq_norms=None, precision=Precision.HIGHEST):
    """Similarity scores, higher == closer, for a supported measure."""
    if measure == cfg.DOT_PRODUCT:
        return dot_products(queries, database, precision)
    if measure == cfg.SQUARED_L2:
        return -squared_l2(queries, database, db_sq_norms, query_sq_norms,
                           precision)
    if measure == cfg.L1:
        # Elementwise (no matmul decomposition); callers chunk the
        # database axis (brute_force does).
        return -l1_distance(queries.astype(jnp.float32),
                            database.astype(jnp.float32))
    raise ValueError(f"unsupported distance measure: {measure}")


def similarity_to_user_distance(sim, measure):
    """Convert internal similarity to the user-facing distance.

    Matches the reference pybind behavior: dot_product returns dot products
    (descending best-first), squared_l2 returns squared distances (ascending
    best-first), cosine returns 1 - cos (ascending best-first)."""
    if measure == cfg.DOT_PRODUCT:
        return sim
    if measure == cfg.COSINE:
        return 1.0 - sim
    return -sim  # squared_l2 / l1: distance = -similarity


def cosine_distance(queries, database, precision=Precision.DEFAULT):
    """1 - cos(q, x) (reference: one_to_one/cosine_distance.cc), batched."""
    qn = queries / jnp.maximum(
        jnp.linalg.norm(queries, axis=-1, keepdims=True), 1e-20)
    dn = database / jnp.maximum(
        jnp.linalg.norm(database, axis=-1, keepdims=True), 1e-20)
    return 1.0 - _matmul(qn, dn, precision)


def l1_distance(queries, database):
    """Manhattan distance (reference: one_to_one/l1_distance.cc).  O(q*n*d)
    elementwise — no matmul decomposition exists; chunk at the call site."""
    return jnp.sum(jnp.abs(queries[:, None, :] - database[None, :, :]),
                   axis=-1)


def hamming_distance(queries, database):
    """Bitwise Hamming over binarized (>0) vectors (reference:
    one_to_one/hamming_distance.cc general-Hamming semantics)."""
    qb = queries > 0
    db = database > 0
    return jnp.sum(qb[:, None, :] != db[None, :, :], axis=-1)


def jaccard_distance(queries, database):
    """1 - |min|/|max| nonnegative Jaccard (reference:
    one_to_one/nonzero_intersect_distance.cc family)."""
    mins = jnp.sum(jnp.minimum(queries[:, None, :], database[None, :, :]),
                   axis=-1)
    maxs = jnp.sum(jnp.maximum(queries[:, None, :], database[None, :, :]),
                   axis=-1)
    return 1.0 - mins / jnp.maximum(maxs, 1e-20)


def limited_inner_product_distance(queries, database,
                                   precision=Precision.DEFAULT):
    """-<q, x> / (||q|| * max(||q||, ||x||)) (reference:
    one_to_one/limited_inner_product.h LimitedInnerProductDistance)."""
    dots = _matmul(queries, database, precision)
    qn = jnp.linalg.norm(queries, axis=-1)[:, None]
    dn = jnp.linalg.norm(database, axis=-1)[None, :]
    denom = qn * jnp.maximum(qn, dn)
    return -dots / jnp.maximum(denom, 1e-20)


def one_to_many_gathered(queries, database, candidate_idx, measure,
                         db_sq_norms=None, query_sq_norms=None,
                         precision=Precision.HIGHEST):
    """Exact scores of per-query candidate lists: the reordering hot kernel.

    queries: (q, d); database: (n, d) (any float/int dtype); candidate_idx:
    (q, k) int32, may contain -1 (invalid -> -inf similarity).

    Reference: the index-gather form of DenseDotProductDistanceOneToMany*
    (one_to_many_asymmetric.h:75-103) used by the reordering helpers
    (utils/reordering_helper.h).  On TPU this is a row gather feeding a
    batched matvec on the MXU.
    """
    valid = candidate_idx >= 0
    safe_idx = jnp.where(valid, candidate_idx, 0)
    rows = jnp.take(database, safe_idx.reshape(-1), axis=0)
    rows = rows.reshape(candidate_idx.shape + (database.shape[-1],))
    rows_f = rows.astype(jnp.float32)
    q_f = queries.astype(jnp.float32)
    dots = jax.lax.dot_general(
        q_f, rows_f,
        dimension_numbers=(((1,), (2,)), ((0,), (0,))),
        precision=precision,
        preferred_element_type=jnp.float32,
    )  # (q, k)
    if measure == cfg.DOT_PRODUCT:
        sim = dots
    elif measure == cfg.SQUARED_L2:
        if db_sq_norms is None:
            row_sq = jnp.sum(rows_f * rows_f, axis=-1)
        else:
            row_sq = jnp.take(db_sq_norms, safe_idx.reshape(-1), axis=0)
            row_sq = row_sq.reshape(candidate_idx.shape)
        if query_sq_norms is None:
            q_sq = jnp.sum(q_f * q_f, axis=-1, keepdims=True)
        else:
            q_sq = query_sq_norms[:, None]
        sim = -jnp.maximum(q_sq - 2.0 * dots + row_sq, 0.0)
    else:
        raise ValueError(f"unsupported distance measure: {measure}")
    return jnp.where(valid, sim, -jnp.inf)
