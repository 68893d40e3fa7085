"""Sparse input support: CSR container + hashed projection into the dense
pipeline.

The reference supports SparseDataset natively with sparse one-to-one
distance kernels (scann/data_format/dataset.h:639 SparseDataset,
distance_measures/one_to_one sparse overloads) — pointer-chasing work that
an MXU cannot express.  The TPU-first treatment routes sparse vectors
through a projection at ingest (the reference itself projects sparse data
for AH via its chunking projections, projection/chunking_projection.h):

  * SparseMatrix: a minimal CSR container (indptr/indices/values), also
    accepting scipy.sparse matrices.
  * SparseHashingProjection: feature hashing (signed random buckets) —
    an unbiased dot-product estimator, so dot_product / cosine searches
    over the projected vectors approximate the sparse originals with
    variance ~ ||x||^2 ||q||^2 / out_dims.
  * sparse_searcher(): projects the database, builds any dense searcher
    config over it, and wraps it so queries project transparently.

Exact sparse rescoring against the original CSR rows stays on the host
(numpy) for the final candidates when ``exact_rescore=True`` — the TPU
selects candidates, the host refines the handful of true dot products
(k * batch work, negligible).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np


class SparseMatrix(NamedTuple):
    """CSR sparse matrix (float32 values, int64 indices)."""
    indptr: np.ndarray   # (n + 1,)
    indices: np.ndarray  # (nnz,)
    values: np.ndarray   # (nnz,)
    shape: tuple

    @staticmethod
    def from_any(m) -> "SparseMatrix":
        if isinstance(m, SparseMatrix):
            return m
        if hasattr(m, "tocsr"):  # scipy.sparse
            csr = m.tocsr()
            csr.sort_indices()
            return SparseMatrix(np.asarray(csr.indptr, np.int64),
                                np.asarray(csr.indices, np.int64),
                                np.asarray(csr.data, np.float32),
                                tuple(csr.shape))
        if isinstance(m, np.ndarray) and m.ndim == 2:  # dense fallback
            nz = [np.nonzero(row)[0] for row in m]
            indptr = np.concatenate(
                [[0], np.cumsum([len(z) for z in nz])]).astype(np.int64)
            indices = np.concatenate(nz).astype(np.int64) if nz else \
                np.zeros((0,), np.int64)
            values = np.concatenate(
                [m[i, z] for i, z in enumerate(nz)]).astype(np.float32) \
                if nz else np.zeros((0,), np.float32)
            return SparseMatrix(indptr, indices, values, m.shape)
        raise TypeError(f"cannot interpret {type(m)} as a sparse matrix")

    @property
    def n_rows(self) -> int:
        return self.shape[0]

    def row(self, i: int):
        s, e = self.indptr[i], self.indptr[i + 1]
        return self.indices[s:e], self.values[s:e]

    def dot_dense_rows(self, rows: "SparseMatrix", idx: np.ndarray):
        """Exact sparse dot products self[q] . rows[idx[q, j]] for a
        candidate matrix idx — the serving-path rescore, executed by the
        native host runtime (scann_sparse_rescore, scann_tpu/cc/native.cc:
        two-pointer merge over sorted CSR rows) with a numpy fallback."""
        from scann_tpu.utils import native
        return native.sparse_rescore(self.indptr, self.indices,
                                     self.values, rows.indptr,
                                     rows.indices, rows.values, idx)


class SparseHashingProjection(NamedTuple):
    """Signed feature hashing: column c -> bucket h(c) with sign s(c).
    Unbiased estimator of dot products (Weinberger et al. 2009)."""
    out_dims: int
    seed: int

    def _hash(self, cols: np.ndarray):
        # splitmix64-style mixing; deterministic across processes.
        with np.errstate(over="ignore"):
            x = (cols.astype(np.uint64)
                 + np.uint64(0x9E3779B97F4A7C15)
                 * np.uint64(self.seed + 1))
            x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            x = x ^ (x >> np.uint64(31))
        bucket = (x % np.uint64(self.out_dims)).astype(np.int64)
        sign = np.where((x >> np.uint64(63)) & np.uint64(1), -1.0, 1.0)
        return bucket, sign.astype(np.float32)

    def project(self, m: SparseMatrix) -> np.ndarray:
        out = np.zeros((m.n_rows, self.out_dims), np.float32)
        bucket, sign = self._hash(m.indices)
        row_of = np.repeat(np.arange(m.n_rows),
                           np.diff(m.indptr).astype(np.int64))
        np.add.at(out, (row_of, bucket), m.values * sign)
        return out


class SparseSearcher:
    """Dense searcher over hashed projections of sparse vectors, with
    optional exact host rescoring against the original CSR rows."""

    def __init__(self, searcher, projection: SparseHashingProjection,
                 database: SparseMatrix, exact_rescore: bool = True,
                 overretrieve: float = 2.0):
        self.searcher = searcher
        self.projection = projection
        self.database = database
        self.exact_rescore = exact_rescore
        self.overretrieve = float(overretrieve)
        self.measure = searcher.config.distance_measure
        # Row squared norms of the ORIGINAL sparse rows: the exact rescore
        # must rank by the true measure, not the raw dot product (a dot
        # ordering under L2 ignores ||x||^2 — ADVICE r2).
        self._row_sq = np.zeros((database.n_rows,), np.float32)
        row_of = np.repeat(np.arange(database.n_rows),
                           np.diff(database.indptr).astype(np.int64))
        np.add.at(self._row_sq, row_of, database.values ** 2)

    def search_batched(self, queries, final_num_neighbors=None, **kwargs):
        q = SparseMatrix.from_any(queries)
        dense_q = self.projection.project(q)
        k = final_num_neighbors or self.searcher.config.num_neighbors
        fetch = (max(int(self.overretrieve * k), k + 10)
                 if self.exact_rescore else k)
        idx, dist = self.searcher.search_batched(
            dense_q, final_num_neighbors=fetch, **kwargs)
        idx = np.asarray(idx)
        if not self.exact_rescore:
            return idx[:, :k], np.asarray(dist)[:, :k]
        safe_idx = np.maximum(idx, 0)
        dots = q.dot_dense_rows(self.database, safe_idx)
        q_sq = np.zeros((q.n_rows,), np.float32)
        row_of = np.repeat(np.arange(q.n_rows),
                           np.diff(q.indptr).astype(np.int64))
        np.add.at(q_sq, row_of, q.values ** 2)
        if self.measure == "squared_l2":
            exact = -(q_sq[:, None] - 2.0 * dots
                      + self._row_sq[safe_idx])  # similarity = -distance
        elif self.measure == "cosine":
            denom = np.sqrt(np.maximum(q_sq[:, None]
                                       * self._row_sq[safe_idx], 1e-20))
            exact = dots / denom  # similarity = cos
        else:
            exact = dots
        exact = np.where(idx >= 0, exact, -np.inf)
        order = np.argsort(-exact, axis=1)[:, :k]
        top = np.take_along_axis(exact, order, axis=1)
        if self.measure == "squared_l2":
            user = -top
        elif self.measure == "cosine":
            user = 1.0 - top
        else:
            user = top
        user = np.where(np.isneginf(top), np.nan, user)
        return (np.take_along_axis(np.where(idx >= 0, idx, -1), order,
                                   axis=1), user)


def sparse_searcher(database, num_neighbors: int,
                    distance_measure: str = "dot_product",
                    projection_dims: int = 256, seed: int = 42,
                    exact_rescore: bool = True, overretrieve: float = 2.0,
                    configure=None) -> SparseSearcher:
    """Build a searcher over sparse input.

    database: SparseMatrix / scipy CSR / dense ndarray.  configure:
    optional fn(builder) -> builder to pick tree/AH settings; defaults to
    brute force for small corpora and tree+AH above 100k rows.
    """
    import scann_tpu
    m = SparseMatrix.from_any(database)
    proj = SparseHashingProjection(out_dims=projection_dims, seed=seed)
    dense = proj.project(m)
    b = scann_tpu.builder(dense, num_neighbors, distance_measure)
    if configure is not None:
        b = configure(b)
    elif m.n_rows > 100_000:
        b = (b.tree(num_leaves=max(2, m.n_rows // 512),
                    num_leaves_to_search=max(1, m.n_rows // 512 // 20))
             .score_ah(2).reorder(4 * num_neighbors))
    else:
        b = b.score_brute_force()
    return SparseSearcher(b.build(), proj, m,
                          exact_rescore=exact_rescore,
                          overretrieve=overretrieve)
