"""Sparse input support (reference SparseDataset role, data_format/
dataset.h:639): hashed projection into the dense pipeline + exact host
rescoring against the original CSR rows."""

import numpy as np

from scann_tpu.data import sparse as sp


def _make_sparse(n=4000, dims=50000, nnz=24, seed=0):
    rng = np.random.default_rng(seed)
    indptr = np.arange(n + 1, dtype=np.int64) * nnz
    indices = np.concatenate(
        [np.sort(rng.choice(dims, nnz, replace=False)) for _ in range(n)]
    ).astype(np.int64)
    values = rng.standard_normal(n * nnz).astype(np.float32)
    return sp.SparseMatrix(indptr, indices, values, (n, dims))


def test_hashing_projection_preserves_dots():
    db = _make_sparse(n=500)
    proj = sp.SparseHashingProjection(out_dims=2048, seed=3)
    dense = proj.project(db)
    # unbiased: projected dot approximates the exact sparse dot
    exact = db.dot_dense_rows(db, np.arange(20)[None, :].repeat(20, 0))
    approx = dense[:20] @ dense[:20].T
    err = np.abs(approx - exact[:20, :20])
    scale = np.abs(exact[:20, :20]).max()
    assert np.median(err) <= 0.25 * max(scale, 1.0), np.median(err)
    # self-dots (norms) exact up to collisions
    self_exact = np.array([
        (db.row(i)[1] ** 2).sum() for i in range(20)])
    np.testing.assert_allclose(np.diag(approx), self_exact, rtol=0.2)


def test_sparse_searcher_end_to_end():
    db = _make_sparse(n=4000)
    # queries: perturbed copies of db rows -> their source is the nearest
    q_rows = np.arange(0, 4000, 173)[:16]
    indptr = db.indptr
    qi = np.concatenate([db.indices[indptr[r]:indptr[r + 1]]
                         for r in q_rows])
    qv = np.concatenate([db.values[indptr[r]:indptr[r + 1]] * 1.02
                         for r in q_rows]).astype(np.float32)
    q = sp.SparseMatrix(np.arange(17, dtype=np.int64) * 24, qi, qv,
                        (16, db.shape[1]))
    s = sp.sparse_searcher(db, 10, projection_dims=1024, exact_rescore=True)
    idx, dist = s.search_batched(q)
    hits = sum(1 for i, r in enumerate(q_rows) if idx[i][0] == r)
    assert hits >= 15, hits
    # distances are exact sparse dot products
    for i, r in enumerate(q_rows):
        qidx, qval = q.row(i)
        ridx, rval = db.row(int(idx[i][0]))
        want = sum(v * dict(zip(ridx.tolist(), rval.tolist())).get(c, 0.0)
                   for c, v in zip(qidx.tolist(), qval.tolist()))
        np.testing.assert_allclose(dist[i][0], want, rtol=1e-5)


def test_sparse_accepts_dense_ndarray():
    rng = np.random.default_rng(1)
    dense = rng.standard_normal((300, 64)).astype(np.float32)
    dense[np.abs(dense) < 1.0] = 0.0  # sparsify
    s = sp.sparse_searcher(dense, 5, projection_dims=128)
    idx, _ = s.search_batched(dense[:4])
    assert np.asarray(idx).shape == (4, 5)


def test_sparse_l2_exact_rescore():
    """Under squared_l2 the exact rescore ranks by true L2 distance
    (||q||^2 - 2 q.x + ||x||^2), not raw dot products (ADVICE r2)."""
    from scann_tpu.data import sparse as sp
    rng = np.random.default_rng(5)
    dense = rng.standard_normal((3000, 64)).astype(np.float32)
    dense[np.abs(dense) < 1.2] = 0.0  # sparsify
    # Scale some rows so dot-product and L2 orderings disagree.
    dense[:100] *= 5.0
    q_dense = rng.standard_normal((6, 64)).astype(np.float32)
    q_dense[np.abs(q_dense) < 0.8] = 0.0
    s = sp.sparse_searcher(dense, 10, "squared_l2",
                           projection_dims=64, exact_rescore=True,
                           overretrieve=20.0)
    idx, dist = s.search_batched(q_dense)
    d2 = ((q_dense[:, None, :] - dense[None, :, :]) ** 2).sum(-1)
    truth = np.argsort(d2, axis=1)[:, :10]
    r = np.mean([len(set(idx[i]) & set(truth[i])) / 10
                 for i in range(len(q_dense))])
    assert r >= 0.5, r  # hashing projection is approximate
    # Distances are true squared L2 of the returned rows.
    for i in range(len(q_dense)):
        for j, dp in enumerate(idx[i]):
            if dp >= 0:
                np.testing.assert_allclose(dist[i, j], d2[i, dp],
                                           rtol=1e-4, atol=1e-4)
    # Returned order is ascending in true distance.
    assert all(np.all(np.diff(row[~np.isnan(row)]) >= -1e-5)
               for row in dist)
