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


# ---------------------------------------------------------------- exact


def _densify(m: sp.SparseMatrix) -> np.ndarray:
    out = np.zeros(m.shape, np.float32)
    row_of = np.repeat(np.arange(m.n_rows),
                       np.diff(m.indptr).astype(np.int64))
    out[row_of, m.indices] = m.values
    return out


def _oracle_dist(qd, xd, measure):
    if measure == "dot_product":
        return -(qd @ xd.T)  # sort key: ascending == descending dot
    if measure == "squared_l2":
        return ((qd[:, None, :] - xd[None, :, :]) ** 2).sum(-1)
    if measure == "cosine":
        qn = qd / np.maximum(np.linalg.norm(qd, axis=1, keepdims=True),
                             1e-20)
        xn = xd / np.maximum(np.linalg.norm(xd, axis=1, keepdims=True),
                             1e-20)
        return 1.0 - qn @ xn.T
    if measure == "l1":
        return np.abs(qd[:, None, :] - xd[None, :, :]).sum(-1)
    if measure == "hamming":
        return (qd[:, None, :] != xd[None, :, :]).sum(-1).astype(np.float64)
    if measure == "jaccard":
        mn = np.minimum(qd[:, None, :], xd[None, :, :]).sum(-1)
        mx = np.maximum(qd[:, None, :], xd[None, :, :]).sum(-1)
        return np.where(mx > 0, 1.0 - mn / mx, 1.0)
    raise ValueError(measure)


def test_sparse_exact_all_measures():
    """SparseExactSearcher matches a dense numpy oracle on every measure
    (reference: SparseDataset exact search across the one-to-one zoo,
    data_format/dataset.h:639, distance_measures/one_to_one/*.cc
    GetDistanceSparse)."""
    rng = np.random.default_rng(5)
    dims = 3000
    db = _make_sparse(n=2000, dims=dims, nnz=30, seed=1)
    q = _make_sparse(n=24, dims=dims, nnz=30, seed=2)
    db_pos = sp.SparseMatrix(db.indptr, db.indices, np.abs(db.values),
                             db.shape)
    q_pos = sp.SparseMatrix(q.indptr, q.indices, np.abs(q.values), q.shape)
    for measure in sp.SparseExactSearcher.MEASURES:
        dbm, qm = (db_pos, q_pos) if measure == "jaccard" else (db, q)
        s = sp.SparseExactSearcher(dbm, 10, measure, chunk_rows=512)
        idx, dist = s.search_batched(qm)
        qd, xd = _densify(qm), _densify(dbm)
        od = _oracle_dist(qd, xd, measure)
        oracle_idx = np.argsort(od, axis=1, kind="stable")[:, :10]
        # Compare by distance VALUES (ties permute indices freely).
        o_d = np.take_along_axis(od, oracle_idx, axis=1)
        got_d = np.take_along_axis(od, np.maximum(idx, 0), axis=1)
        assert np.allclose(np.sort(got_d, axis=1), np.sort(o_d, axis=1),
                           atol=2e-3), measure
        # Returned distances agree with the oracle's values at those ids.
        want = od[np.arange(len(qm.indptr) - 1)[:, None],
                  np.maximum(idx, 0)]
        if measure == "dot_product":
            want = -want  # oracle key was -dot
        assert np.allclose(dist, want, atol=2e-3), measure


def test_sparse_exact_validations():
    db = _make_sparse(n=100, dims=500, nnz=8, seed=3)
    import pytest
    with pytest.raises(ValueError, match="measure"):
        sp.SparseExactSearcher(db, 10, "limited_inner")
    with pytest.raises(ValueError, match="nonnegative"):
        sp.SparseExactSearcher(db, 10, "jaccard")
    s = sp.SparseExactSearcher(db, 10, "dot_product")
    bad = _make_sparse(n=4, dims=400, nnz=8, seed=4)
    with pytest.raises(ValueError, match="dims"):
        s.search_batched(bad)


def test_sparse_exact_binary_hamming_jaccard():
    """Binary data: hamming == symmetric support difference, jaccard ==
    1 - |inter|/|union| (BinaryJaccardDistance semantics)."""
    rng = np.random.default_rng(9)
    dims = 800
    rows = []
    for i in range(300):
        sup = np.sort(rng.choice(dims, 20, replace=False))
        rows.append(sup)
    indptr = np.arange(301, dtype=np.int64) * 20
    indices = np.concatenate(rows).astype(np.int64)
    vals = np.ones(300 * 20, np.float32)
    db = sp.SparseMatrix(indptr, indices, vals, (300, dims))
    q = sp.SparseMatrix(indptr[:5], indices[:80], vals[:80], (4, dims))
    for measure in ("hamming", "jaccard"):
        s = sp.SparseExactSearcher(db, 5, measure, chunk_rows=128)
        idx, dist = s.search_batched(q)
        # Row i of q IS row i of db: distance 0 to itself, ranked first.
        assert np.array_equal(idx[:, 0], np.arange(4)), (measure, idx[:, 0])
        assert np.allclose(dist[:, 0], 0.0), measure
