"""Brute-force searcher tests against a numpy oracle.

Mirrors the reference's testing idioms (scann_ops_pybind_test.py:66-106):
compare *distances* with tight tolerance rather than indices (tolerating FP
non-associativity), check batch == single consistency, and exercise API edge
cases.
"""

import numpy as np
import pytest

import scann_tpu


def make_data(n=1000, d=32, nq=16, seed=0):
    rng = np.random.default_rng(seed)
    db = rng.random((n, d), dtype=np.float32)
    q = rng.random((nq, d), dtype=np.float32)
    return db, q


def np_topk(db, q, k, measure):
    if measure == "dot_product":
        scores = q @ db.T  # higher better
        order = np.argsort(-scores, axis=1)[:, :k]
        dist = np.take_along_axis(scores, order, axis=1)
    else:
        d2 = (np.sum(q * q, 1)[:, None] - 2 * q @ db.T
              + np.sum(db * db, 1)[None, :])
        order = np.argsort(d2, axis=1)[:, :k]
        dist = np.take_along_axis(d2, order, axis=1)
    return order, dist


@pytest.mark.parametrize("measure", ["dot_product", "squared_l2"])
def test_brute_force(measure):
    db, q = make_data()
    k = 10
    s = scann_tpu.builder(db, k, measure).score_brute_force().build()
    idx, dist = s.search_batched(q)
    _, want = np_topk(db, q, k, measure)
    np.testing.assert_allclose(dist, want, rtol=2e-5, atol=1e-5)


@pytest.mark.parametrize("quantize", ["int8", "bfloat16"])
def test_brute_force_quantized(quantize):
    db, q = make_data()
    k = 10
    s = (scann_tpu.builder(db, k, "dot_product")
         .score_brute_force(quantize=quantize).build())
    idx, dist = s.search_batched(q)
    # Quantized scoring: check recall vs exact rather than exact distances
    # (reference: test_brute_force_quantized asserts close distances at
    # higher tolerance).
    exact_idx, exact_dist = np_topk(db, q, k, "dot_product")
    recall = np.mean([
        len(set(idx[i]) & set(exact_idx[i])) / k for i in range(len(q))])
    assert recall >= 0.9, recall
    np.testing.assert_allclose(dist, exact_dist, rtol=0.05, atol=0.05)


def test_batching_consistency():
    db, q = make_data()
    s = scann_tpu.builder(db, 5, "dot_product").score_brute_force().build()
    batched_idx, batched_dist = s.search_batched(q)
    for i in range(4):
        idx, dist = s.search(q[i])
        np.testing.assert_array_equal(idx, batched_idx[i])
        np.testing.assert_allclose(dist, batched_dist[i], rtol=1e-6)


def test_parallel_batching_matches():
    db, q = make_data()
    s = scann_tpu.builder(db, 5, "squared_l2").score_brute_force().build()
    i1, d1 = s.search_batched(q)
    i2, d2 = s.search_batched_parallel(q)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2)


def test_shapes():
    db, q = make_data()
    s = scann_tpu.builder(db, 5, "dot_product").score_brute_force().build()
    with pytest.raises(ValueError):
        s.search(q)  # 2d query into single-query API
    with pytest.raises(ValueError):
        s.search_batched(q[0])  # 1d into batched API
    with pytest.raises(ValueError):
        s.search(q[0][:-1])  # wrong dimensionality
    idx, dist = s.search(q[0])
    assert idx.shape == (5,) and dist.shape == (5,)


def test_k_overrides():
    db, q = make_data()
    s = scann_tpu.builder(db, 5, "dot_product").score_brute_force().build()
    idx, dist = s.search_batched(q, final_num_neighbors=7)
    assert idx.shape == (len(q), 7)
    want_idx, want_dist = np_topk(db, q, 7, "dot_product")
    np.testing.assert_allclose(dist, want_dist, rtol=2e-5)


def test_reordering_with_brute_force():
    # Exact scoring + exact reorder must equal exact scoring.
    db, q = make_data()
    s = (scann_tpu.builder(db, 5, "squared_l2")
         .score_brute_force(quantize="int8").reorder(40).build())
    idx, dist = s.search_batched(q)
    want_idx, want_dist = np_topk(db, q, 5, "squared_l2")
    np.testing.assert_allclose(dist, want_dist, rtol=2e-5, atol=1e-5)


def test_docids():
    db, q = make_data(n=100)
    docids = [f"doc-{i}" for i in range(100)]
    s = (scann_tpu.builder(db, 3, "dot_product").score_brute_force()
         .build(docids=docids))
    idx, dist = s.search(q[0])
    assert all(isinstance(x, str) and x.startswith("doc-") for x in idx)


def test_chunked_database_path():
    """Force the chunked scan path and compare against the direct path."""
    import scann_tpu.models.brute_force as bf_mod
    db, q = make_data(n=3000, d=16)
    old = bf_mod._MAX_SCORES
    try:
        bf_mod._MAX_SCORES = 4096  # tiny chunks
        s = (scann_tpu.builder(db, 8, "squared_l2").score_brute_force()
             .build())
        idx, dist = s.search_batched(q)
    finally:
        bf_mod._MAX_SCORES = old
    _, want = np_topk(db, q, 8, "squared_l2")
    np.testing.assert_allclose(dist, want, rtol=2e-5, atol=1e-5)
