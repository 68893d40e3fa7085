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


def test_typed_datasets():
    """Native int8/uint8 input datasets search without a float copy
    (reference: TypedDataset<T>, data_format/dataset.h:219, searched by
    the templated BruteForceSearcher, brute_force.h:41): device rows stay
    1 B/dim, scoring is exact, serialization round-trips the dtype."""
    import tempfile

    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    q = rng.standard_normal((24, 32)).astype(np.float32) * 40
    for dtype, measure in ((np.int8, "dot_product"),
                           (np.uint8, "squared_l2"),
                           (np.int8, "squared_l2")):
        info = np.iinfo(dtype)
        db = rng.integers(info.min, info.max + 1, (3000, 32)).astype(dtype)
        s = scann_tpu.builder(db, 10, measure).score_brute_force().build()
        assert s._db.dtype == jnp.asarray(db[:0]).dtype, s._db.dtype
        idx, dist = s.search_batched(q)
        dbf = db.astype(np.float32)
        if measure == "dot_product":
            truth_scores = q @ dbf.T
            truth = np.argsort(-truth_scores, axis=1)[:, :10]
        else:
            truth_scores = ((q ** 2).sum(1)[:, None] - 2 * q @ dbf.T
                            + (dbf ** 2).sum(1)[None])
            truth = np.argsort(truth_scores, axis=1)[:, :10]
        got = np.take_along_axis(truth_scores, idx, axis=1)
        want = np.take_along_axis(truth_scores, truth, axis=1)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)
        with tempfile.TemporaryDirectory() as td:
            s.serialize(td)
            s2 = scann_tpu.load_searcher(td)
            assert s2._db.dtype == s._db.dtype
            idx2, dist2 = s2.search_batched(q)
            np.testing.assert_array_equal(idx, idx2)
    # A non-BF config casts typed input to float and still works.
    db = rng.integers(-127, 128, (3000, 32)).astype(np.int8)
    s3 = (scann_tpu.builder(db, 10, "dot_product")
          .tree(num_leaves=8, num_leaves_to_search=8,
                training_sample_size=2000)
          .score_ah(2).reorder(40).build())
    idx3, _ = s3.search_batched(q)
    assert idx3.shape == (24, 10)
    # Typed mutation: upserted rows round+clip into the native dtype.
    docids = [str(i) for i in range(3000)]
    db8 = rng.integers(-127, 128, (3000, 32)).astype(np.int8)
    s4 = (scann_tpu.builder(db8, 5, "dot_product")
          .score_brute_force().build(docids=docids))
    s4.upsert("p", np.round(q[0]))
    i4, _ = s4.search(q[0] * 100.0)
    assert "p" in i4


def test_typed_dense_dataset_container():
    """DenseDataset keeps typed storage (float32 otherwise)."""
    from scann_tpu.data import dataset as dataset_mod
    d8 = dataset_mod.DenseDataset(
        np.ones((4, 8), np.uint8), docids=list("abcd"))
    assert d8.data.dtype == np.uint8
    d8.append(np.full((1, 8), 3, np.uint8), docids=["e"])
    assert d8.data.dtype == np.uint8 and len(d8) == 5
    df = dataset_mod.DenseDataset(np.ones((4, 8), np.float64))
    assert df.data.dtype == np.float32
