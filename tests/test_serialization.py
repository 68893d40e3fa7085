"""Serialization round-trip invariance (reference: verify_serialization,
scann_ops_pybind_test.py:39-59 — reloaded searcher must return identical
results) + tree-X (tree + brute force) searcher coverage."""

import numpy as np
import pytest

import scann_tpu


def make_data(n=3000, d=24, nq=16, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((20, d)).astype(np.float32)
    db = (centers[rng.integers(0, 20, n)]
          + 0.3 * rng.standard_normal((n, d)).astype(np.float32))
    q = rng.standard_normal((nq, d)).astype(np.float32)
    return db, q


def roundtrip(s, tmp_path, q):
    i1, d1 = s.search_batched(q)
    s.serialize(str(tmp_path))
    s2 = scann_tpu.load_searcher(str(tmp_path))
    i2, d2 = s2.search_batched(q)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(d1, d2)
    return s2


def test_serialize_brute_force(tmp_path):
    db, q = make_data()
    s = (scann_tpu.builder(db, 7, "squared_l2")
         .score_brute_force(quantize="int8").build())
    roundtrip(s, tmp_path, q)


def test_serialize_tree_ah(tmp_path):
    db, q = make_data()
    s = (scann_tpu.builder(db, 10, "dot_product")
         .tree(num_leaves=16, num_leaves_to_search=4,
               training_sample_size=3000)
         .score_ah(2, anisotropic_quantization_threshold=0.2)
         .reorder(50, quantize="bfloat16").build())
    s2 = roundtrip(s, tmp_path, q)
    # overrides still work after reload
    i3, _ = s2.search_batched(q, leaves_to_search=16)
    assert i3.shape == (len(q), 10)


def test_serialize_tree_ah_soar(tmp_path):
    db, q = make_data()
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    s = (scann_tpu.builder(db, 10, "dot_product")
         .tree(num_leaves=16, num_leaves_to_search=4,
               training_sample_size=3000, soar_lambda=1.5)
         .score_ah(2, anisotropic_quantization_threshold=0.2)
         .reorder(50).build())
    s2 = roundtrip(s, tmp_path, q)
    assert s2.datapoint_to_token.shape == (len(db), 2)


def test_serialize_docids(tmp_path):
    db, q = make_data(n=500)
    docids = [f"d{i}" for i in range(500)]
    s = (scann_tpu.builder(db, 5, "dot_product").score_brute_force()
         .build(docids=docids))
    i1, _ = s.search(q[0])
    s.serialize(str(tmp_path))
    s2 = scann_tpu.load_searcher(str(tmp_path))
    i2, _ = s2.search(q[0])
    assert i1 == i2
    assert all(isinstance(x, str) for x in i2)


def test_tree_brute_force():
    """tree() + score_brute_force() -> TreeXSearcher
    (reference: test_tree_brute_force)."""
    db, q = make_data()
    truth_scores = q @ db.T
    truth = np.argsort(-truth_scores, axis=1)[:, :10]
    s = (scann_tpu.builder(db, 10, "dot_product")
         .tree(num_leaves=16, num_leaves_to_search=16,
               training_sample_size=3000)
         .score_brute_force().build())
    idx, dist = s.search_batched(q)
    # All leaves searched -> exact results.
    r = np.mean([len(set(idx[i]) & set(truth[i])) / 10
                 for i in range(len(q))])
    assert r == 1.0
    want = np.take_along_axis(truth_scores, idx, axis=1)
    np.testing.assert_allclose(dist, want, rtol=1e-5)


@pytest.mark.parametrize("quantize", ["int8", "bfloat16"])
def test_tree_brute_force_quantized(tmp_path, quantize):
    db, q = make_data()
    s = (scann_tpu.builder(db, 10, "squared_l2")
         .tree(num_leaves=16, num_leaves_to_search=8,
               training_sample_size=3000)
         .score_brute_force(quantize=quantize).reorder(50).build())
    idx, _ = s.search_batched(q)
    d2 = (np.sum(q * q, 1)[:, None] - 2 * q @ db.T
          + np.sum(db * db, 1)[None, :])
    truth = np.argsort(d2, axis=1)[:, :10]
    r = np.mean([len(set(idx[i]) & set(truth[i])) / 10
                 for i in range(len(q))])
    assert r >= 0.85, r
    roundtrip(s, tmp_path, q)


def test_searcher_tensor_round_trip():
    """searcher -> flat tensors -> searcher (the reference's
    scann_to_tensors / tensors_to_scann SavedModel round trip,
    scann_ops/cc/ops/scann_ops.cc:56-95): bit-identical results, tensors
    embeddable in any checkpoint format."""
    import scann_tpu
    from scann_tpu.utils import serialization

    rng = np.random.default_rng(0)
    db = rng.standard_normal((8000, 24)).astype(np.float32)
    q = rng.standard_normal((16, 24)).astype(np.float32)
    s = (scann_tpu.builder(db, 10, "dot_product")
         .tree(num_leaves=16, num_leaves_to_search=4,
               training_sample_size=4000)
         .score_ah(2).reorder(40)
         .build(docids=[str(i) for i in range(len(db))]))
    i1, d1 = s.search_batched(q)
    tensors = serialization.searcher_to_tensors(s)
    # every value is a plain numpy tensor (checkpointable)
    for k, v in tensors.items():
        assert isinstance(v, np.ndarray), k
    s2 = serialization.searcher_from_tensors(tensors)
    i2, d2 = s2.search_batched(q)
    assert [list(r) for r in i1] == [list(r) for r in i2]
    np.testing.assert_allclose(d1, d2, rtol=1e-6)
