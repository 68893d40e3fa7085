"""One-to-one distance zoo + dataset container tests (reference:
scann/distance_measures/one_to_one/, scann/data_format/)."""

import numpy as np
import jax.numpy as jnp
import pytest

from scann_tpu.data.dataset import DenseDataset, MetadataGetter
from scann_tpu.ops import distance as d


def data(n=50, m=20, dim=8):
    rng = np.random.default_rng(0)
    return (rng.random((m, dim)).astype(np.float32),
            rng.random((n, dim)).astype(np.float32))


def test_cosine():
    q, db = data()
    got = np.asarray(d.cosine_distance(jnp.asarray(q), jnp.asarray(db)))
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    dn = db / np.linalg.norm(db, axis=1, keepdims=True)
    np.testing.assert_allclose(got, 1 - qn @ dn.T, rtol=1e-4, atol=1e-5)


def test_l1():
    q, db = data()
    got = np.asarray(d.l1_distance(jnp.asarray(q), jnp.asarray(db)))
    want = np.abs(q[:, None] - db[None]).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_hamming():
    q, db = data()
    q = (q > 0.5).astype(np.float32)
    db = (db > 0.5).astype(np.float32)
    got = np.asarray(d.hamming_distance(jnp.asarray(q), jnp.asarray(db)))
    want = ((q[:, None] > 0) != (db[None] > 0)).sum(-1)
    np.testing.assert_array_equal(got, want)


def test_jaccard():
    q, db = data()
    got = np.asarray(d.jaccard_distance(jnp.asarray(q), jnp.asarray(db)))
    mins = np.minimum(q[:, None], db[None]).sum(-1)
    maxs = np.maximum(q[:, None], db[None]).sum(-1)
    np.testing.assert_allclose(got, 1 - mins / maxs, rtol=1e-5)


def test_limited_inner_product():
    q, db = data()
    got = np.asarray(d.limited_inner_product_distance(
        jnp.asarray(q), jnp.asarray(db)))
    qn = np.linalg.norm(q, axis=1)[:, None]
    dn = np.linalg.norm(db, axis=1)[None, :]
    want = -(q @ db.T) / (qn * np.maximum(qn, dn))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_dense_dataset():
    q, db = data()
    ds = DenseDataset(db, docids=[f"d{i}" for i in range(len(db))])
    assert len(ds) == len(db)
    assert ds.dimensionality == db.shape[1]
    assert ds.docid_for_index(3) == "d3"
    ds.set_unit_l2_norm()
    np.testing.assert_allclose(np.linalg.norm(ds.data, axis=1), 1.0,
                               rtol=1e-5)
    ds.append(q[0], docids=["new"])
    assert len(ds) == len(db) + 1
    assert abs(np.linalg.norm(ds.data[-1]) - 1.0) < 1e-5
    with pytest.raises(ValueError):
        ds.append(q[1])  # docids required


def test_metadata_getter():
    mg = MetadataGetter(payloads={0: "a", 1: "b"})
    assert mg.get(1) == "b"
    assert mg.batch_get(np.array([0, 1])) == ["a", "b"]
    assert MetadataGetter().get(0) is None


def test_cosine_through_builder():
    """Cosine is a first-class builder measure: dot product over unit
    vectors, distances returned as 1 - cos (reference treats angular data
    the same way)."""
    import tempfile
    import scann_tpu
    rng = np.random.default_rng(0)
    db = rng.standard_normal((20000, 32)).astype(np.float32) * \
        rng.uniform(0.5, 3.0, (20000, 1)).astype(np.float32)
    q = rng.standard_normal((40, 32)).astype(np.float32)
    dbn = db / np.linalg.norm(db, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    truth = np.argsort(-(qn @ dbn.T), axis=1)[:, :10]

    s = (scann_tpu.builder(db, 10, "cosine")
         .tree(num_leaves=16, num_leaves_to_search=8,
               training_sample_size=8000)
         .score_ah(2, anisotropic_quantization_threshold=0.2)
         .reorder(60).build())
    idx, dist = s.search_batched(q)
    r = np.mean([len(set(idx[i]) & set(truth[i])) / 10
                 for i in range(len(q))])
    assert r >= 0.85, r
    # distances are 1 - cos: ascending and within the valid range
    assert np.all(np.diff(dist, axis=1) >= -1e-5)
    assert np.all(dist >= -1e-4) and np.all(dist <= 2.0 + 1e-4)
    # brute force cosine agrees with the oracle exactly
    sb = scann_tpu.builder(db, 10, "cosine").score_brute_force().build()
    idx_b, dist_b = sb.search_batched(q)
    rb = np.mean([len(set(idx_b[i]) & set(truth[i])) / 10
                  for i in range(len(q))])
    assert rb >= 0.999, rb
    np.testing.assert_allclose(dist_b[:, 0],
                               1.0 - (qn @ dbn.T).max(axis=1),
                               rtol=1e-4, atol=1e-4)
    # serialize round trip preserves cosine semantics
    d = tempfile.mkdtemp()
    s.serialize(d)
    s2 = scann_tpu.load_searcher(d)
    idx2, dist2 = s2.search_batched(q)
    np.testing.assert_array_equal(idx, idx2)


def test_l1_brute_force_end_to_end():
    """L1 is a first-class brute-force measure (reference factory accepts
    L1 for non-hashed searchers, one_to_one/l1_distance.cc); tree/AH/
    reorder configs reject it."""
    import scann_tpu
    import pytest
    rng = np.random.default_rng(11)
    db = rng.standard_normal((3000, 20)).astype(np.float32)
    q = rng.standard_normal((7, 20)).astype(np.float32)
    s = scann_tpu.builder(db, 10, "l1").score_brute_force().build()
    idx, dist = s.search_batched(q)
    want = np.abs(q[:, None, :] - db[None, :, :]).sum(-1)
    truth = np.argsort(want, axis=1)[:, :10]
    for i in range(len(q)):
        assert set(idx[i]) == set(truth[i]), i
        np.testing.assert_allclose(
            dist[i], np.sort(want[i])[:10], rtol=1e-5)
    with pytest.raises(ValueError, match="brute-force search only"):
        (scann_tpu.builder(db, 10, "l1")
         .tree(num_leaves=4, num_leaves_to_search=2,
               training_sample_size=1000)
         .score_ah(2).create_config())


def test_dense_dataset_wired_into_factory():
    """DenseDataset feeds the factory/builder directly (docids +
    normalization carry over), and MetadataGetter attaches to searchers."""
    import scann_tpu
    rng = np.random.default_rng(2)
    db = rng.standard_normal((500, 16)).astype(np.float32)
    ds = DenseDataset(db, docids=[f"d{i}" for i in range(len(db))],
                      normalization="unitl2norm")
    s = scann_tpu.builder(ds, 5, "dot_product").score_brute_force().build()
    idx, _ = s.search_batched(ds.data[:3])
    # docids came from the dataset
    assert idx[0][0] == "d0"
    s2 = scann_tpu.builder(db, 5, "dot_product").score_brute_force().build()
    s2.set_metadata(MetadataGetter(payloads={i: f"p{i}"
                                             for i in range(len(db))}))
    i2, _ = s2.search_batched(db[:2])
    md = s2.metadata_for(i2)
    assert md.shape == i2.shape
    assert md[0, 0] == f"p{i2[0, 0]}"
