"""K-means engine + partitioner tests."""

import jax
import jax.numpy as jnp
import numpy as np

from scann_tpu import config as cfg
from scann_tpu.ops import kmeans as kmeans_ops
from scann_tpu.partitioning import kmeans_tree


def clustered_data(n=2000, d=16, k=8, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((k, d)).astype(np.float32) * 5
    a = rng.integers(0, k, n)
    x = centers[a] + rng.standard_normal((n, d)).astype(np.float32) * 0.1
    return x, centers, a


def test_kmeans_recovers_clusters():
    # kmeans++ seeding reliably lands one center per well-separated cluster
    # (random init can split a cluster: a legal local optimum).
    x, true_centers, true_a = clustered_data()
    res = jax.jit(lambda key, xx: kmeans_ops.kmeans(
        key, xx, k=8, iterations=20, init="kmeans++"))(
            jax.random.PRNGKey(0), jnp.asarray(x))
    # Every recovered center should be close to some true center.
    d = np.linalg.norm(
        np.asarray(res.centers)[:, None, :] - true_centers[None, :, :],
        axis=-1)
    assert np.all(d.min(axis=1) < 0.5), d.min(axis=1)
    # Mean quantization error small.
    assign_np = np.asarray(res.assignments)
    err = np.linalg.norm(x - np.asarray(res.centers)[assign_np], axis=1)
    assert err.mean() < 0.6


def test_kmeans_min_cluster_size():
    x, _, _ = clustered_data(n=1000, k=4)
    res = jax.jit(lambda key, xx: kmeans_ops.kmeans(
        key, xx, k=50, iterations=15, min_cluster_size=10))(
            jax.random.PRNGKey(1), jnp.asarray(x))
    counts = np.asarray(res.counts)
    assert counts.min() >= 1
    assert counts.sum() == 1000


def test_kmeans_spherical():
    x, _, _ = clustered_data()
    res = jax.jit(lambda key, xx: kmeans_ops.kmeans(
        key, xx, k=8, iterations=10, spherical=True))(
            jax.random.PRNGKey(0), jnp.asarray(x))
    norms = np.linalg.norm(np.asarray(res.centers), axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)


def test_kmeanspp_init():
    x, true_centers, _ = clustered_data()
    res = jax.jit(lambda key, xx: kmeans_ops.kmeans(
        key, xx, k=8, iterations=10, init="kmeans++"))(
            jax.random.PRNGKey(3), jnp.asarray(x))
    d = np.linalg.norm(
        np.asarray(res.centers)[:, None, :] - true_centers[None, :, :],
        axis=-1)
    assert np.all(d.min(axis=1) < 0.5)


def _make_partitioner(x, measure="dot_product", **kw):
    part = cfg.PartitioningConfig(
        num_leaves=kw.pop("num_leaves", 16),
        num_leaves_to_search=kw.pop("num_leaves_to_search", 4),
        training_sample_size=kw.pop("training_sample_size", 100000), **kw)
    return part, kmeans_tree.KMeansTreePartitioner.train(
        x, part, measure, seed=0)


def test_partitioner_tokenization_roundtrip():
    x, _, _ = clustered_data(n=3000)
    part, p = _make_partitioner(x, measure="squared_l2")
    tokens = np.asarray(p.tokenize_database(x))
    assert tokens.shape == (3000,)
    assert tokens.min() >= 0 and tokens.max() < 16
    # Primary assignment must be the true nearest center.
    d = ((x[:, None, :] - np.asarray(p.centers)[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(tokens, d.argmin(1))
    # Query tokenization under L2: top-1 must equal primary token.
    ids, sims = p.tokenize_queries(jnp.asarray(x[:50]), 4)
    np.testing.assert_array_equal(np.asarray(ids)[:, 0], tokens[:50])


def test_partitioner_query_tokenization_dot():
    x, _, _ = clustered_data(n=3000)
    part, p = _make_partitioner(x, measure="dot_product")
    q = x[:20]
    ids, _ = p.tokenize_queries(jnp.asarray(q), 4)
    scores = q @ np.asarray(p.centers).T
    want = np.argsort(-scores, axis=1)[:, :4]
    np.testing.assert_array_equal(np.asarray(ids), want)


def test_partitioner_quantized_centroids():
    x, _, _ = clustered_data(n=3000)
    part, p = _make_partitioner(x, measure="dot_product",
                                quantize_centroids=True)
    assert p.centers_int8 is not None
    q = x[:20]
    ids, _ = p.tokenize_queries(jnp.asarray(q), 4)
    scores = q @ np.asarray(p.centers).T
    want = np.argsort(-scores, axis=1)[:, :1]
    # int8 tokenization should agree with float on the top-1 most of the time
    agree = np.mean(np.asarray(ids)[:, 0] == want[:, 0])
    assert agree >= 0.9, agree


def test_soar_assignment():
    x, _, _ = clustered_data(n=2000)
    part, p = _make_partitioner(x, measure="dot_product")
    soar = cfg.SoarConfig(lambda_=1.5)
    t2 = np.asarray(p.tokenize_database_soar(x, soar))
    assert t2.shape == (2000, 2)
    # secondary differs from primary
    assert np.all(t2[:, 0] != t2[:, 1])
    # primary equals plain tokenization
    t1 = np.asarray(p.tokenize_database(x))
    np.testing.assert_array_equal(t2[:, 0], t1)
    # reference oracle for the SOAR distance on a few points
    C = np.asarray(p.centers)
    for i in range(10):
        xi = x[i]
        r = xi - C[t2[i, 0]]
        r_hat = r / np.linalg.norm(r)
        d = ((xi[None] - C) ** 2).sum(-1) + 1.5 * ((xi[None] - C) @ r_hat) ** 2
        d[t2[i, 0]] = np.inf
        assert t2[i, 1] == d.argmin()


def test_residualize():
    x, _, _ = clustered_data(n=500)
    part, p = _make_partitioner(x, measure="dot_product")
    t = p.tokenize_database(x)
    r = np.asarray(p.residualize(x, t))
    np.testing.assert_allclose(
        r, x - np.asarray(p.centers)[np.asarray(t)], rtol=1e-6)


def test_avq_refit():
    x, _, _ = clustered_data(n=2000)
    part, p = _make_partitioner(x, measure="dot_product")
    t = np.asarray(p.tokenize_database(x))
    max_leaf = int(np.bincount(t, minlength=16).max())
    p2 = p.apply_avq(x, t, eta=3.0, max_leaf_size=max_leaf)
    # eta -> refit changes centers but keeps them near the mean.
    c_old = np.asarray(p.centers)
    c_new = np.asarray(p2.centers)
    assert not np.allclose(c_old, c_new)
    assert np.linalg.norm(c_new - c_old, axis=1).max() < 2.0
    # AVQ with eta=1 reduces to (norm-weighted identity) ~ mean-like refit:
    # sanity check it stays finite and close to members' mean.
    p3 = p.apply_avq(x, t, eta=1.0, max_leaf_size=max_leaf)
    assert np.isfinite(np.asarray(p3.centers)).all()


def test_query_spilling_types_and_learned_threshold():
    """Distance-conditioned query spilling (reference QuerySpillingConfig +
    GmmUtils::ComputeSpillingThreshold): searches fewer leaves for easy
    queries at matching recall, and the learned threshold targets the
    expected spill factor."""
    import scann_tpu
    from scann_tpu.partitioning import kmeans_tree as kt
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    centers = rng.standard_normal((32, 32)).astype(np.float32)
    db = (centers[rng.integers(0, 32, 40000)]
          + 0.25 * rng.standard_normal((40000, 32)).astype(np.float32))
    q = (centers[rng.integers(0, 32, 64)]
         + 0.25 * rng.standard_normal((64, 32)).astype(np.float32))
    d2 = (q ** 2).sum(1)[:, None] - 2 * q @ db.T + (db ** 2).sum(1)[None]
    truth = np.argsort(d2, axis=1)[:, :10]

    def build(**tree_kwargs):
        return (scann_tpu.builder(db, 10, "squared_l2")
                .tree(num_leaves=32, num_leaves_to_search=12,
                      training_sample_size=15000, **tree_kwargs)
                .score_ah(2).reorder(80).build())

    s_fixed = build()
    s_mult = build(query_spilling_type="multiplicative",
                   expected_spill_factor=4.0)
    thr = s_mult.partitioner.query_spilling_threshold
    assert thr > 1.0, thr  # multiplicative thresholds are ratios > 1

    def recall(idx):
        return np.mean([len(set(idx[i]) & set(truth[i])) / 10
                        for i in range(len(q))])

    i_f, _ = s_fixed.search_batched(q)
    i_m, _ = s_mult.search_batched(q)
    # in-distribution queries: distance-conditioned spilling stays close
    # to fixed-L recall while searching fewer leaves on average
    assert recall(i_m) >= recall(i_f) - 0.08, (recall(i_m), recall(i_f))

    # the mask itself: monotone (prefix of the ranked list), respects type
    sims = jnp.asarray([[-1.0, -2.0, -3.9, -4.1],
                        [-2.0, -7.9, -8.1, -9.0]])
    p = s_mult.partitioner._replace(query_spilling_type="multiplicative",
                                    query_spilling_threshold=4.0)
    m = np.asarray(p.spilling_mask(sims))
    np.testing.assert_array_equal(
        m, [[True, True, True, False], [True, True, False, False]])
    p2 = p._replace(query_spilling_type="additive",
                    query_spilling_threshold=1.5)
    m2 = np.asarray(p2.spilling_mask(sims))
    np.testing.assert_array_equal(
        m2, [[True, True, False, False], [True, False, False, False]])
    p3 = p._replace(query_spilling_type="absolute_distance",
                    query_spilling_threshold=8.0)
    m3 = np.asarray(p3.spilling_mask(sims))
    np.testing.assert_array_equal(
        m3, [[True, True, True, True], [True, True, False, False]])


def test_hierarchical_tree_training():
    """Two-level center training (reference KMeansTreeNode::Train
    recursion): k1 top clusters double as the upper tree; recall stays
    within noise of flat training at equal leaf counts."""
    import scann_tpu
    rng = np.random.default_rng(9)
    centers = rng.standard_normal((64, 32)).astype(np.float32)
    db = (centers[rng.integers(0, 64, 50000)]
          + 0.3 * rng.standard_normal((50000, 32)).astype(np.float32))
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    q = rng.standard_normal((48, 32)).astype(np.float32)
    truth = np.argsort(-(q @ db.T), axis=1)[:, :10]

    def recall(idx):
        return np.mean([len(set(idx[i]) & set(truth[i])) / 10
                        for i in range(len(q))])

    s_h = (scann_tpu.builder(db, 10, "dot_product")
           .tree(num_leaves=64, num_leaves_to_search=16,
                 training_sample_size=20000, hierarchical_top=8)
           .score_ah(2, anisotropic_quantization_threshold=0.2)
           .reorder(60).build())
    # top level became the upper tree
    assert s_h.partitioner.upper_centers is not None
    assert s_h.partitioner.upper_centers.shape[0] == 8
    assert s_h.partitioner.num_leaves >= 64
    idx_h, _ = s_h.search_batched(q)
    s_f = (scann_tpu.builder(db, 10, "dot_product")
           .tree(num_leaves=64, num_leaves_to_search=16,
                 training_sample_size=20000)
           .score_ah(2, anisotropic_quantization_threshold=0.2)
           .reorder(60).build())
    idx_f, _ = s_f.search_batched(q)
    rh, rf = recall(idx_h), recall(idx_f)
    assert rh >= rf - 0.05, (rh, rf)
    # serialization round trip preserves the hierarchy
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        s_h.serialize(td)
        s2 = scann_tpu.load_searcher(td)
        idx2, _ = s2.search_batched(q)
        np.testing.assert_array_equal(idx_h, idx2)


def test_undersampled_training_warns(caplog):
    """A training sample below the reference's kmeans stable size (100
    points per leaf, single_machine_autopilot.cc) must warn: the r5
    bench traced a recall collapse (0.0067 at leaves=4) to exactly this
    silent under-sampling."""
    import logging
    x, _, _ = clustered_data(n=4000)
    with caplog.at_level(logging.WARNING, logger="scann_tpu"):
        _make_partitioner(x, num_leaves=16, training_sample_size=800)
    assert any("training sample" in r.message for r in caplog.records)
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="scann_tpu"):
        _make_partitioner(x, num_leaves=16, training_sample_size=2000)
    assert not any("training sample" in r.message for r in caplog.records)
