"""Multi-chip sharded search tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import scann_tpu
from scann_tpu.parallel import mesh as mesh_mod


def make_mesh(data=2, shard=4):
    devs = np.array(jax.devices()[:data * shard]).reshape(data, shard)
    return Mesh(devs, ("data", "shard"))


def make_data(n=4000, d=32, nq=32, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((30, d)).astype(np.float32)
    db = (centers[rng.integers(0, 30, n)]
          + 0.3 * rng.standard_normal((n, d)).astype(np.float32))
    q = rng.standard_normal((nq, d)).astype(np.float32)
    return db, q


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_matches_single_chip():
    db, q = make_data()
    s = (scann_tpu.builder(db, 10, "dot_product")
         .tree(num_leaves=32, num_leaves_to_search=8,
               training_sample_size=4000)
         .score_ah(2, anisotropic_quantization_threshold=0.2)
         .reorder(50).build())
    i1, d1 = s.search_batched(q)

    m = make_mesh()
    ss = mesh_mod.ShardedTreeAHSearcher.from_searcher(s, db, m)
    i2, d2 = ss.search_batched(q)
    # The sharded path rescores a superset of the single-chip candidates
    # (per-shard top-k_pre each) but against int8-compressed rows
    # (reference-style sharded memory), so near-ties may swap vs the f32
    # single-chip reorder; recall must stay within int8 noise and
    # distances where indices agree must match at int8 precision.
    agree = np.mean(i1 == i2)
    assert agree > 0.6, agree
    truth = np.argsort(-(q @ db.T), axis=1)[:, :10]

    def recall(idx):
        return np.mean([len(set(idx[i]) & set(truth[i])) / 10
                        for i in range(len(q))])

    assert recall(i2) >= recall(i1) - 0.03, (recall(i2), recall(i1))
    same = i1 == i2
    np.testing.assert_allclose(d1[same], d2[same], rtol=0.05, atol=0.05)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_soar():
    db, q = make_data()
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    s = (scann_tpu.builder(db, 10, "dot_product")
         .tree(num_leaves=32, num_leaves_to_search=8,
               training_sample_size=4000, soar_lambda=1.5)
         .score_ah(2, anisotropic_quantization_threshold=0.2)
         .reorder(50).build())
    m = make_mesh()
    ss = mesh_mod.ShardedTreeAHSearcher.from_searcher(s, db, m)
    idx, dist = ss.search_batched(q)
    for row in idx:
        valid = row[row >= 0]
        assert len(set(valid)) == len(valid)
    truth = np.argsort(-(q @ db.T), axis=1)[:, :10]
    r = np.mean([len(set(idx[i]) & set(truth[i])) / 10
                 for i in range(len(q))])
    assert r >= 0.85, r


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_kmeans_step():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4096, 16)).astype(np.float32)
    c0 = x[:32].copy()
    m = Mesh(np.array(jax.devices()[:8]), ("data",))
    from jax.sharding import NamedSharding, PartitionSpec as P
    xs = jax.device_put(jnp.asarray(x), NamedSharding(m, P("data", None)))
    c1 = np.asarray(mesh_mod.sharded_kmeans_step(xs, jnp.asarray(c0), m))
    # oracle: one unsharded Lloyd step
    d = ((x[:, None, :] - c0[None, :, :]) ** 2).sum(-1)
    a = d.argmin(1)
    want = np.array([x[a == j].mean(0) if (a == j).any() else c0[j]
                     for j in range(32)])
    np.testing.assert_allclose(c1, want, rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_build_end_to_end(tmp_path):
    """Multi-chip build (sharded k-means + sharded tokenize/encode +
    leaf-owner regroup) -> sharded search with recall vs exact ground
    truth, plus the sharded serialize/load round trip (BASELINE config 5
    scaled down to the virtual mesh; SURVEY.md §7 step 7)."""
    db, q = make_data(n=60000, d=32, nq=64, seed=1)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    cfg_ = (scann_tpu.builder(db, 10, "dot_product")
            .tree(num_leaves=64, num_leaves_to_search=12,
                  training_sample_size=20000)
            .score_ah(2, anisotropic_quantization_threshold=0.2)
            .reorder(60).create_config())
    m = make_mesh()
    ss = mesh_mod.build_sharded(db, cfg_, m)
    idx, dist = ss.search_batched(q)
    truth = np.argsort(-(q @ db.T), axis=1)[:, :10]
    r = np.mean([len(set(idx[i]) & set(truth[i])) / 10
                 for i in range(len(q))])
    assert r >= 0.9, r
    # round trip: bit-identical results after reload
    d_ = tmp_path / "sharded_idx"
    ss.serialize(str(d_))
    ss2 = mesh_mod.load_sharded(str(d_), m)
    idx2, dist2 = ss2.search_batched(q)
    np.testing.assert_array_equal(idx, idx2)
    np.testing.assert_allclose(dist, dist2, rtol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_recall_not_below_single_chip_at_scale():
    """The sharded searcher built from scratch stays within noise of a
    single-chip index built with the same config."""
    db, q = make_data(n=30000, d=32, nq=48, seed=2)
    builder = (scann_tpu.builder(db, 10, "dot_product")
               .tree(num_leaves=32, num_leaves_to_search=8,
                     training_sample_size=15000)
               .score_ah(2, anisotropic_quantization_threshold=0.2)
               .reorder(60))
    s1 = builder.build()
    i1, _ = s1.search_batched(q)
    m = make_mesh()
    ss = mesh_mod.build_sharded(db, builder.create_config(), m)
    i2, _ = ss.search_batched(q)
    truth = np.argsort(-(q @ db.T), axis=1)[:, :10]

    def recall(idx):
        return np.mean([len(set(idx[i]) & set(truth[i])) / 10
                        for i in range(len(q))])

    assert recall(i2) >= recall(i1) - 0.05, (recall(i2), recall(i1))
