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
    ss = mesh_mod.ShardedTreeAHSearcher(s, db, m)
    i2, d2 = ss.search_batched(q)
    # The sharded path rescores a superset of the single-chip candidates
    # (per-shard top-k_pre each), so results mostly agree and sharded
    # recall must be >= single-chip recall.
    agree = np.mean(i1 == i2)
    assert agree > 0.9, agree
    truth = np.argsort(-(q @ db.T), axis=1)[:, :10]

    def recall(idx):
        return np.mean([len(set(idx[i]) & set(truth[i])) / 10
                        for i in range(len(q))])

    assert recall(i2) >= recall(i1) - 1e-9, (recall(i2), recall(i1))
    # Where indices agree, distances agree.
    same = i1 == i2
    np.testing.assert_allclose(d1[same], d2[same], rtol=1e-4, atol=1e-4)


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
    ss = mesh_mod.ShardedTreeAHSearcher(s, db, m)
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
