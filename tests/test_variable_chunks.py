"""VARIABLE_CHUNK product quantization (reference: ChunkingProjection
variable_blocks, projection/chunking_projection.h:40-90): per-block
widths, implemented as a block_dims gather table on the AH model so all
chunked math is width-agnostic."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import scann_tpu
from scann_tpu.ops import ah as ah_ops


def make_data(n=20000, d=20, nq=32, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((32, d)).astype(np.float32)
    db = (centers[rng.integers(0, 32, n)]
          + 0.3 * rng.standard_normal((n, d)).astype(np.float32))
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    q = rng.standard_normal((nq, d)).astype(np.float32)
    return db, q


def test_uniform_variable_equals_fixed():
    """variable widths [w]*B must reproduce the fixed-chunk model and
    codes bit-for-bit (same k-means inputs, same argmins)."""
    rng = np.random.default_rng(1)
    sample = rng.standard_normal((4000, 24)).astype(np.float32)
    key = jax.random.PRNGKey(7)
    m_fixed = ah_ops.train_ah_model(key, jnp.asarray(sample), 2)
    m_var = ah_ops.train_ah_model(key, jnp.asarray(sample), 2,
                                  variable_dims_per_block=[2] * 12)
    np.testing.assert_array_equal(np.asarray(m_fixed.codebook),
                                  np.asarray(m_var.codebook))
    v = jnp.asarray(sample[:500])
    np.testing.assert_array_equal(np.asarray(ah_ops.encode(v, m_fixed)),
                                  np.asarray(ah_ops.encode(v, m_var)))
    np.testing.assert_allclose(
        np.asarray(ah_ops.reconstruct(ah_ops.encode(v, m_var), m_var)),
        np.asarray(ah_ops.reconstruct(ah_ops.encode(v, m_fixed), m_fixed)),
        rtol=1e-6)


def test_variable_widths_encode_reconstruct():
    """Truly variable widths: reconstruction must cover every dim once
    and beat a coarser fixed chunking on reconstruction error."""
    rng = np.random.default_rng(2)
    sample = rng.standard_normal((6000, 20)).astype(np.float32)
    # More dims for the first (high-variance) blocks: 4+4+4+2+2+2+2 = 20.
    widths = [4, 4, 4, 2, 2, 2, 2]
    sample[:, :12] *= 0.2  # first dims low variance: wide blocks suffice
    key = jax.random.PRNGKey(3)
    m = ah_ops.train_ah_model(key, jnp.asarray(sample), 2,
                              variable_dims_per_block=widths)
    assert m.block_dims is not None and m.num_blocks == len(widths)
    v = jnp.asarray(sample[:1000])
    codes = ah_ops.encode(v, m)
    assert codes.shape == (1000, len(widths))
    recon = np.asarray(ah_ops.reconstruct(codes, m))
    assert recon.shape == (1000, 20)
    err = np.mean((recon - sample[:1000]) ** 2)
    base = np.mean(sample[:1000] ** 2)
    assert err < base * 0.6, (err, base)
    # Noise-shaped encoding runs under variable chunks too.
    ns = ah_ops.encode_noise_shaped(v, v, m, threshold=0.2)
    assert ns.shape == codes.shape
    # Mismatched widths are rejected.
    with pytest.raises(ValueError):
        ah_ops.make_block_dims(20, [4, 4])


def test_variable_chunk_searcher_end_to_end(tmp_path):
    """builder.score_ah(variable_dims_per_block=...) -> searchable index
    with recall comparable to the fixed chunking, bit-identical
    serialization round trip, and mutation support."""
    db, q = make_data()
    # Bit-fair comparison: 7 variable blocks (28 bits/vector) vs fixed
    # dims_per_block=3, which also yields 7 blocks on d=20 (ragged
    # zero-padded tail block).
    widths = [3, 3, 3, 3, 3, 3, 2]  # = 20 dims
    docids = [str(i) for i in range(len(db))]
    s = (scann_tpu.builder(db, 10, "dot_product")
         .tree(num_leaves=16, num_leaves_to_search=16,
               training_sample_size=8000)
         .score_ah(3, anisotropic_quantization_threshold=0.2,
                   variable_dims_per_block=widths)
         .reorder(60).build(docids=docids))
    assert s.model.block_dims is not None
    truth = np.argsort(-(q @ db.T), axis=1)[:, :10]
    idx, _ = s.search_batched(q)
    hits = np.mean([len({int(x) for x in idx[i]} & set(truth[i])) / 10
                    for i in range(len(q))])
    s2 = (scann_tpu.builder(db, 10, "dot_product")
          .tree(num_leaves=16, num_leaves_to_search=16,
                training_sample_size=8000)
          .score_ah(3, anisotropic_quantization_threshold=0.2)
          .reorder(60).build())
    idx2, _ = s2.search_batched(q)
    hits_fixed = np.mean([len({int(x) for x in idx2[i]} & set(truth[i]))
                          / 10 for i in range(len(q))])
    assert hits >= hits_fixed - 0.05, (hits, hits_fixed)
    # serialize round trip
    s.serialize(str(tmp_path))
    s3 = scann_tpu.load_searcher(str(tmp_path))
    assert s3.model.block_dims is not None
    i1, d1 = s.search_batched(q)
    i3, d3 = s3.search_batched(q)
    assert i1 == i3
    np.testing.assert_array_equal(d1, d3)
    # mutation re-encodes through the variable-chunk model
    s.upsert("probe", q[0] * 2.0)
    i4, _ = s.search(q[0])
    assert "probe" in i4


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_variable_chunk_sharded():
    """from_searcher threads the block_dims table to the mesh, and the
    streaming build trains/encodes through it natively (VERDICT r4
    next-9)."""
    from jax.sharding import Mesh
    from scann_tpu.parallel import mesh as mesh_mod
    db, q = make_data(n=8000)
    widths = [4, 4, 2, 2, 2, 2, 2, 2]
    cfg_b = (scann_tpu.builder(db, 10, "dot_product")
             .tree(num_leaves=16, num_leaves_to_search=16,
                   training_sample_size=6000)
             .score_ah(2, variable_dims_per_block=widths)
             .reorder(50))
    s = cfg_b.build()
    m = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("data", "shard"))
    ss = mesh_mod.ShardedTreeAHSearcher.from_searcher(s, db, m)
    assert ss.model.block_dims is not None
    idx, _ = ss.search_batched(q)
    truth = np.argsort(-(q @ db.T), axis=1)[:, :10]
    r = np.mean([len(set(idx[i]) & set(truth[i])) / 10
                 for i in range(len(q))])
    # The mesh path must match the single-chip searcher's quality (the
    # absolute number is bound by the 32-bit code budget, not sharding).
    idx1, _ = s.search_batched(q)
    r1 = np.mean([len({int(x) for x in idx1[i]} & set(truth[i])) / 10
                  for i in range(len(q))])
    assert r >= r1 - 0.05, (r, r1)
    assert r >= 0.5, r
    # The streaming build trains the codebook and encodes through the
    # block_dims table natively (mesh.py build_sharded_streaming).
    ss2 = mesh_mod.build_sharded(db, cfg_b.create_config(), m)
    assert ss2.model.block_dims is not None
    assert ss2.model.block_dims.shape == s.model.block_dims.shape
    idx2s, _ = ss2.search_batched(q)
    r2 = np.mean([len(set(idx2s[i]) & set(truth[i])) / 10
                  for i in range(len(q))])
    assert r2 >= r1 - 0.08, (r2, r1)
