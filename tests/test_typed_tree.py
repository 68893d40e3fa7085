"""Typed (uint8/int8) datasets through the TREE paths (VERDICT r4 next-8).

Reference: TypedDataset<T> is generic (data_format/dataset.h:219) and
TreeXHybridSMMD is templated over T (tree_x_hybrid/tree_x_hybrid_smmd.h:51)
— a uint8 database builds a partitioned index without ever materializing
an (n, d) float32 copy.  Here: sampling/tokenize/split/encode cast per
chunk after their gathers; leaves store residual int8 (tree-SQ) or exact
bfloat16 rows (tree-BF; int8/uint8 values are exact in bf16).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import scann_tpu
from scann_tpu.utils import transfer


def make_typed(n=30000, d=32, nq=64, dtype=np.uint8, seed=5):
    rng = np.random.default_rng(seed)
    centers = rng.integers(30, 220, (32, d))
    lo, hi = (0, 256) if dtype == np.uint8 else (-128, 128)
    db = np.clip(centers[rng.integers(0, 32, n)]
                 + rng.integers(-25, 26, (n, d)), lo, hi - 1).astype(dtype)
    q = (centers[rng.integers(0, 32, nq)]
         + 3.0 * rng.standard_normal((nq, d))).astype(np.float32)
    return db, q


def _recall(idx, truth):
    return np.mean([len(set(idx[i]) & set(truth[i])) / truth.shape[1]
                    for i in range(len(truth))])


def _no_f32_uploads(monkeypatch, n, d):
    """Record every host->device upload; fail on an (n, d) float32 one."""
    uploads = []
    orig = transfer.to_device

    def spy(x, dtype=None, **kw):
        out = orig(x, dtype=dtype, **kw)
        uploads.append((tuple(np.shape(x)), str(out.dtype)))
        return out

    monkeypatch.setattr(transfer, "to_device", spy)
    return uploads


def test_typed_tree_sq_uint8(monkeypatch):
    db, q = make_typed()
    n, d = db.shape
    uploads = _no_f32_uploads(monkeypatch, n, d)
    s = (scann_tpu.builder(db, 10, "dot_product")
         .tree(num_leaves=32, num_leaves_to_search=8,
               training_sample_size=10000)
         .score_brute_force(quantize="int8").build())
    assert s._sq_mode
    # The residual-int8 leaves are the ONLY per-slot row storage.
    assert s.slot_rows.dtype == jnp.int8
    # No full-database float32 upload happened during the build.
    for shape, dt in uploads:
        assert not (shape[:1] == (n,) and dt == "float32"), (shape, dt)
    truth = np.argsort(-(q @ db.astype(np.float32).T), axis=1)[:, :10]
    idx, dist = s.search_batched(q, leaves_to_search=8)
    assert _recall(idx, truth) >= 0.9
    # Distances are the near-exact dot products of the typed rows.
    got = np.take_along_axis(q @ db.astype(np.float32).T,
                             np.maximum(idx, 0), axis=1)
    ok = idx >= 0
    np.testing.assert_allclose(dist[ok], got[ok],
                               atol=2e-2 * np.abs(got[ok]).max())


def test_typed_tree_bf_exact_bf16_int8():
    db, q = make_typed(dtype=np.int8)
    n, d = db.shape
    s = (scann_tpu.builder(db, 10, "dot_product")
         .tree(num_leaves=16, num_leaves_to_search=16,
               training_sample_size=8000)
         .score_brute_force().build())
    # Typed tree-BF leaves: bf16 holds int8 values exactly (2 B/dim).
    assert s.slot_rows.dtype == jnp.bfloat16
    truth = np.argsort(-(q @ db.astype(np.float32).T), axis=1)[:, :10]
    idx, dist = s.search_batched(q)  # all leaves scanned
    # The db rows are exact in bf16; the residual error is the QUERY-side
    # bf16 rounding, which only swaps near-ties (integer dbs tie often).
    assert _recall(idx, truth) >= 0.99
    got = np.take_along_axis(q @ db.astype(np.float32).T,
                             np.maximum(idx, 0), axis=1)
    ok = idx >= 0
    # bf16 rows are exact; the only error is the query-side bf16 matmul.
    np.testing.assert_allclose(dist[ok], got[ok], rtol=2e-2, atol=1.0)


def test_typed_tree_sq_l2():
    db, q = make_typed(dtype=np.uint8)
    s = (scann_tpu.builder(db, 10, "squared_l2")
         .tree(num_leaves=32, num_leaves_to_search=8,
               training_sample_size=10000)
         .score_brute_force(quantize="int8").build())
    dbf = db.astype(np.float32)
    d2 = ((q ** 2).sum(1)[:, None] - 2 * q @ dbf.T
          + (dbf ** 2).sum(1)[None, :])
    truth = np.argsort(d2, axis=1)[:, :10]
    idx, dist = s.search_batched(q, leaves_to_search=8)
    assert _recall(idx, truth) >= 0.9
    assert np.all(dist[idx >= 0] >= -1e-2)


def test_typed_tree_serialization_roundtrip(tmp_path):
    db, q = make_typed()
    s = (scann_tpu.builder(db, 10, "dot_product")
         .tree(num_leaves=32, num_leaves_to_search=8,
               training_sample_size=10000)
         .score_brute_force(quantize="int8").build())
    i0, d0 = s.search_batched(q, leaves_to_search=6)
    s.serialize(str(tmp_path / "typed_idx"))
    s2 = scann_tpu.load_searcher(str(tmp_path / "typed_idx"))
    i1, d1 = s2.search_batched(q, leaves_to_search=6)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(d0, d1, rtol=1e-6)
