"""Pruned exact-int8 Tree-X path (ops/pruned_sq.py).

Reference role: TreeXHybridSMMD + ScalarQuantizedBruteForceSearcher leaves
(tree_x_hybrid_smmd.h:51, tree_x_hybrid_factory.cc:416-520) — here with
residual per-row int8 leaves scored exactly on the selected leaves only.
"""

import numpy as np
import pytest

import scann_tpu
from scann_tpu.ops import pruned_scan


def _clustered(n=60000, d=48, nq=128, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((64, d)).astype(np.float32)
    db = (centers[rng.integers(0, 64, n)]
          + 0.25 * rng.standard_normal((n, d)).astype(np.float32))
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    q = (centers[rng.integers(0, 64, nq)]
         + 0.25 * rng.standard_normal((nq, d)).astype(np.float32))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return db.astype(np.float32), q.astype(np.float32)


def _build(db, num_leaves=64, measure="dot_product"):
    return (scann_tpu.builder(db, 10, measure)
            .tree(num_leaves=num_leaves, num_leaves_to_search=8,
                  training_sample_size=20000)
            .score_brute_force(quantize="int8").build())


def _recall(idx, truth):
    return np.mean([len(set(idx[i]) & set(truth[i])) / truth.shape[1]
                    for i in range(len(truth))])


def test_sq_mode_selected():
    db, q = _clustered(n=30000)
    s = _build(db, num_leaves=32)
    assert s._sq_mode and s._pruned_available
    # index memory: int8 rows + f32 scale only (no separate reorder copy)
    assert s.slot_rows.dtype == np.int8
    assert s.reorder_helper is None


def test_sq_pruned_recall_vs_exact():
    db, q = _clustered()
    s = _build(db)
    truth = np.argsort(-(q @ db.T), axis=1)[:, :10]
    idx, dist = s.search_batched(q, leaves_to_search=8)
    r = _recall(idx, truth)
    assert r >= 0.9, r
    # distances are the (near-exact) dot products of the returned rows
    got = np.take_along_axis(q @ db.T, np.maximum(idx, 0), axis=1)
    ok = idx >= 0
    np.testing.assert_allclose(dist[ok], got[ok], atol=2e-2)


def test_sq_pruned_matches_dense_fallback(monkeypatch):
    """The pruned kernel and the dense masked scan rank the same rows (both
    score the identical residual-int8 reconstruction) at the same leaf
    selection."""
    db, q = _clustered(n=30000)
    s = _build(db, num_leaves=32)
    idx_p, d_p = s.search_batched(q, leaves_to_search=6)
    # Route the same searcher through the dense fallback (a plan-budget
    # overflow does exactly this in production).
    monkeypatch.setattr(pruned_scan, "MAX_PLAN_WORK", 0)
    s._compiled = {}
    idx_d, d_d = s.search_batched(q, leaves_to_search=6)
    agree = np.mean([len(set(idx_p[i]) & set(idx_d[i])) / 10
                     for i in range(len(q))])
    assert agree >= 0.99, agree
    ok = (idx_p == idx_d) & (idx_p >= 0)
    np.testing.assert_allclose(d_p[ok], d_d[ok], rtol=1e-3, atol=1e-3)


def test_sq_pruned_interpret_parity():
    db, q = _clustered(n=30000)
    s = _build(db, num_leaves=32)
    idx_x, _ = s.search_batched(q, leaves_to_search=6)
    s._pruned_interpret = True
    s._compiled = {}
    idx_i, _ = s.search_batched(q, leaves_to_search=6)
    agree = np.mean([len(set(idx_x[i]) & set(idx_i[i])) / 10
                     for i in range(len(q))])
    assert agree >= 0.999, agree


def test_sq_pruned_l2():
    db, q = _clustered()
    s = _build(db, measure="squared_l2")
    assert s._sq_mode
    d2 = ((q ** 2).sum(1)[:, None] - 2 * q @ db.T
          + (db ** 2).sum(1)[None, :])
    truth = np.argsort(d2, axis=1)[:, :10]
    idx, dist = s.search_batched(q, leaves_to_search=8)
    r = _recall(idx, truth)
    assert r >= 0.9, r
    assert np.all(dist[idx >= 0] >= -1e-3)  # true squared distances


def test_sq_restrict_rides_pruned():
    db, q = _clustered(n=30000)
    s = _build(db, num_leaves=32)
    allow = np.zeros(len(db), bool)
    allow[::3] = True
    idx, _ = s.search_batched(q, leaves_to_search=6,
                              restrict_allowlist=allow)
    live = idx[idx >= 0]
    assert live.size and np.all(live % 3 == 0)


def test_sq_single_query():
    db, q = _clustered(n=30000)
    s = _build(db, num_leaves=32)
    i1, d1 = s.search(q[0], leaves_to_search=4)
    assert len(i1) == 10 and np.isfinite(d1[i1 >= 0]).all()


def test_sq_serialization_roundtrip(tmp_path):
    db, q = _clustered(n=30000)
    s = _build(db, num_leaves=32)
    idx0, d0 = s.search_batched(q, leaves_to_search=6)
    path = str(tmp_path / "sq_index")
    s.serialize(path)
    s2 = scann_tpu.load_searcher(path)
    assert s2._sq_mode
    idx1, d1 = s2.search_batched(q, leaves_to_search=6)
    np.testing.assert_array_equal(idx0, idx1)
    np.testing.assert_allclose(d0, d1, rtol=1e-6)


def test_sq_with_reorder_compose():
    """tree + int8 leaves + exact f32 reorder still composes (reference
    tree-SQ + exact_reordering)."""
    db, q = _clustered(n=30000)
    s = (scann_tpu.builder(db, 10, "dot_product")
         .tree(num_leaves=32, num_leaves_to_search=8,
               training_sample_size=10000)
         .score_brute_force(quantize="int8").reorder(40).build())
    truth = np.argsort(-(q @ db.T), axis=1)[:, :10]
    idx, dist = s.search_batched(q, leaves_to_search=8)
    r = _recall(idx, truth)
    assert r >= 0.9, r
    got = np.take_along_axis(q @ db.T, np.maximum(idx, 0), axis=1)
    ok = idx >= 0
    np.testing.assert_allclose(dist[ok], got[ok], rtol=1e-4)


def test_sq_kernel_oracle():
    """Kernel-level oracle: packed survivors reproduce the top residual
    scores of every (query, leaf) pair."""
    import jax.numpy as jnp
    from scann_tpu.ops import pruned_sq
    rng = np.random.default_rng(0)
    num_leaves, ntiles_per_leaf = 6, 1
    num_tiles = num_leaves * ntiles_per_leaf
    d = 16
    tile_start = jnp.asarray(
        np.arange(num_leaves, dtype=np.int32) * ntiles_per_leaf)
    ntiles = jnp.asarray(np.full(num_leaves, ntiles_per_leaf, np.int32))
    b, sel_l = 4, 3
    sel = np.stack([rng.choice(num_leaves, sel_l, replace=False)
                    for _ in range(b)]).astype(np.int32)
    valid = jnp.ones((b, sel_l), bool)
    plan = pruned_scan.invert_small(jnp.asarray(sel), valid, tile_start,
                                    ntiles, ntiles_per_leaf)
    rows = rng.integers(-127, 128,
                        (num_tiles, pruned_scan.TILE, d)).astype(np.int8)
    scale = rng.uniform(0.001, 0.01,
                        (num_tiles, pruned_scan.TILE)).astype(np.float32)
    bias = np.zeros((num_tiles, pruned_scan.TILE), np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    qg = jnp.asarray(q)[jnp.asarray(plan.qg_query)].astype(jnp.bfloat16)
    packed = pruned_sq.score_work_xla_sq(
        plan, qg, jnp.asarray(rows), jnp.asarray(scale),
        jnp.asarray(bias), measure_l2=False, kpg=2)
    vals, slots = pruned_scan.merge_candidates(
        plan, packed, jnp.asarray(sel), valid, tile_start, ntiles,
        ntiles_per_leaf, 8, hot=sel_l)
    vals, slots = np.asarray(vals), np.asarray(slots)
    # oracle: exact residual scores of the selected leaves
    q_bf = np.asarray(jnp.asarray(q).astype(jnp.bfloat16).astype(
        jnp.float32))
    all_scores = (rows.reshape(-1, d).astype(np.float32)
                  @ q_bf.T) * scale.reshape(-1)[:, None]
    for i in range(b):
        allowed = set()
        for lf in sel[i]:
            t0 = int(tile_start[lf])
            allowed.update(range(t0 * pruned_scan.TILE,
                                 (t0 + 1) * pruned_scan.TILE))
        want = sorted(allowed, key=lambda s_: -all_scores[s_, i])[:4]
        got = [s_ for s_ in slots[i] if s_ >= 0]
        # top-4 must be present (kpg=2 gives 32 survivors/tile)
        assert set(want) <= set(got), (i, want, got[:8])
