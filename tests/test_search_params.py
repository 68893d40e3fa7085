"""Per-query SearchParameters semantics (reference:
base/search_parameters.h:40-226 — per-query k, pre/post epsilon, crowding
caps applied pre-reordering)."""

import numpy as np
import pytest

import scann_tpu


def _data(n=20000, d=32, nq=12, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((16, d)).astype(np.float32)
    db = (centers[rng.integers(0, 16, n)]
          + 0.3 * rng.standard_normal((n, d)).astype(np.float32))
    q = rng.standard_normal((nq, d)).astype(np.float32)
    return db, q


def _build(db, measure="dot_product"):
    return (scann_tpu.builder(db, 10, measure)
            .tree(num_leaves=16, num_leaves_to_search=8,
                  training_sample_size=10000)
            .score_ah(2).reorder(60).build())


def test_per_query_final_k():
    db, q = _data()
    s = _build(db)
    ks = np.array([1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 2, 5], np.int32)
    idx, dist = s.search_batched(q, final_num_neighbors=ks)
    assert idx.shape[1] == 10
    for i, ki in enumerate(ks):
        assert (idx[i, :ki] >= 0).all()
        assert (idx[i, ki:] == -1).all()
        assert np.isnan(dist[i, ki:]).all()
    # scalar behavior unchanged
    idx2, _ = s.search_batched(q, final_num_neighbors=4)
    assert idx2.shape[1] == 4


def test_per_query_pre_reorder_k():
    db, q = _data()
    s = _build(db)
    # pre_reorder=1 per query means the single best AH candidate is the
    # only one rescored; compare against scalar calls row by row.
    pres = np.array([1, 60] * 6, np.int32)
    idx, _ = s.search_batched(q, pre_reorder_num_neighbors=pres)
    idx_1, _ = s.search_batched(q, pre_reorder_num_neighbors=1)
    idx_60, _ = s.search_batched(q, pre_reorder_num_neighbors=60)
    for i in range(len(q)):
        want = idx_1[i] if pres[i] == 1 else idx_60[i]
        assert (idx[i] == want).all(), i


def test_per_query_epsilons():
    db, q = _data()
    s = _build(db)
    idx0, dist0 = s.search_batched(q)
    # post-reordering epsilon per query: cut at each query's 3rd best dot
    eps = dist0[:, 2]
    idx, dist = s.search_batched(q, post_reordering_epsilon=eps)
    for i in range(len(q)):
        keep = idx[i] >= 0
        assert keep.sum() == 3, i
        assert (dist[i][keep] >= eps[i] - 1e-6).all()
    # pre-reordering epsilon: a very strict cutoff empties results; a
    # loose one is a no-op.
    idx_strict, _ = s.search_batched(q, pre_reordering_epsilon=1e9)
    assert (idx_strict == -1).all()
    idx_loose, _ = s.search_batched(q, pre_reordering_epsilon=-1e9)
    assert (idx_loose == idx0).all()


def test_pre_reordering_epsilon_l2():
    db, q = _data()
    s = _build(db, "squared_l2")
    idx0, dist0 = s.search_batched(q)
    idx_loose, _ = s.search_batched(q, pre_reordering_epsilon=1e9)
    assert (idx_loose == idx0).all()
    idx_strict, _ = s.search_batched(q, pre_reordering_epsilon=-1.0)
    assert (idx_strict == -1).all()


def test_pre_reordering_crowding():
    db, q = _data()
    s = _build(db)
    attrs = np.arange(len(db)) % 4
    s.set_crowding(attrs)
    idx, _ = s.search_batched(
        q, per_crowding_attribute_pre_reordering_num_neighbors=2)
    for row in idx:
        row = row[row >= 0]
        assert np.bincount(attrs[row], minlength=4).max() <= 2
    # The pre-reordering cap binds BEFORE rescore: with a cap of 1 the
    # survivors are at most 4 (one per attribute).
    idx1, _ = s.search_batched(
        q, per_crowding_attribute_pre_reordering_num_neighbors=1)
    for row in idx1:
        assert (row >= 0).sum() <= 4
