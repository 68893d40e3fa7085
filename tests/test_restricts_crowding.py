"""Restrict allowlists + crowding caps (reference: restricts/
restrict_allowlist.h, proto/crowding.proto, crowding top-N)."""

import numpy as np
import pytest

import scann_tpu


def make_data(n=2000, d=24, nq=8, seed=0):
    rng = np.random.default_rng(seed)
    db = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((nq, d)).astype(np.float32)
    return db, q


def build(db, kind="tree_ah"):
    b = scann_tpu.builder(db, 10, "dot_product")
    if kind == "tree_ah":
        b = (b.tree(num_leaves=16, num_leaves_to_search=16,
                    training_sample_size=2000)
             .score_ah(2).reorder(60))
    elif kind == "tree_bf":
        b = (b.tree(num_leaves=16, num_leaves_to_search=16,
                    training_sample_size=2000).score_brute_force())
    else:
        b = b.score_brute_force()
    return b.build()


@pytest.mark.parametrize("kind", ["tree_ah", "tree_bf", "bf"])
def test_restrict_allowlist(kind):
    db, q = make_data()
    s = build(db, kind)
    allow = np.zeros(len(db), bool)
    allow[:500] = True
    idx, dist = s.search_batched(q, restrict_allowlist=allow)
    valid = idx[idx >= 0]
    assert len(valid) > 0
    assert valid.max() < 500
    # Results must equal exact search over the allowed subset.
    truth = np.argsort(-(q @ db[:500].T), axis=1)[:, :10]
    r = np.mean([len(set(idx[i]) & set(truth[i])) / 10
                 for i in range(len(q))])
    assert r >= 0.9, (kind, r)


def test_restrict_rides_pruned_path():
    """Restricts thread through the pruned leaf-gather kernel (allowlist
    folded into the per-slot bias plane, the reference's in-kernel
    allowlist hook lut16_args.h:74-95) — no dense full-scan fallback."""
    rng = np.random.default_rng(1)
    centers = rng.standard_normal((32, 32)).astype(np.float32)
    db = (centers[rng.integers(0, 32, 30000)]
          + 0.3 * rng.standard_normal((30000, 32)).astype(np.float32))
    q = rng.standard_normal((16, 32)).astype(np.float32)
    s = (scann_tpu.builder(db, 10, "dot_product")
         .tree(num_leaves=32, num_leaves_to_search=8,
               training_sample_size=20000)
         .score_ah(2, anisotropic_quantization_threshold=0.2)
         .reorder(80).build())
    allow = np.zeros(len(db), bool)
    allow[::2] = True
    idx, _ = s.search_batched(q, restrict_allowlist=allow,
                              leaves_to_search=8)
    # The dense layouts were never materialized: the restrict query ran on
    # the pruned path.
    assert s.index.codes is None
    assert getattr(s, "_p_codes", None) is not None
    valid = idx[idx >= 0]
    assert len(valid) > 0 and np.all(valid % 2 == 0)
    # Recall parity vs exact search over the allowed subset, given the
    # same leaves: compare against the unrestricted searcher's behavior.
    sub = np.nonzero(allow)[0]
    truth = sub[np.argsort(-(q @ db[sub].T), axis=1)[:, :10]]
    r = np.mean([len(set(idx[i]) & set(truth[i])) / 10
                 for i in range(len(q))])
    assert r >= 0.85, r


def test_restrict_wrong_shape():
    db, q = make_data()
    s = build(db, "bf")
    with pytest.raises(ValueError):
        s.search_batched(q, restrict_allowlist=np.ones(7, bool))


def test_crowding():
    db, q = make_data()
    s = build(db, "tree_ah")
    attrs = np.arange(len(db)) % 5  # 5 attribute classes
    s.set_crowding(attrs)
    idx, dist = s.search_batched(q, per_crowding_attribute_num_neighbors=2)
    for row in idx:
        row = row[row >= 0]
        counts = np.bincount(attrs[row], minlength=5)
        assert counts.max() <= 2, counts
    # Without the cap, some attribute normally exceeds 2 among top-10.
    idx2, _ = s.search_batched(q)
    exceeded = any(
        np.bincount(attrs[row[row >= 0]], minlength=5).max() > 2
        for row in idx2)
    assert exceeded


def test_crowding_requires_attributes():
    db, q = make_data()
    s = build(db, "bf")
    with pytest.raises(ValueError):
        s.search_batched(q, per_crowding_attribute_num_neighbors=2)


def test_multi_dimensional_crowding():
    """Multi-dim crowding (reference utils/crowding_multi_dimensional.h):
    per-dimension quotas all enforced simultaneously."""
    import scann_tpu
    rng = np.random.default_rng(3)
    db = rng.standard_normal((4000, 16)).astype(np.float32)
    q = rng.standard_normal((10, 16)).astype(np.float32)
    s = scann_tpu.builder(db, 20, "dot_product").score_brute_force().build()
    attrs = np.stack([np.arange(4000) % 5, np.arange(4000) % 3],
                     axis=1).astype(np.int32)
    s.set_crowding(attrs)
    idx, dist = s.search_batched(
        q, per_crowding_attribute_num_neighbors=(3, 4))
    base_idx, _ = s.search_batched(q)
    for r, row in enumerate(idx):
        valid = row[row >= 0]
        a = attrs[valid]
        for v0 in np.unique(a[:, 0]):
            assert (a[:, 0] == v0).sum() <= 3
        for v1 in np.unique(a[:, 1]):
            assert (a[:, 1] == v1).sum() <= 4
        # survivors are the best-scored representatives
        assert valid[0] == base_idx[r][0]
    # scalar limit applies to every dimension
    idx2, _ = s.search_batched(q, per_crowding_attribute_num_neighbors=2)
    for row in idx2:
        valid = row[row >= 0]
        a = attrs[valid]
        for d_ in range(2):
            for v in np.unique(a[:, d_]):
                assert (a[:, d_] == v).sum() <= 2
    # mismatched limit count raises
    import pytest as _pytest
    with _pytest.raises(ValueError):
        s.search_batched(q, per_crowding_attribute_num_neighbors=(1, 2, 3))
