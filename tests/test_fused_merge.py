"""Fused merge tests (ops/pruned_scan.py merge_candidates_fused).

The fused merge replaces the rank-stratified XLA gathers with one Pallas
kernel (DMA row gather + in-VMEM per-pair top-k); role analogue is the
reference's fused top-N push inside the LUT16 accumulation loop
(asymmetric_hashing2/lut16_avx2.inc:56-120 feeding FastTopNeighbors).
"""

import numpy as np
import jax
import jax.numpy as jnp

from scann_tpu.ops import pruned_scan as ps


def _layout_and_plan(seed=3, num_leaves=12, B=96, L=5, d=128):
    rng = np.random.default_rng(seed)
    sizes = rng.integers(100, 1200, num_leaves)
    leaf = np.repeat(np.arange(num_leaves), sizes).astype(np.int64)
    order, tile_start, ntiles, num_tiles = ps.build_layout_host(
        leaf, num_leaves, seed=0)
    rows_flat = np.zeros((num_tiles * ps.TILE, d), np.float32)
    live = order >= 0
    src_rows = rng.standard_normal((len(leaf), d)).astype(np.float32)
    rows_flat[live] = src_rows[order[live]]
    bias = np.where(live, 0.0, -1e30).astype(np.float32)
    rows3 = jnp.asarray(rows_flat.reshape(num_tiles, ps.TILE, d),
                        jnp.bfloat16)
    bias2 = jnp.asarray(bias.reshape(num_tiles, ps.TILE))
    q = rng.standard_normal((B, d)).astype(np.float32)
    sel = np.stack([rng.choice(num_leaves, L, replace=False)
                    for _ in range(B)]).astype(np.int32)
    valid = np.ones((B, L), bool)
    valid[::7, -1] = False  # some dead pairs
    mnt = int(ntiles.max())
    g_pad, w_pad = ps.plan_capacities(B, L, num_leaves, num_tiles, mnt)
    plan = ps.invert(jnp.asarray(sel), jnp.asarray(valid),
                     jnp.asarray(tile_start), jnp.asarray(ntiles), mnt,
                     g_pad, w_pad)
    qg_rows = jnp.take(jnp.asarray(q, jnp.bfloat16), plan.qg_query, axis=0)
    packed = ps.score_work_xla(plan, qg_rows, rows3, bias2,
                               measure_l2=False)
    pair_bias = jnp.asarray(
        rng.standard_normal((B, L)).astype(np.float32))
    return (plan, packed, sel, valid, tile_start, ntiles, mnt, pair_bias,
            rows_flat, bias, q)


def test_fused_pallas_interpret_matches_xla_bitwise():
    (plan, packed, sel, valid, tile_start, ntiles, mnt, pair_bias,
     _, _, _) = _layout_and_plan()
    args = (plan, packed, jnp.asarray(sel), jnp.asarray(valid),
            jnp.asarray(tile_start), jnp.asarray(ntiles), mnt, 10)
    v_x, s_x = ps.merge_candidates_fused(*args, pair_bias=pair_bias)
    v_p, s_p = ps.merge_candidates_fused(*args, pair_bias=pair_bias,
                                         interpret=True)
    assert np.array_equal(np.asarray(s_x), np.asarray(s_p))
    assert np.array_equal(np.asarray(v_x), np.asarray(v_p),
                          equal_nan=True)


def test_fused_matches_stratified_all_hot():
    """With every leaf in the hot stratum the stratified merge sees the
    full survivor lists, so the fused top-k must select the same slots
    (values may differ in the 4 extra stripped mantissa bits)."""
    (plan, packed, sel, valid, tile_start, ntiles, mnt, pair_bias,
     _, _, _) = _layout_and_plan()
    k = 10
    v_f, s_f = ps.merge_candidates_fused(
        plan, packed, jnp.asarray(sel), jnp.asarray(valid),
        jnp.asarray(tile_start), jnp.asarray(ntiles), mnt, k,
        pair_bias=pair_bias)
    v_s, s_s = ps.merge_candidates(
        plan, packed, jnp.asarray(sel), jnp.asarray(valid),
        jnp.asarray(tile_start), jnp.asarray(ntiles), mnt, k,
        pair_bias=pair_bias, hot=sel.shape[1])
    v_f, s_f = np.asarray(v_f), np.asarray(s_f)
    v_s, s_s = np.asarray(v_s), np.asarray(s_s)
    for b in range(s_f.shape[0]):
        got, want = set(s_f[b]) - {-1}, set(s_s[b]) - {-1}
        sym = got.symmetric_difference(want)
        # Near-equal scores may swap across the k boundary (the fused
        # path strips 4 more mantissa bits); anything else is a bug.
        assert len(sym) <= 1, (b, sym)
    assert np.allclose(np.where(np.isfinite(v_f), v_f, 0.0),
                       np.where(np.isfinite(v_s), v_s, 0.0),
                       atol=2e-3, rtol=2e-3)


def test_fused_oracle_slots_and_values():
    """Fused merge returns the true top-k of the kernel-surviving
    candidates, with slots indexing the tile-major layout correctly."""
    (plan, packed, sel, valid, tile_start, ntiles, mnt, pair_bias,
     rows_flat, bias, q) = _layout_and_plan(B=32, L=4)
    k = 10
    v_f, s_f = ps.merge_candidates_fused(
        plan, packed, jnp.asarray(sel), jnp.asarray(valid),
        jnp.asarray(tile_start), jnp.asarray(ntiles), mnt, k,
        pair_bias=pair_bias)
    v_f, s_f = np.asarray(v_f), np.asarray(s_f)
    scores_all = (np.asarray(jax.lax.dot_general(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(rows_flat, jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)) + bias[None, :])
    pb = np.asarray(pair_bias)
    for b in range(q.shape[0]):
        # Slot values must match the oracle score + that leaf's bias.
        for j in range(k):
            s_ = s_f[b, j]
            if s_ < 0:
                continue
            tile_of = s_ // ps.TILE
            lf_pos = np.searchsorted(tile_start, tile_of, side="right") - 1
            col = list(sel[b]).index(lf_pos)
            want = scores_all[b, s_] + pb[b, col]
            assert abs(v_f[b, j] - want) <= max(2e-3, 2e-3 * abs(want)), (
                b, j, v_f[b, j], want)
        # Monotone non-increasing values.
        fin = v_f[b][np.isfinite(v_f[b])]
        assert np.all(np.diff(fin) <= 1e-6)


def test_fused_invalid_pairs_produce_no_candidates():
    (plan, packed, sel, valid, tile_start, ntiles, mnt, pair_bias,
     rows_flat, bias, q) = _layout_and_plan(B=16, L=3)
    valid = np.zeros_like(valid)  # everything dead
    plan = ps.invert(jnp.asarray(sel), jnp.asarray(valid),
                     jnp.asarray(tile_start), jnp.asarray(ntiles), mnt,
                     plan.qg_query.shape[0], plan.work_tile.shape[0])
    v_f, s_f = ps.merge_candidates_fused(
        plan, packed, jnp.asarray(sel), jnp.asarray(valid),
        jnp.asarray(tile_start), jnp.asarray(ntiles), mnt, 10)
    assert np.all(np.asarray(s_f) == -1)
    assert np.all(np.isneginf(np.asarray(v_f)))
