"""Fused scan + group-max Pallas kernel tests (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scann_tpu.ops import fused_scan


def test_fused_scan_dot():
    rng = np.random.default_rng(0)
    S, D, Q = 2 * fused_scan.BS, 128, fused_scan.QT
    rows = rng.standard_normal((S, D)).astype(np.float32)
    qs = rng.standard_normal((Q, D)).astype(np.float32)
    bias = fused_scan.build_bias(np.ones(S, bool))
    vals, idx = fused_scan.fused_scan_groupmax(
        jnp.asarray(qs, jnp.bfloat16), jnp.asarray(rows, jnp.bfloat16),
        jnp.asarray(bias), interpret=True)
    vals, idx = np.asarray(vals), np.asarray(idx)
    assert vals.shape == (Q, S // fused_scan.SUB)
    # Oracle: per SUB group, numpy's max of the bf16 scores.
    scores = (qs.astype(jnp.bfloat16) @ rows.astype(jnp.bfloat16).T
              ).astype(np.float32)
    grouped = scores.reshape(Q, -1, fused_scan.SUB)
    np.testing.assert_allclose(vals, grouped.max(-1), rtol=1e-6)
    want_idx = (grouped.argmax(-1)
                + np.arange(grouped.shape[1])[None, :] * fused_scan.SUB)
    np.testing.assert_array_equal(idx, want_idx)


def test_fused_scan_l2_and_padding():
    rng = np.random.default_rng(1)
    S_real, D_real, Q = 3000, 100, fused_scan.QT
    rows = rng.standard_normal((S_real, D_real)).astype(np.float32)
    qs = rng.standard_normal((Q, D_real)).astype(np.float32)
    rows_p, s_pad = fused_scan.pad_for_kernel(rows)
    qs_p = np.zeros((Q, rows_p.shape[1]), np.float32)
    qs_p[:, :D_real] = qs
    valid = np.zeros(s_pad, bool)
    valid[:S_real] = True
    sq = np.zeros(s_pad, np.float32)
    sq[:S_real] = (rows * rows).sum(1)
    bias = fused_scan.build_bias(valid, sq)
    vals, idx = fused_scan.fused_scan_groupmax(
        jnp.asarray(qs_p, jnp.bfloat16), jnp.asarray(rows_p, jnp.bfloat16),
        jnp.asarray(bias), measure_l2=True, interpret=True)
    vals, idx = np.asarray(vals), np.asarray(idx)
    # No padding slot may be selected with a non-penalty score.
    real = vals > -1e20
    assert np.all(idx[real] < S_real)
    # Oracle: the kernel must return exactly the per-group argmax of the
    # bf16 L2 similarities.  (Global recall depends on S/SUB >> k — the
    # collision math in the module docstring — so it is validated at
    # realistic scale by the searcher integration tests, not here.)
    dots = (qs_p.astype(jnp.bfloat16) @ rows_p.astype(jnp.bfloat16).T
            ).astype(np.float32)
    sim = 2.0 * dots + bias[None, :]
    grouped = sim.reshape(Q, -1, fused_scan.SUB)
    np.testing.assert_allclose(vals, grouped.max(-1), rtol=1e-5, atol=1e-4)
    # Top-1 per group matches the true (exact-f32) nearest in that group
    # almost always; and the best overall candidate is the true nearest.
    d2 = ((qs[:, None, :] - rows[None, :, :]) ** 2).sum(-1)
    truth1 = d2.argmin(1)
    best = np.take_along_axis(idx, (-vals).argsort(1)[:, :1], axis=1)[:, 0]
    agree = np.mean(best == truth1)
    assert agree >= 0.95, agree


def test_fused_path_in_searcher():
    """End-to-end: tree-AH with reconstruct mode + full scan through the
    fused kernel (interpret mode) matches the XLA path's quality."""
    import dataclasses
    import scann_tpu
    import scann_tpu.factory as factory
    from scann_tpu.ops import fused_scan

    rng = np.random.default_rng(0)
    centers = rng.standard_normal((30, 32)).astype(np.float32)
    n = 80_000  # enough groups (n/SUB >= 4*k_pre) to engage the kernel
    db = (centers[rng.integers(0, 30, n)]
          + 0.3 * rng.standard_normal((n, 32)).astype(np.float32))
    q = rng.standard_normal((fused_scan.QT, 32)).astype(np.float32)

    b = (scann_tpu.builder(db, 10, "dot_product")
         .tree(num_leaves=16, num_leaves_to_search=16,
               training_sample_size=8000)
         .score_ah(2, anisotropic_quantization_threshold=0.2)
         .reorder(60))
    config = b.create_config()
    config = dataclasses.replace(config, asymmetric_hash=dataclasses.replace(
        config.asymmetric_hash, lookup_type="reconstruct"))
    s = factory.create_searcher(db, config)
    s._fused_interpret = True  # engage the Pallas kernel on CPU

    idx, dist = s.search_batched(q)
    truth = np.argsort(-(q @ db.T), axis=1)[:, :10]
    r = np.mean([len(set(idx[i]) & set(truth[i])) / 10
                 for i in range(len(q))])

    # The real contract: parity with the XLA recon path (absolute recall
    # here is capped by AH quantization on this dense near-tie data, for
    # the fused and non-fused paths alike).
    s._fused_interpret = False
    s._compiled = {}
    idx2, _ = s.search_batched(q)
    r2 = np.mean([len(set(idx2[i]) & set(truth[i])) / 10
                  for i in range(len(q))])
    assert r >= r2 - 0.03, (r, r2)
    assert r >= 0.5, r


def test_fused_gates_off_under_restrict():
    """restrict_allowlist must fall back to the masked XLA path (the fused
    kernel's group-max cannot apply per-query masks post-hoc)."""
    import dataclasses
    import scann_tpu
    import scann_tpu.factory as factory
    from scann_tpu.ops import fused_scan

    rng = np.random.default_rng(1)
    db = rng.standard_normal((80_000, 32)).astype(np.float32)
    q = rng.standard_normal((fused_scan.QT, 32)).astype(np.float32)
    b = (scann_tpu.builder(db, 10, "dot_product")
         .tree(num_leaves=16, num_leaves_to_search=16,
               training_sample_size=8000)
         .score_ah(2).reorder(60))
    config = b.create_config()
    config = dataclasses.replace(config, asymmetric_hash=dataclasses.replace(
        config.asymmetric_hash, lookup_type="reconstruct"))
    s = factory.create_searcher(db, config)
    s._fused_interpret = True
    allow = np.zeros(len(db), bool)
    allow[:1000] = True
    idx, _ = s.search_batched(q[:8], restrict_allowlist=allow)
    valid = idx[idx >= 0]
    assert len(valid) and valid.max() < 1000
