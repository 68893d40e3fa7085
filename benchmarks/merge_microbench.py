"""Merge/invert overhead microbenchmark (VERDICT r3 next-3).

At realistic (glove-hard) operating points the rank-stratified merge
gather rivals the scoring kernel (round-3 stage profile: merge 17.2 ms
vs kernel 25 ms at leaves=4/8192q, gathers at ~3 GB/s).  This script
measures, on the real chip:

  1. the per-stage breakdown of the pruned tree-SQ batch at the honest
     operating points (tokenize+plan / kernel / merge / total), and
  2. a shootout of gather strategies for the merge's per-(query, leaf)
     slice fetch on realistically-shaped data: XLA advanced indexing
     (today's merge), flat element-gather, and a Pallas row-gather
     kernel that DMAs rows from HBM with scalar-prefetched indices.

Usage:  python benchmarks/merge_microbench.py [--n 300000] [--leaves 8,50,100]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import numpy as np


def log(msg):
    print(f"[mb +{time.perf_counter() - T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


T0 = time.perf_counter()


def slope(fn, sync, reps_a=3, reps_b=10):
    """Steady-state seconds per call (enqueue N, sync once, difference)."""
    out = fn()
    sync(out)  # warm

    def run(reps):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        sync(out)
        return time.perf_counter() - t0

    t_a, t_b = run(reps_a), run(reps_b)
    if t_b <= t_a:
        return t_b / reps_b
    return (t_b - t_a) / (reps_b - reps_a)


# --------------------------------------------------------------- gathers
def gather_rows_pallas(src2, flat_idx, rows_per_step=16):
    """(M,) row gather from src2 (N, W) int32 via per-step async DMA with
    scalar-prefetched indices — the candidate replacement for the merge's
    XLA slice gather."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = flat_idx.shape[0]
    w = src2.shape[1]
    r = rows_per_step
    grid = m // r

    def kernel(idx_ref, src_ref, out_ref, sems):
        s = pl.program_id(0)
        for j in range(r):
            pltpu.make_async_copy(
                src_ref.at[idx_ref[s * r + j]],
                out_ref.at[j], sems.at[j]).start()
        for j in range(r):
            pltpu.make_async_copy(
                src_ref.at[idx_ref[s * r + j]],
                out_ref.at[j], sems.at[j]).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((r, w), lambda s, idx: (s, 0)),
        scratch_shapes=[pltpu.SemaphoreType.DMA((r,))],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, w), src2.dtype),
    )(flat_idx, src2)


def bench_gathers(g_pad=6500, qg=128, w=64, b=32768, l=8, seed=0):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    packed = jnp.asarray(
        rng.integers(0, 1 << 30, (g_pad, qg, w), dtype=np.int64)
        .astype(np.int32))
    gid = jnp.asarray(rng.integers(0, g_pad, (b, l)).astype(np.int32))
    row = jnp.asarray(rng.integers(0, qg, (b, l)).astype(np.int32))
    flat = (gid * qg + row).reshape(-1)
    packed2 = packed.reshape(g_pad * qg, w)
    bytes_out = b * l * w * 4

    def sync(x):
        np.asarray(jax.tree.leaves(x)[0].ravel()[0])

    strategies = {}

    adv = jax.jit(lambda p, g, r: p[g, r])
    strategies["xla_advanced_index"] = lambda: adv(packed, gid, row)

    take = jax.jit(lambda p2, f: jnp.take(p2, f, axis=0))
    strategies["xla_take_rows"] = lambda: take(packed2, flat)

    elem_idx = (flat[:, None] * w
                + jnp.arange(w, dtype=jnp.int32)[None, :]).reshape(-1)
    flat1 = packed.reshape(-1)
    elem = jax.jit(lambda p1, e: jnp.take(p1, e, axis=0).reshape(-1, w))
    strategies["xla_take_elements"] = lambda: elem(flat1, elem_idx)

    if jax.default_backend() == "tpu":
        for r in (8, 16, 32):
            fn = jax.jit(functools.partial(gather_rows_pallas,
                                           rows_per_step=r))
            strategies[f"pallas_dma_r{r}"] = (
                lambda fn=fn: fn(packed2, flat))

    results = {}
    ref = None
    for name, fn in strategies.items():
        try:
            out = np.asarray(fn())
            if ref is None:
                ref = out
            else:
                assert np.array_equal(out.reshape(ref.shape), ref), name
            s = slope(fn, sync)
            results[name] = {"ms": round(s * 1e3, 3),
                             "gbps": round(bytes_out / s / 1e9, 2)}
            log(f"  {name}: {results[name]['ms']} ms "
                f"({results[name]['gbps']} GB/s)")
        except Exception as e:  # noqa: BLE001 - report and continue
            results[name] = {"error": f"{type(e).__name__}: {e}"}
            log(f"  {name}: FAILED {type(e).__name__}: {e}")
    return results


# ---------------------------------------------------------- stage profile
def stage_profile(n, d, leaves_list, batch):
    import jax
    import jax.numpy as jnp
    import scann_tpu
    from scann_tpu.ops import pruned_scan, pruned_sq

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import bench as bench_mod  # the calibrated corpus

    db, q = bench_mod.make_glove_like(n, batch, d, seed=0)
    nl = max(n // 592, 32)
    t0 = time.perf_counter()
    s = (scann_tpu.builder(db, 10, "dot_product")
         .tree(num_leaves=nl, num_leaves_to_search=max(leaves_list),
               training_sample_size=min(n, 250_000))
         .score_brute_force(quantize="int8").build())
    log(f"index built in {time.perf_counter() - t0:.1f}s ({nl} leaves)")

    out = {}
    for leaves in leaves_list:
        from scann_tpu.models.base import pruned_dispatch_cap
        bsz = min(batch, pruned_dispatch_cap(leaves))
        s._prepare_for_query(bsz, leaves, False, False, False)
        state = s._state()
        qd = jnp.asarray(q[:bsz])
        num_leaves = s.partitioner.num_leaves
        part = s.partitioner
        g_pad, w_pad = pruned_scan.plan_capacities(
            bsz, leaves, num_leaves, s._p_num_tiles, s._p_max_ntiles)

        @jax.jit
        def tok_plan(qd, state):
            leaf_ids, c_sims = part._replace(
                centers=state["tx_centers"],
                centers_int8=state["tx_centers_int8"],
                centers_inv_mult=state["tx_centers_inv_mult"],
                upper_centers=state["tx_upper_centers"],
                upper_assign=state["tx_upper_assign"]).tokenize_queries(
                    qd, leaves)
            valid = jnp.ones(leaf_ids.shape, bool)
            plan = pruned_scan.invert(
                leaf_ids, valid, state["tx_tile_start"],
                state["tx_ntiles"], s._p_max_ntiles, g_pad, w_pad)
            qg_rows = jnp.take(
                jnp.pad(qd, ((0, 0), (0, state["tx_rows"].shape[-1]
                                      - qd.shape[1]))).astype(jnp.bfloat16),
                plan.qg_query, axis=0)
            c_sel = jnp.take(state["tx_centers"], leaf_ids, axis=0)
            pair_bias = jnp.einsum("nd,nld->nl", qd, c_sel)
            return leaf_ids, valid, plan, qg_rows, pair_bias

        leaf_ids, valid, plan, qg_rows, pair_bias = tok_plan(qd, state)

        @jax.jit
        def kern(plan, qg_rows, state):
            return pruned_sq.score_work_pallas_sq(
                plan, qg_rows, state["tx_rows"], state["tx_scale"],
                state["tx_bias2"], measure_l2=False, kpg=4)

        packed = kern(plan, qg_rows, state)

        @jax.jit
        def merge(plan, packed, leaf_ids, valid, pair_bias, state):
            return pruned_scan.merge_candidates(
                plan, packed, leaf_ids, valid, state["tx_tile_start"],
                state["tx_ntiles"], s._p_max_ntiles, 10,
                pair_bias=pair_bias, tile=state["tx_rows"].shape[1])

        def sync(x):
            np.asarray(jax.tree.leaves(x)[0].ravel()[0])

        @jax.jit
        def merge_fused(plan, packed, leaf_ids, valid, pair_bias, state):
            return pruned_scan.merge_candidates_fused(
                plan, packed, leaf_ids, valid, state["tx_tile_start"],
                state["tx_ntiles"], s._p_max_ntiles, 10,
                pair_bias=pair_bias, tile=state["tx_rows"].shape[1],
                use_pallas=jax.default_backend() == "tpu")

        res = {
            "batch": bsz,
            "tokenize_plan_ms": round(slope(
                lambda: tok_plan(qd, state), sync) * 1e3, 2),
            "kernel_ms": round(slope(
                lambda: kern(plan, qg_rows, state), sync) * 1e3, 2),
            "merge_ms": round(slope(
                lambda: merge(plan, packed, leaf_ids, valid, pair_bias,
                              state), sync) * 1e3, 2),
            "merge_fused_ms": round(slope(
                lambda: merge_fused(plan, packed, leaf_ids, valid,
                                    pair_bias, state), sync) * 1e3, 2),
        }
        full = jax.jit(functools.partial(
            s._search_impl, k=10, k_pre=10, leaves=leaves))
        res["full_ms"] = round(slope(lambda: full(qd, state), sync) * 1e3,
                               2)
        out[leaves] = res
        log(f"leaves={leaves}: {res}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=300_000)
    ap.add_argument("--d", type=int, default=100)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--leaves", type=str, default="8,24,50")
    ap.add_argument("--skip-stages", action="store_true")
    args = ap.parse_args()
    import jax
    log(f"backend: {jax.default_backend()}")
    results = {"gathers": bench_gathers()}
    if not args.skip_stages:
        results["stages"] = stage_profile(
            args.n, args.d, [int(x) for x in args.leaves.split(",")],
            args.batch)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
