"""Compile-budget gate for shape-scaled Pallas kernels (VERDICT r4 next-5).

AOT-lowers and compiles the fused merge kernel (and the pruned scoring
kernel) at the MAXIMUM dispatch shapes bench.py can emit, WITHOUT running
them — catching compile-time SMEM/VMEM OOMs (the round-4 bench crash:
262,144 scalar-prefetched pair indices = 1.00 MB against v5e's ~1 MB SMEM)
before they reach the driver benchmark.

Run on a machine with a TPU attached (compiles are served even while the
chip is busy — the TpuAotCompiler path):

    python benchmarks/compile_gate.py

Exit code 0 = every shape compiles.  The r4 crash shape fails this gate on
the pre-fix code (unsegmented merge_candidates_fused) and passes on the
fixed code (SMEM-budgeted segmentation), closing the class: any future
kernel whose resource footprint scales with dispatch shape must be added
here.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scann_tpu.ops import pruned_scan as ps


def sds(shape, dtype):
    return jax.ShapeDtypeStruct(shape, dtype)


def gate_fused_merge(batch, leaves, num_leaves, mnt, kpg, tile, k_fetch):
    """AOT-compile merge_candidates_fused at a bench dispatch shape."""
    p = batch * leaves
    g_pad, w_pad = ps.plan_capacities(batch, leaves, num_leaves,
                                      num_leaves * mnt, mnt)
    gp = tile // ps.SUBP
    kgp = kpg * gp
    w = mnt * kgp
    plan = ps.WorkPlan(
        qg_query=sds((g_pad, ps.QG), jnp.int32),
        qg_leaf=sds((g_pad,), jnp.int32),
        work_tile=sds((w_pad,), jnp.int32),
        work_qg=sds((w_pad,), jnp.int32),
        work_active=sds((w_pad,), jnp.int32),
        pair_gid=sds((batch, leaves), jnp.int32),
        pair_row=sds((batch, leaves), jnp.int32),
    )
    fn = functools.partial(ps.merge_candidates_fused, max_ntiles=mnt,
                           k_fetch=k_fetch, tile=tile, use_pallas=True)
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(
        plan,
        sds((g_pad, ps.QG, w), jnp.int32),          # packed
        sds((batch, leaves), jnp.int32),             # sel
        sds((batch, leaves), jnp.bool_),             # valid_sel
        sds((num_leaves,), jnp.int32),               # tile_start
        sds((num_leaves,), jnp.int32),               # ntiles
        pair_bias=sds((batch, leaves), jnp.float32),
    )
    lowered.compile()
    print(f"  ok: fused merge B={batch} L={leaves} (P={p}, w={w}) "
          f"compiled in {time.perf_counter() - t0:.1f}s", flush=True)


def gate_score_kernel(batch, leaves, num_leaves, mnt, kpg, tile, d):
    """AOT-compile the pruned-SQ scoring kernel at a bench dispatch
    shape (its scalar prefetch is plan-work-sized, guarded by
    MAX_PLAN_WORK)."""
    from scann_tpu.ops import pruned_sq
    g_pad, w_pad = ps.plan_capacities(batch, leaves, num_leaves,
                                      num_leaves * mnt, mnt)
    if w_pad > ps.MAX_PLAN_WORK:
        print(f"  skip: score B={batch} L={leaves}: plan work {w_pad} > "
              f"MAX_PLAN_WORK (dense fallback in production)", flush=True)
        return
    num_tiles = num_leaves * mnt
    plan = ps.WorkPlan(
        qg_query=sds((g_pad, ps.QG), jnp.int32),
        qg_leaf=sds((g_pad,), jnp.int32),
        work_tile=sds((w_pad,), jnp.int32),
        work_qg=sds((w_pad,), jnp.int32),
        work_active=sds((w_pad,), jnp.int32),
        pair_gid=sds((batch, leaves), jnp.int32),
        pair_row=sds((batch, leaves), jnp.int32),
    )
    fn = functools.partial(pruned_sq.score_work_pallas_sq,
                           measure_l2=False, kpg=kpg)
    t0 = time.perf_counter()
    jax.jit(fn).lower(
        plan,
        sds((g_pad, ps.QG, d), jnp.bfloat16),        # qg_rows
        sds((num_tiles, tile, d), jnp.int8),          # rows
        sds((num_tiles, tile), jnp.float32),          # scale
        sds((num_tiles, tile), jnp.float32),          # bias
    ).compile()
    print(f"  ok: sq score B={batch} L={leaves} (work={w_pad}) "
          f"compiled in {time.perf_counter() - t0:.1f}s", flush=True)


def main():
    dev = jax.devices()[0]
    print(f"compile gate on {dev} ({dev.platform})", flush=True)
    # Bench-reachable maxima (models/base.py pruned_dispatch_cap):
    # batch 65536 at small leaves; the largest fused-merge pair count the
    # plan budget admits is ~1M (leaves=16); the r4 crash shape is 65536x4.
    # The bench index: tile=256 sq layout, ~2350 leaves, mnt<=16, kpg=4.
    num_leaves, mnt, kpg, tile, d = 2350, 8, 4, 256, 104
    shapes = [
        (65536, 4),    # the r4 BENCH crash shape
        (65536, 12),
        (65536, 16),   # max admitted fused-merge pair count (~1M)
    ]
    for b, l in shapes:
        gate_fused_merge(b, l, num_leaves, mnt, kpg, tile, k_fetch=10)
    for b, l in shapes:
        gate_score_kernel(b, l, num_leaves, mnt, kpg, tile, d)
    print("compile gate PASSED", flush=True)


if __name__ == "__main__":
    main()
