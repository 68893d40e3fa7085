"""Single-query latency breakdown (VERDICT r4 next-7: batch-1 slope was
1.31 ms in round 3 vs the reference's 0.77 ms on x86 — find where it
goes before optimizing).

Loads the serialized headline index (run bench.py once with
SCANN_TPU_BENCH_SAVE=benchmarks/index_bench) and slope-times nested
prefixes of the batch-1 program at the honest operating point:

  tokenize            leaf selection only (one (1,d)x(d,L) matmul + top-l)
  tokenize+plan       + invert_small work plan (analytic at B*L <= QG)
  candidates          + scoring kernel + merge (full _pruned_select)
  full                the public compiled program incl. final top-k

Differences between consecutive rows isolate each stage's marginal
cost.  All functions jitted at bucket=8 (the batch-1 dispatch shape).

Reference role: single-query TreeAHHybridResidual::FindNeighbors
(tree_ah_hybrid_residual.cc:600-700) — ~0.77 ms/query on the notebook's
32-core x86 (BASELINE.md).
"""

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
    print(f"[b1 +{time.perf_counter() - T0:6.1f}s] {msg}", file=sys.stderr,
          flush=True)


T0 = time.perf_counter()


def slope(fn, sync, reps_a=20, reps_b=100):
    out = fn()
    sync(out)

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


def main():
    import jax
    import jax.numpy as jnp
    import scann_tpu
    from scann_tpu.ops import pruned_scan

    load_dir = os.environ.get("SCANN_TPU_BENCH_LOAD",
                              os.path.join(os.path.dirname(
                                  os.path.abspath(__file__)),
                                  "index_bench"))
    leaves = int(os.environ.get("B1_LEAVES", "50"))
    s = scann_tpu.load_searcher(load_dir)
    log(f"index loaded ({type(s).__name__}, "
        f"{s.part_cfg.num_leaves} leaves); profiling at leaves={leaves}")

    rng = np.random.default_rng(5)
    d = s.dims
    q1 = rng.standard_normal((1, d)).astype(np.float32)
    q1 /= np.linalg.norm(q1, axis=1, keepdims=True)
    bucket = 8
    qb = jnp.asarray(np.pad(q1, ((0, bucket - 1), (0, 0))))

    k, k_pre, lv = s._resolve_params(None, None, leaves)
    s._prepare_for_query(bucket, lv, False, False, False)
    state = s._state()

    # full public program (what search_batched dispatches at batch 1)
    full_fn = s._get_compiled(bucket, k, k_pre, lv, 0, False)

    # candidates = tokenize + plan + kernel + merge
    cand_fn = jax.jit(functools.partial(
        s._pruned_select, k_pre=k_pre, leaves=lv))

    part = s.partitioner._replace(
        centers=state["tx_centers"],
        centers_int8=state["tx_centers_int8"],
        centers_inv_mult=state["tx_centers_inv_mult"],
        upper_centers=state["tx_upper_centers"],
        upper_assign=state["tx_upper_assign"])

    @jax.jit
    def tok_fn(qq):
        return part.tokenize_queries(qq, lv)

    @jax.jit
    def tok_plan_fn(qq):
        leaf_ids, _ = part.tokenize_queries(qq, lv)
        valid = jnp.ones((qq.shape[0], lv), bool)
        return pruned_scan.invert_small(
            leaf_ids, valid, state["tx_tile_start"], state["tx_ntiles"],
            s._p_max_ntiles)

    def sync_any(o):
        leaves_ = jax.tree_util.tree_leaves(o)
        _ = np.asarray(leaves_[0]).ravel()[:1]

    rows = []
    for name, fn in (
            ("tokenize", lambda: tok_fn(qb)),
            ("tokenize+plan", lambda: tok_plan_fn(qb)),
            ("candidates", lambda: cand_fn(qb, state)),
            ("full", lambda: full_fn(qb, state))):
        ms = slope(fn, sync_any) * 1000.0
        rows.append({"stage": name, "ms": round(ms, 4)})
        log(f"{name:16s} {ms:8.4f} ms")
    out = {"leaves": lv, "bucket": bucket, "stages": rows}
    # marginal costs
    for i in range(1, len(rows)):
        log(f"marginal {rows[i]['stage']:16s} "
            f"{rows[i]['ms'] - rows[i-1]['ms']:8.4f} ms")
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "batch1_profile.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
