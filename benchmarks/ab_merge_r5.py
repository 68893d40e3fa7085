"""On-chip A/B of the merge strategy at the HEADLINE operating points.

The r5 microbench (merge_microbench_r5.json, 300k rows) measured the
stratified XLA merge 2.3x faster than the fused group-major Pallas merge
at every regime, but the headline bench (bench_r5_run3) ran with fused
merge ON.  This script loads the exact serialized headline index
(benchmarks/index_bench_r5) and slope-times the full compiled program at
the winning points with each merge strategy, plus recall with the new
default, so the headline can be re-stated on the same index.

Usage: python benchmarks/ab_merge_r5.py  (real chip)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import numpy as np

T0 = time.perf_counter()


def log(msg):
    print(f"[ab +{time.perf_counter() - T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def main():
    import bench
    import scann_tpu

    load_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "index_bench_r5")
    log("generating corpus")
    db, q = bench.make_glove_like(bench.N_DB, bench.N_QUERY, bench.DIM)
    log("corpus ready; loading index")
    searcher = scann_tpu.load_searcher(load_dir)
    log(f"index loaded ({searcher.part_cfg.num_leaves} leaves)")

    truth_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "bench_gt_r5.npz")
    if os.path.exists(truth_path):
        truth = np.load(truth_path)["truth"]
        log("ground truth loaded from cache")
    else:
        truth = bench.exact_ground_truth(db, q, bench.K)
        np.savez(truth_path, truth=truth)
        log("ground truth computed and cached")
    del db

    out = {"points": []}
    for fused in ("0", "1"):
        os.environ["SCANN_TPU_FUSED_MERGE"] = fused
        searcher._compiled = {}
        bench._STREAM_CHECKED = False
        for leaves in (64, 80, 100):
            # Same call order as bench.measure(): public search_batched
            # warmup + recall leg FIRST, then the stream slope.  Running
            # the slope first trips the tunnel's second-program dispatch
            # quirk (STATUS r3; seen here as a bogus layout ValueError).
            idx, _ = searcher.search_batched(
                q[:2048], leaves_to_search=leaves)  # warm
            idx, _ = searcher.search_batched(q, leaves_to_search=leaves)
            r = bench.recall_at_k(idx, truth)
            sustained, batch_ms = bench._sustained_qps(searcher, q, leaves)
            pt = {"fused": fused == "1", "leaves": leaves,
                  "recall": round(r, 4), "qps": round(sustained, 1),
                  "batch_ms": round(batch_ms, 2)}
            out["points"].append(pt)
            log(json.dumps(pt))
            path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "ab_merge_r5.json")
            with open(path, "w") as f:
                json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
