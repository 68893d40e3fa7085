"""BASELINE config 5 validation at FULL scale: 100M-vector deep-96 index,
streaming sharded build on an 8-device mesh (v5e-16 stand-in; the driver
environment exposes one real chip, so the mesh is the virtual CPU mesh —
the same sharded programs the dryrun compiles).

The database is a deterministic synthetic deep-96 stand-in (topic mixture,
L2-normalized like the DEEP descriptor corpus) generated chunk-by-chunk so
the f32 rows are NEVER resident: `build_sharded_streaming` sees each chunk
once per pass (sample pass + encode pass).  Exact ground truth is streamed
the same way.

Usage:
  python benchmarks/sharded_100m.py [--chunks 800] [--leaves 4096]

Defaults = 800 x 125k = 100M rows.  Results land in
benchmarks/sharded_100m_result.json.

Reference role: ScaNN has no multi-machine index (SURVEY.md §2.10); this
axis is the new TPU-native leaf-sharded design (parallel/mesh.py).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402

# The environment may register a remote-TPU PJRT plugin ("axon") that wins
# platform selection even under JAX_PLATFORMS=cpu (see tests/conftest.py);
# this benchmark is a CPU-mesh validation, so drop the factory before any
# backend initializes.
import jax  # noqa: E402
from jax._src import xla_bridge  # noqa: E402

jax.config.update("jax_platforms", "cpu")
xla_bridge._backend_factories.pop("axon", None)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=800)
    ap.add_argument("--chunk-rows", type=int, default=125_000)
    ap.add_argument("--dim", type=int, default=96)
    ap.add_argument("--leaves", type=int, default=4096)
    ap.add_argument("--leaves-to-search", type=str, default="192",
                    help="comma-separated sweep; GT is computed once")
    ap.add_argument("--nq", type=int, default=64)
    ap.add_argument("--sample", type=int, default=200_000)
    ap.add_argument("--noise", type=float, default=0.05)
    args = ap.parse_args()
    l2s_list = [int(v) for v in str(args.leaves_to_search).split(",")]

    import jax
    from jax.sharding import Mesh
    import scann_tpu
    from scann_tpu.parallel import mesh as mesh_mod

    devs = jax.devices()[:8]
    mesh = Mesh(np.array(devs).reshape(2, 4), ("data", "shard"))

    d = args.dim
    n = args.chunks * args.chunk_rows
    # ~12 rows/topic, per-dim noise 0.05 (noise-vector norm ~0.5 vs the
    # unit topic): the true top-10 is dominated by the query's topic with
    # real inter-topic margins.  At 100M rows the extreme-value tail of
    # cross-topic similarities reaches ~6.1/sqrt(d) ~= 0.62, so the
    # same-topic similarity (1/(1+noise_norm^2) ~= 0.81) must clear it or
    # the "ground truth" is unstructured noise no partitioned index can
    # retrieve (bench.py's glove-like generator makes the same choice).
    n_topics = max(n // 12, 1000)
    rng = np.random.default_rng(7)
    # Topic centers materialize in blocks to bound memory (100M/12 topics
    # x 96 d x 4 B = 3.2 GB is fine, but stay general).
    topics = rng.standard_normal((n_topics, d)).astype(np.float32)
    topics /= np.linalg.norm(topics, axis=1, keepdims=True)

    def make_chunk(ci):
        r = np.random.default_rng(100 + ci)
        x = (topics[r.integers(0, n_topics, args.chunk_rows)]
             + args.noise * r.standard_normal(
                 (args.chunk_rows, d)).astype(np.float32))
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        return x

    def chunks():
        for ci in range(args.chunks):
            yield make_chunk(ci)
            if ci % 50 == 49:
                print(f"  [chunk {ci + 1}/{args.chunks}]", file=sys.stderr,
                      flush=True)

    # The flagship sharded format: exact residual-int8 leaves (sq).
    config = (scann_tpu.builder(np.zeros((1, d), np.float32), 10,
                                "dot_product")
              .tree(num_leaves=args.leaves,
                    num_leaves_to_search=l2s_list[0],
                    training_sample_size=args.sample, random_init=False)
              .score_brute_force(quantize="int8")
              .create_config())

    t0 = time.perf_counter()
    ss = mesh_mod.build_sharded_streaming(chunks, config, mesh)
    build_s = time.perf_counter() - t0
    slots = int((np.asarray(ss._host_parts["slot_dpid"]) >= 0).sum())
    assert slots == n, (slots, n)
    print(f"build: {build_s:.1f}s for {n} rows "
          f"({n / build_s / 1e6:.2f}M rows/s)", file=sys.stderr, flush=True)

    # Topic-aligned queries (the retrieval workload).
    nq = args.nq
    q = (topics[rng.integers(0, n_topics, nq)]
         + args.noise * rng.standard_normal((nq, d)).astype(np.float32))
    q = (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32)

    t0 = time.perf_counter()
    idx, dist = ss.search_batched(q)
    search_s = time.perf_counter() - t0

    # Exact ground truth streamed chunk-by-chunk (never resident).
    t0 = time.perf_counter()
    best_v = np.full((nq, 10), -np.inf, np.float32)
    best_i = np.full((nq, 10), -1, np.int64)
    for ci in range(args.chunks):
        x = make_chunk(ci)
        sims = q @ x.T
        v = np.concatenate([best_v, sims], axis=1)
        i = np.concatenate(
            [best_i, np.tile(
                np.arange(args.chunk_rows, dtype=np.int64)
                + ci * args.chunk_rows, (nq, 1))], axis=1)
        top = np.argsort(-v, axis=1)[:, :10]
        best_v = np.take_along_axis(v, top, axis=1)
        best_i = np.take_along_axis(i, top, axis=1)
    gt_s = time.perf_counter() - t0
    def recall_of(idx_):
        return float(np.mean(
            [len(set(idx_[i]) & set(best_i[i])) / 10 for i in range(nq)]))

    points = [{"leaves_to_search": l2s_list[0],
               "search_batch_s": round(search_s, 3),
               "recall_at_10": round(recall_of(idx), 4)}]
    for l2s in l2s_list[1:]:
        t0 = time.perf_counter()
        idx_l, _ = ss.search_batched(q, leaves_to_search=l2s)
        points.append({"leaves_to_search": l2s,
                       "search_batch_s": round(time.perf_counter() - t0, 3),
                       "recall_at_10": round(recall_of(idx_l), 4)})
        print(f"  l2s={l2s}: recall {points[-1]['recall_at_10']}",
              file=sys.stderr, flush=True)
    best = max(points, key=lambda p: p["recall_at_10"])
    result = {
        "rows": n, "dim": d, "num_leaves": args.leaves,
        "leaf_format": ss.leaf_format,
        "build_s": round(build_s, 1),
        "gt_stream_s": round(gt_s, 1),
        "points": points,
        "best_recall_at_10": best["recall_at_10"],
        "mesh": {"data": 2, "shard": 4},
        "nq": nq,
    }
    print(json.dumps(result))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"sharded_{n // 1_000_000}m_result.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    assert best["recall_at_10"] >= 0.95, result


if __name__ == "__main__":
    main()
