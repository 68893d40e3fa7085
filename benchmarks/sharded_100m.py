"""BASELINE config 5 validation at FULL scale: 100M-vector deep-96 index,
streaming sharded build, served from an 8-device mesh (v5e-16 stand-in;
the driver environment exposes one real chip, so the serving mesh is the
virtual CPU mesh — the same sharded programs the dryrun compiles).

Round-4 configuration applies the round-3 scaling lessons (STATUS.md):
constant leaf SIZE (10240 leaves at 100M = the 10M-proven 1024/10M
density), SOAR lambda=1.5 dual assignment (leaf-boundary spill is exactly
what lost recall at 20M), a 400k training sample, and a leaves_to_search
sweep in one run.

The streaming COMPUTE passes (k-means, tokenize+SOAR+encode) run on the
one real TPU chip when available (`--build-device tpu`, the default):
`build_sharded_streaming(compute_device=...)` — the production "build on
a big chip, serve on a mesh" shape.  The emitted index is structurally
identical to the pure-mesh build; searches are validated on the 8-device
mesh.  `--build-device cpu` reproduces the round-3 pure-mesh build.

The database is a deterministic synthetic deep-96 stand-in (topic mixture,
L2-normalized like the DEEP descriptor corpus) generated chunk-by-chunk so
the f32 rows are NEVER resident.  Exact ground truth is streamed the same
way on the compute device.

Usage:
  python benchmarks/sharded_100m.py [--chunks 400] [--leaves 10240]

Defaults = 400 x 250k = 100M rows.  Results land in
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

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402


def log(msg):
    print(f"[100m +{time.perf_counter() - T0:8.1f}s] {msg}",
          file=sys.stderr, flush=True)


T0 = time.perf_counter()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=400)
    ap.add_argument("--chunk-rows", type=int, default=250_000)
    ap.add_argument("--dim", type=int, default=96)
    ap.add_argument("--leaves", type=int, default=10240)
    ap.add_argument("--leaves-to-search", type=str, default="192,320,480,768",
                    help="comma-separated sweep; GT is computed once")
    ap.add_argument("--nq", type=int, default=128)
    ap.add_argument("--sample", type=int, default=400_000)
    ap.add_argument("--noise", type=float, default=0.05)
    ap.add_argument("--soar", type=float, default=1.5,
                    help="SOAR lambda; 0 disables dual assignment")
    ap.add_argument("--build-device", choices=("tpu", "cpu"), default="tpu")
    args = ap.parse_args()
    l2s_list = [int(v) for v in str(args.leaves_to_search).split(",")]

    if args.build_device == "cpu":
        # Pure-mesh build: drop the remote-TPU PJRT plugin ("axon") before
        # any backend initializes (see tests/conftest.py).
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        import jax
        from jax._src import xla_bridge
        jax.config.update("jax_platforms", "cpu")
        xla_bridge._backend_factories.pop("axon", None)
        compute_device = None
    else:
        import jax
        try:
            compute_device = jax.devices()[0]
            if compute_device.platform == "cpu":
                compute_device = None
        except Exception as e:  # no TPU reachable: fall back to pure mesh
            print(f"TPU unavailable ({e}); falling back to pure-mesh build",
                  file=sys.stderr)
            compute_device = None
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    import scann_tpu
    from scann_tpu.parallel import mesh as mesh_mod

    cpu_devs = jax.devices("cpu")[:8]
    mesh = Mesh(np.array(cpu_devs).reshape(2, 4), ("data", "shard"))
    log(f"serving mesh: 8 cpu devices; compute device: {compute_device}")

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
    topics = rng.standard_normal((n_topics, d)).astype(np.float32)
    topics /= np.linalg.norm(topics, axis=1, keepdims=True)
    log(f"{n_topics} topic centers materialized")

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
                log(f"  [chunk {ci + 1}/{args.chunks}]")

    # The flagship sharded format: exact residual-int8 leaves (sq) with
    # SOAR dual assignment (leaf-boundary spill recovery at scale).
    b = (scann_tpu.builder(np.zeros((1, d), np.float32), 10, "dot_product")
         .tree(num_leaves=args.leaves,
               num_leaves_to_search=l2s_list[0],
               training_sample_size=args.sample, random_init=False,
               soar_lambda=args.soar if args.soar > 0 else None)
         .score_brute_force(quantize="int8"))
    config = b.create_config()

    t0 = time.perf_counter()
    ss = mesh_mod.build_sharded_streaming(chunks, config, mesh,
                                          compute_device=compute_device)
    build_s = time.perf_counter() - t0
    slots = int((np.asarray(ss._host_parts["slot_dpid"]) >= 0).sum())
    want = 2 * n if args.soar > 0 else n
    assert slots == want, (slots, want)
    log(f"build: {build_s:.1f}s for {n} rows "
        f"({n / build_s / 1e6:.2f}M rows/s), {slots} slots")

    # Topic-aligned queries (the retrieval workload).
    nq = args.nq
    q = (topics[rng.integers(0, n_topics, nq)]
         + args.noise * rng.standard_normal((nq, d)).astype(np.float32))
    q = (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32)

    # Exact ground truth streamed chunk-by-chunk on the compute device
    # (never resident).
    t0 = time.perf_counter()
    if compute_device is not None:
        qd = jax.device_put(q, compute_device)

        @jax.jit
        def gt_step(best_v, best_i, x, qd, base):
            sims = jax.lax.dot_general(
                qd, x, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ids = base + jnp.arange(x.shape[0], dtype=jnp.int32)
            v = jnp.concatenate([best_v, sims], axis=1)
            i = jnp.concatenate(
                [best_i, jnp.broadcast_to(ids[None, :], sims.shape)],
                axis=1)
            vv, pos = jax.lax.top_k(v, 10)
            return vv, jnp.take_along_axis(i, pos, axis=1)

        best_v = jax.device_put(
            jnp.full((nq, 10), -jnp.inf, jnp.float32), compute_device)
        best_i = jax.device_put(
            jnp.full((nq, 10), -1, jnp.int32), compute_device)
        from scann_tpu.utils import transfer
        for ci in range(args.chunks):
            # Bounded slices: single ~100 MB device_puts wedge the
            # tunneled PJRT worker (STATUS.md).
            x = transfer.to_device(make_chunk(ci), device=compute_device)
            best_v, best_i = gt_step(best_v, best_i, x, qd,
                                     np.int32(ci * args.chunk_rows))
        best_i = np.asarray(best_i)
    else:
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
    log(f"ground truth streamed in {gt_s:.1f}s")

    def recall_of(idx_):
        return float(np.mean(
            [len(set(idx_[i]) & set(best_i[i])) / 10 for i in range(nq)]))

    points = []
    for l2s in l2s_list:
        t0 = time.perf_counter()
        idx_l, _ = ss.search_batched(q, leaves_to_search=l2s)
        points.append({"leaves_to_search": l2s,
                       "search_batch_s": round(time.perf_counter() - t0, 3),
                       "recall_at_10": round(recall_of(np.asarray(idx_l)),
                                             4)})
        log(f"  l2s={l2s}: recall {points[-1]['recall_at_10']} "
            f"({points[-1]['search_batch_s']}s)")
    best = max(points, key=lambda p: p["recall_at_10"])
    result = {
        "rows": n, "dim": d, "num_leaves": args.leaves,
        "leaf_format": ss.leaf_format,
        "soar_lambda": args.soar,
        "training_sample": args.sample,
        "build_s": round(build_s, 1),
        "build_compute_device": str(compute_device) if compute_device
        else "8-device virtual cpu mesh",
        "search_mesh": "8-device virtual cpu mesh (2 data x 4 shard)",
        "gt_stream_s": round(gt_s, 1),
        "points": points,
        "best_recall_at_10": best["recall_at_10"],
        "mesh": {"data": 2, "shard": 4},
        "nq": nq,
        "bytes_per_vector": round(
            slots * (d + 12) / n, 1),
    }
    print(json.dumps(result))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"sharded_{n // 1_000_000}m_result.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    assert best["recall_at_10"] >= 0.95, result


if __name__ == "__main__":
    main()
