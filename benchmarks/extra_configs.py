"""Secondary benchmarks: the remaining BASELINE.json configs.

  config 3: sift-128-euclidean tree-AH with squared-L2 + exact reordering
  config 4: glove-100 tree-AH + SOAR spilled assignment

Synthetic stand-ins (no egress for the real corpora) with realistic
cluster structure; each prints one JSON line.  The headline glove config
lives in ../bench.py; run this on the TPU with
``python benchmarks/extra_configs.py``.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_sift_like(n=1_000_000, nq=10_000, d=128, seed=0):
    """SIFT-ish: non-negative, un-normalized, *hierarchical* cluster
    structure (topics -> subtopics -> points) so nearest neighbors are
    genuinely close — flat noise-only mixtures make the true top-10
    near-equidistant at 1M scale, which no fixed-bit quantizer (ours or
    the reference's) can rank."""
    rng = np.random.default_rng(seed)
    n_topics, subs_per_topic = 1024, 40
    topics = rng.gamma(2.0, 20.0, (n_topics, d)).astype(np.float32)
    sub_offsets = 6.0 * rng.standard_normal(
        (n_topics * subs_per_topic, d)).astype(np.float32)

    def draw(m, s2):
        r = np.random.default_rng(s2)
        sub = r.integers(0, n_topics * subs_per_topic, m)
        x = (topics[sub // subs_per_topic] + sub_offsets[sub]
             + 1.5 * r.standard_normal((m, d)).astype(np.float32))
        return np.maximum(x, 0.0).astype(np.float32)

    return draw(n, seed + 1), draw(nq, seed + 2)


def recall_at_k(idx, truth):
    k = truth.shape[1]
    return float(np.mean([len(set(idx[i][:k]) & set(truth[i])) / k
                          for i in range(len(truth))]))


def bench_searcher(searcher, q, truth, leaves):
    searcher.search_batched(q, leaves_to_search=leaves)  # warmup/compile
    t0 = time.perf_counter()
    idx, _ = searcher.search_batched(q, leaves_to_search=leaves)
    dt = time.perf_counter() - t0
    return recall_at_k(idx, truth), len(q) / dt


def main():
    import scann_tpu

    # ---- config 3: sift-128-euclidean, squared L2 + exact reorder
    db, q = make_sift_like()
    s_exact = scann_tpu.builder(db, 10, "squared_l2").score_brute_force(
        ).build()
    truth = np.concatenate(
        [s_exact.search_batched(q[i:i + 2048])[0]
         for i in range(0, len(q), 2048)], axis=0)
    s = (scann_tpu.builder(db, 10, "squared_l2")
         .tree(num_leaves=2000, num_leaves_to_search=100,
               training_sample_size=100_000)
         .score_ah(2)
         .reorder(150).build())
    best = None
    for leaves in (100, 400, 2000):
        r, qps = bench_searcher(s, q, truth, leaves)
        if r >= 0.95 and (best is None or qps > best["qps"]):
            best = {"recall": r, "qps": qps, "leaves": leaves}
    if best is None:
        best = {"recall": r, "qps": qps, "leaves": leaves}
    print(json.dumps({"metric": "synth_sift128_l2_qps_at_recall0.95",
                      "value": round(best["qps"], 1), "unit": "qps/chip",
                      "recall_at_10": round(best["recall"], 4),
                      "leaves_to_search": best["leaves"]}), flush=True)

    # ---- config 3b: same corpus through the exact-int8 tree-SQ engine
    # (squared L2 rides the kernel's -||x_hat||^2 bias plane).  On
    # UN-normalized large-norm data the residual int8 steps are coarse
    # enough to cap recall@10 near ~0.94, so the qualifying sq config
    # composes a small exact f32 reorder on top (candidates from exact
    # int8 scores need only a thin rescore to fix near-tie ranking) —
    # tree-SQ alone is the dot/cosine champion, which is why
    # autopilot(engine="tree_sq") gates on those measures.
    best = None
    for reorder_k in (None, 40):
        b = (scann_tpu.builder(db, 10, "squared_l2")
             .tree(num_leaves=2000, num_leaves_to_search=100,
                   training_sample_size=100_000)
             .score_brute_force(quantize="int8"))
        if reorder_k:
            b = b.reorder(reorder_k)
        s_sq = b.build()
        for leaves in (8, 16, 40, 100):
            r, qps = bench_searcher(s_sq, q, truth, leaves)
            if r >= 0.95 and (best is None or qps > best["qps"]):
                best = {"recall": r, "qps": qps, "leaves": leaves,
                        "reorder": reorder_k or 0}
        del s_sq
    if best is None:
        best = {"recall": r, "qps": qps, "leaves": leaves,
                "reorder": reorder_k or 0}
    print(json.dumps({"metric": "synth_sift128_l2_sq_qps_at_recall0.95",
                      "value": round(best["qps"], 1), "unit": "qps/chip",
                      "recall_at_10": round(best["recall"], 4),
                      "leaves_to_search": best["leaves"],
                      "reorder": best["reorder"]}), flush=True)
    del s, s_exact

    # ---- config 4: glove-like + SOAR (fixed small leaves budget:
    # SOAR's value is recall at aggressive pruning)
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench as headline
    db, q = headline.make_glove_like(headline.N_DB, headline.N_QUERY,
                                     headline.DIM)
    truth = headline.exact_ground_truth(db, q, 10)

    def build(soar_lambda):
        b = (scann_tpu.builder(db, 10, "dot_product")
             .tree(num_leaves=2000, num_leaves_to_search=40,
                   training_sample_size=100_000,
                   soar_lambda=soar_lambda)
             .score_ah(2, anisotropic_quantization_threshold=0.2)
             .reorder(150))
        if soar_lambda is None:
            b = (scann_tpu.builder(db, 10, "dot_product")
                 .tree(num_leaves=2000, num_leaves_to_search=40,
                       training_sample_size=100_000)
                 .score_ah(2, anisotropic_quantization_threshold=0.2)
                 .reorder(150))
        return b.build()

    s_soar = build(1.5)
    r_soar, qps_soar = bench_searcher(s_soar, q, truth, 40)
    s_plain = build(None)
    r_plain, _ = bench_searcher(s_plain, q, truth, 40)
    print(json.dumps({"metric": "synth_glove100_soar_recall_at_40leaves",
                      "value": round(r_soar, 4),
                      "unit": "recall@10",
                      "recall_without_soar": round(r_plain, 4),
                      "qps": round(qps_soar, 1)}), flush=True)


if __name__ == "__main__":
    main()
