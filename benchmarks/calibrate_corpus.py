"""Calibrate the synthetic bench corpus to GLOVE-LIKE partition hardness.

The judge's round-3 finding (VERDICT.md weak-1): the old bench corpus
(1024 tight topics) let 2 of ~2350 leaves reach recall 0.96, while real
glove-100 needs ~5% of 2000 leaves for recall ~0.90 (reference notebook,
BASELINE.md:12-15).  The corpus property that matters is the CANDIDATE
recall curve: fraction of the true top-10 contained in the L nearest
leaves of a trained k-means partition, as a function of the scanned
fraction L/num_leaves.  Anchors from the reference notebook (which adds
AH quantization loss on top, so candidate recall sits slightly above the
reported end-to-end recall):

    5.0% of leaves  -> ~0.93 candidates   (end-to-end 0.8999 w/ pre=100)
    7.5% of leaves  -> ~0.955 candidates  (end-to-end 0.931 w/ pre=250)
    0.1% of leaves  -> LOW (<~0.6): no 2-leaf shortcut may exist

This script sweeps generator parameters (topics-per-row, per-dim noise,
Zipf popularity exponent, per-topic radius jitter) at a reduced scale
with rows/leaf and rows/topic held at the full-bench ratios, and prints
each parameter set's candidate-recall curve so the bench generator can
bake in the matching set.  Pure numpy; runs on CPU.

Usage: python benchmarks/calibrate_corpus.py [--n 150000] [--quick]
"""

import argparse
import itertools
import json
import sys
import time

import numpy as np


def make_corpus(n, nq, d, seed, topics_per_row, noise, zipf_alpha,
                radius_jitter):
    """Topic-mixture angular corpus; returns (db, q)."""
    rng = np.random.default_rng(seed)
    n_topics = max(n // topics_per_row, 64)
    topics = rng.standard_normal((n_topics, d)).astype(np.float32)
    topics /= np.linalg.norm(topics, axis=1, keepdims=True)
    if zipf_alpha > 0:
        w = (1.0 + np.arange(n_topics)) ** (-zipf_alpha)
        w /= w.sum()
    else:
        w = None
    if radius_jitter > 0:
        sig = noise * np.exp(rng.uniform(-np.log(radius_jitter),
                                         np.log(radius_jitter),
                                         n_topics)).astype(np.float32)
    else:
        sig = np.full(n_topics, noise, np.float32)

    def draw(m, seed2):
        r = np.random.default_rng(seed2)
        a = (r.choice(n_topics, m, p=w) if w is not None
             else r.integers(0, n_topics, m))
        x = (topics[a]
             + sig[a][:, None] * r.standard_normal((m, d)).astype(np.float32))
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        return x.astype(np.float32)

    return draw(n, seed + 1), draw(nq, seed + 2)


def kmeans(x, k, iters, sample, seed):
    rng = np.random.default_rng(seed)
    s = x[rng.choice(len(x), min(sample, len(x)), replace=False)]
    c = s[rng.choice(len(s), k, replace=False)].copy()
    for _ in range(iters):
        # blockwise argmax dot (angular data: spherical k-means assign)
        assign = np.empty(len(s), np.int32)
        for i in range(0, len(s), 16384):
            assign[i:i + 16384] = (s[i:i + 16384] @ c.T).argmax(axis=1)
        for j in range(k):
            m = assign == j
            if m.any():
                c[j] = s[m].mean(axis=0)
        c /= np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-9)
    return c


def candidate_recall_curve(db, q, centers, fractions, k=10):
    """Fraction of exact top-k found in the L nearest leaves (by query
    centroid similarity), for each scanned fraction."""
    n, _ = db.shape
    nl = len(centers)
    tok = np.empty(n, np.int32)
    for i in range(0, n, 65536):
        tok[i:i + 65536] = (db[i:i + 65536] @ centers.T).argmax(axis=1)
    sims = q @ db.T
    truth = np.argsort(-sims, axis=1)[:, :k]
    truth_tok = tok[truth]  # (nq, k)
    qc = q @ centers.T
    leaf_rank = np.argsort(-qc, axis=1)  # (nq, nl)
    # rank_of_leaf[i, leaf] = position of leaf in query i's leaf ordering
    rank_of = np.empty_like(leaf_rank)
    rows = np.arange(len(q))[:, None]
    rank_of[rows, leaf_rank] = np.arange(nl)[None, :]
    truth_rank = rank_of[rows, truth_tok]  # (nq, k)
    out = {}
    for f in fractions:
        l = max(1, int(round(f * nl)))
        out[f] = float((truth_rank < l).mean())
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=150_000)
    ap.add_argument("--nq", type=int, default=200)
    ap.add_argument("--d", type=int, default=100)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--params", type=str, default=None,
                    help="JSON list of [topics_per_row, noise, zipf, jitter]")
    args = ap.parse_args()

    # Full-bench ratios: 1,183,514 rows / 2000 leaves = 592 rows/leaf.
    nl = max(args.n // 592, 32)
    fractions = (0.001, 0.005, 0.01, 0.025, 0.05, 0.075, 0.15)

    if args.params:
        grid = [tuple(p) for p in json.loads(args.params)]
    elif args.quick:
        grid = [(12, 0.05, 0.0, 0.0)]
    else:
        grid = list(itertools.product(
            (12, 50), (0.05, 0.10, 0.15), (0.0, 0.7), (0.0, 2.0)))

    for tpr, noise, zipf, jit in grid:
        t0 = time.perf_counter()
        db, q = make_corpus(args.n, args.nq, args.d, 0, tpr, noise, zipf,
                            jit)
        centers = kmeans(db, nl, iters=10, sample=60_000, seed=1)
        curve = candidate_recall_curve(db, q, centers, fractions)
        print(json.dumps({
            "topics_per_row": tpr, "noise": noise, "zipf": zipf,
            "jitter": jit, "num_leaves": nl,
            "curve": {f"{f:g}": round(v, 4) for f, v in curve.items()},
            "s": round(time.perf_counter() - t0, 1)}), flush=True)


if __name__ == "__main__":
    main()
