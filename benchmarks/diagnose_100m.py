"""Diagnose the 100M recall shortfall from on-disk artifacts only.

Questions answered (no device, no rebuild):
  1. GT composition: how many of each query's true top-10 are SAME-TOPIC
     rows vs cross-topic extreme-tail rows?  Poisson(12) topic sizes mean
     ~24% of queries have <10 topic-mates; cross-topic fillers are
     unstructured noise no partitioned index retrieves.
  2. Candidate-recall ceiling: with the trained 10240 centers and the
     actual (primary + SOAR) leaf assignments, what fraction of GT rows
     lives in the top-l2s leaves per query?  If measured recall ~= this
     ceiling, leaf SELECTION binds (corpus geometry), not scoring.
"""
import json
import os
import sys
import time

import numpy as np

BENCH = os.path.dirname(os.path.abspath(__file__))
SPILL = os.path.join(BENCH, "spill_100m")
SAVE = os.path.join(BENCH, "index_100m")

N = 100_000_000
CHUNK = 250_000
D = 96
N_TOPICS = max(N // 12, 1000)

t0 = time.time()


def log(m):
    print(f"[diag +{time.time() - t0:6.1f}s] {m}", file=sys.stderr, flush=True)


gt = np.load(os.path.join(SAVE, "gt.npz"))
q, best_i = gt["q"], gt["gt"]
nq = q.shape[0]
log(f"gt: {best_i.shape}, queries {q.shape}")

# --- reproduce topic ids ------------------------------------------------
rng = np.random.default_rng(7)
topics = rng.standard_normal((N_TOPICS, D)).astype(np.float32)
topics /= np.linalg.norm(topics, axis=1, keepdims=True)
q_topics = rng.integers(0, N_TOPICS, nq)
log(f"{N_TOPICS} topics rebuilt; q_topics drawn")

# topic id of each GT row: regenerate the integer draw of its chunk
need_chunks = sorted(set(int(v) // CHUNK for v in best_i.ravel()))
row_topic = {}
for ci in need_chunks:
    r = np.random.default_rng(100 + ci)
    tids = r.integers(0, N_TOPICS, CHUNK)
    for v in best_i.ravel():
        v = int(v)
        if v // CHUNK == ci:
            row_topic[v] = int(tids[v % CHUNK])
log(f"topic ids for {len(row_topic)} GT rows from {len(need_chunks)} chunks")

same = np.array([[row_topic[int(v)] == q_topics[i] for v in best_i[i]]
                 for i in range(nq)])
frac_same = same.mean()
per_q_same = same.sum(axis=1)
log(f"GT same-topic fraction: {frac_same:.4f}")
log(f"queries with >=10 same-topic GT: {(per_q_same >= 10).mean():.3f}; "
    f"median same-topic {np.median(per_q_same)}")

# how many topic-mates exist per query topic (Poisson check)?  Count via
# the same chunk regen across ALL chunks would be 400 passes; sample 40.
sample_cis = list(range(0, 400, 10))
counts = np.zeros(nq, np.int64)
for ci in sample_cis:
    r = np.random.default_rng(100 + ci)
    tids = r.integers(0, N_TOPICS, CHUNK)
    counts += (tids[None, :] == q_topics[:, None]).sum(axis=1)
est_mates = counts * (400 / len(sample_cis))
log(f"estimated topic-mates per query: mean {est_mates.mean():.1f}, "
    f"<10 mates: {(est_mates < 10).mean():.3f}")

# --- candidate-recall ceiling ------------------------------------------
ph1 = np.load(os.path.join(SPILL, "phase1.npz"))
log(f"phase1 keys: {list(ph1.keys())}")
centers = None
for k in ("centers", "tree_centers", "kmeans_centers"):
    if k in ph1:
        centers = ph1[k]
        break
if centers is None:
    centers = ph1[list(ph1.keys())[0]]
log(f"centers {centers.shape} {centers.dtype}")
if centers.dtype != np.float32:
    centers = centers.astype(np.float32)

csims = q @ centers.T  # (nq, L)
order = np.argsort(-csims, axis=1)

dpid = np.lib.format.open_memmap(os.path.join(SPILL, "layout_dpid.npy"),
                                 mode="r")
leaf = np.lib.format.open_memmap(os.path.join(SPILL, "layout_leaf.npy"),
                                 mode="r")
log(f"layout: {dpid.shape} slots")

# leaves of each GT row: scan the layout in blocks, collect slots whose
# dpid is a GT row (set membership via np.isin on 16M blocks).
want = np.unique(best_i.ravel().astype(dpid.dtype))
row_leaves = {int(v): [] for v in want}
BLK = 1 << 24
for s in range(0, dpid.shape[0], BLK):
    dp = np.asarray(dpid[s:s + BLK])
    lf = np.asarray(leaf[s:s + BLK])
    m = np.isin(dp, want)
    for v, l in zip(dp[m], lf[m]):
        row_leaves[int(v)].append(int(l))
log(f"leaf assignments gathered "
    f"(mean {np.mean([len(v) for v in row_leaves.values()]):.2f}/row)")

out = {"gt_same_topic_fraction": round(float(frac_same), 4),
       "queries_with_10_same_topic_gt":
           round(float((per_q_same >= 10).mean()), 4),
       "est_mates_lt10": round(float((est_mates < 10).mean()), 4),
       "ceiling": {}}
for l2s in (192, 320, 480, 768, 1024, 2048):
    sel = [set(order[i, :l2s].tolist()) for i in range(nq)]
    hit = np.array([[any(l in sel[i] for l in row_leaves[int(v)])
                     for v in best_i[i]] for i in range(nq)])
    # ceiling overall and on the same-topic subset
    out["ceiling"][l2s] = {
        "candidate_recall": round(float(hit.mean()), 4),
        "same_topic_only": round(float(hit[same].mean()), 4),
        "cross_topic_only": round(float(hit[~same].mean()), 4)
        if (~same).any() else None,
    }
    log(f"l2s={l2s}: ceiling {out['ceiling'][l2s]}")

with open(os.path.join(BENCH, "diagnose_100m.json"), "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out, indent=1))
