"""Dynamic updates: upsert / delete / rebalance.

TPU-native equivalent of the reference's mutation stack: ScannNumpy
Upsert/Delete with precomputed mutation artifacts (scann_ops/cc/
scann_npy.cc:79-138), TreeXHybridMutator (tree_x_hybrid/mutator.h:64-156),
the AH leaf mutator packing codes in place (searcher_mutator.cc), docid
bookkeeping in the Python wrapper (scann_ops_pybind.py:130-170), and
Rebalance == RetrainAndReindexSearcher (utils/single_machine_retraining.h:26,
scann.cc:433-448).

Functional device arrays resist in-place edits, so the design reserves
spare capacity at build time (slot arrays already carry padding with a
dpid == -1 sentinel) and applies mutations as small device scatters:

  * insert: tokenize + residualize + encode the new vectors (the same
    batched build kernels, on device), then write (code, leaf, dpid) into
    free slots with .at[].set — no index re-upload.
  * delete: set the slot's dpid to -1 (a tombstone), exactly like the
    reference marking datapoints removed before compaction.
  * update: delete + insert.
  * rebalance: full retrain from the host-resident vector mirror (the
    reference's RetrainAndReindex), which also compacts tombstones.

Incremental maintenance mirrors the reference's threshold rule
(incremental_training_config fraction/number_of_datapoints,
mutator.h:676-781): once mutations since the last (re)build exceed the
threshold, the caller is told to rebalance — and Searcher.upsert does so
automatically, like ScannNumpy (scann_npy.cc:126-135).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class MutationState:
    """Host-side bookkeeping shared by mutable searchers."""

    def __init__(self, database: np.ndarray, docids: Optional[list]):
        self.vectors = np.array(database, np.float32, copy=True)
        self.alive = np.ones(len(database), bool)
        self.docid_to_id = None
        if docids is not None:
            self.docid_to_id = {d: i for i, d in enumerate(docids)}
        self.mutations_since_rebuild = 0

    @property
    def next_id(self) -> int:
        return len(self.vectors)

    def live_database(self):
        """(vectors, docids, old_id -> new_id map) with tombstones dropped."""
        keep = np.nonzero(self.alive)[0]
        remap = -np.ones(len(self.vectors), np.int64)
        remap[keep] = np.arange(len(keep))
        return self.vectors[keep], keep, remap

    def append(self, vecs: np.ndarray):
        start = len(self.vectors)
        self.vectors = np.concatenate([self.vectors, vecs], axis=0)
        self.alive = np.concatenate(
            [self.alive, np.ones(len(vecs), bool)])
        return np.arange(start, start + len(vecs))


def resolve_upsert_ids(state: MutationState, docids, n_new: int,
                       searcher_docids: Optional[list]):
    """Map upsert docids to (existing_id or -1) per row, registering new
    docids (the wrapper-level docid map, scann_ops_pybind.py:130-153)."""
    if state.docid_to_id is None:
        raise ValueError(
            "upsert/delete require the searcher to be built with docids "
            "(reference: docids are required in order to update the "
            "searcher, scann_builder.py build() docstring)")
    if len(docids) != n_new:
        raise ValueError("Number of items mismatch in docids and database "
                         "vectors")
    existing = np.full(n_new, -1, np.int64)
    for i, d in enumerate(docids):
        if d in state.docid_to_id:
            existing[i] = state.docid_to_id[d]
    return existing


def incremental_threshold_exceeded(part_cfg, state: MutationState,
                                   n_points: int) -> bool:
    """incremental_training_config trigger (mutator.h IncrementalMaintenance
    semantics: fraction of corpus or absolute count)."""
    if part_cfg is None or part_cfg.incremental_threshold is None:
        return False
    thr = part_cfg.incremental_threshold
    if isinstance(thr, float) and thr < 1.0:
        return state.mutations_since_rebuild > thr * max(n_points, 1)
    return state.mutations_since_rebuild > int(thr)
