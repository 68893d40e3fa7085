"""Graph-embeddable search export via jax.export (StableHLO).

Reference role: the SavedModel surface — ``scann_to_tensors`` /
``tensors_to_scann`` embed a searcher inside an exported model graph as
tensors + custom ops so TF-Serving can run search with no ScaNN Python
(scann_ops/cc/ops/scann_ops.cc:56-95, scann_ops.py:41-73 ScannState).

TPU-native equivalent: the jitted search program exports to portable
StableHLO with the index state as ordinary array inputs:

  * ``save_exported_searcher(path, searcher, ...)`` writes, per query
    bucket, the serialized search program (``search_b{B}.jaxexport``)
    plus the index state arrays (``state.npz``, the searcher_to_tensors
    role) and a ``meta.json``.
  * ``load_exported_searcher(path)`` reloads WITHOUT constructing a
    scann_tpu searcher: ``jax.export.deserialize(...).call(q, *state)``
    — the artifact is plain StableHLO + arrays, so it can equally be
    loaded by any JAX program (or composed into a larger program that is
    itself exported/AOT-compiled), which is the graph-embedding property
    the reference gets from SavedModel.

Scope: one operating point (k, pre_reorder, leaves) per export, the same
static-argument regime as a deployed TF-Serving config; per-query
restricts/crowding overrides stay on the live-searcher API.  Exports are
platform-tagged by jax.export (a TPU export replays on TPU, a CPU export
on CPU) — matching the reference wheels' per-ISA builds.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np
from jax import export as jexport

_SEP = "::"  # flattened-state key separator inside state.npz


def _flatten_state(state):
    flat = {}
    for key, val in state.items():
        if isinstance(val, dict):
            for k2, v2 in val.items():
                if v2 is not None:
                    flat[f"{key}{_SEP}{k2}"] = v2
        elif val is not None:
            flat[key] = val
    return dict(sorted(flat.items()))


def save_exported_searcher(path: str, searcher, batch_sizes=(1024,),
                           final_num_neighbors=None,
                           pre_reorder_num_neighbors=None,
                           leaves_to_search=None):
    """Export the search program + index state for graph embedding.

    Writes one serialized StableHLO program per query bucket (the
    power-of-two padding search_batched uses) and the state arrays the
    programs consume.  Returns the list of exported bucket sizes."""
    from scann_tpu.models.base import _next_bucket

    k, k_pre, leaves = searcher._resolve_params(
        final_num_neighbors, pre_reorder_num_neighbors, leaves_to_search)
    num_leaves = getattr(getattr(searcher, "part_cfg", None), "num_leaves",
                         0)
    full_scan = leaves == 0 or leaves >= (num_leaves or 1 << 30)
    pruned = (not full_scan
              and getattr(searcher, "_pruned_available", False))
    leaves_bucket = leaves
    if leaves > 0:
        leaves_bucket = (min(leaves, num_leaves) if pruned
                         else (num_leaves or leaves))
    os.makedirs(path, exist_ok=True)
    buckets = sorted({_next_bucket(b) for b in batch_sizes})
    state = None
    for bucket in buckets:
        if full_scan:
            bucket = max(bucket, getattr(searcher, "_min_bucket", 8))
        searcher._prepare_for_query(bucket, leaves_bucket, full_scan,
                                    False, False)
        fn = searcher._get_compiled(bucket, k, k_pre, leaves_bucket, (),
                                    full_scan)
        state = searcher._state()
        if leaves > 0 and not pruned:
            state["leaves_dynamic"] = jax.numpy.int32(
                min(leaves, leaves_bucket))
        flat = _flatten_state(state)
        q_spec = jax.ShapeDtypeStruct((bucket, searcher.query_dims),
                                      np.float32)
        specs = {key: jax.ShapeDtypeStruct(v.shape, v.dtype)
                 for key, v in flat.items()}

        def run(q, flat_state, _template=state):
            # Rebuild the state dict the program was traced with — the
            # flattened npz drops None-valued entries, but the search
            # impl reads them (as Nones) during tracing.
            st = {}
            for key, val in _template.items():
                if isinstance(val, dict):
                    st[key] = {
                        k2: (flat_state[f"{key}{_SEP}{k2}"]
                             if v2 is not None else None)
                        for k2, v2 in val.items()}
                else:
                    st[key] = (flat_state[key] if val is not None
                               else None)
            return fn(q, st)

        exp = jexport.export(jax.jit(run))(q_spec, specs)
        with open(os.path.join(path, f"search_b{bucket}.jaxexport"),
                  "wb") as f:
            f.write(exp.serialize())
    flat = _flatten_state(state)
    np.savez(os.path.join(path, "state.npz"),
             **{key: np.asarray(v) for key, v in flat.items()})
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"buckets": buckets, "k": k, "k_pre": k_pre,
                   "leaves": leaves, "dims": int(searcher.query_dims),
                   "distance_measure": searcher.config.distance_measure,
                   "platforms": list(exp.platforms)}, f)
    return buckets


class ExportedSearcher:
    """Search over a save_exported_searcher artifact — pure jax.export
    replay, no scann_tpu searcher object (the tensors_to_scann role)."""

    def __init__(self, path: str):
        with open(os.path.join(path, "meta.json")) as f:
            self.meta = json.load(f)
        with np.load(os.path.join(path, "state.npz")) as z:
            self._flat = {key: z[key] for key in z.files}
        self._programs = {}
        for bucket in self.meta["buckets"]:
            with open(os.path.join(path, f"search_b{bucket}.jaxexport"),
                      "rb") as f:
                self._programs[bucket] = jexport.deserialize(f.read())

    def search_batched(self, queries):
        """Returns (indices, distances); indices are integer datapoint
        ids (docid mapping is a live-searcher feature)."""
        queries = np.asarray(queries, np.float32)
        nq = queries.shape[0]
        if self.meta["distance_measure"] == "cosine":
            queries = queries / np.maximum(
                np.linalg.norm(queries, axis=1, keepdims=True), 1e-20)
        fits = [b for b in self.meta["buckets"] if b >= nq]
        if not fits:
            big = max(self.meta["buckets"])
            outs = [self.search_batched(queries[i:i + big])
                    for i in range(0, nq, big)]
            return (np.concatenate([o[0] for o in outs]),
                    np.concatenate([o[1] for o in outs]))
        bucket = min(fits)
        if bucket != nq:
            queries = np.pad(queries, ((0, bucket - nq), (0, 0)))
        idx, dist = self._programs[bucket].call(queries, self._flat)
        return np.asarray(idx)[:nq], np.asarray(dist)[:nq]


def load_exported_searcher(path: str) -> ExportedSearcher:
    return ExportedSearcher(path)
