"""Multi-chip sharded tree-AH: build, search, serialize over a Mesh.

This layer has no reference equivalent: the reference is single-machine
(SURVEY.md §2.10) and scales out only by whole-index replication behind
TF-Serving.  Here a large index shards its *leaves* across an ICI mesh axis
("shard") while query batches shard across a data axis ("data"):

  * build (build_sharded): centers train by data-parallel Lloyd iterations
    (local assignment + psum of per-center sums/counts over the mesh,
    sharded_kmeans_step); tokenize + residualize + AH-encode stream through
    one jitted program per row chunk with rows sharded on the data axis;
    slots then regroup to their leaf-owner shards (contiguous leaf ranges)
    and each shard lays out its slots leaf-sorted.
  * search: centers (a few MB) are replicated; every device tokenizes the
    query shard against all centers, scores only the leaf slots it owns
    (LUT16 one-hot scoring over the local codes), rescores its own local
    candidates against a *compressed* (int8) local row shard — reference-
    style memory: 0.5 B/dim codes + 1 B/dim rescore rows, no f32 copies —
    and the per-device top-k candidate lists all_gather over the shard
    axis for a final static top-k.  The only cross-chip communication is
    (k * shards) candidate pairs per query, riding ICI.

Every candidate the single-chip searcher would rescore is also rescored
here (the global AH top-k_pre is a subset of the union of per-shard
top-k_pre), so sharded recall is >= single-chip recall.
"""

from __future__ import annotations

import functools
import json
import logging
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scann_tpu import config as cfg
from scann_tpu.ops import ah as ah_ops
from scann_tpu.ops import distance as dist_ops
from scann_tpu.ops import kmeans as kmeans_ops
from scann_tpu.ops import lut16 as lut16_ops
from scann_tpu.ops import quantize as quant_ops
from scann_tpu.ops import topk as topk_ops
from scann_tpu.partitioning.kmeans_tree import spilling_mask
from scann_tpu.utils import transfer as transfer_mod

_logger = logging.getLogger("scann_tpu")

# Rows per sharded tokenize+encode pass (bounds device memory during build).
_BUILD_CHUNK = 1 << 17


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class ShardedTreeAHSearcher:
    """Leaf-sharded tree searcher over a 2-D ("data", "shard") mesh.

    Two leaf formats share one engine:
      * "ah" — 4-bit AH codes scored by LUT16 one-hot matmuls, exact
        residual-int8 rescore of the local candidates (the historical
        tree-AH sharding).
      * "sq" — NO codes: the residual per-row int8 rows (which the "ah"
        format already stores for its rescore) are scored EXACTLY,
        chunk by chunk, so selection and rescore are one pass (the
        sharded counterpart of the single-chip pruned-exact tree-SQ
        engine, ops/pruned_sq.py; config tree + score_brute_force
        int8).  Index memory drops to d+8 B/vector.

    Construct via build_sharded() (multi-chip build), from_searcher()
    (re-shard a single-host index), or load_sharded().
    """

    def __init__(self, scann_config: cfg.ScannConfig, mesh: Mesh,
                 codebook, centers, host_parts: dict,
                 shard_axis: str = "shard", data_axis: str = "data",
                 projector=None, query_spilling=None):
        self.config = scann_config
        self.part_cfg = scann_config.partitioning
        self.ah_cfg = scann_config.asymmetric_hash
        self.leaf_format = "ah" if self.ah_cfg is not None else "sq"
        self.measure = cfg.internal_measure(
            scann_config.distance_measure)
        self.user_measure = scann_config.distance_measure
        self.mesh = mesh
        self.shard_axis = shard_axis
        self.data_axis = data_axis
        self.n_shards = mesh.shape[shard_axis]
        self.n_data = mesh.shape[data_axis]
        # Projected (PCA/OPQ/truncate) indexes: tokenization and code
        # scoring run in the projected space (queries projected once,
        # replicated matmul), while the rescore rows are stored ABSOLUTE
        # in the ORIGINAL space — the sharded counterpart of the
        # single-chip rule "reorder stays raw" (models/base.py:283-305;
        # reference KMeansTreeProjectingDecorator, projecting_decorator.h).
        self.projector = projector
        self.absolute_rows = bool(host_parts.get("absolute_rows",
                                                 projector is not None))
        if query_spilling is None and self.part_cfg is not None:
            query_spilling = (
                self.part_cfg.query_spilling_type or "fixed_number",
                self.part_cfg.query_spilling_threshold or 0.0)
        qs = query_spilling or ("fixed_number", 0.0)
        self.query_spilling = (str(qs[0]), float(qs[1]))
        self.model = (ah_ops.AHModel(
            codebook=jnp.asarray(codebook),
            dims=int(host_parts.get("model_dims", host_parts["dims"])),
            block_dims=(jnp.asarray(host_parts["block_dims"])
                        if host_parts.get("block_dims") is not None
                        else None))
            if codebook is not None else None)
        self.num_leaves = int(host_parts["num_leaves"])
        self._shard_chunk = int(host_parts["chunk"])
        self._shard_slots = int(host_parts["rows_i8"].shape[1])
        self._host_parts = host_parts
        self._compiled = {}
        self.n_points = int(max(0, np.asarray(
            host_parts["slot_dpid"]).max())) + 1
        self._crowding_attrs = None

        shard3 = NamedSharding(mesh, P(shard_axis, None, None))
        shard2 = NamedSharding(mesh, P(shard_axis, None))
        repl = NamedSharding(mesh, P())
        hp = host_parts
        # device_put HOST arrays directly under the mesh sharding: going
        # through jnp.asarray first would stage the full buffer on the
        # DEFAULT backend (a 100M-row index is ~20 GB of int8 rows — it
        # OOMed a 16 GB TPU that wasn't even the serving target).
        def _host(a):
            return a if isinstance(a, np.ndarray) else np.asarray(a)
        self.state = {
            "slot_leaf": jax.device_put(_host(hp["slot_leaf"]), shard2),
            "slot_dpid": jax.device_put(_host(hp["slot_dpid"]), shard2),
            "rows_i8": jax.device_put(_host(hp["rows_i8"]), shard3),
            "rows_sq": jax.device_put(_host(hp["rows_sq"]), shard2),
            "rows_scale": jax.device_put(_host(hp["rows_scale"]), shard2),
            "centers": jax.device_put(_host(centers), repl),
        }
        if self.leaf_format == "ah":
            self.state["codes"] = jax.device_put(_host(hp["codes"]),
                                                 shard3)
            self.state["codebook"] = jax.device_put(self.model.codebook,
                                                    repl)
        if self.projector is not None and self.projector.matrix is not None:
            self.state["proj"] = jax.device_put(
                jnp.asarray(self.projector.matrix), repl)

    # ---------------------------------------------------------- builders
    @classmethod
    def from_searcher(cls, searcher, database: np.ndarray, mesh: Mesh,
                      shard_axis: str = "shard", data_axis: str = "data"):
        """Re-shard a fully-built single-host TreeAHSearcher (the database
        rows are compressed to int8 for the per-shard rescore)."""
        if searcher.partitioner is None:
            raise ValueError("sharded search requires a partitioned index")
        projector = getattr(searcher, "projector", None)
        n_shards = mesh.shape[shard_axis]
        num_leaves = searcher.partitioner.num_leaves
        model_dims = None
        if getattr(searcher, "_sq_mode", False):
            # Tree-SQ searcher: no codes; the residual rows re-derive from
            # the database (the sharded sq format stores exactly them).
            slot_leaf = np.asarray(searcher.slot_leaf)
            slot_dpid = np.asarray(searcher.slot_dpid)
            codes = np.zeros((slot_leaf.shape[0], 0), np.uint8)
            codebook = None
        else:
            codes = np.asarray(searcher._host["codes"])
            slot_leaf = np.asarray(searcher.index.slot_leaf)
            slot_dpid = np.asarray(searcher.index.slot_dpid)
            codebook = np.asarray(searcher.model.codebook)
            model_dims = searcher.model.dims
        host_parts = _layout_shards(
            codes, slot_leaf, slot_dpid, database, num_leaves, n_shards,
            dims=database.shape[1],
            centers=np.asarray(searcher.partitioner.centers),
            absolute_rows=projector is not None)
        if model_dims is not None:
            host_parts["model_dims"] = model_dims
        if (codebook is not None
                and getattr(searcher.model, "block_dims", None) is not None):
            host_parts["block_dims"] = np.asarray(searcher.model.block_dims)
        part = searcher.partitioner
        return cls(searcher.config, mesh, codebook,
                   np.asarray(part.centers), host_parts,
                   shard_axis, data_axis, projector=projector,
                   query_spilling=(part.query_spilling_type,
                                   part.query_spilling_threshold))

    def set_crowding(self, attributes):
        """Attach per-datapoint crowding attributes, indexed by global
        datapoint id (same contract as the single-chip
        Searcher.set_crowding; reference: EnableCrowding,
        single_machine_base.h:126-163).  The attribute table is replicated
        over the mesh and gathered after the cross-shard candidate merge."""
        attributes = np.asarray(attributes, np.int32)
        if attributes.ndim == 1:
            attributes = attributes[:, None]
        if attributes.ndim != 2 or attributes.shape[0] != self.n_points:
            raise ValueError(
                f"crowding attributes must have shape ({self.n_points},) "
                f"or ({self.n_points}, num_dims), got {attributes.shape}")
        self._crowding_attrs = jax.device_put(
            jnp.asarray(attributes), NamedSharding(self.mesh, P()))

    # ------------------------------------------------------- maintenance
    def get_health_stats(self):
        """Partition imbalance + occupancy, derived from the sharded slot
        tables (single-chip Searcher.get_health_stats parity; reference:
        HealthStatsCollector, base/health_stats_collector.h:36-60)."""
        from scann_tpu.utils import health
        hp = self._host_parts
        leaf = np.asarray(hp["slot_leaf"]).reshape(-1)
        dpid = np.asarray(hp["slot_dpid"]).reshape(-1)
        sizes = np.bincount(leaf[dpid >= 0], minlength=self.num_leaves)
        stats = health.HealthStats()
        stats.sum_partition_sizes = int(sizes.sum())
        (stats.partition_weighted_avg_relative_imbalance,
         stats.partition_avg_relative_positive_imbalance) = (
             health.partition_imbalance(sizes))
        return stats.as_dict()

    def _refresh_device(self, keys=("codes", "slot_leaf", "slot_dpid",
                                    "rows_i8", "rows_sq", "rows_scale")):
        hp = self._host_parts
        shard3 = NamedSharding(self.mesh, P(self.shard_axis, None, None))
        shard2 = NamedSharding(self.mesh, P(self.shard_axis, None))
        for key in keys:
            if key == "codes" and self.leaf_format == "sq":
                continue  # the sq format stores no codes
            spec = shard3 if hp[key].ndim == 3 else shard2
            self.state[key] = jax.device_put(jnp.asarray(hp[key]), spec)

    def _scatter_slots(self, sh_idx, sl_idx, keys):
        """Write a small set of (shard, slot) table entries to the devices
        with one donated O(batch) scatter instead of re-uploading the whole
        shard tables (single-chip analogue: the mutator's in-place
        `.at[slots].set`; reference packs codes in place,
        asymmetric_hashing2/searcher_mutator.cc).  Values are read from the
        already-mutated host tables.  Each device drops writes addressed to
        other shards (out-of-range slot + scatter mode="drop"), so the only
        host->device traffic is the replicated update batch itself."""
        b = len(sh_idx)
        if b == 0:
            return
        hp = self._host_parts
        b_pad = max(8, 1 << (b - 1).bit_length())
        pad = b_pad - b
        # Padding rows carry shard -1: no device claims them.
        sh = np.concatenate([np.asarray(sh_idx, np.int32),
                             np.full(pad, -1, np.int32)])
        sl = np.concatenate([np.asarray(sl_idx, np.int32),
                             np.zeros(pad, np.int32)])
        vals = []
        for key in keys:
            tab = np.asarray(hp[key])
            v = tab[sh_idx, sl_idx]
            vals.append(np.concatenate(
                [v, np.zeros((pad,) + v.shape[1:], v.dtype)]))
        sig = ("scatter", keys, b_pad)
        fn = self._compiled.get(sig)
        if fn is None:
            shard_axis = self.shard_axis
            ranks = tuple(self.state[k].ndim for k in keys)

            def local(sh, sl, *args):
                tabs, vs = args[:len(keys)], args[len(keys):]
                me = jax.lax.axis_index(shard_axis)
                out = []
                for tab, v in zip(tabs, vs):
                    sl2 = jnp.where(sh == me, sl, tab.shape[1])
                    out.append(tab.at[0, sl2].set(v, mode="drop"))
                return tuple(out)

            in_specs = tuple(
                [P(), P()]
                + [P(shard_axis, *(None,) * (r - 1)) for r in ranks]
                + [P()] * len(keys))
            out_specs = tuple(P(shard_axis, *(None,) * (r - 1))
                              for r in ranks)
            fn = jax.jit(
                jax.shard_map(local, mesh=self.mesh, in_specs=in_specs,
                              out_specs=out_specs),
                donate_argnums=tuple(range(2, 2 + len(keys))))
            self._compiled[sig] = fn
        new_tabs = fn(jnp.asarray(sh), jnp.asarray(sl),
                      *[self.state[k] for k in keys],
                      *[jnp.asarray(v) for v in vals])
        for key, tab in zip(keys, new_tabs):
            self.state[key] = tab

    def delete(self, ids):
        """Remove datapoints by global datapoint id.  The sharded engine
        addresses points by integer id (there is no host docid map at this
        scale); all slot copies (SOAR spills included) are freed.  Device
        transfer is O(deleted slots), not O(index)."""
        ids = np.asarray(ids, np.int64).ravel()
        hp = self._host_parts
        sd = np.asarray(hp["slot_dpid"])
        mask = np.isin(sd, ids)
        found = np.unique(sd[mask])
        missing = np.setdiff1d(ids, found)
        if len(missing):
            raise KeyError(f"datapoint ids not present: {missing[:8]}")
        sd[mask] = -1
        hp["slot_dpid"] = sd
        sh_idx, sl_idx = np.nonzero(mask)
        self._scatter_slots(sh_idx, sl_idx, ("slot_dpid",))

    def upsert(self, ids, vectors):
        """Insert or update datapoints by global id: tokenize (+SOAR
        secondary), residual-encode with the shared codebook, int8-compress
        with the FIXED build multipliers, and place into free slots
        (updates free the old copies first).  The mutated shard tables are
        re-uploaded whole — fine for incremental serving updates; bulk
        loads should use build_sharded_streaming."""
        ids = np.asarray(ids, np.int64).ravel()
        vecs = np.asarray(vectors, np.float32)
        if vecs.ndim == 1:
            vecs = vecs[None, :]
        if len(ids) != len(vecs):
            raise ValueError("ids and vectors length mismatch")
        if self.user_measure == cfg.COSINE:
            vecs = vecs / np.maximum(
                np.linalg.norm(vecs, axis=1, keepdims=True), 1e-20)
        hp = self._host_parts
        sd = np.asarray(hp["slot_dpid"])
        # Update = delete + insert.
        mask = np.isin(sd, ids)
        del_sh, del_sl = np.nonzero(mask)
        sd[mask] = -1

        centers = np.asarray(self.state["centers"])
        # Projected indexes tokenize/encode in the projected space; the
        # int8 rescore rows below stay absolute in the original space.
        if self.projector is not None:
            vp = np.asarray(self.projector.project(
                jnp.asarray(vecs, jnp.float32)))
        else:
            vp = vecs
        diff = vp[:, None, :] - centers[None, :, :]
        d2 = np.einsum("nld,nld->nl", diff, diff)
        prim = d2.argmin(axis=1).astype(np.int32)
        token_cols = [prim]
        soar = self.part_cfg.soar if self.part_cfg else None
        if soar is not None:
            r = vp - centers[prim]
            rn = np.linalg.norm(r, axis=1, keepdims=True)
            r_hat = np.where(rn < 1e-7, 0.0, r / np.maximum(rn, 1e-20))
            proj = np.einsum("nld,nd->nl", diff, r_hat)
            score = d2 + float(soar.lambda_) * proj * proj
            score[np.arange(len(vecs)), prim] = np.inf
            token_cols.append(score.argmin(axis=1).astype(np.int32))

        import math as _math
        from scann_tpu.ops import ah as ah_ops_
        sq_fmt = self.leaf_format == "sq"
        threshold = (float("nan") if sq_fmt
                     else self.ah_cfg.anisotropic_quantization_threshold)
        residual = sq_fmt or bool(self.ah_cfg.residual_quantization)
        new_rows = []  # (slot_leaf, dpid, codes, rows_i8, rows_sq, scale)
        for col in token_cols:
            v = vp - centers[col] if residual else vp
            vj = jnp.asarray(v)
            if sq_fmt:
                codes = np.zeros((len(vecs), 0), np.uint8)
            elif not _math.isnan(threshold):
                codes = np.asarray(ah_ops_.encode_noise_shaped(
                    vj, jnp.asarray(vp), self.model, threshold))
            else:
                codes = np.asarray(ah_ops_.encode(vj, self.model))
            # Residual per-row int8 rescore rows vs this slot's center
            # (single-chip residual-reorder parity); absolute rows for
            # projected indexes (centers live in the projected space).
            delta = (vecs if self.absolute_rows
                     else vecs - centers[col])
            m = np.abs(delta).max(axis=1)
            scale = (m / 127.0).astype(np.float32)
            inv = np.where(m > 0, 127.0 / np.maximum(m, 1e-30), 0.0)
            q = np.clip(np.round(delta * inv[:, None]),
                        -127, 127).astype(np.int8)
            deq = q.astype(np.float32) * scale[:, None]
            if not self.absolute_rows:
                deq = deq + centers[col]
            new_rows.append((col, ids.astype(np.int32), codes, q,
                             (deq * deq).sum(axis=1).astype(np.float32),
                             scale))

        total_new = sum(len(r[0]) for r in new_rows)
        free_sh, free_slot = np.nonzero(sd < 0)
        grew = len(free_sh) < total_new
        if grew:
            grow = _round_up(total_new - len(free_sh), self._shard_chunk)
            for key, fill in (("codes", 0), ("slot_leaf", 0),
                              ("slot_dpid", -1), ("rows_i8", 0),
                              ("rows_sq", 0.0), ("rows_scale", 0.0)):
                a = np.asarray(hp[key])
                pad = [(0, 0), (0, grow)] + [(0, 0)] * (a.ndim - 2)
                hp[key] = np.pad(a, pad, constant_values=fill)
            sd = np.asarray(hp["slot_dpid"])
            self._shard_slots = sd.shape[1]
            self._compiled = {}  # shapes changed; programs retrace
            free_sh, free_slot = np.nonzero(sd < 0)
        hp["slot_dpid"] = sd
        cursor = 0
        leaf_tab = np.asarray(hp["slot_leaf"])
        codes_tab = np.asarray(hp["codes"])
        rows_tab = np.asarray(hp["rows_i8"])
        sq_tab = np.asarray(hp["rows_sq"])
        scale_tab = np.asarray(hp["rows_scale"])
        for col, dpids, codes, q, sqn, scale in new_rows:
            take = slice(cursor, cursor + len(dpids))
            sh, sl = free_sh[take], free_slot[take]
            leaf_tab[sh, sl] = col
            sd[sh, sl] = dpids
            codes_tab[sh, sl] = codes
            rows_tab[sh, sl] = q
            sq_tab[sh, sl] = sqn
            scale_tab[sh, sl] = scale
            cursor += len(dpids)
        hp.update(slot_leaf=leaf_tab, slot_dpid=sd, codes=codes_tab,
                  rows_i8=rows_tab, rows_sq=sq_tab, rows_scale=scale_tab)
        self.n_points = max(self.n_points, int(ids.max()) + 1)
        if grew:
            # Shapes changed: the compiled programs retrace anyway, so the
            # full re-upload is the only O(index) path left (bulk loads
            # should size capacity up front via build_sharded_streaming).
            self._refresh_device()
            return
        touched_sh = np.concatenate([del_sh, free_sh[:total_new]])
        touched_sl = np.concatenate([del_sl, free_slot[:total_new]])
        flat = touched_sh.astype(np.int64) * self._shard_slots + touched_sl
        _, first = np.unique(flat, return_index=True)
        keys = ("slot_leaf", "slot_dpid", "rows_i8", "rows_sq", "rows_scale")
        if self.leaf_format == "ah":
            keys = keys + ("codes",)
        self._scatter_slots(touched_sh[first], touched_sl[first], keys)

    # ------------------------------------------------------------ search
    def _search_fn(self, k: int, k_pre: int, leaves: int,
                   restricted: bool = False, crowding_limit=(),
                   pre_tokenized: bool = False, pre_crowding_limit=()):
        if self.leaf_format == "sq":
            # Exact-score leaves: there is no reorder stage, so the
            # pre-reordering cap IS the post cap (tightest per dim).
            if pre_crowding_limit:
                crowding_limit = (tuple(
                    min(a, b) for a, b in zip(crowding_limit,
                                              pre_crowding_limit))
                    if crowding_limit else pre_crowding_limit)
            return self._search_fn_sq(k, k_pre, leaves, restricted,
                                      crowding_limit, pre_tokenized)
        measure = self.measure
        user_measure = self.user_measure
        model_dims = self.model.dims
        # VARIABLE_CHUNK table: tiny (B, w) int32 — close over as a host
        # constant (a device-array closure would force a download at
        # trace time, STATUS "environment findings").
        block_dims_tbl = (None if self.model.block_dims is None
                          else np.asarray(self.model.block_dims))
        cpb = self.ah_cfg.clusters_per_block
        num_leaves = self.num_leaves
        leaves = max(1, min(leaves, num_leaves))
        residual = bool(self.ah_cfg.residual_quantization)
        soar = self.part_cfg.soar if self.part_cfg else None
        lookup = ("int8" if self.ah_cfg.lookup_type == "reconstruct"
                  else self.ah_cfg.lookup_type)
        chunk = self._shard_chunk
        slots = self._shard_slots
        k_fetch = int(math.ceil(k_pre * soar.overretrieve_factor)
                      ) if soar is not None else k_pre
        k_fetch = min(k_fetch, slots)
        shard_axis, data_axis = self.shard_axis, self.data_axis
        has_proj_mat = "proj" in self.state
        proj_trunc = (self.projector.out_dims
                      if (self.projector is not None
                          and self.projector.matrix is None) else None)
        absolute = self.absolute_rows
        spill_type, spill_thr = self.query_spilling

        def local_step(queries, codes, slot_leaf, slot_dpid, rows_i8,
                       rows_sq, rows_scale, codebook, centers, *rest):
            # queries: (q_local, d); codes: (1, S, B) local shard block.
            rest = list(rest)
            proj = rest.pop(0) if has_proj_mat else None
            allow = rest.pop(0) if restricted else None
            attrs = (rest.pop(0) if (crowding_limit or pre_crowding_limit)
                     else None)
            pre_tok = rest.pop(0) if pre_tokenized else None
            # Projected (PCA/OPQ/truncate) index: tokenization and code
            # scoring see the PROJECTED query; the exact rescore below
            # stays in the original space against absolute rows
            # (projecting_decorator.h role, "reorder stays raw").
            if proj is not None:
                q_t = jnp.dot(queries, proj,
                              preferred_element_type=jnp.float32)
            elif proj_trunc is not None:
                q_t = queries[:, :proj_trunc]
            else:
                q_t = queries
            codes = codes[0]
            slot_leaf = slot_leaf[0]
            slot_dpid = slot_dpid[0]
            rows_i8 = rows_i8[0]
            rows_sq = rows_sq[0]
            rows_scale = rows_scale[0]
            model = ah_ops.AHModel(
                codebook=codebook, dims=model_dims,
                block_dims=(None if block_dims_tbl is None
                            else jnp.asarray(block_dims_tbl)))
            luts = ah_ops.build_luts(q_t, model, measure, lookup)
            nq = queries.shape[0]
            riota = jnp.arange(nq)[:, None]
            if pre_tok is not None:
                # Per-query leaf lists replace tokenization; -1 entries
                # mean "search fewer leaves for this query" (same contract
                # as the single-chip pre_tokenized_leaves).  Invalid
                # entries scatter to a dummy column that is sliced away.
                valid_pt = pre_tok >= 0
                leaf_ids = jnp.maximum(pre_tok, 0)
                tgt = jnp.where(valid_pt, leaf_ids, num_leaves)
                mask_dense = jnp.zeros((nq, num_leaves + 1), bool
                                       ).at[riota, tgt].set(
                                           True)[:, :num_leaves]
                bias_dense = None
                if residual:
                    c_sel = jnp.take(centers, leaf_ids, axis=0)
                    sims = jnp.einsum("nd,nld->nl", q_t, c_sel)
                    bias_dense = jnp.zeros(
                        (nq, num_leaves + 1), jnp.float32
                    ).at[riota, tgt].set(sims)[:, :num_leaves]
            else:
                sims_qc = dist_ops.similarity(
                    q_t, centers, measure,
                    precision=jax.lax.Precision.DEFAULT)
                center_sims, leaf_ids = jax.lax.top_k(sims_qc, leaves)
                if spill_type != "fixed_number":
                    # Distance-conditioned query spilling: the static
                    # `leaves` acts as max_spill_centers and the threshold
                    # masks the tail (kmeans_tree_partitioner.cc:189-284).
                    keep = spilling_mask(center_sims, spill_type,
                                         spill_thr)
                    tgt = jnp.where(keep, leaf_ids, num_leaves)
                    mask_dense = jnp.zeros(
                        (nq, num_leaves + 1), bool
                    ).at[riota, tgt].set(True)[:, :num_leaves]
                    bias_dense = None
                    if residual:
                        bias_dense = jnp.zeros(
                            (nq, num_leaves + 1), jnp.float32
                        ).at[riota, tgt].set(center_sims)[:, :num_leaves]
                else:
                    mask_dense = jnp.zeros(
                        (nq, num_leaves), bool
                    ).at[riota, leaf_ids].set(True)
                    bias_dense = None
                    if residual:
                        bias_dense = jnp.zeros(
                            (nq, num_leaves), jnp.float32
                        ).at[riota, leaf_ids].set(center_sims)

            num_chunks = slots // chunk

            def body(carry, ci):
                vals, pos = carry
                start = ci * chunk
                codes_c = jax.lax.dynamic_slice_in_dim(codes, start, chunk)
                leaf_c = jax.lax.dynamic_slice_in_dim(slot_leaf, start,
                                                      chunk)
                dpid_c = jax.lax.dynamic_slice_in_dim(slot_dpid, start,
                                                      chunk)
                sim = lut16_ops.score_codes_chunk(codes_c, luts, cpb)
                if bias_dense is not None:
                    sim = sim + jnp.take(bias_dense, leaf_c, axis=1)
                vmask = jnp.logical_and((dpid_c >= 0)[None, :],
                                        jnp.take(mask_dense, leaf_c, axis=1))
                if allow is not None:
                    ok = jnp.take(allow, jnp.clip(dpid_c, 0,
                                                  allow.shape[0] - 1))
                    vmask = jnp.logical_and(vmask, ok[None, :])
                cvals, cpos = topk_ops.chunk_top_k(
                    sim, min(k_fetch, chunk), valid=vmask)
                cslot = jnp.where(cpos >= 0, start + cpos, -1)
                return topk_ops.merge_top_k(vals, pos, cvals, cslot,
                                            k_fetch), None

            init = (jnp.full((nq, k_fetch), -jnp.inf, jnp.float32),
                    jnp.full((nq, k_fetch), -1, jnp.int32))
            (vals, lslots), _ = jax.lax.scan(body, init,
                                             jnp.arange(num_chunks))
            vals = vals + luts.base[:, None]
            dpids = jnp.where(lslots >= 0,
                              jnp.take(slot_dpid, jnp.maximum(lslots, 0)),
                              -1)
            if soar is not None:
                vals, dpids, lslots = _dedup_slots(vals, dpids, lslots)
            if pre_crowding_limit:
                # PRE-reordering crowding: cap per attribute on the AH
                # scores of THIS shard's candidates before the exact
                # rescore (single-chip parity, base/search_parameters.h
                # pre-reordering caps); the same limits re-apply after
                # the cross-shard merge so the cap holds globally.
                a_pre = jnp.take(attrs, jnp.clip(dpids, 0,
                                                 attrs.shape[0] - 1),
                                 axis=0)
                vals, dpids_f = topk_ops.crowding_filter_multi(
                    vals, dpids, a_pre, pre_crowding_limit)
                lslots = jnp.where(dpids_f < 0, -1, lslots)
                dpids = dpids_f
            # Exact local rescore on this shard's RESIDUAL int8 rows
            # (single-chip ReorderHelper residual-mode parity): each slot
            # stores x - c_{slot_leaf} with a per-row scale; the exact
            # q.c bias comes from the replicated float centroids.
            safe_sl = jnp.maximum(lslots, 0)
            qd = dist_ops.one_to_many_gathered(
                queries, rows_i8, safe_sl, cfg.DOT_PRODUCT)
            qd = qd * jnp.take(rows_scale, safe_sl)
            if absolute:
                # Projected index: rescore rows are stored ABSOLUTE in
                # the original space (the centers live in the projected
                # space), so there is no q.c bias term.
                dots_x = qd
            else:
                qc_dot = jax.lax.dot_general(
                    queries, centers,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                bias_c = jnp.take_along_axis(
                    qc_dot, jnp.take(slot_leaf, safe_sl), axis=-1)
                dots_x = qd + bias_c
            if measure == cfg.SQUARED_L2:
                q_sq = jnp.sum(queries * queries, axis=-1, keepdims=True)
                row_sq = jnp.take(rows_sq, safe_sl)
                exact = -jnp.maximum(q_sq - 2.0 * dots_x + row_sq, 0.0)
            else:
                exact = dots_x
            exact = jnp.where(lslots >= 0, exact, -jnp.inf)
            # all_gather candidate lists over the shard axis, merge.
            g_vals = jax.lax.all_gather(exact, shard_axis, axis=1,
                                        tiled=True)
            g_ids = jax.lax.all_gather(dpids, shard_axis, axis=1,
                                       tiled=True)
            if soar is not None:
                # A spilled datapoint's two copies can live on different
                # shards; suppress cross-shard duplicates after the gather.
                g_vals, g_ids = topk_ops.dedup_candidates(g_vals, g_ids)
            if crowding_limit or pre_crowding_limit:
                # Post-merge crowding over the full gathered candidate set
                # (attribute table replicated, gathered by global dpid) —
                # the sharded analogue of the single-chip post-reordering
                # crowding cap.  Pre-reordering limits re-apply here so
                # per-shard caps also hold across shards.
                lims = (tuple(min(a, b) for a, b in zip(
                    crowding_limit, pre_crowding_limit))
                    if (crowding_limit and pre_crowding_limit)
                    else (crowding_limit or pre_crowding_limit))
                a_g = jnp.take(attrs, jnp.clip(g_ids, 0,
                                               attrs.shape[0] - 1), axis=0)
                g_vals, g_ids = topk_ops.crowding_filter_multi(
                    g_vals, g_ids, a_g, lims)
            kk = min(k, g_vals.shape[-1])
            vals_k, posk = jax.lax.top_k(g_vals, kk)
            ids_k = jnp.take_along_axis(g_ids, posk, axis=-1)
            ids_k = jnp.where(jnp.isneginf(vals_k), -1, ids_k)
            dist = dist_ops.similarity_to_user_distance(vals_k,
                                                        user_measure)
            return ids_k, dist

        mesh = self.mesh
        in_specs = (P(data_axis, None),      # queries
                    P(shard_axis, None, None),  # codes
                    P(shard_axis, None),     # slot_leaf
                    P(shard_axis, None),     # slot_dpid
                    P(shard_axis, None, None),  # rows_i8
                    P(shard_axis, None),     # rows_sq
                    P(shard_axis, None),     # rows_scale
                    P(),                     # codebook
                    P())                     # centers
        if has_proj_mat:
            in_specs = in_specs + (P(),)     # replicated projection matrix
        if restricted:
            in_specs = in_specs + (P(),)     # replicated allowlist
        if crowding_limit or pre_crowding_limit:
            in_specs = in_specs + (P(),)     # replicated crowding attrs
        if pre_tokenized:
            in_specs = in_specs + (P(data_axis, None),)  # per-query leaves
        out_specs = (P(data_axis, None), P(data_axis, None))
        return jax.jit(jax.shard_map(local_step, mesh=mesh,
                                     in_specs=in_specs,
                                     out_specs=out_specs,
                                     check_vma=False))

    def _search_fn_sq(self, k: int, k_pre: int, leaves: int,
                      restricted: bool = False, crowding_limit=(),
                      pre_tokenized: bool = False):
        """Sharded EXACT residual-int8 search (leaf_format="sq"): each
        shard scores its resident rows chunk-by-chunk at the rescore's
        exact formula — selection and rescore are one pass, so k_pre is
        moot and only k * n_shards candidates ride ICI.  Under SOAR each
        point owns two slots (possibly on different shards) with
        near-identical exact scores; fetch 2k per shard and dedup after
        the cross-shard gather."""
        del k_pre  # exact scores: no reordering budget exists
        measure = self.measure
        user_measure = self.user_measure
        num_leaves = self.num_leaves
        leaves = max(1, min(leaves, num_leaves))
        chunk = self._shard_chunk
        slots = self._shard_slots
        soar = self.part_cfg.soar if self.part_cfg else None
        k_fetch = min(2 * k if soar is not None else k, slots)
        shard_axis, data_axis = self.shard_axis, self.data_axis
        has_proj_mat = "proj" in self.state
        proj_trunc = (self.projector.out_dims
                      if (self.projector is not None
                          and self.projector.matrix is None) else None)
        absolute = self.absolute_rows
        spill_type, spill_thr = self.query_spilling

        def local_step(queries, slot_leaf, slot_dpid, rows_i8,
                       rows_sq, rows_scale, centers, *rest):
            rest = list(rest)
            proj = rest.pop(0) if has_proj_mat else None
            allow = rest.pop(0) if restricted else None
            attrs = rest.pop(0) if crowding_limit else None
            pre_tok = rest.pop(0) if pre_tokenized else None
            if proj is not None:
                q_t = jnp.dot(queries, proj,
                              preferred_element_type=jnp.float32)
            elif proj_trunc is not None:
                q_t = queries[:, :proj_trunc]
            else:
                q_t = queries
            slot_leaf = slot_leaf[0]
            slot_dpid = slot_dpid[0]
            rows_i8 = rows_i8[0]
            rows_sq = rows_sq[0]
            rows_scale = rows_scale[0]
            nq = queries.shape[0]
            riota = jnp.arange(nq)[:, None]
            if pre_tok is not None:
                valid_pt = pre_tok >= 0
                leaf_ids = jnp.maximum(pre_tok, 0)
                tgt = jnp.where(valid_pt, leaf_ids, num_leaves)
                mask_dense = jnp.zeros((nq, num_leaves + 1), bool
                                       ).at[riota, tgt].set(
                                           True)[:, :num_leaves]
            else:
                sims_qc = dist_ops.similarity(
                    q_t, centers, measure,
                    precision=jax.lax.Precision.DEFAULT)
                center_sims, leaf_ids = jax.lax.top_k(sims_qc, leaves)
                if spill_type != "fixed_number":
                    keep = spilling_mask(center_sims, spill_type,
                                         spill_thr)
                    tgt = jnp.where(keep, leaf_ids, num_leaves)
                    mask_dense = jnp.zeros(
                        (nq, num_leaves + 1), bool
                    ).at[riota, tgt].set(True)[:, :num_leaves]
                else:
                    mask_dense = jnp.zeros(
                        (nq, num_leaves), bool
                    ).at[riota, leaf_ids].set(True)
            # Exact f32 q.c per leaf, gathered per slot by its leaf id
            # (zero when rows are stored absolute: projected indexes).
            if absolute:
                qc_dot = None
            else:
                qc_dot = jax.lax.dot_general(
                    queries, centers,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
            q_bf = queries.astype(jnp.bfloat16)
            q_sq = jnp.sum(queries * queries, axis=-1)

            num_chunks = slots // chunk

            def body(carry, ci):
                vals, pos = carry
                start = ci * chunk
                rows_c = jax.lax.dynamic_slice_in_dim(rows_i8, start, chunk)
                leaf_c = jax.lax.dynamic_slice_in_dim(slot_leaf, start,
                                                      chunk)
                dpid_c = jax.lax.dynamic_slice_in_dim(slot_dpid, start,
                                                      chunk)
                sc_c = jax.lax.dynamic_slice_in_dim(rows_scale, start,
                                                    chunk)
                dots = jax.lax.dot_general(
                    q_bf, rows_c.astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                qx = dots * sc_c[None, :]
                if qc_dot is not None:
                    qx = qx + jnp.take(qc_dot, leaf_c, axis=1)
                if measure == cfg.SQUARED_L2:
                    sq_c = jax.lax.dynamic_slice_in_dim(rows_sq, start,
                                                        chunk)
                    sim = -(q_sq[:, None] - 2.0 * qx + sq_c[None, :])
                else:
                    sim = qx
                vmask = jnp.logical_and(
                    (dpid_c >= 0)[None, :],
                    jnp.take(mask_dense, leaf_c, axis=1))
                if allow is not None:
                    ok = jnp.take(allow, jnp.clip(dpid_c, 0,
                                                  allow.shape[0] - 1))
                    vmask = jnp.logical_and(vmask, ok[None, :])
                cvals, cpos = topk_ops.chunk_top_k(
                    sim, min(k_fetch, chunk), valid=vmask)
                cslot = jnp.where(cpos >= 0, start + cpos, -1)
                return topk_ops.merge_top_k(vals, pos, cvals, cslot,
                                            k_fetch), None

            init = (jnp.full((nq, k_fetch), -jnp.inf, jnp.float32),
                    jnp.full((nq, k_fetch), -1, jnp.int32))
            (vals, lslots), _ = jax.lax.scan(body, init,
                                             jnp.arange(num_chunks))
            dpids = jnp.where(lslots >= 0,
                              jnp.take(slot_dpid, jnp.maximum(lslots, 0)),
                              -1)
            g_vals = jax.lax.all_gather(vals, shard_axis, axis=1,
                                        tiled=True)
            g_ids = jax.lax.all_gather(dpids, shard_axis, axis=1,
                                       tiled=True)
            if soar is not None:
                # A spilled datapoint's two exact-scored copies can both
                # survive (same or different shards); keep the best copy.
                g_vals, g_ids = topk_ops.dedup_candidates(g_vals, g_ids)
            if crowding_limit:
                a_g = jnp.take(attrs, jnp.clip(g_ids, 0,
                                               attrs.shape[0] - 1), axis=0)
                g_vals, g_ids = topk_ops.crowding_filter_multi(
                    g_vals, g_ids, a_g, crowding_limit)
            kk = min(k, g_vals.shape[-1])
            vals_k, posk = jax.lax.top_k(g_vals, kk)
            ids_k = jnp.take_along_axis(g_ids, posk, axis=-1)
            ids_k = jnp.where(jnp.isneginf(vals_k), -1, ids_k)
            dist = dist_ops.similarity_to_user_distance(vals_k,
                                                        user_measure)
            return ids_k, dist

        mesh = self.mesh
        in_specs = (P(data_axis, None),         # queries
                    P(shard_axis, None),        # slot_leaf
                    P(shard_axis, None),        # slot_dpid
                    P(shard_axis, None, None),  # rows_i8
                    P(shard_axis, None),        # rows_sq
                    P(shard_axis, None),        # rows_scale
                    P())                        # centers
        if has_proj_mat:
            in_specs = in_specs + (P(),)        # replicated projection
        if restricted:
            in_specs = in_specs + (P(),)
        if crowding_limit:
            in_specs = in_specs + (P(),)
        if pre_tokenized:
            in_specs = in_specs + (P(data_axis, None),)
        out_specs = (P(data_axis, None), P(data_axis, None))
        return jax.jit(jax.shard_map(local_step, mesh=mesh,
                                     in_specs=in_specs,
                                     out_specs=out_specs,
                                     check_vma=False))

    def search_batched(self, queries, final_num_neighbors=None,
                       pre_reorder_num_neighbors=None, leaves_to_search=None,
                       restrict_allowlist=None,
                       per_crowding_attribute_num_neighbors=None,
                       pre_tokenized_leaves=None,
                       post_reordering_epsilon=None,
                       per_crowding_attribute_pre_reordering_num_neighbors=(
                           None)):
        """Sharded batched search.  Accepts the single-chip kwargs:
        restricts (allowlist replicated over the mesh and masked per
        shard), crowding (attribute table replicated, cap applied after
        the cross-shard merge on exact scores — call set_crowding first)
        and per-query pre-tokenized leaf lists (sharded with the queries
        over the data axis)."""
        def _crowding_tuple(lim, kwarg_name):
            if lim is None:
                return ()
            if self._crowding_attrs is None:
                raise ValueError(
                    "call set_crowding(attributes) before searching with "
                    + kwarg_name)
            num_dims = self._crowding_attrs.shape[1]
            if np.isscalar(lim):
                return (int(lim),) * num_dims
            out = tuple(int(x) for x in lim)
            if len(out) != num_dims:
                raise ValueError(
                    f"expected {num_dims} crowding limits, got {len(out)}")
            return out

        crowding_limit = _crowding_tuple(
            per_crowding_attribute_num_neighbors,
            "per_crowding_attribute_num_neighbors")
        pre_crowding_limit = _crowding_tuple(
            per_crowding_attribute_pre_reordering_num_neighbors,
            "per_crowding_attribute_pre_reordering_num_neighbors")
        # Per-query result counts (reference SearchParameters semantics,
        # search_parameters.h:40-226): size the program by the max and
        # mask each query's tail after the sorted cross-shard merge —
        # identical results to a per-query program because the merge
        # output is sorted best-first.
        k_arr = None
        if final_num_neighbors is not None and np.ndim(final_num_neighbors):
            k_arr = np.asarray(final_num_neighbors, np.int64)
            if k_arr.ndim != 1 or len(k_arr) != len(queries):
                raise ValueError(
                    "per-query final_num_neighbors must be a 1-D array "
                    "with one entry per query")
            k = int(k_arr.max())
        else:
            k = final_num_neighbors or self.config.num_neighbors
        k_pre = k
        if self.config.reordering is not None:
            k_pre = self.config.reordering.reordering_num_neighbors
        if pre_reorder_num_neighbors:
            k_pre = pre_reorder_num_neighbors
        k_pre = max(k, k_pre)
        leaves = leaves_to_search or self.part_cfg.num_leaves_to_search
        queries = np.asarray(queries, np.float32)
        if self.user_measure == cfg.COSINE:
            queries = queries / np.maximum(
                np.linalg.norm(queries, axis=1, keepdims=True), 1e-20)
        nq = queries.shape[0]
        bucket = _round_up(max(nq, self.n_data), self.n_data)
        padded = np.zeros((bucket, queries.shape[1]), np.float32)
        padded[:nq] = queries
        restricted = restrict_allowlist is not None
        pre_tok = None
        if pre_tokenized_leaves is not None:
            pre_tok = np.asarray(pre_tokenized_leaves, np.int32)
            if pre_tok.ndim != 2 or pre_tok.shape[0] != nq:
                raise ValueError(
                    f"pre_tokenized_leaves must be (num_queries, L), got "
                    f"{pre_tok.shape}")
            if pre_tok.max() >= self.num_leaves:
                raise ValueError("pre_tokenized leaf id out of range")
            if pre_tok.shape[1] > self.num_leaves:
                raise ValueError(
                    f"pre_tokenized_leaves is wider ({pre_tok.shape[1]}) "
                    f"than num_leaves ({self.num_leaves})")
            pt_padded = np.full((bucket, pre_tok.shape[1]), -1, np.int32)
            pt_padded[:nq] = pre_tok
        key = (bucket, k, k_pre, leaves, restricted, crowding_limit,
               None if pre_tok is None else pre_tok.shape[1],
               pre_crowding_limit)
        fn = self._compiled.get(key)
        if fn is None:
            fn = self._search_fn(k, k_pre, leaves, restricted,
                                 crowding_limit, pre_tok is not None,
                                 pre_crowding_limit)
            self._compiled[key] = fn
        st = self.state
        q_dev = jax.device_put(
            jnp.asarray(padded),
            NamedSharding(self.mesh, P(self.data_axis, None)))
        if self.leaf_format == "sq":
            args = [q_dev, st["slot_leaf"], st["slot_dpid"],
                    st["rows_i8"], st["rows_sq"], st["rows_scale"],
                    st["centers"]]
        else:
            args = [q_dev, st["codes"], st["slot_leaf"], st["slot_dpid"],
                    st["rows_i8"], st["rows_sq"], st["rows_scale"],
                    st["codebook"], st["centers"]]
        if "proj" in st:
            args.append(st["proj"])
        if restricted:
            allow = np.asarray(restrict_allowlist, bool)
            args.append(jax.device_put(
                jnp.asarray(allow), NamedSharding(self.mesh, P())))
        if crowding_limit or pre_crowding_limit:
            args.append(self._crowding_attrs)
        if pre_tok is not None:
            args.append(jax.device_put(
                jnp.asarray(pt_padded),
                NamedSharding(self.mesh, P(self.data_axis, None))))
        idx, dist = fn(*args)
        idx = np.asarray(idx)[:nq]
        dist = np.asarray(dist)[:nq]
        if post_reordering_epsilon is not None:
            eps = np.asarray(post_reordering_epsilon, np.float32)
            if eps.ndim:  # per-query epsilon vector
                if eps.shape != (nq,):
                    raise ValueError(
                        "per-query post_reordering_epsilon must have one "
                        "entry per query")
                eps = eps[:, None]
            if self.config.distance_measure == cfg.DOT_PRODUCT:
                bad = ~(dist >= eps)
            else:
                bad = ~(dist <= eps)
            idx = np.where(bad, -1, idx)
            dist = np.where(bad, np.nan, dist)
        if k_arr is not None:
            tail = np.arange(k)[None, :] >= k_arr[:, None]
            idx = np.where(tail, -1, idx)
            dist = np.where(tail, np.nan, dist)
        return idx, dist

    # -------------------------------------------------------- persistence
    def serialize(self, artifacts_dir: str):
        """Sharded asset serialization: per-shard arrays + config JSON
        (the multi-chip analogue of ScannInterface::Serialize,
        scann_ops/cc/scann.cc:504-601)."""
        os.makedirs(artifacts_dir, exist_ok=True)
        hp = self._host_parts
        extra = ({} if self.model is None
                 else {"codebook": np.asarray(self.model.codebook)})
        if self.model is not None and self.model.block_dims is not None:
            extra["block_dims"] = np.asarray(self.model.block_dims)
        if self.projector is not None and self.projector.matrix is not None:
            extra["proj_matrix"] = np.asarray(self.projector.matrix)
        np.savez(os.path.join(artifacts_dir, "sharded_assets.npz"),
                 codes=hp["codes"], slot_leaf=hp["slot_leaf"],
                 slot_dpid=hp["slot_dpid"], rows_i8=hp["rows_i8"],
                 rows_sq=hp["rows_sq"], rows_scale=hp["rows_scale"],
                 centers=np.asarray(self.state["centers"]), **extra)
        meta = {"num_leaves": self.num_leaves,
                "dims": int(self._host_parts["dims"]),
                "chunk": self._shard_chunk,
                "n_shards": self.n_shards,
                "leaf_format": self.leaf_format,
                "config": json.loads(self.config.to_json())}
        if self.projector is not None:
            meta["proj_out_dims"] = int(self.projector.out_dims)
            meta["absolute_rows"] = bool(self.absolute_rows)
        if "model_dims" in self._host_parts:
            meta["model_dims"] = int(self._host_parts["model_dims"])
        with open(os.path.join(artifacts_dir, "sharded_config.json"),
                  "w") as f:
            json.dump(meta, f, indent=2)


def load_sharded(artifacts_dir: str, mesh: Mesh, shard_axis: str = "shard",
                 data_axis: str = "data") -> ShardedTreeAHSearcher:
    with open(os.path.join(artifacts_dir, "sharded_config.json")) as f:
        meta = json.load(f)
    raw = np.load(os.path.join(artifacts_dir, "sharded_assets.npz"))
    if meta["n_shards"] != mesh.shape[shard_axis]:
        raise ValueError(
            f"index was sharded {meta['n_shards']}-way; mesh has "
            f"{mesh.shape[shard_axis]} shards")
    scann_config = cfg._config_from_dict(meta["config"])
    if "rows_scale" not in raw:
        raise ValueError(
            "sharded artifacts predate residual per-row rescore "
            "(no rows_scale); rebuild the sharded index")
    host_parts = {k: raw[k] for k in
                  ("codes", "slot_leaf", "slot_dpid", "rows_i8", "rows_sq",
                   "rows_scale")}
    host_parts.update(num_leaves=meta["num_leaves"], dims=meta["dims"],
                      chunk=meta["chunk"])
    if "model_dims" in meta:
        host_parts["model_dims"] = meta["model_dims"]
    if "absolute_rows" in meta:
        host_parts["absolute_rows"] = bool(meta["absolute_rows"])
    if "block_dims" in raw.files:
        host_parts["block_dims"] = raw["block_dims"]
    codebook = raw["codebook"] if "codebook" in raw.files else None
    projector = None
    if "proj_out_dims" in meta:
        from scann_tpu.ops.projection import Projector
        mat = (jnp.asarray(raw["proj_matrix"])
               if "proj_matrix" in raw.files else None)
        projector = Projector(matrix=mat,
                              out_dims=int(meta["proj_out_dims"]))
    return ShardedTreeAHSearcher(scann_config, mesh, codebook,
                                 raw["centers"], host_parts, shard_axis,
                                 data_axis, projector=projector)


# ------------------------------------------------------------------ build
def build_sharded(database: np.ndarray, scann_config: cfg.ScannConfig,
                  mesh: Mesh, shard_axis: str = "shard",
                  data_axis: str = "data") -> ShardedTreeAHSearcher:
    """Multi-chip index build from an in-memory array: thin wrapper over
    the streaming build (build_sharded_streaming) with a trivial chunker.
    """
    database = np.asarray(database, np.float32)

    def chunks():
        for s in range(0, len(database), _BUILD_CHUNK):
            yield database[s:s + _BUILD_CHUNK]

    return build_sharded_streaming(chunks, scann_config, mesh,
                                   shard_axis=shard_axis,
                                   data_axis=data_axis)


def _reservoir_sample(chunks, sample_size: int, rng) -> tuple:
    """One streaming pass: uniform reservoir sample (the role of the
    reference's reservoir sampling, utils/random/reservoir_sampling.h /
    partitioner_factory_base.cc:34-76) + total row count."""
    reservoir = None
    n_seen = 0
    for rows in chunks:
        rows = np.asarray(rows, np.float32)
        m = rows.shape[0]
        if reservoir is None:
            reservoir = np.empty((sample_size, rows.shape[1]), np.float32)
        take_direct = min(max(sample_size - n_seen, 0), m)
        if take_direct:
            reservoir[n_seen:n_seen + take_direct] = rows[:take_direct]
        if m > take_direct:
            # Vectorized reservoir replacement for the remainder.
            idx = np.arange(n_seen + take_direct + 1, n_seen + m + 1)
            j = (rng.random(m - take_direct) * idx).astype(np.int64)
            sel = np.nonzero(j < sample_size)[0]
            reservoir[j[sel]] = rows[take_direct + sel]
        n_seen += m
    if reservoir is None:
        raise ValueError("empty database")
    return reservoir[:min(sample_size, n_seen)], n_seen


def build_sharded_streaming(chunks_fn, scann_config: cfg.ScannConfig,
                            mesh: Mesh, shard_axis: str = "shard",
                            data_axis: str = "data",
                            compute_device=None,
                            spill_dir: Optional[str] = None
                            ) -> ShardedTreeAHSearcher:
    """Multi-chip index build that NEVER holds the f32 database resident:
    ``chunks_fn`` is a callable returning a fresh iterator of (m, d) f32
    row chunks (called twice — once to sample, once to encode).  Peak host
    memory is one f32 chunk plus the compressed index itself (uint8 codes
    + int8 rescore rows), so the 100M-vector axis (BASELINE config 5) fits
    in ordinary host RAM.

    Phases (SURVEY.md §7 step 7):
      1. streaming reservoir sample -> data-parallel Lloyd k-means
         (psum'd sums/counts over the mesh, sharded_kmeans_step), with
         oversized partitions split on the sample (scaled cap).
      2. AH codebook on sampled residuals; int8 rescore multipliers from
         the sample.
      3. second streaming pass: tokenize (+ SOAR secondary assignment) +
         residualize + encode + int8-compress, one jitted program per
         chunk with rows sharded across every device; outputs append to
         leaf-owner shard buffers (compressed only).
      4. per-shard leaf-sorted slot layout.

    ``compute_device``: optional single fast device (e.g. one real TPU
    chip) on which the streaming COMPUTE passes (k-means, tokenize +
    SOAR + encode) run, while the finished index is laid out for — and
    served from — ``mesh``.  This is the production "build on a big
    chip, serve on a mesh" shape; the emitted index is structurally
    identical to the pure-mesh build (same programs, replicated instead
    of row-sharded operands).

    ``spill_dir``: optional directory for DISK-BACKED build state — the
    trained centers/codebook checkpoint, append-only encode spill files
    with chunk-granular progress, and a memmap leaf-sorted layout.  Host
    RAM stays O(one chunk) regardless of database size, and a crashed
    build RESUMES from the last completed chunk when rerun with the same
    spill_dir.  The emitted index is bit-identical to the in-memory
    build's.
    """
    part = scann_config.partitioning
    ah = scann_config.asymmetric_hash
    bf = scann_config.brute_force
    sq_mode = (ah is None and bf is not None and bf.quantize == cfg.INT8)
    if part is None or (ah is None and not sq_mode):
        raise ValueError(
            "build_sharded requires tree + score_ah, or tree + "
            "score_brute_force(quantize='int8') for the exact sq format")
    soar = part.soar
    # SOAR works in BOTH leaf formats: the sq format stores the secondary
    # slot's residual row vs its OWN center (exact scores for either copy),
    # doubling index bytes exactly like the reference's hashed_dataset_soar
    # (scann_ops/cc/scann.cc:534-555 writes dual tokenization slots).
    # Residual-quantization decision must match what search assumes
    # (ah.residual_quantization, set by the builder from the internal
    # measure) — deciding from the raw user measure here corrupted cosine
    # configs (ADVICE r2 medium).  The sq format always stores residual
    # rows (its rescore-grade rows ARE the index).
    residual = sq_mode or bool(ah.residual_quantization)
    is_cosine = scann_config.distance_measure == cfg.COSINE
    if soar is not None and not residual:
        raise ValueError("SOAR requires residual quantization")
    if scann_config.projection is not None:
        raise ValueError(
            "the streaming sharded build does not train projections; "
            "build a single-chip projected searcher and shard it with "
            "ShardedTreeAHSearcher.from_searcher")
    seed = scann_config.seed
    rng = np.random.default_rng(seed)
    devices = list(mesh.devices.flat)
    flat_mesh = Mesh(np.asarray(devices), ("data",))
    n_dev = len(devices)
    if compute_device is not None:
        _rep = functools.partial(jax.device_put, device=compute_device)
        row_place = compute_device
        # Bound the (rows, num_leaves) f32 assignment intermediates to
        # ~512 MB on the single compute chip (at 250k rows x 10k leaves
        # the unblocked intermediate is 10 GB — past HBM).
        build_block = max(1024, 1 << int(math.log2(max(
            1024, (1 << 29) // max(4 * part.num_leaves, 1)))))
    else:
        _rep = functools.partial(
            jax.device_put, device=NamedSharding(flat_mesh, P()))
        row_place = NamedSharding(flat_mesh, P("data", None))
        build_block = None  # rows are already sharded over the mesh

    def _norm(rows):
        if not is_cosine:
            return rows
        return rows / np.maximum(
            np.linalg.norm(rows, axis=1, keepdims=True), 1e-20)

    spill = (_SpillState(spill_dir, mesh.shape[shard_axis])
             if spill_dir is not None else None)
    ph = spill.load_phase1() if spill is not None else None
    if ph is None:
        # -- 1. streaming reservoir sample + data-parallel k-means.
        sample, n = _reservoir_sample(
            map(_norm, chunks_fn()), min(part.training_sample_size, 1 << 30),
            rng)
        sample_n, d = sample.shape
        if compute_device is not None or sample_n * d <= (1 << 25):
            # The sample fits one device comfortably: use the FULL single-chip
            # k-means engine (kmeans++/random init, empty-cluster reseeding,
            # min-size enforcement — one engine everywhere, like the
            # reference's GmmUtils; VERDICT r2 weak-4) and replicate the
            # result.
            res = jax.jit(functools.partial(
                kmeans_ops.kmeans, k=part.num_leaves,
                iterations=part.training_iterations,
                init="random" if part.random_init else "kmeans++",
                spherical=part.spherical,
                min_cluster_size=part.min_partition_size,
                block_rows=build_block))(
                    jax.random.PRNGKey(seed),
                    (transfer_mod.to_device(sample, device=compute_device)
                     if compute_device is not None else _rep(sample)))
            centers = _rep(res.centers)
        else:
            # Huge samples: data-parallel Lloyd iterations over the mesh.
            sample_pad = _round_up(sample_n, n_dev)
            sample_padded = np.zeros((sample_pad, d), np.float32)
            sample_padded[:sample_n] = sample
            x_sharded = jax.device_put(
                jnp.asarray(sample_padded),
                NamedSharding(flat_mesh, P("data", None)))
            centers = jnp.asarray(sample[rng.choice(sample_n, part.num_leaves,
                                                    replace=False)])
            for _ in range(part.training_iterations):
                centers = sharded_kmeans_step(x_sharded, centers, flat_mesh,
                                              valid_rows=sample_n)
            centers = jax.device_put(centers, NamedSharding(flat_mesh, P()))
        _logger.info("sharded build: centers trained (%d leaves) over %d rows",
                     part.num_leaves, n)

        # -- 1b. split oversized partitions ON THE SAMPLE (scaled cap): the
        # streaming contract forbids a full-database pass here; the sample's
        # leaf-size distribution is an unbiased estimate of the database's.
        from scann_tpu.partitioning import kmeans_tree as kt

        @jax.jit
        def _tokenize_only(x, c):
            a, _ = kmeans_ops.assign(x, c, block_rows=build_block)
            return a.astype(jnp.int32)

        cap = max(2.0 * n / max(part.num_leaves, 1), 1024)
        cap_sample = max(int(cap * sample_n / max(n, 1)), 8)
        tokens_s = np.asarray(_tokenize_only(_rep(sample), centers))
        _, centers_np = kt.split_oversized(sample, tokens_s.astype(np.int64),
                                           np.asarray(centers), cap_sample)
        if centers_np.shape[0] != part.num_leaves:
            import dataclasses
            part = dataclasses.replace(part, num_leaves=centers_np.shape[0])
            scann_config = dataclasses.replace(scann_config, partitioning=part)
            centers = _rep(centers_np)
            _logger.info("sharded build: split to %d leaves", part.num_leaves)

        # -- 1c. streaming AVQ centroid refit (single-chip apply_avq parity;
        # reference AvqAccumulator, partitioning/anisotropic.cc:32-87, applied
        # post-tokenization by TokenizeDatabaseWithAvq,
        # tree_x_hybrid_factory.cc:105-156).  The per-leaf sufficient
        # statistics — eta-weighted Gram matrix A, weighted sum b, total
        # weight — are chunk-additive, so ONE extra tokenize-only streaming
        # pass accumulates them without ever holding rows.  Assignment keeps
        # the PRE-refit centers (tokens are fixed before AVQ, exactly like the
        # single-chip build); residuals, rescore rows, and query tokenization
        # all use the refitted centers.
        centers_assign = centers
        if part.avq is not None:
            if not residual:
                raise ValueError("avq requires residual quantization")
            eta = float(part.avq)
            num_l = part.num_leaves
            stats_bytes = num_l * d * d * 4
            if stats_bytes > (1 << 31):
                raise ValueError(
                    f"streaming AVQ statistics need num_leaves*d*d*4 = "
                    f"{stats_bytes} bytes; reduce num_leaves or project first")
            blk = 2048

            # At eta == 1 the reference's AvqAccumulator weights zero-norm
            # members with fillzero = 1 (anisotropic.cc:32-87): zero vectors
            # count toward the mean.  (ADVICE r3.)
            fillzero = 1.0 if eta == 1.0 else 0.0

            @jax.jit
            def _avq_accum(x, c, acc_a, acc_b, acc_tw):
                tokens, _ = kmeans_ops.assign(x, c, block_rows=build_block)
                norms = jnp.linalg.norm(x, axis=-1)
                nz = norms > 1e-20
                w = jnp.where(nz, norms ** (eta - 1.0), fillzero)
                sw = jnp.where(nz, norms ** (0.5 * (eta - 3.0)), 0.0)
                xw = x * sw[:, None]
                m = x.shape[0]
                pad = (-m) % blk
                # Padded rows carry zero weight (and zero xw), so the scatter
                # targets for them are irrelevant.  (With fillzero, w is
                # padded with zeros below, keeping pad rows excluded.)
                xp = jnp.pad(x, ((0, pad), (0, 0)))
                xwp = jnp.pad(xw, ((0, pad), (0, 0)))
                wp = jnp.pad(w, (0, pad))
                tp = jnp.pad(tokens, (0, pad))
                nblk = xp.shape[0] // blk

                def body(carry, args):
                    a_c, b_c, tw_c = carry
                    xb, xwb, wb, tb = args
                    a_c = a_c.at[tb].add(xwb[:, :, None] * xwb[:, None, :])
                    b_c = b_c.at[tb].add(xb * wb[:, None])
                    tw_c = tw_c.at[tb].add(wb)
                    return (a_c, b_c, tw_c), None

                (acc_a, acc_b, acc_tw), _ = jax.lax.scan(
                    body, (acc_a, acc_b, acc_tw),
                    (xp.reshape(nblk, blk, d), xwp.reshape(nblk, blk, d),
                     wp.reshape(nblk, blk), tp.reshape(nblk, blk)))
                return acc_a, acc_b, acc_tw

            @jax.jit
            def _avq_refit(acc_a, acc_b, acc_tw, c_old):
                eye = jnp.eye(d)

                def solve(args):
                    a_l, b_l, tw_l = args
                    a_mat = tw_l * eye + (eta - 1.0) * a_l
                    c_l = eta * jnp.linalg.solve(a_mat, b_l)
                    return jnp.where(tw_l > 0, c_l, jnp.zeros((d,)))

                new = jax.lax.map(solve, (acc_a, acc_b, acc_tw))
                return jnp.where((acc_tw > 0)[:, None], new, c_old)

            acc_a = _rep(jnp.zeros((num_l, d, d), jnp.float32))
            acc_b = _rep(jnp.zeros((num_l, d), jnp.float32))
            acc_tw = _rep(jnp.zeros((num_l,), jnp.float32))
            for rows in chunks_fn():
                rows = _norm(np.asarray(rows, np.float32))
                acc_a, acc_b, acc_tw = _avq_accum(
                    _rep(rows), centers_assign, acc_a, acc_b, acc_tw)
            centers = _rep(
                np.asarray(_avq_refit(acc_a, acc_b, acc_tw,
                                      jnp.asarray(centers))))
            del acc_a, acc_b, acc_tw
            _logger.info("sharded build: AVQ centroid refit applied (eta=%g)",
                         eta)

        # -- 2. AH codebook on sampled residuals + int8 multipliers.
        if sq_mode:
            codebook = None
            model = None
        else:
            @jax.jit
            def _residualize_sample(x, ca, cr):
                a, _ = kmeans_ops.assign(x, ca, block_rows=build_block)
                return (x - jnp.take(cr, a, axis=0)) if residual else x

            resid_sample = _residualize_sample(_rep(sample),
                                               centers_assign, centers)
            model = jax.jit(
                lambda k_, s: ah_ops.train_ah_model(
                    k_, s, ah.dimensions_per_block, ah.clusters_per_block,
                    ah.training_iterations, dims=d,
                    variable_dims_per_block=ah.variable_dims_per_block))(
                jax.random.PRNGKey(seed + 1), resid_sample)
            codebook = model.codebook
            _logger.info("sharded build: AH codebook trained%s",
                         "" if model.block_dims is None
                         else f" (VARIABLE_CHUNK, {model.num_blocks} blocks)")

        if spill is not None:
            spill.save_phase1(
                centers=np.asarray(centers),
                centers_assign=np.asarray(centers_assign),
                codebook=(None if codebook is None
                          else np.asarray(codebook)),
                block_dims=(None if model is None
                            or model.block_dims is None
                            else np.asarray(model.block_dims)),
                dims=np.int64(d), n=np.int64(n),
                num_leaves=np.int64(part.num_leaves))
    else:
        # Resume: phases 1-2 (sample, k-means, split, AVQ, AH
        # codebook) restore from the spill checkpoint; only the
        # encode pass re-runs (and itself resumes mid-pass below).
        d = int(ph["dims"])
        n = int(ph["n"])
        if int(ph["num_leaves"]) != part.num_leaves:
            import dataclasses
            part = dataclasses.replace(
                part, num_leaves=int(ph["num_leaves"]))
            scann_config = dataclasses.replace(scann_config,
                                               partitioning=part)
        centers = _rep(ph["centers"])
        centers_assign = _rep(ph["centers_assign"])
        if sq_mode:
            codebook = None
            model = None
        else:
            bd = ph.get("block_dims")
            model = ah_ops.AHModel(
                codebook=jnp.asarray(ph["codebook"]), dims=d,
                block_dims=None if bd is None else jnp.asarray(bd))
            codebook = model.codebook
        _logger.info("sharded build: resumed trained state from spill "
                     "(%d leaves)", part.num_leaves)

    # -- 3. second streaming pass: tokenize (+SOAR) + encode + compress.
    threshold = (float("nan") if sq_mode
                 else ah.anisotropic_quantization_threshold)
    noise_shaped = not math.isnan(threshold)
    soar_lam = float(soar.lambda_) if soar is not None else 0.0

    def _enc(vecs, x, cb, bd):
        if sq_mode:
            # The sq format has no codes: emit a zero-width placeholder so
            # the streaming plumbing stays shape-uniform.
            del cb, bd
            return jnp.zeros((vecs.shape[0], 0), jnp.uint8)
        m = ah_ops.AHModel(codebook=cb, dims=d,
                           block_dims=None if bd.size == 0 else bd)
        if noise_shaped:
            return ah_ops.encode_noise_shaped(vecs, x, m, threshold)
        return ah_ops.encode(vecs, m)

    def _row_compress(x, c_rows):
        """Residual per-row int8 rescore rows vs the slot's center
        (single-chip residual-reorder parity)."""
        delta = x - c_rows
        m = jnp.max(jnp.abs(delta), axis=-1)
        scale = m / 127.0
        inv = jnp.where(m > 0, 127.0 / jnp.maximum(m, 1e-30), 0.0)
        rows_q = jnp.clip(jnp.round(delta * inv[:, None]), -127, 127
                          ).astype(jnp.int8)
        deq = rows_q.astype(jnp.float32) * scale[:, None] + c_rows
        return rows_q, jnp.sum(deq * deq, axis=-1), scale

    def _te_block(x, ca, cr, cb, bd):
        # ca = assignment centers (pre-AVQ), cr = residual centers (post-
        # AVQ refit); identical arrays when AVQ is off.
        tokens, _ = kmeans_ops.assign(x, ca)
        cprim0 = jnp.take(cr, tokens, axis=0)
        vecs = (x - cprim0) if residual else x
        codes = _enc(vecs, x, cb, bd)
        rows_q, rows_sq, rows_scale = _row_compress(x, cprim0)
        if soar is None:
            return (tokens.astype(jnp.int32), codes, rows_q, rows_sq,
                    rows_scale)
        # SOAR secondary: argmin ||x-c||^2 + lambda ((x-c).r_hat)^2
        # excluding the primary (orthogonality_amplification_utils.h).
        # Assignment geometry uses the pre-AVQ centers, like the
        # single-chip build (SOAR tokenization precedes the AVQ refit).
        cprim = jnp.take(ca, tokens, axis=0)
        r = x - cprim
        rnorm = jnp.linalg.norm(r, axis=-1, keepdims=True)
        r_hat = jnp.where(rnorm < 1e-7, 0.0, r / jnp.maximum(rnorm, 1e-20))
        term1 = dist_ops.squared_l2(x, ca)
        x_dot_r = jnp.sum(x * r_hat, axis=-1, keepdims=True)
        c_dot_r = jax.lax.dot_general(
            r_hat, ca, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        t2 = x_dot_r - c_dot_r
        sdist = term1 + soar_lam * t2 * t2
        sdist = sdist.at[jnp.arange(x.shape[0]), tokens].set(jnp.inf)
        tokens2 = jnp.argmin(sdist, axis=-1).astype(jnp.int32)
        c2_rows = jnp.take(cr, tokens2, axis=0)
        codes2 = _enc(x - c2_rows, x, cb, bd)
        # Secondary slots store residuals vs THEIR OWN center so every
        # slot's rescore bias is q.c_{slot_leaf}.
        rows_q2, rows_sq2, rows_scale2 = _row_compress(x, c2_rows)
        return (tokens.astype(jnp.int32), codes, rows_q, rows_sq,
                rows_scale, tokens2, codes2, rows_q2, rows_sq2,
                rows_scale2)

    @jax.jit
    def _tokenize_encode(x, ca, cr, cb, bd):
        if build_block is None or x.shape[0] <= build_block:
            return _te_block(x, ca, cr, cb, bd)
        # Blocked on the compute chip: the SOAR assignment needs 3-4
        # (rows, num_leaves) f32 intermediates — stream row blocks so
        # peak memory stays ~GB at any chunk size.
        m = x.shape[0]
        pad = (-m) % build_block
        xp = jnp.pad(x, ((0, pad), (0, 0)))
        nb = xp.shape[0] // build_block
        outs = jax.lax.map(
            lambda xb: _te_block(xb, ca, cr, cb, bd),
            xp.reshape(nb, build_block, xp.shape[1]))
        return tuple(
            o.reshape((o.shape[0] * o.shape[1],) + o.shape[2:])[:m]
            for o in outs)

    row_sharding = row_place
    if codebook is None:
        codebook_arg = jnp.zeros((0, 0, 0), jnp.float32)  # jit placeholder
    else:
        codebook_arg = codebook
    # VARIABLE_CHUNK per-block dim table: passed as a (possibly empty)
    # operand rather than a jit closure so its placement follows the
    # compute device like every other build operand.
    block_dims_arg = (jnp.zeros((0, 0), jnp.int32)
                      if model is None or model.block_dims is None
                      else model.block_dims.astype(jnp.int32))
    n_shards = mesh.shape[shard_axis]
    leaves_per_shard = -(-part.num_leaves // n_shards)
    num_blocks_enc = 0 if sq_mode else model.num_blocks
    sink = (spill.encode_sink(dims=d, num_blocks=num_blocks_enc)
            if spill is not None else _MemEncodeSink(n_shards))

    def _append(sh_tokens, sh_codes, sh_rows, sh_sq, sh_scale, dpids):
        owner = sh_tokens // leaves_per_shard
        for sh in range(n_shards):
            sel = np.nonzero(owner == sh)[0]
            if not len(sel):
                continue
            sink.put(sh, codes=sh_codes[sel], leaf=sh_tokens[sel],
                     dpid=dpids[sel], rows=sh_rows[sel], sq=sh_sq[sel],
                     scale=sh_scale[sel])

    row_base = sink.rows_done
    skip_chunks = sink.chunks_done
    if skip_chunks:
        _logger.info("sharded build: resuming encode at chunk %d "
                     "(%d rows already spilled)", skip_chunks, row_base)
    ci = -1
    for rows in chunks_fn():
        ci += 1
        if ci < skip_chunks:
            continue
        rows = _norm(np.asarray(rows, np.float32))
        m_rows = rows.shape[0]
        pad = _round_up(m_rows, n_dev) - m_rows
        if pad:
            rows = np.pad(rows, ((0, pad), (0, 0)))
        if compute_device is not None:
            # Bounded slices: a single ~100 MB device_put WEDGES the
            # tunneled PJRT worker indefinitely (STATUS.md; it survived
            # ~150 chunks of the 100M build before stalling).
            from scann_tpu.utils import transfer
            x_dev = transfer.to_device(rows, device=compute_device)
        else:
            x_dev = jax.device_put(jnp.asarray(rows), row_sharding)
        out = _tokenize_encode(x_dev, centers_assign, centers, codebook_arg,
                               block_dims_arg)
        for o in out:  # overlap the per-array transfer latencies
            o.copy_to_host_async()
        dpids = np.arange(row_base, row_base + m_rows, dtype=np.int32)
        t = np.asarray(out[0][:m_rows])
        _append(t, np.asarray(out[1][:m_rows]), np.asarray(out[2][:m_rows]),
                np.asarray(out[3][:m_rows]), np.asarray(out[4][:m_rows]),
                dpids)
        if soar is not None:
            _append(np.asarray(out[5][:m_rows]),
                    np.asarray(out[6][:m_rows]),
                    np.asarray(out[7][:m_rows]),
                    np.asarray(out[8][:m_rows]),
                    np.asarray(out[9][:m_rows]), dpids)
        row_base += m_rows
        sink.commit(ci + 1, row_base)
    _logger.info("sharded build: %d rows tokenized + encoded", row_base)

    # -- 4. per-shard leaf-sorted layout from the compressed buffers.
    host_parts = sink.layout(part.num_leaves, n_shards, dims=d,
                             num_blocks=num_blocks_enc)
    if model is not None and model.block_dims is not None:
        host_parts["block_dims"] = np.asarray(model.block_dims)
    _logger.info("sharded build: slots laid out over %d shards", n_shards)
    return ShardedTreeAHSearcher(
        scann_config, mesh,
        None if codebook is None else np.asarray(codebook),
        np.asarray(centers), host_parts, shard_axis, data_axis)


class _MemEncodeSink:
    """Default in-memory encode accumulator: per-shard chunk lists,
    concatenated + leaf-sorted by ``_layout_shards_from_parts``."""

    chunks_done = 0
    rows_done = 0

    def __init__(self, n_shards: int):
        self.acc = [{"codes": [], "leaf": [], "dpid": [], "rows": [],
                     "sq": [], "scale": []} for _ in range(n_shards)]

    def put(self, sh, **arrs):
        a = self.acc[sh]
        for k, v in arrs.items():
            a[k].append(v)

    def commit(self, chunks_done: int, rows_done: int):
        pass

    def layout(self, num_leaves, n_shards, dims, num_blocks):
        return _layout_shards_from_parts(self.acc, num_leaves, n_shards,
                                         dims=dims, num_blocks=num_blocks)


# (key, dtype) of the per-slot encode outputs; "codes" has width
# num_blocks (0 in the sq format), "rows" has width dims, the rest are
# scalar per slot.
_SPILL_KEYS = (("codes", np.uint8), ("leaf", np.int32), ("dpid", np.int32),
               ("rows", np.int8), ("sq", np.float32),
               ("scale", np.float32))


class _SpillState:
    """Disk-backed streaming-build state (``spill_dir``).

    Three artifacts make the build O(one chunk) in host RAM and
    resumable after a crash:
      * ``phase1.npz`` — trained centers (+ assignment centers, AH
        codebook, block_dims): phases 1-2 skip entirely on resume;
      * ``enc_s{shard}_{key}.bin`` — append-only encode spill files with
        ``encode_progress.json`` updated atomically after every chunk
        (a crashed encode pass resumes at the last completed chunk; the
        files are truncated to the committed byte counts first);
      * ``layout_{key}.npy`` — the leaf-sorted slot tables as memmaps,
        gathered from the spill files in bounded blocks; the searcher's
        host tables stay disk-backed (the serving copies live in the
        mesh devices' buffers).

    The emitted index is bit-identical to the in-memory build's (same
    append order, same stable leaf sort).  Reference role: ScaNN builds
    entirely in RAM; this is new capability for the sharded TPU engine's
    100M+ axis on bounded-RAM hosts (SURVEY.md §2.10)."""

    def __init__(self, spill_dir: str, n_shards: int):
        self.dir = spill_dir
        self.n_shards = n_shards
        os.makedirs(spill_dir, exist_ok=True)

    def path(self, name: str) -> str:
        return os.path.join(self.dir, name)

    def load_phase1(self):
        p = self.path("phase1.npz")
        if not os.path.exists(p):
            return None
        return dict(np.load(p))

    def save_phase1(self, **arrs):
        # np.savez appends ".npz" when absent — keep the tmp suffix valid.
        tmp = self.path("phase1.tmp.npz")
        np.savez(tmp, **{k: v for k, v in arrs.items() if v is not None})
        os.replace(tmp, self.path("phase1.npz"))

    def encode_sink(self, dims: int, num_blocks: int):
        return _SpillEncodeSink(self, dims, num_blocks)


class _SpillEncodeSink:
    """Append-only disk spill for the encode pass (see _SpillState)."""

    def __init__(self, spill: _SpillState, dims: int, num_blocks: int):
        self.spill = spill
        self.widths = {"codes": num_blocks, "leaf": 1, "dpid": 1,
                       "rows": dims, "sq": 1, "scale": 1}
        self.prog_path = spill.path("encode_progress.json")
        self.chunks_done = 0
        self.rows_done = 0
        self.counts = [0] * spill.n_shards
        if os.path.exists(self.prog_path):
            with open(self.prog_path) as f:
                prog = json.load(f)
            self.chunks_done = int(prog["chunks_done"])
            self.rows_done = int(prog["rows_done"])
            self.counts = [int(c) for c in prog["counts"]]
        self.files = {}
        for sh in range(spill.n_shards):
            for key, dt in _SPILL_KEYS:
                if self.widths[key] == 0:
                    continue
                p = spill.path(f"enc_s{sh}_{key}.bin")
                want = (self.counts[sh] * self.widths[key]
                        * np.dtype(dt).itemsize)
                if os.path.exists(p):
                    if os.path.getsize(p) < want:
                        raise ValueError(
                            f"spill file {p} is shorter than its progress "
                            f"record ({os.path.getsize(p)} < {want} "
                            f"bytes); the spill dir is corrupt — delete "
                            f"it and rebuild")
                    # A crash between file writes and the progress commit
                    # leaves a partial chunk tail: drop it.
                    os.truncate(p, want)
                elif want:
                    raise ValueError(
                        f"spill file {p} is missing but progress records "
                        f"{want} bytes; delete the spill dir and rebuild")
                else:
                    open(p, "wb").close()
                self.files[(sh, key)] = open(p, "ab")

    def put(self, sh, **arrs):
        self.counts[sh] += len(arrs["leaf"])
        for key, dt in _SPILL_KEYS:
            if self.widths[key] == 0:
                continue
            self.files[(sh, key)].write(
                np.ascontiguousarray(arrs[key], dtype=dt).tobytes())

    def commit(self, chunks_done: int, rows_done: int):
        for f in self.files.values():
            f.flush()
        tmp = self.prog_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"chunks_done": chunks_done, "rows_done": rows_done,
                       "counts": self.counts}, f)
        os.replace(tmp, self.prog_path)
        self.chunks_done = chunks_done
        self.rows_done = rows_done

    def layout(self, num_leaves, n_shards, dims, num_blocks):
        for f in self.files.values():
            f.close()
        self.files = {}
        counts = self.counts
        max_slots = max(max(counts), 1)
        chunk = min(65536, _round_up(max(max_slots, 128), 128))
        slots_padded = _round_up(max(max_slots, chunk), chunk)
        out_name = {"codes": "codes", "leaf": "slot_leaf",
                    "dpid": "slot_dpid", "rows": "rows_i8",
                    "sq": "rows_sq", "scale": "rows_scale"}
        dst = {}
        for key, dt in _SPILL_KEYS:
            w = self.widths[key]
            if key == "codes" and w == 0:
                dst[key] = np.zeros((n_shards, slots_padded, 0), dt)
                continue
            shape = ((n_shards, slots_padded) if key not in
                     ("codes", "rows") else (n_shards, slots_padded, w))
            mm = np.lib.format.open_memmap(
                self.spill.path(f"layout_{key}.npy"), mode="w+",
                dtype=dt, shape=shape)
            if key == "dpid":
                mm[:] = -1  # open_memmap zero-fills; dead slots are -1
            dst[key] = mm
        for sh in range(n_shards):
            m = counts[sh]
            if m == 0:
                continue
            leaf = np.fromfile(self.spill.path(f"enc_s{sh}_leaf.bin"),
                               dtype=np.int32, count=m)
            order = np.argsort(leaf, kind="stable")
            for key, dt in _SPILL_KEYS:
                w = self.widths[key]
                if key == "codes" and w == 0:
                    continue
                src = np.memmap(
                    self.spill.path(f"enc_s{sh}_{key}.bin"), dtype=dt,
                    mode="r",
                    shape=(m,) if key not in ("codes", "rows")
                    else (m, w))
                # Bounded gather blocks: ~128 MB of sorted rows at a
                # time through the page cache.
                blk = max((1 << 27) // max(w * np.dtype(dt).itemsize, 1),
                          1)
                for s in range(0, m, blk):
                    sel = order[s:s + blk]
                    dst[key][sh, s:s + len(sel)] = src[sel]
                del src
        host_parts = {}
        for key, _ in _SPILL_KEYS:
            if hasattr(dst[key], "flush"):
                dst[key].flush()
            host_parts[out_name[key]] = dst[key]
        host_parts.update(num_leaves=num_leaves, dims=dims, chunk=chunk)
        return host_parts


def _layout_shards_from_parts(acc, num_leaves: int, n_shards: int,
                              dims: int, num_blocks: int) -> dict:
    """Concatenate per-shard compressed buffers, leaf-sort within each
    shard, pad to a common chunk-aligned size."""
    parts = []
    for i in range(len(acc)):
        a = acc[i]
        if a["codes"]:
            part = {}
            for k in list(a):
                part[k] = np.concatenate(a[k], axis=0)
                a[k] = None  # free chunk buffers as we go (100M peak RAM)
            parts.append(part)
        else:
            parts.append({"codes": np.zeros((0, num_blocks), np.uint8),
                          "leaf": np.zeros((0,), np.int32),
                          "dpid": np.zeros((0,), np.int32),
                          "rows": np.zeros((0, dims), np.int8),
                          "sq": np.zeros((0,), np.float32),
                          "scale": np.zeros((0,), np.float32)})
        acc[i] = None
    max_slots = max((len(p["leaf"]) for p in parts), default=1)
    chunk = min(65536, _round_up(max(max_slots, 128), 128))
    slots_padded = _round_up(max(max_slots, chunk), chunk)
    sh_codes = np.zeros((n_shards, slots_padded, num_blocks), np.uint8)
    sh_leaf = np.zeros((n_shards, slots_padded), np.int32)
    sh_dpid = np.full((n_shards, slots_padded), -1, np.int32)
    sh_rows = np.zeros((n_shards, slots_padded, dims), np.int8)
    sh_sq = np.zeros((n_shards, slots_padded), np.float32)
    sh_scale = np.zeros((n_shards, slots_padded), np.float32)
    for sh, p in enumerate(parts):
        order = np.argsort(p["leaf"], kind="stable")
        m = len(order)
        for key, dst in (("codes", sh_codes), ("leaf", sh_leaf),
                         ("dpid", sh_dpid), ("rows", sh_rows),
                         ("sq", sh_sq), ("scale", sh_scale)):
            dst[sh, :m] = p[key][order]
            p[key] = None
        parts[sh] = None
    return {"codes": sh_codes, "slot_leaf": sh_leaf, "slot_dpid": sh_dpid,
            "rows_i8": sh_rows, "rows_sq": sh_sq, "rows_scale": sh_scale,
            "num_leaves": num_leaves, "dims": dims, "chunk": chunk}


def _layout_shards(codes: np.ndarray, slot_leaf: np.ndarray,
                   slot_dpid: np.ndarray, database: np.ndarray,
                   num_leaves: int, n_shards: int, dims: int,
                   centers: np.ndarray, absolute_rows: bool = False) -> dict:
    """Group live slots of a resident index into leaf-owner shards
    (from_searcher path): residual-compress rescore rows per slot, then
    defer to the compressed-parts layout.

    ``absolute_rows``: store int8 of the raw row instead of the residual
    vs its leaf center — required for projected indexes, whose centers
    live in the projected space while the rescore stays in the original
    space (no q.c bias term at query time)."""
    valid = np.nonzero(slot_dpid >= 0)[0]
    centers = np.asarray(centers, np.float32)
    leaves_per_shard = -(-num_leaves // n_shards)
    acc = [{"codes": [], "leaf": [], "dpid": [], "rows": [], "sq": [],
            "scale": []}
           for _ in range(n_shards)]
    step = 1 << 18
    for s in range(0, len(valid), step):
        sel = valid[s:s + step]
        rows = database[slot_dpid[sel]]
        c_rows = (np.zeros_like(rows) if absolute_rows
                  else centers[slot_leaf[sel]])
        delta = rows - c_rows
        m = np.abs(delta).max(axis=1)
        scale = (m / 127.0).astype(np.float32)
        inv = np.where(m > 0, 127.0 / np.maximum(m, 1e-30), 0.0)
        q = np.clip(np.round(delta * inv[:, None]), -127, 127
                    ).astype(np.int8)
        deq = q.astype(np.float32) * scale[:, None] + c_rows
        sq = (deq * deq).sum(axis=1)
        owner = slot_leaf[sel] // leaves_per_shard
        for sh in range(n_shards):
            pick = np.nonzero(owner == sh)[0]
            if not len(pick):
                continue
            a = acc[sh]
            a["codes"].append(codes[sel[pick]])
            a["leaf"].append(slot_leaf[sel[pick]].astype(np.int32))
            a["dpid"].append(slot_dpid[sel[pick]].astype(np.int32))
            a["rows"].append(q[pick])
            a["sq"].append(sq[pick])
            a["scale"].append(scale[pick])
    parts = _layout_shards_from_parts(acc, num_leaves, n_shards, dims=dims,
                                      num_blocks=codes.shape[1])
    parts["absolute_rows"] = absolute_rows
    return parts


def _dedup_slots(vals, dpids, slots):
    """Per-row duplicate suppression keeping best score, preserving the
    slot mapping (SOAR, DeduplicateDatabaseSpilledResults)."""
    order1 = jnp.argsort(-vals, axis=-1, stable=True)
    v = jnp.take_along_axis(vals, order1, axis=-1)
    d = jnp.take_along_axis(dpids, order1, axis=-1)
    sl = jnp.take_along_axis(slots, order1, axis=-1)
    order2 = jnp.argsort(d, axis=-1, stable=True)
    v = jnp.take_along_axis(v, order2, axis=-1)
    d = jnp.take_along_axis(d, order2, axis=-1)
    sl = jnp.take_along_axis(sl, order2, axis=-1)
    dup = jnp.concatenate(
        [jnp.zeros_like(d[..., :1], dtype=bool),
         d[..., 1:] == d[..., :-1]], axis=-1)
    dup = jnp.logical_or(dup, d == -1)
    v = jnp.where(dup, -jnp.inf, v)
    d = jnp.where(dup, -1, d)
    sl = jnp.where(dup, -1, sl)
    return v, d, sl


def sharded_kmeans_step(x_sharded, centers, mesh, data_axis: str = "data",
                        valid_rows: Optional[int] = None):
    """One data-parallel Lloyd iteration: local assignment + psum of
    (sums, counts) over the data axis.  valid_rows masks zero-padding at
    the tail of the (padded) global row count."""
    k = centers.shape[0]
    n_total = x_sharded.shape[0]
    n_dev = mesh.shape[data_axis]
    local_n = n_total // n_dev

    def step(x, c):
        c_sq = jnp.sum(c * c, axis=-1)
        dots = jax.lax.dot_general(
            x, c, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        a = jnp.argmin(c_sq[None, :] - 2.0 * dots, axis=-1)
        w = jnp.ones((x.shape[0],), jnp.float32)
        if valid_rows is not None:
            dev = jax.lax.axis_index(data_axis)
            global_row = dev * local_n + jnp.arange(x.shape[0])
            w = (global_row < valid_rows).astype(jnp.float32)
        sums = jax.ops.segment_sum(x * w[:, None], a, num_segments=k)
        counts = jax.ops.segment_sum(w, a, num_segments=k)
        sums = jax.lax.psum(sums, data_axis)
        counts = jax.lax.psum(counts, data_axis)
        new_c = sums / jnp.maximum(counts, 1.0)[:, None]
        return jnp.where((counts > 0)[:, None], new_c, c)

    fn = jax.shard_map(step, mesh=mesh,
                       in_specs=(P(data_axis, None), P()),
                       out_specs=P(),
                       check_vma=False)
    return jax.jit(fn)(x_sharded, centers)
