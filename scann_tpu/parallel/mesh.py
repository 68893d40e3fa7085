"""Multi-chip sharded search over a jax.sharding.Mesh.

This layer has no reference equivalent: the reference is single-machine
(SURVEY.md §2.10) and scales out only by whole-index replication behind
TF-Serving.  Here a large index shards its *leaves* across an ICI mesh axis
("shard") while query batches shard across a data axis ("data"):

  * centers (a few MB) are replicated; every device tokenizes its query
    shard against all centers.
  * each device scores only the leaf slots it owns (a contiguous leaf
    range), using the same masked dense-chunk scan as single-chip tree-AH.
  * each device exactly rescores its own local candidates (the reordering
    dataset is sharded with the leaves, so no cross-device row gathers).
  * per-device top-k candidate lists all_gather over the shard axis and a
    final static top-k merges them — the only cross-chip communication is
    (k_pre * shards) candidate pairs per query, riding ICI.

Every candidate the single-chip searcher would rescore is also rescored here
(the global AH top-k_pre is a subset of the union of per-shard top-k_pre),
so sharded recall is >= single-chip recall; results can differ only where
the wider per-shard candidate pool surfaces a strictly better neighbor.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scann_tpu.models import tree_ah as tree_ah_mod
from scann_tpu.ops import ah as ah_ops
from scann_tpu.ops import distance as dist_ops
from scann_tpu.ops import lut16 as lut16_ops
from scann_tpu.ops import topk as topk_ops


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class ShardedTreeAHSearcher:
    """Leaf-sharded tree-AH searcher; built from a single-host index."""

    def __init__(self, searcher: tree_ah_mod.TreeAHSearcher,
                 database: np.ndarray, mesh: Mesh,
                 shard_axis: str = "shard", data_axis: str = "data"):
        if searcher.partitioner is None:
            raise ValueError("sharded search requires a partitioned index")
        self.mesh = mesh
        self.shard_axis = shard_axis
        self.data_axis = data_axis
        self.n_shards = mesh.shape[shard_axis]
        self.n_data = mesh.shape[data_axis]
        self.searcher = searcher
        self.config = searcher.config
        self.measure = searcher.measure
        self.model = searcher.model
        self.part_cfg = searcher.part_cfg
        self.ah_cfg = searcher.ah_cfg
        self._compiled = {}
        self._shard_index(searcher, database)

    # -------------------------------------------------------------- build
    def _shard_index(self, s: tree_ah_mod.TreeAHSearcher,
                     database: np.ndarray):
        """Repartition the leaf-sorted slot arrays into equal-size
        contiguous-leaf shards (leaves assigned round-robin by contiguous
        range: owner(leaf) = leaf // ceil(L / n_shards))."""
        num_leaves = s.partitioner.num_leaves
        leaves_per_shard = -(-num_leaves // self.n_shards)
        codes = np.asarray(s.index.codes)
        slot_leaf = np.asarray(s.index.slot_leaf)
        slot_dpid = np.asarray(s.index.slot_dpid)
        valid = slot_dpid >= 0
        owner = np.where(valid, slot_leaf // leaves_per_shard, -1)

        per_shard = []
        max_slots = 0
        for sh in range(self.n_shards):
            sel = np.nonzero(owner == sh)[0]
            per_shard.append(sel)
            max_slots = max(max_slots, len(sel))
        chunk = min(65536, _round_up(max(max_slots, 128), 128))
        slots_padded = _round_up(max(max_slots, chunk), chunk)
        self._shard_chunk = chunk
        self._shard_slots = slots_padded

        b = codes.shape[1]
        # uint8 to match TreeAHIndex.codes: lut256 codes 128-255 would wrap
        # negative as int8 and never match the one-hot iota.
        sh_codes = np.zeros((self.n_shards, slots_padded, b), np.uint8)
        sh_leaf = np.zeros((self.n_shards, slots_padded), np.int32)
        sh_dpid = np.full((self.n_shards, slots_padded), -1, np.int32)
        d = database.shape[1]
        sh_rows = np.zeros((self.n_shards, slots_padded, d), np.float32)
        for sh, sel in enumerate(per_shard):
            m = len(sel)
            sh_codes[sh, :m] = codes[sel]
            sh_leaf[sh, :m] = slot_leaf[sel]
            sh_dpid[sh, :m] = slot_dpid[sel]
            sh_rows[sh, :m] = database[slot_dpid[sel]]

        mesh = self.mesh
        shard_spec3 = NamedSharding(mesh, P(self.shard_axis, None, None))
        shard_spec2 = NamedSharding(mesh, P(self.shard_axis, None))
        repl = NamedSharding(mesh, P())
        dev = functools.partial(jax.device_put)
        self.state = {
            "codes": dev(jnp.asarray(sh_codes), shard_spec3),
            "slot_leaf": dev(jnp.asarray(sh_leaf), shard_spec2),
            "slot_dpid": dev(jnp.asarray(sh_dpid), shard_spec2),
            "rows": dev(jnp.asarray(sh_rows), shard_spec3),
            "codebook": dev(self.model.codebook, repl),
            "centers": dev(s.partitioner.centers, repl),
        }

    # -------------------------------------------------------------- query
    def _search_fn(self, k: int, k_pre: int, leaves: int):
        measure = self.measure
        model_dims = self.model.dims
        cpb = self.ah_cfg.clusters_per_block
        num_leaves = self.searcher.partitioner.num_leaves
        leaves = max(1, min(leaves, num_leaves))
        residual = self.searcher.residual
        soar = self.part_cfg.soar if self.part_cfg else None
        lookup = self.ah_cfg.lookup_type
        chunk = self._shard_chunk
        slots = self._shard_slots
        k_fetch = int(math.ceil(k_pre * soar.overretrieve_factor)
                      ) if soar is not None else k_pre
        k_fetch = min(k_fetch, slots)
        shard_axis, data_axis = self.shard_axis, self.data_axis

        def local_step(queries, codes, slot_leaf, slot_dpid, rows, codebook,
                       centers):
            # queries: (q_local, d); codes: (1, S, B) local shard block.
            codes = codes[0]
            slot_leaf = slot_leaf[0]
            slot_dpid = slot_dpid[0]
            rows = rows[0]
            model = ah_ops.AHModel(codebook=codebook, dims=model_dims)
            luts = ah_ops.build_luts(queries, model, measure, lookup)
            nq = queries.shape[0]
            sims_qc = dist_ops.similarity(
                queries, centers, measure,
                precision=jax.lax.Precision.DEFAULT)
            center_sims, leaf_ids = jax.lax.top_k(sims_qc, leaves)
            riota = jnp.arange(nq)[:, None]
            mask_dense = jnp.zeros((nq, num_leaves), bool
                                   ).at[riota, leaf_ids].set(True)
            bias_dense = None
            if residual:
                bias_dense = jnp.zeros((nq, num_leaves), jnp.float32
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
            # Exact local rescore on this shard's rows (reordering).
            exact = dist_ops.one_to_many_gathered(
                queries, rows, jnp.maximum(lslots, 0), measure)
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
            kk = min(k, g_vals.shape[-1])
            vals_k, posk = jax.lax.top_k(g_vals, kk)
            ids_k = jnp.take_along_axis(g_ids, posk, axis=-1)
            ids_k = jnp.where(jnp.isneginf(vals_k), -1, ids_k)
            dist = dist_ops.similarity_to_user_distance(vals_k, measure)
            return ids_k, dist

        mesh = self.mesh
        in_specs = (P(data_axis, None),  # queries
                    P(shard_axis, None, None),  # codes
                    P(shard_axis, None),  # slot_leaf
                    P(shard_axis, None),  # slot_dpid
                    P(shard_axis, None, None),  # rows
                    P(),  # codebook
                    P())  # centers
        out_specs = (P(data_axis, None), P(data_axis, None))
        return jax.jit(jax.shard_map(local_step, mesh=mesh,
                                     in_specs=in_specs,
                                     out_specs=out_specs,
                                     check_vma=False))

    def search_batched(self, queries, final_num_neighbors=None,
                       pre_reorder_num_neighbors=None, leaves_to_search=None):
        s = self.searcher
        k, k_pre, leaves = s._resolve_params(
            final_num_neighbors, pre_reorder_num_neighbors, leaves_to_search)
        queries = np.asarray(queries, np.float32)
        nq = queries.shape[0]
        bucket = _round_up(max(nq, self.n_data), self.n_data)
        padded = np.zeros((bucket, queries.shape[1]), np.float32)
        padded[:nq] = queries
        key = (bucket, k, k_pre, leaves)
        fn = self._compiled.get(key)
        if fn is None:
            fn = self._search_fn(k, k_pre, leaves)
            self._compiled[key] = fn
        st = self.state
        q_dev = jax.device_put(
            jnp.asarray(padded),
            NamedSharding(self.mesh, P(self.data_axis, None)))
        idx, dist = fn(q_dev, st["codes"], st["slot_leaf"], st["slot_dpid"],
                       st["rows"], st["codebook"], st["centers"])
        return np.asarray(idx)[:nq], np.asarray(dist)[:nq]


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


def sharded_kmeans_step(x_sharded, centers, mesh, data_axis: str = "data"):
    """One data-parallel Lloyd iteration: local assignment + psum of
    (sums, counts) over the data axis.  The building block for sharded
    index *construction* at 100M-vector scale."""
    k = centers.shape[0]

    def step(x, c):
        c_sq = jnp.sum(c * c, axis=-1)
        dots = jax.lax.dot_general(
            x, c, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        a = jnp.argmin(c_sq[None, :] - 2.0 * dots, axis=-1)
        sums = jax.ops.segment_sum(x, a, num_segments=k)
        counts = jax.ops.segment_sum(jnp.ones((x.shape[0],), jnp.float32),
                                     a, num_segments=k)
        sums = jax.lax.psum(sums, data_axis)
        counts = jax.lax.psum(counts, data_axis)
        new_c = sums / jnp.maximum(counts, 1.0)[:, None]
        return jnp.where((counts > 0)[:, None], new_c, c)

    fn = jax.shard_map(step, mesh=mesh,
                       in_specs=(P(data_axis, None), P()),
                       out_specs=P(),
                       check_vma=False)
    return jax.jit(fn)(x_sharded, centers)
