"""Disk-backed (spill_dir) streaming sharded builds: bit parity with the
in-memory build, and crash-resume from the last completed encode chunk.

The spill path keeps the build's host RAM at O(one chunk) for the
100M+ axis on bounded-RAM hosts (SURVEY.md §2.10; the reference builds
entirely in RAM — scann_ops/cc/scann.cc builds from a resident
ConstDataSetWrapper)."""

import numpy as np
import jax
import pytest

import scann_tpu
from scann_tpu.parallel import mesh as mesh_mod
from jax.sharding import Mesh


def make_mesh(data=2, shard=4):
    devs = np.array(jax.devices()[:data * shard]).reshape(data, shard)
    return Mesh(devs, ("data", "shard"))


N_CHUNKS, CHUNK_ROWS, D = 4, 3000, 32


def make_chunk(ci, topics):
    r = np.random.default_rng(700 + ci)
    x = (topics[r.integers(0, len(topics), CHUNK_ROWS)]
         + 0.1 * r.standard_normal((CHUNK_ROWS, D)).astype(np.float32))
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.fixture
def topics():
    rng = np.random.default_rng(31)
    t = rng.standard_normal((200, D)).astype(np.float32)
    return t / np.linalg.norm(t, axis=1, keepdims=True)


def chunks_fn(topics):
    def chunks():
        for ci in range(N_CHUNKS):
            yield make_chunk(ci, topics)
    return chunks


def make_config(fmt):
    b = (scann_tpu.builder(np.zeros((1, D), np.float32), 10, "dot_product")
         .tree(num_leaves=16, num_leaves_to_search=8,
               training_sample_size=4000, random_init=False,
               soar_lambda=1.5))
    if fmt == "sq":
        b = b.score_brute_force(quantize="int8")
    else:
        b = b.score_ah(2, anisotropic_quantization_threshold=0.2)
    return b.create_config()


def assert_same_index(ss_a, ss_b):
    for key in ("slot_leaf", "slot_dpid", "rows_i8", "rows_sq",
                "rows_scale", "codes"):
        np.testing.assert_array_equal(np.asarray(ss_a._host_parts[key]),
                                      np.asarray(ss_b._host_parts[key]),
                                      err_msg=key)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("fmt", ["sq", "ah"])
def test_spill_build_bit_parity(tmp_path, fmt, topics):
    """spill_dir build emits a bit-identical index (same append order,
    same stable leaf sort) and identical search results."""
    cfg_ = make_config(fmt)
    m = make_mesh()
    ss_mem = mesh_mod.build_sharded_streaming(chunks_fn(topics), cfg_, m)
    ss_spill = mesh_mod.build_sharded_streaming(
        chunks_fn(topics), cfg_, m, spill_dir=str(tmp_path / "spill"))
    assert_same_index(ss_mem, ss_spill)
    q = make_chunk(99, topics)[:16]
    i1, d1 = ss_mem.search_batched(q)
    i2, d2 = ss_spill.search_batched(q)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    # The spill dir holds the resumable state: phase checkpoint +
    # progress + memmap layout.
    assert (tmp_path / "spill" / "phase1.npz").exists()
    assert (tmp_path / "spill" / "encode_progress.json").exists()
    assert (tmp_path / "spill" / "layout_rows.npy").exists()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_spill_build_crash_resume(tmp_path, topics):
    """A build killed mid-encode resumes from the last completed chunk
    (phases 1-2 restore from phase1.npz; spilled chunks are not
    re-encoded) and still emits the bit-identical index."""
    cfg_ = make_config("sq")
    m = make_mesh()
    spill = str(tmp_path / "spill")

    calls = {"n": 0}

    def crashing_chunks():
        calls["n"] += 1
        gen = calls["n"]

        def gen_chunks():
            for ci in range(N_CHUNKS):
                # Generation 1 = reservoir-sample pass (must complete so
                # phase 1/2 checkpoint); generation 2 = encode pass —
                # die after chunk 2 spilled.
                if gen == 2 and ci == 2:
                    raise RuntimeError("simulated crash mid-encode")
                yield make_chunk(ci, topics)
        return gen_chunks()

    with pytest.raises(RuntimeError, match="simulated crash"):
        mesh_mod.build_sharded_streaming(crashing_chunks, cfg_, m,
                                         spill_dir=spill)
    import json
    import os
    with open(os.path.join(spill, "encode_progress.json")) as f:
        prog = json.load(f)
    assert prog["chunks_done"] == 2
    assert prog["rows_done"] == 2 * CHUNK_ROWS

    # Relaunch with the same spill dir: resumes at chunk 2.
    ss = mesh_mod.build_sharded_streaming(chunks_fn(topics), cfg_, m,
                                          spill_dir=spill)
    n = N_CHUNKS * CHUNK_ROWS
    assert (np.asarray(ss._host_parts["slot_dpid"]) >= 0).sum() == 2 * n

    ss_mem = mesh_mod.build_sharded_streaming(chunks_fn(topics), cfg_, m)
    assert_same_index(ss_mem, ss)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_spill_partial_chunk_truncated(tmp_path, topics):
    """A crash BETWEEN file writes and the progress commit leaves a
    partial chunk tail in the spill files; resume truncates it."""
    cfg_ = make_config("sq")
    m = make_mesh()
    spill = str(tmp_path / "spill")
    with pytest.raises(RuntimeError):
        orig_commit = mesh_mod._SpillEncodeSink.commit

        def crashing_commit(self, chunks_done, rows_done):
            if chunks_done == 2:
                raise RuntimeError("crash before commit")
            return orig_commit(self, chunks_done, rows_done)

        mesh_mod._SpillEncodeSink.commit = crashing_commit
        try:
            mesh_mod.build_sharded_streaming(chunks_fn(topics), cfg_, m,
                                             spill_dir=spill)
        finally:
            mesh_mod._SpillEncodeSink.commit = orig_commit
    # chunk 2's bytes are in the files but only chunk 1 committed.
    import json
    import os
    with open(os.path.join(spill, "encode_progress.json")) as f:
        assert json.load(f)["chunks_done"] == 1
    ss = mesh_mod.build_sharded_streaming(chunks_fn(topics), cfg_, m,
                                          spill_dir=spill)
    ss_mem = mesh_mod.build_sharded_streaming(chunks_fn(topics), cfg_, m)
    assert_same_index(ss_mem, ss)
