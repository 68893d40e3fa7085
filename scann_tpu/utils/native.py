"""ctypes bindings for the native host runtime (scann_tpu/cc/native.cc).

Compiled on first use with g++ (-O3 -march=native) and cached next to the
source; every function has a numpy fallback so the framework works without a
toolchain.  This is the TPU build's equivalent of the reference's host-side
C++ layer (PackedDataset packing, leaf-major layout): device compute stays
in XLA/Pallas, host memory-layout work stays native.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _src_dir():
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "cc")


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        src = os.path.join(_src_dir(), "native.cc")
        so = os.path.join(_src_dir(), "libscann_native.so")
        try:
            if (not os.path.exists(so)
                    or os.path.getmtime(so) < os.path.getmtime(src)):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-o", so, src],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(so)
        except (OSError, subprocess.CalledProcessError):
            _LIB = None
            return None
        i64 = ctypes.c_int64
        p = ctypes.POINTER
        lib.scann_pack4.argtypes = [p(ctypes.c_int8), p(ctypes.c_uint8),
                                    i64, i64]
        lib.scann_unpack4.argtypes = [p(ctypes.c_uint8), p(ctypes.c_int8),
                                      i64, i64]
        lib.scann_sort_by_leaf.argtypes = [p(ctypes.c_int32), i64, i64,
                                           p(ctypes.c_int64),
                                           p(ctypes.c_int64)]
        lib.scann_gather_rows_i8.argtypes = [p(ctypes.c_int8),
                                             p(ctypes.c_int64),
                                             p(ctypes.c_int8), i64, i64]
        lib.scann_gather_i32.argtypes = [p(ctypes.c_int32),
                                         p(ctypes.c_int64),
                                         p(ctypes.c_int32), i64]
        f32 = ctypes.c_float
        lib.scann_sparse_rescore.argtypes = [
            p(ctypes.c_int64), p(ctypes.c_int64), p(f32),
            p(ctypes.c_int64), p(ctypes.c_int64), p(f32),
            p(ctypes.c_int32), i64, i64, p(f32)]
        _LIB = lib
        return lib


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def have_native() -> bool:
    return _load() is not None


def pack4(codes: np.ndarray) -> np.ndarray:
    """(n, B) codes in [0,16) -> (n, ceil(B/2)) uint8, two per byte
    (reference 4-bit pair packing, querying.h:73-105)."""
    codes = np.ascontiguousarray(codes).view(np.int8) \
        if codes.dtype == np.uint8 else np.ascontiguousarray(codes, np.int8)
    n, b = codes.shape
    if b % 2:
        codes = np.pad(codes, ((0, 0), (0, 1)))
        b += 1
    lib = _load()
    if lib is not None:
        out = np.empty((n, b // 2), np.uint8)
        lib.scann_pack4(_ptr(codes, ctypes.c_int8),
                        _ptr(out, ctypes.c_uint8), n, b)
        return out
    lo = codes[:, 0::2].astype(np.uint8) & 0x0F
    hi = (codes[:, 1::2].astype(np.uint8) & 0x0F) << 4
    return lo | hi


def unpack4(packed: np.ndarray, blocks: int) -> np.ndarray:
    """Inverse of pack4; returns (n, blocks) int8."""
    packed = np.ascontiguousarray(packed, np.uint8)
    n = packed.shape[0]
    b2 = packed.shape[1] * 2
    lib = _load()
    if lib is not None:
        out = np.empty((n, b2), np.int8)
        lib.scann_unpack4(_ptr(packed, ctypes.c_uint8),
                          _ptr(out, ctypes.c_int8), n, b2)
        return out[:, :blocks]
    out = np.empty((n, b2), np.int8)
    out[:, 0::2] = (packed & 0x0F).astype(np.int8)
    out[:, 1::2] = (packed >> 4).astype(np.int8)
    return out[:, :blocks]


def sort_by_leaf(leaf: np.ndarray, num_leaves: int):
    """Stable counting sort: returns (order int64, per-leaf sizes int64)."""
    leaf = np.ascontiguousarray(leaf, np.int32)
    n = leaf.shape[0]
    lib = _load()
    if lib is not None:
        order = np.empty(n, np.int64)
        counts = np.empty(num_leaves, np.int64)
        lib.scann_sort_by_leaf(_ptr(leaf, ctypes.c_int32), n, num_leaves,
                               _ptr(order, ctypes.c_int64),
                               _ptr(counts, ctypes.c_int64))
        return order, counts
    order = np.argsort(leaf, kind="stable")
    counts = np.bincount(leaf, minlength=num_leaves).astype(np.int64)
    return order, counts


def gather_rows_i8(src: np.ndarray, order: np.ndarray) -> np.ndarray:
    out_dtype = src.dtype
    src = (np.ascontiguousarray(src).view(np.int8)
           if src.dtype == np.uint8 else np.ascontiguousarray(src, np.int8))
    order = np.ascontiguousarray(order, np.int64)
    lib = _load()
    if lib is not None:
        out = np.empty((order.shape[0], src.shape[1]), np.int8)
        lib.scann_gather_rows_i8(_ptr(src, ctypes.c_int8),
                                 _ptr(order, ctypes.c_int64),
                                 _ptr(out, ctypes.c_int8),
                                 order.shape[0], src.shape[1])
        return out.view(out_dtype)
    return src[order].view(out_dtype)


def sparse_rescore(q_indptr, q_indices, q_values, db_indptr, db_indices,
                   db_values, cand):
    """Exact sparse dot products of per-query candidate lists (native
    two-pointer merge over sorted CSR rows; numpy fallback).  cand: (nq, k)
    int32, entries < 0 -> -inf."""
    lib = _load()
    cand = np.ascontiguousarray(cand, np.int32)
    nq, k = cand.shape
    out = np.empty((nq, k), np.float32)
    if lib is not None:
        c = np.ctypeslib.as_ctypes
        qi = np.ascontiguousarray(q_indptr, np.int64)
        qx = np.ascontiguousarray(q_indices, np.int64)
        qv = np.ascontiguousarray(q_values, np.float32)
        di = np.ascontiguousarray(db_indptr, np.int64)
        dx = np.ascontiguousarray(db_indices, np.int64)
        dv = np.ascontiguousarray(db_values, np.float32)
        lib.scann_sparse_rescore(
            qi.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            qx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            qv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            di.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            dx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            dv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            cand.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            nq, k, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out
    # numpy fallback (two-pointer logic vectorized per pair is awkward;
    # dict-merge per query is fine at fallback scale)
    out.fill(-np.inf)
    for q in range(nq):
        s, e = q_indptr[q], q_indptr[q + 1]
        qmap = dict(zip(q_indices[s:e].tolist(), q_values[s:e].tolist()))
        for j, dp in enumerate(cand[q]):
            if dp < 0:
                continue
            rs, re = db_indptr[dp], db_indptr[dp + 1]
            acc = 0.0
            for cidx, v in zip(db_indices[rs:re].tolist(),
                               db_values[rs:re].tolist()):
                if cidx in qmap:
                    acc += qmap[cidx] * v
            out[q, j] = acc
    return out
