"""Chunked host->device transfers.

Large single `jnp.asarray` uploads are fragile on tunneled/remote TPU
links: transfers beyond a few hundred MB can stall the PJRT worker
indefinitely (observed on the axon tunnel: a 473 MB upload never
completes and wedges the worker, while <=64 MB slices sustain ~60 MB/s).
``to_device`` moves an array in bounded slices with a sync per slice —
bounded in-flight data, observable progress, and a failed slice surfaces
as an exception instead of an unbounded hang.

On a local PCIe-attached TPU the slicing costs one extra device-side
concatenate; set SCANN_TPU_TRANSFER_CHUNK_MB=0 to disable.
"""

from __future__ import annotations

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

_logger = logging.getLogger("scann_tpu")

_CHUNK_MB = float(os.environ.get("SCANN_TPU_TRANSFER_CHUNK_MB", "24"))


def to_device(x, dtype=jnp.float32, device=None):
    """Upload ``x`` to ``device`` (default device if None) in bounded
    slices.

    Device arrays pass through (no copy).  Returns a single contiguous
    device array.
    """
    def _put(a):
        return jnp.asarray(a) if device is None else jax.device_put(
            jnp.asarray(a), device)

    if isinstance(x, jax.Array):
        return x.astype(dtype) if x.dtype != dtype else x
    x = np.asarray(x, dtype)
    if _CHUNK_MB <= 0 or x.ndim == 0:
        return _put(x)
    row_bytes = max(int(x.itemsize * np.prod(x.shape[1:], dtype=np.int64)),
                    1)
    rows_per = max(int(_CHUNK_MB * (1 << 20)) // row_bytes, 1)
    if rows_per >= x.shape[0]:
        out = _put(x)
        out.block_until_ready()
        return out
    parts = []
    for s in range(0, x.shape[0], rows_per):
        part = _put(x[s:s + rows_per])
        # Per-slice sync: block_until_ready is unreliable through the
        # tunnel, so force a read of the slice's first element.
        _ = np.asarray(part.reshape(-1)[0])
        parts.append(part)
    out = jnp.concatenate(parts, axis=0)
    out.block_until_ready()
    _logger.info("to_device: %d MB in %d slices",
                 x.nbytes >> 20, len(parts))
    return out


def default_layout(x):
    """Re-lay a device array into the default (row-major) layout.

    XLA freely picks transposed layouts for jit OUTPUTS (e.g. a build
    program's (n, tile, d) rows emerged major_to_minor=(0, 2, 1)), but
    Pallas kernels require default-layout operands — a mismatched
    persistent array gets a full relayout COPY inserted on every search
    dispatch (measured: ~2.6 ms/call on the tree-SQ index, the entire
    single-query latency budget).  One device_put at build time fixes the
    layout for the array's lifetime.  No-op for host arrays / already-
    default layouts / runtimes without the layout API.
    """
    try:
        if not isinstance(x, jax.Array):
            return x
        mtm = x.format.layout.major_to_minor
        if tuple(mtm) == tuple(range(x.ndim)):
            return x
        import jax.experimental.layout as jex_layout
        from jax.sharding import SingleDeviceSharding
        fmt = jex_layout.Format(
            jex_layout.Layout(major_to_minor=tuple(range(x.ndim))),
            SingleDeviceSharding(list(x.devices())[0]))
        out = jax.device_put(x, fmt)
        out.block_until_ready()
        return out
    except Exception:  # layout API unavailable: keep the array as-is
        return x
