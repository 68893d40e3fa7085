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


def to_device(x, dtype=jnp.float32):
    """Upload ``x`` to the default device in bounded slices.

    Device arrays pass through (no copy).  Returns a single contiguous
    device array.
    """
    if isinstance(x, jax.Array):
        return x.astype(dtype) if x.dtype != dtype else x
    x = np.asarray(x, dtype)
    if _CHUNK_MB <= 0 or x.ndim == 0:
        return jnp.asarray(x)
    row_bytes = max(int(x.itemsize * np.prod(x.shape[1:], dtype=np.int64)),
                    1)
    rows_per = max(int(_CHUNK_MB * (1 << 20)) // row_bytes, 1)
    if rows_per >= x.shape[0]:
        out = jnp.asarray(x)
        out.block_until_ready()
        return out
    parts = []
    for s in range(0, x.shape[0], rows_per):
        part = jnp.asarray(x[s:s + rows_per])
        # Per-slice sync: block_until_ready is unreliable through the
        # tunnel, so force a read of the slice's first element.
        _ = np.asarray(part.reshape(-1)[0])
        parts.append(part)
    out = jnp.concatenate(parts, axis=0)
    out.block_until_ready()
    _logger.info("to_device: %d MB in %d slices",
                 x.nbytes >> 20, len(parts))
    return out
