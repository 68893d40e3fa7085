"""Profiling / tracing helpers.

The reference's observability is VLOG timing of leaf builds
(tree_ah_hybrid_residual.cc:583-592) and absl::Time deadlines in k-means
(gmm_utils.cc:845,901).  The TPU equivalent (SURVEY.md §5) is jax.profiler
device traces plus per-phase wall-clock logging, which the build pipeline
emits through the ``scann_tpu`` logger (models/tree_ah.py _phase).
"""

from __future__ import annotations

import contextlib
import logging
import time

logger = logging.getLogger("scann_tpu")


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler device trace around a block::

        with scann_tpu.utils.profiling.trace("/tmp/trace"):
            searcher.search_batched(queries)

    View with TensorBoard or xprof."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def log_phase(name: str):
    """Wall-clock a phase into the scann_tpu logger."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        logger.info("%s took %.2fs", name, time.perf_counter() - t0)
