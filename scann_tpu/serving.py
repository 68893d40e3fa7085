"""In-process serving layer: request batching over a searcher.

TPU-native equivalent of the reference's serving story (L10): where the
reference ships TF custom ops + TF-Serving images (scann_ops/cc/ops/,
tf_serving/README.md) so a server can batch requests into
SearchBatchedParallel, here a lightweight micro-batching front end collects
concurrent single queries into one device program invocation — the TPU
equivalent of the reference's query thread pool (scann.cc:478-501), since
batch width (not host threads) is what buys throughput on the MXU.

Usage::

    svc = SearchService(searcher, max_batch=1024, max_wait_ms=2.0)
    svc.start()
    fut = svc.submit(query_vector)          # returns concurrent Future
    neighbors, distances = fut.result()
    svc.stop()
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Optional

import numpy as np


class SearchService:
    """Micro-batching search front end for a scann_tpu searcher."""

    def __init__(self, searcher, max_batch: int = 1024,
                 max_wait_ms: float = 2.0, **search_kwargs):
        self._searcher = searcher
        self._max_batch = max_batch
        self._max_wait_s = max_wait_ms / 1000.0
        self._search_kwargs = search_kwargs
        self._queue: queue.Queue = queue.Queue()
        self._thread: Optional[threading.Thread] = None
        self._running = False

    # ------------------------------------------------------------ control
    def start(self):
        if self._running:
            return self
        self._running = True
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._running = False
        if self._thread is not None:
            self._queue.put(None)  # wake the loop
            self._thread.join(timeout=10)
            self._thread = None

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    # ------------------------------------------------------------- client
    def submit(self, query) -> Future:
        """Enqueue one query; resolves to (neighbors, distances)."""
        if not self._running:
            raise RuntimeError("SearchService is not running; call start()")
        q = np.asarray(query, np.float32)
        if q.ndim != 1:
            raise ValueError("submit() takes a single 1d query")
        fut: Future = Future()
        self._queue.put((q, fut))
        return fut

    def search(self, query, timeout=None):
        """Blocking convenience wrapper around submit()."""
        return self.submit(query).result(timeout=timeout)

    # -------------------------------------------------------------- loop
    def _loop(self):
        while self._running:
            item = self._queue.get()
            if item is None:
                continue
            batch = [item]
            # Coalesce whatever arrives within the wait window, up to
            # max_batch (the micro-batching that makes MXU serving pay).
            deadline = self._max_wait_s
            try:
                while len(batch) < self._max_batch:
                    nxt = self._queue.get(timeout=deadline)
                    if nxt is None:
                        break
                    batch.append(nxt)
            except queue.Empty:
                pass
            queries = np.stack([q for q, _ in batch])
            try:
                idx, dist = self._searcher.search_batched(
                    queries, **self._search_kwargs)
                for i, (_, fut) in enumerate(batch):
                    fut.set_result((idx[i], dist[i]))
            except Exception as e:  # propagate to all waiters
                for _, fut in batch:
                    if not fut.done():
                        fut.set_exception(e)
