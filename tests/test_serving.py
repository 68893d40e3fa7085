"""Micro-batching serving layer tests."""

import numpy as np
import pytest

import scann_tpu
from scann_tpu.serving import SearchService


def test_serving_batches_and_matches_direct():
    rng = np.random.default_rng(0)
    db = rng.standard_normal((2000, 24)).astype(np.float32)
    q = rng.standard_normal((32, 24)).astype(np.float32)
    s = (scann_tpu.builder(db, 5, "dot_product")
         .tree(num_leaves=8, num_leaves_to_search=8,
               training_sample_size=2000)
         .score_ah(2).reorder(30).build())
    direct_idx, direct_dist = s.search_batched(q)
    with SearchService(s, max_batch=16, max_wait_ms=20.0) as svc:
        futs = [svc.submit(q[i]) for i in range(len(q))]
        for i, f in enumerate(futs):
            idx, dist = f.result(timeout=120)
            np.testing.assert_array_equal(idx, direct_idx[i])
            np.testing.assert_allclose(dist, direct_dist[i], rtol=1e-6)


def test_serving_errors():
    rng = np.random.default_rng(0)
    db = rng.standard_normal((500, 8)).astype(np.float32)
    s = scann_tpu.builder(db, 3, "dot_product").score_brute_force().build()
    svc = SearchService(s)
    with pytest.raises(RuntimeError):
        svc.submit(db[0])  # not started
    svc.start()
    with pytest.raises(ValueError):
        svc.submit(db[:2])  # 2d input
    # wrong dimensionality propagates through the future
    fut = svc.submit(np.zeros(4, np.float32))
    with pytest.raises(ValueError):
        fut.result(timeout=60)
    svc.stop()
