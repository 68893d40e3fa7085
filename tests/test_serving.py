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


def test_http_server_round_trip(tmp_path):
    """Process-boundary serving: serialize -> load in a server -> query
    over HTTP -> identical results to direct search (the reference's
    export-to-TF-Serving integration contract)."""
    import http.client
    import json

    import scann_tpu
    from scann_tpu import serving

    rng = np.random.default_rng(0)
    db = rng.standard_normal((5000, 24)).astype(np.float32)
    q = rng.standard_normal((6, 24)).astype(np.float32)
    s = (scann_tpu.builder(db, 5, "dot_product")
         .tree(num_leaves=10, num_leaves_to_search=10,
               training_sample_size=4000)
         .score_ah(2).reorder(20).build())
    direct_idx, direct_dist = s.search_batched(q)
    d = str(tmp_path / "idx")
    s.serialize(d)

    server = serving.serve(d, host="127.0.0.1", port=0, block=False)
    try:
        conn = http.client.HTTPConnection(server.host, server.port,
                                          timeout=30)
        conn.request("GET", "/health")
        health = json.loads(conn.getresponse().read())
        assert health["status"] == "ok" and health["n_points"] == 5000

        # JSON batched
        conn.request("POST", "/search_batched",
                     body=json.dumps({"queries": q.tolist()}),
                     headers={"Content-Type": "application/json"})
        out = json.loads(conn.getresponse().read())
        np.testing.assert_array_equal(np.asarray(out["indices"]),
                                      direct_idx)
        np.testing.assert_allclose(np.asarray(out["distances"]),
                                   direct_dist, rtol=1e-5)

        # binary batched
        conn.request("POST", "/search_batched?final_num_neighbors=5",
                     body=q.tobytes(),
                     headers={"Content-Type": "application/octet-stream"})
        out2 = json.loads(conn.getresponse().read())
        np.testing.assert_array_equal(np.asarray(out2["indices"]),
                                      direct_idx)

        # single query through the micro-batcher
        conn.request("POST", "/search",
                     body=json.dumps({"query": q[0].tolist()}),
                     headers={"Content-Type": "application/json"})
        out3 = json.loads(conn.getresponse().read())
        np.testing.assert_array_equal(np.asarray(out3["indices"][0]),
                                      direct_idx[0])

        # error surface: wrong dimensionality -> HTTP 400, not a hang
        conn.request("POST", "/search_batched",
                     body=json.dumps({"queries": [[1.0, 2.0]]}),
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 400
        assert "error" in json.loads(resp.read())
    finally:
        server.stop()
