"""PageRankLocal (pagerank_local.h:49-223 competitor-matched variant):
fixed-round parity against a NumPy reference of the exact reference
semantics, and eps-mode (delta-threshold) early termination."""

import numpy as np


def _numpy_pagerank_local(n, src, dst, rounds, d=0.85):
    """Direct transcription of pagerank_local.h: result stores the
    divided form; every round except the LAST divides by outdeg."""
    deg = np.bincount(src, minlength=n)
    res = np.where(deg > 0, 1.0 / np.maximum(deg, 1), 1.0)
    for step in range(1, rounds + 1):
        s = np.zeros(n)
        np.add.at(s, src, res[dst])  # pull over OUT-edges (adjlist sum)
        rank = (1 - d) + d * s
        if step == rounds:
            return rank
        res = np.where(deg > 0, rank / np.maximum(deg, 1), rank)
    return res


def _dedup(src, dst):
    key = src * 10**6 + dst
    _, idx = np.unique(key, return_index=True)
    return src[idx], dst[idx]


def test_pagerank_local_fixed_rounds(ray_session, tmp_work):
    from libgrape_lite_ray.graph.build import build_graph, edges_from_numpy
    from libgrape_lite_ray.graph.driver import GraphEngine

    rng = np.random.default_rng(11)
    n, m = 300, 2400
    src, dst = _dedup(rng.integers(0, n, m).astype(np.int64),
                      rng.integers(0, n, m).astype(np.int64))
    meta = build_graph(edges_from_numpy(src, dst), f"{tmp_work}/g", 4,
                       dense_int_oids=True)
    eng = GraphEngine(meta)
    ds, metrics = eng.run("pagerank_local", {"rounds": 10})
    got = ds.to_pandas().sort_values("gid")["pagerank"].to_numpy()
    eng.shutdown()
    want = _numpy_pagerank_local(n, src, dst, 10)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    assert metrics["rounds"] == 10


def test_pagerank_local_eps_termination(ray_session, tmp_work):
    """eps mode stops early (global max |delta rank| <= eps across ALL
    partitions in the same round) and equals the fixed-round run at the
    measured round count."""
    from libgrape_lite_ray.graph.build import build_graph, edges_from_numpy
    from libgrape_lite_ray.graph.driver import GraphEngine

    rng = np.random.default_rng(13)
    n, m = 400, 4000
    src, dst = _dedup(rng.integers(0, n, m).astype(np.int64),
                      rng.integers(0, n, m).astype(np.int64))
    meta = build_graph(edges_from_numpy(src, dst), f"{tmp_work}/g", 4,
                       dense_int_oids=True)
    eng = GraphEngine(meta)
    ds, metrics = eng.run("pagerank_local", {"rounds": 500, "eps": 1e-10})
    got = ds.to_pandas().sort_values("gid")["pagerank"].to_numpy()
    rounds = metrics["rounds"]
    eng.shutdown()
    assert rounds < 500  # converged before the cap
    want = _numpy_pagerank_local(n, src, dst, rounds)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # converged: one more round moves nothing meaningful (contraction
    # bounds the next delta by ~d*maxdeg*eps)
    nxt = _numpy_pagerank_local(n, src, dst, rounds + 1)
    assert np.abs(nxt - want).max() <= 1e-8
