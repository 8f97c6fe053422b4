"""KCore peeling program vs a NumPy reference on random graphs."""

import numpy as np
import pyarrow as pa
import pytest


def _kcore_ref(src, dst, n, k):
    """Iterative peel on the distinct undirected edge set."""
    import collections

    adj = collections.defaultdict(set)
    for s, d in zip(src, dst):
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    alive = set(range(n))
    changed = True
    while changed:
        changed = False
        for v in list(alive):
            if len(adj[v] & alive) < k:
                alive.discard(v)
                changed = True
    return alive


@pytest.mark.parametrize("k", [2, 3])
def test_kcore_matches_reference(ray_session, tmp_work, k):
    import ray.data as rd

    from libgrape_lite_ray.graph.build import attach_oids, build_graph
    from libgrape_lite_ray.graph.driver import GraphEngine

    rng = np.random.default_rng(17)
    n = 120
    src = rng.integers(0, n, 700).astype(np.int64)
    dst = rng.integers(0, n, 700).astype(np.int64)
    m = src != dst
    src, dst = src[m], dst[m]
    edges = rd.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))
    meta = build_graph(edges, f"{tmp_work}/kc{k}", 3, directed=False,
                       symmetrize=True)
    eng = GraphEngine(meta)
    try:
        handle, metrics = eng.run("kcore", {"k": k})
        tbl = attach_oids(handle.to_arrow(), meta)
    finally:
        eng.shutdown()
    assert metrics["rounds"] < 30  # the SQL oracle unrolls 30 peels
    got = {int(o) for o, v in zip(tbl.column("oid").to_pylist(),
                                  tbl.column("in_kcore").to_pylist()) if v}
    want = _kcore_ref(src, dst, n, k)
    # vertices absent from the edge table are not graph vertices
    present = set(src) | set(dst)
    assert got == (want & present)


def _coreness_ref(src, dst, n):
    """Classic peeling core decomposition (min-degree removal)."""
    import collections

    adj = collections.defaultdict(set)
    for s, d in zip(src, dst):
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    nodes = set(adj)
    deg = {v: len(adj[v]) for v in nodes}
    core = {}
    alive = set(nodes)
    k = 0
    while alive:
        v = min(alive, key=lambda x: deg[x])
        k = max(k, deg[v])
        core[v] = k
        alive.discard(v)
        for u in adj[v]:
            if u in alive:
                deg[u] -= 1
    return core


def test_coreness_matches_peeling(ray_session, tmp_work):
    import ray.data as rd

    from libgrape_lite_ray.graph.build import attach_oids, build_graph
    from libgrape_lite_ray.graph.driver import GraphEngine

    rng = np.random.default_rng(23)
    n = 150
    src = rng.integers(0, n, 900).astype(np.int64)
    dst = rng.integers(0, n, 900).astype(np.int64)
    m = src != dst
    src, dst = src[m], dst[m]
    edges = rd.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))
    meta = build_graph(edges, f"{tmp_work}/core", 3, directed=False,
                       symmetrize=True)
    eng = GraphEngine(meta)
    try:
        handle, metrics = eng.run("coreness")
        tbl = attach_oids(handle.to_arrow(), meta)
    finally:
        eng.shutdown()
    got = dict(zip(tbl.column("oid").to_pylist(),
                   tbl.column("coreness").to_pylist()))
    want = _coreness_ref(src, dst, n)
    assert got == want
