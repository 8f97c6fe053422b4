"""64-way bit-parallel MSBFS vs per-source BFS reference."""

import collections

import numpy as np
import pyarrow as pa


def _bfs_ref(adj, n, sources):
    """dict v -> (n_reach, sum_dist) over the given sources."""
    reach = collections.defaultdict(int)
    sumd = collections.defaultdict(int)
    for s in sources:
        dist = {s: 0}
        q = collections.deque([s])
        while q:
            v = q.popleft()
            for u in adj[v]:
                if u not in dist:
                    dist[u] = dist[v] + 1
                    q.append(u)
        for v, d in dist.items():
            reach[v] += 1
            sumd[v] += d
    return reach, sumd


def test_msbfs_matches_per_source_bfs(ray_session, tmp_work):
    import ray.data as rd

    from libgrape_lite_ray.graph.build import attach_oids, build_graph
    from libgrape_lite_ray.graph.driver import GraphEngine

    rng = np.random.default_rng(31)
    n = 200
    src = rng.integers(0, n, 500).astype(np.int64)
    dst = rng.integers(0, n, 500).astype(np.int64)
    m = src != dst
    src, dst = src[m], dst[m]
    edges = rd.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))
    meta = build_graph(edges, f"{tmp_work}/ms", 3, directed=False,
                       symmetrize=True)
    eng = GraphEngine(meta)
    try:
        handle, metrics = eng.run("msbfs", {"n_sources": 64})
        tbl = attach_oids(handle.to_arrow(), meta)
    finally:
        eng.shutdown()

    adj = collections.defaultdict(set)
    for s, d in zip(src, dst):
        adj[s].add(d)
        adj[d].add(s)
    present = sorted(set(src) | set(dst))
    sources = present[:64]  # engine sources = 64 smallest oids
    reach, sumd = _bfs_ref(adj, n, sources)
    got = {int(o): (int(r), int(sd)) for o, r, sd in
           zip(tbl.column("oid").to_pylist(), tbl.column("n_reach").to_pylist(),
               tbl.column("sum_dist").to_pylist())}
    want = {v: (reach[v], sumd[v]) for v in present}
    assert got == want
