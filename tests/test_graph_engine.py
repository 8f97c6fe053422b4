"""Engine vs NumPy oracle on seeded topologies, across partition counts
(the reference's golden-at-multiple-parallelism pattern,
misc/app_tests.sh:227-233)."""

import numpy as np
import pytest

from libgrape_lite_ray import fixtures
from libgrape_lite_ray.graph import oracle
from libgrape_lite_ray.graph.build import attach_oids, build_graph, edges_from_numpy
from libgrape_lite_ray.graph.driver import GraphEngine


def _result_by_gid(ds, col):
    df = ds.to_pandas().sort_values("gid")
    return df[col].to_numpy()


def _build(tmp_work, src, dst, P, sub, **kw):
    import os

    ds = edges_from_numpy(src, dst)
    return build_graph(ds, os.path.join(tmp_work, sub), P, **kw)


@pytest.mark.parametrize("P", [1, 3])
def test_wcc_two_components(ray_session, tmp_work, P):
    src, dst = fixtures.er_components()
    n = 100
    meta = _build(tmp_work, src, dst, P, f"wcc{P}", symmetrize=True)
    assert meta.num_vertices == n
    eng = GraphEngine(meta)
    ds, metrics = eng.run("wcc")
    got = _result_by_gid(ds, "comp")
    want = oracle.wcc(src, dst, n)
    assert np.array_equal(got, want)
    assert len(np.unique(got)) == 2
    eng.shutdown()


@pytest.mark.parametrize("P", [1, 4])
def test_pagerank_zipf_directed(ray_session, tmp_work, P):
    n = 300
    src, dst = fixtures.zipf_graph(n=n, m=2500)
    meta = _build(tmp_work, src, dst, P, f"pr{P}", directed=True)
    eng = GraphEngine(meta)
    ds, _ = eng.run("pagerank", {"rounds": 10, "damping": 0.85})
    got = _result_by_gid(ds, "pagerank")
    want = oracle.pagerank(src, dst, n, rounds=10)
    assert np.allclose(got, want, rtol=0, atol=1e-9)
    eng.shutdown()


@pytest.mark.parametrize("P", [1, 4])
def test_cdlp(ray_session, tmp_work, P):
    src, dst = fixtures.er_components()
    n = 100
    meta = _build(tmp_work, src, dst, P, f"cdlp{P}", symmetrize=True)
    eng = GraphEngine(meta)
    ds, _ = eng.run("cdlp", {"rounds": 10})
    got = _result_by_gid(ds, "label")
    want = oracle.cdlp(src, dst, n, rounds=10)
    assert np.array_equal(got, want)
    eng.shutdown()


@pytest.mark.parametrize("P", [1, 4])
def test_lcc_triangles(ray_session, tmp_work, P):
    src, dst = fixtures.cliques_and_bridges(5, 6)
    n = 30
    meta = _build(tmp_work, src, dst, P, f"lcc{P}", symmetrize=True)
    eng = GraphEngine(meta)
    ds, _ = eng.run("lcc")
    df = ds.to_pandas().sort_values("gid")
    tri_want, lcc_want = oracle.triangles_lcc(src, dst, n)
    assert np.array_equal(df["tricnt"].to_numpy(), tri_want)
    assert np.allclose(df["lcc"].to_numpy(), lcc_want, atol=1e-12)
    assert int(df["tricnt"].sum()) // 3 == fixtures.expected_triangles(5, 6)
    eng.shutdown()


@pytest.mark.parametrize("P", [1, 4])
def test_lcc_zipf(ray_session, tmp_work, P):
    n = 200
    src, dst = fixtures.zipf_graph(n=n, m=1500)
    meta = _build(tmp_work, src, dst, P, f"lccz{P}", symmetrize=True)
    eng = GraphEngine(meta)
    ds, _ = eng.run("lcc")
    df = ds.to_pandas().sort_values("gid")
    tri_want, lcc_want = oracle.triangles_lcc(src, dst, n)
    assert np.array_equal(df["tricnt"].to_numpy(), tri_want)
    assert np.allclose(df["lcc"].to_numpy(), lcc_want, atol=1e-12)
    eng.shutdown()


def test_bfs_sssp(ray_session, tmp_work):
    n = 300
    src, dst = fixtures.zipf_graph(n=n, m=2000)
    rng = np.random.default_rng(7)
    w = rng.uniform(0.5, 3.0, size=len(src))
    meta = _build(tmp_work, src, dst, 4, "bfs", directed=True)

    eng = GraphEngine(meta)
    ds, _ = eng.run("bfs", {"source": 0})
    got = _result_by_gid(ds, "depth")
    want = oracle.bfs(src, dst, n, source=0, directed=True)
    assert np.array_equal(got, want)
    eng.shutdown()

    ds_w = edges_from_numpy(src, dst, w)
    import os

    meta_w = build_graph(ds_w, os.path.join(tmp_work, "sssp"), 4, directed=True, weight_col="w")
    eng = GraphEngine(meta_w)
    ds, _ = eng.run("sssp", {"source": 0})
    got = _result_by_gid(ds, "dist")
    want = oracle.sssp(src, dst, w, n, source=0, directed=True)
    assert np.allclose(got, want, atol=1e-12)
    assert np.array_equal(np.isinf(got), np.isinf(want))
    eng.shutdown()


def test_string_oids_and_attach(ray_session, tmp_work):
    """String-oid matrix (tests/vertex_map_tests.cc analog): WCC labels
    on url-style ids == min-oid per component after re-attach."""
    import pyarrow as pa
    import ray.data as rd
    import os

    src, dst = fixtures.er_components()
    s = pa.array([f"https://v{i:04d}.example/" for i in src], pa.string())
    d = pa.array([f"https://v{i:04d}.example/" for i in dst], pa.string())
    ds = rd.from_arrow(pa.table({"src": s, "dst": d}))
    meta = build_graph(ds, os.path.join(tmp_work, "str"), 3, symmetrize=True)
    eng = GraphEngine(meta)
    out, _ = eng.run("wcc")
    tbl = pa.concat_tables([b for b in out.iter_batches(batch_format="pyarrow", batch_size=10**6)])
    tbl = attach_oids(tbl, meta)
    df = tbl.to_pandas()
    want = oracle.wcc(src, dst, 100)
    by_gid = df.sort_values("gid")
    assert np.array_equal(by_gid["comp"].to_numpy(), want)
    # zero-padded ids sort like ints, so min-oid == oid of min-gid
    comp_oid = np.array([f"https://v{i:04d}.example/" for i in want])
    got_comp_oid = np.array([f"https://v{i:04d}.example/" for i in by_gid["comp"].to_numpy()])
    assert np.array_equal(got_comp_oid, comp_oid)
    eng.shutdown()


def test_attach_oids_ds_matches_gather(ray_session, tmp_work):
    """Distributed (join) oid re-attach == the driver-side gather."""
    import os

    import pyarrow as pa
    import ray.data as rd

    from libgrape_lite_ray.graph.build import attach_oids_ds

    src, dst = fixtures.er_components()
    s = pa.array([f"u{i:04d}" for i in src], pa.string())
    d = pa.array([f"u{i:04d}" for i in dst], pa.string())
    ds = rd.from_arrow(pa.table({"src": s, "dst": d}))
    meta = build_graph(ds, os.path.join(tmp_work, "att"), 3, symmetrize=True)
    eng = GraphEngine(meta)
    try:
        out, _ = eng.run("wcc")
        tbl = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow", batch_size=10**6)))
        want = attach_oids(tbl, meta).to_pandas().sort_values("gid").reset_index(drop=True)
        got = (attach_oids_ds(out.to_dataset(), meta).to_pandas()
               .sort_values("gid").reset_index(drop=True)[want.columns.tolist()])
        assert got.equals(want)
    finally:
        eng.shutdown()


def test_sample_neighbors(ray_session, tmp_work):
    """GNN-sampler analog (examples/gnn_sampler): deterministic random
    and top-k-by-weight neighbor sampling."""
    import os

    n = 100
    src, dst = fixtures.zipf_graph(n=n, m=800)
    rng = np.random.default_rng(3)
    w = rng.uniform(0, 10, size=len(src))
    meta = build_graph(edges_from_numpy(src, dst, w), os.path.join(tmp_work, "smp"),
                       3, weight_col="w")
    eng = GraphEngine(meta)
    try:
        ds, _ = eng.run("sample_neighbors", {"k": 3, "strategy": "random", "seed": 7})
        df = ds.to_pandas()
        per = df.groupby("gid").size()
        assert (per <= 3).all() and len(per) > 0
        # deterministic across runs
        ds2, _ = eng.run("sample_neighbors", {"k": 3, "strategy": "random", "seed": 7})
        df2 = ds2.to_pandas()
        assert df.sort_values(["gid", "sampled_gid"]).reset_index(drop=True).equals(
            df2.sort_values(["gid", "sampled_gid"]).reset_index(drop=True))
        # top-k picks the heaviest edges
        ds3, _ = eng.run("sample_neighbors", {"k": 2, "strategy": "topk"})
        df3 = ds3.to_pandas()
        assert (df3.groupby("gid").size() <= 2).all()
    finally:
        eng.shutdown()


def test_join_translate_path_matches_broadcast(ray_session, tmp_work):
    """Large-dictionary build path (broadcast_threshold exceeded -> two
    Dataset.join shuffles, the local_vertex_map-style scale route,
    grape/vertex_map/local_vertex_map.h analog) produces the same graph
    and the same WCC results as the broadcast-dictionary path."""
    import os

    import pyarrow as pa
    import ray.data as rd

    src, dst = fixtures.er_components()
    s = pa.array([f"https://v{i:04d}.example/" for i in src], pa.string())
    d = pa.array([f"https://v{i:04d}.example/" for i in dst], pa.string())
    ds = rd.from_arrow(pa.table({"src": s, "dst": d}))
    m_b = build_graph(ds, os.path.join(tmp_work, "jb"), 3, symmetrize=True)
    m_j = build_graph(ds, os.path.join(tmp_work, "jj"), 3, symmetrize=True,
                      broadcast_threshold=0)
    assert (m_j.num_vertices, m_j.num_edges) == (m_b.num_vertices, m_b.num_edges)
    want = oracle.wcc(src, dst, 100)
    for meta in (m_b, m_j):
        eng = GraphEngine(meta)
        try:
            out, _ = eng.run("wcc")
            assert np.array_equal(_result_by_gid(out, "comp"), want)
        finally:
            eng.shutdown()


def test_memtune_applied():
    """keep_heap_resident applies the malloc tuning where invoked
    (FragmentHost init / bench entry, NOT library import — see
    ADVICE round 2).  Gated: on non-glibc platforms or with
    LGR_NO_MALLOC_TUNE set there is nothing to tune."""
    import ctypes
    import os

    import pytest

    from libgrape_lite_ray.memtune import keep_heap_resident

    if os.environ.get("LGR_NO_MALLOC_TUNE"):
        pytest.skip("LGR_NO_MALLOC_TUNE set")
    try:
        ctypes.CDLL("libc.so.6").mallopt
    except (OSError, AttributeError):
        pytest.skip("non-glibc platform: mallopt unavailable")
    assert keep_heap_resident() is True  # idempotent re-call reports active
