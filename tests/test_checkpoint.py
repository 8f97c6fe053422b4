"""Checkpoint/resume (north_rule): kill after step k, resume, final
output must equal the uninterrupted run's exactly (FIXTURES.md F5)."""

import os

import numpy as np

from libgrape_lite_ray import fixtures
from libgrape_lite_ray.graph.build import build_graph, edges_from_numpy
from libgrape_lite_ray.graph.driver import GraphEngine


def test_wcc_resume_equals_uninterrupted(ray_session, tmp_work):
    src, dst = fixtures.er_components(n1=120, n2=80, extra1=150, extra2=90)
    meta = build_graph(
        edges_from_numpy(src, dst), os.path.join(tmp_work, "g"), 4,
        symmetrize=True, fingerprint="ckpt-test-1",
    )
    ckpt = os.path.join(tmp_work, "ckpt")

    # uninterrupted run (with checkpoints every round)
    eng = GraphEngine(meta)
    ds, m_full = eng.run("wcc", ckpt_dir=ckpt, checkpoint_every=1)
    full = ds.to_pandas().sort_values("gid").reset_index(drop=True)
    eng.shutdown()
    assert m_full["rounds"] >= 2

    # simulate a kill after step 1: delete all later checkpoints
    for d in os.listdir(ckpt):
        if d.startswith("step=") and int(d.split("=")[1]) > 1:
            import shutil

            shutil.rmtree(os.path.join(ckpt, d))

    # resume from step 1 with a fresh actor pool
    eng2 = GraphEngine(meta)
    ds2, m_res = eng2.run("wcc", ckpt_dir=ckpt, checkpoint_every=1, resume=True)
    resumed = ds2.to_pandas().sort_values("gid").reset_index(drop=True)
    eng2.shutdown()

    assert m_res["resumed_from"] == 1
    assert np.array_equal(full["comp"].to_numpy(), resumed["comp"].to_numpy())


def test_pagerank_resume_bitwise(ray_session, tmp_work):
    n = 200
    src, dst = fixtures.zipf_graph(n=n, m=1500)
    meta = build_graph(
        edges_from_numpy(src, dst), os.path.join(tmp_work, "g2"), 3,
        directed=True, fingerprint="ckpt-test-2",
    )
    ckpt = os.path.join(tmp_work, "ckpt2")

    eng = GraphEngine(meta)
    ds, _ = eng.run("pagerank", {"rounds": 8}, ckpt_dir=ckpt, checkpoint_every=2)
    full = ds.to_pandas().sort_values("gid")["pagerank"].to_numpy()
    eng.shutdown()

    import shutil

    for d in os.listdir(ckpt):
        if d.startswith("step=") and int(d.split("=")[1]) > 4:
            shutil.rmtree(os.path.join(ckpt, d))

    eng2 = GraphEngine(meta)
    ds2, m = eng2.run("pagerank", {"rounds": 8}, ckpt_dir=ckpt, checkpoint_every=2, resume=True)
    resumed = ds2.to_pandas().sort_values("gid")["pagerank"].to_numpy()
    eng2.shutdown()

    assert m["resumed_from"] == 4
    # deterministic reduction order -> bitwise identical, not just close
    assert np.array_equal(full, resumed)


def test_manifest_lineage(ray_session, tmp_work):
    import json

    src, dst = fixtures.er_components()
    meta = build_graph(edges_from_numpy(src, dst), os.path.join(tmp_work, "g3"), 2,
                       symmetrize=True, fingerprint="lineage-xyz")
    ckpt = os.path.join(tmp_work, "ckpt3")
    eng = GraphEngine(meta)
    eng.run("wcc", ckpt_dir=ckpt, checkpoint_every=1)
    eng.shutdown()
    steps = [d for d in os.listdir(ckpt) if d.startswith("step=")]
    assert steps
    with open(os.path.join(ckpt, steps[0], "MANIFEST.json")) as f:
        m = json.load(f)
    assert m["fingerprint"] == "lineage-xyz"
    assert m["algorithm"] == "wcc"
    assert m["num_partitions"] == 2
    assert "round_log" in m


def test_multihop_resume_keeps_frontier(ray_session, tmp_work):
    """Regression (round-4 ADVICE): resuming sample_multihop from a
    mid-walk checkpoint must restore the routed frontier (_next), or
    every remaining hop silently produces nothing."""
    n = 150
    src, dst = fixtures.zipf_graph(n=n, m=1200)
    meta = build_graph(edges_from_numpy(src, dst), os.path.join(tmp_work, "gmh"), 3,
                       directed=True, fingerprint="ckpt-mh")
    ckpt = os.path.join(tmp_work, "ckpt-mh")
    args = {"sources": [0, 1, 2], "hop_and_num": [2, 2, 2],
            "strategy": "random", "seed": 3}

    eng = GraphEngine(meta)
    ds, m_full = eng.run("sample_multihop", args, ckpt_dir=ckpt, checkpoint_every=1)
    full = ds.to_pandas().sort_values(
        ["hop", "root_gid", "src_gid", "dst_gid"]).reset_index(drop=True)
    eng.shutdown()
    assert set(full["hop"]) == {1, 2, 3}

    import shutil

    for d in os.listdir(ckpt):
        if d.startswith("step=") and int(d.split("=")[1]) > 1:
            shutil.rmtree(os.path.join(ckpt, d))

    eng2 = GraphEngine(meta)
    ds2, m = eng2.run("sample_multihop", args, ckpt_dir=ckpt,
                      checkpoint_every=1, resume=True)
    resumed = ds2.to_pandas().sort_values(
        ["hop", "root_gid", "src_gid", "dst_gid"]).reset_index(drop=True)
    eng2.shutdown()

    assert m["resumed_from"] == 1
    assert full.equals(resumed)
