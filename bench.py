#!/usr/bin/env python
"""Benchmark harness (driver contract).

Headline: the north_star web pipeline at bench scale — synthetic pages
corpus (cached in /tmp) -> link extraction -> graph build -> PageRank
(10 rounds) + WCC — plus the derived-TPCH graph algorithms over
$GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "e2e_seconds", "value": <headline sec>, "unit": "sec",
   "queries": {...per-stage sec...}, "sf": <sf>, "num_cpus": N}

--scaling: runs the plain bench twice in fresh processes at
RAY_GRAFT_CPUS=8 and 32 (the sandbox stand-in for the N->4N cluster
criterion) and prints both plus the efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

N_BENCH_PAGES = 200_000
N_SITES = 64
RICHNESS = 3  # paragraphs-per-page multiplier: heavier html -> compute-dominated extraction


def _bench_pages_dir(n: int) -> str:
    return f"/tmp/lgr_bench_pages_{n}_r{RICHNESS}"


def run_bench() -> dict:
    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import ray.data as rd

    from libgrape_lite_ray import fixtures
    from libgrape_lite_ray.graph.build import build_graph
    from libgrape_lite_ray.graph.driver import GraphEngine
    from libgrape_lite_ray.pipelines.tpch_graph import graph_meta_for
    from libgrape_lite_ray.pipelines.web import extract_edges

    P = max(4, num_cpus)
    timings: dict[str, float] = {}

    # ---- corpus (cached, untimed; also warms the page cache)
    pdir = _bench_pages_dir(N_BENCH_PAGES)
    if not os.path.exists(os.path.join(pdir, "_DONE")):
        fixtures.generate_pages(pdir, N_BENCH_PAGES, N_SITES, richness=RICHNESS)
        open(os.path.join(pdir, "_DONE"), "w").write("ok")
    rd.read_parquet(pdir).count()  # warm read

    # ---- headline: extract ONCE, build both graph variants from it
    import shutil

    gdir = f"/tmp/lgr_bench_graph_{N_BENCH_PAGES}_{num_cpus}"
    shutil.rmtree(gdir, ignore_errors=True)
    t0 = time.perf_counter()
    pages = rd.read_parquet(pdir, columns=["url", "html"])
    edges_ds = extract_edges(pages, concurrency=(1, num_cpus))
    timings["extract"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    meta = build_graph(edges_ds, os.path.join(gdir, "directed"), P)
    timings["build_directed"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    eng = GraphEngine(meta)
    timings["fragment_load"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    _, pr_m = eng.run("pagerank", {"rounds": 10})
    timings["pagerank"] = time.perf_counter() - t0
    eng.shutdown()

    t0 = time.perf_counter()
    meta_u = build_graph(edges_ds, os.path.join(gdir, "undirected"), P,
                         directed=False, symmetrize=True, reuse_vertices_from=meta)
    eng = GraphEngine(meta_u)
    timings["build_undirected"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    _, wcc_m = eng.run("wcc")
    timings["wcc"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    _, _ = eng.run("cdlp", {"rounds": 10})
    timings["cdlp"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    _, _ = eng.run("lcc")
    timings["lcc"] = time.perf_counter() - t0
    eng.shutdown()

    edges = meta.num_edges
    timings["pagerank_edges_per_s"] = round(edges * 10 / timings["pagerank"], 1)
    timings["pagerank_supersteps_per_s"] = round(pr_m["supersteps_per_s"], 3)
    timings["wcc_rounds"] = wcc_m["rounds"]

    # ---- secondary: derived-TPCH graph at $GRAFT_SF_DIR
    t0 = time.perf_counter()
    tmeta = graph_meta_for(sf_dir, "directed", num_partitions=min(8, P))
    eng = GraphEngine(tmeta)
    eng.run("pagerank", {"rounds": 10})
    eng.shutdown()
    timings["tpch_pagerank"] = time.perf_counter() - t0

    headline = (
        timings["extract"] + timings["build_directed"] + timings["fragment_load"]
        + timings["pagerank"] + timings["build_undirected"] + timings["wcc"]
    )
    sf = sf_dir.rstrip("/").split("sf")[-1]
    out = {
        "metric": "e2e_seconds",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": {k: (round(v, 3) if isinstance(v, float) else v) for k, v in timings.items()},
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "num_cpus": num_cpus,
        "bench_pages": N_BENCH_PAGES,
        "graph_edges": edges,
        "graph_vertices": meta.num_vertices,
    }
    ray.shutdown()
    return out


def run_scaling():
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        p = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                           capture_output=True, text=True, check=True,
                           cwd=os.path.dirname(os.path.abspath(__file__)))
        return json.loads(p.stdout.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo, r_hi = one(lo), one(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    print(json.dumps({
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        f"sec_{lo}": r_lo["value"],
        f"sec_{hi}": r_hi["value"],
        f"queries_{lo}": r_lo["queries"],
        f"queries_{hi}": r_hi["queries"],
        "num_cpus": [lo, hi],
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
