#!/usr/bin/env python
"""Diagnostic: reproduce one scaling leg of the engine superstep phase.

Usage:  taskset -c 0-7 python scripts/diag_scaling_leg.py 8
        taskset -c 0-31 python scripts/diag_scaling_leg.py 32

Builds (or reuses) the 8M-vertex / 300M-edge engine graph cache that
bench.py --scaling uses, then runs the PageRank(10)+WCC phase exactly
as bench.py does (same H/P/cpus_per_actor sizing) and prints per-round
metrics so a slow leg can be attributed (apply vs pack vs barrier).
"""
from __future__ import annotations

import json
import os
import sys
import time

ENGINE_V = int(os.environ.get("LGR_ENGINE_V", "8000000"))
ENGINE_E = int(os.environ.get("LGR_ENGINE_E", "300000000"))


def main():
    num_cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    import ray

    from libgrape_lite_ray.memtune import keep_heap_resident, prewarm_plasma

    keep_heap_resident()
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from libgrape_lite_ray import fixtures
    from libgrape_lite_ray.graph.build import GraphMeta, build_graph
    from libgrape_lite_ray.graph.driver import GraphEngine

    pw_s = prewarm_plasma(float(os.environ.get("LGR_PLASMA_PREWARM_GB", "10")))
    print(f"[diag] plasma prewarm {pw_s:.0f}s", file=sys.stderr, flush=True)

    P = 32
    H = max(1, min(P, num_cpus))
    cpus_per_actor = max(0.1, round(0.8 * num_cpus / H, 2))
    egdir = f"/tmp/lgr_engine_graph_{ENGINE_V}_{ENGINE_E}"
    if not os.path.exists(os.path.join(egdir, "directed", "graph_meta.json")):
        t0 = time.perf_counter()
        eg = fixtures.big_engine_edges(ENGINE_V, ENGINE_E)
        emeta = build_graph(eg, os.path.join(egdir, "directed"), P, dense_int_oids=True)
        build_graph(None, os.path.join(egdir, "undirected"), P,
                    directed=False, symmetrize=True, reuse_vertices_from=emeta)
        print(f"[diag] graph build {time.perf_counter()-t0:.0f}s", file=sys.stderr, flush=True)
    emeta = GraphMeta.load(os.path.join(egdir, "directed"))
    emeta_u = GraphMeta.load(os.path.join(egdir, "undirected"))

    def rss_gb():
        with open("/proc/meminfo") as fh:
            for line in fh:
                if line.startswith("MemAvailable:"):
                    return round((125 << 30) / (1 << 30) - int(line.split()[1]) / (1 << 20), 1)
        return -1.0

    t0 = time.perf_counter()
    eng = GraphEngine(emeta, num_cpus_per_actor=cpus_per_actor, num_hosts=H)
    print(f"[diag] fragment_load {time.perf_counter()-t0:.1f}s used_gb={rss_gb()}",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    eng.wait_prewarm()
    print(f"[diag] prewarm_join {time.perf_counter()-t0:.1f}s used_gb={rss_gb()}",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    _, m = eng.run("pagerank", {"rounds": 2})
    print(f"[diag] warmup(2 rounds) {time.perf_counter()-t0:.1f}s "
          f"rounds={json.dumps(m['round_log'])}", file=sys.stderr, flush=True)
    out = {"num_cpus": num_cpus, "H": H, "edges": emeta.num_edges}
    for rep in range(2):
        t0 = time.perf_counter()
        _, m = eng.run("pagerank", {"rounds": 10})
        dt = time.perf_counter() - t0
        out[f"pagerank_rep{rep}"] = round(dt, 2)
        print(f"[diag] pagerank rep{rep} {dt:.1f}s used_gb={rss_gb()} per-round:",
              file=sys.stderr, flush=True)
        for r in m["round_log"]:
            print(f"    {json.dumps(r)}", file=sys.stderr, flush=True)
    eng = GraphEngine(emeta_u, num_cpus_per_actor=cpus_per_actor, reuse_engine=eng,
                      num_hosts=H)
    eng.wait_prewarm()
    eng.run("wcc", max_rounds=2)
    t0 = time.perf_counter()
    _, m = eng.run("wcc")
    out["wcc"] = round(time.perf_counter() - t0, 2)
    print(f"[diag] wcc {out['wcc']}s rounds={m['rounds']} used_gb={rss_gb()}",
          file=sys.stderr, flush=True)
    eng.shutdown()
    ray.shutdown()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
