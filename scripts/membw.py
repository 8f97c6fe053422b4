#!/usr/bin/env python
"""DRAM bandwidth probe: aggregate streaming-copy GB/s at N worker
processes (taskset-bound by the caller).

Purpose: quantify the sandbox's shared-memory-controller confound for
the scaling criterion.  `taskset -c 0-7` vs `0-31` splits CORES 4x but
both see the same DRAM channels; if the measured aggregate copy
bandwidth barely grows from 8 to 32 workers, then any memory-bound
kernel (the superstep gather/reduceat family) CANNOT show linear
strong scaling on this box — while a real 4x-node cluster multiplies
controllers with nodes.

Usage: taskset -c 0-7 python scripts/membw.py 8
Prints one JSON line {"workers": N, "copy_gbps": X, "triad_gbps": Y}.
"""
from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _worker(n_bytes: int, reps: int, out):
    import numpy as np

    a = np.ones(n_bytes // 8, np.float64)
    b = np.empty_like(a)
    c = np.empty_like(a)
    # warm (fault pages)
    b[:] = a
    c[:] = a
    t0 = time.perf_counter()
    for _ in range(reps):
        b[:] = a                     # copy: 2x traffic
    t_copy = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        np.add(a, b, out=c)          # triad-ish: 3x traffic
    t_triad = time.perf_counter() - t0
    out.put((2 * n_bytes * reps / t_copy, 3 * n_bytes * reps / t_triad))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    per = 512 << 20  # 512 MB per worker: far beyond LLC
    reps = 6
    q = mp.Queue()
    ps = [mp.Process(target=_worker, args=(per, reps, q)) for _ in range(n)]
    t0 = time.perf_counter()
    for p in ps:
        p.start()
    res = [q.get() for _ in ps]
    for p in ps:
        p.join()
    wall = time.perf_counter() - t0
    copy = sum(r[0] for r in res) / 1e9
    triad = sum(r[1] for r in res) / 1e9
    print(json.dumps({"workers": n, "copy_gbps": round(copy, 1),
                      "triad_gbps": round(triad, 1),
                      "wall_s": round(wall, 1)}))


if __name__ == "__main__":
    main()
