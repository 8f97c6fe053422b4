"""Neighbor sampling — the batch analog of the reference's GNN sampler
strategies (examples/gnn_sampler/sampler.h:154-205 random sampling,
sampler_context.h:50-57 top-k-by-weight; RNG seeded per partition like
the per-thread xoroshiro state, sampler.h:63-68).

One superstep, no exchange: every inner vertex samples up to ``k`` of
its out-neighbors (gids).  ``strategy``:

- ``random``: uniform without replacement, deterministic per
  (seed, partition);
- ``topk``: highest edge weight first (requires a weighted graph),
  ties broken by neighbor gid — deterministic.

Multi-hop sampling composes by re-running over the frontier of sampled
vertices (driver loop), as the reference's hop_and_num walk does.
"""

from __future__ import annotations

import numpy as np

from .base import VertexProgram


class SampleNeighbors(VertexProgram):
    name = "sample_neighbors"
    default_max_rounds = 1

    def __init__(self, frag, k: int = 5, strategy: str = "random", seed: int = 42, **kw):
        super().__init__(frag, **kw)
        self.k = int(k)
        self.strategy = strategy
        self.seed = int(seed)

    def init(self) -> dict:
        return {}

    def update(self, rnd: int, outer_vals, msgs) -> int:
        f = self.frag
        k = self.k
        rng = np.random.default_rng([self.seed, f.part])
        all_gids = f.all_gids()
        rowlens = np.diff(f.indptr)
        out_src, out_dst = [], []
        # vectorized per-rowlen-bucket would be nicer; rows are iterated
        # but each row's work is numpy (fine for sampling workloads where
        # k << degree and the output dominates)
        for v in np.flatnonzero(rowlens > 0):
            lo, hi = f.indptr[v], f.indptr[v + 1]
            nbrs = all_gids[f.indices[lo:hi]]
            if self.strategy == "topk" and f.edge_w is not None:
                w = f.edge_w[lo:hi]
                order = np.lexsort((nbrs, -w))[:k]
                chosen = nbrs[order]
            elif len(nbrs) <= k:
                chosen = nbrs
            else:
                chosen = nbrs[rng.choice(len(nbrs), size=k, replace=False)]
            out_src.extend([f.lo + v] * len(chosen))
            out_dst.extend(chosen.tolist())
        self._src = np.asarray(out_src, np.int64)
        self._dst = np.asarray(out_dst, np.int64)
        return 0

    def output(self):
        return {"gid": self._src, "sampled_gid": self._dst}

    def state_dict(self):
        return ({"src": getattr(self, "_src", np.empty(0, np.int64)),
                 "dst": getattr(self, "_dst", np.empty(0, np.int64))}, {})

    def load_state(self, arrays, scalars):
        self._src, self._dst = arrays["src"], arrays["dst"]
