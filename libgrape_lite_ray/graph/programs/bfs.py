"""BFS — hop depth from a source vertex
(examples/analytical_apps/bfs/bfs.h), expressed as min-propagation of
``depth+1`` along out-edges (use a symmetrized build for undirected
BFS).  Unreachable vertices output -1.

``source`` is a gid (callers translate oids via the vertex dict).
"""

from __future__ import annotations

import numpy as np

from .base import MinPropagation


class BFS(MinPropagation):
    name = "bfs"
    dtype = np.int32  # depths are tiny; 4-byte labels halve sweep traffic
    inf = 2**30

    def __init__(self, frag, source: int = 0, **kw):
        super().__init__(frag, **kw)
        self.source = int(source)

    def _init_vals(self) -> np.ndarray:
        f = self.frag
        vals = np.full(f.tvnum, self.inf, dtype=np.int32)
        if f.lo <= self.source < f.hi:
            vals[self.source - f.lo] = 0
        # a mirror of the source also starts at 0 (owner would sync it anyway)
        i = np.searchsorted(f.outer_gids, self.source)
        if i < f.ovnum and f.outer_gids[i] == self.source:
            vals[f.ivnum + i] = 0
        return vals

    def _relax(self, src_vals: np.ndarray, edge_idx=None) -> np.ndarray:
        return src_vals + 1

    def output(self):
        d = self.vals[: self.frag.ivnum].astype(np.int64)
        d[d >= self.inf] = -1
        return {"gid": self.frag.inner_gids(), "depth": d}
