"""SSSP — single-source shortest weighted path
(examples/analytical_apps/sssp/sssp.h), as min-propagation of
``dist + w`` along out-edges.  Requires a graph built with a weight
column (weighted graphs keep multi-edges; min over parallel edges is
what relaxation computes anyway).  Unreachable = +inf (the reference
prints "infinity", sssp_auto_context.h:66-72).
"""

from __future__ import annotations

import numpy as np

from .base import MinPropagation


class SSSP(MinPropagation):
    name = "sssp"
    dtype = np.float64
    inf = np.inf

    def __init__(self, frag, source: int = 0, **kw):
        super().__init__(frag, **kw)
        self.source = int(source)

    def _init_vals(self) -> np.ndarray:
        f = self.frag
        vals = np.full(f.tvnum, np.inf, dtype=np.float64)
        if f.lo <= self.source < f.hi:
            vals[self.source - f.lo] = 0.0
        i = np.searchsorted(f.outer_gids, self.source)
        if i < f.ovnum and f.outer_gids[i] == self.source:
            vals[f.ivnum + i] = 0.0
        return vals

    def _relax(self, src_vals: np.ndarray, edge_idx=None) -> np.ndarray:
        w = self.frag.edge_w if edge_idx is None else self.frag.edge_w[edge_idx]
        return src_vals + w

    def _relax_csc(self, src_vals: np.ndarray) -> np.ndarray:
        return src_vals + self.frag.w_by_tgt

    def output(self):
        return {"gid": self.frag.inner_gids(), "dist": self.vals[: self.frag.ivnum]}
