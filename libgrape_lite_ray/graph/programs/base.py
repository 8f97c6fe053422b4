"""VertexProgram protocol + MinPropagation base.

The contract (driver round r = 1, 2, ...):

1. ``mirror_values(r)`` -> inner value array or None.  If not None the
   driver syncs slices to every partition holding mirrors (the
   BatchShuffle dense exchange,
   grape/app/batch_shuffle_app_base.h:29-83).
2. ``messages(r)`` -> {dst_part: tuple_of_np_arrays} sparse messages,
   already combined per destination (the combiner the reference applies
   via SyncBuffer aggregators, grape/parallel/sync_buffer.h:53-129).
3. ``update(r, outer_vals, msgs)`` -> active count.  ``outer_vals`` is
   the assembled full-length buffer segment for mirrors (or None),
   ``msgs`` the list of received tuples.  The driver terminates when
   the global active total is 0 (zero-pending termination,
   grape/parallel/default_message_manager.h:324-350).

Programs that need a global scalar before round 1 (PageRank's dangling
count, grape/communication/communicator.h Sum) return partials from
``init``; the driver sums value-wise and calls ``set_globals``.
"""

from __future__ import annotations

import numpy as np

from ..fragment import Fragment

__all__ = ["VertexProgram", "MinPropagation"]


class VertexProgram:
    name = "base"
    # default rounds cap if caller gives none
    default_max_rounds = 10**9

    def __init__(self, frag: Fragment, **params):
        self.frag = frag
        self.params = params

    # lifecycle ------------------------------------------------------
    def init(self) -> dict:
        return {}

    def set_globals(self, agg: dict):
        pass

    def mirror_values(self, rnd: int):
        return None

    def messages(self, rnd: int) -> dict[int, tuple]:
        return {}

    def update(self, rnd: int, outer_vals, msgs: list[tuple]) -> int:
        raise NotImplementedError

    def output(self) -> dict[str, np.ndarray]:
        raise NotImplementedError

    # checkpointing --------------------------------------------------
    def state_dict(self) -> tuple[dict, dict]:
        """(arrays, scalars) capturing everything across-round."""
        return {}, {}

    def load_state(self, arrays: dict, scalars: dict):
        pass


class MinPropagation(VertexProgram):
    """Shared engine for WCC / BFS / SSSP: monotone min state propagated
    push-style along out-edges, with per-partition local fixpoint per
    superstep and min-combined mirror messages
    (wcc/wcc.h PropagateLabelPush + sssp/sssp.h relax analog).

    Subclasses define ``_init_vals`` and ``_relax(edge_src_vals)``.
    """

    dtype = np.int64
    inf = np.iinfo(np.int64).max // 2

    def _init_vals(self) -> np.ndarray:
        raise NotImplementedError

    def _relax(self, src_vals: np.ndarray, edge_idx: np.ndarray | None = None) -> np.ndarray:
        """Per-edge candidate value for the edge's destination.
        ``edge_idx=None`` means all edges in CSR order."""
        return src_vals

    def init(self) -> dict:
        f = self.frag
        self.vals = self._init_vals()  # full length tvnum
        self.pending = np.zeros(f.ovnum, dtype=bool)
        self._dirty = True  # force a first local fixpoint in round 1
        return {}

    def _local_fixpoint(self, frontier: np.ndarray | None = None):
        """Propagate to a per-partition fixpoint.  Dense sweeps
        (reduceat over all edges) while the frontier is wide, switching
        to frontier-only scatter when it narrows — the reference's
        push/pull density switch (wcc/wcc.h:198-208 rate > 0.1)."""
        f = self.frag
        vals = self.vals
        if frontier is None:
            frontier = np.arange(f.ivnum, dtype=np.int64)
        while len(frontier):
            if len(frontier) * 8 > f.ivnum:
                before = vals.copy()
                f.push_min(vals, self._relax(vals[f.src_of_edge]))
                changed = vals < before
                self.pending |= changed[f.ivnum:]
                frontier = np.flatnonzero(changed[: f.ivnum])
            else:
                eidx, lens = f.gather_edges(frontier)
                if len(eidx) == 0:
                    break
                tgts = f.indices[eidx]
                cand = self._relax(vals[np.repeat(frontier, lens)], eidx)
                ut = np.unique(tgts)
                before_u = vals[ut].copy()
                np.minimum.at(vals, tgts, cand)
                changed_u = ut[vals[ut] < before_u]
                outer = changed_u[changed_u >= f.ivnum]
                self.pending[outer - f.ivnum] = True
                frontier = changed_u[changed_u < f.ivnum]

    def messages(self, rnd: int) -> dict[int, tuple]:
        f = self.frag
        out = {}
        if self.pending.any():
            for q in range(f.num_parts):
                a, b = f.mirror_bounds[q], f.mirror_bounds[q + 1]
                m = self.pending[a:b]
                if m.any():
                    gids = f.outer_gids[a:b][m]
                    v = self.vals[f.ivnum + a: f.ivnum + b][m]
                    out[q] = (gids, v)
            self.pending[:] = False
        return out

    def update(self, rnd: int, outer_vals, msgs: list[tuple]) -> int:
        f = self.frag
        changed = 0
        frontier = None
        if msgs:
            gids = np.concatenate([m[0] for m in msgs])
            vv = np.concatenate([m[1] for m in msgs])
            lids = np.unique(gids - f.lo)
            before = self.vals[lids].copy()
            np.minimum.at(self.vals, gids - f.lo, vv)
            frontier = lids[self.vals[lids] < before]
            changed = len(frontier)
        if self._dirty:
            self._dirty = False
            self._local_fixpoint(None)
        elif changed:
            self._local_fixpoint(frontier)
        return changed + int(self.pending.sum())

    def state_dict(self):
        return ({"vals": self.vals, "pending": self.pending}, {"dirty": bool(self._dirty)})

    def load_state(self, arrays, scalars):
        self.vals = arrays["vals"]
        self.pending = arrays["pending"].astype(bool)
        self._dirty = bool(scalars.get("dirty", False))
