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

    def _relax(self, src_vals: np.ndarray) -> np.ndarray:
        """Per-edge candidate value for the edge's destination."""
        return src_vals

    def init(self) -> dict:
        f = self.frag
        self.vals = self._init_vals()  # full length tvnum
        self.pending = np.zeros(f.ovnum, dtype=bool)
        self._dirty = True  # force a first local fixpoint in round 1
        return {}

    def _local_fixpoint(self):
        f = self.frag
        vals = self.vals
        while True:
            before_inner = vals[: f.ivnum].copy()
            before_outer = vals[f.ivnum:].copy()
            src_vals = vals[f.src_of_edge]
            f.push_min(vals, self._relax(src_vals))
            outer_changed = vals[f.ivnum:] < before_outer
            self.pending |= outer_changed
            if not (vals[: f.ivnum] < before_inner).any() and not outer_changed.any():
                break

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
        if msgs:
            gids = np.concatenate([m[0] for m in msgs])
            vv = np.concatenate([m[1] for m in msgs])
            lids = gids - f.lo
            before = self.vals[: f.ivnum].copy()
            np.minimum.at(self.vals, lids, vv)
            changed = int((self.vals[: f.ivnum] < before).sum())
        if changed or self._dirty:
            self._dirty = False
            self._local_fixpoint()
        return changed + int(self.pending.sum())

    def state_dict(self):
        return ({"vals": self.vals, "pending": self.pending}, {"dirty": bool(self._dirty)})

    def load_state(self, arrays, scalars):
        self.vals = arrays["vals"]
        self.pending = arrays["pending"].astype(bool)
        self._dirty = bool(scalars.get("dirty", False))
