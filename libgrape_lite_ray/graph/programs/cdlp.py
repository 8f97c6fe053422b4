"""CDLP — synchronous label propagation, LDBC variant
(examples/analytical_apps/cdlp/cdlp.h + cdlp_utils.h:28-60):

- labels start as vertex ids (gids == oid rank, so id-labels == the
  reference's oid labels);
- exactly ``rounds`` propagation steps over the undirected graph
  (build with ``symmetrize=True``);
- new label = most frequent neighbor label, smallest on ties
  (cdlp_utils.h sorts ascending and requires a strictly greater count
  to replace the running best);
- neighbor-less vertices keep their label.

Exchange = dense mirror sync of the label array each round.  The mode
is computed vectorized.  Fast path (labels fit in 32 bits): pack each
(vertex, neighbor-label) pair into ONE int64 key ``(seg << 32) | lab``
and value-sort it — a single-key in-place sort is ~15-20x cheaper than
the two stable argsort passes of ``np.lexsort`` plus the permutation
gathers, and since the CSR already groups edges by source the high
bits arrive pre-ordered.  Runs of the sorted key are (vertex, label)
groups; the per-vertex winner (max count, min label on ties — runs are
label-ascending so first-max wins) is picked with two ``reduceat``
sweeps.  Fallback for >2^31 vertex ids: the original lexsort.
"""

from __future__ import annotations

import numpy as np

from .base import VertexProgram


class CDLP(VertexProgram):
    name = "cdlp"

    def __init__(self, frag, rounds: int = 10, **kw):
        super().__init__(frag, **kw)
        self.rounds = int(rounds)

    def init(self) -> dict:
        # int32 labels when gids fit: halves the lexsort + exchange
        # traffic of the per-round dense sync (output casts back)
        dt = np.int32 if int(self.frag.starts[-1]) < 2**31 - 1 else np.int64
        self.labels = self.frag.all_gids().astype(dt)
        # precomputed high halves of the packed sort keys (fast path):
        # src_of_edge never changes, so pay the widening shift once
        self._seg_hi = (
            self.frag.src_of_edge.astype(np.int64) << 32
            if dt == np.int32 and self.frag.num_local_edges
            else None
        )
        self.step = 0
        self.done = self.rounds <= 0
        return {}

    def mirror_values(self, rnd: int):
        return None if self.done else self.labels[: self.frag.ivnum]

    def _mode(self) -> np.ndarray:
        f = self.frag
        new = self.labels[: f.ivnum].copy()
        if f.num_local_edges == 0:
            return new
        lab = self.labels[f.indices]
        if self._seg_hi is not None:
            # packed single-key path: one in-place int64 value sort
            key = self._seg_hi + lab  # lab in [0, 2^31) => add == bitwise-or
            key.sort()
            newrun = np.empty(len(key), dtype=bool)
            newrun[0] = True
            np.not_equal(key[1:], key[:-1], out=newrun[1:])
            run_starts = np.flatnonzero(newrun)
            run_key = key[run_starts]
            run_counts = np.diff(np.append(run_starts, len(key)))
            run_seg = run_key >> 32
            segrun = np.empty(len(run_key), dtype=bool)
            segrun[0] = True
            np.not_equal(run_seg[1:], run_seg[:-1], out=segrun[1:])
            seg_starts = np.flatnonzero(segrun)
            seg_max = np.maximum.reduceat(run_counts, seg_starts)
            is_max = run_counts == seg_max[np.cumsum(segrun) - 1]
            # runs are label-ascending within a segment, so the FIRST
            # max-count run is the smallest-label winner
            cand = np.where(is_max, np.arange(len(run_counts)), len(run_counts))
            win = np.minimum.reduceat(cand, seg_starts)
            new[run_seg[seg_starts]] = (run_key[win] & 0xFFFFFFFF).astype(new.dtype)
            return new
        seg = f.src_of_edge
        order = np.lexsort((lab, seg))
        l_s, s_s = lab[order], seg[order]
        newrun = np.empty(len(l_s), dtype=bool)
        newrun[0] = True
        newrun[1:] = (s_s[1:] != s_s[:-1]) | (l_s[1:] != l_s[:-1])
        run_starts = np.flatnonzero(newrun)
        run_seg = s_s[run_starts]
        run_label = l_s[run_starts]
        run_counts = np.diff(np.append(run_starts, len(l_s)))
        sel = np.lexsort((run_label, -run_counts, run_seg))
        seg_sorted = run_seg[sel]
        first = np.flatnonzero(
            np.concatenate([[True], seg_sorted[1:] != seg_sorted[:-1]])
        )
        new[seg_sorted[first]] = run_label[sel][first]
        return new

    def update(self, rnd: int, outer_vals, msgs, pushes=()) -> int:
        if self.done:
            return 0
        f = self.frag
        if outer_vals is not None and f.ovnum:
            self.labels[f.ivnum:] = outer_vals
        self.labels[: f.ivnum] = self._mode()
        self.step += 1
        if self.step >= self.rounds:
            self.done = True
            return 0
        return 1

    def output(self):
        return {"gid": self.frag.inner_gids(),
                "label": self.labels[: self.frag.ivnum].astype(np.int64)}

    def state_dict(self):
        return ({"labels": self.labels}, {"step": self.step, "done": bool(self.done)})

    def load_state(self, arrays, scalars):
        self.labels = arrays["labels"]
        self._seg_hi = (
            self.frag.src_of_edge.astype(np.int64) << 32
            if self.labels.dtype == np.int32 and self.frag.num_local_edges
            else None
        )
        self.step = int(scalars["step"])
        self.done = bool(scalars["done"])
