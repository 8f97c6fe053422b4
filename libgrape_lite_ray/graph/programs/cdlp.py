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
is computed vectorized: per-edge (vertex, neighbor-label) pairs are
lexsorted, run-length encoded, and the winner per vertex selected with
a (count desc, label asc) ordering — no Python loop.
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
        self.step = int(scalars["step"])
        self.done = bool(scalars["done"])
