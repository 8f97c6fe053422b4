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
is computed vectorized, with three per-round regimes:

- **First propagation step**: every label is its vertex's gid, so all
  labels are globally distinct — every neighbor-label count is exactly
  1 and the strict-greater tiebreak degenerates to "smallest neighbor
  label".  ``np.minimum.reduceat`` over the CSR segments, no sort at
  all (~25x cheaper than the sorted path on the all-distinct round,
  which is also the round with the most runs to extract).
- **Sorted path** (labels fit in 32 bits): pack each (vertex,
  neighbor-label) pair into ONE int64 key ``(seg << 32) | lab`` and
  value-sort it — a single-key in-place sort is ~15-20x cheaper than
  the two stable argsort passes of ``np.lexsort``.  The sort KIND is
  adaptive: once few labels changed last round, the packed key stream
  is nearly sorted (CSR pre-orders the high bits and converged
  neighborhoods produce long equal-label runs), where timsort
  (``kind='stable'``) is ~13x faster than introsort (9ms vs 120ms on a
  4.8M-edge web fragment); on high-entropy rounds introsort wins
  (~2.4x), so the kind switches on the previous round's changed count.
  Runs of the sorted key are (vertex, label) groups; the per-vertex
  winner (max count, min label on ties — runs are label-ascending so
  first-max wins) is picked with two ``reduceat`` sweeps.
- Fallback for >2^31 vertex ids: the original lexsort.
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
        # labels start as gids -> globally distinct: the first _mode is
        # a pure min-reduce (see module docstring).  Only valid when the
        # adjacency is multi-edge-free: weighted graphs retain parallel
        # edges by design, so a twice-seen neighbor has label count 2
        # and the true mode can differ from the min neighbor label.
        self._all_distinct = self.frag.edge_w is None
        # changed-count from the previous round drives the adaptive
        # sort kind; init high = assume high entropy
        self._prev_changed = self.frag.ivnum
        return {}

    def mirror_values(self, rnd: int):
        return None if self.done else self.labels[: self.frag.ivnum]

    def _mode(self) -> np.ndarray:
        f = self.frag
        new = self.labels[: f.ivnum].copy()
        if f.num_local_edges == 0:
            return new
        lab = self.labels[f.indices]
        if self._all_distinct:
            # every neighbor label has count 1: mode == min neighbor
            # label.  reduceat quirk: an empty segment yields
            # lab[indptr[i]] (and indptr[i] may equal E for trailing
            # empty rows) — clip the index and mask by degree.
            self._all_distinct = False
            idx = np.minimum(f.indptr[:-1], f.num_local_edges - 1)
            seg_min = np.minimum.reduceat(lab, idx)
            nz = f.out_degree > 0
            new[nz] = seg_min[nz].astype(new.dtype)
            return new
        if self._seg_hi is not None:
            # packed single-key path: one in-place int64 value sort;
            # timsort once the label stream is nearly converged
            kind = ("stable" if self._prev_changed * 8 < f.ivnum
                    else "quicksort")
            key = self._seg_hi + lab  # lab in [0, 2^31) => add == bitwise-or
            key.sort(kind=kind)
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
        new = self._mode()
        self._prev_changed = int(np.count_nonzero(new != self.labels[: f.ivnum]))
        self.labels[: f.ivnum] = new
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
        # resumed mid-run: labels are no longer the distinct init gids
        # (step 0 checkpoints restart via init instead), and assume
        # high entropy for the first resumed sort
        self._all_distinct = self.step == 0
        self._prev_changed = self.frag.ivnum
