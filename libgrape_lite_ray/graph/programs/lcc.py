"""LCC / triangle counting — exact semantics of
examples/analytical_apps/lcc/lcc.h:50-246 in three supersteps:

1. degree exchange (mirror sync of undirected degree);
2. oriented-adjacency exchange: every vertex keeps neighbors with
   (deg, gid) strictly smaller than its own (lcc.h:108-121 orientation
   — the skew guard that bounds per-vertex fanout on zipfian graphs),
   owners ship the oriented lists of their exported mirrors
   (SendMsgThroughOEdges of msg_vec, lcc.h:122-124); then wedge
   expansion + membership test counts triangles, attributing +1 to all
   three corners (lcc.h:154-186);
3. mirror triangle-count sum-sync back to owners
   (SyncStateOnOuterVertex, lcc.h:188-199), then
   ``lcc = 2*t / (deg*(deg-1))`` (lcc.h:222-231).

Run on a graph built with ``symmetrize=True`` (undirected).  The wedge
expansion is fully vectorized and chunked to bound memory.
"""

from __future__ import annotations

import numpy as np

from .base import VertexProgram

# Small chunks keep every per-wedge temporary L3-resident AND let the
# allocator reuse the same heap pages across chunks (first-touch page
# faults are expensive — especially under lazily-backed VM memory,
# where an 8M-wedge chunk measured 13x slower than 256k chunks for
# identical work).  Python per-chunk overhead is ~10us, negligible.
_CHUNK_WEDGES = 262_144


def _gather_segments(data: np.ndarray, indptr: np.ndarray, ids: np.ndarray):
    """Concatenate data[indptr[i]:indptr[i+1]] for i in ids; returns
    (gathered, lens)."""
    lens = (indptr[ids + 1] - indptr[ids]).astype(np.int64)
    total = int(lens.sum())
    if total == 0:
        return data[:0], lens
    starts = np.repeat(indptr[ids], lens)
    offs = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(lens)[:-1]]), lens
    )
    return data[starts + offs], lens


class LCC(VertexProgram):
    """Stages: 0 degree sync -> 1 adjacency REQUESTS (each partition
    asks owners only for the oriented lists of mirrors that actually
    appear in its oriented neighborhoods — without this, owners ship
    their whole oriented adjacency to every mirror holder, an O(P x E)
    exchange on mirror-dense web graphs) -> 2 adjacency shipping +
    wedge counting -> 3 tricnt sum-sync + coefficients."""

    name = "lcc"
    default_max_rounds = 5

    def init(self) -> dict:
        f = self.frag
        self.stage = 0
        self.deg_full = np.zeros(f.tvnum, dtype=np.int64)
        self.deg_full[: f.ivnum] = f.out_degree
        self.tricnt = np.zeros(f.tvnum, dtype=np.int64)
        self.requested: dict[int, np.ndarray] = {}
        self.done = False
        return {}

    # ---------------------------------------------------------- produce
    def mirror_values(self, rnd: int):
        if self.stage == 0:
            return self.frag.out_degree
        return None

    def messages(self, rnd: int) -> dict[int, tuple]:
        f = self.frag
        if self.stage == 1:
            # request oriented lists of the outer vertices we will probe
            out = {}
            outer_needed = np.unique(
                self.o_nbr_local_inner[self.o_nbr_local_inner >= f.ivnum]
            )
            gids = f.outer_gids[outer_needed - f.ivnum]
            owners = f.owner_of(gids)
            for q in np.unique(owners):
                sel = gids[owners == q]
                # second column carries the requester id (payloads are
                # anonymous arrays; the owner needs to know who asked)
                out[int(q)] = (sel, np.full(len(sel), f.part, dtype=np.int64))
            return out
        if self.stage == 2:
            # ship oriented adjacency for the vertices each requester asked
            out = {}
            for p, lids in self.requested.items():
                nbr_gids, lens = _gather_segments(self.o_nbr_gid_inner, self.o_indptr, lids)
                u_rep = np.repeat(f.lo + lids, lens)
                out[p] = (u_rep, nbr_gids)
            return out
        if self.stage == 3:
            out = {}
            for q in range(f.num_parts):
                a, b = f.mirror_bounds[q], f.mirror_bounds[q + 1]
                cnt = self.tricnt[f.ivnum + a: f.ivnum + b]
                m = cnt > 0
                if m.any():
                    out[q] = (f.outer_gids[a:b][m], cnt[m])
            return out
        return {}

    # ---------------------------------------------------------- update
    def update(self, rnd: int, outer_vals, msgs, pushes=()) -> int:
        f = self.frag
        if self.stage == 0:
            if outer_vals is not None:
                self.deg_full[f.ivnum:] = outer_vals
            self._orient()
            self.stage = 1
            return 1
        if self.stage == 1:
            self.requested = {}
            for m in msgs:
                if len(m[0]):
                    requester = int(m[1][0])
                    self.requested[requester] = np.asarray(m[0], dtype=np.int64) - f.lo
            self.stage = 2
            return 1
        if self.stage == 2:
            self.stage = 3
            self._count_triangles(msgs)
            return 1
        if self.stage == 3:
            if msgs:
                gids = np.concatenate([m[0] for m in msgs])
                cnts = np.concatenate([m[1] for m in msgs])
                np.add.at(self.tricnt, gids - f.lo, cnts)
            deg = f.out_degree
            t = self.tricnt[: f.ivnum]
            lcc = np.zeros(f.ivnum, dtype=np.float64)
            m = deg >= 2
            lcc[m] = 2.0 * t[m] / (deg[m] * (deg[m] - 1.0))
            self.lcc = lcc
            self.done = True
            self.stage = 4
            return 0
        return 0

    def _orient(self):
        """Keep neighbors with LARGER (deg, gid) — lcc.h:108-121's
        orientation.  This caps every oriented list at O(sqrt(m))
        (a hub keeps only its few larger-degree neighbors), which bounds
        wedge volume per vertex AND per partition on zipfian web graphs;
        the keep-smaller direction let mid-degree vertices expand hub
        lists and produced minutes-long wedge phases.

        Processed in bounded chunks: the E-sized gather/compare
        temporaries then reuse the same heap pages instead of
        first-touch-faulting ~10 fresh E-sized arrays (the faults, not
        the compute, dominated this stage)."""
        f = self.frag
        E = f.num_local_edges
        CH = 1 << 18
        keep = np.empty(E, dtype=bool)
        for s in range(0, E, CH):
            e = min(s + CH, E)
            idx = f.indices[s:e]
            src = f.src_of_edge[s:e]
            nd = self.deg_full[idx]
            vd = self.deg_full[src]
            inner = idx < f.ivnum
            nbr_gid = np.empty(e - s, dtype=np.int64)
            nbr_gid[inner] = f.lo + idx[inner]
            out_m = ~inner
            if out_m.any():
                nbr_gid[out_m] = f.outer_gids[idx[out_m] - f.ivnum]
            v_gid = f.lo + src
            keep[s:e] = (nd > vd) | ((nd == vd) & (nbr_gid > v_gid))
        o_src = f.src_of_edge[keep]
        lids = f.indices[keep].astype(np.int32)
        self.o_nbr_local_inner = lids
        inner = lids < f.ivnum
        gidn = np.empty(len(lids), dtype=np.int64)
        gidn[inner] = f.lo + lids[inner]
        out_m = ~inner
        if out_m.any():
            gidn[out_m] = f.outer_gids[lids[out_m] - f.ivnum]
        self.o_nbr_gid_inner = gidn
        lens = np.bincount(o_src, minlength=f.ivnum)
        self.o_indptr = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)

    def _count_triangles(self, msgs):
        """Stream-expanded wedge counting.

        The wedge (v, u, w) needs, for each adjacency ENTRY (u, w) —
        whether from this partition's own oriented inner lists or from a
        received mirror list — the set of inner v with oriented edge
        (v, u).  Grouping oriented inner edges BY TARGET u (compacted to
        the u values that occur: no tvnum-sized indptr) lets every entry
        expand against its v-list directly, so the unified per-u
        adjacency structure of the old kernel (4 tvnum-sized arrays +
        an adj-sized copy, all first-touch page faults on mirror-dense
        partitions) is never materialized; received lists are translated
        and expanded chunk-by-chunk and immediately discarded.

        Non-local w entries are dropped: the membership test needs an
        oriented inner edge (v, w), whose w is always local, so they
        can never close a triangle here.  Translation exploits the
        local-id layout (inner lid = gid - lo; outer lids index the
        SORTED outer_gids) — no tvnum-sized argsort.  Triangle hits are
        sparse relative to wedges, so per-wedge u/w attribution arrays
        are not materialized; the entry of each hit is recovered from
        its wedge position via a searchsorted over cumulative v-list
        lengths.  Reference semantics: lcc.h:154-186.
        """
        import os as _os
        import time as _time
        _prof = _os.environ.get("LGR_LCC_PROF")
        _t0 = _time.perf_counter()
        f = self.frag
        novnum = len(f.outer_gids)

        def to_local(gids):
            inner = (gids >= f.lo) & (gids < f.hi)
            out = np.empty(len(gids), dtype=np.int64)
            out[inner] = gids[inner] - f.lo
            om = ~inner
            found = inner
            if novnum:
                pos = np.minimum(np.searchsorted(f.outer_gids, gids[om]),
                                 novnum - 1)
                found[om] = f.outer_gids[pos] == gids[om]
                out[om] = f.ivnum + pos
            else:
                found[om] = False
            return out, found

        tv = f.tvnum
        tric = self.tricnt
        E = len(self.o_nbr_local_inner)
        n_wedges = 0
        if E:
            v_loc_edges = np.repeat(
                np.arange(f.ivnum, dtype=np.int32), np.diff(self.o_indptr))
            # membership keys: (v, w) for every oriented inner edge,
            # built with in-place ops (one fresh int64 array, one sort)
            key_set = v_loc_edges.astype(np.int64)
            key_set *= tv
            key_set += self.o_nbr_local_inner
            key_set.sort()
            # by-target v-lists, compacted to occurring u — packed
            # (u << 32 | v) single-key sort instead of argsort+gathers
            code = self.o_nbr_local_inner.astype(np.int64)
            code <<= 32
            code += v_loc_edges
            code.sort()
            u_sorted = code >> 32
            v_by_u = (code & 0xFFFFFFFF).astype(np.int32)
            nb = np.empty(E, dtype=bool)
            nb[0] = True
            np.not_equal(u_sorted[1:], u_sorted[:-1], out=nb[1:])
            uniq_starts = np.flatnonzero(nb)
            uniq_u = u_sorted[uniq_starts]
            byu_indptr = np.append(uniq_starts, E).astype(np.int64)
            byu_lens = np.diff(byu_indptr)
        _t1 = _time.perf_counter()

        def expand(u_ent, w_ent):
            # u_ent/w_ent: one chunk of adjacency entries (local ids)
            nonlocal n_wedges, tric
            ci = np.minimum(np.searchsorted(uniq_u, u_ent), len(uniq_u) - 1)
            ok = uniq_u[ci] == u_ent
            u_k, w_k, ci = u_ent[ok], w_ent[ok], ci[ok]
            if not len(u_k):
                return
            lens_v = byu_lens[ci]
            cum = np.cumsum(lens_v)
            n_wedges += int(cum[-1]) if len(cum) else 0
            s = 0
            while s < len(u_k):
                base = cum[s - 1] if s else 0
                e = min(int(np.searchsorted(cum, base + _CHUNK_WEDGES)) + 1,
                        len(u_k))
                v_g, lens_w = _gather_segments(v_by_u, byu_indptr, ci[s:e])
                if len(v_g):
                    keys = v_g.astype(np.int64)
                    keys *= tv
                    keys += np.repeat(w_k[s:e], lens_w)
                    pos = np.minimum(np.searchsorted(key_set, keys),
                                     len(key_set) - 1)
                    member = key_set[pos] == keys
                    hit = np.flatnonzero(member)
                    if len(hit):
                        cum_w = np.cumsum(lens_w)
                        ent = np.searchsorted(cum_w, hit, side="right")
                        hits = np.concatenate(
                            [v_g[hit], u_k[s:e][ent], w_k[s:e][ent]])
                        tric += np.bincount(hits, minlength=tv)
                s = e

        _CH = 1 << 18
        if E:
            # own oriented inner lists: entry (u=src, w=nbr)
            for s in range(0, E, _CH):
                e = min(s + _CH, E)
                expand(v_loc_edges[s:e], self.o_nbr_local_inner[s:e])
            # received mirror lists, translated per chunk
            for m in msgs:
                u_gids = np.asarray(m[0], dtype=np.int64)
                w_gids = np.asarray(m[1], dtype=np.int64)
                for s in range(0, len(u_gids), _CH):
                    e = min(s + _CH, len(u_gids))
                    ul, uf = to_local(u_gids[s:e])
                    wl, wf = to_local(w_gids[s:e])
                    kf = uf & wf
                    if kf.any():
                        expand(ul[kf], wl[kf])
        if _prof:
            _t2 = _time.perf_counter()
            n_recv = sum(len(m[0]) for m in msgs)
            print(f"[lccprof p={f.part}] tvnum={f.tvnum} ivnum={f.ivnum} "
                  f"recv={n_recv} wedges={n_wedges} "
                  f"index={_t1 - _t0:.2f}s expand={_t2 - _t1:.2f}s",
                  flush=True)

    def output(self):
        return {
            "gid": self.frag.inner_gids(),
            "tricnt": self.tricnt[: self.frag.ivnum],
            "lcc": self.lcc,
        }

    def state_dict(self):
        arrays = {"tricnt": self.tricnt, "deg_full": self.deg_full}
        if self.stage >= 1:
            arrays["o_nbr_local_inner"] = self.o_nbr_local_inner
            arrays["o_nbr_gid_inner"] = self.o_nbr_gid_inner
            arrays["o_indptr"] = self.o_indptr
        if self.requested:
            arrays["req_parts"] = np.concatenate(
                [np.full(len(v), p, dtype=np.int64) for p, v in self.requested.items()]
            )
            arrays["req_lids"] = np.concatenate(list(self.requested.values()))
        if self.done:
            arrays["lcc"] = self.lcc
        return arrays, {"stage": self.stage, "done": bool(self.done)}

    def load_state(self, arrays, scalars):
        self.tricnt = arrays["tricnt"]
        self.deg_full = arrays["deg_full"]
        self.stage = int(scalars["stage"])
        self.done = bool(scalars["done"])
        if self.stage >= 1:
            self.o_nbr_local_inner = arrays["o_nbr_local_inner"]
            self.o_nbr_gid_inner = arrays["o_nbr_gid_inner"]
            self.o_indptr = arrays["o_indptr"]
        self.requested = {}
        if "req_parts" in arrays:
            rp, rl = arrays["req_parts"], arrays["req_lids"]
            for p in np.unique(rp):
                self.requested[int(p)] = rl[rp == p]
        if self.done:
            self.lcc = arrays["lcc"]
