"""Fragment: one contiguous-gid-range partition of the graph held as a
CSR block with mirror (outer-vertex) bookkeeping — the Ray-native
analog of grape/fragment/immutable_edgecut_fragment.h:69-301.

Layout (all NumPy, built once per actor from the partitioned Parquet
spool, cf. ImmutableEdgecutFragment::Init):

- inner vertices: gids ``[lo, hi)``; local id = gid - lo.
- ``indptr/indices``: CSR of out-edges of inner vertices; neighbor
  local index < ivnum for inner, else ``ivnum + rank`` in the sorted
  ``outer_gids`` array (ovg2l analog,
  immutable_edgecut_fragment.h:399-411).
- per-vertex neighbor lists are sorted by gid (immutable_csr.h:100-107)
  which also makes float reductions order-stable across partition
  counts.
- ``outer_gids`` sorted ascending; because partitions are contiguous
  gid ranges, mirrors of one owner form a contiguous slice — mirror
  request lists (csr_edgecut_fragment_base.h:228-268 IOEDests analog)
  are free.
- a CSC-style transpose (``tgt_order/tgt_starts/tgt_unique``) built
  once for vectorized push-style updates (np.minimum/add.reduceat over
  edges grouped by destination).
"""

from __future__ import annotations

import glob
import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..ids import part_of

__all__ = ["Fragment"]

_SNAP_ARRAYS = ("indices", "indptr", "outer_gids",
                "tgt_order", "tgt_starts", "tgt_unique", "out_degree",
                "src_by_tgt", "src_of_edge")
_SNAP_OPTIONAL = ("edge_w", "w_by_tgt")


class Fragment:
    def __init__(self, part_id: int, work_dir: str, starts: np.ndarray,
                 has_weights: bool = False, sorted_spool: bool = False,
                 vdata_cols: list[str] | None = None):
        self.part = int(part_id)
        self.starts = np.asarray(starts, dtype=np.int64)
        self.num_parts = len(self.starts) - 1
        self.lo = int(self.starts[self.part])
        self.hi = int(self.starts[self.part + 1])
        self.ivnum = self.hi - self.lo
        self.has_weights = has_weights

        files = sorted(glob.glob(os.path.join(work_dir, "edges", f"part={self.part}", "*.parquet")))
        # snapshot fast path (Serialize/Deserialize analog,
        # immutable_edgecut_fragment.h:303-376): the finished CSR +
        # transpose arrays are persisted once per partition, keyed by a
        # fingerprint of the spool file list, and later loads skip the
        # parquet read / sort / unique / transpose build entirely.
        self._snap_path = self._snapshot_path(work_dir, files)
        if self._snap_path and os.path.exists(self._snap_path):
            if self._load_snapshot():
                self._load_vdata(work_dir, vdata_cols)
                return
            # schema drift (snapshot from an older layout): rebuild
            import shutil

            try:
                shutil.rmtree(self._snap_path) if os.path.isdir(self._snap_path) \
                    else os.remove(self._snap_path)
            except OSError:
                pass
        if files:
            cols = ["src_gid", "dst_gid"] + (["w"] if has_weights else [])
            # use_threads=False: each fragment actor holds a fractional
            # CPU; Arrow's default per-process thread pool (one thread
            # per core, PER ACTOR) oversubscribes the node ~32x and made
            # the parallel load SLOWER than a sequential one
            t = pa.concat_tables([pq.read_table(f, columns=cols, use_threads=False)
                                  for f in files])
            src = t.column("src_gid").to_numpy(zero_copy_only=False).astype(np.int64)
            dst = t.column("dst_gid").to_numpy(zero_copy_only=False).astype(np.int64)
            w = t.column("w").to_numpy(zero_copy_only=False).astype(np.float64) if has_weights else None
        else:
            src = np.empty(0, np.int64)
            dst = np.empty(0, np.int64)
            w = np.empty(0, np.float64) if has_weights else None

        # sort by (src, dst) — skipped when the build pre-sorted the
        # spool (files are (min_src,min_dst)-named so sorted glob order
        # == gid order).  Even then, VERIFY monotonicity of the
        # concatenated stream (one O(E) vectorized pass, trivially cheap
        # vs the parquet read): duplicate (src,dst) keys straddling a
        # sort-output block boundary can tie on the filename prefix and
        # land in uuid order.  Silent CSR corruption otherwise — see
        # VERDICT.md round-1 bug #1.  Then dedup unless weighted.
        need_sort = not sorted_spool
        if sorted_spool and len(src) > 1:
            mono = (src[1:] > src[:-1]) | ((src[1:] == src[:-1]) & (dst[1:] >= dst[:-1]))
            need_sort = not bool(mono.all())
        self._finalize(src, dst, w, need_sort)
        self.loaded_from_snapshot = False
        # snapshot write is ASYNC: ~50-100MB of arrays per partition
        # would otherwise serialize into every FIRST load (5s+ across an
        # actor pool).  tmp-dir + atomic rename keeps a torn write
        # invisible — worst case the next load just rebuilds.
        import threading

        self._snap_thread = threading.Thread(target=self._write_snapshot, daemon=True)
        self._snap_thread.start()
        self._load_vdata(work_dir, vdata_cols)

    # ---------------------------------------------------------- snapshot
    def _snapshot_path(self, work_dir: str, files: list[str]) -> str | None:
        """Snapshot DIRECTORY keyed by a fingerprint of the spool file
        list (names + sizes): any rebuild of the spool changes the
        uuid-named files, so a stale snapshot can never be read for
        fresh data.  One raw ``.npy`` per array so reloads can
        memory-map (``mmap_mode='r'``): file-backed pages come from the
        page cache instead of fresh anonymous memory — on virtualized
        hosts (see memtune) a cold anonymous refault costs ~40us/page,
        so mapping a still-cached snapshot is 10-100x faster than
        np.load-into-heap, and it is shared read-only across processes.
        The reference analog is Serialize/Deserialize
        (immutable_edgecut_fragment.h:303-376)."""
        if not files:
            return None
        h = hashlib.md5()
        for f in files:
            h.update(os.path.basename(f).encode())
            h.update(str(os.path.getsize(f)).encode())
        return os.path.join(work_dir, "snapshot",
                            f"part={self.part}-{h.hexdigest()[:16]}")

    def _write_snapshot(self):
        if self._snap_path is None or os.path.isdir(self._snap_path):
            return
        os.makedirs(os.path.dirname(self._snap_path), exist_ok=True)
        # drop stale snapshots of this partition (older spool versions).
        # Skip ALL in-flight tmp dirs regardless of fingerprint — a
        # concurrent writer for a DIFFERENT fingerprint must not have
        # its tmp dir rmtree'd mid-write; orphans (killed writers) are
        # instead age-gated so they can't accumulate forever.
        import shutil
        import time as _time

        for old in glob.glob(os.path.join(
                os.path.dirname(self._snap_path), f"part={self.part}-*")):
            if old == self._snap_path:
                continue
            if ".tmp-" in os.path.basename(old):
                try:  # orphaned tmp of a killed writer: reap after 1h
                    if _time.time() - os.path.getmtime(old) < 3600:
                        continue
                except OSError:
                    continue
            try:
                shutil.rmtree(old) if os.path.isdir(old) else os.remove(old)
            except OSError:
                pass
        arrays = {k: getattr(self, k) for k in _SNAP_ARRAYS}
        if self.edge_w is not None:
            arrays["edge_w"] = self.edge_w
            arrays["w_by_tgt"] = self.w_by_tgt
        # tmp dir + atomic rename: a torn write is invisible — the next
        # load just rebuilds from the spool.  The whole body is fenced:
        # a concurrent reaper removing this tmp dir mid-write must not
        # crash the daemon thread (the snapshot is simply not written).
        tmp = f"{self._snap_path}.tmp-{os.getpid()}"
        try:
            os.makedirs(tmp, exist_ok=True)
            for k, v in arrays.items():
                np.save(os.path.join(tmp, f"{k}.npy"), v)
            os.rename(tmp, self._snap_path)
        except OSError:  # concurrent writer won the race / tmp reaped
            shutil.rmtree(tmp, ignore_errors=True)

    def _load_snapshot(self) -> bool:
        def _arr(name, required):
            p = os.path.join(self._snap_path, f"{name}.npy")
            if not os.path.exists(p):
                return None if not required else False
            try:
                return np.load(p, mmap_mode="r", allow_pickle=False)
            except ValueError:  # zero-length mmap etc: plain read
                return np.load(p, allow_pickle=False)

        if not os.path.isdir(self._snap_path):
            return False
        loaded = {}
        for k in _SNAP_ARRAYS:
            a = _arr(k, required=True)
            if a is False:
                return False  # older snapshot layout: rebuild
            loaded[k] = a
        for k, v in loaded.items():
            setattr(self, k, v)
        self.edge_w = _arr("edge_w", required=False)
        self.w_by_tgt = _arr("w_by_tgt", required=False)
        self.num_local_edges = len(self.indices)
        self.ovnum = len(self.outer_gids)
        self.tvnum = self.ivnum + self.ovnum
        self.mirror_bounds = np.searchsorted(self.outer_gids, self.starts)
        self.export_lids = {}
        self.loaded_from_snapshot = True
        # pre-fault every mapped array (one sequential pass each): pages
        # are otherwise faulted lazily DURING the first superstep, which
        # showed up as 5s+ straggler rounds.  Reads come from the page
        # cache (or disk at sequential speed) — never cold anon memory.
        for k in _SNAP_ARRAYS:
            np.asarray(getattr(self, k)).sum()
        if self.edge_w is not None:
            np.asarray(self.edge_w).sum()
            np.asarray(self.w_by_tgt).sum()
        # LGR_CSR_HEAP=1 (diagnostic only, default OFF): materialize
        # the mapped arrays into the (resident, see memtune) heap.
        # Rationale was host-side page-cache reclaim evicting mmap'd
        # CSR pages mid-run (2-3x jitter on WCC reps on a busy box);
        # measured A/B on a quiet box (2026-08-18, 32 hosts, 300M
        # edges) shows the heap copy makes the directed PageRank apply
        # phase 2.1x SLOWER (8.2s vs 3.96s, tight reps both ways) —
        # keep the default mmap path (shared pages, instant reloads).
        if os.environ.get("LGR_CSR_HEAP"):
            for k in _SNAP_ARRAYS:
                setattr(self, k, np.array(getattr(self, k)))
            if self.edge_w is not None:
                self.edge_w = np.array(self.edge_w)
                self.w_by_tgt = np.array(self.w_by_tgt)
        return True

    def _load_vdata(self, work_dir: str, vdata_cols):
        # per-vertex property columns (VDATA,
        # immutable_edgecut_fragment.h:109-114): dense inner arrays now;
        # the outer (mirror) segment is filled by the engine's one-time
        # vdata sync (vdata_full, len tvnum)
        self.vdata: dict[str, np.ndarray] = {}
        self.vdata_full: dict[str, np.ndarray] = {}
        if not vdata_cols:
            return
        vfiles = sorted(glob.glob(os.path.join(
            work_dir, "vdata", f"part={self.part}", "*.parquet")))
        if vfiles:
            vt = pa.concat_tables([pq.read_table(f, columns=["gid"] + list(vdata_cols),
                                                 use_threads=False)
                                   for f in vfiles])
            vg = vt.column("gid").to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            vt, vg = None, np.empty(0, np.int64)
        for c in vdata_cols:
            # dtype-aware (reference VDATA_T is any POD incl. strings,
            # grape/types.h:30-39): string columns load as object
            # arrays with "" for absent vertices; everything numeric
            # stays the float64 dense path
            is_str = (vt is not None
                      and pa.types.is_string(vt.schema.field(c).type))
            if is_str:
                dense = np.full(self.ivnum, "", dtype=object)
                if len(vg):
                    dense[vg - self.lo] = np.asarray(
                        vt.column(c).to_pylist(), dtype=object)
                full = np.full(self.tvnum, "", dtype=object)
            else:
                dense = np.zeros(self.ivnum, dtype=np.float64)
                if vt is not None and len(vg):
                    vals = vt.column(c).to_numpy(zero_copy_only=False)
                    dense[vg - self.lo] = vals.astype(np.float64)
                # until synced, vdata_full has zeros in the outer segment
                full = np.zeros(self.tvnum, dtype=np.float64)
            self.vdata[c] = dense
            full[: self.ivnum] = dense
            self.vdata_full[c] = full

    # ---------------------------------------------------------- CSR build
    def _finalize(self, src: np.ndarray, dst: np.ndarray, w, need_sort: bool):
        """Build every derived array (CSR, transpose, mirror layout)
        from gid-space edge arrays.  Shared by the spool load path and
        in-place mutation rebuilds (``apply_edge_mutations``)."""
        if need_sort and len(src) > 1:
            order = np.lexsort((dst, src))
            src, dst = src[order], dst[order]
            if w is not None:
                w = w[order]
        if w is None and len(src):
            keep = np.empty(len(src), dtype=bool)
            keep[0] = True
            np.logical_or(src[1:] != src[:-1], dst[1:] != dst[:-1], out=keep[1:])
            src, dst = src[keep], dst[keep]

        self.num_local_edges = len(src)
        inner_mask = (dst >= self.lo) & (dst < self.hi)
        self.outer_gids = np.unique(dst[~inner_mask])
        self.ovnum = len(self.outer_gids)
        self.tvnum = self.ivnum + self.ovnum

        # int32 local indices when they fit: the per-round gathers over
        # these arrays are memory-bandwidth bound — 4-byte indices halve
        # the traffic (int64 fallback for >2B-row partitions)
        idx_t = np.int32 if self.tvnum < 2**31 - 2 and len(dst) < 2**31 - 2 else np.int64
        indices = np.empty(len(dst), dtype=idx_t)
        indices[inner_mask] = dst[inner_mask] - self.lo
        indices[~inner_mask] = self.ivnum + np.searchsorted(self.outer_gids, dst[~inner_mask])
        self.indices = indices
        self.edge_w = w

        rowlens = np.bincount(src - self.lo, minlength=self.ivnum).astype(np.int64)
        self.indptr = np.concatenate([[0], np.cumsum(rowlens)])
        self.out_degree = rowlens  # post-dedup local out-degree (== global:
        # all out-edges of an inner vertex are routed here, ev_fragment_loader.h)
        self.src_of_edge = np.repeat(np.arange(self.ivnum, dtype=idx_t), rowlens)

        # transpose structure for push-style per-destination reductions
        self.tgt_order = np.argsort(indices, kind="stable").astype(idx_t)
        sorted_tgts = indices[self.tgt_order]
        self.tgt_unique, self.tgt_starts = np.unique(sorted_tgts, return_index=True)
        # CSC-ordered source ids + weights: the dense push sweep then
        # does ONE gather (vals[src_by_tgt]) instead of gather+permute —
        # the superstep kernels are memory-bandwidth bound, so this is a
        # direct wall-time cut on WCC/SSSP/BFS
        self.src_by_tgt = self.src_of_edge[self.tgt_order]
        self.w_by_tgt = w[self.tgt_order] if w is not None else None

        # mirror slices per owner partition (contiguous in outer_gids)
        self.mirror_bounds = np.searchsorted(self.outer_gids, self.starts)
        # incoming mirror requests: requester part -> inner lids to export
        self.export_lids: dict[int, np.ndarray] = {}

    def edge_list(self):
        """Current edges back in gid space: (src, dst, w|None).  The
        inverse of ``_finalize`` — used by in-place mutation rebuilds."""
        idx = np.asarray(self.indices, np.int64)
        src = self.lo + np.asarray(self.src_of_edge, np.int64)
        dst = np.where(idx < self.ivnum, self.lo + idx, 0)
        m = idx >= self.ivnum
        if m.any():
            dst[m] = np.asarray(self.outer_gids, np.int64)[idx[m] - self.ivnum]
        w = np.array(self.edge_w, np.float64) if self.edge_w is not None else None
        return src, dst, w

    def apply_edge_mutations(self, op: np.ndarray, src: np.ndarray,
                             dst: np.ndarray, w: np.ndarray) -> None:
        """Apply a batch of edge ops to this fragment IN MEMORY and
        rebuild the derived arrays — the per-superstep mutation analog
        of grape/fragment/basic_fragment_mutator.h applied by
        Worker::processMutation (grape/worker/worker.h:176-187).

        ``op``: int8 codes (0=add/upsert, 1=delete); src/dst in gid
        space, already routed so every src is inner here.  Last-op-wins
        per (src, dst) key, matching mutate.py's spool-level semantics
        (multi-edge weighted keys: a delete drops every copy, an upsert
        replaces them with one row).  The rebuild is in-memory only —
        snapshots/spool are untouched, so a NEW engine on the same
        work_dir sees the pre-mutation graph (durable mutation is
        mutate_graph's job).
        """
        V = int(self.starts[-1])
        if V > 3_000_000_000:
            raise NotImplementedError("int64 (src*V+dst) keying needs review beyond 3e9 vertices")
        cs, cd, cw = self.edge_list()
        key = src.astype(np.int64) * V + dst.astype(np.int64)
        seq = np.arange(len(key), dtype=np.int64)
        order = np.lexsort((seq, key))
        k_s, s_s, d_s, w_s, op_s = key[order], src[order], dst[order], w[order], op[order]
        last = np.concatenate([k_s[1:] != k_s[:-1], [True]]) if len(k_s) else np.zeros(0, bool)
        key_f, s_f, d_f, w_f = k_s[last], s_s[last], d_s[last], w_s[last]
        keep = op_s[last] == 0
        cur_key = cs * V + cd
        pos = np.searchsorted(key_f, cur_key)
        if len(key_f):
            pos = np.minimum(pos, len(key_f) - 1)
            touched = key_f[pos] == cur_key
        else:
            touched = np.zeros(len(cur_key), bool)
        ns = np.concatenate([cs[~touched], s_f[keep]])
        nd = np.concatenate([cd[~touched], d_f[keep]])
        nw = (np.concatenate([cw[~touched], w_f[keep]])
              if cw is not None else None)
        t = getattr(self, "_snap_thread", None)
        if t is not None and t.is_alive():
            t.join()  # writer reads _snap_path; let the PRE-mutation
            # snapshot finish (it matches the spool, so it stays valid)
        self._snap_path = None  # mutated CSR must never shadow the spool
        self._finalize(ns, nd, nw, need_sort=True)
        self.loaded_from_snapshot = False
        # vdata_full buffers are tvnum-sized: re-seat the inner segment;
        # the engine re-syncs the outer (mirror) segment after the
        # fleet-wide mirror re-registration
        for c, dense in self.vdata.items():
            full = (np.full(self.tvnum, "", dtype=object)
                    if dense.dtype == object
                    else np.zeros(self.tvnum, dtype=dense.dtype))
            full[: self.ivnum] = dense
            self.vdata_full[c] = full

    # ---------------------------------------------------------- id helpers
    def inner_gids(self) -> np.ndarray:
        return np.arange(self.lo, self.hi, dtype=np.int64)

    def all_gids(self) -> np.ndarray:
        return np.concatenate([self.inner_gids(), self.outer_gids])

    def lids_of(self, gids: np.ndarray) -> np.ndarray:
        """gid -> local index (inner: gid-lo; outer: searchsorted)."""
        out = np.empty(len(gids), dtype=np.int64)
        m = (gids >= self.lo) & (gids < self.hi)
        out[m] = gids[m] - self.lo
        out[~m] = self.ivnum + np.searchsorted(self.outer_gids, gids[~m])
        return out

    def owner_of(self, gids: np.ndarray) -> np.ndarray:
        return part_of(gids, self.starts)

    # ---------------------------------------------------------- mirrors
    def mirror_requests(self) -> dict[int, np.ndarray]:
        """{owner_part: gids we hold as mirrors} (contiguous slices)."""
        out = {}
        for q in range(self.num_parts):
            a, b = self.mirror_bounds[q], self.mirror_bounds[q + 1]
            if b > a:
                out[q] = self.outer_gids[a:b]
        return out

    def register_requests(self, reqs: dict[int, np.ndarray]):
        """Owner side: remember which inner values each requester needs."""
        for requester, gids in reqs.items():
            self.export_lids[int(requester)] = np.asarray(gids, dtype=np.int64) - self.lo

    def export_values(self, values: np.ndarray) -> dict[int, np.ndarray]:
        """Dense mirror sync (batch_shuffle_message_manager.h:225-285
        SyncInnerVertices analog): slice inner `values` per requester."""
        return {p: values[lids] for p, lids in self.export_lids.items()}

    def fill_outer(self, buf: np.ndarray, received: dict[int, np.ndarray]):
        """Place per-owner received arrays into the outer segment of
        ``buf`` (len tvnum), matching mirror_requests order."""
        for q, vals in received.items():
            a, b = self.mirror_bounds[q], self.mirror_bounds[q + 1]
            buf[self.ivnum + a: self.ivnum + b] = vals

    # ---------------------------------------------------------- kernels
    def segment_sum(self, edge_vals: np.ndarray) -> np.ndarray:
        """Per-inner-vertex sum of per-edge values in CSR order.

        Uses reduceat with the empty-segment fix so results are bitwise
        identical for any partitioning (each vertex's adjacency is
        complete and sorted locally)."""
        out = np.zeros(self.ivnum, dtype=np.float64)
        if len(edge_vals) == 0:
            return out
        starts = self.indptr[:-1]
        valid = self.indptr[1:] > starts
        # reduceat over NON-EMPTY segment starts only: consecutive valid
        # starts are adjacent in edge space, so each output spans exactly
        # its own segment.  (Clamping empty trailing starts to len-1 —
        # the previous approach — silently truncated the LAST vertex's
        # final edge whenever a later vertex had zero edges.)
        sums = np.add.reduceat(edge_vals, starts[valid])
        out[valid] = sums
        return out

    def segment_min(self, edge_vals: np.ndarray, empty_fill) -> np.ndarray:
        out = np.full(self.ivnum, empty_fill, dtype=edge_vals.dtype)
        if len(edge_vals) == 0:
            return out
        starts = self.indptr[:-1]
        valid = self.indptr[1:] > starts
        mins = np.minimum.reduceat(edge_vals, starts[valid])
        out[valid] = mins
        return out

    def push_min(self, buf: np.ndarray, edge_vals: np.ndarray):
        """buf[target] = min(buf[target], edge_vals[e]) for every edge,
        vectorized via the precomputed transpose (reduceat per target)."""
        if len(edge_vals) == 0:
            return
        v = edge_vals[self.tgt_order]
        mins = np.minimum.reduceat(v, self.tgt_starts)
        buf[self.tgt_unique] = np.minimum(buf[self.tgt_unique], mins)

    def push_min_track(self, buf: np.ndarray, edge_vals: np.ndarray) -> np.ndarray:
        """push_min that also returns the local ids whose value dropped
        (avoids the full-array snapshot+compare per fixpoint sweep)."""
        if len(edge_vals) == 0:
            return np.empty(0, np.int64)
        v = edge_vals[self.tgt_order]
        mins = np.minimum.reduceat(v, self.tgt_starts)
        cur = buf[self.tgt_unique]
        mask = mins < cur
        ids = self.tgt_unique[mask]
        buf[ids] = mins[mask]
        return ids

    def push_min_track_csc(self, buf: np.ndarray, edge_vals_csc: np.ndarray) -> np.ndarray:
        """push_min_track for values ALREADY in CSC (target-sorted)
        order — pair with ``vals[src_by_tgt]`` so the dense sweep is one
        gather + one reduceat, no permutation pass."""
        if len(edge_vals_csc) == 0:
            return np.empty(0, np.int64)
        mins = np.minimum.reduceat(edge_vals_csc, self.tgt_starts)
        cur = buf[self.tgt_unique]
        mask = mins < cur
        ids = self.tgt_unique[mask]
        buf[ids] = mins[mask]
        return ids

    def push_sum(self, buf: np.ndarray, edge_vals: np.ndarray):
        if len(edge_vals) == 0:
            return
        v = edge_vals[self.tgt_order]
        sums = np.add.reduceat(v, self.tgt_starts)
        buf[self.tgt_unique] += sums

    def gather_edges(self, rows: np.ndarray):
        """Edge indices of the CSR rows in ``rows``; returns
        (edge_idx, lens).  Used by frontier-sparse propagation."""
        lens = (self.indptr[rows + 1] - self.indptr[rows]).astype(np.int64)
        total = int(lens.sum())
        if total == 0:
            return np.empty(0, np.int64), lens
        starts = np.repeat(self.indptr[rows], lens)
        offs = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(lens)[:-1]]), lens
        )
        return starts + offs, lens
