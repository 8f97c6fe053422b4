"""Distributed graph build: edge Dataset -> vertex dict + gid space +
partitioned edge spool.

Ray-Data-native replacement for the reference load pipeline
(grape/fragment/ev_fragment_loader.h:71-186 +
basic_fragment_loader.h:83-364): instead of MPI shuffles we use

  1. a groupby-dedup of edge endpoints to build the vertex dictionary
     (basic_fragment_loader.h:221-236 analog),
  2. a global sort by oid + per-block offsets to assign dense gids in
     oid-sorted order (so gid order == oid order; see ids.py),
  3. degree-aware contiguous partition boundaries
     (grape/worker/rebalancer.h analog),
  4. a vectorized oid->gid translation (`pc.index_in` against the
     broadcast sorted-oid dictionary, or a Dataset.join at scale),
  5. a partitioned Parquet "spool" keyed by owner-of-src so each
     fragment actor reads exactly its own edges
     (basic_fragment_loader.h:155-172 edge routing analog).

Multi-edge dedup happens inside the fragment (all out-edges of a vertex
are colocated), matching mutable_csr.h:313-389's sorted dedup.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..ids import part_of, partition_starts, weighted_partition_starts

__all__ = ["GraphMeta", "build_graph", "edges_from_numpy", "attach_oids"]


@dataclass
class GraphMeta:
    """Everything a driver / fragment actor needs to locate the graph."""

    work_dir: str
    num_vertices: int
    num_edges: int  # pre-dedup routed edge count
    num_partitions: int
    starts: np.ndarray  # int64[P+1] contiguous gid range boundaries
    directed: bool
    oid_type: str  # "string" | "int64"
    has_weights: bool = False
    fingerprint: str = ""
    extra: dict = field(default_factory=dict)

    @property
    def spool_dir(self) -> str:
        return os.path.join(self.work_dir, "edges")

    @property
    def vertices_path(self) -> str:
        return os.path.join(self.work_dir, "vertices")

    def save(self):
        os.makedirs(self.work_dir, exist_ok=True)
        with open(os.path.join(self.work_dir, "graph_meta.json"), "w") as f:
            json.dump(
                {
                    "num_vertices": self.num_vertices,
                    "num_edges": self.num_edges,
                    "num_partitions": self.num_partitions,
                    "starts": self.starts.tolist(),
                    "directed": self.directed,
                    "oid_type": self.oid_type,
                    "has_weights": self.has_weights,
                    "fingerprint": self.fingerprint,
                    "extra": self.extra,
                },
                f,
            )

    @classmethod
    def load(cls, work_dir: str) -> "GraphMeta":
        with open(os.path.join(work_dir, "graph_meta.json")) as f:
            d = json.load(f)
        d["starts"] = np.asarray(d["starts"], dtype=np.int64)
        return cls(work_dir=work_dir, **d)


def edges_from_numpy(src: np.ndarray, dst: np.ndarray, w: np.ndarray | None = None):
    """Small-fixture helper: numpy edge arrays -> Ray Dataset."""
    import ray.data as rd

    cols = {"src": src, "dst": dst}
    if w is not None:
        cols["w"] = np.asarray(w, dtype=np.float64)
    return rd.from_arrow(pa.table(cols))


def _endpoint_weight_table(edges_ds):
    """(oid, weight) rows: BOTH endpoints weigh 1, so the summed weight
    per oid is its total degree.  Total degree is the balance criterion
    the symmetrized (undirected) variant needs — letting
    ``_build_symmetrized_from_donor`` reuse the donor's partition starts
    without a resample — and a sound proxy for directed superstep work
    too (push cost tracks out-degree, ingestion tracks in-degree)."""

    def emit_partial(t: pa.Table) -> pa.Table:
        # pre-aggregate inside the batch (combiner) so the groupby
        # shuffle moves one row per distinct endpoint per block, not
        # two rows per edge
        src = t.column("src").combine_chunks()
        dst = t.column("dst").combine_chunks()
        s_uniq = src.value_counts()
        d_uniq = dst.value_counts()
        oid = pa.concat_arrays([s_uniq.field("values"), d_uniq.field("values")])
        cnt = np.concatenate([
            s_uniq.field("counts").to_numpy(zero_copy_only=False).astype(np.int64),
            d_uniq.field("counts").to_numpy(zero_copy_only=False).astype(np.int64),
        ])
        return pa.table({"oid": oid, "cnt": cnt})

    return edges_ds.select_columns(["src", "dst"]).map_batches(
        emit_partial, batch_format="pyarrow", batch_size=None
    )


def build_graph(
    edges_ds,
    work_dir: str,
    num_partitions: int,
    *,
    directed: bool = True,
    symmetrize: bool = False,
    degree_aware: bool = True,
    weight_col: str | None = None,
    broadcast_threshold: int = 4_000_000,
    fingerprint: str = "",
    reuse_vertices_from: "GraphMeta | None" = None,
    dense_int_oids: bool = False,
    vdata_ds=None,
    vertices_ds=None,
    sort_spool: bool = True,
    load_strategy: str = "out",
) -> GraphMeta:
    """Build the on-disk graph layout from an edge Dataset with columns
    ``src``/``dst`` (string or int64 oids) and optional ``weight_col``.

    ``symmetrize=True`` loads every edge in both directions (the
    reference's undirected load, types.h LoadStrategy semantics for the
    undirected apps).

    ``vdata_ds``: optional Dataset of per-vertex properties with an
    ``oid`` column plus one or more numeric value columns (the
    reference's VDATA, basic_fragment_loader.h:300-338).  Rows whose
    oid is not a graph vertex are dropped; graph vertices absent from
    ``vdata_ds`` read as 0.  Mirror vdata is synced once at engine
    start (immutable_edgecut_fragment.h:109-114 mirror vdata analog).

    ``load_strategy``: ``"out"`` (default) stores only the out-CSR;
    ``"both"`` additionally derives the reversed-direction spool under
    ``work_dir/rev`` (the reference's LoadStrategy kBothOutIn,
    grape/types.h:63-68) so in-edge queries need no second build —
    see ``reverse_graph``.

    ``vertices_ds``: optional Dataset with an ``oid`` column declaring
    the vertex universe explicitly (the reference's ``.v`` file,
    ev_fragment_loader.h vfile path): vertices appearing in no edge
    still get gids (isolated, dangling for PageRank), and a later
    ``mutate_graph`` delta may reference them.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    # Atomic build: spool into a temp dir, rename into place only on
    # success.  A crashed build otherwise leaves partial uuid-named
    # spool files that a retry (exist_ok=True) silently merges with its
    # own — duplicated edges with no error.
    final_dir = work_dir
    marker = os.path.join(final_dir, "graph_meta.json")
    if os.path.exists(marker):
        return GraphMeta.load(final_dir)
    if os.path.isdir(final_dir):  # partial remains of a crashed build
        import shutil
        shutil.rmtree(final_dir)
    work_dir = f"{final_dir}.building-{os.getpid()}"
    if os.path.isdir(work_dir):
        import shutil
        shutil.rmtree(work_dir)

    def _finalize(meta: GraphMeta) -> GraphMeta:
        if vdata_ds is not None:
            _write_vdata(vdata_ds, meta, broadcast_threshold)
        try:
            os.rename(work_dir, final_dir)
        except OSError:
            # lost a race with a concurrent build of the same graph
            import shutil
            shutil.rmtree(work_dir, ignore_errors=True)
            if not os.path.exists(marker):
                raise
        meta.work_dir = final_dir
        if load_strategy == "both":
            reverse_graph(meta)
            meta.extra["rev_dir"] = os.path.join(final_dir, "rev")
            meta.save()
        return meta

    os.makedirs(work_dir, exist_ok=True)
    if dense_int_oids:
        return _finalize(_build_dense_int(
            edges_ds, work_dir, num_partitions, directed, symmetrize,
            degree_aware, weight_col, fingerprint,
        ))
    if reuse_vertices_from is not None and symmetrize:
        # symmetrized variant of an already-built graph: skip the url
        # table entirely — union the donor's gid spool with its reverse
        # (no dictionary rebuild, no re-translate)
        return _finalize(_build_symmetrized_from_donor(
            reuse_vertices_from, work_dir, weight_col, degree_aware, fingerprint,
        ))

    cols = ["src", "dst"] + ([weight_col] if weight_col else [])
    edges_ds = edges_ds.select_columns(cols)
    if weight_col and weight_col != "w":
        edges_ds = edges_ds.rename_columns({weight_col: "w"})
    # the build consumes the edge table twice (vertex dict, then
    # translate+spool); pin the PROJECTED columns so the upstream
    # pipeline (e.g. html extraction) doesn't re-execute — the object
    # store spills if it exceeds memory
    edges_ds = edges_ds.materialize()
    n_blocks = edges_ds.num_blocks()

    if symmetrize:
        def rev(t: pa.Table) -> pa.Table:
            d = {"src": t.column("dst"), "dst": t.column("src")}
            if weight_col:
                d["w"] = t.column("w")
            return pa.table(d)

        edges_ds = edges_ds.union(
            edges_ds.map_batches(rev, batch_format="pyarrow", batch_size=None)
        )
        n_blocks *= 2

    # coalesce shattered inputs once: every downstream pass (dict sort,
    # translate, spool) pays per-block overhead
    if n_blocks > 4 * num_partitions:
        edges_ds = edges_ds.repartition(num_partitions).materialize()

    if reuse_vertices_from is not None:
        # same vertex universe as an already-built variant of this edge
        # table: reuse the dictionary and the partition boundaries
        donor = reuse_vertices_from
        _copy_vertices(donor, work_dir)
        vt = pq.read_table(os.path.join(work_dir, "vertices"), columns=["oid", "gid"])
        order = pc.sort_indices(vt.column("gid"))
        sorted_oids = vt.column("oid").take(order).combine_chunks()
        edges_gid = _translate_broadcast(edges_ds, sorted_oids, donor.num_partitions)
        return _finalize(_spool_and_finish(
            edges_gid, work_dir, donor.num_vertices, donor.num_partitions,
            donor.starts, directed and not symmetrize, donor.oid_type,
            bool(weight_col), fingerprint,
        ))

    # ---- 1+2. vertex dictionary: per-block pre-deduped (oid, cnt)
    # partials -> ONE global sort -> within-block run-length dedup with
    # driver-side reconciliation of runs that straddle block boundaries.
    # (A groupby + sort would be two all-to-all exchanges over the
    # vertex table; the sorted-dedup needs one.)
    ep = _endpoint_weight_table(edges_ds)
    if vertices_ds is not None:
        # explicit universe (vfile): union zero-weight rows so isolated
        # vertices get gids too
        def zero_cnt(t: pa.Table) -> pa.Table:
            return pa.table({"oid": t.column("oid"),
                             "cnt": pa.array(np.zeros(len(t), np.int64))})

        ep = ep.union(vertices_ds.select_columns(["oid"]).map_batches(
            zero_cnt, batch_format="pyarrow", batch_size=None))
    vds = ep.sort("oid").materialize()

    def _block_uniques(t: pa.Table):
        """(unique oids ascending, summed weights) for a sorted block."""
        oid = t.column("oid").combine_chunks()
        w = t.column("cnt").to_numpy(zero_copy_only=False).astype(np.float64)
        eq = pc.equal(oid.slice(1), oid.slice(0, len(oid) - 1))
        newrun = np.concatenate([[True], ~eq.to_numpy(zero_copy_only=False)])
        starts_i = np.flatnonzero(newrun)
        cw = np.concatenate([[0.0], np.cumsum(w)])
        ends = np.append(starts_i[1:], len(w))
        return oid.take(pa.array(starts_i)), cw[ends] - cw[starts_i]

    def summarize(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({
                "first_oid": pa.array([], t.column("oid").type),
                "last_oid": pa.array([], t.column("oid").type),
                "n_rows": pa.array([], pa.int64()),
                "n_unique": pa.array([], pa.int64()),
                "sample_pos": pa.array([], pa.list_(pa.int64())),
                "sample_cumw": pa.array([], pa.list_(pa.float64())),
            })
        u_oid, u_w = _block_uniques(t)
        n = len(u_oid)
        step = max(1, n // 64)
        pos = np.arange(0, n, step, dtype=np.int64)
        cumw = np.cumsum(u_w)
        return pa.table(
            {
                "first_oid": pa.array([u_oid[0].as_py()]),
                "last_oid": pa.array([u_oid[-1].as_py()]),
                "n_rows": pa.array([len(t)], pa.int64()),
                "n_unique": pa.array([n], pa.int64()),
                "sample_pos": pa.array([pos.tolist()], pa.list_(pa.int64())),
                "sample_cumw": pa.array([cumw[pos].tolist()], pa.list_(pa.float64())),
            }
        )

    summaries = vds.map_batches(summarize, batch_format="pyarrow", batch_size=None).take_all()
    summaries.sort(key=lambda r: (r["first_oid"], r["last_oid"]))
    # driver reconciliation: a run spanning two blocks appears as
    # last_oid(i) == first_oid(i+1) — the later block skips its first
    plan: dict = {}
    total = 0
    prev_last = None
    sample_gids, sample_w = [], []
    for srow in summaries:
        skip = 1 if (prev_last is not None and srow["first_oid"] == prev_last) else 0
        key = (srow["first_oid"], srow["last_oid"], srow["n_rows"])
        if key in plan:
            raise RuntimeError("ambiguous sorted-block key; vertex dict degenerate")
        plan[key] = (total - skip, skip)
        pos = np.asarray(srow["sample_pos"], dtype=np.int64)
        cumw = np.asarray(srow["sample_cumw"], dtype=np.float64)
        sample_gids.append(total - skip + pos)
        w_at = np.diff(np.concatenate([[0.0], cumw]))
        sample_w.append(np.maximum(w_at, 0.0) + 1.0)  # +1 = vertex factor
        total += srow["n_unique"] - skip
        prev_last = srow["last_oid"]
    num_vertices = total
    if num_vertices == 0:
        raise ValueError("empty edge input")

    num_partitions = min(num_partitions, max(1, num_vertices))
    if degree_aware and sample_gids:
        starts = weighted_partition_starts(
            np.concatenate(sample_gids), np.concatenate(sample_w),
            num_vertices, num_partitions,
        )
    else:
        starts = partition_starts(num_vertices, num_partitions)

    # ---- 3. write vertex dict (oid, gid, weight), preserving block order
    def assign_gids(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"oid": pa.array([], t.column("oid").type),
                             "gid": pa.array([], pa.int64()),
                             "weight": pa.array([], pa.float64())})
        u_oid, u_w = _block_uniques(t)
        key = (u_oid[0].as_py(), u_oid[-1].as_py(), len(t))
        off, skip = plan[key]
        if skip:
            u_oid, u_w = u_oid.slice(skip), u_w[skip:]
        gid = np.arange(off + skip, off + skip + len(u_oid), dtype=np.int64)
        return pa.table({"oid": u_oid, "gid": gid, "weight": u_w})

    vtx = vds.map_batches(assign_gids, batch_format="pyarrow", batch_size=None)
    vtx.write_parquet(os.path.join(work_dir, "vertices"))

    sch = vds.schema()
    pa_sch = getattr(sch, "base_schema", sch)
    oid_pa_type = pa_sch.field("oid").type
    oid_type = (
        "string"
        if pa.types.is_string(oid_pa_type) or pa.types.is_large_string(oid_pa_type)
        else "int64"
    )

    # ---- 4. translate edges to gid space
    if num_vertices <= broadcast_threshold:
        sorted_oids = pa.concat_tables(
            [pa.table({"oid": b["oid"]}) for b in vtx.iter_batches(batch_format="pyarrow", batch_size=65536)]
        ).column("oid").combine_chunks()
        edges_gid = _translate_broadcast(edges_ds, sorted_oids, num_partitions)
    else:
        # large-dictionary path: two hash-shuffle joins (Dataset.join)
        v = rd.read_parquet(os.path.join(work_dir, "vertices"), columns=["oid", "gid"])
        e = edges_ds.join(v.rename_columns({"oid": "src", "gid": "src_gid"}),
                          join_type="inner", on=("src",), num_partitions=num_partitions)
        e = e.join(v.rename_columns({"oid": "dst", "gid": "dst_gid"}),
                   join_type="inner", on=("dst",), num_partitions=num_partitions)
        keep = ["src_gid", "dst_gid"] + (["w"] if weight_col else [])
        edges_gid = e.select_columns(keep)

    return _finalize(_spool_and_finish(
        edges_gid, work_dir, num_vertices, num_partitions, starts,
        directed and not symmetrize, oid_type, bool(weight_col), fingerprint,
        sort_spool=sort_spool,
    ))


def _build_dense_int(edges_ds, work_dir, num_partitions, directed, symmetrize,
                     degree_aware, weight_col, fingerprint) -> GraphMeta:
    """Fast path when oids are already dense int64 ids (0..V-1): gid ==
    oid, no dictionary build or translate — one sampled-degree pass for
    boundaries, then route to the spool.  The production path for
    pre-normalized inputs (the reference's int-oid graphs with a dense
    id space)."""
    from ray.data.aggregate import Max

    cols = ["src", "dst"] + ([weight_col] if weight_col else [])
    edges_ds = edges_ds.select_columns(cols)
    if weight_col and weight_col != "w":
        edges_ds = edges_ds.rename_columns({weight_col: "w"})
    edges_ds = edges_ds.materialize()

    agg = edges_ds.aggregate(Max("src", alias_name="ms"), Max("dst", alias_name="md"))
    V = int(max(agg["ms"], agg["md"])) + 1
    P = min(num_partitions, max(1, V))

    if symmetrize:
        def rev(t: pa.Table) -> pa.Table:
            d = {"src": t.column("dst"), "dst": t.column("src")}
            if weight_col:
                d["w"] = t.column("w")
            return pa.table(d)

        edges_ds = edges_ds.union(
            edges_ds.map_batches(rev, batch_format="pyarrow", batch_size=None)
        )

    if degree_aware:
        n_rows = max(edges_ds.count(), 1)
        frac = min(1.0, 2_000_000 / n_rows)
        cols2 = edges_ds.select_columns(["src", "dst"])
        samp = (cols2.random_sample(frac, seed=42).to_pandas()
                if frac < 1.0 else cols2.to_pandas())
        # total degree (both endpoints), matching _endpoint_weight_table:
        # donor starts then stay valid for a symmetrized-from-donor build
        w = (np.bincount(samp["src"].to_numpy(), minlength=V)
             + np.bincount(samp["dst"].to_numpy(), minlength=V)).astype(np.float64)
        w = w / max(frac, 1e-9) + 1.0
        cum = np.cumsum(w)
        targets = cum[-1] * np.arange(1, P) / P
        inner = np.searchsorted(cum, targets).astype(np.int64)
        starts = np.maximum.accumulate(
            np.concatenate([[0], np.minimum(inner + 1, V), [V]])
        ).astype(np.int64)
    else:
        starts = partition_starts(V, P)

    def to_gid(t: pa.Table) -> pa.Table:
        d = {"src_gid": t.column("src").cast(pa.int64()),
             "dst_gid": t.column("dst").cast(pa.int64())}
        if weight_col:
            d["w"] = t.column("w")
        return pa.table(d)

    edges_gid = edges_ds.map_batches(to_gid, batch_format="pyarrow", batch_size=None)
    meta = _spool_and_finish(
        edges_gid, work_dir, V, P, starts, directed and not symmetrize,
        "int64", bool(weight_col), fingerprint,
    )
    meta.extra["identity_oids"] = True
    meta.save()
    return meta


def reverse_graph(meta: GraphMeta, rev_dir: str | None = None) -> GraphMeta:
    """In-edge adjacency without a second graph build (the reference's
    LoadStrategy ``kBothOutIn``, grape/types.h:63-68,
    immutable_edgecut_fragment.h:79-114): derive a reversed-direction
    spool from an already-built graph with ONE route-only pass over the
    gid spool — no re-extract, no dictionary translate, no global sort
    (fragments lexsort their slice once; the CSR snapshot caches it).

    Returns a GraphMeta whose fragments' out-CSR is the donor's in-CSR
    and which shares the donor's vertex dictionary, so every program
    runs unchanged along in-edges (in-degree, reverse BFS/reachability,
    the SendMsgThroughIEdges direction).  Partition boundaries reuse
    the donor's (in-degree skew may differ from out-degree skew; pass a
    dedicated ``rev_dir`` and rebalance externally if it bites)."""
    import ray.data as rd

    rev_dir = rev_dir or os.path.join(meta.work_dir, "rev")
    marker = os.path.join(rev_dir, "graph_meta.json")
    if os.path.exists(marker):
        return GraphMeta.load(rev_dir)
    tmp_dir = f"{rev_dir}.building-{os.getpid()}"
    if os.path.isdir(tmp_dir):
        import shutil

        shutil.rmtree(tmp_dir)
    os.makedirs(tmp_dir, exist_ok=True)
    _copy_vertices(meta, tmp_dir)
    cols = ["src_gid", "dst_gid"] + (["w"] if meta.has_weights else [])
    de = rd.read_parquet(meta.spool_dir, columns=cols)

    def revg(t: pa.Table) -> pa.Table:
        d = {"src_gid": t.column("dst_gid"), "dst_gid": t.column("src_gid")}
        if meta.has_weights:
            d["w"] = t.column("w")
        return pa.table(d)

    rmeta = _spool_and_finish(
        de.map_batches(revg, batch_format="pyarrow", batch_size=None),
        tmp_dir, meta.num_vertices, meta.num_partitions, meta.starts,
        meta.directed, meta.oid_type, meta.has_weights,
        (meta.fingerprint + ":rev") if meta.fingerprint else "",
        sort_spool=False,
    )
    if meta.extra.get("identity_oids"):
        rmeta.extra["identity_oids"] = True
    rmeta.extra["reversed_of"] = meta.work_dir
    rmeta.save()
    try:
        os.rename(tmp_dir, rev_dir)
    except OSError:  # lost a race with a concurrent reverse build
        import shutil

        shutil.rmtree(tmp_dir, ignore_errors=True)
        if not os.path.exists(marker):
            raise
    rmeta.work_dir = rev_dir
    return rmeta


def _copy_vertices(donor: GraphMeta, work_dir: str):
    import shutil

    if donor.extra.get("identity_oids"):
        return  # dense-int graphs have no dictionary on disk
    dst_v = os.path.join(work_dir, "vertices")
    if not os.path.exists(dst_v):
        shutil.copytree(donor.vertices_path, dst_v)


def _build_symmetrized_from_donor(donor: GraphMeta, work_dir: str,
                                  weight_col, degree_aware: bool,
                                  fingerprint: str) -> GraphMeta:
    """Undirected variant with ZERO new edge movement: the symmetrized
    spool for partition p is (donor out-edges of p) ∪ (donor in-edges
    of p as out-edges) — exactly the donor spool's ``part=p`` files
    plus ``reverse_graph``'s, so both are HARD-LINKED instead of routed
    again.  ``reverse_graph`` is itself a cached one-route-pass (E
    rows); when the donor was built with ``load_strategy="both"`` or
    any in-edge query already ran, symmetrize touches no edge data at
    all.  The old path re-routed and re-wrote 2E rows.

    Partition boundaries reuse the donor's: the donor's degree-aware
    ``starts`` already weight BOTH endpoints of every edge
    (``_endpoint_weight_table``), i.e. total degree — the same balance
    criterion the undirected graph needs, so a resample would
    reproduce them modulo sampling noise."""
    _copy_vertices(donor, work_dir)
    V, P = donor.num_vertices, donor.num_partitions
    rmeta = reverse_graph(donor)

    spool = os.path.join(work_dir, "edges")
    for tag, src_meta in (("d", donor), ("r", rmeta)):
        for part in os.listdir(src_meta.spool_dir):
            sdir = os.path.join(src_meta.spool_dir, part)
            if not (part.startswith("part=") and os.path.isdir(sdir)):
                continue
            ddir = os.path.join(spool, part)
            os.makedirs(ddir, exist_ok=True)
            for f in os.listdir(sdir):
                dst = os.path.join(ddir, f"{tag}_{f}")
                try:
                    os.link(os.path.join(sdir, f), dst)
                except OSError:  # cross-device spool dirs
                    import shutil

                    shutil.copy2(os.path.join(sdir, f), dst)

    meta = GraphMeta(
        work_dir=work_dir, num_vertices=V,
        num_edges=donor.num_edges + rmeta.num_edges, num_partitions=P,
        starts=np.asarray(donor.starts, dtype=np.int64), directed=False,
        oid_type=donor.oid_type, has_weights=donor.has_weights,
        fingerprint=fingerprint,
    )
    # mixed file naming (donor may be sort-spooled, rev is route-only):
    # fragments lexsort their slice at first load, snapshot caches it
    meta.extra["spool_sorted"] = False
    if donor.extra.get("identity_oids"):
        meta.extra["identity_oids"] = True
    meta.save()
    return meta


def _translate_broadcast(edges_ds, sorted_oids: pa.Array, num_partitions: int):
    """oid->gid via the broadcast sorted dictionary (ray.put once,
    `pc.index_in` per batch: position in the sorted dict IS the gid).

    TASK pool, not an actor pool: ray.get of the plasma-resident Arrow
    dictionary is zero-copy per task, and tasks reach full width
    immediately — the actor pool's 1->N ramp-up serialized the first
    blocks behind one worker (measured 22s -> 8s on the 16M-edge
    headline translate at 32 cpus)."""
    import ray

    dict_ref = ray.put(sorted_oids)

    def translate(t: pa.Table) -> pa.Table:
        oids = ray.get(dict_ref)  # zero-copy plasma read
        sg = pc.index_in(t.column("src"), value_set=oids).cast(pa.int64())
        dg = pc.index_in(t.column("dst"), value_set=oids).cast(pa.int64())
        d = {"src_gid": sg, "dst_gid": dg}
        if "w" in t.column_names:
            d["w"] = t.column("w")
        return pa.table(d)

    return edges_ds.map_batches(translate, batch_format="pyarrow",
                                batch_size=None)


def _spool_and_finish(edges_gid, work_dir, num_vertices, num_partitions, starts,
                      directed, oid_type, has_weights, fingerprint,
                      sort_spool: bool = True) -> GraphMeta:
    # ---- 5. spool.  Two strategies:
    # - sort_spool=True: ONE distributed sort by (src_gid, dst_gid) —
    #   routes rows to their owner partition (contiguous gid ranges)
    #   AND pre-orders them for CSR, so fragment actors skip their
    #   per-actor lexsort at every engine load (immutable_csr.h:100-107
    #   neighbor ordering, done once at build instead of per load).
    # - sort_spool=False: ROUTE-ONLY — a map-side split by owner with
    #   no all-to-all sort network at all; fragments lexsort their own
    #   slice once at first load and the CSR snapshot caches the
    #   result.  This trades one cheap per-partition sort for the
    #   cluster-wide exchange — the right default when the input is
    #   derived from an already-routed spool (symmetrized variants).
    spool = os.path.join(work_dir, "edges")
    os.makedirs(spool, exist_ok=True)
    starts_list = starts  # closure capture (tiny)
    if not sort_spool:
        def route_spool(t: pa.Table) -> pa.Table:
            sg = t.column("src_gid").to_numpy(zero_copy_only=False)
            parts = part_of(sg, starts_list)
            fid = uuid.uuid4().hex[:12]
            counts = []
            for p in np.unique(parts):
                sub = t.filter(pa.array(parts == p))
                pdir = os.path.join(spool, f"part={p}")
                os.makedirs(pdir, exist_ok=True)
                pq.write_table(sub, os.path.join(pdir, f"{fid}_{int(p)}.parquet"))
                counts.append((int(p), len(sub)))
            return pa.table({"part": pa.array([c[0] for c in counts], pa.int32()),
                             "rows": pa.array([c[1] for c in counts], pa.int64())})

        # large coalesced batches: per-BLOCK routing on a many-block
        # input writes O(blocks x P) tiny parquet files (8k files / 60KB
        # each observed on the 32M-row web graph — file-open overhead
        # then dominates every fragment load); 4M-row batches bound the
        # file count to O(E/4M x P) real files
        stats = edges_gid.map_batches(route_spool, batch_format="pyarrow",
                                      batch_size=4_000_000)
        num_edges = int(sum(r["rows"] for r in stats.take_all()))
        meta = GraphMeta(
            work_dir=work_dir, num_vertices=int(num_vertices),
            num_edges=num_edges, num_partitions=int(num_partitions),
            starts=np.asarray(starts, dtype=np.int64), directed=directed,
            oid_type=oid_type, has_weights=has_weights, fingerprint=fingerprint,
        )
        meta.extra["spool_sorted"] = False
        meta.save()
        return meta
    edges_gid = edges_gid.sort(["src_gid", "dst_gid"])

    def write_spool(t: pa.Table) -> pa.Table:
        sg = t.column("src_gid").to_numpy(zero_copy_only=False)
        parts = part_of(sg, starts_list)  # already ascending (sorted input)
        bounds = np.searchsorted(parts, np.arange(len(starts_list)))
        fid = uuid.uuid4().hex[:12]
        dg = t.column("dst_gid").to_numpy(zero_copy_only=False)
        counts = []
        for p in np.unique(parts):
            lo, hi = bounds[p], bounds[p + 1] if p + 1 < len(bounds) else len(t)
            sub = t.slice(lo, hi - lo)
            pdir = os.path.join(spool, f"part={p}")
            os.makedirs(pdir, exist_ok=True)
            # full-sort-key-prefixed name (min src, then min dst): lexical
            # file order == gid order even when one src's run straddles a
            # sort-output block boundary.  Ties on duplicate (src,dst)
            # keys remain possible pre-dedup, so Fragment additionally
            # verifies monotonicity at load and lexsorts on violation.
            pq.write_table(sub, os.path.join(
                pdir, f"{int(sg[lo]):012d}_{int(dg[lo]):012d}_{fid}.parquet"))
            counts.append((int(p), hi - lo))
        return pa.table({"part": pa.array([c[0] for c in counts], pa.int32()),
                         "rows": pa.array([c[1] for c in counts], pa.int64())})

    stats = edges_gid.map_batches(write_spool, batch_format="pyarrow", batch_size=None)
    num_edges = int(sum(r["rows"] for r in stats.take_all()))

    meta = GraphMeta(
        work_dir=work_dir,
        num_vertices=int(num_vertices),
        num_edges=num_edges,
        num_partitions=int(num_partitions),
        starts=np.asarray(starts, dtype=np.int64),
        directed=directed,
        oid_type=oid_type,
        has_weights=has_weights,
        fingerprint=fingerprint,
    )
    meta.extra["spool_sorted"] = True
    meta.save()
    return meta


def _write_vdata(vdata_ds, meta: GraphMeta, broadcast_threshold: int = 4_000_000):
    """Translate a per-vertex property Dataset (oid, cols...) to gid
    space and spool it partitioned by owner under
    ``work_dir/vdata/part={p}/`` (ref basic_fragment_loader.h:300-338
    vertex-data routing).  V-sized, so per-partition files are written
    unsorted; the fragment sorts its own slice at load."""
    import ray
    import ray.data as rd

    cols = [c for c in vdata_ds.schema().names if c != "oid"]
    if not cols:
        raise ValueError("vdata_ds needs at least one value column besides 'oid'")
    starts_list = meta.starts
    vroot = os.path.join(meta.work_dir, "vdata")
    os.makedirs(vroot, exist_ok=True)

    if meta.extra.get("identity_oids"):
        V = meta.num_vertices

        def to_gid(t: pa.Table) -> pa.Table:
            g = t.column("oid").cast(pa.int64())
            d = {"gid": g}
            for c in cols:
                d[c] = t.column(c)
            out = pa.table(d)
            keep = pc.and_(pc.greater_equal(g, 0), pc.less(g, V))
            return out.filter(keep)

        gidded = vdata_ds.map_batches(to_gid, batch_format="pyarrow", batch_size=None)
    elif meta.num_vertices <= broadcast_threshold:
        vt = pq.read_table(meta.vertices_path, columns=["oid", "gid"])
        order = pc.sort_indices(vt.column("gid"))
        sorted_oids = vt.column("oid").take(order).combine_chunks()
        dict_ref = ray.put(sorted_oids)

        def translate_v(t: pa.Table) -> pa.Table:
            # task pool, not actors: zero-copy plasma dict read per
            # task, no 1->N ramp (same fix as _translate_broadcast)
            oids = ray.get(dict_ref)
            g = pc.index_in(t.column("oid"), value_set=oids).cast(pa.int64())
            d = {"gid": g}
            for c in cols:
                d[c] = t.column(c)
            out = pa.table(d)
            return out.filter(pc.is_valid(out.column("gid")))

        gidded = vdata_ds.map_batches(translate_v, batch_format="pyarrow",
                                      batch_size=None)
    else:
        v = rd.read_parquet(meta.vertices_path, columns=["oid", "gid"])
        gidded = (vdata_ds.join(v, join_type="inner", on=("oid",),
                                num_partitions=meta.num_partitions)
                  .select_columns(["gid"] + cols))

    def write_vdata(t: pa.Table) -> pa.Table:
        g = t.column("gid").to_numpy(zero_copy_only=False)
        parts = part_of(g, starts_list)
        fid = uuid.uuid4().hex[:12]
        counts = []
        for p in np.unique(parts):
            sub = t.filter(pa.array(parts == p))
            pdir = os.path.join(vroot, f"part={p}")
            os.makedirs(pdir, exist_ok=True)
            pq.write_table(sub, os.path.join(pdir, f"{fid}.parquet"))
            counts.append(int(p))
        return pa.table({"part": pa.array(counts, pa.int32())})

    gidded.map_batches(write_vdata, batch_format="pyarrow", batch_size=None).materialize()
    meta.extra["vdata_cols"] = cols
    meta.save()


def attach_oids_ds(result_ds, meta: GraphMeta, gid_col: str = "gid",
                   oid_name: str = "oid"):
    """Distributed oid re-attach for Dataset results — the
    local_vertex_map-style scale path: the dictionary is NEVER
    materialized in one process; a hash-shuffle join shards both sides
    (use for 10^9+-vertex graphs; below that ``attach_oids`` on the
    collected table is one cheap gather)."""
    import ray.data as rd

    if meta.extra.get("identity_oids"):
        def add(t: pa.Table) -> pa.Table:
            return t.add_column(0, oid_name, t.column(gid_col).cast(pa.int64()))

        return result_ds.map_batches(add, batch_format="pyarrow", batch_size=None)
    v = rd.read_parquet(meta.vertices_path, columns=["oid", "gid"])
    if oid_name != "oid":
        v = v.rename_columns({"oid": oid_name})
    if gid_col != "gid":
        v = v.rename_columns({"gid": gid_col})
    return result_ds.join(v, join_type="inner", on=(gid_col,),
                          num_partitions=meta.num_partitions)


def attach_oids(result_table: pa.Table, meta: GraphMeta, gid_col: str = "gid",
                oid_name: str = "oid") -> pa.Table:
    """Re-attach original ids to a (gid, ...) result (build-time-join
    analog of global_vertex_map.h:174-209 lookups; gids are the rank in
    the sorted oid dict so this is a pure gather).  Driver-side O(V);
    for huge dictionaries use ``attach_oids_ds``."""
    if meta.extra.get("identity_oids"):
        return result_table.add_column(
            0, oid_name, result_table.column(gid_col).cast(pa.int64())
        )
    vt = pq.read_table(os.path.join(meta.work_dir, "vertices"), columns=["oid", "gid"])
    order = pc.sort_indices(vt.column("gid"))
    oids_sorted = vt.column("oid").take(order)
    gathered = oids_sorted.take(result_table.column(gid_col))
    out = result_table.add_column(0, oid_name, gathered)
    return out
