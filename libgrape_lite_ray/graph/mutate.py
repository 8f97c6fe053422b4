"""Delta mutation: rebuild only the partitions a batch of edge ops
touches (the Ray-native analog of grape/fragment/ev_fragment_mutator.h
+ mutable_csr.h applied as a batch, tested by the reference's
mutable_fragment_tests, misc/app_tests.sh:119-181).

Ops (the reference's ``.e.mutable_delta`` text format):
  ``a src dst [w]`` add (upsert), ``d src dst`` delete,
  ``u src dst w``  update weight (upsert).

Semantics are state-setting per (src, dst) key with last-op-wins, so a
delta batch applies as: resolve the final op per key, drop current rows
whose key is touched, append the keys whose final op is add/update.
The vertex universe is fixed (the reference's tests mutate edges under
a fixed vfile); an op naming an unknown oid raises.

Only partitions owning a touched src re-spool; every other partition's
spool files (and their CSR snapshots — same file names and sizes, so
the snapshot fingerprints still match) are hard-linked into the new
graph directory.  Mutation cost is O(edges of touched partitions), not
O(E).
"""

from __future__ import annotations

import glob
import os
import shutil
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..ids import part_of
from .build import GraphMeta

__all__ = ["mutate_graph", "load_delta_file", "parse_delta_lines"]


def parse_delta_lines(lines) -> pa.Table:
    """Parse ``op src dst [w]`` delta lines (the reference's
    ``.e.mutable_delta`` text format, also the record format of the
    gnn_sampler Kafka stream, examples/gnn_sampler/util.h ParseOneLine
    analog).  Blank lines and ``#`` comments are skipped."""
    ops, srcs, dsts, ws = [], [], [], []
    for line in lines:
        p = line.split()
        if not p or p[0].startswith("#"):
            continue
        ops.append(p[0])
        srcs.append(int(p[1]))
        dsts.append(int(p[2]))
        ws.append(float(p[3]) if len(p) > 3 else 0.0)
    return pa.table({"op": pa.array(ops, pa.string()),
                     "src": pa.array(srcs, pa.int64()),
                     "dst": pa.array(dsts, pa.int64()),
                     "w": pa.array(ws, pa.float64())})


def load_delta_file(path: str) -> pa.Table:
    """Parse the reference's ``.e.mutable_delta`` text format."""
    with open(path) as f:
        return parse_delta_lines(f)


def _translate_gids(meta: GraphMeta, oids: np.ndarray, col: str) -> np.ndarray:
    if meta.extra.get("identity_oids"):
        g = oids.astype(np.int64)
        if len(g) and (g.min() < 0 or g.max() >= meta.num_vertices):
            raise ValueError(f"delta {col} oid outside vertex universe")
        return g
    vt = pq.read_table(meta.vertices_path, columns=["oid", "gid"])
    order = pc.sort_indices(vt.column("gid"))
    sorted_oids = vt.column("oid").take(order).combine_chunks()
    idx = pc.index_in(pa.array(oids), value_set=sorted_oids)
    if idx.null_count:
        raise ValueError(f"delta {col} oid not in vertex dictionary")
    return idx.cast(pa.int64()).to_numpy(zero_copy_only=False)


def _mutate_partition(spool_dir: str, p: int, out_pdir: str, has_w: bool,
                      key_final: np.ndarray, s_final: np.ndarray,
                      d_final: np.ndarray, w_final: np.ndarray,
                      keep_mask: np.ndarray, V: int) -> int:
    """Merge one partition's spool with its resolved delta ops; returns
    the new row count.  key_final sorted ascending; keep_mask marks keys
    whose final op is add/update (False = delete)."""
    files = sorted(glob.glob(os.path.join(spool_dir, f"part={p}", "*.parquet")))
    cols = ["src_gid", "dst_gid"] + (["w"] if has_w else [])
    if files:
        t = pa.concat_tables([pq.read_table(f, columns=cols) for f in files])
        cs = t.column("src_gid").to_numpy(zero_copy_only=False).astype(np.int64)
        cd = t.column("dst_gid").to_numpy(zero_copy_only=False).astype(np.int64)
        cw = t.column("w").to_numpy(zero_copy_only=False).astype(np.float64) if has_w else None
    else:
        cs = cd = np.empty(0, np.int64)
        cw = np.empty(0, np.float64) if has_w else None
    cur_key = cs * V + cd
    pos = np.searchsorted(key_final, cur_key)
    pos = np.minimum(pos, len(key_final) - 1) if len(key_final) else pos
    touched = (key_final[pos] == cur_key) if len(key_final) else np.zeros(len(cur_key), bool)
    ns = np.concatenate([cs[~touched], s_final[keep_mask]])
    nd = np.concatenate([cd[~touched], d_final[keep_mask]])
    order = np.lexsort((nd, ns))
    ns, nd = ns[order], nd[order]
    out = {"src_gid": ns, "dst_gid": nd}
    if has_w:
        nw = np.concatenate([cw[~touched], w_final[keep_mask]])[order]
        out["w"] = nw
    os.makedirs(out_pdir, exist_ok=True)
    if len(ns):
        name = f"{int(ns[0]):012d}_{int(nd[0]):012d}_{uuid.uuid4().hex[:12]}.parquet"
        pq.write_table(pa.table(out), os.path.join(out_pdir, name))
    return len(ns)


def mutate_graph(meta: GraphMeta, delta: pa.Table, out_dir: str) -> GraphMeta:
    """Apply a delta batch to a built graph, producing a new graph dir.

    ``delta`` columns: op (a|d|u), src, dst, optional w (oid space).
    Undirected (symmetrized) graphs apply each op in both directions.
    """
    import ray

    marker = os.path.join(out_dir, "graph_meta.json")
    if os.path.exists(marker):
        return GraphMeta.load(out_dir)
    work = f"{out_dir}.building-{os.getpid()}"
    if os.path.isdir(work):
        shutil.rmtree(work)
    os.makedirs(work, exist_ok=True)

    sg = _translate_gids(meta, delta.column("src").to_numpy(zero_copy_only=False), "src")
    dg = _translate_gids(meta, delta.column("dst").to_numpy(zero_copy_only=False), "dst")
    op = np.asarray(delta.column("op").to_pylist())
    w = (delta.column("w").to_numpy(zero_copy_only=False).astype(np.float64)
         if "w" in delta.column_names else np.zeros(len(sg)))
    if not meta.directed:
        sg, dg = np.concatenate([sg, dg]), np.concatenate([dg, sg])
        op = np.concatenate([op, op])
        w = np.concatenate([w, w])

    V = int(meta.num_vertices)
    if V > 3_000_000_000:
        raise NotImplementedError("int64 (src*V+dst) keying needs review beyond 3e9 vertices")
    key = sg * V + dg
    seq = np.arange(len(key), dtype=np.int64)
    # last-op-wins per key: sort by (key, seq), take the last of each run
    order = np.lexsort((seq, key))
    k_s, s_s, d_s, w_s, op_s = key[order], sg[order], dg[order], w[order], op[order]
    last = np.concatenate([k_s[1:] != k_s[:-1], [True]]) if len(k_s) else np.zeros(0, bool)
    key_f, s_f, d_f, w_f, op_f = k_s[last], s_s[last], d_s[last], w_s[last], op_s[last]
    keep_mask = op_f != "d"

    owners = part_of(s_f, meta.starts)
    affected = np.unique(owners)
    spool = meta.spool_dir
    out_spool = os.path.join(work, "edges")
    os.makedirs(out_spool, exist_ok=True)

    mut = ray.remote(_mutate_partition)
    futs = {}
    for p in affected:
        m = owners == p
        futs[int(p)] = mut.remote(
            spool, int(p), os.path.join(out_spool, f"part={int(p)}"),
            meta.has_weights, key_f[m], s_f[m], d_f[m], w_f[m], keep_mask[m], V,
        )

    # hard-link untouched partitions' spool files and CSR snapshots
    # (same file names + sizes -> snapshot fingerprints keep matching)
    n_rows = {}
    for pdir in glob.glob(os.path.join(spool, "part=*")):
        p = int(os.path.basename(pdir).split("=")[1])
        if p in futs:
            continue
        npdir = os.path.join(out_spool, f"part={p}")
        os.makedirs(npdir, exist_ok=True)
        rows = 0
        for f in glob.glob(os.path.join(pdir, "*.parquet")):
            os.link(f, os.path.join(npdir, os.path.basename(f)))
            rows += pq.ParquetFile(f).metadata.num_rows
        n_rows[p] = rows
    snap_src = os.path.join(meta.work_dir, "snapshot")
    if os.path.isdir(snap_src):
        snap_dst = os.path.join(work, "snapshot")
        os.makedirs(snap_dst, exist_ok=True)
        for sd in glob.glob(os.path.join(snap_src, "part=*")):
            if ".tmp-" in os.path.basename(sd):
                continue
            p = int(os.path.basename(sd).split("-")[0].split("=")[1])
            if p in futs:
                continue
            if os.path.isdir(sd):  # per-array .npy snapshot directory
                dd = os.path.join(snap_dst, os.path.basename(sd))
                os.makedirs(dd, exist_ok=True)
                for f in glob.glob(os.path.join(sd, "*.npy")):
                    os.link(f, os.path.join(dd, os.path.basename(f)))
            else:
                os.link(sd, os.path.join(snap_dst, os.path.basename(sd)))
    if not meta.extra.get("identity_oids") and os.path.isdir(meta.vertices_path):
        vdst = os.path.join(work, "vertices")
        os.makedirs(vdst, exist_ok=True)
        for f in glob.glob(os.path.join(meta.vertices_path, "*")):
            os.link(f, os.path.join(vdst, os.path.basename(f)))
    vdata_src = os.path.join(meta.work_dir, "vdata")
    if os.path.isdir(vdata_src):
        for pdir in glob.glob(os.path.join(vdata_src, "part=*")):
            npdir = os.path.join(work, "vdata", os.path.basename(pdir))
            os.makedirs(npdir, exist_ok=True)
            for f in glob.glob(os.path.join(pdir, "*.parquet")):
                os.link(f, os.path.join(npdir, os.path.basename(f)))

    for p, fut in futs.items():
        n_rows[p] = ray.get(fut)

    new_meta = GraphMeta(
        work_dir=work,
        num_vertices=meta.num_vertices,
        num_edges=int(sum(n_rows.values())),
        num_partitions=meta.num_partitions,
        starts=meta.starts.copy(),
        directed=meta.directed,
        oid_type=meta.oid_type,
        has_weights=meta.has_weights,
        fingerprint=f"{meta.fingerprint}+delta" if meta.fingerprint else "",
        extra=dict(meta.extra),
    )
    new_meta.extra["spool_sorted"] = True
    new_meta.save()
    try:
        os.rename(work, out_dir)
    except OSError:
        shutil.rmtree(work, ignore_errors=True)
        if not os.path.exists(marker):
            raise
    new_meta.work_dir = out_dir
    return new_meta
