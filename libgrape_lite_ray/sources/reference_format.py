"""Readers for the reference's LDBC-style text graph format
(README.md:74; grape/io/tsv_line_parser.h:36-77):

- ``.e`` file: whitespace-separated ``src dst [edata]`` lines;
- ``.v`` file: ``oid [vdata]`` lines;
- ``#``-prefixed and blank lines skipped
  (ev_fragment_loader.h:110-117); malformed lines dropped and counted
  (ev_fragment_loader.h:159-164 tolerance).

Built on ``ray.data.read_text`` (Ray's newline-aligned file splitting
subsumes LocalIOAdaptor::SetPartialRead, local_io_adaptor.cc:143-196)
with a vectorized per-batch parse.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

__all__ = ["read_edge_file", "read_vertex_file", "format_result_lines",
           "write_reference_output"]


def _parse_lines(lines: list[str], n_cols: int, weighted: bool):
    src, dst, w = [], [], []
    dropped = 0
    for ln in lines:
        s = ln.strip()
        if not s or s.startswith("#"):
            continue
        parts = s.split()
        if len(parts) < n_cols:
            dropped += 1
            continue
        try:
            src.append(int(parts[0]))
            dst.append(int(parts[1]))
            if weighted:
                w.append(float(parts[2]) if len(parts) > 2 else 1.0)
        except ValueError:
            dropped += 1
    return src, dst, w, dropped


def read_edge_file(path: str, weighted: bool = False):
    """.e file -> Dataset(src int64, dst int64 [, w float64])."""
    import ray.data as rd

    def parse(batch: dict) -> pa.Table:
        src, dst, w, _dropped = _parse_lines(list(batch["text"]), 2, weighted)
        cols = {
            "src": pa.array(np.asarray(src, np.int64)),
            "dst": pa.array(np.asarray(dst, np.int64)),
        }
        if weighted:
            cols["w"] = pa.array(np.asarray(w, np.float64))
        return pa.table(cols)

    return rd.read_text(path).map_batches(parse, batch_format="numpy", batch_size=None)


def format_result_lines(oids: np.ndarray, vals: np.ndarray) -> list[str]:
    """Format ``oid value`` lines exactly like the reference's output
    contexts: floats as C printf ``%.15e`` (sssp_context.h os <<
    scientific; pagerank goldens), ``infinity`` for +inf
    (sssp_auto_context.h:66), integers plain."""
    if np.issubdtype(np.asarray(vals).dtype, np.floating):
        return [f"{int(o)} infinity" if np.isinf(v) else f"{int(o)} {v:.15e}"
                for o, v in zip(oids, vals)]
    return [f"{int(o)} {int(v)}" for o, v in zip(oids, vals)]


def write_reference_output(result_table: pa.Table, out_prefix: str,
                           value_col: str, oid_col: str = "oid",
                           num_shards: int = 1) -> list[str]:
    """Write a per-vertex result as the reference's text output layout:
    ``{out_prefix}/result_frag_{p}`` files of ``oid value`` lines
    (app_tests.sh out_prefix convention), sharded by contiguous row
    ranges.  Returns the written paths."""
    os.makedirs(out_prefix, exist_ok=True)
    oids = result_table.column(oid_col).to_numpy(zero_copy_only=False)
    vals = result_table.column(value_col).to_numpy(zero_copy_only=False)
    order = np.argsort(oids, kind="stable")
    oids, vals = oids[order], vals[order]
    bounds = np.linspace(0, len(oids), num_shards + 1).astype(np.int64)
    paths = []
    for p in range(num_shards):
        lines = format_result_lines(oids[bounds[p]:bounds[p + 1]],
                                    vals[bounds[p]:bounds[p + 1]])
        path = os.path.join(out_prefix, f"result_frag_{p}")
        with open(path, "w") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))
        paths.append(path)
    return paths


def read_vertex_file(path: str):
    """.v file -> Dataset(oid int64)."""
    import ray.data as rd

    def parse(batch: dict) -> pa.Table:
        oids = []
        for ln in batch["text"]:
            s = ln.strip()
            if not s or s.startswith("#"):
                continue
            try:
                oids.append(int(s.split()[0]))
            except ValueError:
                continue
        return pa.table({"oid": pa.array(np.asarray(oids, np.int64))})

    return rd.read_text(path).map_batches(parse, batch_format="numpy", batch_size=None)
