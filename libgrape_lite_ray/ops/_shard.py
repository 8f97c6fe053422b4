"""Coarse-shard groupby helper: vectorized group processing without
one-Python-call-per-group ``map_groups``.

``Dataset.groupby(keys).map_groups(fn)`` fires ``fn`` once per DISTINCT
key — at web scale that is millions-to-billions of pandas/Python
invocations for tiny groups (per-user sessions, per-vertex reductions,
per-LSH-bucket pair expansion).  ``sharded_map_groups`` keeps the same
one-shuffle cost but groups by a COARSE hash shard (~4x cluster CPUs),
so the user ``fn`` receives ALL rows of every key hashing to the shard
in one Arrow table and can process the key-runs vectorized (lexsort +
run-boundary detection).  Keys never split across shards, so any
per-key computation stays exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _default_shards() -> int:
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(32, min(1024, 4 * cpus))


def shard_of(cols: list[np.ndarray], num_shards: int) -> np.ndarray:
    """Mixed-hash shard id (int64) from one or more key columns."""
    n = len(cols[0]) if cols else 0
    mix = np.zeros(n, dtype=np.uint64)
    for v in cols:
        if v.dtype.kind not in "iu":
            from .dedup import _fnv1a_batch

            v = _fnv1a_batch([str(x) for x in v])
        mix = (mix ^ v.astype(np.uint64, copy=False)) * _MIX
    return ((mix >> np.uint64(33)) % np.uint64(num_shards)).astype(np.int64)


def sharded_map_groups(ds, key_cols: list[str], fn, num_shards: int | None = None):
    """``fn(pa.Table) -> pa.Table`` over whole shards (multiple keys per
    call, key-runs NOT pre-sorted — ``fn`` lexsorts itself)."""
    S = num_shards or _default_shards()

    def add_shard(t: pa.Table) -> pa.Table:
        cols = [t.column(c).to_numpy(zero_copy_only=False) for c in key_cols]
        return t.append_column("_shard", pa.array(shard_of(cols, S), pa.int64()))

    def run(g: pa.Table) -> pa.Table:
        return fn(g.drop_columns(["_shard"]))

    return (ds.map_batches(add_shard, batch_format="pyarrow", batch_size=None)
            .groupby("_shard").map_groups(run, batch_format="pyarrow"))
