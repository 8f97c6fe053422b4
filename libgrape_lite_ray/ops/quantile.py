"""Exact distributed quantiles — rank-select over a distributed sort.

The value column range-sorts across the cluster (Ray Data's
distributed sort; the only all-to-all), per-block row COUNTS (one
int per block) come back to the driver, and only the few blocks that
actually CONTAIN a requested rank are fetched — for k quantiles at
most k blocks move, never the dataset.  Rank convention is
``floor(q * (n - 1))`` over the ascending order (the lower /
"disc"-style quantile), reproducible in SQL as
``ORDER BY col LIMIT 1 OFFSET rank`` — which is exactly what the
DuckDB oracle runs, so the result is integer/float EXACT, no
interpolation ambiguity.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["exact_quantiles", "quantile_rank"]


def quantile_rank(q: float, n: int) -> int:
    """The ascending-order rank this module selects for quantile q."""
    return int(np.floor(q * (n - 1)))


def exact_quantiles(ds, col: str, qs: list[float]):
    """-> pa.Table (q, rank, value), one row per requested quantile."""
    import ray

    if not qs or any(not 0 <= q <= 1 for q in qs):
        raise ValueError("qs must be non-empty fractions in [0, 1]")
    s = ds.select_columns([col]).sort(col).materialize()
    refs = s.to_arrow_refs()

    @ray.remote(num_cpus=0.25)
    def _nrows(ref):
        return ref.num_rows

    counts = ray.get([_nrows.remote(r) for r in refs])
    n = int(sum(counts))
    if n == 0:
        return pa.table({"q": pa.array([], pa.float64()),
                         "rank": pa.array([], pa.int64()),
                         "value": pa.array([], pa.float64())})
    offsets = np.concatenate([[0], np.cumsum(counts)])
    out_q, out_r, out_v = [], [], []
    fetched: dict[int, pa.Table] = {}
    for q in qs:
        r = quantile_rank(q, n)
        b = int(np.searchsorted(offsets, r, side="right") - 1)
        if b not in fetched:
            fetched[b] = ray.get(refs[b])  # only rank-holding blocks move
        v = fetched[b].column(col)[r - int(offsets[b])].as_py()
        out_q.append(float(q))
        out_r.append(r)
        out_v.append(v)
    return pa.table({"q": pa.array(out_q, pa.float64()),
                     "rank": pa.array(out_r, pa.int64()),
                     "value": pa.array(out_v)})
