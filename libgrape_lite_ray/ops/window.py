"""Event-stream-shaped operators over the `events` table (batch engine;
the input is treated as an ordered, keyed log — ordering assumption:
each group is sorted by ts inside the stage).

- ``hourly_rollup``: tumbling 1h windows — partial aggregation inside
  map_batches, then a small groupby (pre-aggregate pattern).
- ``sessionize``: 30-min-gap sessions per user via
  groupby(user).map_groups over ts-sorted groups.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["hourly_rollup", "sessionize"]

HOUR_US = 3_600_000_000


def hourly_rollup(events_ds):
    """(user_id, hour_start_us, n_events, sum_value) — partials per
    batch then a final sum groupby over the much smaller partials."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # pure-Arrow combiner (timestamps are non-negative, so integer
        # divide == floor); no pandas copy inside the Arrow stage
        ts = b.column("ts").cast(pa.int64())
        hour = pc.multiply(pc.divide(ts, HOUR_US), HOUR_US)
        t = pa.table({"user_id": b.column("user_id"),
                      "hour_start_us": hour,
                      "v": b.column("value")})
        g = t.group_by(["user_id", "hour_start_us"]).aggregate(
            [("v", "sum"), ("v", "count")])
        return pa.table({"user_id": g.column("user_id"),
                         "hour_start_us": g.column("hour_start_us"),
                         "n": g.column("v_count").cast(pa.int64()),
                         "v": g.column("v_sum")})

    return (
        events_ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["user_id", "hour_start_us"])
        .aggregate(Sum("n", alias_name="n_events"), Sum("v", alias_name="sum_value"))
    )


def sessionize(events_ds, gap_minutes: int = 30):
    """(user_id, session_id, session_start_us, n_events) — session
    breaks at ts gaps > gap.  session_id = rank of session start within
    the user."""
    gap_us = gap_minutes * 60_000_000

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts_us", kind="mergesort")
        ts = g["ts_us"].to_numpy()
        brk = np.concatenate([[True], np.diff(ts) > gap_us])
        sid = np.cumsum(brk)
        out = g.assign(session_id=sid).groupby("session_id", as_index=False).agg(
            user_id=("user_id", "first"),
            session_start_us=("ts_us", "min"),
            n_events=("ts_us", "size"),
        )
        return out[["user_id", "session_id", "session_start_us", "n_events"]]

    def to_us(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b.column("user_id"),
            "ts_us": b.column("ts").cast(pa.int64()),
        })

    return (
        events_ds.map_batches(to_us, batch_format="pyarrow", batch_size=None)
        .groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
    )
