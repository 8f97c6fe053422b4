"""Event-stream-shaped operators over the `events` table (batch engine;
the input is treated as an ordered, keyed log — ordering assumption:
each group is sorted by ts inside the stage).

- ``hourly_rollup``: tumbling 1h windows — partial aggregation inside
  map_batches, then a small groupby (pre-aggregate pattern).
- ``sliding_rollup``: hopping windows (any multiple-of-hop start) —
  tumbling-hop pre-aggregate, THEN the W/H window replication over the
  small partials, then one merge groupby.
- ``sessionize``: 30-min-gap sessions per user via one coarse-shard
  groupby + vectorized run detection (ops/_shard.py) — no per-user
  Python calls.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["hourly_rollup", "sliding_rollup", "sessionize"]

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
    the user (1-based).

    One coarse-shard groupby (see ops/_shard.py) instead of a Python
    call per user: inside each shard, one lexsort by (user, ts), then
    session boundaries / lengths / per-user ranks all come out of
    run-boundary numpy sweeps."""
    from ._shard import sharded_map_groups

    gap_us = gap_minutes * 60_000_000

    def per_shard(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, uid))
        uid, ts = uid[order], ts[order]
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        brk = new_user | np.r_[True, (ts[1:] - ts[:-1]) > gap_us]
        bounds = np.flatnonzero(brk)
        n_ev = np.diff(np.r_[bounds, len(uid)])
        s_user = uid[bounds]
        # session_id = 1-based rank of the session within its user
        user_first = np.flatnonzero(np.r_[True, s_user[1:] != s_user[:-1]])
        sess_lens = np.diff(np.r_[user_first, len(s_user)])
        sid = np.arange(len(s_user)) - np.repeat(user_first, sess_lens) + 1
        return pa.table({
            "user_id": pa.array(s_user, pa.int64()),
            "session_id": pa.array(sid, pa.int64()),
            "session_start_us": pa.array(ts[bounds], pa.int64()),
            "n_events": pa.array(n_ev, pa.int64()),
        })

    def to_us(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b.column("user_id"),
            "ts_us": b.column("ts").cast(pa.int64()),
        })

    return sharded_map_groups(
        events_ds.map_batches(to_us, batch_format="pyarrow", batch_size=None),
        ["user_id"], per_shard)


def sliding_rollup(events_ds, window_minutes: int = 60, hop_minutes: int = 15):
    """(user_id, window_start_us, n_events, sum_value) over HOPPING
    (sliding) windows [s, s+W) with s any multiple of H = hop.

    Scale shape: per-batch partials on (user, hop-bucket) FIRST — a
    tumbling-H pre-aggregate — so the W/H-fold window replication runs
    over the much smaller hop partials, never the raw events; one
    final groupby over (user, window_start) merges the partials.  A
    window row is emitted only if it contains >= 1 event (sparse, like
    the tumbling rollup)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    W = window_minutes * 60_000_000
    H = hop_minutes * 60_000_000
    if W % H:
        raise ValueError("window must be a multiple of hop")
    R = W // H

    def partial(b: pa.Table) -> pa.Table:
        ts = b.column("ts").cast(pa.int64())
        hop = pc.multiply(pc.divide(ts, H), H)
        t = pa.table({"user_id": b.column("user_id"),
                      "hop": hop, "v": b.column("value")})
        g = t.group_by(["user_id", "hop"]).aggregate(
            [("v", "sum"), ("v", "count")])
        # expand each hop partial to the R windows containing it
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        hp = g.column("hop").to_numpy(zero_copy_only=False)
        vs = g.column("v_sum").to_numpy(zero_copy_only=False)
        vc = g.column("v_count").to_numpy(zero_copy_only=False)
        k = np.tile(np.arange(R, dtype=np.int64), len(uid))
        return pa.table({
            "user_id": pa.array(np.repeat(uid, R), pa.int64()),
            "window_start_us": pa.array(np.repeat(hp, R) - k * H, pa.int64()),
            "n": pa.array(np.repeat(vc, R), pa.int64()),
            "v": pa.array(np.repeat(vs, R), pa.float64()),
        })

    return (events_ds
            .map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby(["user_id", "window_start_us"])
            .aggregate(Sum("n", alias_name="n_events"),
                       Sum("v", alias_name="sum_value")))
