"""HyperLogLog sketch: accuracy bounds, merge associativity,
determinism under re-partitioning."""

import numpy as np
import pyarrow as pa


def test_hll_accuracy_and_determinism(ray_session):
    import ray.data as rd

    from libgrape_lite_ray.ops.sketch import hll_distinct

    n = 100_000
    ids = np.arange(n, dtype=np.int64) * 7919 + 13  # distinct ints
    vals = np.concatenate([ids, ids[: n // 2]])     # dupes don't inflate
    ds = rd.from_arrow(pa.table({"v": pa.array(vals)}))
    est, regs = hll_distinct(ds, "v", p=12)
    assert abs(est - n) / n < 0.05  # ~3 sigma at p=12

    # re-partitioned input -> bit-identical registers (max is
    # associative/commutative, hashing is seedless)
    est2, regs2 = hll_distinct(ds.repartition(7), "v", p=12)
    assert est2 == est and (regs2 == regs).all()


def test_hll_strings_and_merge(ray_session):
    import ray.data as rd

    from libgrape_lite_ray.ops.sketch import (hll_distinct, hll_estimate,
                                              hll_merge)

    a = [f"tok-{i}" for i in range(5000)]
    b = [f"tok-{i}" for i in range(2500, 7500)]  # 2500 overlap
    da = rd.from_arrow(pa.table({"t": pa.array(a)}))
    db = rd.from_arrow(pa.table({"t": pa.array(b)}))
    _, ra = hll_distinct(da, "t")
    _, rb = hll_distinct(db, "t")
    est_union = hll_estimate(hll_merge([ra, rb]))
    assert abs(est_union - 7500) / 7500 < 0.06
