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


def test_hll_rho_exact_integer_bitlength():
    """_rho must equal the exact python-int computation for EVERY p the
    API accepts, including adversarial suffixes just below a power of
    two (where float64 log2 rounded UP once the suffix exceeded 53
    bits — the p < 11 bias this guards against)."""
    from libgrape_lite_ray.ops.sketch import _rho

    for p in (4, 6, 8, 10, 11, 12, 18):
        width = 64 - p
        adversarial = [0, 1, 2, 3, (1 << width) - 1, (1 << width) - 2,
                       (1 << 53) - 1 if width > 53 else (1 << (width - 1)) - 1,
                       (1 << min(60, width)) - 1, 1 << (width - 1)]
        w = np.array([a & ((1 << width) - 1) for a in adversarial], np.uint64)
        got = _rho(w, p)
        want = np.array(
            [width + 1 if x == 0 else width - (int(x).bit_length() - 1)
             for x in w.tolist()], np.uint8)
        np.testing.assert_array_equal(got, want, err_msg=f"p={p}")


def test_hll_registers_match_pure_python(ray_session):
    """End-to-end register parity vs a per-value pure-python fold at a
    small p (the regime the float64 path got wrong)."""
    from libgrape_lite_ray.ops.sketch import _block_registers, _hash64

    vals = pa.array(np.arange(50_000, dtype=np.int64) * 2654435761 + 7)
    for p in (4, 8, 11):
        regs = _block_registers(vals, p)
        exp = np.zeros(1 << p, np.uint8)
        for hh in _hash64(vals).tolist():
            idx = hh >> (64 - p)
            w = hh & ((1 << (64 - p)) - 1)
            rho = (64 - p + 1) if w == 0 else (64 - p) - (w.bit_length() - 1)
            if rho > exp[idx]:
                exp[idx] = rho
        np.testing.assert_array_equal(regs, exp, err_msg=f"p={p}")
