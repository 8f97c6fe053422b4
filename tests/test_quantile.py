"""Exact distributed quantiles vs numpy rank-select."""

import numpy as np
import pyarrow as pa


def test_exact_quantiles(ray_session):
    import ray.data as rd

    from libgrape_lite_ray.ops.quantile import exact_quantiles, quantile_rank

    rng = np.random.default_rng(13)
    vals = rng.normal(size=10_000)
    ds = rd.from_arrow(pa.table({"value": pa.array(vals)})).repartition(9)
    qs = [0.0, 0.25, 0.5, 0.75, 1.0]
    got = exact_quantiles(ds, "value", qs).to_pandas()
    sv = np.sort(vals)
    for q, r, v in zip(got["q"], got["rank"], got["value"]):
        assert r == quantile_rank(q, len(vals))
        assert v == sv[r]


def test_exact_quantiles_empty_and_validation(ray_session):
    import pytest
    import ray.data as rd

    from libgrape_lite_ray.ops.quantile import exact_quantiles

    empty = rd.from_arrow(pa.table({"value": pa.array([], pa.float64())}))
    assert exact_quantiles(empty, "value", [0.5]).num_rows == 0
    with pytest.raises(ValueError):
        exact_quantiles(empty, "value", [1.5])
