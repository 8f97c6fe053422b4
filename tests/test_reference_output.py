"""Reference text output format (M8): ``oid %.15e`` / ``infinity``
lines must be byte-identical to the reference's own printf output —
validated by re-formatting the golden files' parsed values."""

import os

import numpy as np
import pytest

from libgrape_lite_ray.sources.reference_format import (
    format_result_lines,
    write_reference_output,
)

DATA = "/root/reference/dataset"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(DATA, "p2p-31-PR")),
    reason="reference goldens absent",
)


@pytest.mark.parametrize("name", ["p2p-31-PR", "p2p-31-SSSP"])
def test_float_format_is_byte_identical(name):
    raw = open(os.path.join(DATA, name)).read().splitlines()
    oids = np.array([int(l.split()[0]) for l in raw])
    vals = np.array([float(l.split()[1]) for l in raw])
    got = format_result_lines(oids, vals)
    assert got == raw


def test_infinity_and_int_lines(tmp_path):
    import pyarrow as pa

    lines = format_result_lines(np.array([1, 2]), np.array([np.inf, 0.5]))
    assert lines == ["1 infinity", "2 5.000000000000000e-01"]
    assert format_result_lines(np.array([3]), np.array([7])) == ["3 7"]

    t = pa.table({"oid": pa.array([2, 1, 3], pa.int64()),
                  "dist": pa.array([1.0, np.inf, 2.5], pa.float64())})
    paths = write_reference_output(t, str(tmp_path / "out"), "dist", num_shards=2)
    text = "".join(open(p).read() for p in paths)
    assert text == "1 infinity\n2 1.000000000000000e+00\n3 2.500000000000000e+00\n"
