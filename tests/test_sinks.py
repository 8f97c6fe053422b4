"""Resumable partitioned output: atomic per-partition commits, and a
resumed write skips finished partitions while completing missing ones
(the 100-TB restartability contract — never one giant file, never a
marked partial)."""

import glob
import os

import numpy as np
import pyarrow.parquet as pq


def _read_all(out_dir):
    import pandas as pd

    files = sorted(glob.glob(os.path.join(out_dir, "part=*", "data.parquet")))
    return pd.concat([pq.read_table(f).to_pandas() for f in files],
                     ignore_index=True)


def test_result_handle_partitioned_resume(ray_session, tmp_work):
    from libgrape_lite_ray.graph.build import build_graph, edges_from_numpy
    from libgrape_lite_ray.graph.driver import GraphEngine
    from libgrape_lite_ray.sinks import (finished_partitions,
                                         write_result_partitioned)

    rng = np.random.default_rng(3)
    src = rng.integers(0, 200, 1500).astype(np.int64)
    dst = rng.integers(0, 200, 1500).astype(np.int64)
    meta = build_graph(edges_from_numpy(src, dst), f"{tmp_work}/g", 4,
                       dense_int_oids=True)
    eng = GraphEngine(meta)
    try:
        res, _ = eng.run("degree")
        out = os.path.join(tmp_work, "out")
        st = write_result_partitioned(res, out)
        assert st == {"written": 4, "skipped": 0, "rows": 200}
        assert finished_partitions(out) == {0, 1, 2, 3}

        # simulate a torn run: kill one partition's marker + data
        import shutil

        shutil.rmtree(os.path.join(out, "part=2"))
        # leave another partition UNMARKED (torn write): must re-write
        os.remove(os.path.join(out, "part=1", "_SUCCESS"))

        res2, _ = eng.run("degree")
        st2 = write_result_partitioned(res2, out)
        assert st2["skipped"] == 2 and st2["written"] == 2
        df = _read_all(out).sort_values("gid").reset_index(drop=True)
        assert len(df) == 200
        deg = np.bincount(np.unique(src * 1000 + dst) // 1000, minlength=200)
        np.testing.assert_array_equal(df["degree"].to_numpy(), deg)
    finally:
        eng.shutdown()


def test_dataset_partitioned_resume(ray_session, tmp_work):
    import ray.data as rd

    from libgrape_lite_ray.sinks import write_dataset_partitioned

    ds = rd.range(1000)
    out = os.path.join(tmp_work, "dsout")
    st = write_dataset_partitioned(ds, out, num_partitions=8,
                                   key_fn=lambda b: b["id"].to_numpy())
    assert st["written"] == 8 and st["rows"] == 1000
    # wipe two buckets; resume completes exactly those
    import shutil

    shutil.rmtree(os.path.join(out, "part=3"))
    shutil.rmtree(os.path.join(out, "part=5"))
    st2 = write_dataset_partitioned(ds, out, num_partitions=8,
                                    key_fn=lambda b: b["id"].to_numpy())
    assert st2["written"] == 2 and st2["skipped"] == 6
    df = _read_all(out)
    assert sorted(df["id"].tolist()) == list(range(1000))
