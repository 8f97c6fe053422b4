"""Streaming micro-batch loop (run_sampler.cc driver-loop analog):
apply successive deltas through mutate_graph on a warm actor pool and
assert the final state equals a from-scratch full build."""

import os

import numpy as np
import pyarrow as pa
import pytest

from libgrape_lite_ray import fixtures
from libgrape_lite_ray.graph import oracle
from libgrape_lite_ray.graph.build import build_graph, edges_from_numpy
from libgrape_lite_ray.streaming import MicroBatchLoop, table_source


def _delta(ops, srcs, dsts):
    return pa.table({"op": pa.array(ops, pa.string()),
                     "src": pa.array(srcs, pa.int64()),
                     "dst": pa.array(dsts, pa.int64()),
                     "w": pa.array(np.zeros(len(ops)))})


def test_micro_batch_wcc_converges_to_full(ray_session, tmp_work):
    """er_components has two components; stream in bridge edges one
    micro-batch at a time and watch WCC merge them."""
    src, dst = fixtures.er_components()
    n = 100
    base = build_graph(edges_from_numpy(src, dst), os.path.join(tmp_work, "base"),
                       3, symmetrize=True)
    loop = MicroBatchLoop(base, "wcc", {}, os.path.join(tmp_work, "stream"))
    try:
        # batch 1: an edge inside component 0 (no merge)
        r1, m1 = loop.step(_delta(["a"], [0], [7]))
        comp1 = r1.to_pandas().sort_values("gid")["comp"].to_numpy()
        assert len(np.unique(comp1)) == 2
        # batch 2: bridge the components -> single component
        r2, m2 = loop.step(_delta(["a"], [0], [99]))
        comp2 = r2.to_pandas().sort_values("gid")["comp"].to_numpy()
        assert len(np.unique(comp2)) == 1
        assert m2["generation"] == 2 and m2["num_edges"] == base.num_edges + 4
        # equivalence with a full build of base + both deltas
        s3 = np.concatenate([src, [0, 0]])
        d3 = np.concatenate([dst, [7, 99]])
        want = oracle.wcc(s3, d3, n)
        assert np.array_equal(comp2, want)
    finally:
        loop.shutdown()


def test_micro_batch_delete_splits_component(ray_session, tmp_work):
    """Deleting the only bridge re-splits the graph (delete path)."""
    src, dst = fixtures.er_components()
    s0 = np.concatenate([src, [0]])
    d0 = np.concatenate([dst, [99]])
    base = build_graph(edges_from_numpy(s0, d0), os.path.join(tmp_work, "base"),
                       3, symmetrize=True)
    loop = MicroBatchLoop(base, "wcc", {}, os.path.join(tmp_work, "stream"))
    try:
        r, _ = loop.step(_delta(["d"], [0], [99]))
        comp = r.to_pandas().sort_values("gid")["comp"].to_numpy()
        want = oracle.wcc(src, dst, 100)
        assert np.array_equal(comp, want)
        assert len(np.unique(comp)) == 2
    finally:
        loop.shutdown()
