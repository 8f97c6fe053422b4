"""Degree-aware partitioning weights BOTH endpoints (total degree).

On an in-degree-skewed graph (web-style hub page), the symmetrized
variant built from the donor's partition starts must stay
edge-balanced: the round-4 advisor found that out-degree-only endpoint
weights made the donor starts blind to the hub, packing all its
reverse edges into one partition of the undirected build (measured
~1.8x the mean on this topology)."""

import glob
import os

import numpy as np
import pyarrow.parquet as pq


def _spool_counts(meta):
    counts = []
    for p in range(meta.num_partitions):
        files = glob.glob(os.path.join(meta.spool_dir, f"part={p}", "*"))
        counts.append(sum(pq.ParquetFile(f).metadata.num_rows for f in files))
    return counts


def test_symmetrized_donor_balance_on_indegree_skew(ray_session, tmp_work):
    from libgrape_lite_ray.graph.build import build_graph, edges_from_numpy

    n, spokes = 4000, 2000
    ring_src = np.arange(n - 1, dtype=np.int64)
    ring_dst = ring_src + 1
    sp_src = np.arange(1, spokes + 1, dtype=np.int64)
    sp_dst = np.zeros(spokes, np.int64)  # hub: in-degree 2000, out-degree 1
    src = np.concatenate([ring_src, sp_src])
    dst = np.concatenate([ring_dst, sp_dst])

    meta_d = build_graph(edges_from_numpy(src, dst), f"{tmp_work}/d", 4)
    meta_u = build_graph(None, f"{tmp_work}/u", 4, directed=False,
                         symmetrize=True, reuse_vertices_from=meta_d)

    counts = _spool_counts(meta_u)
    assert sum(counts) == meta_u.num_edges
    mean = sum(counts) / len(counts)
    # the hub's total degree is ~17% of all symmetrized edges (< the
    # 25% per-partition target), so balanced starts are feasible; the
    # old out-degree-only weighting measured max/mean ~1.8 here
    assert max(counts) / mean < 1.5, counts


def test_weighted_starts_isolate_heavy_vertex():
    """Pure-function check: a hub holding ~40% of total weight gets a
    partition (nearly) to itself instead of dragging half the id space
    along — the contiguous-range analog of GRAPE's Rebalancer."""
    from libgrape_lite_ray.ids import weighted_partition_starts

    V, P = 1000, 4
    gids = np.arange(V, dtype=np.int64)
    w = np.ones(V, np.float64)
    w[500] = 660.0  # ~40% of the 1659 total
    starts = weighted_partition_starts(gids, w, V, P)
    assert starts[0] == 0 and starts[-1] == V
    assert (np.diff(starts) >= 0).all()
    sizes = [w[starts[i]:starts[i + 1]].sum() for i in range(P)]
    # the hub's partition may not also own a big share of the light
    # vertices: its weight must be dominated by the hub itself
    hub_part = int(np.searchsorted(starts, 500, side="right")) - 1
    assert sizes[hub_part] <= 660.0 + (V - 1) / P
    # and the light partitions split the remainder roughly evenly
    light = [s for i, s in enumerate(sizes) if i != hub_part]
    assert max(light) <= 2.2 * (sum(light) / len(light))
