"""Vertex-id and partitioning arithmetic.

The reference gives every vertex a dense internal gid and derives the
owning fragment from the id (grape/fragment/id_parser.h:45-55 encodes
fid in the high bits; the default SegmentedPartitioner assigns
contiguous oid ranges, grape/fragment/partitioner.h:88-158).

We combine both ideas: gids are the dense rank of the vertex in
oid-sorted order (0..V-1), and partitions are contiguous gid ranges
described by a small ``starts`` boundary array (P+1 entries).  Because
gid order == oid order, min-gid label propagation (WCC/CDLP) is exactly
min-oid label propagation after the final gid->oid re-attach, matching
the reference's oid-label convention (wcc/wcc.h comp_id = vertex id,
cdlp_context.h label_t = oid_t).

Ownership is pure arithmetic (searchsorted over P+1 ints), so any stage
can route a gid without a lookup table — the property the reference gets
from id bit-encoding.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "partition_starts",
    "part_of",
    "weighted_partition_starts",
]


def partition_starts(num_vertices: int, num_partitions: int) -> np.ndarray:
    """Equal-vertex-count contiguous ranges. Returns int64[P+1]."""
    return np.linspace(0, num_vertices, num_partitions + 1).astype(np.int64)


def weighted_partition_starts(
    sample_gids: np.ndarray,
    sample_weights: np.ndarray,
    num_vertices: int,
    num_partitions: int,
) -> np.ndarray:
    """Degree-aware contiguous ranges (reference Rebalancer analog,
    grape/worker/rebalancer.h:99-196: split so cumulative
    degree+vertex_factor is balanced).

    ``sample_gids``/``sample_weights`` are checkpoints of the weight
    distribution at sampled gids (ascending).  Boundaries are chosen so
    each partition holds ~1/P of total weight, snapped to sampled gids.
    """
    order = np.argsort(sample_gids, kind="stable")
    gids = sample_gids[order].astype(np.int64)
    w = sample_weights[order].astype(np.float64)
    cum = np.cumsum(w)
    total = cum[-1] if len(cum) else 0.0
    starts = [0]
    for p in range(1, num_partitions):
        target = total * p / num_partitions
        i = int(np.searchsorted(cum, target, side="left"))
        if i >= len(gids):
            b = num_vertices
        else:
            b = int(gids[i]) + 1
        b = max(b, starts[-1])  # keep monotone; empty partitions allowed
        starts.append(min(b, num_vertices))
    starts.append(num_vertices)
    return np.asarray(starts, dtype=np.int64)


def part_of(gids: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Owning partition of each gid (vectorized; starts is int64[P+1])."""
    return (np.searchsorted(starts[1:], gids, side="right")).astype(np.int32)
