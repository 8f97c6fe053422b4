"""Single-node NumPy oracle — literal implementations of the reference
algorithm semantics, used as golden truth by the test suite (the
reference validates the same way: golden outputs on small graphs,
misc/app_tests.sh).

Inputs are edge arrays ``(src, dst)`` of int64 vertex ids in ``[0, n)``.
Conventions (matching the engine's build):

- multi-edges are removed (``(src, dst)`` dedup) before building
  adjacency, for BOTH directed and undirected runs;
- "undirected" means the edge set is symmetrized first;
- labels are vertex ids (the engine assigns gids in oid-sorted order so
  id-labels == oid-labels, cf. wcc/wcc.h WCC_USE_GID-off branch).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "dedup_edges",
    "symmetrize",
    "pagerank",
    "wcc",
    "cdlp",
    "triangles_lcc",
    "bfs",
    "sssp",
]


def dedup_edges(src: np.ndarray, dst: np.ndarray):
    pairs = np.stack([src, dst], axis=1)
    pairs = np.unique(pairs, axis=0)
    return pairs[:, 0], pairs[:, 1]


def symmetrize(src: np.ndarray, dst: np.ndarray):
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    return dedup_edges(s, d)


def pagerank(src, dst, n: int, rounds: int = 10, d: float = 0.85):
    """examples/analytical_apps/pagerank/pagerank.h:52-219, literally.

    State kept as rank/out_degree (rank for dangling); per round
    ``base = (1-d)/N + d*dangling_sum/N``; ``dangling_sum = base*D``;
    pull over out-adjacency; final multiply-by-degree.
    """
    src, dst = dedup_edges(np.asarray(src), np.asarray(dst))
    deg = np.bincount(src, minlength=n).astype(np.int64)
    p = 1.0 / n
    total_dangling = int((deg == 0).sum())
    result = np.where(deg > 0, p / np.maximum(deg, 1), p)
    dangling_sum = p * total_dangling
    for _ in range(rounds):
        base = (1.0 - d) / n + d * dangling_sum / n
        dangling_sum = base * total_dangling
        cur = np.bincount(src, weights=result[dst], minlength=n)
        result = np.where(deg > 0, (d * cur + base) / np.maximum(deg, 1), base)
    return np.where(deg > 0, result * deg, result)


def wcc(src, dst, n: int):
    """wcc/wcc.h:50-228 — min-vertex-id label to fixpoint."""
    s, t = symmetrize(np.asarray(src), np.asarray(dst))
    comp = np.arange(n, dtype=np.int64)
    while True:
        new = comp.copy()
        np.minimum.at(new, t, comp[s])
        if np.array_equal(new, comp):
            return comp
        comp = new


def cdlp(src, dst, n: int, rounds: int = 10):
    """cdlp/cdlp.h + cdlp_utils.h:28-60 — synchronous LPA over the
    undirected graph; label = most frequent neighbor label, smallest on
    tie; vertices without neighbors keep their label; exactly `rounds`
    propagation steps; labels start as vertex ids."""
    s, t = symmetrize(np.asarray(src), np.asarray(dst))
    order = np.argsort(t, kind="stable")
    s, t = s[order], t[order]
    # CSR over destinations: neighbors(v) = s[indptr[v]:indptr[v+1]]
    counts = np.bincount(t, minlength=n)
    indptr = np.concatenate([[0], np.cumsum(counts)])
    labels = np.arange(n, dtype=np.int64)
    for _ in range(rounds):
        new = labels.copy()
        for v in range(n):
            lo, hi = indptr[v], indptr[v + 1]
            if lo == hi:
                continue
            nbr_labels = labels[s[lo:hi]]
            # sorted ascending -> first strictly-max-count run = smallest
            nbr_labels = np.sort(nbr_labels)
            best_label, best_count = None, 0
            curr_label, curr_count = nbr_labels[0], 1
            for x in nbr_labels[1:]:
                if x != curr_label:
                    if curr_count > best_count:
                        best_label, best_count = curr_label, curr_count
                    curr_label, curr_count = x, 1
                else:
                    curr_count += 1
            if curr_count > best_count:
                best_label = curr_label
            new[v] = best_label
        labels = new
    return labels


def triangles_lcc(src, dst, n: int):
    """lcc/lcc.h:50-246 — per-vertex triangle counts via degree/gid
    orientation + neighbor-set intersection, and the LCC coefficient
    2*t / (deg*(deg-1)).  Returns (tricnt int64[n], lcc float64[n])."""
    s, t = symmetrize(np.asarray(src), np.asarray(dst))
    deg = np.bincount(s, minlength=n).astype(np.int64)  # distinct-neighbor degree
    # oriented: keep v->u if (deg[u], u) < (deg[v], v)
    keep = (deg[t] < deg[s]) | ((deg[t] == deg[s]) & (t < s))
    os_, ot = s[keep], t[keep]
    order = np.lexsort((ot, os_))
    os_, ot = os_[order], ot[order]
    counts = np.bincount(os_, minlength=n)
    indptr = np.concatenate([[0], np.cumsum(counts)])
    nplus = [ot[indptr[v]: indptr[v + 1]] for v in range(n)]
    nset = [set(a.tolist()) for a in nplus]
    tricnt = np.zeros(n, dtype=np.int64)
    for v in range(n):
        sv = nset[v]
        if not sv:
            continue
        for u in nplus[v]:
            for w in nplus[u]:
                if w in sv:
                    tricnt[v] += 1
                    tricnt[u] += 1
                    tricnt[w] += 1
    lcc = np.zeros(n, dtype=np.float64)
    m = deg >= 2
    lcc[m] = 2.0 * tricnt[m] / (deg[m] * (deg[m] - 1.0))
    return tricnt, lcc


def bfs(src, dst, n: int, source: int, directed: bool = True):
    """bfs/bfs.h — hop depth from `source`; unreachable = -1 (the text
    output prints a sentinel; we use -1 in-engine)."""
    s, t = (np.asarray(src), np.asarray(dst))
    if not directed:
        s, t = symmetrize(s, t)
    else:
        s, t = dedup_edges(s, t)
    depth = np.full(n, -1, dtype=np.int64)
    depth[source] = 0
    frontier = np.array([source])
    d = 0
    while len(frontier):
        mask = np.isin(s, frontier)
        nxt = np.unique(t[mask])
        nxt = nxt[depth[nxt] < 0]
        d += 1
        depth[nxt] = d
        frontier = nxt
    return depth


def sssp(src, dst, w, n: int, source: int, directed: bool = True):
    """sssp/sssp.h — shortest weighted distance; unreachable = +inf."""
    s, t, wt = np.asarray(src), np.asarray(dst), np.asarray(w, dtype=np.float64)
    if not directed:
        s2 = np.concatenate([s, t])
        t2 = np.concatenate([t, s])
        w2 = np.concatenate([wt, wt])
        s, t, wt = s2, t2, w2
    dist = np.full(n, np.inf)
    dist[source] = 0.0
    while True:
        cand = dist[s] + wt
        new = dist.copy()
        np.minimum.at(new, t, cand)
        if np.array_equal(new, dist):
            return dist
        dist = new
