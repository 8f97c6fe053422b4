"""Vertex programs (PIE-app analogs, examples/analytical_apps/*).

Each program runs inside every fragment actor; the superstep driver
(driver.py) orchestrates produce/consume rounds and global reductions,
mirroring grape/worker/worker.h:87-133.
"""

from .base import VertexProgram
from .pagerank import PageRank
from .pagerank_local import PageRankLocal
from .wcc import WCC
from .cdlp import CDLP
from .bfs import BFS
from .sssp import SSSP
from .lcc import LCC
from .sample import MultiHopSampler, SampleNeighbors
from .vdata import VDataMatch, VDataSum
from .degree import Degree
from .kcore import KCore
from .coreness import Coreness
from .msbfs import MSBFS
from .ppr import PPR
from .hits import HITS

PROGRAMS = {p.name: p for p in (PageRank, PageRankLocal, PPR, HITS, WCC, CDLP, BFS, SSSP,
                                LCC, Degree, KCore, Coreness, MSBFS, SampleNeighbors, MultiHopSampler,
                                VDataSum, VDataMatch)}

__all__ = ["VertexProgram", "PageRank", "PageRankLocal", "PPR", "HITS", "WCC", "CDLP", "BFS", "KCore",
           "SSSP", "LCC", "Degree", "Coreness", "MSBFS", "SampleNeighbors", "MultiHopSampler",
           "VDataSum", "VDataMatch", "PROGRAMS"]
