"""PageRank — exact semantics of
examples/analytical_apps/pagerank/pagerank.h:52-219:

- N = total vertices; p = 1/N.
- state stores rank/out_degree (plain rank for dangling vertices).
- per round: ``base = (1-d)/N + d*dangling_sum/N``;
  ``dangling_sum = base * total_dangling``; each vertex pulls the sum of
  its out-neighbors' stored state; new state =
  ``(d*sum + base)/deg`` (deg>0) else ``base``.
- after the final round, multiply by out-degree (pagerank.h:202-214).

Exchange = dense mirror sync of the state array (BatchShuffle,
batch_shuffle_message_manager.h:225-285).  The per-vertex sum uses
reduceat over the locally-complete, gid-sorted adjacency, so results
are bitwise independent of the partition count.
"""

from __future__ import annotations

import numpy as np

from .base import VertexProgram


class PageRank(VertexProgram):
    name = "pagerank"

    def __init__(self, frag, rounds: int = 10, damping: float = 0.85, **kw):
        super().__init__(frag, **kw)
        self.rounds = int(rounds)
        self.d = float(damping)

    def init(self) -> dict:
        f = self.frag
        self.n = int(f.starts[-1])
        p = 1.0 / self.n
        deg = f.out_degree
        self.result = np.where(deg > 0, p / np.maximum(deg, 1), p)
        self.full = np.empty(f.tvnum, dtype=np.float64)
        self.step = 0
        self.done = self.rounds <= 0
        return {"dangling": int((deg == 0).sum())}

    def set_globals(self, agg: dict):
        self.total_dangling = int(agg.get("dangling", 0))
        self.dangling_sum = (1.0 / self.n) * self.total_dangling

    def mirror_values(self, rnd: int):
        return None if self.done else self.result

    def update(self, rnd: int, outer_vals, msgs, pushes=()) -> int:
        if self.done:
            return 0
        f = self.frag
        self.full[: f.ivnum] = self.result
        if outer_vals is not None:
            self.full[f.ivnum:] = outer_vals
        base = (1.0 - self.d) / self.n + self.d * self.dangling_sum / self.n
        self.dangling_sum = base * self.total_dangling
        cur = f.segment_sum(self.full[f.indices])
        deg = f.out_degree
        self.result = np.where(deg > 0, (self.d * cur + base) / np.maximum(deg, 1), base)
        self.step += 1
        if self.step >= self.rounds:
            self.result = np.where(deg > 0, self.result * deg, self.result)
            self.done = True
            return 0
        return 1

    def output(self):
        return {"gid": self.frag.inner_gids(), "pagerank": self.result}

    def state_dict(self):
        return (
            {"result": self.result},
            {"step": self.step, "dangling_sum": self.dangling_sum,
             "done": bool(self.done), "total_dangling": self.total_dangling,
             "n": self.n},
        )

    def load_state(self, arrays, scalars):
        f = self.frag
        self.result = arrays["result"]
        self.full = np.empty(f.tvnum, dtype=np.float64)
        self.step = int(scalars["step"])
        self.dangling_sum = float(scalars["dangling_sum"])
        self.done = bool(scalars["done"])
        self.total_dangling = int(scalars["total_dangling"])
        self.n = int(scalars["n"])
