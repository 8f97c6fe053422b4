"""WCC — min-vertex-id label propagation to fixpoint
(examples/analytical_apps/wcc/wcc.h:50-228).  Labels are gids; since
gids are assigned in oid-sorted order the converged label equals the
component's min oid (the reference's oid-label convention).  Run on a
graph built with ``symmetrize=True``.
"""

from __future__ import annotations

import numpy as np

from .base import MinPropagation


class WCC(MinPropagation):
    name = "wcc"

    def _init_vals(self) -> np.ndarray:
        return self.frag.all_gids().astype(np.int64)

    def output(self):
        return {"gid": self.frag.inner_gids(), "comp": self.vals[: self.frag.ivnum]}
