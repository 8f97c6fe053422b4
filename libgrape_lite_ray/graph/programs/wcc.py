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
        # labels are gids: int32 when they fit — the dense sweeps are
        # memory-bandwidth bound, so 4-byte labels halve the traffic
        dt = np.int32 if int(self.frag.starts[-1]) < 2**31 - 2 else np.int64
        return self.frag.all_gids().astype(dt)

    def output(self):
        return {"gid": self.frag.inner_gids(),
                "comp": self.vals[: self.frag.ivnum].astype(np.int64)}
