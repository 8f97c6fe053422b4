"""Superstep driver: the Ray-native analog of grape/worker/worker.h:87-133.

One long-lived actor per partition (``FragmentHost``) holds the CSR
fragment and the running program.  Each superstep:

1. ``produce(r)`` on every actor: exports dense mirror slices and/or
   sparse combined messages; each payload is ``ray.put`` inside the
   actor so only ObjectRefs travel through the driver (the routing
   table — never the data).  This is the hash-partitioned exchange: the
   destination partition of a message is derived from the gid by
   arithmetic, the payload is pre-combined at the source (combiner),
   and final aggregation happens at the destination — the
   groupby-aggregate shuffle of the north_star, carried by the object
   store instead of a Dataset op so the CSR state stays in place.
2. driver routes refs: sync slices to mirror holders, messages to
   destination owners.
3. ``consume(r)`` on every actor: assemble outer buffers, apply
   messages, compute (program.update), return the active count.
4. terminate when Σ active == 0 (default_message_manager.h:324-350) or
   the round cap is hit.

Checkpoint/resume (north_rule): every ``checkpoint_every`` rounds each
actor writes its program state to
``ckpt_dir/step={r}/part={p}.parquet`` (+ scalars json); the driver
writes ``MANIFEST.json`` last (atomicity marker) with lineage
(fingerprint, algorithm, params, per-round metrics).  ``resume=True``
restarts from the newest complete step.  Reference analog:
Serialize/Deserialize (immutable_edgecut_fragment.h:303-376), extended
to per-superstep granularity.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .build import GraphMeta
from .fragment import Fragment

__all__ = ["FragmentHost", "GraphEngine"]


class FragmentHost:
    """Actor body: fragment + program + exchange endpoints."""

    def __init__(self, part_id: int, work_dir: str, starts, has_weights: bool):
        self.frag = Fragment(part_id, work_dir, np.asarray(starts, np.int64), has_weights)
        self.program = None

    def edge_count(self) -> int:
        return int(self.frag.num_local_edges)

    def mirror_requests(self):
        return self.frag.mirror_requests()

    def register_requests(self, reqs):
        self.frag.register_requests(reqs)

    def init_program(self, name: str, params: dict) -> dict:
        from . import programs

        self.program = programs.PROGRAMS[name](self.frag, **params)
        return self.program.init()

    def set_globals(self, agg: dict):
        self.program.set_globals(agg)

    def produce(self, rnd: int):
        """Export this round's exchange as ONE object-store entry (a
        dict of per-destination arrays).  One ray.put per actor per
        round — P² tiny puts would dominate wall time at high P; the
        single bundle is fetched zero-copy by peers on the same node
        (the trade: on a multi-node cluster a peer fetches the whole
        bundle, like the reference's BatchShuffle all-to-all)."""
        import ray

        t0 = time.perf_counter()
        bundle = {"sync": {}, "msgs": {}}
        sent = 0
        mv = self.program.mirror_values(rnd)
        if mv is not None:
            for p, vals in self.frag.export_values(mv).items():
                bundle["sync"][p] = vals
                sent += len(vals)
        for p, payload in self.program.messages(rnd).items():
            bundle["msgs"][p] = payload
            sent += int(len(payload[0]))
        dests = sorted(set(bundle["sync"]) | set(bundle["msgs"]))
        ref = ray.put(bundle) if dests else None
        return {"ref": ref, "dests": dests, "sent": sent,
                "produce_s": time.perf_counter() - t0}

    def consume(self, rnd: int, incoming: list):
        """``incoming`` = [(producer_part, bundle_ref), ...]."""
        import ray

        t0 = time.perf_counter()
        f = self.frag
        outer_vals = None
        msgs = []
        for q, ref in incoming:
            bundle = ray.get(ref)
            vals = bundle["sync"].get(f.part)
            if vals is not None:
                if outer_vals is None:
                    outer_vals = np.zeros(f.ovnum, dtype=vals.dtype)
                a, b = f.mirror_bounds[q], f.mirror_bounds[q + 1]
                outer_vals[a:b] = vals
            payload = bundle["msgs"].get(f.part)
            if payload is not None:
                msgs.append(payload)
        active = self.program.update(rnd, outer_vals, msgs)
        return {"active": int(active), "consume_s": time.perf_counter() - t0}

    def output(self):
        return pa.table(self.program.output())

    # ---------------------------------------------------------- checkpoint
    def checkpoint(self, ckpt_dir: str, rnd: int):
        arrays, scalars = self.program.state_dict()
        step_dir = os.path.join(ckpt_dir, f"step={rnd}")
        os.makedirs(step_dir, exist_ok=True)
        lens = {k: len(v) for k, v in arrays.items()}
        maxlen = max(lens.values()) if lens else 0
        cols = {}
        for k, v in arrays.items():
            if len(v) < maxlen:
                pad = np.zeros(maxlen - len(v), dtype=v.dtype)
                v = np.concatenate([v, pad])
            cols[k] = v
        path = os.path.join(step_dir, f"part={self.frag.part}.parquet")
        tmp = path + ".tmp"
        pq.write_table(pa.table(cols) if cols else pa.table({"_empty": pa.array([], pa.int8())}), tmp)
        os.replace(tmp, path)
        side = {"scalars": scalars, "lens": lens}
        spath = os.path.join(step_dir, f"part={self.frag.part}.json")
        with open(spath + ".tmp", "w") as fjson:
            json.dump(side, fjson)
        os.replace(spath + ".tmp", spath)
        return True

    def restore(self, name: str, params: dict, ckpt_dir: str, rnd: int):
        from . import programs

        self.program = programs.PROGRAMS[name](self.frag, **params)
        step_dir = os.path.join(ckpt_dir, f"step={rnd}")
        with open(os.path.join(step_dir, f"part={self.frag.part}.json")) as fjson:
            side = json.load(fjson)
        t = pq.read_table(os.path.join(step_dir, f"part={self.frag.part}.parquet"))
        arrays = {}
        for k, n in side["lens"].items():
            # force a writable copy (Arrow->NumPy views are read-only)
            arrays[k] = np.array(t.column(k).to_numpy(zero_copy_only=False)[:n])
        self.program.load_state(arrays, side["scalars"])
        return True


class GraphEngine:
    """Owns the fragment actor pool for one built graph."""

    def __init__(self, meta: GraphMeta, num_cpus_per_actor: float = 0.5):
        # fractional default so the fragment pool can never reserve every
        # CPU and starve Dataset read/consume stages into a scheduling
        # deadlock (actors block dataset tasks which the driver waits on)
        import ray

        self.meta = meta
        P = meta.num_partitions
        Host = ray.remote(num_cpus=num_cpus_per_actor)(FragmentHost)
        self.actors = [
            Host.remote(p, meta.work_dir, meta.starts.tolist(), meta.has_weights)
            for p in range(P)
        ]
        # mirror registration (one-time; csr_edgecut_fragment_base.h dest lists)
        reqs = ray.get([a.mirror_requests.remote() for a in self.actors])
        to_owner: list[dict] = [{} for _ in range(P)]
        for p, req in enumerate(reqs):
            for q, gids in req.items():
                to_owner[q][p] = gids
        ray.get([self.actors[q].register_requests.remote(to_owner[q]) for q in range(P)])
        self.num_local_edges = sum(ray.get([a.edge_count.remote() for a in self.actors]))

    def run(
        self,
        program: str,
        params: dict | None = None,
        max_rounds: int = 10**9,
        ckpt_dir: str | None = None,
        checkpoint_every: int = 0,
        resume: bool = False,
    ):
        """Run a program to termination; returns (result Dataset of
        per-inner-vertex outputs in gid space, run metrics dict)."""
        import ray
        import ray.data as rd

        params = dict(params or {})
        P = self.meta.num_partitions
        metrics = {"rounds": 0, "program": program, "round_log": []}
        r0 = 1
        resumed_from = None
        if resume and ckpt_dir:
            step = self._latest_step(ckpt_dir, program)
            if step is not None:
                ray.get([a.restore.remote(program, params, ckpt_dir, step) for a in self.actors])
                r0 = step + 1
                resumed_from = step
        if resumed_from is None:
            partials = ray.get([a.init_program.remote(program, params) for a in self.actors])
            agg: dict = {}
            for d in partials:
                for k, v in d.items():
                    agg[k] = agg.get(k, 0) + v
            ray.get([a.set_globals.remote(agg) for a in self.actors])
        metrics["resumed_from"] = resumed_from

        t_start = time.perf_counter()
        r = r0 - 1
        for r in range(r0, max_rounds + 1):
            prod = ray.get([a.produce.remote(r) for a in self.actors])
            incoming: list[list] = [[] for _ in range(P)]
            sent = 0
            for q, out in enumerate(prod):
                sent += out["sent"]
                for p in out["dests"]:
                    incoming[p].append((q, out["ref"]))
            res = ray.get(
                [a.consume.remote(r, incoming[p]) for p, a in enumerate(self.actors)]
            )
            active = sum(x["active"] for x in res)
            metrics["round_log"].append({"round": r, "active": active, "sent": sent})
            metrics["rounds"] = r
            if ckpt_dir and checkpoint_every and (r % checkpoint_every == 0 or active == 0):
                ray.get([a.checkpoint.remote(ckpt_dir, r) for a in self.actors])
                self._write_manifest(ckpt_dir, program, params, r, metrics, converged=active == 0)
            if active == 0:
                break
        metrics["wall_s"] = time.perf_counter() - t_start
        metrics["supersteps_per_s"] = (
            (metrics["rounds"] - (r0 - 1)) / metrics["wall_s"] if metrics["wall_s"] > 0 else 0.0
        )
        refs = [a.output.remote() for a in self.actors]
        return rd.from_arrow_refs(refs), metrics

    # ---------------------------------------------------------- checkpoints
    def _manifest_path(self, ckpt_dir: str, rnd: int) -> str:
        return os.path.join(ckpt_dir, f"step={rnd}", "MANIFEST.json")

    def _write_manifest(self, ckpt_dir, program, params, rnd, metrics, converged):
        m = {
            "algorithm": program,
            "params": {k: v for k, v in params.items()},
            "round": rnd,
            "num_partitions": self.meta.num_partitions,
            "fingerprint": self.meta.fingerprint,
            "num_vertices": self.meta.num_vertices,
            "converged": bool(converged),
            "round_log": metrics["round_log"][-1:],
        }
        path = self._manifest_path(ckpt_dir, rnd)
        with open(path + ".tmp", "w") as f:
            json.dump(m, f)
        os.replace(path + ".tmp", path)

    def _latest_step(self, ckpt_dir: str, program: str):
        if not os.path.isdir(ckpt_dir):
            return None
        best = None
        for d in os.listdir(ckpt_dir):
            if not d.startswith("step="):
                continue
            mp = os.path.join(ckpt_dir, d, "MANIFEST.json")
            if not os.path.exists(mp):
                continue  # incomplete step (no manifest) — ignore
            with open(mp) as f:
                m = json.load(f)
            if m["algorithm"] != program or m["num_partitions"] != self.meta.num_partitions:
                continue
            if m["fingerprint"] != self.meta.fingerprint:
                continue
            step = int(m["round"])
            if best is None or step > best:
                best = step
        return best

    def shutdown(self):
        import ray

        for a in self.actors:
            ray.kill(a)
        self.actors = []
