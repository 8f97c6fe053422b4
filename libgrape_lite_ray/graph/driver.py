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

__all__ = ["FragmentHost", "GraphEngine", "ResultHandle"]


class ResultHandle:
    """Distributed per-vertex result: one Arrow table ref per partition.

    Stays in the object store until consumed; ``to_dataset()`` wraps it
    as a Ray Dataset for distributed sinks (write_parquet etc.),
    ``to_arrow()``/``to_pandas()`` do one batched fetch (results are
    V-sized, far smaller than edges).  NOTE: refs are owned by the
    engine's actors — consume before ``engine.shutdown()``.
    """

    def __init__(self, refs):
        self.refs = list(refs)

    def to_arrow(self) -> pa.Table:
        import ray

        return pa.concat_tables(ray.get(self.refs))

    def to_pandas(self):
        return self.to_arrow().to_pandas()

    def to_dataset(self):
        import ray.data as rd

        return rd.from_arrow_refs(self.refs)

    def iter_batches(self, batch_format: str = "pyarrow", batch_size=None):
        import ray

        for t in ray.get(self.refs):
            yield t if batch_format == "pyarrow" else t.to_pandas()


class FragmentHost:
    """Actor body: one or more fragments + their programs + exchange
    endpoints.

    Hosting SEVERAL fragments per actor (``GraphEngine(num_hosts=H)``
    with H < P) keeps the LOGICAL partitioning fixed across parallelism
    levels — the cluster-size criterion compares the same sharded job —
    while shrinking the fixed per-round cost that dominates at low
    parallelism: one actor call + one ray.put per HOST per round
    instead of per partition (a bare 32-actor barrier costs ~20-35ms on
    this box), and co-hosted fragments consume each other's exchange
    in-process with no object-store hop.  This is the reference's
    process-per-node / threads-per-core shape (worker.h one worker per
    MPI rank hosting the whole local fragment set).
    """

    def __init__(self, host_id: int, part_ids, host_of, work_dir: str, starts,
                 has_weights: bool, sorted_spool: bool = False, vdata_cols=None):
        # per-actor, not at library import: the superstep loop's NumPy
        # temp churn is what needs resident-heap malloc (see memtune)
        from ..memtune import keep_heap_resident

        keep_heap_resident()
        self._bind(host_id, part_ids, host_of, work_dir, starts, has_weights,
                   sorted_spool, vdata_cols)

    def _bind(self, host_id, part_ids, host_of, work_dir, starts, has_weights,
              sorted_spool, vdata_cols):
        self.host_id = int(host_id)
        self.parts = [int(p) for p in part_ids]
        self.host_of = np.asarray(host_of, np.int64)
        st = np.asarray(starts, np.int64)
        self.frags = {p: Fragment(p, work_dir, st, has_weights, sorted_spool,
                                  vdata_cols) for p in self.parts}
        self.programs: dict[int, object] = {}
        self._own_payload: dict[int, dict] = {}
        # intra-host parallelism over co-hosted fragments (the
        # reference's threads-per-worker): NumPy kernels release the
        # GIL, so apply/pack for 4 fragments in one actor overlap well
        if len(self.parts) > 1 and getattr(self, "_pool", None) is None:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(max_workers=min(len(self.parts), 8))
        elif len(self.parts) <= 1:
            self._pool = None
        self._prewarm()

    def _prewarm(self):
        """Background-fault the heap the program kernels will use —
        sized for the hungriest (LCC wedge machinery ~24B/edge) plus a
        per-vertex base.  Overlaps registration/earlier programs; with
        keep_heap_resident the pages are then reused at DRAM speed
        instead of fault-stalling inside timed superstep barriers.

        The per-actor cap is memory-aware: keep_heap_resident never
        returns these pages, so with H co-scheduled hosts the fleet
        retains H x cap at its high-water mark forever.  Cap each actor
        at a fair share of ~35% of currently-available memory (and the
        absolute 2 GiB ceiling) so 32 hosts on a small box cannot
        ratchet the machine into OOM.  ``LGR_PREWARM_CAP_MB`` overrides
        (0 disables)."""
        from ..memtune import available_memory, prewarm_heap_async

        nbytes = sum(24 * f.num_local_edges + 16 * f.tvnum
                     for f in self.frags.values()) + (64 << 20)
        env = os.environ.get("LGR_PREWARM_CAP_MB")
        if env is not None:
            cap = int(env) << 20
        else:
            n_hosts = max(1, len(np.unique(self.host_of)))
            fair = int(available_memory() * 0.35) // n_hosts
            cap = min(2 << 30, fair)
        self._prewarm_t = prewarm_heap_async(nbytes, cap=cap)

    def join_prewarm(self) -> bool:
        """Block until the heap prewarm finished (harness hook: callers
        that time individual programs can absorb the one-time fault
        cost between stages instead of inside the first timed run)."""
        t = getattr(self, "_prewarm_t", None)
        if t is not None:
            t.join()
            self._prewarm_t = None
        return True

    def reload(self, host_id: int, part_ids, host_of, work_dir: str, starts,
               has_weights: bool, sorted_spool: bool = False, vdata_cols=None):
        """Rebind this actor to another built graph — reusing a warm
        actor pool skips process spawn + imports (~5s for 32 actors)."""
        self._bind(host_id, part_ids, host_of, work_dir, starts, has_weights,
                   sorted_spool, vdata_cols)
        return True

    # ---------------------------------------------------------- vdata sync
    def vdata_export(self, part: int):
        """One-time mirror vdata sync, producer side: per requester, a
        slice of every vdata column packed as one object (the dense
        BatchShuffle exchange applied to VDATA at load,
        basic_fragment_loader.h:300-338)."""
        import ray

        f = self.frags[part]
        if not f.vdata:
            return {"ref": None, "dests": []}
        dests = sorted(f.export_lids)
        if not dests:
            return {"ref": None, "dests": []}
        lens = [len(f.export_lids[q]) for q in dests]
        bundle = {
            "d": np.asarray(dests, np.int32),
            "o": np.concatenate([[0], np.cumsum(lens)]).astype(np.int64),
        }
        for c, arr in f.vdata.items():
            bundle[f"c:{c}"] = np.concatenate([arr[f.export_lids[q]] for q in dests])
        return {"ref": ray.put(bundle), "dests": dests}

    def vdata_fill(self, part: int, incoming: list):
        """Consumer side: place received per-owner vdata slices into the
        outer segment of every vdata_full column."""
        import ray

        f = self.frags[part]
        bundles = ray.get([ref for _, ref in incoming])
        for (q, _), b in zip(incoming, bundles):
            i = int(np.searchsorted(b["d"], f.part))
            if i < len(b["d"]) and b["d"][i] == f.part:
                lo, hi = b["o"][i], b["o"][i + 1]
                a0, b0 = f.mirror_bounds[q], f.mirror_bounds[q + 1]
                for c in f.vdata:
                    f.vdata_full[c][f.ivnum + a0: f.ivnum + b0] = b[f"c:{c}"][lo:hi]
        return True

    def edge_count(self) -> int:
        return int(sum(f.num_local_edges for f in self.frags.values()))

    def warmup_put(self):
        """First-touch the object-store arena with an export-sized
        buffer — the first real superstep otherwise pays the page-fault
        cost of mapping plasma memory (seconds at 32 actors)."""
        import ray

        n = max(8, sum(sum(len(v) for v in f.export_lids.values())
                       for f in self.frags.values()))
        # the Arrow table warms the per-actor Arrow serializer path the
        # result output() uses; the array warms the exchange path
        import pyarrow as _pa

        ray.put(_pa.table({"x": np.zeros(4)}))
        return ray.put(np.zeros(n))

    def warmup_get(self, refs):
        import ray

        return sum(int(a[0]) for a in ray.get(refs))

    def mirror_requests_packed(self, part: int):
        """Publish one partition's mirror lists as one packed object
        (dest ids + offsets + concatenated gids) — registration volume
        is O(total mirrors); routing it through driver args serialized
        it twice and stalled engine startup on mirror-heavy graphs."""
        import ray

        reqs = self.frags[part].mirror_requests()
        dests = sorted(reqs)
        if not dests:
            return {"ref": None, "dests": []}
        lens = [len(reqs[q]) for q in dests]
        bundle = {
            "d": np.asarray(dests, np.int32),
            "o": np.concatenate([[0], np.cumsum(lens)]).astype(np.int64),
            "g": np.concatenate([reqs[q] for q in dests]),
        }
        return {"ref": ray.put(bundle), "dests": dests}

    def register_from(self, part: int, incoming):
        """incoming = [(requester_part, packed_ref), ...].  Always a
        FULL re-registration: the engine passes every requester's list,
        so stale export entries (a requester whose mirror set shrank
        after a mutation) are dropped."""
        import ray

        f = self.frags[part]
        bundles = ray.get([ref for _, ref in incoming])
        reqs = {}
        for (q, _), b in zip(incoming, bundles):
            i = int(np.searchsorted(b["d"], f.part))
            if i < len(b["d"]) and b["d"][i] == f.part:
                reqs[q] = b["g"][b["o"][i]: b["o"][i + 1]]
        f.export_lids.clear()
        f.register_requests(reqs)
        return True

    def _program_cls(self, name):
        """Registry lookup by name, or a VertexProgram CLASS shipped
        directly (cloudpickled by Ray) — the user-extension surface for
        programs not in the PROGRAMS registry (SURVEY §2.10)."""
        if isinstance(name, str):
            from . import programs

            return programs.PROGRAMS[name]
        return name

    def init_program(self, name, params: dict) -> dict:
        self._own_payload.clear()
        cls = self._program_cls(name)
        agg: dict = {}
        for p in self.parts:
            prog = cls(self.frags[p], **params)
            self.programs[p] = prog
            for k, v in prog.init().items():
                agg[k] = agg.get(k, 0) + v
        return agg

    def set_globals(self, agg: dict):
        for prog in self.programs.values():
            prog.set_globals(agg)

    def _pack_one(self, part: int, rnd: int):
        """One fragment's outgoing exchange as a dict of a few FLAT
        arrays (destination ids + offsets + one concatenated buffer per
        payload column) — consumers deserialize O(1) numpy arrays
        (zero-copy from plasma) instead of O(P) small objects."""
        f = self.frags[part]
        program = self.programs[part]
        sent = 0
        sd: list[int] = []
        sync_parts: list[np.ndarray] = []
        mv = program.mirror_values(rnd)
        if mv is not None:
            for p, vals in sorted(f.export_values(mv).items()):
                sd.append(p)
                sync_parts.append(vals)
                sent += len(vals)
        # dense mirror-push (mirror holder -> owner): the outer segment
        # is contiguous per owner (mirror_bounds), so the per-owner
        # payload is a zero-copy slice with NO gid column
        pd: list[int] = []
        push_parts: list[np.ndarray] = []
        pv = program.mirror_push(rnd)
        if pv is not None:
            for q in range(f.num_parts):
                a, b = f.mirror_bounds[q], f.mirror_bounds[q + 1]
                if b > a:
                    pd.append(q)
                    push_parts.append(pv[a:b])
                    sent += int(b - a)
        md: list[int] = []
        msg_cols: list[list[np.ndarray]] = []
        for p, payload in sorted(program.messages(rnd).items()):
            md.append(p)
            msg_cols.append([np.asarray(c) for c in payload])
            sent += int(len(payload[0]))
        dests = sorted(set(sd) | set(pd) | set(md))
        if not dests:
            return None, [], 0
        bundle = {
            "sd": np.asarray(sd, np.int32),
            "so": np.concatenate([[0], np.cumsum([len(v) for v in sync_parts])]).astype(np.int64),
            "sv": np.concatenate(sync_parts) if sync_parts else np.empty(0),
            "pd": np.asarray(pd, np.int32),
            "po": np.concatenate([[0], np.cumsum([len(v) for v in push_parts])]).astype(np.int64),
            "pv": np.concatenate(push_parts) if push_parts else np.empty(0),
            "md": np.asarray(md, np.int32),
            "mo": np.concatenate([[0], np.cumsum([len(c[0]) for c in msg_cols])]).astype(np.int64),
            "mc": [np.concatenate([msg_cols[i][j] for i in range(len(msg_cols))])
                   for j in range(len(msg_cols[0]))] if msg_cols else [],
        }
        return bundle, dests, sent

    def _produce_payload(self, rnd: int):
        """Pack ALL hosted fragments' round-`rnd` exchanges into ONE
        payload: one ray.put per host per round, and only when some
        destination lives on another host — co-hosted consumption reads
        the local dict directly (no object-store hop)."""
        import ray

        t0 = time.perf_counter()
        parts, bundles, dest_parts = [], [], set()
        sent = 0
        if self._pool is not None:
            packed = list(self._pool.map(lambda p: self._pack_one(p, rnd), self.parts))
        else:
            packed = [self._pack_one(p, rnd) for p in self.parts]
        for p, (bundle, dests, s) in zip(self.parts, packed):
            if bundle is not None:
                parts.append(p)
                bundles.append(bundle)
                dest_parts.update(dests)
                sent += s
        payload = {"parts": parts, "bundles": bundles}
        self._own_payload[rnd] = payload
        remote = any(self.host_of[d] != self.host_id for d in dest_parts)
        ref = ray.put(payload) if remote else None
        return ref, sorted(dest_parts), sent, time.perf_counter() - t0

    def _apply_one(self, part: int, rnd: int, pairs) -> int:
        f = self.frags[part]
        outer_vals = None
        msgs = []
        pushes = []
        for q, bundle in pairs:
            i = int(np.searchsorted(bundle["sd"], f.part))
            if i < len(bundle["sd"]) and bundle["sd"][i] == f.part:
                vals = bundle["sv"][bundle["so"][i]: bundle["so"][i + 1]]
                if outer_vals is None:
                    outer_vals = np.zeros(f.ovnum, dtype=vals.dtype)
                a, b = f.mirror_bounds[q], f.mirror_bounds[q + 1]
                outer_vals[a:b] = vals
            pdk = bundle.get("pd")
            if pdk is not None and len(pdk):
                p_i = int(np.searchsorted(pdk, f.part))
                if p_i < len(pdk) and pdk[p_i] == f.part:
                    lo, hi = bundle["po"][p_i], bundle["po"][p_i + 1]
                    pushes.append((q, bundle["pv"][lo:hi]))
            j = int(np.searchsorted(bundle["md"], f.part))
            if j < len(bundle["md"]) and bundle["md"][j] == f.part:
                lo, hi = bundle["mo"][j], bundle["mo"][j + 1]
                msgs.append(tuple(c[lo:hi] for c in bundle["mc"]))
        return self.programs[part].update(rnd, outer_vals, msgs, pushes)

    def _gather_pairs(self, rnd: int, incoming: list):
        """incoming = remote host payload refs; plus this host's own
        round-`rnd` payload (kept local, never ray.put when all dests
        are co-hosted)."""
        import ray

        payloads = list(ray.get(incoming)) if incoming else []
        own = self._own_payload.pop(rnd, None)
        if own is not None:
            payloads.append(own)
        return [(q, b) for pl in payloads
                for q, b in zip(pl["parts"], pl["bundles"])]

    def produce(self, rnd: int):
        ref, dests, sent, dt = self._produce_payload(rnd)
        return {"ref": ref, "dests": dests, "sent": sent, "produce_s": dt}

    def _apply_all(self, rnd: int, pairs) -> int:
        if self._pool is not None:
            futs = [self._pool.submit(self._apply_one, p, rnd, pairs)
                    for p in self.parts]
            return sum(f.result() for f in futs)
        return sum(self._apply_one(p, rnd, pairs) for p in self.parts)

    def consume(self, rnd: int, incoming: list):
        t0 = time.perf_counter()
        pairs = self._gather_pairs(rnd, incoming)
        active = self._apply_all(rnd, pairs)
        return {"active": int(active), "consume_s": time.perf_counter() - t0}

    def step(self, rnd: int, incoming: list, ckpt_dir: str | None = None,
             muts_in: dict | None = None, globals_in: dict | None = None):
        """Fused superstep: consume round `rnd`, then produce round
        `rnd`+1 — one RPC barrier per round instead of two (the
        reference overlaps the same way: FinishARound posts sends while
        the next StartARound ingests, worker.h:87-133).

        ``muts_in`` (per-superstep mutation, worker.h:176-187): edge
        ops queued in round ``rnd``-1 and routed by the driver.  They
        apply AFTER this round's exchange is consumed (so every
        in-flight payload was produced and consumed on the same
        topology); the step then skips produce — the driver re-registers
        mirrors across the fleet before asking for round ``rnd``+1.

        ``globals_in`` (per-round Communicator scalars,
        grape/communication/communicator.h Sum/Max over rounds): the
        value-summed aggregate of every program's ``take_globals()``
        partials from round ``rnd``-1, delivered via ``set_globals``
        BEFORE this round's update — a one-round-delayed global
        reduction (HITS normalizes with it; PageRank's dangling sum
        uses the init-time variant of the same channel).
        """
        t0 = time.perf_counter()
        if globals_in:
            for prog in self.programs.values():
                prog.set_globals(globals_in)
        pairs = self._gather_pairs(rnd, incoming)
        active = self._apply_all(rnd, pairs)
        t1 = time.perf_counter()
        if muts_in is not None:
            active += self.apply_mutations(muts_in)
            # harvest ops queued THIS round too (by update above or by
            # on_mutation hooks) — otherwise a mutation-apply round
            # defers them an extra round and max_rounds can drop them
            return {"active": int(active), "ref": None, "dests": [],
                    "sent": 0, "mut_applied": True,
                    "muts": self._harvest_mutations(),
                    "globals": self._harvest_globals(),
                    "step_s": time.perf_counter() - t0,
                    "apply_s": t1 - t0, "pack_s": 0.0}
        if ckpt_dir:
            self.checkpoint(ckpt_dir, rnd)
        glob_out = self._harvest_globals()
        ref, dests, sent, pack_s = self._produce_payload(rnd + 1)
        muts_out = self._harvest_mutations()
        return {"active": int(active), "ref": ref, "dests": dests,
                "sent": sent, "muts": muts_out, "globals": glob_out,
                "step_s": time.perf_counter() - t0,
                "apply_s": t1 - t0, "pack_s": pack_s}

    def _harvest_globals(self):
        """Drain per-round global-scalar partials the hosted programs
        queued during update (Communicator Sum analog) — value-summed
        here per host, then across hosts by the driver, delivered back
        next round via ``set_globals``.  Returns a dict or None."""
        g: dict = {}
        for prog in self.programs.values():
            tg = prog.take_globals() if hasattr(prog, "take_globals") else None
            if tg:
                for k, v in tg.items():
                    g[k] = g.get(k, 0.0) + float(v)
        return g or None

    def _harvest_mutations(self):
        """Collect edge ops the hosted programs queued during this
        round's update (MutationContext add_edge/remove_edge analog,
        grape/app/mutation_context.h:79-133).  Returns one packed dict
        of gid-space arrays or None."""
        packs = []
        for prog in self.programs.values():
            m = prog.take_mutations() if hasattr(prog, "take_mutations") else None
            if m is not None:
                packs.append(m)
        if not packs:
            return None
        return {k: np.concatenate([p[k] for p in packs])
                for k in ("op", "src", "dst", "w")}

    def apply_mutations(self, muts: dict) -> int:
        """Apply routed edge ops to the local fragments (CSR rebuild
        in-actor) and remap each program's state onto the new layout.
        Returns extra active count from the programs' ``on_mutation``
        hooks (a converged program re-arms itself when new edges can
        change its fixpoint)."""
        part = np.asarray(muts["part"], np.int64)
        extra = 0
        for p in self.parts:
            m = part == p
            if not m.any():
                continue
            f = self.frags[p]
            old_outer = np.asarray(f.outer_gids, np.int64).copy()
            f.apply_edge_mutations(
                np.asarray(muts["op"], np.int8)[m],
                np.asarray(muts["src"], np.int64)[m],
                np.asarray(muts["dst"], np.int64)[m],
                np.asarray(muts["w"], np.float64)[m],
            )
            prog = self.programs.get(p)
            if prog is not None:
                extra += int(prog.on_mutation(old_outer))
        return extra

    def output_part(self, part: int):
        return pa.table(self.programs[part].output())

    # ---------------------------------------------------------- checkpoint
    def checkpoint(self, ckpt_dir: str, rnd: int):
        for p in self.parts:
            self._checkpoint_one(p, ckpt_dir, rnd)
        return True

    def _checkpoint_one(self, part: int, ckpt_dir: str, rnd: int):
        arrays, scalars = self.programs[part].state_dict()
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
        path = os.path.join(step_dir, f"part={part}.parquet")
        tmp = path + ".tmp"
        pq.write_table(pa.table(cols) if cols else pa.table({"_empty": pa.array([], pa.int8())}), tmp)
        os.replace(tmp, path)
        side = {"scalars": scalars, "lens": lens}
        spath = os.path.join(step_dir, f"part={part}.json")
        with open(spath + ".tmp", "w") as fjson:
            json.dump(side, fjson)
        os.replace(spath + ".tmp", spath)
        return True

    def restore(self, name, params: dict, ckpt_dir: str, rnd: int):
        self._own_payload.clear()
        cls = self._program_cls(name)
        step_dir = os.path.join(ckpt_dir, f"step={rnd}")
        for p in self.parts:
            prog = cls(self.frags[p], **params)
            self.programs[p] = prog
            with open(os.path.join(step_dir, f"part={p}.json")) as fjson:
                side = json.load(fjson)
            t = pq.read_table(os.path.join(step_dir, f"part={p}.parquet"))
            arrays = {}
            for k, n in side["lens"].items():
                # force a writable copy (Arrow->NumPy views are read-only)
                arrays[k] = np.array(t.column(k).to_numpy(zero_copy_only=False)[:n])
            prog.load_state(arrays, side["scalars"])
        return True


class GraphEngine:
    """Owns the fragment actor pool for one built graph.

    ``num_hosts`` (default: one host per partition) groups the P
    logical fragments onto H actor processes — same sharded job at
    every parallelism level, but per-round fixed costs (actor calls,
    ray.puts, barrier size) scale with H, not P.  Size H to the
    parallelism actually available (bench: min(P, num_cpus))."""

    def __init__(self, meta: GraphMeta, num_cpus_per_actor: float = 0.5,
                 reuse_engine: "GraphEngine | None" = None,
                 num_hosts: int | None = None):
        # fractional default so the fragment pool can never reserve every
        # CPU and starve Dataset read/consume stages into a scheduling
        # deadlock (actors block dataset tasks which the driver waits on)
        import ray

        self.meta = meta
        P = meta.num_partitions
        H = max(1, min(int(num_hosts) if num_hosts else P, P))
        self.num_hosts = H
        groups = [list(map(int, g)) for g in np.array_split(np.arange(P), H)]
        self.groups = groups
        host_of = np.empty(P, np.int64)
        for h, g in enumerate(groups):
            host_of[g] = h
        self.host_of = host_of
        vdata_cols = meta.extra.get("vdata_cols")
        spool_sorted = bool(meta.extra.get("spool_sorted"))
        if (reuse_engine is not None and len(reuse_engine.actors) == H
                and reuse_engine.groups == groups):
            # adopt the warm pool (ownership transfers; the donor engine
            # must not be used afterwards)
            self.actors = reuse_engine.actors
            reuse_engine.actors = []
            ray.get([
                a.reload.remote(h, groups[h], host_of, meta.work_dir,
                                meta.starts.tolist(), meta.has_weights,
                                spool_sorted, vdata_cols)
                for h, a in enumerate(self.actors)
            ])
        else:
            if reuse_engine is not None:
                reuse_engine.shutdown()
            Host = ray.remote(num_cpus=num_cpus_per_actor)(FragmentHost)
            self.actors = [
                Host.remote(h, groups[h], host_of, meta.work_dir,
                            meta.starts.tolist(), meta.has_weights,
                            spool_sorted, vdata_cols)
                for h in range(H)
            ]
        self._vdata_cols = vdata_cols
        # mirror registration (one-time; csr_edgecut_fragment_base.h dest
        # lists) — packed refs through the object store, driver only routes
        self._register_mirrors()
        self.num_local_edges = sum(ray.get([a.edge_count.remote() for a in self.actors]))
        if vdata_cols:
            self._sync_vdata()
        # prime plasma client connections between every actor pair once
        # (the first cross-actor object exchange otherwise costs seconds
        # on the first algorithm round)
        refs = ray.get([a.warmup_put.remote() for a in self.actors])
        ray.get([a.warmup_get.remote(refs) for a in self.actors])

    def _host(self, part: int):
        return self.actors[self.host_of[part]]

    def _register_mirrors(self):
        """(Re-)run the mirror-registration exchange for every
        partition.  Called once at engine start, and again after any
        per-superstep mutation round (mutated fragments may request a
        different mirror set; owners' export lists are rebuilt)."""
        import ray

        P = self.meta.num_partitions
        packed = ray.get([self._host(p).mirror_requests_packed.remote(p)
                          for p in range(P)])
        to_owner: list[list] = [[] for _ in range(P)]
        for p, pk in enumerate(packed):
            for q in pk["dests"]:
                to_owner[q].append((p, pk["ref"]))
        ray.get([self._host(q).register_from.remote(q, to_owner[q])
                 for q in range(P)])

    def _sync_vdata(self):
        """One-time (and post-mutation) mirror vdata sync: uses the
        just-registered export_lids; refs routed by the driver, data
        stays in plasma."""
        import ray

        P = self.meta.num_partitions
        vx = ray.get([self._host(p).vdata_export.remote(p) for p in range(P)])
        v_owner: list[list] = [[] for _ in range(P)]
        for p, pk in enumerate(vx):
            for q in pk["dests"]:
                v_owner[q].append((p, pk["ref"]))
        ray.get([self._host(q).vdata_fill.remote(q, v_owner[q])
                 for q in range(P)])

    def wait_prewarm(self):
        """Block until every fragment actor's background heap prewarm
        finished (see FragmentHost._prewarm) — lets a benchmark absorb
        the one-time page-fault cost outside its timed windows."""
        import ray

        ray.get([a.join_prewarm.remote() for a in self.actors])

    def _route_mutations(self, packs: list, H: int):
        """Pack queued gid-space edge ops into one routed dict per host
        (owner of src = part_of(src)); symmetrized graphs apply each op
        in both directions, like mutate.py.  Returns a list of dicts
        (or None) indexed by host."""
        from ..ids import part_of

        cat = {k: np.concatenate([np.asarray(p[k]) for p in packs])
               for k in ("op", "src", "dst", "w")}
        op = cat["op"].astype(np.int8)
        src = cat["src"].astype(np.int64)
        dst = cat["dst"].astype(np.int64)
        w = cat["w"].astype(np.float64)
        V = int(self.meta.num_vertices)
        if len(src) and (min(src.min(), dst.min()) < 0
                         or max(src.max(), dst.max()) >= V):
            raise ValueError("mutation gid outside vertex universe")
        if not self.meta.directed:
            src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
            op = np.concatenate([op, op])
            w = np.concatenate([w, w])
        part = part_of(src, self.meta.starts)
        host = self.host_of[part]
        out: list[dict | None] = []
        for h in range(H):
            m = host == h
            out.append({"part": part[m], "op": op[m], "src": src[m],
                        "dst": dst[m], "w": w[m]} if m.any() else None)
        return out

    def run(
        self,
        program: str,
        params: dict | None = None,
        max_rounds: int = 10**9,
        ckpt_dir: str | None = None,
        checkpoint_every: int = 0,
        resume: bool = False,
        mutation_schedule: dict | None = None,
    ):
        """Run a program to termination; returns (result Dataset of
        per-inner-vertex outputs in gid space, run metrics dict).

        ``mutation_schedule``: {round: ops} of driver-injected edge
        mutations — ops is a dict of gid-space arrays ``op`` (0=add/
        upsert, 1=delete), ``src``, ``dst``, ``w``.  Ops scheduled for
        round r behave exactly like ops a program queued during round
        r's update: they apply at the r+1 barrier, after round r+1's
        exchange is consumed (worker.h:176-187 processMutation timing).
        Mutations are in-memory for this engine's lifetime; checkpoint
        durability of the mutated topology is mutate_graph's job, so
        checkpointing is skipped on the round a mutation applies.
        """
        import ray

        params = dict(params or {})
        P = self.meta.num_partitions
        H = self.num_hosts
        metrics = {"rounds": 0, "round_log": [],
                   "program": program if isinstance(program, str)
                   else getattr(program, "name", program.__name__)}
        r0 = 1
        resumed_from = None
        glob_next: dict | None = None  # round-r-1 Communicator aggregate
        if resume and ckpt_dir:
            step = self._latest_step(ckpt_dir, metrics["program"])
            if step is not None:
                ray.get([a.restore.remote(program, params, ckpt_dir, step) for a in self.actors])
                r0 = step + 1
                resumed_from = step
                # re-seed the in-flight global aggregate the killed run
                # had summed after round `step`'s barrier (manifest is
                # written post-barrier, so it carries exactly what the
                # uninterrupted run would deliver to round step+1)
                with open(self._manifest_path(ckpt_dir, step)) as f:
                    glob_next = json.load(f).get("globals_in_next") or None
        if resumed_from is None:
            partials = ray.get([a.init_program.remote(program, params) for a in self.actors])
            agg: dict = {}
            for d in partials:
                for k, v in d.items():
                    agg[k] = agg.get(k, 0) + v
            ray.get([a.set_globals.remote(agg) for a in self.actors])
        metrics["resumed_from"] = resumed_from

        def _free_bundles(outs):
            """Eagerly release consumed exchange bundles from plasma.

            The per-round ray.puts otherwise outlive their single
            consumption by one-to-many rounds (distributed ref GC is
            async), so the store keeps allocating FRESH pages — and on
            hosts with virtio free-page reporting a fresh plasma page
            faults at ~25 MB/s (see memtune).  Freeing right after the
            consuming barrier lets the store's allocator hand the same
            warm pages to the next round: measured 10x on the exchange
            round (70ms vs 600ms for a 435MB/round all-to-all at P=32).
            Safe because every consumer finished inside the barrier and
            no program retains views into incoming bundles past
            update() (audited; LCC copies via translate/asarray-cast).
            """
            if os.environ.get("LGR_NO_EAGER_FREE"):
                return
            refs = [o["ref"] for o in outs if o.get("ref") is not None]
            if not refs:
                return
            try:
                from ray._private.internal_api import free as _plasma_free

                _plasma_free(refs, local_only=True)
            except Exception:
                pass  # best-effort: normal ref GC still applies

        def _route(prod):
            """host-level routing: host h2 receives h1's payload ref iff
            some destination partition of h1 lives on h2 (co-hosted
            destinations consume the local payload, no ref)."""
            incoming: list[list] = [[] for _ in range(H)]
            sent = 0
            for h, out in enumerate(prod):
                sent += out["sent"]
                if out["ref"] is None:
                    continue
                for h2 in sorted({int(self.host_of[p]) for p in out["dests"]} - {h}):
                    incoming[h2].append(out["ref"])
            return incoming, sent

        t_start = time.perf_counter()
        # fused-step loop: produce(r0) once, then one RPC barrier per
        # round (consume r + produce r+1 in the same actor call)
        prod = ray.get([a.produce.remote(r0) for a in self.actors])
        r = r0 - 1
        last_ckpt = None
        schedule = {int(k): v for k, v in (mutation_schedule or {}).items()}
        staged: list | None = None  # routed muts, applied at round r
        mutated = False  # once true, checkpoints stop: the mutated
        # topology lives only in-actor, so a restored run could not
        # rebuild fragments matching the saved state (use mutate_graph
        # for durable topology changes)
        for r in range(r0, max_rounds + 1):
            incoming, sent = _route(prod)
            do_ckpt = bool(ckpt_dir and checkpoint_every and r % checkpoint_every == 0
                           and staged is None and not mutated)
            res = ray.get(
                [a.step.remote(r, incoming[h], ckpt_dir if do_ckpt else None,
                               staged[h] if staged is not None else None,
                               glob_next)
                 for h, a in enumerate(self.actors)]
            )
            gl: dict = {}
            for x in res:
                for k, v in (x.get("globals") or {}).items():
                    gl[k] = gl.get(k, 0.0) + v
            glob_next = gl or None
            _free_bundles(prod)  # round-r bundles: consumed by the barrier above
            mut_applied = staged is not None
            mutated = mutated or mut_applied
            staged = None
            if mut_applied:
                # topology changed: rebuild the fleet's mirror wiring,
                # then produce round r+1 fresh on the new layout
                self._register_mirrors()
                if self._vdata_cols:
                    self._sync_vdata()
                prod2 = ray.get([a.produce.remote(r + 1) for a in self.actors])
                for x, y in zip(res, prod2):
                    x["ref"], x["dests"], x["sent"] = y["ref"], y["dests"], y["sent"]
            # harvest program-queued ops + driver-injected schedule for
            # this round; both apply at the r+1 barrier
            packs = [x["muts"] for x in res if x.get("muts") is not None]
            if r in schedule:
                packs.append(schedule.pop(r))
            if packs:
                staged = self._route_mutations(packs, H)
            active = sum(x["active"] for x in res)
            if staged is not None:
                active = max(active, 1)  # keep the loop alive to apply
            step_ts = [x["step_s"] for x in res]
            metrics["round_log"].append({
                "round": r, "active": int(active), "sent": int(sent),
                "step_max_s": round(max(step_ts), 4),
                "step_med_s": round(sorted(step_ts)[len(step_ts) // 2], 4),
                "apply_max_s": round(max(x["apply_s"] for x in res), 4),
                "pack_max_s": round(max(x["pack_s"] for x in res), 4),
            })
            metrics["rounds"] = r
            if do_ckpt:
                self._write_manifest(ckpt_dir, metrics["program"], params, r, metrics,
                                     converged=active == 0, globals_in_next=glob_next)
                last_ckpt = r
            if active == 0:
                if ckpt_dir and checkpoint_every and last_ckpt != r and not mutated:
                    ray.get([a.checkpoint.remote(ckpt_dir, r) for a in self.actors])
                    self._write_manifest(ckpt_dir, metrics["program"], params, r, metrics,
                                         converged=True, globals_in_next=glob_next)
                _free_bundles(res)  # round r+1 exchange: never consumed
                break
            prod = res  # each step returned the round r+1 exchange
        else:
            _free_bundles(prod)  # max_rounds hit: last exchange unconsumed
        if staged is not None or schedule:
            import warnings

            pending = sorted(schedule.keys())
            warnings.warn(
                "run() exited with unapplied mutations: "
                + ("routed ops staged for the next round; " if staged is not None else "")
                + (f"mutation_schedule entries for rounds {pending} never reached; "
                   if pending else "")
                + "raise max_rounds or schedule earlier rounds",
                RuntimeWarning, stacklevel=2,
            )
        metrics["wall_s"] = time.perf_counter() - t_start
        metrics["supersteps_per_s"] = (
            (metrics["rounds"] - (r0 - 1)) / metrics["wall_s"] if metrics["wall_s"] > 0 else 0.0
        )
        out_refs = [self._host(p).output_part.remote(p) for p in range(P)]
        return ResultHandle(out_refs), metrics

    # ---------------------------------------------------------- checkpoints
    def _manifest_path(self, ckpt_dir: str, rnd: int) -> str:
        return os.path.join(ckpt_dir, f"step={rnd}", "MANIFEST.json")

    def _write_manifest(self, ckpt_dir, program, params, rnd, metrics, converged,
                        globals_in_next: dict | None = None):
        m = {
            "algorithm": program,
            "params": {k: v for k, v in params.items()},
            "round": rnd,
            "num_partitions": self.meta.num_partitions,
            "fingerprint": self.meta.fingerprint,
            "num_vertices": self.meta.num_vertices,
            "converged": bool(converged),
            "round_log": metrics["round_log"][-1:],
            # in-flight Communicator aggregate (summed post-barrier):
            # resume feeds it to round rnd+1 exactly like the live run
            "globals_in_next": globals_in_next,
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
