"""Scheduled serving engine: the native C++ continuous-batching scheduler
(native/scheduler.cc) plans each tick — which request prefills which chunk,
who decodes — and this engine executes the plan with the compiled TPU steps
from serving/engine.py.

Unlike ContinuousBatchEngine (which prefills a whole admission before
decoding), prefill here is chunked and interleaved with decode ticks, so a
long prompt cannot stall in-flight generations for more than one chunk.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, canonical_policy
from ..cache import init_cache
from ..native.scheduler import DECODE, PREFILL_CHUNK, NativeScheduler
from ..policies import PHASE_DECODE, PolicySpec
from ..sampling import sample_topp
from .engine import Request, _clear_row, _decode_step, _merged_step


class ScheduledBatchEngine:
    """Single-process by default. With `mesh` (+ `mesh_config`) the batch
    slots shard over the `data` mesh axis — including across PROCESSES: every
    process runs the same deterministic scheduler + host logic (SPMD driver
    model: submit() must be called identically everywhere, like any
    jax.distributed program), the compiled steps run as one global SPMD
    computation, and sampled tokens are fetched through a replicating
    all-gather so every host advances the same state."""

    def __init__(
        self,
        model,
        batch_slots: int = 4,
        max_prompt: int = 512,
        budget: int = 200,
        kv_policy: str = "roco",
        temperature: float = 1.0,
        top_p: float = 1.0,
        eos_token_ids: Tuple[int, ...] = (),
        prefill_chunk: int = 128,
        seed: int = 0,
        mesh=None,
        mesh_config=None,
    ):
        self.model = model
        from ..ops.quant import materialize_params_resident

        self.model.params = materialize_params_resident(model.params)
        self.cfg: ModelConfig = model.cfg
        self.B = batch_slots
        self.max_prompt = max_prompt
        self.budget = budget
        self.pc = min(prefill_chunk, max_prompt)
        self.eos = tuple(eos_token_ids)
        self.temperature = temperature
        self.top_p = top_p
        policy = canonical_policy(kv_policy)
        rw = int(budget * 0.3)
        self.spec = None if policy == "full" else PolicySpec(
            policy, PHASE_DECODE, 1, 4, rw,
            feasible_k=max(budget - rw, 1), protect_prompt=True,
        )
        S = ((max_prompt + budget + 1 + 127) // 128) * 128  # lane-aligned
        self.cache = init_cache(
            self.cfg.num_hidden_layers, self.B, self.cfg.num_key_value_heads,
            S, self.cfg.head_dim, jnp.dtype(model.dtype),
            quantized=getattr(model, "kv_quant", False),
        )
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..config import MeshConfig
            from ..parallel.sharding import shard_cache, shard_params

            mc = mesh_config or MeshConfig(
                data=mesh.shape.get("data", 1), model=mesh.shape.get("model", 1)
            )
            assert self.B % mc.data == 0, "batch_slots must divide over data"
            self._mc = mc
            self.cache = shard_cache(self.cache, mc, mesh)
            self.model.params = shard_params(model.params, self.cfg, mc, mesh)
            self._ns_data = NamedSharding(mesh, P(mc.axis_data))
            self._ns_rep = NamedSharding(mesh, P())
            # replicate-on-fetch: out_shardings P() inserts the all-gather so
            # np.asarray works on every process
            self._rep = jax.jit(lambda x: x, out_shardings=self._ns_rep)
            self._rows = jax.jit(
                lambda lg, idx: jnp.take_along_axis(
                    lg, idx[:, None, None], axis=1
                )[:, 0],
                out_shardings=self._ns_rep,
            )
        self.rng = jax.random.PRNGKey(seed)
        # chunk_cap = pc: each request prefills at most one compiled-width
        # chunk per tick, but up to B requests may do so in the SAME tick —
        # they ride one merged dispatch (all rows cost the same pc-wide
        # forward anyway)
        self.sched = NativeScheduler(batch_slots, batch_slots * self.pc,
                                     chunk_cap=self.pc)
        self.requests: Dict[int, Request] = {}
        self.ids_pad: Dict[int, np.ndarray] = {}
        self.prompt_len = np.zeros(self.B, np.int32)
        self.gen_count = np.zeros(self.B, np.int32)
        self.next_token = np.full(self.B, -1, np.int32)
        self.has_token = np.zeros(self.B, bool)
        self.finished: Dict[int, Request] = {}

    def submit(self, req: Request) -> None:
        assert len(req.ids) <= self.max_prompt
        self.requests[req.request_id] = req
        ids = np.asarray(req.ids, np.int32)
        n_chunks = (len(ids) + self.pc - 1) // self.pc
        # one extra pc of padding: scheduler windows may start mid-chunk
        # (budget remainder spill), so any start in [0, T) must slice a full
        # pc-wide window
        pad = np.zeros((max(n_chunks, 1) + 1) * self.pc, np.int32)
        pad[: len(ids)] = ids
        self.ids_pad[req.request_id] = pad
        self.sched.submit(req.request_id, len(ids), req.max_new_tokens)

    def _dev(self, arr: np.ndarray):
        """Host (B, ...) array -> device, sharded over `data` under a mesh.
        Every process passes the identical full array; each places only its
        addressable shards."""
        if self.mesh is None:
            return jnp.asarray(arr)
        return jax.make_array_from_callback(
            arr.shape, self._ns_data, lambda idx: arr[idx]
        )

    def _key(self):
        self.rng, sub = jax.random.split(self.rng)
        # plain host array: valid input to both local jits and the global
        # SPMD step (identical on every process => replicated)
        return np.asarray(sub)

    def tick(self) -> List[Tuple[int, int]]:
        """Execute one scheduler tick in ONE device dispatch.

        Ticks with any prefill run the merged (B, pc) step — every row is a
        prefill window, a decode token (last column), or inactive. Pure
        decode ticks run the cheap (B, 1) decode step (late-write fast
        path). Either way: one compiled call per tick."""
        plan = self.sched.plan()
        emitted: List[Tuple[int, int]] = []
        prefills = [a for a in plan if a.kind == PREFILL_CHUNK]
        decode_live = [
            a for a in plan
            if a.kind == DECODE and a.request_id in self.requests
            and self.has_token[self.sched.slot_of(a.request_id)]
        ]
        if not prefills and not decode_live:
            return emitted

        active = np.zeros(self.B, bool)
        for a in decode_live:
            active[self.sched.slot_of(a.request_id)] = True

        if prefills:
            tokens = np.zeros((self.B, self.pc), np.int32)
            start = np.zeros(self.B, np.int32)
            limit = np.zeros(self.B, np.int32)
            is_decode = active.copy()
            act = active.copy()
            for a in prefills:
                slot = a.slot
                tokens[slot] = self.ids_pad[a.request_id][
                    a.chunk_start : a.chunk_start + self.pc
                ]
                start[slot] = a.chunk_start
                limit[slot] = a.chunk_start + a.chunk_len
                self.prompt_len[slot] = len(self.requests[a.request_id].ids)
                act[slot] = True
            tokens[:, self.pc - 1] = np.where(
                is_decode, self.next_token, tokens[:, self.pc - 1]
            )
            # which logit row each slot will need: decode rows the last
            # column, completing prefills their final real token's row
            last_idx = np.where(is_decode, self.pc - 1, 0).astype(np.int32)
            finishing = []
            for a in prefills:
                T = len(self.requests[a.request_id].ids)
                li = T - 1 - a.chunk_start
                if T <= a.chunk_start + a.chunk_len and 0 <= li < self.pc:
                    last_idx[a.slot] = li
                    finishing.append((a, li))
            logits, self.cache = _merged_step(
                self.cfg, self.spec, self.budget, self.pc, self.model.params,
                self.cache, self._dev(tokens), self._dev(start),
                self._dev(limit), self._dev(self.prompt_len),
                self._dev(self.gen_count), self._dev(is_decode),
                self._dev(act), self._key(),
            )
            # ONE device-side sample over every needed row, ONE small (B,)
            # readback. The r5 serving-TPU bench measured 684 ms p50 per
            # tick through the tunneled runtime — dominated by per-tick
            # host round trips, the worst being the (B, V) logits readback
            # + re-upload this replaces (finishing prefills and decode rows
            # now share one batched draw; greedy output is unchanged, and
            # sampled rows keep independent per-row draws).
            if self.mesh is None:
                rows = jnp.take_along_axis(
                    logits, jnp.asarray(last_idx)[:, None, None], axis=1
                )[:, 0]
            else:
                rows = self._rows(logits, self._dev(last_idx))
            toks = np.asarray(sample_topp(
                self._key(), rows,
                jnp.float32(self.temperature), jnp.float32(self.top_p),
            ))
            for a in prefills:
                self.sched.report_prefill(a.request_id, a.chunk_len)
            for a, li in finishing:
                rid, slot = a.request_id, a.slot
                # prompt fully consumed: emit the first sampled token
                tok = int(toks[slot])
                self.gen_count[slot] = 0
                self.next_token[slot] = tok
                self.has_token[slot] = True
                self.requests[rid].out.append(tok)
                emitted.append((rid, tok))
                self._check_done(rid, slot, tok)
        elif decode_live:
            dec_logits, self.cache = _decode_step(
                self.cfg, self.spec, self.budget, self.model.params, self.cache,
                self._dev(self.next_token), self._dev(active),
                self._dev(self.prompt_len), self._dev(self.gen_count),
                self._key(),
            )
            if self.mesh is not None:
                dec_logits = self._rep(dec_logits)
            toks = np.asarray(sample_topp(
                self._key(), jnp.asarray(dec_logits),
                jnp.float32(self.temperature), jnp.float32(self.top_p),
            ))

        if decode_live:
            for a in decode_live:
                rid = a.request_id
                slot = self.sched.slot_of(rid)
                self.gen_count[slot] += 1
                tok = int(toks[slot])
                self.next_token[slot] = tok
                self.requests[rid].out.append(tok)
                emitted.append((rid, tok))
                self._check_done(rid, slot, tok)
        return emitted

    def _check_done(self, rid: int, slot: int, tok: int) -> bool:
        done = self.sched.report_token(rid, is_eos=bool(self.eos and tok in self.eos))
        if done:
            req = self.requests.pop(rid)
            req.done = True
            self.finished[rid] = req
            self.ids_pad.pop(rid, None)
            self.has_token[slot] = False
            # host scalar (not jnp): stays valid as a replicated input when
            # the cache is a multi-process global array
            self.cache = _clear_row(self.cache, np.int32(slot))
        return done

    def run_all(self, checkpoint_path: str = None,
                checkpoint_every: int = 0) -> Dict[int, List[int]]:
        """Drain the queue. With checkpoint_path + checkpoint_every=N, a
        snapshot is written every N ticks — a crashed server resumes
        in-flight requests with ScheduledBatchEngine.resume()."""
        n = 0
        while self.requests or self.sched.num_waiting:
            if not self.tick() and not self.sched.num_waiting and not self.requests:
                break
            n += 1
            if checkpoint_path and checkpoint_every and n % checkpoint_every == 0:
                self.snapshot(checkpoint_path)
        return {rid: r.out for rid, r in self.finished.items()}

    # -- failure recovery: snapshot / resume ---------------------------------

    def _host_state(self) -> dict:
        return {
            "rng": np.asarray(self.rng),
            "prompt_len": self.prompt_len.copy(),
            "gen_count": self.gen_count.copy(),
            "next_token": self.next_token.copy(),
            "has_token": self.has_token.copy(),
            "sched_rows": self.sched.dump(),
            "requests": {
                rid: (np.asarray(r.ids), r.max_new_tokens, list(r.out))
                for rid, r in self.requests.items()
            },
            "finished": {
                rid: (np.asarray(r.ids), r.max_new_tokens, list(r.out))
                for rid, r in self.finished.items()
            },
        }

    def snapshot(self, path: str) -> None:
        """Persist everything needed to resume in-flight requests after a
        crash: cache + sidecars, host bookkeeping, sampler key, scheduler
        rows (native sched_dump).

        Single process: one pickle file, atomic rename. Multi-process mesh
        (VERDICT r2 next #6): `path` becomes a DIRECTORY — the globally
        sharded cache is written collectively through Orbax (each process
        writes only its addressable shards), and the host bookkeeping —
        replicated across processes by the SPMD driver model — is written
        once by process 0. Every process must call snapshot() (it is a
        collective)."""
        import os
        import pickle

        if self.mesh is not None and jax.process_count() > 1:
            import orbax.checkpoint as ocp
            from jax.experimental import multihost_utils

            path = os.path.abspath(path)
            with ocp.StandardCheckpointer() as ckptr:
                ckptr.save(os.path.join(path, "cache"), list(self.cache),
                           force=True)
            if jax.process_index() == 0:
                tmp = os.path.join(path, "host.pkl.tmp")
                with open(tmp, "wb") as f:
                    pickle.dump(self._host_state(), f)
                os.replace(tmp, os.path.join(path, "host.pkl"))
            # no process may report the snapshot done before all have
            multihost_utils.sync_global_devices("easykv_snapshot")
            return

        state = {"cache": [None if x is None else np.asarray(x)
                           for x in self.cache]}
        state.update(self._host_state())
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(state, f)
        os.replace(tmp, path)

    @classmethod
    def resume(cls, path: str, model, **engine_kwargs) -> "ScheduledBatchEngine":
        """Rebuild an engine (same config knobs as the crashed one) from a
        snapshot(): in-flight requests keep their slots, prefill progress,
        emitted tokens and cache contents; waiting requests keep FIFO order.
        Directory snapshots (multi-process) restore the cache straight into
        its NamedShardings — each process reads only its shards."""
        import os
        import pickle

        eng = cls(model, **engine_kwargs)
        from ..cache import KVCache

        if os.path.isdir(path):
            import orbax.checkpoint as ocp

            with open(os.path.join(path, "host.pkl"), "rb") as f:
                state = pickle.load(f)
            abstract = [
                jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
                for x in eng.cache
            ]
            with ocp.StandardCheckpointer() as ckptr:
                arrs = ckptr.restore(os.path.join(path, "cache"), abstract)
            eng.cache = KVCache(*arrs)
        else:
            with open(path, "rb") as f:
                state = pickle.load(f)
            cache = KVCache(*[None if x is None else jnp.asarray(x)
                              for x in state["cache"]])
            if eng.mesh is not None:
                from ..parallel.sharding import shard_cache

                cache = shard_cache(cache, eng._mc, eng.mesh)
            eng.cache = cache
        eng.rng = jnp.asarray(state["rng"])
        eng.prompt_len = state["prompt_len"]
        eng.gen_count = state["gen_count"]
        eng.next_token = state["next_token"]
        eng.has_token = state["has_token"]
        for rid, (ids, mx, out) in state["requests"].items():
            req = Request(request_id=rid, ids=ids, max_new_tokens=mx)
            req.out = out
            eng.requests[rid] = req
            pad_chunks = (len(ids) + eng.pc - 1) // eng.pc + 1
            pad = np.zeros(max(pad_chunks, 2) * eng.pc, np.int32)
            pad[: len(ids)] = ids
            eng.ids_pad[rid] = pad
        for rid, (ids, mx, out) in state["finished"].items():
            req = Request(request_id=rid, ids=ids, max_new_tokens=mx)
            req.out, req.done = out, True
            eng.finished[rid] = req
        for row in state["sched_rows"]:
            eng.sched.restore(row)
        return eng
