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
    ):
        self.model = model
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
        S = max_prompt + budget + 1
        self.cache = init_cache(
            self.cfg.num_hidden_layers, self.B, self.cfg.num_key_value_heads,
            S, self.cfg.head_dim, jnp.dtype(model.dtype),
            quantized=getattr(model, "kv_quant", False),
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

    def _sample1(self, logits_row) -> int:
        self.rng, sub = jax.random.split(self.rng)
        return int(sample_topp(sub, logits_row[None],
                               jnp.float32(self.temperature),
                               jnp.float32(self.top_p))[0])

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
            self.rng, sub = jax.random.split(self.rng)
            logits, self.cache = _merged_step(
                self.cfg, self.spec, self.budget, self.pc, self.model.params,
                self.cache, jnp.asarray(tokens), jnp.asarray(start),
                jnp.asarray(limit), jnp.asarray(self.prompt_len),
                jnp.asarray(self.gen_count), jnp.asarray(is_decode),
                jnp.asarray(act), sub,
            )
            dec_logits = logits[:, self.pc - 1, :]
            for a in prefills:
                rid, slot = a.request_id, a.slot
                req = self.requests[rid]
                T = len(req.ids)
                self.sched.report_prefill(rid, a.chunk_len)
                last_idx = T - 1 - a.chunk_start
                if T > a.chunk_start + a.chunk_len:
                    last_idx = -1  # prompt not fully consumed this tick
                if 0 <= last_idx < self.pc:
                    # prompt fully consumed: sample the first token
                    tok = self._sample1(logits[slot, last_idx])
                    self.gen_count[slot] = 0
                    self.next_token[slot] = tok
                    self.has_token[slot] = True
                    req.out.append(tok)
                    emitted.append((rid, tok))
                    self._check_done(rid, slot, tok)
        elif decode_live:
            self.rng, sub = jax.random.split(self.rng)
            dec_logits, self.cache = _decode_step(
                self.cfg, self.spec, self.budget, self.model.params, self.cache,
                jnp.asarray(self.next_token), jnp.asarray(active),
                jnp.asarray(self.prompt_len), jnp.asarray(self.gen_count), sub,
            )

        if decode_live:
            self.rng, sub = jax.random.split(self.rng)
            toks = np.asarray(sample_topp(
                sub, dec_logits, jnp.float32(self.temperature),
                jnp.float32(self.top_p),
            ))
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
            self.cache = _clear_row(self.cache, jnp.int32(slot))
        return done

    def run_all(self) -> Dict[int, List[int]]:
        while self.requests or self.sched.num_waiting:
            if not self.tick() and not self.sched.num_waiting and not self.requests:
                break
        return {rid: r.out for rid, r in self.finished.items()}
