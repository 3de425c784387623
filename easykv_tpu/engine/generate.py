"""Generation engine: budget-constrained KV-cache generation in five modes —
decoding / encoding / auto / encoding_decoding / ppl — mirroring the
reference's `generate` (reference easykv/easykv.py:199-901) as fully-jitted
device loops.

Structural differences from the reference (all deliberate, SURVEY.md §7):
  * The decode hot loop is a `lax.while_loop` with on-device sampling and
    EOS detection — the reference syncs the host ~6x per token
    (easykv.py:259-283).
  * The strided encoding loop is a `lax.fori_loop` over fixed-size chunks —
    one compilation, no per-chunk dispatch (easykv.py:426-433).
  * Budget bookkeeping (idx / r_idx stride alignment, easykv.py:385-392)
    happens in Python at trace time; everything shape-affecting is static
    and cached on `EngineStatics`.

Budget semantics parity (SURVEY.md §2.4):
  * decoding: the budget covers only *generated* tokens; prompt KV is never
    evicted (easykv.py:290, 311); eviction cadence is 1 slot/(layer,head)/step
    once generated > budget (easykv.py:302-303); decode-phase recent_ratio is
    the hard-coded 0.3 (easykv.py:308, 709).
  * encoding: float budget -> int(length*budget)+stride; idx walks down so
    (length-idx)%stride==0; r_idx so (idx-r_idx)%stride==0 (easykv.py:385-392);
    the cache oscillates in [idx, idx+stride].
  * encoding_decoding: int budget (+stride unless >= length), tiny prefix
    (r_idx ascending scan, easykv.py:551-552), per-step eviction continues
    through decode including prompt slots (easykv.py:670-748).
  * ppl: teacher-forced CE over the tokens fed after r_idx, predicted from
    the evicted cache (easykv.py:816-901).
"""
from __future__ import annotations

import dataclasses
import functools
import time
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import flags
from ..cache import KVCache, init_cache
from ..config import GenerationConfig, ModelConfig
from ..models import llama
from ..models.llama import StepCtx
from ..policies import (
    PHASE_DECODE,
    PHASE_ENCDEC_DECODE,
    PHASE_ENCODE,
    PolicySpec,
    evict_cache,
)
from ..ops.aux_math import confidence
from ..ops.quant import materialize_params
from ..sampling import logits_adapter, sample_token, sample_topp

import os as _os

# Width of the no-eviction prefix-prefill chunks (decode-mode prompt, the
# encoding-mode prefix [0:r_idx], ppl full-cache). Purely a performance
# knob — no evictions happen inside the prefix, so any width is
# semantics-preserving; peak memory for the per-layer attention probs grows
# linearly with it. Default 128: after the slice-write + fused-kernel
# rework the narrow chunk wins or ties every measured case (RESULTS.md
# r2 sweeps — prefix 8482 vs 7761 tok/s at PC=1024, full-prefill 7393 vs
# 7107; the old PC=1024 preference was an artifact of the scatter write's
# per-chunk cost).
PREFILL_CHUNK = int(_os.environ.get("EASYKV_TPU_PREFILL_CHUNK", "128"))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def stride_align(length: int, budget: int, stride: int) -> Tuple[int, int]:
    """Reference easykv.py:389-392: idx = largest <= budget with
    (length-idx)%stride==0; r_idx = largest < idx with (idx-r_idx)%stride==0."""
    idx = 0
    for i in range(budget, -1, -1):
        if (length - i) % stride == 0:
            idx = i
            break
    r_idx = 0
    for r in range(idx - 1, -1, -1):
        if (idx - r) % stride == 0:
            r_idx = r
            break
    return idx, r_idx


def stride_align_encdec(length: int, budget: int, stride: int) -> Tuple[int, int]:
    """Reference easykv.py:549-552: same idx; r_idx = smallest >= 1 with
    (idx-r_idx)%stride==0 (ascending scan — tiny prefix)."""
    idx = 0
    for i in range(budget, -1, -1):
        if (length - i) % stride == 0:
            idx = i
            break
    r_idx = idx - 1 if idx >= 1 else 0
    for r in range(1, idx):
        if (idx - r) % stride == 0:
            r_idx = r
            break
    return idx, r_idx


@dataclasses.dataclass(frozen=True)
class EngineStatics:
    """Everything shape- or graph-affecting; the jit cache key."""

    cfg: ModelConfig
    mode: str
    policy: str
    stride: int
    length: int              # exact prompt length (padded for decoding mode)
    budget: int              # resolved integer budget (post reference shifts)
    idx: int = 0
    r_idx: int = 0
    max_new_tokens: int = 0
    eos_token_ids: Tuple[int, ...] = ()
    temp_length: int = 4
    recent_window: int = 0       # encode-phase recent window
    recent_window_dec: int = 0   # decode-phase recent window (0.3 quirk)
    keep_attention: bool = False
    streaming: bool = False
    dtype: str = "float32"
    kv_quant: bool = False  # int8 compressed-KV cache
    # (Mesh, seq_axis_name) for sequence-parallel ring prefill, captured from
    # flags.sp_mesh() at generate() time — part of the statics so a flag flip
    # retraces instead of hitting the stale jitted graph (Mesh is hashable).
    sp: Optional[Tuple] = None
    # (Mesh, data_axis, model_axis) for TP/DP serving, captured from
    # flags.active_mesh(): the engine-built KV cache is sharding-constrained
    # to cache_pspecs (KV heads on model, batch on data) so GSPMD lays it out
    # to match the sharded params instead of inferring, and a mesh flip
    # retraces.
    tp: Optional[Tuple] = None
    # Effective flag state (pallas attention, sidecar kernels, layer-major
    # encode, chunk kernel) at generate() time: unused in the graph but part
    # of the jit cache key, so a flag flip retraces instead of serving the
    # other path's cached trace.
    pallas: Tuple = (False, False, True, False)
    # Collect per-step confidence/token-prob bookkeeping (reference
    # easykv.py:261/279). Off by default: the extra (B, V) softmax +
    # entropy per step is measurable against the 7 ms step budget; verbose
    # runs (report_decoding_latency) turn it on.
    collect_stats: bool = False

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    def encode_spec(self) -> PolicySpec:
        return PolicySpec(
            policy=self.policy,
            phase=PHASE_ENCODE,
            k=self.stride,
            sink_length=self.temp_length,
            recent_window=self.recent_window,
            # reference easykv.py:474: k = max(budget - recent_window - sink, stride)
            feasible_k=min(
                max(self.budget - self.recent_window - self.temp_length, self.stride),
                self.idx + self.stride,
            ),
        )

    def decode_spec(self) -> Optional[PolicySpec]:
        if self.policy == "full":
            return None
        return PolicySpec(
            policy=self.policy,
            phase=PHASE_DECODE,
            k=1,
            sink_length=self.temp_length,
            recent_window=self.recent_window_dec,
            # reference easykv.py:322: k = budget - recent_window
            feasible_k=max(self.budget - self.recent_window_dec, 1),
            protect_prompt=True,
        )

    def encdec_decode_spec(self) -> PolicySpec:
        return PolicySpec(
            policy=self.policy,
            phase=PHASE_ENCDEC_DECODE,
            k=1,
            sink_length=self.temp_length,
            recent_window=self.recent_window_dec,
            # reference easykv.py:722: k = budget - recent_window; clamp to the
            # number of valid slots in the carried-over encode buffer (the
            # reference buffer has exactly idx+1 real columns at this point).
            feasible_k=max(min(self.budget - self.recent_window_dec, self.idx), 1),
        )


def _encode_counter_init(pos: jax.Array, idx: int, stride: int, keep: bool) -> jax.Array:
    """Per-token initial observation counter for encoding-family modes.

    Closed form of the reference's buffer initializers and post-eviction
    tails (reference easykv.py:412-418, 469, 483):
      pos >= idx:  -((pos - idx) % stride)
      pos <  idx:  idx - pos if keep_attention else 0
    """
    tail = -((pos - idx) % stride).astype(jnp.float32)
    head = (idx - pos).astype(jnp.float32) if keep else jnp.zeros_like(pos, jnp.float32)
    return jnp.where(pos >= idx, tail, head)


def _isin_eos(token: jax.Array, eos_ids: Tuple[int, ...]) -> jax.Array:
    if not eos_ids:
        return jnp.zeros(token.shape, bool)
    eos = jnp.asarray(eos_ids, jnp.int32)
    return jnp.any(token[..., None] == eos, axis=-1)


# ---------------------------------------------------------------------------
# Phase A: prefix prefill in fixed chunks (optionally with the keep_attention
# score bootstrap, reference h2o_head_score easykv.py:173-186).
# ---------------------------------------------------------------------------

def _prefill(
    st: EngineStatics,
    params,
    cache: KVCache,
    ids: jax.Array,         # (B, A) prefix tokens (A static, may be 0)
    prefix_len: jax.Array,  # (B,) true prefix length (<= A)
    spec: Optional[PolicySpec],
    counter_kind: str,      # 'zero' | 'encode'
) -> Tuple[KVCache, jax.Array]:
    """Returns (cache, last_logits (B, V)) after consuming the prefix.

    With a registered sequence-parallel mesh (flags.set_sp_mesh) the chunked
    fori_loop is replaced by ONE ring-attention pass with the prefix sharded
    over the sp axis — the traveling Σp/Σp² accumulators feed the
    keep_attention bootstrap directly (VERDICT r1 next #4)."""
    B, A = ids.shape
    if A == 0:
        return cache, jnp.zeros((B, st.cfg.vocab_size), jnp.float32)
    sp = st.sp
    if sp is not None:
        n = sp[0].shape[sp[1]]
        A_pad = _round_up(A, n)
        if A_pad <= cache.num_slots:
            return _ring_prefill(st, params, cache, ids, prefix_len,
                                 spec, counter_kind, A_pad, sp)
    PC = min(PREFILL_CHUNK, _round_up(A, 8))
    A_pad = _round_up(A, PC)
    ids = jnp.pad(ids, ((0, 0), (0, A_pad - A)))
    n_chunks = A_pad // PC
    if flags.layer_major_enabled():
        return _prefill_layer_major(st, params, cache, ids, prefix_len, spec,
                                    counter_kind, PC)

    def body(i, carry):
        cache, last_logits = carry
        start = i * PC
        chunk = jax.lax.dynamic_slice_in_dim(ids, start, PC, axis=1)
        pos = start + jnp.arange(PC, dtype=jnp.int32)[None, :]
        tok_valid = pos < prefix_len[:, None]
        q_pos = jnp.where(tok_valid, pos, -1)
        if counter_kind == "encode":
            cinit = _encode_counter_init(pos, st.idx, st.stride, st.keep_attention)
        else:
            cinit = jnp.zeros_like(pos, jnp.float32)
        ctx = StepCtx(
            q_pos=q_pos,
            token_valid=tok_valid,
            counter_init=jnp.broadcast_to(cinit, (B, PC)).astype(jnp.float32),
            next_pos=jnp.minimum(start + PC, prefix_len),
            prompt_len=prefix_len,
            evict_gate=jnp.zeros((B,), bool),
            update_gate=jnp.ones((), bool),
            rand_rank=jnp.zeros((B,), jnp.int32),
        )
        # The prefix prefill ALWAYS uses stock (non-streaming) attention:
        # the reference patches the streaming forward only after this phase
        # (easykv.py:232 vs :253-256, :396 vs :408-410), so prefix keys are
        # cached post-RoPE at their true positions — and are then re-rotated
        # by cache rank in streaming phases (the reference's double-rotation
        # artifact, reproduced for exact parity).
        logits, cache = llama.forward(
            params, st.cfg, cache, chunk, ctx, spec,
            bootstrap=True, streaming=False,
        )
        # Track the logit row of the final real token (may be mid-chunk).
        is_last = (q_pos == prefix_len[:, None] - 1)[..., None]
        last_logits = jnp.where(
            jnp.any(is_last, axis=1), jnp.sum(logits * is_last, axis=1), last_logits
        )
        return cache, last_logits

    init = (cache, jnp.zeros((B, st.cfg.vocab_size), jnp.float32))
    return jax.lax.fori_loop(0, n_chunks, body, init)


def _prefill_layer_major(
    st: EngineStatics,
    params,
    cache: KVCache,
    ids: jax.Array,         # (B, A_pad) already padded
    prefix_len: jax.Array,  # (B,)
    spec: Optional[PolicySpec],
    counter_kind: str,
    PC: int,
) -> Tuple[KVCache, jax.Array]:
    """Layer-major prefix prefill (llama.prefill_layer_major): the prefix is
    eviction-free, so the whole phase is per-layer big matmuls + a chunked
    attention/write scan. Same bootstrap semantics as the chunked body."""
    B, A_pad = ids.shape
    n = A_pad // PC
    pos = jnp.asarray(
        np.arange(n)[:, None] * PC + np.arange(PC)[None, :], jnp.int32
    )                                                      # (n, PC)
    posb = jnp.broadcast_to(pos[:, None, :], (n, B, PC))
    tok_valid = posb < prefix_len[None, :, None]
    if counter_kind == "encode":
        cinit = _encode_counter_init(pos, st.idx, st.stride, st.keep_attention)
    else:
        cinit = jnp.zeros_like(pos, jnp.float32)
    ctxs = StepCtx(
        q_pos=jnp.where(tok_valid, posb, -1),
        token_valid=tok_valid,
        counter_init=jnp.broadcast_to(
            cinit[:, None, :], (n, B, PC)
        ).astype(jnp.float32),
        next_pos=jnp.minimum(
            (jnp.arange(n, dtype=jnp.int32)[:, None] + 1) * PC,
            prefix_len[None, :],
        ),
        prompt_len=jnp.broadcast_to(prefix_len[None, :], (n, B)),
        evict_gate=jnp.zeros((n, B), bool),
        update_gate=jnp.ones((n, B), bool),
        rand_rank=jnp.zeros((n, B), jnp.int32),
    )
    h, cache = llama.prefill_layer_major(params, st.cfg, cache, ids, ctxs, spec)
    h_last = jnp.take_along_axis(
        h, jnp.maximum(prefix_len - 1, 0)[:, None, None], axis=1
    )
    last_logits = llama._logits_tail(h_last, params, st.cfg)[:, 0]
    last_logits = jnp.where(
        (prefix_len > 0)[:, None], last_logits, jnp.zeros_like(last_logits)
    )
    return cache, last_logits


def _ring_prefill(
    st: EngineStatics,
    params,
    cache: KVCache,
    ids: jax.Array,         # (B, A)
    prefix_len: jax.Array,  # (B,)
    spec: Optional[PolicySpec],
    counter_kind: str,
    A_pad: int,             # A rounded up to the sp-axis size
    sp,                     # (Mesh, axis_name)
) -> Tuple[KVCache, jax.Array]:
    """Sequence-parallel prefix prefill (llama.ring_prefill_forward)."""
    B, A = ids.shape
    ids = jnp.pad(ids, ((0, 0), (0, A_pad - A)))
    pos = jnp.arange(A_pad, dtype=jnp.int32)[None, :]
    tok_valid = pos < prefix_len[:, None]
    if counter_kind == "encode":
        cinit = _encode_counter_init(pos, st.idx, st.stride, st.keep_attention)
    else:
        cinit = jnp.zeros_like(pos, jnp.float32)
    ctx = StepCtx(
        q_pos=jnp.where(tok_valid, pos, -1),
        token_valid=tok_valid,
        counter_init=jnp.broadcast_to(cinit, (B, A_pad)).astype(jnp.float32),
        next_pos=prefix_len,
        prompt_len=prefix_len,
        evict_gate=jnp.zeros((B,), bool),
        update_gate=jnp.ones((), bool),
        rand_rank=jnp.zeros((B,), jnp.int32),
    )
    logits, cache = llama.ring_prefill_forward(
        params, st.cfg, cache, ids, ctx, spec, mesh=sp[0], axis=sp[1]
    )
    return cache, logits


# ---------------------------------------------------------------------------
# Phase B: strided encoding with per-chunk eviction (reference easykv.py:426-499)
# ---------------------------------------------------------------------------

def _strided_encode(
    st: EngineStatics,
    params,
    cache: KVCache,
    input_ids: jax.Array,   # (B, length) full prompt
    spec: PolicySpec,
    seed: jax.Array,
    collect_ppl: bool,
    last_logits0: jax.Array = None,  # (B, V) from the prefix prefill
):
    """Consume [r_idx, length) in chunks of `stride`.

    Returns (cache, last_logits (B,V), loss_sum (B,), kv_len (B,))."""
    B = input_ids.shape[0]
    stride, idx = st.stride, st.idx
    n_chunks = (st.length - st.r_idx) // stride
    if flags.layer_major_enabled() and not st.streaming and n_chunks > 0:
        return _strided_encode_layer_major(
            st, params, cache, input_ids, spec, seed, collect_ppl, last_logits0
        )
    S_enc = idx + stride  # logical encode-phase buffer (reference score width)
    evicting = spec.policy != "full"

    def body(i, carry):
        cache, last_logits, loss_sum, kv_len = carry
        start = st.r_idx + i * stride
        chunk = jax.lax.dynamic_slice_in_dim(input_ids, start, stride, axis=1)
        pos = start + jnp.arange(stride, dtype=jnp.int32)[None, :]
        kv_after = kv_len + stride
        trigger = kv_after > idx  # (B,) reference easykv.py:459
        # per-row: a row updates scores iff keep_attention or ITS trigger
        # fires (B=1 in the reference; per-row keeps batched encoding exact)
        update = jnp.asarray(st.keep_attention) | trigger
        # Random policy: uniform span start over ranks [0, S_enc - stride)
        # (reference easykv.py:494-497).
        u = jax.random.uniform(jax.random.fold_in(seed, i), (B,))
        rand_rank = (u * (S_enc - stride)).astype(jnp.int32)
        ctx = StepCtx(
            q_pos=pos,
            token_valid=jnp.ones((B, stride), bool),
            counter_init=jnp.broadcast_to(
                _encode_counter_init(pos, idx, stride, st.keep_attention), (B, stride)
            ),
            next_pos=jnp.full((B,), start + stride, jnp.int32),
            prompt_len=jnp.zeros((B,), jnp.int32),
            evict_gate=trigger if evicting else jnp.zeros((B,), bool),
            update_gate=update,
            rand_rank=rand_rank,
        )
        logits, cache = llama.forward(
            params, st.cfg, cache, chunk, ctx, spec, streaming=st.streaming
        )
        if evicting:
            cache = evict_cache(cache, spec, ctx.next_pos,
                                jnp.zeros((B,), jnp.int32), rand_rank, trigger)
        kv_len = kv_after - jnp.where(ctx.evict_gate, stride, 0)

        if collect_ppl:
            # CE of chunk token j from row j-1; token 0 from the previous
            # chunk's last row (reference easykv.py:896-899). The very first
            # fed token has no predictor (all_ids[1:]).
            logp = jax.nn.log_softmax(logits, axis=-1)
            tgt = chunk[:, 1:]
            ce_intra = -jnp.take_along_axis(logp[:, :-1, :], tgt[..., None], axis=-1)
            loss = jnp.sum(ce_intra[..., 0], axis=-1)
            prev_logp = jax.nn.log_softmax(last_logits, axis=-1)
            ce_cross = -jnp.take_along_axis(prev_logp, chunk[:, :1], axis=-1)[:, 0]
            loss = loss + jnp.where(i > 0, ce_cross, 0.0)
            loss_sum = loss_sum + loss
        return cache, logits[:, -1, :], loss_sum, kv_len

    if last_logits0 is None:
        last_logits0 = jnp.zeros((B, st.cfg.vocab_size), jnp.float32)
    init = (
        cache,
        last_logits0,
        jnp.zeros((B,), jnp.float32),
        jnp.full((B,), st.r_idx, jnp.int32),
    )
    return jax.lax.fori_loop(0, n_chunks, body, init)


def _strided_encode_layer_major(
    st: EngineStatics,
    params,
    cache: KVCache,
    input_ids: jax.Array,
    spec: PolicySpec,
    seed: jax.Array,
    collect_ppl: bool,
    last_logits0=None,
):
    """Layer-major variant of _strided_encode (same contract): the chunk
    schedule is computed here (it is fully static — every batch row feeds
    st.length tokens, so the reference's per-row trigger is row-uniform) and
    the model runs one whole-width pass per layer with an inner chunk scan
    (llama.strided_encode_layer_major). Token/slot-exact vs the chunk-major
    path (tests/test_layer_major.py); ~the chunk count fewer weight passes."""
    B = input_ids.shape[0]
    stride, idx = st.stride, st.idx
    n = (st.length - st.r_idx) // stride
    S_enc = idx + stride
    evicting = spec.policy != "full"
    keep = bool(st.keep_attention)

    # Static schedule, mirroring the chunk-major body exactly
    # (trigger = kv_len + stride > idx, reference easykv.py:459).
    kv = st.r_idx
    trig_l, kv_before = [], []
    for _ in range(n):
        kv_before.append(kv)
        t = kv + stride > idx
        trig_l.append(t)
        kv = kv + stride - (stride if (t and evicting) else 0)
    trig = jnp.asarray(trig_l, bool)                         # (n,)
    write_start = jnp.broadcast_to(
        jnp.asarray(kv_before, jnp.int32)[:, None], (n, B)
    )

    starts = st.r_idx + stride * np.arange(n)
    pos = jnp.asarray(starts[:, None] + np.arange(stride)[None, :], jnp.int32)
    cinit = _encode_counter_init(pos, idx, stride, keep)      # (n, C)
    u = jax.vmap(
        lambda i: jax.random.uniform(jax.random.fold_in(seed, i), (B,))
    )(jnp.arange(n))
    ctxs = StepCtx(
        q_pos=jnp.broadcast_to(pos[:, None, :], (n, B, stride)),
        token_valid=jnp.ones((n, B, stride), bool),
        counter_init=jnp.broadcast_to(
            cinit[:, None, :], (n, B, stride)
        ).astype(jnp.float32),
        next_pos=jnp.broadcast_to(
            jnp.asarray(starts + stride, jnp.int32)[:, None], (n, B)
        ),
        prompt_len=jnp.zeros((n, B), jnp.int32),
        evict_gate=(jnp.broadcast_to(trig[:, None], (n, B)) if evicting
                    else jnp.zeros((n, B), bool)),
        update_gate=jnp.broadcast_to((keep | trig)[:, None], (n, B)),
        rand_rank=(u * (S_enc - stride)).astype(jnp.int32),
    )
    tokens = input_ids[:, st.r_idx : st.r_idx + n * stride]
    h, cache = llama.strided_encode_layer_major(
        params, st.cfg, cache, tokens, ctxs, spec, write_start
    )
    last_logits = llama._logits_tail(h[:, -1:, :], params, st.cfg)[:, 0]
    loss_sum = jnp.zeros((B,), jnp.float32)
    if collect_ppl:
        loss_sum = _ce_from_hidden(st, params, h, tokens)
    kv_len = jnp.full((B,), kv, jnp.int32)
    return cache, last_logits, loss_sum, kv_len


def _ce_from_hidden(st: EngineStatics, params, h: jax.Array, tokens: jax.Array,
                    true_len: Optional[jax.Array] = None):
    """Teacher-forced CE from final hidden states: token j scored from row
    j-1, summed over j in [1, true_len) — identical to the chunk-major
    intra+cross accumulation (reference easykv.py:896-899; the first fed
    token has no predictor). The lm head runs in PREFILL_CHUNK blocks so the
    (B, T, V) logits are never materialized."""
    B, T, _ = h.shape
    if true_len is None:
        true_len = jnp.full((B,), T, jnp.int32)
    PC = min(PREFILL_CHUNK, _round_up(T, 8))
    T_pad = _round_up(T, PC)
    h = jnp.pad(h, ((0, 0), (0, T_pad - T), (0, 0)))
    tgt = jnp.pad(tokens, ((0, 0), (0, T_pad - T + 1)))

    def body(i, loss_sum):
        s = i * PC
        hb = jax.lax.dynamic_slice_in_dim(h, s, PC, axis=1)
        tb = jax.lax.dynamic_slice_in_dim(tgt, s + 1, PC, axis=1)
        logp = jax.nn.log_softmax(llama._logits_tail(hb, params, st.cfg), axis=-1)
        ce = -jnp.take_along_axis(logp, tb[..., None], axis=-1)[..., 0]
        mask = ((s + jnp.arange(PC))[None, :] + 1 < true_len[:, None])
        return loss_sum + jnp.sum(ce * mask.astype(jnp.float32), axis=-1)

    return jax.lax.fori_loop(0, T_pad // PC, body, jnp.zeros((B,), jnp.float32))


# ---------------------------------------------------------------------------
# Decode loop (reference easykv.py:257-363 / :508-526 / :670-748)
# ---------------------------------------------------------------------------

def _fits_compact(cache: KVCache) -> bool:
    from ..ops.pallas.sidecar_update import compact_fits

    L, B, H, S = cache.pos.shape
    return compact_fits(H, S, cache.k.shape[-1], cache.k.dtype.itemsize)


def _prerotate_cache(cache: KVCache, cfg) -> KVCache:
    """One-time transform entering pre-rotated ordered streaming decode
    (flags.prerot_enabled): multiply every slot's stored K by R(slot). The
    decoding-mode prefill cached K post-RoPE at its true position (== slot
    in the fresh ordered cache), so the composed value R(slot)·R(pos)·k
    reproduces the reference's prefix double-rotation artifact exactly
    (easykv.py:232 vs :253-256 — see _prefill's non-streaming prefix note);
    from here on attention reads K with no rotation and the compact-on-evict
    shift maintains R(rank) with one fixed R(-theta) Givens per shift."""
    from ..cache import quantize_kv
    from ..ops.rope import apply_rope, rope_base_for, rope_inv_freq

    inv_freq = rope_inv_freq(cfg.head_dim, rope_base_for(cfg))
    S = cache.pos.shape[-1]
    slots = jnp.arange(S, dtype=jnp.int32)
    quantized = cache.k.dtype == jnp.int8
    if quantized:
        kf = cache.k.astype(jnp.float32) * cache.k_scale[..., None]
    else:
        kf = cache.k.astype(jnp.float32)
    rot = apply_rope(kf, slots, inv_freq)
    if quantized:
        knq, ksc = quantize_kv(rot)
        return cache._replace(k=knq, k_scale=ksc)
    return cache._replace(k=rot.astype(cache.k.dtype))


def _compact_one(cache: KVCache, pos_mid: jax.Array,
                 rot_inv_freq: Optional[jax.Array] = None) -> KVCache:
    """Age-ordered compaction after a k=1 eviction event: slots above each
    head's victim shift down by one (static roll + select — no gather), so
    valid slots stay contiguous and age-ordered. This is the reference's
    physical-removal semantics (truncate_kv_cache_silo, easykv.py:56-68)
    realized with static shapes; heads without an eviction are untouched.

    On TPU a single aliased Pallas pass handles all 8 arrays
    (ops/pallas/sidecar_update.fused_compact); off-TPU / under a >1-chip
    mesh the XLA roll+select below applies.

    rot_inv_freq (pre-rotated ordered streaming, flags.prerot_enabled):
    each SHIFTED K row additionally picks up the fixed R(-theta) Givens
    update (its age rank just dropped by one) and — for int8 caches — is
    requantized with a fresh per-row scale. V and the sidecars shift
    unrotated. Runs on the XLA path (the rotation rides the same roll +
    select pass XLA already fuses well, RESULTS.md r4 fused-compact A/B)."""
    S_ = cache.pos.shape[-1]
    mi = flags.active_mesh()
    if (rot_inv_freq is None
            and flags.sidecar_enabled() and S_ % 128 == 0
            and (mi is None or mi[0].size == 1)
            and _fits_compact(cache)):
        from ..ops.pallas.sidecar_update import fused_compact


        quant = cache.k_scale is not None and cache.k_scale.shape[-1] == S_
        res = fused_compact(
            pos_mid, cache.pos, cache.score, cache.score_sq, cache.counter,
            cache.k, cache.v,
            k_scale=cache.k_scale if quant else None,
            v_scale=cache.v_scale if quant else None,
            interpret=flags.pallas_interpret(),
        )
        pos, score, ssq, counter, k, v = res[:6]
        scales = res[6:8] if quant else (cache.k_scale, cache.v_scale)
        return cache._replace(
            pos=pos, score=score, score_sq=ssq, counter=counter, k=k, v=v,
            k_scale=scales[0], v_scale=scales[1],
        )
    evicted = (pos_mid >= 0) & (cache.pos < 0)            # (L, B, H, S)
    any_ev = jnp.any(evicted, axis=-1, keepdims=True)     # (L, B, H, 1)
    S = cache.pos.shape[-1]
    iota = jnp.arange(S, dtype=jnp.int32)
    v_slot = jnp.argmax(evicted, axis=-1)[..., None]      # (L, B, H, 1)
    ge = (iota >= v_slot) & any_ev                        # (L, B, H, S)

    def compact(arr):
        if arr is None or arr.shape[3] != S:
            return arr                                    # (.., 1) dummies
        gem = ge.reshape(ge.shape + (1,) * (arr.ndim - 4))
        return jnp.where(gem, jnp.roll(arr, -1, axis=3), arr)

    pos = compact(cache.pos)
    # the (now one-past-the-end) last slot wrapped around to slot 0's value
    pos = jnp.where((iota == S - 1) & any_ev[..., 0][..., None], -1, pos)
    quant = cache.k_scale is not None and cache.k_scale.shape[3] == S
    if rot_inv_freq is None:
        k_new, ksc_new = compact(cache.k), compact(cache.k_scale)
        v_new, vsc_new = compact(cache.v), compact(cache.v_scale)
    elif (flags.sidecar_enabled() and S % 128 == 0
          and (mi is None or mi[0].size == 1)):
        # one VMEM pass: shift + R(-theta) + requant on shifted K rows only
        # (the XLA formulation below materializes full-cache f32
        # intermediates every step — ~3.6 ms at 7B, bench_streaming r5)
        from ..ops.pallas.sidecar_update import fused_kv_compact

        v_slot_a = jnp.min(jnp.where(evicted, iota, S), axis=-1)  # (L,B,H)
        res = fused_kv_compact(
            cache.k, cache.v, v_slot_a,
            k_scale=cache.k_scale if quant else None,
            v_scale=cache.v_scale if quant else None,
            inv_freq=rot_inv_freq, rotate=True,
            interpret=flags.pallas_interpret(),
        )
        k_new, v_new = res[0], res[1]
        ksc_new, vsc_new = (res[2], res[3]) if quant else (
            cache.k_scale, cache.v_scale)
    else:
        # XLA fallback (off-TPU / sharded): same scale-free requant as
        # fused_kv_compact — rotation commutes with the per-row scale, so
        # the values renormalize by the RAW rowmax and the scale picks up
        # the old-scale * rowmax/127 factor
        k_roll = jnp.roll(cache.k, -1, axis=3).astype(jnp.float32)
        d2 = k_roll.shape[-1] // 2
        c = jnp.cos(rot_inv_freq)
        s = jnp.sin(rot_inv_freq)
        x1, x2 = k_roll[..., :d2], k_roll[..., d2:]
        # R(-theta): the shifted row's rank dropped by exactly one
        k_rot = jnp.concatenate([x1 * c + x2 * s, x2 * c - x1 * s], axis=-1)
        gem = ge[..., None]
        if quant:
            amax = jnp.max(jnp.abs(k_rot), axis=-1)               # raw
            qn = jnp.clip(jnp.round(
                k_rot * (jnp.float32(127.0)
                         / jnp.maximum(amax, 1e-30))[..., None]),
                -127, 127)
            nsc = jnp.maximum(
                jnp.roll(cache.k_scale, -1, axis=3) * amax, 1e-8
            ) * jnp.float32(1.0 / 127.0)
            k_new = jnp.where(gem, qn, cache.k).astype(cache.k.dtype)
            ksc_new = jnp.where(ge, nsc, cache.k_scale)
        else:
            k_new = jnp.where(gem, k_rot.astype(cache.k.dtype), cache.k)
            ksc_new = cache.k_scale
        v_new, vsc_new = compact(cache.v), compact(cache.v_scale)
    return cache._replace(
        k=k_new, v=v_new, pos=pos,
        score=compact(cache.score), score_sq=compact(cache.score_sq),
        counter=compact(cache.counter),
        k_scale=ksc_new, v_scale=vsc_new,
    )


class DecodeResult(NamedTuple):
    out_ids: jax.Array    # (B, max_new_tokens) int32, -1 past the end
    n_tokens: jax.Array   # (B,) tokens emitted (including EOS)
    kv_len: jax.Array     # (B,) final valid cache slots
    # Per-step bookkeeping, mirroring the reference's decode-loop lists
    # (easykv.py:236-285): token_probs = the sampled token's raw softmax
    # probability (`token_probs`/`cache_probs`), confidence =
    # exp(-entropy(raw softmax)) (`cache_cur_probs`, easykv.py:279).
    # 0 past the emitted region.
    token_probs: jax.Array = None   # (B, max_new_tokens) f32
    confidence: jax.Array = None    # (B, max_new_tokens) f32


def _decode_loop(
    st: EngineStatics,
    params,
    cache: KVCache,
    first_logits: jax.Array,  # (B, V) logits producing token 1
    start_pos: jax.Array,     # (B,) position of the first generated token
    prompt_len: jax.Array,    # (B,)
    kv_len0: jax.Array,       # (B,)
    spec: Optional[PolicySpec],
    seed: jax.Array,
    temperature: jax.Array,
    top_p: jax.Array,
    evict_mode: str,          # 'none' | 'budget' | 'always'
) -> DecodeResult:
    B = first_logits.shape[0]
    M = st.max_new_tokens

    # Streaming decode rank strategy (flags.inc_ranks gates both; off =
    # per-step batched argsort, the 0.54 ms/step A/B reference path):
    #   ordered    — decoding mode only: the prefill cache is age-ordered
    #                (contiguous appends) and stays so by compacting on
    #                every k=1 eviction with a static roll+select (no
    #                gather). rank == slot index, so the kernels rotate by
    #                a direct per-slot table: no ranks, no argsort, and no
    #                one-hot pick dots (2.7 ms/step at 7B — RESULTS.md r4
    #                streaming attribution).
    #   inc_ranks  — other modes (encode/encdec leave scrambled caches):
    #                ranks carried in the loop state, updated from the pos
    #                deltas; one argsort total.
    ordered = (st.streaming and evict_mode in ("budget", "none")
               and st.mode == "decoding" and flags.inc_ranks_enabled())
    # pre-rotated ordered cache (flags.prerot_enabled): K stored already
    # rank-rotated, attention reads it with no per-step rotation; the
    # compact-on-evict shift applies the fixed R(-theta) update
    prerot = ordered and flags.prerot_enabled()
    if prerot:
        from ..ops.rope import rope_base_for, rope_inv_freq

        rot_if = rope_inv_freq(st.cfg.head_dim, rope_base_for(st.cfg))
        cache = _prerotate_cache(cache, st.cfg)
    else:
        rot_if = None
    inc_ranks = (st.streaming and not ordered
                 and (spec is None or spec.k == 1)
                 and flags.inc_ranks_enabled())
    # eviction folded into the forward's fused sidecar pass? (then the
    # separate evict_cache dispatch below is skipped — llama.decode_evict_
    # folded and the forward share the predicate, so they cannot disagree)
    fold_evict = llama.decode_evict_folded(st.cfg, cache, B, spec,
                                           st.streaming)
    # ordered-prerotated streaming: the sidecar kernel also compacts and
    # fused_kv_compact shifts K/V — evict_cache AND _compact_one fold away
    fold_stream = llama.decode_stream_folded(st.cfg, cache, B, spec,
                                             st.streaming, ordered, prerot)

    def cond(carry):
        _, _, _, n, done, _, _, _, _, _, _ = carry
        return (n < M) & ~jnp.all(done)

    def body(carry):
        cache, lastlog, key, n, done, out, g, kv_len, tps, confs, ranks = carry
        key, sub = jax.random.split(key)
        # Single-argsort nucleus sampling in the sorted domain (identical
        # distribution to logits_adapter+sample_token; A/B'd faster than a
        # top-k + lax.cond fast path, see RESULTS.md).
        token = sample_topp(sub, lastlog, temperature, top_p)
        out = out.at[:, n].set(jnp.where(done, -1, token))
        if st.collect_stats:
            # Reference decode-loop bookkeeping (easykv.py:261, 279): the
            # sampled token's raw (pre-top-p) probability and the step's
            # exp(-entropy) confidence of the raw temperature softmax.
            raw = jax.nn.softmax(
                lastlog.astype(jnp.float32) / jnp.maximum(temperature, 1e-9),
                axis=-1,
            )
            tp = jnp.take_along_axis(raw, token[:, None], axis=-1)[:, 0]
            tps = tps.at[:, n].set(jnp.where(done, 0.0, tp))
            confs = confs.at[:, n].set(
                jnp.where(done, 0.0, confidence(raw)))
        newly_done = done | _isin_eos(token, st.eos_token_ids)
        n = n + 1
        live = ~newly_done

        tok_pos = start_pos + g                                # (B,)
        if evict_mode == "budget":
            gate_b = live & (g + 1 > st.budget)                # easykv.py:302-303
            cinit = jnp.maximum(st.budget - g, 0).astype(jnp.float32)
        elif evict_mode == "always":
            gate_b = live                                      # easykv.py:670-748
            cinit = jnp.zeros((B,), jnp.float32)
        else:
            gate_b = jnp.zeros((B,), bool)
            cinit = jnp.zeros((B,), jnp.float32)

        u = jax.random.uniform(jax.random.fold_in(seed, n), (B,))
        if spec is not None and spec.policy == "random":
            if spec.phase == PHASE_DECODE:
                # uniform over retained generated tokens (easykv.py:353-362)
                n_gen = jnp.minimum(g + 1, st.budget + 1)
                rand_rank = (u * n_gen.astype(jnp.float32)).astype(jnp.int32)
            else:  # encdec decode: uniform over non-sink valid slots
                n_cand = jnp.maximum(kv_len + 1 - spec.sink_length, 1)
                rand_rank = (u * n_cand.astype(jnp.float32)).astype(jnp.int32)
        else:
            rand_rank = jnp.zeros((B,), jnp.int32)

        ctx = StepCtx(
            q_pos=jnp.where(live, tok_pos, -1)[:, None],
            token_valid=live[:, None],
            counter_init=cinit[:, None],
            next_pos=tok_pos + 1,
            prompt_len=prompt_len,
            evict_gate=gate_b,
            update_gate=live,
            rand_rank=rand_rank,
        )
        pos_pre = cache.pos
        logits, cache = llama.forward(
            params, st.cfg, cache, token[:, None], ctx, spec,
            streaming=st.streaming,
            ranks_all=ranks if inc_ranks else None,
            ordered=ordered, prerotated=prerot,
            fold_evict=fold_evict or fold_stream,
        )
        if inc_ranks:
            # new token's slot gets rank = pre-write valid count (uniform
            # across heads: every eviction removes exactly k per head)
            written = (cache.pos >= 0) & (pos_pre < 0)
            nv = jnp.sum((pos_pre[:, :, :1, :] >= 0).astype(jnp.int32),
                         axis=-1, keepdims=True)           # (L, B, 1, 1)
            ranks = jnp.where(written, nv, ranks)
        pos_mid = cache.pos
        if (spec is not None and spec.policy != "full"
                and not (fold_evict or fold_stream)):
            cache = evict_cache(cache, spec, ctx.next_pos, prompt_len,
                                rand_rank, gate_b)
            if ordered:
                cache = _compact_one(cache, pos_mid, rot_inv_freq=rot_if)
            if inc_ranks:
                # victim removed: every younger slot's rank drops by one
                evicted = (pos_mid >= 0) & (cache.pos < 0)
                rank_e = jnp.max(jnp.where(evicted, ranks, -1), axis=-1,
                                 keepdims=True)            # (L, B, H, 1)
                ranks = jnp.where(
                    (ranks > rank_e) & (rank_e >= 0) & ~evicted,
                    ranks - 1, ranks)
                ranks = jnp.where(evicted, 0, ranks)
        lastlog = jnp.where(newly_done[:, None], lastlog, logits[:, -1, :])
        g = g + live.astype(jnp.int32)
        k_evict = spec.k if spec is not None else 0
        kv_len = kv_len + live.astype(jnp.int32) - jnp.where(gate_b, k_evict, 0)
        return (cache, lastlog, key, n, newly_done, out, g, kv_len, tps,
                confs, ranks)

    out0 = jnp.full((B, M), -1, jnp.int32)
    key0 = jax.random.fold_in(seed, 7919)
    if inc_ranks:
        # one argsort total (prefill caches may be eviction-scrambled in
        # encoding/encdec modes); the loop keeps ranks current from there
        L_, B_, H_, S_ = cache.pos.shape
        ranks0 = llama._age_ranks(
            cache.pos.reshape(L_ * B_, H_, S_)).reshape(L_, B_, H_, S_)
    else:
        ranks0 = jnp.zeros((0,), jnp.int32)  # unused placeholder
    carry = (
        cache, first_logits, key0, jnp.int32(0), jnp.zeros((B,), bool),
        out0, jnp.zeros((B,), jnp.int32), kv_len0,
        jnp.zeros((B, M), jnp.float32), jnp.zeros((B, M), jnp.float32),
        ranks0,
    )
    (cache, _, key, n, done, out, g, kv_len, tps,
     confs, _) = jax.lax.while_loop(cond, body, carry)
    emitted = jnp.sum((out >= 0).astype(jnp.int32), axis=-1)
    return DecodeResult(out, emitted, kv_len, tps, confs)


def _engine_cache(st: EngineStatics, B: int, S: int) -> KVCache:
    """Engine-built KV cache; under a registered TP/DP mesh (st.tp) the
    buffer is sharding-constrained to cache_pspecs — KV heads on the model
    axis, batch on data — so eviction stays shard-local and GSPMD doesn't
    have to infer the layout from the attention ops.

    The slot count is rounded up to a multiple of 128 (TPU lane width):
    slot validity is `pos >= 0` and eviction is budget-gated, never
    capacity-gated, so spare slots are inert — but an unaligned S made the
    Pallas decode kernel wrapper jnp.pad-copy the ENTIRE K/V buffer every
    layer every step (~0.5 ms/step at 7B, half the budgeted-vs-full gap)."""
    S = ((S + 127) // 128) * 128
    cache = init_cache(
        st.cfg.num_hidden_layers, B, st.cfg.num_key_value_heads, S,
        st.cfg.head_dim, dtype=st.jdtype, quantized=st.kv_quant,
    )
    if st.tp is None:
        return cache
    mesh, d_ax, m_ax = st.tp
    from jax.sharding import NamedSharding

    from ..config import MeshConfig
    from ..parallel.sharding import cache_pspecs

    mc = MeshConfig(data=mesh.shape[d_ax], model=mesh.shape[m_ax],
                    axis_data=d_ax, axis_model=m_ax)
    specs = cache_pspecs(mc)
    return KVCache(*(
        jax.lax.with_sharding_constraint(x, NamedSharding(mesh, s))
        for x, s in zip(tuple(cache), tuple(specs))
    ))


# ---------------------------------------------------------------------------
# Mode drivers (jitted; EngineStatics is the static arg)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0,))
def _run_decoding(st: EngineStatics, params, ids_pad, prompt_len, temperature, top_p, seed):
    """kv_mode='decoding' (reference easykv.py:228-366)."""
    params = materialize_params(params)
    B = ids_pad.shape[0]
    gen_slots = st.max_new_tokens if st.policy == "full" else st.budget + 1
    S = st.length + gen_slots
    cache = _engine_cache(st, B, S)
    cache, last_logits = _prefill(st, params, cache, ids_pad, prompt_len, None, "zero")
    spec = st.decode_spec()
    res = _decode_loop(
        st, params, cache, last_logits, prompt_len, prompt_len, prompt_len,
        spec, seed, temperature, top_p,
        "none" if st.policy == "full" else "budget",
    )
    return res


@functools.partial(jax.jit, static_argnums=(0,))
def _run_encoding(st: EngineStatics, params, input_ids, temperature, top_p, seed):
    """kv_mode='encoding' (reference easykv.py:367-529): strided prefill
    eviction, then plain decode without eviction."""
    params = materialize_params(params)
    B = input_ids.shape[0]
    S = st.idx + st.stride + st.max_new_tokens
    cache = _engine_cache(st, B, S)
    spec = st.encode_spec()
    prefix_len = jnp.full((B,), st.r_idx, jnp.int32)
    boot = spec if st.keep_attention else None
    cache, last_logits = _prefill(
        st, params, cache, input_ids[:, : st.r_idx], prefix_len, boot, "encode"
    )
    cache, last_logits, _, kv_len = _strided_encode(
        st, params, cache, input_ids, spec, seed, collect_ppl=False,
        last_logits0=last_logits,
    )
    length = jnp.full((B,), st.length, jnp.int32)
    res = _decode_loop(
        st, params, cache, last_logits, length, length, kv_len,
        None, seed, temperature, top_p, "none",
    )
    return res, kv_len


@functools.partial(jax.jit, static_argnums=(0,))
def _run_encdec(st: EngineStatics, params, input_ids, temperature, top_p, seed):
    """kv_mode='encoding_decoding' (reference easykv.py:530-753): strided
    prefill eviction, then per-step eviction through decode."""
    params = materialize_params(params)
    B = input_ids.shape[0]
    S = st.idx + st.stride
    cache = _engine_cache(st, B, S)
    enc_spec = st.encode_spec()
    prefix_len = jnp.full((B,), st.r_idx, jnp.int32)
    boot = enc_spec if st.keep_attention else None
    cache, last_logits = _prefill(
        st, params, cache, input_ids[:, : st.r_idx], prefix_len, boot, "encode"
    )
    cache, last_logits, _, kv_len = _strided_encode(
        st, params, cache, input_ids, enc_spec, seed, collect_ppl=False,
        last_logits0=last_logits,
    )
    length = jnp.full((B,), st.length, jnp.int32)
    res = _decode_loop(
        st, params, cache, last_logits, length, length, kv_len,
        st.encdec_decode_spec(), seed, temperature, top_p, "always",
    )
    return res


@functools.partial(jax.jit, static_argnums=(0,))
def _run_ppl(st: EngineStatics, params, input_ids, seed):
    """kv_mode='ppl', budgeted path (reference easykv.py:766-901)."""
    params = materialize_params(params)
    B = input_ids.shape[0]
    S = st.idx + st.stride
    cache = _engine_cache(st, B, S)
    spec = st.encode_spec()
    prefix_len = jnp.full((B,), st.r_idx, jnp.int32)
    boot = spec if st.keep_attention else None
    cache, _ = _prefill(
        st, params, cache, input_ids[:, : st.r_idx], prefix_len, boot, "encode"
    )
    cache, _, loss_sum, kv_len = _strided_encode(
        st, params, cache, input_ids, spec, seed, collect_ppl=True
    )
    count = st.length - st.r_idx - 1
    return loss_sum / count, kv_len


@functools.partial(jax.jit, static_argnums=(0,))
def _run_ppl_full(st: EngineStatics, params, input_ids):
    """kv_mode='ppl', full-cache path (reference easykv.py:759-765):
    chunked teacher forcing over the whole document."""
    params = materialize_params(params)
    B, L = input_ids.shape
    PC = min(PREFILL_CHUNK, _round_up(L, 8))
    L_pad = _round_up(L, PC)
    ids = jnp.pad(input_ids, ((0, 0), (0, L_pad - L)))
    cache = _engine_cache(st, B, L_pad)
    true_len = jnp.full((B,), L, jnp.int32)
    if flags.layer_major_enabled():
        n = L_pad // PC
        pos = jnp.asarray(
            np.arange(n)[:, None] * PC + np.arange(PC)[None, :], jnp.int32
        )
        posb = jnp.broadcast_to(pos[:, None, :], (n, B, PC))
        tok_valid = posb < true_len[None, :, None]
        ctxs = StepCtx(
            q_pos=jnp.where(tok_valid, posb, -1),
            token_valid=tok_valid,
            counter_init=jnp.zeros((n, B, PC), jnp.float32),
            next_pos=jnp.minimum(
                (jnp.arange(n, dtype=jnp.int32)[:, None] + 1) * PC,
                true_len[None, :],
            ),
            prompt_len=jnp.broadcast_to(true_len[None, :], (n, B)),
            evict_gate=jnp.zeros((n, B), bool),
            update_gate=jnp.ones((n, B), bool),
            rand_rank=jnp.zeros((n, B), jnp.int32),
        )
        h, _ = llama.prefill_layer_major(params, st.cfg, cache, ids, ctxs, None)
        loss_sum = _ce_from_hidden(st, params, h, ids, true_len=true_len)
        return loss_sum / (L - 1)

    def body(i, carry):
        cache, last_logits, loss_sum = carry
        start = i * PC
        chunk = jax.lax.dynamic_slice_in_dim(ids, start, PC, axis=1)
        pos = start + jnp.arange(PC, dtype=jnp.int32)[None, :]
        tok_valid = pos < true_len[:, None]
        ctx = StepCtx(
            q_pos=jnp.where(tok_valid, pos, -1),
            token_valid=tok_valid,
            counter_init=jnp.zeros((B, PC), jnp.float32),
            next_pos=jnp.minimum(start + PC, true_len),
            prompt_len=true_len,
            evict_gate=jnp.zeros((B,), bool),
            update_gate=jnp.zeros((), bool),
            rand_rank=jnp.zeros((B,), jnp.int32),
        )
        # full-cache ppl: the reference runs the whole doc through stock
        # attention before any patching (easykv.py:760-765) — never streaming
        logits, cache = llama.forward(
            params, st.cfg, cache, chunk, ctx, None, streaming=False
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce_intra = -jnp.take_along_axis(
            logp[:, :-1, :], chunk[:, 1:, None], axis=-1
        )[..., 0]
        mask_intra = tok_valid[:, 1:].astype(jnp.float32)
        loss = jnp.sum(ce_intra * mask_intra, axis=-1)
        prev_logp = jax.nn.log_softmax(last_logits, axis=-1)
        ce_cross = -jnp.take_along_axis(prev_logp, chunk[:, :1], axis=-1)[:, 0]
        loss = loss + jnp.where((i > 0) & tok_valid[:, 0], ce_cross, 0.0)
        loss_sum = loss_sum + loss
        # carry the last *valid* row's logits
        is_last_of_chunk = tok_valid & (
            (pos == true_len[:, None] - 1) | (pos == start + PC - 1)
        )
        any_valid = jnp.any(tok_valid, axis=1, keepdims=True)
        idx_last = jnp.sum(tok_valid.astype(jnp.int32), axis=1) - 1
        row = jnp.take_along_axis(
            logits, jnp.maximum(idx_last, 0)[:, None, None], axis=1
        )[:, 0, :]
        last_logits = jnp.where(any_valid, row, last_logits)
        return cache, last_logits, loss_sum

    init = (cache, jnp.zeros((B, st.cfg.vocab_size), jnp.float32),
            jnp.zeros((B,), jnp.float32))
    _, _, loss_sum = jax.lax.fori_loop(0, L_pad // PC, body, init)
    return loss_sum / (L - 1)


# ---------------------------------------------------------------------------
# Public API (reference enable_fixed_kv, easykv.py:903-908)
# ---------------------------------------------------------------------------

class CausalLM:
    """Model wrapper binding config + params (+ optional tokenizer/mesh)."""

    def __init__(self, cfg: ModelConfig, params, tokenizer=None, dtype="float32",
                 kv_quant: bool = False):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.dtype = str(jnp.dtype(dtype))
        self.kv_quant = kv_quant  # int8 compressed-KV cache

    # bound by enable_fixed_kv:
    easykv_generate = None
    easykv_ppl = None


def enable_fixed_kv(model: CausalLM, tokenizer, mode: str, stride: int = 1,
                    verbose: bool = False) -> CausalLM:
    """Bind easykv_generate / easykv_ppl onto the model
    (reference easykv.py:903-908)."""
    model.tokenizer = tokenizer
    model.easykv_generate = functools.partial(
        generate, model, kv_mode=mode, stride=stride, report_decoding_latency=verbose
    )
    model.easykv_ppl = functools.partial(generate, model, kv_mode="ppl", stride=stride)
    print(f"Fixed KV Cache for {mode} enabled")
    return model


def set_dynamicntk_rope_length(model: CausalLM, max_length: int) -> None:
    """Pin the DynamicNTK RoPE base to `max_length`
    (reference utils.py:53-57)."""
    model.cfg = dataclasses.replace(model.cfg, rope_ntk_length=max_length)


def _as_batch(input_ids) -> np.ndarray:
    arr = np.asarray(input_ids)
    if arr.ndim == 1:
        arr = arr[None, :]
    return arr.astype(np.int32)


def generate(
    model: CausalLM,
    input_ids,
    generation_config,
    kv_mode: str = "encoding",
    stride: int = 1,
    report_decoding_latency: bool = False,
):
    """Reference-parity entry point (reference easykv.py:199-901).

    Returns the decoded string (if a tokenizer is attached) or the list of
    generated token ids; kv_mode='ppl' returns the perplexity float.
    """
    if isinstance(generation_config, GenerationConfig):
        gc = generation_config
    else:
        gc = GenerationConfig.from_dict(dict(generation_config))
    gc = gc.with_policy()
    ids = _as_batch(input_ids)
    B, length = ids.shape
    eos = gc.eos_token_ids
    if not eos and model.tokenizer is not None:
        tok_eos = getattr(model.tokenizer, "eos_token_id", None)
        if tok_eos is not None:
            eos = (int(tok_eos),)

    budget = gc.budget
    mode = kv_mode
    if mode == "auto":
        # reference easykv.py:220-227
        assert isinstance(budget, int), "auto mode requires an integer budget"
        if budget > length:
            mode = "decoding"
            budget = budget - length
        else:
            mode = "encoding_decoding"

    base = dict(
        collect_stats=report_decoding_latency,
        cfg=model.cfg, policy=gc.kv_policy, stride=stride,
        eos_token_ids=tuple(eos), temp_length=gc.temp_length,
        keep_attention=gc.keep_attention, streaming=gc.streaming,
        dtype=model.dtype, max_new_tokens=gc.max_new_tokens,
        kv_quant=getattr(model, "kv_quant", False),
        sp=flags.sp_mesh(),
        tp=flags.active_mesh(),
        pallas=(flags.pallas_enabled(), flags.sidecar_enabled(),
                flags.layer_major_enabled(), flags.chunk_kernel_mode(),
                flags.encode_unroll(), flags.dense_write_enabled(),
                flags.step_kernel_enabled(), flags.mega_kernel_enabled(),
                flags.w4a_kernel_enabled(), flags.pallas_interpret(),
                flags.inc_ranks_enabled(), flags.mega_batch_enabled()),
    )
    seed = jax.random.PRNGKey(gc.seed)
    temp = jnp.float32(gc.temperature)
    top_p = jnp.float32(gc.top_p)

    if mode == "decoding":
        assert isinstance(budget, int) or gc.kv_policy == "full", (
            "decoding mode requires an integer budget"
        )
        b = int(budget)
        P_pad = _round_up(length, 64)
        st = EngineStatics(
            mode="decoding", length=P_pad, budget=b, idx=0, r_idx=0,
            recent_window_dec=int(b * 0.3),  # reference easykv.py:308 quirk
            **base,
        )
        ids_pad = np.zeros((B, P_pad), np.int32)
        ids_pad[:, :length] = ids
        prompt_len = jnp.full((B,), length, jnp.int32)
        t0 = time.time()
        res = _run_decoding(st, model.params, jnp.asarray(ids_pad), prompt_len, temp, top_p, seed)
        res = jax.tree.map(np.asarray, jax.device_get(res))
        dt = time.time() - t0
        retained = int(res.kv_len[0]) - length
        n_out = int(res.n_tokens[0])
        if n_out:
            print(
                f"KV cache budget ratio: {retained / n_out * 100:.2f}%"
                f"({retained}/{n_out})"
            )
        if report_decoding_latency:
            print(f"Per-step decoding latency: {dt / max(n_out, 1):.3f}")
            _report_confidence(res)
        return _finalize(model, res)

    if mode in ("encoding", "ppl") and _is_full_budget(budget, length):
        if mode == "ppl":
            loss = _run_ppl_full(
                EngineStatics(mode="ppl", length=length, budget=length, **base),
                model.params, jnp.asarray(ids),
            )
            return float(np.exp(np.asarray(loss)[0]))
        # full-cache encoding: no eviction at all (reference easykv.py:372-377)
        st = EngineStatics(
            mode="encoding", length=length, budget=length,
            idx=length + stride, r_idx=length,
            **{**base, "policy": "full"},
        )
        res, kv_len = _run_encoding(st, model.params, jnp.asarray(ids), temp, top_p, seed)
        res = jax.tree.map(np.asarray, jax.device_get(res))
        print(
            f"KV cache budget ratio: {length / length * 100:.2f}%({length}/{length})"
        )
        return _finalize(model, res)

    if mode in ("encoding", "ppl"):
        # reference easykv.py:385-392 budget resolution
        b = int(length * budget) + stride if isinstance(budget, float) else int(budget) + stride
        if mode == "ppl":
            # the ppl branch uses the ASCENDING r_idx scan (tiny prefix),
            # like encoding_decoding — reference easykv.py:777-780
            idx, r_idx = stride_align_encdec(length, b, stride)
        else:
            idx, r_idx = stride_align(length, b, stride)
        if (length - r_idx) % stride != 0:
            raise ValueError(
                f"length={length}, stride={stride}, budget={budget}: prefix "
                f"remainder not stride-aligned (idx={idx}, r_idx={r_idx})"
            )
        st = EngineStatics(
            mode=mode, length=length, budget=b, idx=idx, r_idx=r_idx,
            recent_window=int(b * gc.recent_ratio),
            recent_window_dec=int(b * 0.3),
            **base,
        )
        if mode == "ppl":
            loss, kv_len = _run_ppl(st, model.params, jnp.asarray(ids), seed)
            kv = int(np.asarray(kv_len)[0])
            print(f"KV cache budget ratio: {kv / length * 100:.2f}%({kv}/{length})")
            return float(np.exp(np.asarray(loss)[0]))
        t0 = time.time()
        res, kv_len = _run_encoding(st, model.params, jnp.asarray(ids), temp, top_p, seed)
        res = jax.tree.map(np.asarray, jax.device_get(res))
        kv = int(np.asarray(kv_len)[0])
        print(f"KV cache budget ratio: {kv / length * 100:.2f}%({kv}/{length})")
        if report_decoding_latency:
            n_out = int(res.n_tokens[0])
            print(f"Per-step decoding latency: {(time.time()-t0) / max(n_out,1):.3f}")
            _report_confidence(res)
        return _finalize(model, res)

    if mode == "encoding_decoding":
        assert isinstance(budget, int) and budget <= length, (
            "encoding_decoding requires int budget <= prompt length"
        )
        white = ["random", "recency", "tova", "roco"]
        assert gc.kv_policy in white, (
            f"mode must be within {white}, get {gc.kv_policy} instead"
        )  # reference easykv.py:536-537
        b = budget + stride
        if b >= length:
            b -= stride
        idx, r_idx = stride_align_encdec(length, b, stride)
        st = EngineStatics(
            mode=mode, length=length, budget=b, idx=idx, r_idx=r_idx,
            recent_window=int(b * gc.recent_ratio),
            recent_window_dec=int(b * 0.3),
            **base,
        )
        res = _run_encdec(st, model.params, jnp.asarray(ids), temp, top_p, seed)
        res = jax.tree.map(np.asarray, jax.device_get(res))
        kv = int(res.kv_len[0])
        n_out = int(res.n_tokens[0])
        print(
            f"KV Cache Budget ratio {kv / (length + n_out) * 100:.2f}%"
            f"[{kv}/({length}+{n_out})]"
        )
        return _finalize(model, res)

    raise ValueError(f"unknown kv_mode {kv_mode!r}")


def _is_full_budget(budget, length) -> bool:
    return (isinstance(budget, float) and budget >= 1.0) or (
        isinstance(budget, int) and budget >= length
    )


def _report_confidence(res: DecodeResult) -> None:
    """Verbose per-run summary of the reference's decode-loop bookkeeping
    (easykv.py:261 token_probs, :279 cache_cur_probs exp(-entropy))."""
    if res.confidence is None or not np.asarray(res.confidence).any():
        return
    emitted = np.asarray(res.out_ids)[0] >= 0
    if not emitted.any():
        return
    conf = np.asarray(res.confidence)[0][emitted]
    tp = np.asarray(res.token_probs)[0][emitted]
    print(
        f"Decoding confidence exp(-entropy): mean {conf.mean():.4f} "
        f"min {conf.min():.4f}; token prob: mean {tp.mean():.4f} "
        f"min {tp.min():.4f}"
    )


def _finalize(model: CausalLM, res: DecodeResult):
    ids = [int(t) for t in np.asarray(res.out_ids)[0] if t >= 0]
    if model.tokenizer is not None:
        return model.tokenizer.decode(ids, skip_special_tokens=True).strip()
    return ids
