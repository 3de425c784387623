"""LLaMa-family decoder (covers LLaMa/LLaMa2/Vicuna/TinyLlama and
Mistral/Zephyr via ModelConfig: GQA + optional sliding window) as a pure
functional JAX forward over the budgeted KV ring buffer.

Architecture parity targets the stock HF modules the reference patches
(reference llama_patch.py:125-248, mistral_patch.py:90-186): RMSNorm,
rotary attention with fp32 softmax, SwiGLU MLP. Unlike the reference, the
whole model is one `lax.scan` over stacked layer parameters, and the
score-update + eviction for each layer's cache happens inside the scan body
— there is no per-layer Python loop and no attention-map materialization
(reference easykv.py:271-300 does O(L) host-driven tensor ops per token).

Evicting layer l's cache immediately after layer l's attention (instead of
after the full forward like the reference) is semantically identical: each
layer's cache is only read by that layer, once per step.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..cache import (
    KVCache,
    LayerCache,
    free_slot_ids,
    kv_dequant,
    quantize_kv,
    write_tokens,
    write_tokens_at,
    write_tokens_dense,
    write_tokens_slice,
)
from ..config import ModelConfig
from ..ops.attention import attend, attend_inflight
from ..ops.quant import mm
from ..ops.rope import apply_rope, rope_base_for, rope_inv_freq
from ..policies import PolicySpec, update_scores, update_scores_reduced

Params = Dict[str, Any]

# Kernel-selection flags live in flags.py; re-exported here for convenience.
from .. import flags  # noqa: E402
from ..flags import pallas_enabled as _pallas_enabled  # noqa: E402
from ..flags import use_pallas  # noqa: E402,F401

# Fused chunk kernel (ops/pallas/chunk_attention): default 'auto' = on for
# int8-KV caches, where it streams K/V at half the bytes with dequant folded
# on-chip (+5% strided roco, +58% wide-chunk full prefill at 7B); on bf16 KV
# it measured neutral-to-negative, so auto leaves XLA's fused attend there.
# Toggle via flags.use_chunk_kernel / EASYKV_TPU_CHUNK_KERNEL (RESULTS.md
# "Chunk-attention kernel A/B").


class StepCtx(NamedTuple):
    """Dynamic per-chunk context threaded through the layer scan.

    All leaves are arrays; the static knobs live in PolicySpec / flags on
    forward()."""

    q_pos: jax.Array         # (B, C) position ids; -1 marks padding queries
    token_valid: jax.Array   # (B, C) bool
    counter_init: jax.Array  # (B, C) f32 initial observation counters
    next_pos: jax.Array      # (B,) position the *next* token would get
    prompt_len: jax.Array    # (B,)
    evict_gate: jax.Array    # (B,) bool: run an eviction event this chunk
    update_gate: jax.Array   # scalar or (B,) bool: apply score updates
    rand_rank: jax.Array     # (B,) pre-drawn rank for the random policy


def init_params(cfg: ModelConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    """Random init (scaled normal) with HF LLaMa weight layout, stacked over
    layers for lax.scan."""
    L, D, F = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    Hq, Hkv, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    V = cfg.vocab_size
    ks = jax.random.split(key, 8)

    def norm(k, shape, fan_in):
        return (jax.random.normal(k, shape, jnp.float32) * (fan_in ** -0.5)).astype(dtype)

    params = {
        "embed": norm(ks[0], (V, D), D),
        "final_norm": jnp.ones((D,), dtype),
        "layers": {
            "wq": norm(ks[1], (L, D, Hq * Dh), D),
            "wk": norm(ks[2], (L, D, Hkv * Dh), D),
            "wv": norm(ks[3], (L, D, Hkv * Dh), D),
            "wo": norm(ks[4], (L, Hq * Dh, D), Hq * Dh),
            "wg": norm(ks[5], (L, D, F), D),
            "wu": norm(ks[6], (L, D, F), D),
            "wd": norm(ks[7], (L, F, D), F),
            "ln_attn": jnp.ones((L, D), dtype),
            "ln_mlp": jnp.ones((L, D), dtype),
        },
    }
    if cfg.attention_bias:
        bk = jax.random.split(jax.random.fold_in(key, 7), 3)
        params["layers"]["bq"] = norm(bk[0], (L, Hq * Dh), Hq * Dh)
        params["layers"]["bk"] = norm(bk[1], (L, Hkv * Dh), Hkv * Dh)
        params["layers"]["bv"] = norm(bk[2], (L, Hkv * Dh), Hkv * Dh)
    if not cfg.tie_word_embeddings:
        params["lm_head"] = norm(jax.random.fold_in(key, 99), (D, V), D)
    return params


def _qkv(x: jax.Array, p, name: str) -> jax.Array:
    """Q/K/V projection with the optional attention bias (Qwen2-style:
    q/k/v biased, o unbiased — ModelConfig.attention_bias)."""
    y = mm(x, p["w" + name])
    if "b" + name in p:
        y = y + p["b" + name].astype(y.dtype)
    return y


def _proj_qkv(x, p, B, C, Hq, Hkv, Dh):
    """(q (B,Hq,C,Dh), k, v) from either the split wq/wk/wv tree or the
    fused single-GEMV wqkv layout (ops.quant.fuse_gemv_params)."""
    if "wqkv" in p:
        y = mm(x, p["wqkv"])
        if "bqkv" in p:
            y = y + p["bqkv"].astype(y.dtype)
        nq, nk = Hq * Dh, Hkv * Dh
        q, k, v = y[..., :nq], y[..., nq : nq + nk], y[..., nq + nk :]
    else:
        q, k, v = _qkv(x, p, "q"), _qkv(x, p, "k"), _qkv(x, p, "v")
    return (
        q.reshape(B, C, Hq, Dh).transpose(0, 2, 1, 3),
        k.reshape(B, C, Hkv, Dh).transpose(0, 2, 1, 3),
        v.reshape(B, C, Hkv, Dh).transpose(0, 2, 1, 3),
    )


def _mlp(x2, p):
    """SwiGLU MLP; wgu is the fused gate|up single-GEMV layout."""
    if "wgu" in p:
        gu = mm(x2, p["wgu"])
        F = gu.shape[-1] // 2
        return mm(jax.nn.silu(gu[..., :F]) * gu[..., F:], p["wd"])
    return mm(jax.nn.silu(mm(x2, p["wg"])) * mm(x2, p["wu"]), p["wd"])


def rmsnorm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w


def _use_chunk_kernel(cfg: ModelConfig, S: int, C: int, kv_itemsize: int,
                      B: int) -> bool:
    """Trace-time gate for the fused chunk-attention kernel (the wrapper
    picks 1-pass vs 2-pass flash per shape). In 'auto' mode the kernel is
    used only for quantized (int8) KV — the measured-win regime; see
    flags.chunk_kernel_mode(). Under an active mesh the kernel runs via
    shard_map (batch over data, KV heads over model), which needs even
    shards."""
    mode = flags.chunk_kernel_mode()
    if mode == "off":
        return False
    if mode == "auto" and kv_itemsize != 1:
        return False
    mi = flags.active_mesh()
    if mi is not None and mi[0].size > 1:
        dsz = mi[0].shape.get(mi[1], 1)
        msz = mi[0].shape.get(mi[2], 1)
        if B % dsz != 0 or cfg.num_key_value_heads % msz != 0:
            return False
    return True


def _chunk_attend(cl, q_c, q_pos, need_scores: bool, window=None):
    """fused_chunk_attend with mesh dispatch: direct pallas_call on a single
    device, shard_map over (data, model) under an active mesh."""
    from ..ops.pallas.chunk_attention import (
        fused_chunk_attend,
        fused_chunk_attend_sharded,
    )

    kw = dict(
        k_scale=cl.k_scale if cl.quantized else None,
        v_scale=cl.v_scale if cl.quantized else None,
        need_scores=need_scores, sliding_window=window,
        interpret=flags.pallas_interpret(),
    )
    mi = flags.active_mesh()
    if mi is not None and mi[0].size > 1:
        return fused_chunk_attend_sharded(
            q_c, cl.k, cl.v, cl.pos, q_pos,
            mesh=mi[0], data_axis=mi[1], model_axis=mi[2], **kw,
        )
    return fused_chunk_attend(q_c, cl.k, cl.v, cl.pos, q_pos, **kw)


def _chunk_write_attend(cl, q_c, k_c, v_c, q_pos, counter_init, ids,
                        need_scores: bool, window=None):
    """fused_chunk_write_attend (write + 1-pass attend in one kernel) with
    mesh dispatch, returning (out, ssum, ssq, last, new LayerCache)."""
    from ..ops.pallas.chunk_attention import (
        fused_chunk_write_attend,
        fused_chunk_write_attend_sharded,
    )

    kw = dict(
        k_scale=cl.k_scale if cl.quantized else None,
        v_scale=cl.v_scale if cl.quantized else None,
        need_scores=need_scores, sliding_window=window,
        interpret=flags.pallas_interpret(),
    )
    args = (q_c, k_c, v_c, ids, q_pos, counter_init,
            cl.k, cl.v, cl.pos, cl.score, cl.score_sq, cl.counter)
    mi = flags.active_mesh()
    if mi is not None and mi[0].size > 1:
        res = fused_chunk_write_attend_sharded(
            *args, mesh=mi[0], data_axis=mi[1], model_axis=mi[2], **kw)
    else:
        res = fused_chunk_write_attend(*args, **kw)
    out, ssum, ssq, last = res[:4]
    arrs = res[4]
    scales = arrs[6:8] if cl.quantized else (cl.k_scale, cl.v_scale)
    new_cl = LayerCache(*(arrs[:6] + tuple(scales)))
    return out, ssum, ssq, last, new_cl


def _chunk_step(cl, q_c, k_c, v_c, ctx: StepCtx, wm, next_start, spec,
                B: int, window=None):
    """fused_chunk_step (write + attend + score update + evict in one
    kernel) with mesh dispatch. Returns (out, new LayerCache, next write
    mask)."""
    from ..ops.pallas.chunk_attention import (
        fused_chunk_step,
        fused_chunk_step_sharded,
    )

    ug = jnp.broadcast_to(jnp.atleast_1d(ctx.update_gate), (B,))
    eg = jnp.broadcast_to(jnp.atleast_1d(ctx.evict_gate), (B,))
    kw = dict(
        k_scale=cl.k_scale if cl.quantized else None,
        v_scale=cl.v_scale if cl.quantized else None,
        policy=spec.policy, feasible_k=spec.feasible_k,
        sink=spec.sink_length, recent_window=spec.recent_window,
        sliding_window=window, interpret=flags.pallas_interpret(),
    )
    args = (q_c, k_c, v_c, wm, ctx.q_pos, ctx.counter_init, ug, eg,
            ctx.next_pos, next_start, cl.k, cl.v, cl.pos, cl.score,
            cl.score_sq, cl.counter)
    mi = flags.active_mesh()
    if mi is not None and mi[0].size > 1:
        out, arrs, wm_next = fused_chunk_step_sharded(
            *args, mesh=mi[0], data_axis=mi[1], model_axis=mi[2], **kw)
    else:
        out, arrs, wm_next = fused_chunk_step(*args, **kw)
    scales = arrs[6:8] if cl.quantized else (cl.k_scale, cl.v_scale)
    return out, LayerCache(*(arrs[:6] + tuple(scales))), wm_next


def forward(
    params: Params,
    cfg: ModelConfig,
    cache: KVCache,
    token_ids: jax.Array,        # (B, C) int32
    ctx: StepCtx,
    spec: Optional[PolicySpec],  # None => plain append, no scores/eviction
    *,
    bootstrap: bool = False,     # keep_attention prefix accumulation
    streaming: bool = False,     # cache-relative RoPE (StreamingLLM mode)
    ranks_all: Optional[jax.Array] = None,  # (L, B, Hkv, S) precomputed age
                                 # ranks (streaming decode; skips the argsort)
    ordered: bool = False,       # streaming decode over an age-ORDERED cache
                                 # (engine compacts on evict): rank == slot,
                                 # no ranks at all, no pick dots in-kernel
    prerotated: bool = False,    # ordered cache stores K already rotated by
                                 # its slot index (flags.prerot_enabled):
                                 # attention reads K with no rotation at all
    fold_evict: bool = False,    # OPT-IN: apply the step's gated eviction
                                 # inside the fused sidecar pass (caller
                                 # must then skip evict_cache; the engine
                                 # decides via decode_evict_folded). Default
                                 # off so forward+evict_cache callers keep
                                 # two-phase semantics.
) -> Tuple[jax.Array, KVCache]:
    """One chunk through all layers. Returns (logits (B, C, V) f32, new cache)."""
    B, C = token_ids.shape
    if C == 1 and not bootstrap:
        # Late-write decode fast path: the new token's K/V joins attention
        # in-flight; all layers' cache writes collapse into one batched
        # scatter after the scan (8 scatters + 1 select per STEP instead of
        # per LAYER — the write-scatter/free-slot small-ops were the top
        # diagnosed decode overhead, RESULTS.md "Known headroom").
        # Streaming (cache-relative RoPE) rides the same path since r3: the
        # cached K stays raw, rotation happens at attend time by age rank
        # (in-kernel table-pick on TPU), and the per-layer argsorts collapse
        # into one batched rank computation (VERDICT r2 next #5).
        return _decode_forward(params, cfg, cache, token_ids, ctx, spec,
                               streaming=streaming, ranks_all=ranks_all,
                               ordered=ordered, prerotated=prerotated,
                               fold_evict=fold_evict)
    Hq, Hkv, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    inv_freq = rope_inv_freq(cfg.head_dim, rope_base_for(cfg))
    scale = cfg.head_dim ** -0.5

    h = jnp.take(params["embed"], jnp.maximum(token_ids, 0), axis=0)

    def layer(h, xs):
        p, cl = xs
        cl = LayerCache(*cl)
        x = rmsnorm(h, p["ln_attn"], cfg.rms_norm_eps)
        q, k, v = _proj_qkv(x, p, B, C, Hq, Hkv, Dh)

        if not streaming:
            # Non-streaming: keys stored post-RoPE at their true positions;
            # position ids keep increasing past the physical budget
            # (reference llama_patch.py:186-191).
            q = apply_rope(q, ctx.q_pos[:, None, :], inv_freq)
            k = apply_rope(k, ctx.q_pos[:, None, :], inv_freq)

        cl = write_tokens(cl, k, v, ctx.q_pos, ctx.counter_init, ctx.token_valid)

        if streaming:
            # StreamingLLM-style cache-relative positions: keys are cached
            # pre-RoPE and rotated by their *age rank* at attend time
            # (reference llama_patch.py:251-379, apply_rotary_pos_emb_sep).
            k_raw, v_raw = kv_dequant(cl, h.dtype)
            ranks = _age_ranks(cl.pos)                        # (B, Hkv, S)
            k_att = apply_rope(k_raw, ranks, inv_freq)
            n_valid = jnp.sum((cl.pos >= 0)[:, 0, :], axis=-1)  # (B,)
            q_off = jnp.cumsum(ctx.token_valid.astype(jnp.int32), axis=-1) - 1
            q_rel = n_valid[:, None] - jnp.sum(
                ctx.token_valid.astype(jnp.int32), axis=-1, keepdims=True
            ) + q_off
            q_att = apply_rope(q, q_rel[:, None, :], inv_freq)
            out, probs_kv = attend(
                q_att, k_att, v_raw, cl.pos, ctx.q_pos,
                sliding_window=cfg.sliding_window, scale=scale,
            )
        elif C == 1 and _pallas_enabled():
            # Fused decode path: one HBM pass over K/V (int8 if the cache is
            # quantized), probs emitted on-chip (ops/pallas/decode_attention).
            # Sliding-window (Mistral) is in-kernel since r4.
            from ..ops.pallas import fused_decode_attend

            out, probs_kv = fused_decode_attend(
                q, cl.k, cl.v, cl.pos, ctx.q_pos[:, 0],
                k_scale=cl.k_scale if cl.quantized else None,
                v_scale=cl.v_scale if cl.quantized else None,
                sliding_window=cfg.sliding_window,
            )
        elif _use_chunk_kernel(cfg, cl.k.shape[2], C, cl.k.dtype.itemsize, B):
            # Fused chunk path (strided encoding / prefill): flash attention
            # + on-chip score reduction (ops/pallas/chunk_attention.py);
            # int8-KV caches stream at half the bytes with dequant folded in.
            need_scores = spec is not None and (
                bootstrap or spec.policy in ("h2o_head", "roco", "tova")
            )
            out, ssum, ssq, last = _chunk_attend(cl, q, ctx.q_pos,
                                                 need_scores,
                                                 window=cfg.sliding_window)
            probs_kv = None
            if need_scores:
                cl = update_scores_reduced(
                    cl, ssum, ssq, last, spec, ctx.update_gate,
                    bootstrap=bootstrap,
                )
        else:
            k_raw, v_raw = kv_dequant(cl, h.dtype)
            out, probs_kv = attend(
                q, k_raw, v_raw, cl.pos, ctx.q_pos,
                sliding_window=cfg.sliding_window, scale=scale,
            )

        if (probs_kv is not None and spec is not None
                and (bootstrap or spec.policy not in ("full",))):
            cl = update_scores(cl, probs_kv, spec, ctx.update_gate, bootstrap=bootstrap)
        # Eviction is NOT done here: the engine applies one vectorized
        # eviction event across all layers after the forward
        # (policies.evict_cache) — same ordering as the reference.

        attn_out = out.transpose(0, 2, 1, 3).reshape(B, C, Hq * Dh)
        h = h + mm(attn_out, p["wo"])
        x2 = rmsnorm(h, p["ln_mlp"], cfg.rms_norm_eps)
        h = h + _mlp(x2, p)
        return h, tuple(cl)

    h, new_cache = jax.lax.scan(layer, h, (params["layers"], tuple(cache)))
    return _logits_tail(h, params, cfg), KVCache(*new_cache)


def strided_encode_layer_major(
    params: Params,
    cfg: ModelConfig,
    cache: KVCache,
    token_ids: jax.Array,   # (B, T), T = n_chunks * stride
    ctxs: StepCtx,          # every leaf stacked with a leading (n_chunks,) axis
    spec,                   # PolicySpec (may be policy='full')
    write_start: jax.Array,  # (n_chunks, B) int32: kv_len before each chunk
) -> Tuple[jax.Array, KVCache]:
    """Strided encoding with per-chunk eviction, restructured layer-major:
    per layer, the QKV projection and the MLP run over ALL chunks in one
    matmul, and only the weight-free cache ops (attend, score update,
    eviction) iterate chunk-by-chunk in an inner scan.

    Semantically identical to chunking the whole forward (engine
    _strided_encode -> forward per chunk; reference easykv.py:426-499):
    layer l's cache trajectory depends only on layer l's own scores, and the
    hidden states are teacher-forced (chunk j's input to layer l+1 is layer
    l's output for chunk j, independent of later evictions at layer l).
    Verified token/slot-exact vs the chunk-major path in
    tests/test_layer_major.py.

    Why: the chunk-major encode is bound by the per-chunk weight pass — a
    stride-wide (M=24..96) matmul streams int8 weights at ~280 GB/s on v5e,
    ~3x off spec, and every chunk re-reads all 6.7 GB (RESULTS.md "Encode
    diagnosis"). Batching the projections over T rows runs them near
    compute-bound and cuts weight traffic by the chunk count.

    Returns (h (B, T, D) final hidden states BEFORE final_norm, cache) —
    the engine derives last-token logits and the teacher-forced CE from h.
    Non-streaming only (the engine falls back for streaming=True).
    """
    B, T = token_ids.shape
    n = ctxs.next_pos.shape[0]
    C = T // n
    Hq, Hkv, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    inv_freq = rope_inv_freq(cfg.head_dim, rope_base_for(cfg))
    scale = cfg.head_dim ** -0.5
    evicting = spec is not None and spec.policy != "full"
    q_pos_flat = ctxs.q_pos.transpose(1, 0, 2).reshape(B, T)
    S = cache.k.shape[-2]
    use_ck = _use_chunk_kernel(cfg, S, C, cache.k.dtype.itemsize, B)
    # Fused write+attend: one kernel pass for the whole chunk body (the
    # scatter-write was 70% of the strided phase before the dense write;
    # the fusion removes the separate write op and the extra K/V HBM pass).
    rep = Hq // Hkv
    from ..ops.pallas.chunk_attention import wa_fits

    # The wrapper dispatches internally: one-pass whole-block under the VMEM
    # cap, S-tiled flash write+attend beyond it (S >= ~8K at D=128) — the
    # fused path no longer falls back to dense-write + attend at large S
    # (VERDICT r2 next #4).
    use_wa = use_ck and S % 128 == 0
    # Full-step fusion (write + attend + score update + evict in one
    # kernel): roco / h2o_head only — tova's encode update needs a
    # cross-head mean, recency/random need rank spans. MEASURED SLOWER than
    # write+attend fusion + batched XLA eviction at 7B (strided 0.488 vs
    # 0.361 s: the 31-step kth-smallest bisection is serial per (B, H)
    # program, while the XLA evict batches it over all heads — RESULTS.md
    # "fused-step A/B"); opt-in via EASYKV_TPU_STEP_KERNEL=1.
    use_step = (use_wa and evicting and spec.k == C
                and wa_fits(rep * C, C, S, cfg.head_dim,
                            cache.k.dtype.itemsize)
                and spec.policy in ("roco", "h2o_head")
                and flags.step_kernel_enabled())

    h = jnp.take(params["embed"], jnp.maximum(token_ids, 0), axis=0)

    def layer(h, xs):
        p, cl0 = xs
        x = rmsnorm(h, p["ln_attn"], cfg.rms_norm_eps)
        q, k, v = _proj_qkv(x, p, B, T, Hq, Hkv, Dh)
        q = apply_rope(q, q_pos_flat[:, None, :], inv_freq)
        k = apply_rope(k, q_pos_flat[:, None, :], inv_freq)
        # (B, H, T, D) -> (n, B, H, C, D) chunk-major for the inner scan
        qc = q.reshape(B, Hq, n, C, Dh).transpose(2, 0, 1, 3, 4)
        kc = k.reshape(B, Hkv, n, C, Dh).transpose(2, 0, 1, 3, 4)
        vc = v.reshape(B, Hkv, n, C, Dh).transpose(2, 0, 1, 3, 4)

        write = (write_tokens_dense if flags.dense_write_enabled()
                 else write_tokens_at)

        def chunk(carry, cxs):
            cl_t, wids = carry
            cl = LayerCache(*cl_t)
            q_c, k_c, v_c, ctx, wstart = cxs
            # Write slots are carried, not searched: contiguous while the
            # cache fills, the previous event's evicted slots afterwards
            # (free_slot_ids-equivalent by the ring invariant — writes always
            # fill the lowest free slots, so the occupied region stays
            # [0, idx+stride) and evicted ids are always the lowest free).
            need = spec is not None and spec.policy in (
                "h2o_head", "roco", "tova")
            if use_step:
                # wids carries the write MASK (B, Hkv, S); the kernel does
                # write + attend + score update + evict and emits the next
                # chunk's mask.
                out, cl, wids = _chunk_step(cl, q_c, k_c, v_c, ctx, wids,
                                            wstart + C, spec, B,
                                            window=cfg.sliding_window)
                return (tuple(cl), wids), out
            if use_wa:
                out, ssum, ssq, last, cl = _chunk_write_attend(
                    cl, q_c, k_c, v_c, ctx.q_pos, ctx.counter_init, wids,
                    need, window=cfg.sliding_window)
                if need:
                    cl = update_scores_reduced(cl, ssum, ssq, last, spec,
                                               ctx.update_gate)
            elif use_ck:
                cl = write(cl, k_c, v_c, ctx.q_pos, ctx.counter_init, wids)
                out, ssum, ssq, last = _chunk_attend(
                    cl, q_c, ctx.q_pos, need, window=cfg.sliding_window)
                if need:
                    cl = update_scores_reduced(cl, ssum, ssq, last, spec,
                                               ctx.update_gate)
            else:
                cl = write(cl, k_c, v_c, ctx.q_pos, ctx.counter_init, wids)
                k_raw, v_raw = kv_dequant(cl, q_c.dtype)
                out, probs_kv = attend(
                    q_c, k_raw, v_raw, cl.pos, ctx.q_pos,
                    sliding_window=cfg.sliding_window, scale=scale,
                )
                if spec is not None and spec.policy != "full":
                    cl = update_scores(cl, probs_kv, spec, ctx.update_gate)
            contig = wstart[:, None, None] + C + jnp.arange(C, dtype=jnp.int32)
            contig = jnp.broadcast_to(contig, (B, Hkv, C))
            if evicting:
                from ..policies import evict_layer

                cl, eids = evict_layer(cl, spec, ctx.next_pos, ctx.prompt_len,
                                       ctx.rand_rank, ctx.evict_gate)
                wids = jnp.where(ctx.evict_gate[:, None, None],
                                 jnp.sort(eids, axis=-1), contig)
            else:
                wids = contig
            return (tuple(cl), wids), out

        if use_step:
            iota_s = jnp.arange(S, dtype=jnp.int32)[None, :]
            w0 = ((iota_s >= write_start[0][:, None]) &
                  (iota_s < write_start[0][:, None] + C))
            wids0 = jnp.broadcast_to(w0[:, None, :], (B, Hkv, S)).astype(
                jnp.int32)
        else:
            wids0 = jnp.broadcast_to(
                write_start[0][:, None, None] + jnp.arange(C, dtype=jnp.int32),
                (B, Hkv, C),
            )
        (cl_t, _), outs = jax.lax.scan(
            chunk, (tuple(LayerCache(*cl0)), wids0), (qc, kc, vc, ctxs,
                                                      write_start),
            unroll=min(flags.encode_unroll(), n),
        )
        # (n, B, Hq, C, D) -> (B, T, Hq*D)
        attn_out = outs.transpose(1, 0, 3, 2, 4).reshape(B, T, Hq * Dh)
        h = h + mm(attn_out, p["wo"])
        x2 = rmsnorm(h, p["ln_mlp"], cfg.rms_norm_eps)
        h = h + _mlp(x2, p)
        return h, cl_t

    h, new_cache = jax.lax.scan(layer, h, (params["layers"], tuple(cache)))
    return h, KVCache(*new_cache)


def prefill_layer_major(
    params: Params,
    cfg: ModelConfig,
    cache: KVCache,
    token_ids: jax.Array,   # (B, A_pad), A_pad = n_chunks * C
    ctxs: StepCtx,          # leaves stacked with a leading (n_chunks,) axis
    spec,                   # PolicySpec for the keep_attention bootstrap, or None
) -> Tuple[jax.Array, KVCache]:
    """Layer-major no-eviction prefill: the counterpart of
    strided_encode_layer_major for the prefix/prompt phase (engine _prefill,
    ppl full-cache). One whole-width QKV/MLP matmul per layer; attention and
    the cache writes scan chunk-by-chunk. Writes go to virgin slots
    [start, start+C) — token j lands in slot j on the empty engine cache, so
    no free-slot search; padding tokens write pos=-1 (slot stays invalid,
    garbage K/V masked out of attention).

    Returns (h (B, A_pad, D) pre-final-norm, cache). With a PolicySpec the
    bootstrap score accumulation (reference h2o_head_score easykv.py:173-186)
    runs per chunk, exactly like the chunk-major path."""
    B, T = token_ids.shape
    n = ctxs.next_pos.shape[0]
    C = T // n
    Hq, Hkv, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    inv_freq = rope_inv_freq(cfg.head_dim, rope_base_for(cfg))
    scale = cfg.head_dim ** -0.5
    q_pos_flat = ctxs.q_pos.transpose(1, 0, 2).reshape(B, T)
    use_ck = _use_chunk_kernel(cfg, cache.k.shape[-2], C,
                               cache.k.dtype.itemsize, B)
    starts = jnp.arange(n, dtype=jnp.int32) * C

    h = jnp.take(params["embed"], jnp.maximum(token_ids, 0), axis=0)

    def layer(h, xs):
        p, cl0 = xs
        x = rmsnorm(h, p["ln_attn"], cfg.rms_norm_eps)
        q, k, v = _proj_qkv(x, p, B, T, Hq, Hkv, Dh)
        q = apply_rope(q, q_pos_flat[:, None, :], inv_freq)
        k = apply_rope(k, q_pos_flat[:, None, :], inv_freq)
        qc = q.reshape(B, Hq, n, C, Dh).transpose(2, 0, 1, 3, 4)
        kc = k.reshape(B, Hkv, n, C, Dh).transpose(2, 0, 1, 3, 4)
        vc = v.reshape(B, Hkv, n, C, Dh).transpose(2, 0, 1, 3, 4)

        def chunk(cl_t, cxs):
            cl = LayerCache(*cl_t)
            q_c, k_c, v_c, ctx, start = cxs
            # Prefill writes are always contiguous virgin slots at the chunk
            # offset -> dynamic_update_slice, no scatter (write_tokens_slice).
            cl = write_tokens_slice(cl, k_c, v_c, ctx.q_pos, ctx.counter_init,
                                    start)
            if use_ck:
                out, ssum, ssq, last = _chunk_attend(
                    cl, q_c, ctx.q_pos, spec is not None,
                    window=cfg.sliding_window)
                if spec is not None:
                    cl = update_scores_reduced(cl, ssum, ssq, last, spec,
                                               ctx.update_gate, bootstrap=True)
            else:
                k_raw, v_raw = kv_dequant(cl, q_c.dtype)
                out, probs_kv = attend(
                    q_c, k_raw, v_raw, cl.pos, ctx.q_pos,
                    sliding_window=cfg.sliding_window, scale=scale,
                )
                if spec is not None:
                    cl = update_scores(cl, probs_kv, spec, ctx.update_gate,
                                       bootstrap=True)
            return tuple(cl), out

        cl_t, outs = jax.lax.scan(chunk, tuple(LayerCache(*cl0)),
                                  (qc, kc, vc, ctxs, starts),
                                  unroll=min(flags.encode_unroll(), n))
        attn_out = outs.transpose(1, 0, 3, 2, 4).reshape(B, T, Hq * Dh)
        h = h + mm(attn_out, p["wo"])
        x2 = rmsnorm(h, p["ln_mlp"], cfg.rms_norm_eps)
        h = h + _mlp(x2, p)
        return h, cl_t

    h, new_cache = jax.lax.scan(layer, h, (params["layers"], tuple(cache)))
    return h, KVCache(*new_cache)


def ring_prefill_forward(
    params: Params,
    cfg: ModelConfig,
    cache: KVCache,
    token_ids: jax.Array,        # (B, T); T divisible by the sp-axis size
    ctx: StepCtx,
    spec,                        # PolicySpec | None: collect bootstrap scores?
    *,
    mesh,
    axis: str = "sp",
) -> Tuple[jax.Array, KVCache]:
    """Whole-prefix prefill with the sequence sharded over the mesh's `axis`:
    per-layer ring attention (ops/ring_attention.py) instead of the chunked
    fori_loop — O(T²/n) attention per device, K/V blocks riding the ICI ring.

    With a PolicySpec, the traveling Σp/Σp² accumulators land in the score
    sidecars — identical semantics to the keep_attention bootstrap the
    chunked path accumulates per chunk (update_scores(bootstrap=True),
    reference h2o_head_score easykv.py:173-186).

    Valid tokens must form a per-row column prefix (true for every engine
    caller); token j then lands in cache slot j, so the ring score vectors
    scatter as a plain [0, T) block write. Returns (last real token's logits
    (B, V), cache)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..ops.ring_attention import ring_attention

    B, T = token_ids.shape
    Hq, Hkv, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    inv_freq = rope_inv_freq(cfg.head_dim, rope_base_for(cfg))
    collect = spec is not None
    # padding keys get INT_MAX so no query attends them (-1 would be
    # causally visible to everything)
    kpos = jnp.where(ctx.token_valid, ctx.q_pos, jnp.int32(2**31 - 1))

    h = jnp.take(params["embed"], jnp.maximum(token_ids, 0), axis=0)
    h = jax.lax.with_sharding_constraint(
        h, NamedSharding(mesh, P(None, axis, None))
    )

    def layer(h, xs):
        p, cl = xs
        cl = LayerCache(*cl)
        x = rmsnorm(h, p["ln_attn"], cfg.rms_norm_eps)
        q, k, v = _proj_qkv(x, p, B, T, Hq, Hkv, Dh)
        q = apply_rope(q, ctx.q_pos[:, None, :], inv_freq)
        k = apply_rope(k, ctx.q_pos[:, None, :], inv_freq)

        out, ssum, ssq = ring_attention(
            q, k, v, ctx.q_pos, mesh, axis,
            collect_scores=collect, k_pos=kpos,
        )
        cl = write_tokens(cl, k, v, ctx.q_pos, ctx.counter_init, ctx.token_valid)
        if collect:
            # token j sits in slot j (empty cache, column-order free slots);
            # padding columns carry exactly-zero mass.
            cl = cl._replace(
                score=cl.score.at[:, :, :T].add(ssum),
                score_sq=cl.score_sq.at[:, :, :T].add(ssq),
            )

        attn_out = out.transpose(0, 2, 1, 3).reshape(B, T, Hq * Dh)
        h = h + mm(attn_out, p["wo"])
        x2 = rmsnorm(h, p["ln_mlp"], cfg.rms_norm_eps)
        h = h + _mlp(x2, p)
        return h, tuple(cl)

    h, new_cache = jax.lax.scan(layer, h, (params["layers"], tuple(cache)))
    # logits of the last REAL token only (the lm head over all T rows of a
    # long prefix would dominate memory)
    n_valid = jnp.sum(ctx.token_valid.astype(jnp.int32), axis=1)  # (B,)
    h_last = jnp.take_along_axis(
        h, jnp.maximum(n_valid - 1, 0)[:, None, None], axis=1
    )
    logits = _logits_tail(h_last, params, cfg)[:, 0]
    return logits, KVCache(*new_cache)


def _logits_tail(h: jax.Array, params: Params, cfg: ModelConfig) -> jax.Array:
    h = rmsnorm(h, params["final_norm"], cfg.rms_norm_eps)
    if cfg.tie_word_embeddings:
        return (h @ params["embed"].T).astype(jnp.float32)
    return _lm_head(h, params["lm_head"]).astype(jnp.float32)


def _decode_kernel_plan(cfg, B: int):
    """(use_kernel, mesh_info) for the decode fast path — shared between
    _decode_forward and the engine-side fold predicate so the two can never
    disagree. shard_map needs even shards: batch over data, KV heads over
    model; a trivial 1-device mesh calls kernels directly."""
    use_kernel = _pallas_enabled()  # sliding-window is in-kernel since r4
    mesh_info = flags.active_mesh()
    Hkv = cfg.num_key_value_heads
    if use_kernel and mesh_info is not None:
        mesh = mesh_info[0]
        dsz = mesh.shape.get(mesh_info[1], 1)
        msz = mesh.shape.get(mesh_info[2], 1)
        if B % dsz != 0 or Hkv % msz != 0:
            use_kernel = False
        elif mesh.size == 1:
            mesh_info = None
    return use_kernel, mesh_info


def decode_evict_folded(cfg, cache: KVCache, B: int,
                        spec: Optional[PolicySpec],
                        streaming: bool) -> bool:
    """True when _decode_forward's fused sidecar pass also applies the
    step's gated eviction event in-kernel (single-chip, lane-aligned S,
    PHASE_DECODE k=1 specs) — the engine must then SKIP its separate
    evict_cache dispatch. Streaming keeps the two-phase path: ordered
    compaction and incremental ranks need the pre-evict positions."""
    from ..ops.pallas.sidecar_update import evict_supported

    if streaming or not evict_supported(spec):
        return False
    use_kernel, mesh_info = _decode_kernel_plan(cfg, B)
    S = cache.pos.shape[-1]
    return (use_kernel and mesh_info is None and S % 128 == 0
            and flags.sidecar_enabled())


def decode_stream_folded(cfg, cache: KVCache, B: int,
                         spec: Optional[PolicySpec],
                         streaming: bool, ordered: bool,
                         prerotated: bool) -> bool:
    """Ordered-prerotated streaming variant of decode_evict_folded: the
    sidecar kernel also COMPACTS in-kernel (lane shifts on blocks already
    in VMEM) and emits the victim slot for fused_kv_compact, so the engine
    skips evict_cache AND _compact_one. Requires the same single-chip /
    lane-aligned / PHASE_DECODE-k=1 conditions."""
    from ..ops.pallas.sidecar_update import evict_supported

    if not (streaming and ordered and prerotated and evict_supported(spec)):
        return False
    use_kernel, mesh_info = _decode_kernel_plan(cfg, B)
    S = cache.pos.shape[-1]
    return (use_kernel and mesh_info is None and S % 128 == 0
            and flags.sidecar_enabled())


def _decode_forward(
    params: Params,
    cfg: ModelConfig,
    cache: KVCache,
    token_ids: jax.Array,        # (B, 1)
    ctx: StepCtx,
    spec: Optional[PolicySpec],
    streaming: bool = False,
    ranks_all: Optional[jax.Array] = None,   # (L, B, Hkv, S) precomputed
    ordered: bool = False,
    prerotated: bool = False,
    fold_evict: bool = False,
) -> Tuple[jax.Array, KVCache]:
    """Single-token decode with late cache write.

    The layer scan reads the cache but never writes it: the current token's
    K/V joins the softmax directly (attend_inflight / the Pallas inflight
    kernel), and the scan emits each layer's (k_new, v_new, probs, p_new).
    One batched scatter then writes all L layers' K/V + sidecars at free
    slots selected by a single (L·B)-folded top_k. Semantically identical to
    write-then-attend (the in-flight probability IS the new slot's row) —
    verified slot-exact by the oracle lockstep suite.
    """
    B, C = token_ids.shape
    Hq, Hkv, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    L, _, _, S = cache.pos.shape
    inv_freq = rope_inv_freq(cfg.head_dim, rope_base_for(cfg))
    scale = cfg.head_dim ** -0.5
    use_kernel, mesh_info = _decode_kernel_plan(cfg, B)
    interp = flags.pallas_interpret()

    # Fused sidecar path: slot select + score update + sidecar row write
    # happen in one Pallas pass after the scan (ops/pallas/sidecar_update);
    # otherwise one batched free-slot select for all layers here (replaces
    # L in-scan top_ks).
    use_sidecar_kernel = use_kernel and S % 128 == 0 and flags.sidecar_enabled()
    if not use_sidecar_kernel:
        ids_all = free_slot_ids(cache.pos.reshape(L * B, Hkv, S), 1)
        ids_all = ids_all.reshape(L, B, Hkv, 1)

    h = jnp.take(params["embed"], jnp.maximum(token_ids, 0), axis=0)
    q_pos = ctx.q_pos  # (B, 1)

    lyr = params["layers"]
    mega_tree = (
        use_kernel and mesh_info is None
        and (not streaming or (ordered and prerotated))
        and flags.mega_kernel_enabled()
        and isinstance(lyr.get("wqkv"), dict) and "q4a" in lyr["wqkv"]
        and "gs3" in lyr["wqkv"] and "bqkv" not in lyr
        and isinstance(lyr.get("wgu"), dict) and "q4a" in lyr["wgu"]
    )
    use_mega = mega_tree and B == 1
    # MHA (rep == 1, the 7B/13B serving shapes) batches to 16 — the kernel
    # S-tiles its attention blocks and shrinks CG/weight tiles to fit
    # scoped VMEM at Bp=16; GQA models stay <= 8 (the per-b rep>1 path has
    # no flash tiling)
    bmax = 16 if Hq == Hkv else 8
    use_mega_b = (mega_tree and 1 < B <= bmax
                  and flags.mega_batch_enabled())

    if streaming:
        # Batched cache-relative geometry for ALL layers: one argsort for
        # the age ranks (vs one per layer in the r2 path) and the rope
        # tables shared across layers. The new token's relative position is
        # the pre-write valid count (== post-write rank of the youngest).
        Sl = cache.pos.shape[-1]
        import os as _os

        if ordered:
            # age-ordered cache (engine compacts on evict): rank == slot
            # index; kernels rotate by a direct per-slot table and the XLA
            # fallback by broadcast iota — no ranks anywhere
            ranks_all = jnp.broadcast_to(
                jnp.arange(cache.pos.shape[-1], dtype=jnp.int32),
                cache.pos.shape)
        elif ranks_all is not None:
            # engine-carried incremental ranks (decode loop, k=1 eviction):
            # no per-step argsort at all — see _decode_loop's rank updates
            pass
        elif "ranks" in _os.environ.get("EASYKV_TPU_STREAM_SKIP", ""):
            # timing-only debug: attribute the batched argsort's cost
            ranks_all = jnp.zeros_like(cache.pos)
        else:
            ranks_all = _age_ranks(
                cache.pos.reshape(L * B, Hkv, Sl)).reshape(L, B, Hkv, Sl)
        n_valid = jnp.sum((cache.pos[:, :, 0, :] >= 0).astype(jnp.int32),
                          axis=-1)                       # (L, B)

    def layer(h, xs):
        if streaming:
            p, cl, ranks_l, nv_l = xs
        else:
            p, cl = xs
        cl = LayerCache(*cl)
        x = rmsnorm(h, p["ln_attn"], cfg.rms_norm_eps)
        q, k, v = _proj_qkv(x, p, B, 1, Hq, Hkv, Dh)
        if streaming:
            # q and the in-flight K rotate by the cache-relative position;
            # the cached K stays raw and rotates by rank at attend time
            # (prerotated: the cache already holds rank-rotated K, so the
            # in-flight K is stored rotated too and attention is plain).
            q_rel = nv_l[:, None]                        # (B, 1)
            q_att = apply_rope(q, q_rel[:, None, :], inv_freq)
            kn_att = apply_rope(k, q_rel[:, None, :], inv_freq)
            kn_emit = kn_att if prerotated else k
        else:
            q_att = apply_rope(q, q_pos[:, None, :], inv_freq)
            kn_att = apply_rope(k, q_pos[:, None, :], inv_freq)
            kn_emit = kn_att

        if use_kernel:
            from ..ops.pallas import fused_decode_attend_inflight
            from ..ops.pallas.decode_attention import (
                fused_decode_attend_inflight_sharded,
            )

            kw = dict(
                k_scale=cl.k_scale if cl.quantized else None,
                v_scale=cl.v_scale if cl.quantized else None,
                sliding_window=cfg.sliding_window,
            )
            if streaming and ordered and prerotated:
                pass  # pre-rotated K: plain non-streaming attention math
            elif streaming and ordered:
                kw.update(inv_freq=inv_freq, ordered=True)
            elif streaming:
                kw.update(rank=ranks_l, inv_freq=inv_freq)
            if mesh_info is not None:
                out, probs_kv, p_new = fused_decode_attend_inflight_sharded(
                    q_att, kn_att, v, cl.k, cl.v, cl.pos, q_pos[:, 0], **kw,
                    mesh=mesh_info[0], data_axis=mesh_info[1],
                    model_axis=mesh_info[2], interpret=interp,
                )
            else:
                out, probs_kv, p_new = fused_decode_attend_inflight(
                    q_att, kn_att, v, cl.k, cl.v, cl.pos, q_pos[:, 0], **kw,
                    interpret=interp,
                )
        else:
            k_raw, v_raw = kv_dequant(cl, h.dtype)
            if streaming and not prerotated:
                k_raw = apply_rope(k_raw, ranks_l, inv_freq)
            out, probs_kv, p_new = attend_inflight(
                q_att, kn_att, v, k_raw, v_raw, cl.pos, q_pos[:, 0],
                sliding_window=cfg.sliding_window, scale=scale,
            )

        attn_out = out.transpose(0, 2, 1, 3).reshape(B, 1, Hq * Dh)
        h = h + mm(attn_out, p["wo"])
        x2 = rmsnorm(h, p["ln_mlp"], cfg.rms_norm_eps)
        h = h + _mlp(x2, p)
        return h, (kn_emit, v, probs_kv[:, :, 0, :], p_new)

    if use_mega:
        # One-pallas-call decode step: all layers' GEMVs + RoPE + attention
        # in a single kernel (ops/pallas/fused_decode.py) — same outputs as
        # the scan below, minus 4L XLA op boundaries and L attention-kernel
        # dispatches (~45 us per pallas call on this backend, RESULTS.md).
        from ..ops.pallas.fused_decode import fused_decode_step

        quantized = cache.k.dtype == jnp.int8
        # streaming-prerotated: RoPE angle is the cache-relative position
        # (layer-0 valid count — uniform across layers in ordered decoding
        # mode, where every eviction removes exactly one slot per head in
        # every layer); the mask still compares true positions.
        rope_pos = n_valid[0] if (streaming and prerotated) else None
        hm, kn_m, vn_m, probs_m, pnew_m = fused_decode_step(
            lyr, cfg, cache.k, cache.v, cache.pos, h[0], q_pos[0],
            k_scale=cache.k_scale if quantized else None,
            v_scale=cache.v_scale if quantized else None,
            rope_pos=rope_pos,
            interpret=interp,
        )
        h = hm[None]                              # (1, 1, D)
        kn = kn_m[:, None]                        # (L, 1, Hkv, 1, Dh)
        vn = vn_m[:, None]
        probs = probs_m[:, None, :, 0, :]         # (L, 1, Hkv, S)
        p_new = pnew_m[:, None, :, None]          # (L, 1, Hkv, 1)
    elif use_mega_b:
        # Batched one-pallas-call decode step (B > 1): the per-op GEMM
        # dispatch that capped batched int4 decode at 61% of int8
        # (RESULTS.md "r4 batched decode") disappears — one grid streams
        # every layer's weights once for all B rows.
        from ..ops.pallas.fused_decode_batch import fused_decode_step_batch

        quantized = cache.k.dtype == jnp.int8
        rope_pos = n_valid[0] if (streaming and prerotated) else None
        hm, kn, vn, probs_m, pnew_m = fused_decode_step_batch(
            lyr, cfg, cache.k, cache.v, cache.pos, h[:, 0], q_pos[:, 0],
            k_scale=cache.k_scale if quantized else None,
            v_scale=cache.v_scale if quantized else None,
            rope_pos=rope_pos,
            interpret=interp,
        )
        h = hm[:, None]                           # (B, 1, D)
        probs = probs_m[:, :, :, 0, :]            # (L, B, Hkv, S)
        p_new = pnew_m[..., None]                 # (L, B, Hkv, 1)
    elif streaming:
        h, (kn, vn, probs, p_new) = jax.lax.scan(
            layer, h, (params["layers"], tuple(cache), ranks_all, n_valid)
        )
    else:
        h, (kn, vn, probs, p_new) = jax.lax.scan(
            layer, h, (params["layers"], tuple(cache))
        )
    if use_sidecar_kernel:
        from ..ops.pallas.sidecar_update import (
            fused_write_update, fused_write_update_sharded,
        )

        tv = ctx.token_valid[:, 0]
        ug = ctx.update_gate
        if ug.ndim == 0:
            ug = jnp.broadcast_to(ug, (B,))
        sc_args = (
            cache.pos, cache.score, cache.score_sq, cache.counter,
            probs, p_new, ctx.q_pos[:, 0], tv, ug, ctx.counter_init[:, 0],
        )
        policy = None if spec is None else spec.policy
        if mesh_info is not None:
            pos, score, ssq, counter, ids_all = fused_write_update_sharded(
                *sc_args, mesh=mesh_info[0], data_axis=mesh_info[1],
                model_axis=mesh_info[2], policy=policy, interpret=interp,
            )
            new_cache = cache._replace(
                pos=pos, score=score, score_sq=ssq, counter=counter,
            )
            new_cache = _write_kv_rows(new_cache, ids_all, kn, vn, tv)
        else:
            from ..ops.pallas.row_write import write_rows

            fold = fold_evict and decode_evict_folded(cfg, cache, B, spec,
                                                      streaming)
            fold_stream = fold_evict and decode_stream_folded(
                cfg, cache, B, spec, streaming, ordered, prerotated)
            ekw = {}
            if fold or fold_stream:
                # the step's gated eviction event folds into the same VMEM
                # pass (engine skips evict_cache — decode_evict_folded);
                # ordered streaming also compacts the sidecars in-kernel
                ekw = dict(espec=spec, evict_gate=ctx.evict_gate,
                           next_pos=ctx.next_pos, prompt_len=ctx.prompt_len,
                           rand_rank=ctx.rand_rank)
                if fold_stream:
                    ekw["compact"] = True
            quant_kv = cache.k.dtype == jnp.int8
            if quant_kv:
                # quantize once here: the sidecar kernel writes the scale
                # rows (vectorized — each was an (L*B*H)-row scalar
                # scatter), write_rows DMA-scatters the int8 rows
                k_w, k_sc = quantize_kv(kn)
                v_w, v_sc = quantize_kv(vn)
                ekw.update(k_sc_new=k_sc, v_sc_new=v_sc,
                           k_scale=cache.k_scale, v_scale=cache.v_scale)
            else:
                k_w = kn.astype(cache.k.dtype)
                v_w = vn.astype(cache.v.dtype)
            res = fused_write_update(
                *sc_args, policy=policy, interpret=interp, **ekw,
            )
            pos, score, ssq, counter, ids_all = res[:5]
            ksc_new, vsc_new = (res[5], res[6]) if quant_kv else (
                cache.k_scale, cache.v_scale)
            if Dh % 128 == 0:
                k2, v2 = write_rows(cache.k, cache.v, k_w, v_w,
                                    ids_all[..., 0], interpret=interp)
            else:
                # sub-128-lane rows cannot DMA (Mosaic lane slicing);
                # Dh=64-class models (TinyLlama) keep the XLA scatter
                l_ix = jnp.arange(L)[:, None, None, None]
                b_ix = jnp.arange(B)[None, :, None, None]
                h_ix = jnp.arange(Hkv)[None, None, :, None]
                k2 = cache.k.at[l_ix, b_ix, h_ix, ids_all].set(k_w)
                v2 = cache.v.at[l_ix, b_ix, h_ix, ids_all].set(v_w)
            if fold_stream:
                # K/V (+ scales) shift + R(-theta) pre-rotation — the rows
                # just written shift too, exactly like the two-phase
                # evict_cache + _compact_one sequence
                from ..ops.pallas.sidecar_update import fused_kv_compact

                vslot = res[7 if quant_kv else 5]
                kvres = fused_kv_compact(
                    k2, v2, vslot[..., 0],
                    k_scale=ksc_new if quant_kv else None,
                    v_scale=vsc_new if quant_kv else None,
                    inv_freq=inv_freq, rotate=True, interpret=interp,
                )
                k2, v2 = kvres[0], kvres[1]
                if quant_kv:
                    ksc_new, vsc_new = kvres[2], kvres[3]
            new_cache = cache._replace(
                pos=pos, score=score, score_sq=ssq, counter=counter,
                k=k2, v=v2, k_scale=ksc_new, v_scale=vsc_new)
    else:
        new_cache = _decode_write(cache, ids_all, kn, vn, probs, p_new, ctx,
                                  spec)
    return _logits_tail(h, params, cfg), new_cache


def _write_kv_rows(
    cache: KVCache,
    ids: jax.Array,   # (L, B, H, 1) write slots
    kn: jax.Array,    # (L, B, H, 1, D) rotated, unquantized
    vn: jax.Array,    # (L, B, H, 1, D)
    live: jax.Array,  # (B,) bool
) -> KVCache:
    """K/V (+ dequant scale) row scatter of a decode step — the companion of
    the fused sidecar kernel, which owns pos/score/score_sq/counter.

    Rows with live=False (EOS'd streams) write UNCONDITIONALLY too: their
    write slot keeps pos < 0 (the sidecar kernel gates the pos write on
    token_valid), so the K/V bytes land in a permanently invalid slot that
    no later attention masks in and no later select can hand to a live row
    (done is sticky). The r4 conditional variant read the slot's current
    rows back (4 gathers) just to re-write them — XLA lowers both the
    gather and the scatter to serialized per-row loops, and the gathers
    were ~half the 1.95 ms/step this op cost at 7B B=8
    (benchmarks/bench_b8.py)."""
    L, B, H, _ = ids.shape
    l_ix = jnp.arange(L)[:, None, None, None]
    b_ix = jnp.arange(B)[None, :, None, None]
    h_ix = jnp.arange(H)[None, None, :, None]
    del live

    k_scale, v_scale = cache.k_scale, cache.v_scale
    if cache.k.dtype == jnp.int8:
        k_w, k_sc = quantize_kv(kn)
        v_w, v_sc = quantize_kv(vn)
        k_scale = k_scale.at[l_ix, b_ix, h_ix, ids].set(k_sc)
        v_scale = v_scale.at[l_ix, b_ix, h_ix, ids].set(v_sc)
    else:
        k_w = kn.astype(cache.k.dtype)
        v_w = vn.astype(cache.v.dtype)
    return cache._replace(
        k=cache.k.at[l_ix, b_ix, h_ix, ids].set(k_w),
        v=cache.v.at[l_ix, b_ix, h_ix, ids].set(v_w),
        k_scale=k_scale,
        v_scale=v_scale,
    )


def _decode_write(
    cache: KVCache,
    ids: jax.Array,      # (L, B, H, 1) write slots
    kn: jax.Array,       # (L, B, H, 1, D) rotated, unquantized
    vn: jax.Array,       # (L, B, H, 1, D)
    probs: jax.Array,    # (L, B, H, S) f32 GQA-mean probs over cached slots
    p_new: jax.Array,    # (L, B, H, 1) f32 in-flight token's probability
    ctx: StepCtx,
    spec: Optional[PolicySpec],
) -> KVCache:
    """Batched score update + cache write for all layers of a decode step.

    Reproduces write_tokens + update_scores (reference easykv.py:288-300
    score updates; compaction-append semantics) in one pass: old slots get
    the probability-row update, the written slot gets the in-flight
    probability as its fresh score (== what write-then-attend produces)."""
    L, B, H, S = cache.pos.shape
    live = ctx.token_valid[:, 0]                       # (B,)
    gate_b = ctx.update_gate                           # scalar or (B,) bool
    if gate_b.ndim == 1:
        gate_b = gate_b[None, :, None, None]           # over (L, B, H, S/1)
    gate = gate_b.astype(jnp.float32)

    # Old-slot score updates (policies.update_scores semantics). probs is
    # exactly zero at invalid slots (masked softmax), so the stale value at
    # the about-to-be-written slot is untouched here and overwritten below.
    score, score_sq = cache.score, cache.score_sq
    s_new = jnp.zeros_like(p_new)
    sq_new = jnp.zeros_like(p_new)
    if spec is not None and spec.policy in ("h2o_head", "roco"):
        score = score + probs * gate
        s_new = p_new * gate
        if spec.policy == "roco":
            score_sq = score_sq + probs * probs * gate
            sq_new = p_new * p_new * gate
    elif spec is not None and spec.policy == "tova":
        # decode phases use per-head last-token attention (easykv.py:297-300,
        # :617-618); the encode-phase head-mean never reaches this path.
        score = jnp.where(gate_b, probs, score)
        s_new = p_new * gate

    l_ix = jnp.arange(L)[:, None, None, None]
    b_ix = jnp.arange(B)[None, :, None, None]
    h_ix = jnp.arange(H)[None, None, :, None]
    lv = live[None, :, None, None]                     # (1, B, 1, 1)
    cur = lambda arr: jnp.take_along_axis(arr, ids, axis=3)

    pos_b = jnp.broadcast_to(ctx.q_pos[None, :, None, :], (L, B, H, 1))
    cnt_b = jnp.broadcast_to(ctx.counter_init[None, :, None, :], (L, B, H, 1))
    pos_w = jnp.where(lv, pos_b, cur(cache.pos))
    cnt_w = jnp.where(lv, cnt_b, cur(cache.counter))
    s_w = jnp.where(lv, s_new, cur(score))
    sq_w = jnp.where(lv, sq_new, cur(score_sq))

    quantized = cache.k.dtype == jnp.int8
    k_scale, v_scale = cache.k_scale, cache.v_scale
    if quantized:
        knq, k_sc = quantize_kv(kn)
        vnq, v_sc = quantize_kv(vn)
        k_w = jnp.where(lv[..., None], knq, cur4(cache.k, ids))
        v_w = jnp.where(lv[..., None], vnq, cur4(cache.v, ids))
        ksc_w = jnp.where(lv, k_sc, cur(cache.k_scale))
        vsc_w = jnp.where(lv, v_sc, cur(cache.v_scale))
        k_scale = k_scale.at[l_ix, b_ix, h_ix, ids].set(ksc_w)
        v_scale = v_scale.at[l_ix, b_ix, h_ix, ids].set(vsc_w)
    else:
        k_w = jnp.where(lv[..., None], kn.astype(cache.k.dtype), cur4(cache.k, ids))
        v_w = jnp.where(lv[..., None], vn.astype(cache.v.dtype), cur4(cache.v, ids))

    return cache._replace(
        k=cache.k.at[l_ix, b_ix, h_ix, ids].set(k_w),
        v=cache.v.at[l_ix, b_ix, h_ix, ids].set(v_w),
        pos=cache.pos.at[l_ix, b_ix, h_ix, ids].set(pos_w),
        score=score.at[l_ix, b_ix, h_ix, ids].set(s_w),
        score_sq=score_sq.at[l_ix, b_ix, h_ix, ids].set(sq_w),
        counter=cache.counter.at[l_ix, b_ix, h_ix, ids].set(cnt_w),
        k_scale=k_scale,
        v_scale=v_scale,
    )


def cur4(arr: jax.Array, ids: jax.Array) -> jax.Array:
    """take_along_axis for the (L, B, H, S, D) buffers at (L, B, H, 1) ids."""
    return jnp.take_along_axis(arr, ids[..., None], axis=3)


def _lm_head(h: jax.Array, head) -> jax.Array:
    """LM head projection with float32 accumulation — measurably faster than
    the bf16-out dot for the decode GEMV (0.49 vs 0.55 ms at D=2048 V=32000
    in-graph) and numerically tighter. A Pallas VPU GEMV was A/B'd and did
    not beat XLA here (RESULTS.md)."""
    if isinstance(head, dict) and ("q4p" in head or "w4" in head):
        from ..ops.quant import mm

        return mm(h, head).astype(jnp.float32)
    if isinstance(head, dict):
        y = jnp.matmul(h, head["q"].astype(h.dtype),
                       preferred_element_type=jnp.float32)
        return y * head["s"]
    return jnp.matmul(h, head, preferred_element_type=jnp.float32)


def _age_ranks(pos: jax.Array) -> jax.Array:
    """Rank of each valid slot by position (0 = oldest); invalid slots get
    rank 0 (masked out of attention anyway). pos: (B, H, S).

    Double-argsort (rank = argsort of argsort): XLA lowers a TPU scatter to
    a serialized per-index loop — the scatter formulation cost ~7 ms/step
    at 7B streaming-decode shapes (393K indices), two bitonic sorts are
    ~0.2 ms."""
    key = jnp.where(pos >= 0, pos, jnp.int32(2**31 - 1))
    ranks = jnp.argsort(jnp.argsort(key, axis=-1), axis=-1).astype(jnp.int32)
    return jnp.where(pos >= 0, ranks, 0)
