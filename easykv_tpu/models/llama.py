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

from ..cache import KVCache, LayerCache, kv_dequant, write_tokens
from ..config import ModelConfig
from ..ops.attention import attend
from ..ops.quant import mm
from ..ops.rope import apply_rope, rope_base_for, rope_inv_freq
from ..policies import PolicySpec, update_scores, update_scores_reduced

Params = Dict[str, Any]

# Kernel-selection flags live in flags.py; re-exported here for convenience.
from ..flags import pallas_enabled as _pallas_enabled  # noqa: E402
from ..flags import use_pallas  # noqa: E402,F401

# Fused chunk kernel measured SLOWER than XLA's fused softmax+reduce encode
# path on v5e (1.1B: 8990 vs 9578; 7B: 1915 vs 2360 prefill tok/s) — the
# 2-pass QK recompute and sub-128-row MXU tiles cost more than the probs
# HBM round-trip saves. Kept opt-in for larger-S regimes.
_CHUNK_KERNEL = False


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
    update_gate: jax.Array   # scalar bool: apply score updates this chunk
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
    if not cfg.tie_word_embeddings:
        params["lm_head"] = norm(jax.random.fold_in(key, 99), (D, V), D)
    return params


def rmsnorm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w


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
) -> Tuple[jax.Array, KVCache]:
    """One chunk through all layers. Returns (logits (B, C, V) f32, new cache)."""
    B, C = token_ids.shape
    Hq, Hkv, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    inv_freq = rope_inv_freq(cfg.head_dim, rope_base_for(cfg))
    scale = cfg.head_dim ** -0.5

    h = jnp.take(params["embed"], jnp.maximum(token_ids, 0), axis=0)

    def layer(h, xs):
        p, cl = xs
        cl = LayerCache(*cl)
        x = rmsnorm(h, p["ln_attn"], cfg.rms_norm_eps)
        q = mm(x, p["wq"]).reshape(B, C, Hq, Dh).transpose(0, 2, 1, 3)
        k = mm(x, p["wk"]).reshape(B, C, Hkv, Dh).transpose(0, 2, 1, 3)
        v = mm(x, p["wv"]).reshape(B, C, Hkv, Dh).transpose(0, 2, 1, 3)

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
        elif C == 1 and cfg.sliding_window is None and _pallas_enabled():
            # Fused decode path: one HBM pass over K/V (int8 if the cache is
            # quantized), probs emitted on-chip (ops/pallas/decode_attention).
            from ..ops.pallas import fused_decode_attend

            out, probs_kv = fused_decode_attend(
                q, cl.k, cl.v, cl.pos, ctx.q_pos[:, 0],
                k_scale=cl.k_scale if cl.quantized else None,
                v_scale=cl.v_scale if cl.quantized else None,
            )
        elif (cfg.sliding_window is None and _pallas_enabled()
              and _CHUNK_KERNEL and not cl.quantized):
            # Fused chunk path (strided encoding / prefill): flash attention
            # + on-chip score reduction (ops/pallas/chunk_attention.py).
            from ..ops.pallas.chunk_attention import fused_chunk_attend

            need_scores = spec is not None and (
                bootstrap or spec.policy in ("h2o_head", "roco", "tova")
            )
            out, ssum, ssq, last = fused_chunk_attend(
                q, cl.k, cl.v, cl.pos, ctx.q_pos, need_scores=need_scores
            )
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
        h = h + mm(jax.nn.silu(mm(x2, p["wg"])) * mm(x2, p["wu"]), p["wd"])
        return h, tuple(cl)

    h, new_cache = jax.lax.scan(layer, h, (params["layers"], tuple(cache)))
    h = rmsnorm(h, params["final_norm"], cfg.rms_norm_eps)
    if cfg.tie_word_embeddings:
        logits = (h @ params["embed"].T).astype(jnp.float32)
    else:
        logits = _lm_head(h, params["lm_head"]).astype(jnp.float32)
    return logits, KVCache(*new_cache)


def _lm_head(h: jax.Array, head) -> jax.Array:
    """LM head projection with float32 accumulation — measurably faster than
    the bf16-out dot for the decode GEMV (0.49 vs 0.55 ms at D=2048 V=32000
    in-graph) and numerically tighter. A Pallas VPU GEMV was A/B'd and did
    not beat XLA here (RESULTS.md)."""
    if isinstance(head, dict):
        y = jnp.matmul(h, head["q"].astype(h.dtype),
                       preferred_element_type=jnp.float32)
        return y * head["s"]
    return jnp.matmul(h, head, preferred_element_type=jnp.float32)


def _age_ranks(pos: jax.Array) -> jax.Array:
    """Rank of each valid slot by position (0 = oldest); invalid slots get
    rank 0 (masked out of attention anyway). pos: (B, H, S)."""
    order = jnp.argsort(jnp.where(pos >= 0, pos, jnp.int32(2**31 - 1)), axis=-1)
    ranks = jnp.zeros_like(pos)
    ar = jnp.arange(pos.shape[-1], dtype=jnp.int32)
    ranks = ranks.at[
        jnp.arange(pos.shape[0])[:, None, None],
        jnp.arange(pos.shape[1])[None, :, None],
        order,
    ].set(jnp.broadcast_to(ar, pos.shape))
    return jnp.where(pos >= 0, ranks, 0)
