"""Slot-masked attention over the budgeted KV ring buffer, emitting the
per-KV-head attention probabilities needed by the eviction policies.

This replaces the reference's `output_attentions=True` monkey-patched eager
attention (reference llama_patch.py:125-248): instead of materializing
per-layer attention maps to a side device and looping over layers in Python
(reference easykv.py:271-300), the probabilities are produced in the same
fused computation as the attention output and immediately reduced to
per-(kv-head, slot) score updates inside the layer scan. XLA fuses the
softmax, masking, GQA group-mean and score reduction into the two matmuls.

Softmax is computed in float32 (parity with reference llama_patch.py:218-219)
and invalid/out-of-causal-range slots contribute exactly zero probability.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-1e30)


def attend(
    q: jax.Array,            # (B, Hq, T, D), already rotated
    k: jax.Array,            # (B, Hkv, S, D) cached keys (rotated unless streaming)
    v: jax.Array,            # (B, Hkv, S, D)
    kv_pos: jax.Array,       # (B, Hkv, S) int32, -1 = invalid slot
    q_pos: jax.Array,        # (B, T) int32, -1 = padding query
    *,
    sliding_window: Optional[int] = None,
    scale: Optional[float] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (out (B, Hq, T, D), probs_kv (B, Hkv, T, S) float32).

    probs_kv is the GQA-normalized attention map: the mean over the rep_n
    query heads sharing each KV head (reference process_for_mqa_gqa,
    easykv.py:188-196), so eviction scores are at KV-head granularity.
    """
    B, Hq, T, D = q.shape
    Hkv = k.shape[1]
    rep = Hq // Hkv
    if scale is None:
        scale = 1.0 / (D ** 0.5)

    qg = q.reshape(B, Hkv, rep, T, D)
    logits = jnp.einsum(
        "bhrtd,bhsd->bhrts", qg, k, preferred_element_type=jnp.float32
    ) * jnp.float32(scale)

    # Mask: slot valid, causally visible, and (optionally) inside the sliding
    # window. Padding queries (q_pos < 0) see nothing and get zero rows.
    mask = (kv_pos >= 0)[:, :, None, :] & (
        kv_pos[:, :, None, :] <= q_pos[:, None, :, None]
    )
    if sliding_window is not None:
        mask &= kv_pos[:, :, None, :] > (q_pos[:, None, :, None] - sliding_window)
    mask = mask[:, :, None, :, :]  # (B, Hkv, 1, T, S)

    logits = jnp.where(mask, logits, NEG_INF)
    # Safe softmax: rows that are fully masked produce all-zero probabilities.
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - jax.lax.stop_gradient(m))
    e = jnp.where(mask, e, 0.0)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    probs = e / jnp.maximum(denom, jnp.float32(1e-30))  # (B, Hkv, rep, T, S) f32

    out = jnp.einsum(
        "bhrts,bhsd->bhrtd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)
    out = out.reshape(B, Hq, T, D)

    probs_kv = jnp.mean(probs, axis=2)  # (B, Hkv, T, S)
    return out, probs_kv


def attend_inflight(
    q: jax.Array,            # (B, Hq, 1, D), rotated
    k_new: jax.Array,        # (B, Hkv, 1, D) this step's key (rotated, uncached)
    v_new: jax.Array,        # (B, Hkv, 1, D)
    k: jax.Array,            # (B, Hkv, S, D) cached keys
    v: jax.Array,            # (B, Hkv, S, D)
    kv_pos: jax.Array,       # (B, Hkv, S) int32, -1 = invalid slot
    q_pos: jax.Array,        # (B,) int32, -1 = dead row
    *,
    sliding_window: Optional[int] = None,
    scale: Optional[float] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Single-token decode attention where the current token's K/V is NOT yet
    in the cache: its logit joins the softmax directly ("late write" — the
    engine scatters all layers' K/V into the cache in one batched write after
    the layer scan instead of per-layer scatters before attention).

    Returns (out (B, Hq, 1, D), probs_kv (B, Hkv, 1, S), p_new (B, Hkv, 1)):
    probs_kv covers the cached slots, p_new is the GQA-mean self-attention
    probability of the in-flight token. Together they are exactly the
    probability row the write-then-attend path produces.
    """
    B, Hq, T, D = q.shape
    assert T == 1
    Hkv = k.shape[1]
    rep = Hq // Hkv
    if scale is None:
        scale = 1.0 / (D ** 0.5)

    qg = q.reshape(B, Hkv, rep, D)
    logits = jnp.einsum(
        "bhrd,bhsd->bhrs", qg, k, preferred_element_type=jnp.float32
    ) * jnp.float32(scale)
    logit_new = jnp.einsum(
        "bhrd,bhsd->bhrs", qg, k_new, preferred_element_type=jnp.float32
    ) * jnp.float32(scale)                               # (B, Hkv, rep, 1)

    qp = q_pos[:, None, None]                            # (B, 1, 1)
    mask = (kv_pos >= 0) & (kv_pos <= qp)                # (B, Hkv, S)
    if sliding_window is not None:
        mask &= kv_pos > (qp - sliding_window)
    mask_r = mask[:, :, None, :]                         # (B, Hkv, 1, S)
    live = (q_pos >= 0)[:, None, None, None]             # (B, 1, 1, 1)

    logits = jnp.where(mask_r, logits, NEG_INF)
    logit_new = jnp.where(live, logit_new, NEG_INF)
    m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), logit_new)
    e = jnp.where(mask_r, jnp.exp(logits - m), 0.0)
    e_new = jnp.where(live, jnp.exp(logit_new - m), 0.0)
    denom = jnp.sum(e, axis=-1, keepdims=True) + e_new
    denom = jnp.maximum(denom, jnp.float32(1e-30))
    p = e / denom                                        # (B, Hkv, rep, S)
    p_new = e_new / denom                                # (B, Hkv, rep, 1)

    out = jnp.einsum(
        "bhrs,bhsd->bhrd", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    ) + p_new.astype(v.dtype) * v_new
    out = out.astype(v_new.dtype).reshape(B, Hq, 1, D)

    probs_kv = jnp.mean(p, axis=2)[:, :, None, :]        # (B, Hkv, 1, S)
    return out, probs_kv, jnp.mean(p_new, axis=2)        # p_new: (B, Hkv, 1)
