"""Rotary position embeddings, computed functionally from position ids.

Unlike the reference, which pre-materializes cos/sin caches inside each
attention module and re-slices them per step (reference llama_patch.py:186-191),
we compute cos/sin directly from the (traced) position ids — XLA fuses the
transcendentals into the surrounding elementwise ops, there is no cache to
resize, and positions larger than the physical KV budget "just work" (the
post-eviction position-id overflow the reference patches around).

DynamicNTK scaling follows `set_dynamicntk_rope_length`
(reference utils.py:53-57): the effective base is fixed once from a
configured target length, rather than drifting with the current seq len.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import ModelConfig


def rope_base_for(cfg: ModelConfig) -> float:
    """Effective RoPE base, with DynamicNTK adjustment baked in.

    HF DynamicNTK: base' = theta * (factor * L / L_max - (factor - 1))^(d/(d-2))
    when the pinned length L exceeds max_position_embeddings.
    """
    base = cfg.rope_theta
    if cfg.rope_scaling_type == "dynamic" and cfg.rope_ntk_length:
        L, Lmax = cfg.rope_ntk_length, cfg.max_position_embeddings
        if L > Lmax:
            f = cfg.rope_scaling_factor
            d = cfg.head_dim
            base = base * ((f * L / Lmax) - (f - 1)) ** (d / (d - 2))
    return float(base)


def rope_inv_freq(head_dim: int, base: float) -> jax.Array:
    """(head_dim//2,) inverse frequencies, float32."""
    exponents = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    return 1.0 / (base ** exponents)


def apply_rope(x: jax.Array, positions: jax.Array, inv_freq: jax.Array) -> jax.Array:
    """Rotate `x` by `positions`.

    x:         (..., T, head_dim)
    positions: broadcastable to (..., T) int32 — per-element position ids.
               Negative positions (invalid slots) are treated as 0; the slot
               is masked out downstream anyway.
    inv_freq:  (head_dim//2,)

    Uses the HF "rotate_half" convention: x split into two halves
    [x1, x2] -> [x1*cos - x2*sin, x2*cos + x1*sin].
    """
    pos = jnp.maximum(positions, 0).astype(jnp.float32)
    angles = pos[..., None] * inv_freq  # (..., T, head_dim//2)
    cos = jnp.cos(angles)
    sin = jnp.sin(angles)
    d2 = x.shape[-1] // 2
    x1 = x[..., :d2].astype(jnp.float32)
    x2 = x[..., d2:].astype(jnp.float32)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


# --- Experimental RoPE variants -------------------------------------------
# Parity stubs for the reference's unused Self-Extend-style experiments
# (reference llama_patch.py:31-44, 101-122) — grouped, neighbor and identical
# rotary application. Not used by any engine mode.


def apply_grouped_rope(
    x: jax.Array, positions: jax.Array, inv_freq: jax.Array, group_size: int
) -> jax.Array:
    """Self-Extend grouped positions: rotate by positions // group_size."""
    return apply_rope(x, positions // group_size, inv_freq)


def apply_neighbor_rope(
    x: jax.Array, positions: jax.Array, inv_freq: jax.Array, window: int
) -> jax.Array:
    """Clamp relative distance: rotate by min(position, window)."""
    return apply_rope(x, jnp.minimum(positions, window), inv_freq)


def apply_identical_rope(x: jax.Array, inv_freq: jax.Array) -> jax.Array:
    """Rotate every element by position 0 (i.e. no rotation)."""
    return apply_rope(x, jnp.zeros(x.shape[:-1], jnp.int32), inv_freq)
