"""Sampling layer: temperature + nucleus (top-p) renormalization and the
categorical draw, all on device.

`logits_adapter` reproduces the reference's exact nucleus semantics
(reference easykv/easykv.py:115-134): probabilities are sorted descending,
entries are kept while (cumsum - p) <= top_p — i.e. the first token crossing
top_p is kept — then renormalized and unsorted. Greedy decoding is emulated
with temperature ~ 1e-9 like the reference scripts (test_decoding.py:41).

Unlike the reference, the draw itself stays on device inside the generation
loop (no per-token host sync; the reference syncs ~6x per token, SURVEY §3.2).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def logits_adapter(
    logits: jax.Array, temperature: float, top_p: float
) -> Tuple[jax.Array, jax.Array]:
    """logits (..., V) f32 -> (filtered_probs, raw_probs), both (..., V) f32."""
    logits = logits.astype(jnp.float32)
    raw = jax.nn.softmax(logits, axis=-1)
    temp = jnp.maximum(jnp.float32(temperature), jnp.float32(1e-10))
    prob = jax.nn.softmax(logits / temp, axis=-1)
    order = jnp.argsort(-prob, axis=-1)
    sorted_prob = jnp.take_along_axis(prob, order, axis=-1)
    cumsum = jnp.cumsum(sorted_prob, axis=-1)
    keep = (cumsum - sorted_prob) <= jnp.float32(top_p)
    sorted_prob = jnp.where(keep, sorted_prob, 0.0)
    sorted_prob = sorted_prob / jnp.sum(sorted_prob, axis=-1, keepdims=True)
    inv = jnp.argsort(order, axis=-1)
    filtered = jnp.take_along_axis(sorted_prob, inv, axis=-1)
    return filtered, raw


def sample_token(key: jax.Array, filtered_probs: jax.Array) -> jax.Array:
    """Multinomial draw from the filtered distribution. (..., V) -> (...)"""
    logp = jnp.log(jnp.maximum(filtered_probs, jnp.float32(1e-37)))
    logp = jnp.where(filtered_probs > 0, logp, -jnp.inf)
    return jax.random.categorical(key, logp, axis=-1).astype(jnp.int32)
