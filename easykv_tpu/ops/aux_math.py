"""Auxiliary score math from the reference, including the variants its main
path no longer calls (reference easykv/easykv.py:43-54, 137-171 — kept for
API completeness; `entropy` is the only one used by the reference hot path,
to log per-step confidence at easykv.py:279)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def relu_normalize(p: jax.Array, q: jax.Array) -> jax.Array:
    """Modified sampling distribution relu(p - q)/sum (reference easykv.py:43-48)."""
    t = jax.nn.relu(p - q)
    return t / jnp.sum(t, axis=-1, keepdims=True)


def entropy(p: jax.Array) -> jax.Array:
    """Shannon entropy along the last axis (reference easykv.py:50-54)."""
    logp = jnp.log(jnp.maximum(p, 1e-37))
    return -jnp.sum(p * logp, axis=-1)


def confidence(p: jax.Array) -> jax.Array:
    """exp(-entropy): the reference's per-step confidence proxy
    (easykv.py:279, cache_cur_probs)."""
    return jnp.exp(-entropy(p))


def h2o_head_decay_score(
    probs: jax.Array, decay_factor: float
) -> jax.Array:
    """Exponentially-decayed attention mass over query rows
    (reference h2o_head_decay_score, easykv.py:137-145; unused in the
    reference main path — relic of the `h2o_head_decay_avg_std` policy).

    probs: (..., R, S) per-row attention maps; rows weighted by
    decay_factor^(R-1-r) and scaled by (1 - decay_factor)."""
    R = probs.shape[-2]
    w = decay_factor ** jnp.arange(R - 1, -1, -1, dtype=jnp.float32)
    return jnp.einsum("...rs,r->...s", probs.astype(jnp.float32), w) * (
        1.0 - decay_factor
    )


def h2o_head_prob_score(
    probs: jax.Array, row_probs: jax.Array, mode: str = "v1"
) -> tuple[jax.Array, jax.Array]:
    """Token-probability-weighted attention mass (reference
    h2o_head_prob_score, easykv.py:158-171; unused in the main path).

    probs: (..., R, S); row_probs: (R,) sampled-token probabilities.
    mode 'v1' weights rows by (1 - p), 'v2' by p."""
    w = 1.0 - row_probs if mode == "v1" else row_probs
    weighted = probs.astype(jnp.float32) * w[..., :, None]
    return jnp.sum(weighted, axis=-2), jnp.sum(weighted**2, axis=-2)
