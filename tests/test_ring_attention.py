"""Ring attention (sequence-parallel prefill) vs single-device causal
attention + per-key score-sum parity, on the 8-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from easykv_tpu.ops.ring_attention import ring_attention, ring_attention_scores

pytestmark = pytest.mark.skipif(
    jax.device_count() < 4, reason="needs >= 4 devices"
)


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("sp",))


def _reference(q, k, v, q_pos):
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    mask = q_pos[:, None, None, :] >= q_pos[:, None, :, None].transpose(0, 1, 3, 2)
    mask = q_pos[:, None, :, None] >= q_pos[:, None, None, :]  # (B,1,Tq,Tk)
    logits = jnp.where(mask, logits, -1e30)
    p = jax.nn.softmax(logits, axis=-1)
    p = jnp.where(mask, p, 0.0)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, v)
    return out, jnp.sum(p, axis=2), jnp.sum(p * p, axis=2)


def test_ring_attention_matches_reference():
    n = 4
    mesh = _mesh(n)
    B, H, T, D = 2, 3, 32, 16
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, T, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, T, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, T, D)).astype(np.float32))
    q_pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))

    ref_out, ref_ssum, ref_ssq = _reference(q, k, v, q_pos)

    sh = NamedSharding(mesh, P(None, None, "sp", None))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
    ps = jax.device_put(q_pos, NamedSharding(mesh, P(None, "sp")))

    out, ssum, ssq = ring_attention(qs, ks, vs, ps, mesh, collect_scores=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ssum), np.asarray(ref_ssum),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ssq), np.asarray(ref_ssq),
                               atol=1e-6, rtol=1e-4)


def test_ring_scores_alignment():
    """The traveling accumulator must land back on its home shard — key j's
    score is at global index j."""
    n = 4
    mesh = _mesh(n)
    B, H, T, D = 1, 1, 16, 8
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(B, H, T, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, T, D)).astype(np.float32))
    q_pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    sh = NamedSharding(mesh, P(None, None, "sp", None))
    ssum, _ = ring_attention_scores(
        jax.device_put(q, sh), jax.device_put(k, sh),
        jax.device_put(q_pos, NamedSharding(mesh, P(None, "sp"))), mesh,
    )
    _, ref_ssum, _ = _reference(q, k, k, q_pos)
    np.testing.assert_allclose(np.asarray(ssum), np.asarray(ref_ssum),
                               atol=1e-5, rtol=1e-4)
    # column sums: total attention mass = number of queries attending
    np.testing.assert_allclose(np.asarray(ssum).sum(), T, rtol=1e-5)
