"""Pallas kernel parity vs the XLA reference path (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from easykv_tpu.ops.attention import attend
from easykv_tpu.ops.pallas.decode_attention import fused_decode_attend


@pytest.mark.parametrize("rep,S", [(1, 24), (4, 130), (8, 256)])
def test_fused_decode_attend_matches_xla(rep, S):
    B, Hkv, D = 2, 2, 128
    Hq = Hkv * rep
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, Hq, 1, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    # ring-buffer-like positions: some invalid, some future (> q_pos)
    pos = rng.integers(0, 40, size=(B, Hkv, S)).astype(np.int32)
    pos[:, :, ::7] = -1
    kv_pos = jnp.asarray(pos)
    q_pos = jnp.asarray([30, 35], jnp.int32)

    ref_out, ref_probs = attend(q, k, v, kv_pos, q_pos[:, None])
    out, probs = fused_decode_attend(q, k, v, kv_pos, q_pos, interpret=True)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(ref_probs),
                               atol=1e-6, rtol=1e-5)
    # masked slots carry exactly zero probability
    p = np.asarray(probs)
    masked = (pos < 0) | (pos > np.asarray(q_pos)[:, None, None])
    assert (p[:, :, 0, :][masked] == 0).all()
