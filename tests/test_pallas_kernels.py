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


@pytest.mark.parametrize("rep,S", [(1, 24), (4, 130), (8, 256)])
def test_fused_decode_attend_inflight_matches_xla(rep, S):
    from easykv_tpu.ops.attention import attend_inflight
    from easykv_tpu.ops.pallas.decode_attention import fused_decode_attend_inflight

    B, Hkv, D = 2, 2, 128
    Hq = Hkv * rep
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(B, Hq, 1, D)), jnp.float32)
    kn = jnp.asarray(rng.normal(size=(B, Hkv, 1, D)), jnp.float32)
    vn = jnp.asarray(rng.normal(size=(B, Hkv, 1, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    pos = rng.integers(0, 40, size=(B, Hkv, S)).astype(np.int32)
    pos[:, :, ::7] = -1
    kv_pos = jnp.asarray(pos)
    q_pos = jnp.asarray([30, 35], jnp.int32)

    ref_out, ref_probs, ref_pnew = attend_inflight(q, kn, vn, k, v, kv_pos, q_pos)
    out, probs, pnew = fused_decode_attend_inflight(
        q, kn, vn, k, v, kv_pos, q_pos, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(ref_probs),
                               atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pnew), np.asarray(ref_pnew),
                               atol=1e-6, rtol=1e-5)


def test_inflight_equals_write_then_attend():
    """Late-write semantics: in-flight attention == write the token into a
    free slot first, then run plain cached attention."""
    from easykv_tpu.ops.attention import attend_inflight

    B, Hkv, rep, S, D = 1, 2, 2, 32, 64
    Hq = Hkv * rep
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(B, Hq, 1, D)), jnp.float32)
    kn = jnp.asarray(rng.normal(size=(B, Hkv, 1, D)), jnp.float32)
    vn = jnp.asarray(rng.normal(size=(B, Hkv, 1, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    pos = np.arange(S, dtype=np.int32)[None, None, :].repeat(Hkv, 1)
    pos = np.broadcast_to(pos, (B, Hkv, S)).copy()
    pos[:, :, 5] = -1  # free slot the write would land in
    q_pos = jnp.asarray([S], jnp.int32)

    out_i, probs_i, p_new = attend_inflight(q, kn, vn, k, v, jnp.asarray(pos), q_pos)

    k_w = k.at[:, :, 5:6, :].set(kn)
    v_w = v.at[:, :, 5:6, :].set(vn)
    pos_w = pos.copy()
    pos_w[:, :, 5] = S
    out_w, probs_w = attend(q, k_w, v_w, jnp.asarray(pos_w), q_pos[:, None])

    np.testing.assert_allclose(np.asarray(out_i), np.asarray(out_w),
                               atol=1e-5, rtol=1e-5)
    exp = np.asarray(probs_w).copy()
    got = np.asarray(probs_i).copy()
    np.testing.assert_allclose(got[:, :, 0, 5], 0.0)  # free slot: zero in-flight
    np.testing.assert_allclose(np.asarray(p_new)[:, :, 0], exp[:, :, 0, 5],
                               atol=1e-6)
    exp[:, :, 0, 5] = 0.0
    np.testing.assert_allclose(got, exp, atol=1e-6)


def test_dead_row_inflight_zero():
    from easykv_tpu.ops.attention import attend_inflight

    B, Hkv, rep, S, D = 2, 1, 1, 16, 32
    rng = np.random.default_rng(3)
    mk = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
    q, kn, vn = mk(B, Hkv, 1, D), mk(B, Hkv, 1, D), mk(B, Hkv, 1, D)
    k, v = mk(B, Hkv, S, D), mk(B, Hkv, S, D)
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, Hkv, S))
    q_pos = jnp.asarray([S, -1], jnp.int32)  # row 1 dead
    out, probs, p_new = attend_inflight(q, kn, vn, k, v, pos, q_pos)
    assert np.all(np.asarray(probs)[1] == 0)
    assert np.all(np.asarray(p_new)[1] == 0)
    assert np.all(np.asarray(out)[1] == 0)
