"""Sliding-window (Mistral) support in the Pallas kernels (VERDICT r3 #6).

The reference supports Mistral's windowed attention first-class
(reference mistral_patch.py:90-186 masks keys older than the window);
until r4 every kernel gate bailed to XLA when cfg.sliding_window was set.
These tests pin the in-kernel window mask (one extra compare per kernel)
to the XLA attention path, and the whole decode step (scan + mega) across
kernel on/off.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from easykv_tpu import flags
from easykv_tpu.ops.attention import attend, attend_inflight

W = 12  # window under test


def _rand_case(rng, B, Hq, Hkv, S, D, C=1):
    q = jnp.asarray(rng.normal(size=(B, Hq, C, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    pos = rng.integers(0, 40, size=(B, Hkv, S)).astype(np.int32)
    pos[:, :, ::7] = -1
    return q, k, v, jnp.asarray(pos)


@pytest.mark.parametrize("rep,S", [(1, 24), (4, 130)])
def test_decode_attend_window_matches_xla(rep, S):
    from easykv_tpu.ops.pallas.decode_attention import fused_decode_attend

    B, Hkv, D = 2, 2, 128
    rng = np.random.default_rng(0)
    q, k, v, kv_pos = _rand_case(rng, B, Hkv * rep, Hkv, S, D)
    q_pos = jnp.asarray([30, 35], jnp.int32)

    ref_out, ref_probs = attend(q, k, v, kv_pos, q_pos[:, None],
                                sliding_window=W)
    out, probs = fused_decode_attend(q, k, v, kv_pos, q_pos,
                                     sliding_window=W, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(ref_probs),
                               atol=1e-6, rtol=1e-5)
    # out-of-window slots carry exactly zero probability
    p = np.asarray(probs)
    outside = np.asarray(kv_pos) <= (np.asarray(q_pos)[:, None, None] - W)
    assert (p[:, :, 0, :][outside] == 0).all()


@pytest.mark.parametrize("streaming", [False, True])
def test_decode_inflight_window_matches_xla(streaming):
    from easykv_tpu.ops.pallas.decode_attention import (
        fused_decode_attend_inflight,
    )

    B, Hkv, rep, S, D = 2, 2, 4, 130, 128
    rng = np.random.default_rng(1)
    q, k, v, kv_pos = _rand_case(rng, B, Hkv * rep, Hkv, S, D)
    kn = jnp.asarray(rng.normal(size=(B, Hkv, 1, D)), jnp.float32)
    vn = jnp.asarray(rng.normal(size=(B, Hkv, 1, D)), jnp.float32)
    q_pos = jnp.asarray([30, 35], jnp.int32)
    kw = {}
    if streaming:
        # rank-rotation path: rotate the XLA reference's K identically
        from easykv_tpu.ops.rope import apply_rope, rope_inv_freq

        inv_freq = rope_inv_freq(D, 10000.0)
        rank = jnp.argsort(jnp.argsort(kv_pos, axis=-1), axis=-1)
        kw = dict(rank=rank, inv_freq=inv_freq)
        k_ref = apply_rope(k, rank, inv_freq)
    else:
        k_ref = k

    ref = attend_inflight(q, kn, vn, k_ref, v, kv_pos, q_pos,
                          sliding_window=W)
    got = fused_decode_attend_inflight(q, kn, vn, k, v, kv_pos, q_pos,
                                       sliding_window=W, interpret=True,
                                       **kw)
    for r, g, tol in zip(ref, got, (1e-3, 1e-5, 1e-5)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=tol, rtol=1e-3)


@pytest.mark.parametrize("quantized", [False, True])
def test_chunk_attend_window_matches_xla(quantized):
    from easykv_tpu.cache import quantize_kv
    from easykv_tpu.ops.pallas.chunk_attention import fused_chunk_attend

    B, Hkv, rep, C, S, D = 2, 2, 2, 8, 130, 128
    Hq = Hkv * rep
    rng = np.random.default_rng(2)
    q, k, v, _ = _rand_case(rng, B, Hq, Hkv, S, D, C=C)
    pos = rng.integers(0, 60, size=(B, Hkv, S)).astype(np.int32)
    pos[:, :, ::7] = -1
    pos[:, :, :C] = 60 + np.arange(C)
    kv_pos = jnp.asarray(pos)
    q_pos = jnp.broadcast_to(
        60 + jnp.arange(C, dtype=jnp.int32)[None, :], (B, C))

    kw = {}
    if quantized:
        kq, ks = quantize_kv(k)
        vq, vs = quantize_kv(v)
        k_ref = kq.astype(jnp.float32) * ks[..., None]
        v_ref = vq.astype(jnp.float32) * vs[..., None]
        k, v = kq, vq
        kw = dict(k_scale=ks, v_scale=vs)
    else:
        k_ref, v_ref = k, v

    ref_out, ref_probs = attend(q, k_ref, v_ref, kv_pos, q_pos,
                                sliding_window=W)
    out, ssum, ssq, last = fused_chunk_attend(
        q, k, v, kv_pos, q_pos, sliding_window=W, interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ssum),
                               np.asarray(jnp.sum(ref_probs, axis=2)),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(last),
                               np.asarray(ref_probs[:, :, -1, :]),
                               atol=1e-6, rtol=1e-4)


def test_chunk_attend_window_flash_path(monkeypatch):
    """The 2-pass flash variant applies the window identically (S forced
    past the one-pass VMEM gate)."""
    import easykv_tpu.ops.pallas.chunk_attention as ca

    monkeypatch.setattr(ca, "_ONEPASS_VMEM_CAP", 1)
    B, Hkv, rep, C, S, D = 1, 2, 2, 8, 256, 128
    rng = np.random.default_rng(3)
    q, k, v, _ = _rand_case(rng, B, Hkv * rep, Hkv, S, D, C=C)
    pos = rng.integers(0, 60, size=(B, Hkv, S)).astype(np.int32)
    pos[:, :, ::5] = -1
    kv_pos = jnp.asarray(pos)
    q_pos = jnp.broadcast_to(
        60 + jnp.arange(C, dtype=jnp.int32)[None, :], (B, C))
    ref_out, ref_probs = attend(q, k, v, kv_pos, q_pos, sliding_window=W)
    out, ssum, _, _ = ca.fused_chunk_attend.__wrapped__(
        q, k, v, kv_pos, q_pos, k_scale=None, v_scale=None,
        interpret=True, need_scores=True, sliding_window=W)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ssum),
                               np.asarray(jnp.sum(ref_probs, axis=2)),
                               atol=1e-5, rtol=1e-4)


def _mistral_setup():
    """Tiny Mistral-shaped model (GQA + sliding window) + a prefilled cache."""
    from easykv_tpu.cache import init_cache
    from easykv_tpu.config import ModelConfig
    from easykv_tpu.models import llama
    from easykv_tpu.models.llama import StepCtx, forward
    from easykv_tpu.ops.quant import (
        fuse_gemv_params,
        materialize_params,
        quantize_params_int4,
    )

    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, sliding_window=6,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    qp = quantize_params_int4(params, group_size=16, layout="arith")
    qp = fuse_gemv_params(qp)
    qp = materialize_params(qp)
    cache = init_cache(cfg.num_hidden_layers, 1, 2, 32, cfg.head_dim,
                       dtype=jnp.float32)
    T = 8
    ids = jnp.asarray(
        np.random.default_rng(1).integers(1, 60, (1, T)), jnp.int32)
    ctx = StepCtx(
        q_pos=jnp.arange(T, dtype=jnp.int32)[None],
        token_valid=jnp.ones((1, T), bool),
        counter_init=jnp.zeros((1, T), jnp.float32),
        next_pos=jnp.array([T], jnp.int32),
        prompt_len=jnp.array([T], jnp.int32),
        evict_gate=jnp.array([False]),
        update_gate=jnp.array(False),
        rand_rank=jnp.zeros((1,), jnp.int32),
    )
    flags.use_pallas(False)
    try:
        _, cache = forward(qp, cfg, cache, ids, ctx, None)
    finally:
        flags.use_pallas(None)
    return cfg, qp, cache, forward, StepCtx


def test_mistral_decode_step_kernel_parity(monkeypatch):
    """Whole decode step with sliding_window set: XLA (kernels off) ==
    inflight kernel (mega off) == mega kernel. With window=6 < the 9
    cached positions, the mask is ACTIVE at the tested step."""
    from easykv_tpu.policies import PHASE_DECODE, PolicySpec

    cfg, qp, cache, forward, StepCtx = _mistral_setup()
    tok = jnp.asarray([[7]], jnp.int32)
    dctx = StepCtx(
        q_pos=jnp.array([[8]], jnp.int32),
        token_valid=jnp.ones((1, 1), bool),
        counter_init=jnp.zeros((1, 1), jnp.float32),
        next_pos=jnp.array([9], jnp.int32),
        prompt_len=jnp.array([8], jnp.int32),
        evict_gate=jnp.array([False]),
        update_gate=jnp.array(True),
        rand_rank=jnp.zeros((1,), jnp.int32),
    )
    spec = PolicySpec(policy="roco", phase=PHASE_DECODE, k=1,
                      sink_length=2, recent_window=2, feasible_k=4)

    flags.use_pallas(False)
    try:
        ref_logits, ref_cache = forward(qp, cfg, cache, tok, dctx, spec)
    finally:
        flags.use_pallas(None)

    flags.use_pallas(True)
    try:
        monkeypatch.setenv("EASYKV_TPU_MEGA", "0")
        scan_logits, scan_cache = forward(qp, cfg, cache, tok, dctx, spec)
        monkeypatch.setenv("EASYKV_TPU_MEGA", "1")
        mega_logits, mega_cache = forward(qp, cfg, cache, tok, dctx, spec)
    finally:
        flags.use_pallas(None)

    tol = dict(atol=2e-3, rtol=2e-3)
    for name, logits, cache_got in (("scan", scan_logits, scan_cache),
                                    ("mega", mega_logits, mega_cache)):
        np.testing.assert_allclose(np.asarray(logits),
                                   np.asarray(ref_logits),
                                   err_msg=name, **tol)
        for fname, a, b in zip(ref_cache._fields, ref_cache, cache_got):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       err_msg=f"{name}.{fname}", **tol)


def test_mistral_window_actually_masks():
    """Sanity: the windowed step differs from the unwindowed one (the mask
    is not vacuous at these shapes)."""
    import dataclasses

    from easykv_tpu.policies import PHASE_DECODE, PolicySpec

    cfg, qp, cache, forward, StepCtx = _mistral_setup()
    cfg_nw = dataclasses.replace(cfg, sliding_window=None)
    tok = jnp.asarray([[7]], jnp.int32)
    dctx = StepCtx(
        q_pos=jnp.array([[8]], jnp.int32),
        token_valid=jnp.ones((1, 1), bool),
        counter_init=jnp.zeros((1, 1), jnp.float32),
        next_pos=jnp.array([9], jnp.int32),
        prompt_len=jnp.array([8], jnp.int32),
        evict_gate=jnp.array([False]),
        update_gate=jnp.array(False),
        rand_rank=jnp.zeros((1,), jnp.int32),
    )
    flags.use_pallas(False)
    try:
        lw, _ = forward(qp, cfg, cache, tok, dctx, None)
        ln, _ = forward(qp, cfg_nw, cache, tok, dctx, None)
    finally:
        flags.use_pallas(None)
    assert not np.allclose(np.asarray(lw), np.asarray(ln), atol=1e-5)
