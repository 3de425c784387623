"""One-pallas-call decode step (ops/pallas/fused_decode) vs the per-layer
scan: same logits and same cache trajectory, interpret mode on CPU f32.

The mega kernel reimplements the whole _decode_forward layer body (RMSNorm,
arith-int4 GEMVs, RoPE, late-write inflight attention with GQA-mean prob
emission) in one kernel; these tests pin it to the scan path's outputs on
both bf16-free f32 caches and the int8 compressed-KV cache, GQA included
(rep = 2)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from easykv_tpu import flags
from easykv_tpu.cache import init_cache
from easykv_tpu.config import ModelConfig
from easykv_tpu.models import llama
from easykv_tpu.models.llama import StepCtx, forward
from easykv_tpu.ops.quant import (
    fuse_gemv_params,
    materialize_params,
    quantize_params_int4,
)
from easykv_tpu.policies import PHASE_DECODE, PolicySpec


def _build(kv_quant):
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    qp = quantize_params_int4(params, group_size=16, layout="arith")
    qp = fuse_gemv_params(qp)
    qp = materialize_params(qp)
    assert "gs3" in qp["layers"]["wqkv"]
    cache = init_cache(cfg.num_hidden_layers, 1, 2, 32, cfg.head_dim,
                       dtype=jnp.float32, quantized=kv_quant)
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
    _, cache = forward(qp, cfg, cache, ids, ctx, None)
    return cfg, qp, cache


@pytest.mark.parametrize("kv_quant", [False, True])
@pytest.mark.parametrize("a8", [False, True])
def test_fused_decode_step_matches_scan(kv_quant, a8, monkeypatch):
    # a8 = int8-MXU two-plane activation feed: quantizes activations to
    # ~2^-14 relative (tighter than bf16 but not f32-exact), so the bar
    # loosens slightly vs the mixed-feed mode's f32 path.
    monkeypatch.setenv("EASYKV_TPU_MEGA_A8", "1" if a8 else "0")
    tol = dict(atol=1e-3, rtol=1e-3) if a8 else dict(atol=1e-4, rtol=1e-4)
    cfg, qp, cache = _build(kv_quant)
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
                      sink_length=4, recent_window=2, feasible_k=4)
    flags.use_pallas(True)
    try:
        monkeypatch.setenv("EASYKV_TPU_MEGA", "0")
        ref_logits, ref_cache = forward(qp, cfg, cache, tok, dctx, spec)
        monkeypatch.setenv("EASYKV_TPU_MEGA", "1")
        got_logits, got_cache = forward(qp, cfg, cache, tok, dctx, spec)
    finally:
        flags.use_pallas(None)
    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(ref_logits), **tol)
    for name, a, b in zip(ref_cache._fields, ref_cache, got_cache):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), err_msg=name, **tol)
