"""Batched one-pallas-call decode step (ops/pallas/fused_decode_batch) vs
the per-layer scan: same logits and same cache trajectory, interpret mode
on CPU f32.

B=3 exercises the Bp=8 sublane padding (padded rows must stay zero and
never leak into real rows), GQA (rep = 2) the reshaped per-head q slices,
and a dead row (q_pos = -1, token_valid False) the live-masking — all
against the scan path, which is itself oracle-locked."""
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

B = 3


def _build(kv_quant, sliding_window=None, batch=B):
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, sliding_window=sliding_window,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    qp = quantize_params_int4(params, group_size=16, layout="arith")
    qp = fuse_gemv_params(qp)
    qp = materialize_params(qp)
    assert "gs3" in qp["layers"]["wqkv"]
    cache = init_cache(cfg.num_hidden_layers, batch, 2, 32, cfg.head_dim,
                       dtype=jnp.float32, quantized=kv_quant)
    T = 8
    ids = jnp.asarray(
        np.random.default_rng(1).integers(1, 60, (batch, T)), jnp.int32)
    ctx = StepCtx(
        q_pos=jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None],
                               (batch, T)),
        token_valid=jnp.ones((batch, T), bool),
        counter_init=jnp.zeros((batch, T), jnp.float32),
        next_pos=jnp.full((batch,), T, jnp.int32),
        prompt_len=jnp.full((batch,), T, jnp.int32),
        evict_gate=jnp.zeros((batch,), bool),
        update_gate=jnp.array(False),
        rand_rank=jnp.zeros((batch,), jnp.int32),
    )
    _, cache = forward(qp, cfg, cache, ids, ctx, None)
    return cfg, qp, cache


@pytest.mark.parametrize("kv_quant", [False, True])
@pytest.mark.parametrize("sliding_window", [None, 6])
def test_fused_decode_batch_matches_scan(kv_quant, sliding_window,
                                         monkeypatch):
    cfg, qp, cache = _build(kv_quant, sliding_window)
    tok = jnp.asarray([[7], [11], [3]], jnp.int32)
    dctx = StepCtx(
        q_pos=jnp.asarray([[8], [8], [-1]], jnp.int32),  # row 2 dead
        token_valid=jnp.asarray([[True], [True], [False]]),
        counter_init=jnp.zeros((B, 1), jnp.float32),
        next_pos=jnp.asarray([9, 9, 8], jnp.int32),
        prompt_len=jnp.full((B,), 8, jnp.int32),
        evict_gate=jnp.zeros((B,), bool),
        update_gate=jnp.array(True),
        rand_rank=jnp.zeros((B,), jnp.int32),
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
    tol = dict(atol=1e-4, rtol=1e-4)
    # dead row's logits are unspecified (engine gates sampling on
    # token_valid); compare live rows only
    np.testing.assert_allclose(
        np.asarray(got_logits)[:2], np.asarray(ref_logits)[:2], **tol)
    for name, a, b in zip(ref_cache._fields, ref_cache, got_cache):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), err_msg=name, **tol)


def test_mega_batch_unpadded(monkeypatch):
    # B == 8 hits the Bp == B branch (no sublane padding, no dead scratch
    # rows); parity on logits for all rows
    nb = 8
    cfg, qp, cache = _build(False, batch=nb)
    tok = jnp.asarray(
        np.random.default_rng(3).integers(1, 60, (nb, 1)), jnp.int32)
    dctx = StepCtx(
        q_pos=jnp.full((nb, 1), 8, jnp.int32),
        token_valid=jnp.ones((nb, 1), bool),
        counter_init=jnp.zeros((nb, 1), jnp.float32),
        next_pos=jnp.full((nb,), 9, jnp.int32),
        prompt_len=jnp.full((nb,), 8, jnp.int32),
        evict_gate=jnp.zeros((nb,), bool),
        update_gate=jnp.array(True),
        rand_rank=jnp.zeros((nb,), jnp.int32),
    )
    flags.use_pallas(True)
    try:
        monkeypatch.setenv("EASYKV_TPU_MEGA", "0")
        ref_logits, _ = forward(qp, cfg, cache, tok, dctx, None)
        monkeypatch.setenv("EASYKV_TPU_MEGA", "1")
        got_logits, _ = forward(qp, cfg, cache, tok, dctx, None)
    finally:
        flags.use_pallas(None)
    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(ref_logits),
        atol=1e-4, rtol=1e-4)


def test_mega_batch_cg_chunking(monkeypatch):
    # CG=2 forces multi-chunk LHS regions incl. a remainder chunk
    # (gch=4 at group_size 16, hidden 64 -> khq/128 ... exercised via env)
    monkeypatch.setenv("EASYKV_TPU_MEGAB_CG", "2")
    cfg, qp, cache = _build(False)
    tok = jnp.asarray([[7], [11], [3]], jnp.int32)
    dctx = StepCtx(
        q_pos=jnp.full((B, 1), 8, jnp.int32),
        token_valid=jnp.ones((B, 1), bool),
        counter_init=jnp.zeros((B, 1), jnp.float32),
        next_pos=jnp.full((B,), 9, jnp.int32),
        prompt_len=jnp.full((B,), 8, jnp.int32),
        evict_gate=jnp.zeros((B,), bool),
        update_gate=jnp.array(True),
        rand_rank=jnp.zeros((B,), jnp.int32),
    )
    flags.use_pallas(True)
    try:
        monkeypatch.setenv("EASYKV_TPU_MEGA", "0")
        ref_logits, _ = forward(qp, cfg, cache, tok, dctx, None)
        monkeypatch.setenv("EASYKV_TPU_MEGA", "1")
        got_logits, _ = forward(qp, cfg, cache, tok, dctx, None)
    finally:
        flags.use_pallas(None)
    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(ref_logits), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("kv_quant", [False, True])
def test_mega_batch_mha_fast_path(kv_quant, monkeypatch):
    # rep == 1 (MHA) rides the vectorized all-B attention epilogue — the
    # 7B/13B serving shape class; parity vs the scan incl. a dead row and
    # Bp padding (B=3 -> Bp=8)
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(2))
    qp = quantize_params_int4(params, group_size=16, layout="arith")
    qp = fuse_gemv_params(qp)
    qp = materialize_params(qp)
    cache = init_cache(cfg.num_hidden_layers, B, 4, 32, cfg.head_dim,
                       dtype=jnp.float32, quantized=kv_quant)
    T = 8
    ids = jnp.asarray(
        np.random.default_rng(4).integers(1, 60, (B, T)), jnp.int32)
    ctx = StepCtx(
        q_pos=jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T)),
        token_valid=jnp.ones((B, T), bool),
        counter_init=jnp.zeros((B, T), jnp.float32),
        next_pos=jnp.full((B,), T, jnp.int32),
        prompt_len=jnp.full((B,), T, jnp.int32),
        evict_gate=jnp.zeros((B,), bool),
        update_gate=jnp.array(False),
        rand_rank=jnp.zeros((B,), jnp.int32),
    )
    _, cache = forward(qp, cfg, cache, ids, ctx, None)
    tok = jnp.asarray([[7], [11], [3]], jnp.int32)
    dctx = StepCtx(
        q_pos=jnp.asarray([[8], [8], [-1]], jnp.int32),  # row 2 dead
        token_valid=jnp.asarray([[True], [True], [False]]),
        counter_init=jnp.zeros((B, 1), jnp.float32),
        next_pos=jnp.asarray([9, 9, 8], jnp.int32),
        prompt_len=jnp.full((B,), 8, jnp.int32),
        evict_gate=jnp.zeros((B,), bool),
        update_gate=jnp.array(True),
        rand_rank=jnp.zeros((B,), jnp.int32),
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
    tol = dict(atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(got_logits)[:2], np.asarray(ref_logits)[:2], **tol)
    for name, a, b in zip(ref_cache._fields, ref_cache, got_cache):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), err_msg=name, **tol)


def test_mega_batch_flash_tiles(monkeypatch):
    # NT>1 S-tiled flash attention (the B=16 VMEM path) vs the scan, on the
    # MHA config (rep==1 is the only S-tiled path); forced via the NT
    # override so tiny test shapes exercise the tile seams
    monkeypatch.setenv("EASYKV_TPU_MEGAB_NT", "2")
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(3))
    qp = quantize_params_int4(params, group_size=16, layout="arith")
    qp = fuse_gemv_params(qp)
    qp = materialize_params(qp)
    cache = init_cache(cfg.num_hidden_layers, B, 4, 32, cfg.head_dim,
                       dtype=jnp.float32, quantized=True)
    T = 8
    ids = jnp.asarray(
        np.random.default_rng(6).integers(1, 60, (B, T)), jnp.int32)
    ctx = StepCtx(
        q_pos=jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T)),
        token_valid=jnp.ones((B, T), bool),
        counter_init=jnp.zeros((B, T), jnp.float32),
        next_pos=jnp.full((B,), T, jnp.int32),
        prompt_len=jnp.full((B,), T, jnp.int32),
        evict_gate=jnp.zeros((B,), bool),
        update_gate=jnp.array(False),
        rand_rank=jnp.zeros((B,), jnp.int32),
    )
    _, cache = forward(qp, cfg, cache, ids, ctx, None)
    tok = jnp.asarray([[7], [11], [3]], jnp.int32)
    dctx = StepCtx(
        q_pos=jnp.asarray([[8], [8], [-1]], jnp.int32),  # row 2 dead
        token_valid=jnp.asarray([[True], [True], [False]]),
        counter_init=jnp.zeros((B, 1), jnp.float32),
        next_pos=jnp.asarray([9, 9, 8], jnp.int32),
        prompt_len=jnp.full((B,), 8, jnp.int32),
        evict_gate=jnp.zeros((B,), bool),
        update_gate=jnp.array(True),
        rand_rank=jnp.zeros((B,), jnp.int32),
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
    tol = dict(atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(got_logits)[:2], np.asarray(ref_logits)[:2], **tol)
    for name, a, b in zip(ref_cache._fields, ref_cache, got_cache):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), err_msg=name, **tol)


def test_mega_batch_b16(monkeypatch):
    # B=16 (the lifted gate): MHA config, parity on logits for all rows
    nb = 16
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(4))
    qp = quantize_params_int4(params, group_size=16, layout="arith")
    qp = fuse_gemv_params(qp)
    qp = materialize_params(qp)
    cache = init_cache(cfg.num_hidden_layers, nb, 4, 32, cfg.head_dim,
                       dtype=jnp.float32)
    T = 8
    ids = jnp.asarray(
        np.random.default_rng(8).integers(1, 60, (nb, T)), jnp.int32)
    ctx = StepCtx(
        q_pos=jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None],
                               (nb, T)),
        token_valid=jnp.ones((nb, T), bool),
        counter_init=jnp.zeros((nb, T), jnp.float32),
        next_pos=jnp.full((nb,), T, jnp.int32),
        prompt_len=jnp.full((nb,), T, jnp.int32),
        evict_gate=jnp.zeros((nb,), bool),
        update_gate=jnp.array(False),
        rand_rank=jnp.zeros((nb,), jnp.int32),
    )
    _, cache = forward(qp, cfg, cache, ids, ctx, None)
    tok = jnp.asarray(
        np.random.default_rng(9).integers(1, 60, (nb, 1)), jnp.int32)
    dctx = StepCtx(
        q_pos=jnp.full((nb, 1), 8, jnp.int32),
        token_valid=jnp.ones((nb, 1), bool),
        counter_init=jnp.zeros((nb, 1), jnp.float32),
        next_pos=jnp.full((nb,), 9, jnp.int32),
        prompt_len=jnp.full((nb,), 8, jnp.int32),
        evict_gate=jnp.zeros((nb,), bool),
        update_gate=jnp.array(True),
        rand_rank=jnp.zeros((nb,), jnp.int32),
    )
    flags.use_pallas(True)
    try:
        monkeypatch.setenv("EASYKV_TPU_MEGA", "0")
        ref_logits, _ = forward(qp, cfg, cache, tok, dctx, None)
        monkeypatch.setenv("EASYKV_TPU_MEGA", "1")
        got_logits, _ = forward(qp, cfg, cache, tok, dctx, None)
    finally:
        flags.use_pallas(None)
    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(ref_logits),
        atol=1e-4, rtol=1e-4)
