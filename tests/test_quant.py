"""Int8 weight quantization (w8a16): numerics + end-to-end generation."""
import numpy as np

import jax
import jax.numpy as jnp

from easykv_tpu import CausalLM, ModelConfig, generate
from easykv_tpu.models import llama
from easykv_tpu.ops.quant import dequantize, mm, quantize_linear, quantize_params


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 96)).astype(np.float32))
    q = quantize_linear(w)
    assert q["q"].dtype == jnp.int8 and q["s"].shape == (96,)
    deq = dequantize(q)
    # per-channel symmetric int8: error <= scale/2 per element
    err = np.abs(np.asarray(deq) - np.asarray(w))
    bound = np.asarray(q["s"])[None, :] * 0.5 + 1e-6
    assert (err <= bound).all()


def test_mm_matches_dequantized():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(32, 48)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(4, 32)).astype(np.float32))
    q = quantize_linear(w)
    np.testing.assert_allclose(
        np.asarray(mm(x, q)), np.asarray(x @ dequantize(q)), atol=1e-4, rtol=1e-4
    )
    # plain arrays pass through
    np.testing.assert_allclose(np.asarray(mm(x, w)), np.asarray(x @ w), atol=0)


def test_stacked_layer_quantization_shapes():
    w = jnp.ones((3, 16, 24))  # (L, in, out)
    q = quantize_linear(w)
    assert q["q"].shape == (3, 16, 24) and q["s"].shape == (3, 24)


def test_quantized_model_generates_close_to_fp32():
    cfg = ModelConfig(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    qparams = quantize_params(params)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 90, size=(24,))
    gc = {"budget": 8, "kv_policy": "roco", "max_new_tokens": 12,
          "temperature": 1e-9, "top_p": 1.0, "eos_token_ids": []}
    out_fp = generate(CausalLM(cfg, params), ids, gc, kv_mode="decoding")
    out_q = generate(CausalLM(cfg, qparams), ids, gc, kv_mode="decoding")
    assert len(out_q) == 12
    # int8 is lossy; greedy prefixes should still agree for a few tokens
    agree = sum(a == b for a, b in zip(out_fp, out_q))
    assert agree >= 4, f"quantized output too far from fp32: {out_fp} vs {out_q}"


def test_pallas_quant_matmul_parity():
    from easykv_tpu.ops.pallas.quant_matmul import quant_matmul

    rng = np.random.default_rng(5)
    for M, K, N in [(1, 128, 384), (8, 256, 300), (128, 128, 256)]:
        x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32))
        q = quantize_linear(w)
        ref = np.asarray(mm(x, q))
        got = np.asarray(quant_matmul(x, q["q"], q["s"], interpret=True))
        np.testing.assert_allclose(got, ref, atol=2e-3, rtol=2e-3)


def test_fused_gemv_params_exact_match():
    """fuse_gemv_params (wqkv / wgu single-GEMV layout) is bit-exact vs the
    split tree: identical logits on prefill and identical greedy decode
    tokens, fp32 and int8 trees, with and without attention biases."""
    from easykv_tpu.ops.quant import fuse_gemv_params

    for bias in (False, True):
        cfg = ModelConfig(
            vocab_size=64, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=8, max_position_embeddings=256, attention_bias=bias,
        )
        params = llama.init_params(cfg, jax.random.PRNGKey(3), jnp.float32)
        rng = np.random.default_rng(3)
        ids = rng.integers(1, 64, size=(40,))
        gc = {"budget": 12, "kv_policy": "roco", "max_new_tokens": 10,
              "temperature": 1e-9, "top_p": 1.0, "eos_token_ids": []}
        for tree in (params, quantize_params(params)):
            base = generate(CausalLM(cfg, tree), ids, gc, kv_mode="decoding")
            fused = generate(
                CausalLM(cfg, fuse_gemv_params(tree)), ids, gc,
                kv_mode="decoding",
            )
            assert base == fused, (bias, base, fused)
