"""Int8 compressed-KV cache: quantization round-trip, Pallas kernel parity,
and end-to-end generation/ppl closeness."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from easykv_tpu import CausalLM, ModelConfig, generate
from easykv_tpu.cache import init_cache, layer_slice, quantize_kv, kv_dequant, LayerCache
from easykv_tpu.models import llama
from easykv_tpu.ops.attention import attend
from easykv_tpu.ops.pallas.decode_attention import fused_decode_attend


def test_quantize_kv_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 3, 5, 16)).astype(np.float32)) * 4
    q, s = quantize_kv(x)
    assert q.dtype == jnp.int8 and s.shape == (2, 3, 5)
    deq = q.astype(jnp.float32) * s[..., None]
    err = np.abs(np.asarray(deq) - np.asarray(x))
    assert (err <= np.asarray(s)[..., None] * 0.5 + 1e-6).all()


def test_quantized_cache_write_and_dequant():
    cache = init_cache(1, 1, 2, 8, 16, jnp.float32, quantized=True)
    cl = LayerCache(*(leaf[0] for leaf in cache))
    rng = np.random.default_rng(1)
    from easykv_tpu.cache import write_tokens

    newk = jnp.asarray(rng.normal(size=(1, 2, 3, 16)).astype(np.float32))
    newv = jnp.asarray(rng.normal(size=(1, 2, 3, 16)).astype(np.float32))
    cl = write_tokens(cl, newk, newv, jnp.asarray([[0, 1, 2]], jnp.int32),
                      jnp.zeros((1, 3)))
    k, v = kv_dequant(cl, jnp.float32)
    np.testing.assert_allclose(np.asarray(k[0, :, :3]), np.asarray(newk[0]),
                               atol=0.05, rtol=0.05)


def test_pallas_kernel_int8_parity():
    B, Hkv, rep, S, D = 1, 2, 4, 130, 128
    Hq = Hkv * rep
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(B, Hq, 1, D)), jnp.float32)
    kf = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    vf = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    kq, ks = quantize_kv(kf)
    vq, vs = quantize_kv(vf)
    pos = rng.integers(0, 40, size=(B, Hkv, S)).astype(np.int32)
    pos[:, :, ::5] = -1
    kv_pos = jnp.asarray(pos)
    q_pos = jnp.asarray([35], jnp.int32)

    k_deq = kq.astype(jnp.float32) * ks[..., None]
    v_deq = vq.astype(jnp.float32) * vs[..., None]
    ref_out, ref_probs = attend(q, k_deq, v_deq, kv_pos, q_pos[:, None])
    out, probs = fused_decode_attend(q, kq, vq, kv_pos, q_pos,
                                     k_scale=ks, v_scale=vs, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(ref_probs),
                               atol=1e-5, rtol=1e-4)


def test_generation_with_kv_quant_close_to_fp():
    cfg = ModelConfig(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 90, size=(24,))
    gc = {"budget": 8, "kv_policy": "roco", "max_new_tokens": 12,
          "temperature": 1e-9, "top_p": 1.0, "eos_token_ids": []}
    out_fp = generate(CausalLM(cfg, params), ids, gc, kv_mode="decoding")
    out_q = generate(CausalLM(cfg, params, kv_quant=True), ids, gc,
                     kv_mode="decoding")
    assert len(out_q) == 12
    agree = sum(a == b for a, b in zip(out_fp, out_q))
    assert agree >= 4, f"kv-quant output too far from fp: {out_fp} vs {out_q}"


def test_ppl_with_kv_quant():
    cfg = ModelConfig(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    ids = rng.integers(1, 90, size=(48,))
    p_fp = generate(CausalLM(cfg, params), ids,
                    {"budget": 0.5, "kv_policy": "roco"}, kv_mode="ppl", stride=4)
    p_q = generate(CausalLM(cfg, params, kv_quant=True), ids,
                   {"budget": 0.5, "kv_policy": "roco"}, kv_mode="ppl", stride=4)
    assert np.isfinite(p_q)
    assert abs(p_q - p_fp) / p_fp < 0.05, f"kv-quant ppl drift: {p_fp} vs {p_q}"
