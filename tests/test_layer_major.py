"""Layer-major strided encode (llama.strided_encode_layer_major) parity vs
the chunk-major path (engine._strided_encode body).

The layer-major restructuring — per layer: one whole-width QKV/MLP matmul +
an inner chunk scan for attend/score/evict — must be *semantically
identical* to running the full forward chunk by chunk: layer l's cache
trajectory depends only on layer l's own scores, and hidden states are
teacher-forced. These tests assert exact retained-position parity and
tight logits/ppl agreement across policies and modes."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from easykv_tpu import CausalLM, GenerationConfig, ModelConfig, generate
from easykv_tpu import flags
from easykv_tpu.models import llama


@pytest.fixture(scope="module")
def tiny_model():
    cfg = ModelConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=1024,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(7))
    return CausalLM(cfg, params)


@pytest.fixture
def toggle():
    """Run a callable under layer-major on, then off; restore afterwards."""

    def run(fn):
        try:
            flags.use_layer_major(True)
            on = fn()
            flags.use_layer_major(False)
            off = fn()
        finally:
            flags.use_layer_major(None)
        return on, off

    return run


def ids_of(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(1, 120, size=(n,))


@pytest.mark.parametrize("policy", ["roco", "h2o_head", "tova", "recency",
                                    "random", "full"])
@pytest.mark.parametrize("keep", [False, True])
def test_encoding_tokens_match_chunk_major(tiny_model, toggle, policy, keep):
    gc = {"budget": 0.5, "kv_policy": policy, "max_new_tokens": 8,
          "temperature": 1e-9, "top_p": 1.0, "eos_token_ids": [],
          "keep_attention": keep, "seed": 3}
    on, off = toggle(lambda: generate(
        tiny_model, ids_of(90, seed=len(policy)), gc,
        kv_mode="encoding", stride=8))
    assert on == off


@pytest.mark.parametrize("policy", ["roco", "tova", "recency", "random"])
def test_encdec_tokens_match_chunk_major(tiny_model, toggle, policy):
    gc = {"budget": 40, "kv_policy": policy, "max_new_tokens": 8,
          "temperature": 1e-9, "top_p": 1.0, "eos_token_ids": [], "seed": 5}
    on, off = toggle(lambda: generate(
        tiny_model, ids_of(80, seed=11), gc, kv_mode="encoding_decoding",
        stride=8))
    assert on == off


@pytest.mark.parametrize("policy", ["roco", "recency"])
@pytest.mark.parametrize("keep", [False, True])
def test_ppl_matches_chunk_major(tiny_model, toggle, policy, keep):
    gc = {"budget": 0.5, "kv_policy": policy, "keep_attention": keep,
          "seed": 9}
    on, off = toggle(lambda: generate(
        tiny_model, ids_of(100, seed=23), gc, kv_mode="ppl", stride=8))
    assert on == pytest.approx(off, rel=2e-4)


@pytest.mark.parametrize("kv_quant", [False, True])
def test_retained_positions_match_chunk_major(tiny_model, kv_quant):
    """Slot-exact check at the cache level (stronger than greedy tokens).
    kv_quant=True covers the int8 compressed-KV cache — quantization is
    deterministic and identical in write_tokens / write_tokens_at, so parity
    stays exact in f32 compute."""
    from easykv_tpu.engine.generate import (
        EngineStatics, _engine_cache, _prefill, _strided_encode, stride_align,
    )

    ids = ids_of(90, seed=31)
    length = len(ids)
    budget = int(length * 0.5)
    stride = 8
    idx, r_idx = stride_align(length, budget, stride)
    st = EngineStatics(
        cfg=tiny_model.cfg, mode="encoding", length=length, budget=budget,
        idx=idx, r_idx=r_idx, stride=stride, policy="roco", keep_attention=False,
        temp_length=4, recent_window=int(budget * 0.1),
        recent_window_dec=int(budget * 0.3), max_new_tokens=1,
        eos_token_ids=(), streaming=False, dtype="float32", kv_quant=kv_quant,
    )
    params = tiny_model.params
    ids_b = jnp.asarray(ids, jnp.int32)[None, :]
    spec = st.encode_spec()
    seed = jax.random.PRNGKey(17)

    def run():
        cache = _engine_cache(st, 1, st.idx + st.stride + 4)
        prefix_len = jnp.full((1,), st.r_idx, jnp.int32)
        cache, ll = _prefill(st, params, cache, ids_b[:, : st.r_idx],
                             prefix_len, None, "encode")
        cache, last_logits, _, kv_len = _strided_encode(
            st, params, cache, ids_b, spec, seed, collect_ppl=False,
            last_logits0=ll,
        )
        return cache, last_logits, kv_len

    try:
        flags.use_layer_major(True)
        c_on, ll_on, kv_on = run()
        flags.use_layer_major(False)
        c_off, ll_off, kv_off = run()
    finally:
        flags.use_layer_major(None)

    assert np.array_equal(np.asarray(kv_on), np.asarray(kv_off))
    # retained positions are per-(layer, head) sets; slot assignment order is
    # identical too (same free-slot select), so compare pos arrays exactly
    assert np.array_equal(np.asarray(c_on.pos), np.asarray(c_off.pos))
    np.testing.assert_allclose(
        np.asarray(ll_on), np.asarray(ll_off), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(c_on.score), np.asarray(c_off.score), rtol=1e-4, atol=1e-5
    )


def test_layer_major_with_chunk_kernel_matches_xla(tiny_model):
    """Engine-level: layer-major encode with the fused chunk kernel
    (interpret mode) produces the same greedy tokens as the XLA inner scan."""
    gc = {"budget": 0.5, "kv_policy": "roco", "max_new_tokens": 6,
          "temperature": 1e-9, "top_p": 1.0, "eos_token_ids": [], "seed": 2}
    ids = ids_of(60, seed=41)
    try:
        flags.use_layer_major(True)
        flags.use_pallas(True)          # interpret mode on CPU
        flags.use_chunk_kernel(True)
        with_kernel = generate(tiny_model, ids, gc, kv_mode="encoding",
                               stride=8)
        flags.use_pallas(None)
        flags.use_chunk_kernel(None)
        without = generate(tiny_model, ids, gc, kv_mode="encoding", stride=8)
    finally:
        flags.use_layer_major(None)
        flags.use_pallas(None)
        flags.use_chunk_kernel(None)
    assert with_kernel == without


def test_layer_major_with_step_kernel_matches_wa_kernel(tiny_model,
                                                        monkeypatch):
    """Engine-level: the opt-in full-step fusion (write+attend+score+evict
    in one kernel, EASYKV_TPU_STEP_KERNEL=1) produces the same greedy
    tokens as the write+attend fusion with batched XLA eviction. The
    comparison holds the attend kernel fixed — kernel-vs-XLA attend is
    only numerics-equivalent (fp reduction order), so eviction near-ties
    can diverge across THAT boundary on some seeds; the evict fold itself
    must be trajectory-exact."""
    gc = {"budget": 0.5, "kv_policy": "roco", "max_new_tokens": 6,
          "temperature": 1e-9, "top_p": 1.0, "eos_token_ids": [], "seed": 2}
    ids = ids_of(60, seed=43)
    try:
        flags.use_layer_major(True)
        flags.use_pallas(True)          # interpret mode on CPU
        flags.use_chunk_kernel(True)
        monkeypatch.setenv("EASYKV_TPU_STEP_KERNEL", "1")
        with_step = generate(tiny_model, ids, gc, kv_mode="encoding",
                             stride=8)
        monkeypatch.setenv("EASYKV_TPU_STEP_KERNEL", "0")
        with_wa = generate(tiny_model, ids, gc, kv_mode="encoding", stride=8)
    finally:
        flags.use_layer_major(None)
        flags.use_pallas(None)
        flags.use_chunk_kernel(None)
    assert with_step == with_wa
