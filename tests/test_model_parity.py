"""Logits parity vs HuggingFace transformers (torch CPU) with identical
weights — validates RMSNorm, RoPE, GQA/MQA/MHA attention, SwiGLU, and the
full-cache prefill path of the cache machinery.

This is the test layer the reference lacks entirely (SURVEY.md §4): the
reference validates only end-to-end task metrics on real checkpoints.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from easykv_tpu.cache import init_cache
from easykv_tpu.models import llama
from easykv_tpu.models.hf import params_from_hf_model
from easykv_tpu.models.llama import StepCtx


def _plain_ctx(B, T, start=0):
    pos = start + jnp.arange(T, dtype=jnp.int32)[None, :]
    return StepCtx(
        q_pos=jnp.broadcast_to(pos, (B, T)),
        token_valid=jnp.ones((B, T), bool),
        counter_init=jnp.zeros((B, T), jnp.float32),
        next_pos=jnp.full((B,), start + T, jnp.int32),
        prompt_len=jnp.full((B,), start + T, jnp.int32),
        evict_gate=jnp.zeros((B,), bool),
        update_gate=jnp.zeros((), bool),
        rand_rank=jnp.zeros((B,), jnp.int32),
    )


def _full_forward(cfg, params, ids: np.ndarray, S=None):
    B, T = ids.shape
    cache = init_cache(
        cfg.num_hidden_layers, B, cfg.num_key_value_heads, S or T,
        cfg.head_dim, jnp.float32,
    )
    logits, cache = llama.forward(
        params, cfg, cache, jnp.asarray(ids), _plain_ctx(B, T), None
    )
    return np.asarray(logits), cache


def _hf_logits(model, ids: np.ndarray) -> np.ndarray:
    with torch.no_grad():
        out = model(input_ids=torch.tensor(ids, dtype=torch.long))
    return out.logits.float().numpy()


def _make_hf_llama(num_kv_heads):
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    hf_cfg = LlamaConfig(
        vocab_size=96, hidden_size=64, intermediate_size=112,
        num_hidden_layers=3, num_attention_heads=4,
        num_key_value_heads=num_kv_heads, max_position_embeddings=256,
        rms_norm_eps=1e-5, tie_word_embeddings=False,
    )
    model = LlamaForCausalLM(hf_cfg).eval().float()
    return model


@pytest.mark.parametrize("num_kv_heads", [4, 2, 1])  # MHA / GQA / MQA
def test_llama_logits_parity(num_kv_heads):
    model = _make_hf_llama(num_kv_heads)
    cfg, params = params_from_hf_model(model, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 96, size=(1, 24))
    ours, _ = _full_forward(cfg, params, ids)
    theirs = _hf_logits(model, ids)
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=2e-3)


def test_mistral_logits_parity():
    from transformers import MistralConfig, MistralForCausalLM

    torch.manual_seed(1)
    hf_cfg = MistralConfig(
        vocab_size=96, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, sliding_window=None,
    )
    model = MistralForCausalLM(hf_cfg).eval().float()
    cfg, params = params_from_hf_model(model, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 96, size=(1, 20))
    ours, _ = _full_forward(cfg, params, ids)
    theirs = _hf_logits(model, ids)
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=2e-3)


def test_qwen2_logits_parity():
    """Qwen2: GQA + Q/K/V projection biases (attention_bias), prefill AND
    the late-write decode path (additive vs the reference, which covers only
    LLaMa/Mistral — TODO.md 'Qwen2-style attention bias support')."""
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(4)
    hf_cfg = Qwen2Config(
        vocab_size=96, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False,
        sliding_window=None,
    )
    model = Qwen2ForCausalLM(hf_cfg).eval().float()
    cfg, params = params_from_hf_model(model, dtype=jnp.float32)
    assert cfg.attention_bias and "bq" in params["layers"]
    rng = np.random.default_rng(4)
    T = 16
    ids = rng.integers(0, 96, size=(1, T))
    ours, _ = _full_forward(cfg, params, ids)
    theirs = _hf_logits(model, ids)
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=2e-3)

    # token-by-token decode (exercises _decode_forward's bias path)
    cache = init_cache(cfg.num_hidden_layers, 1, cfg.num_key_value_heads, T,
                       cfg.head_dim, jnp.float32)
    step_logits = []
    for t in range(T):
        logits, cache = llama.forward(
            params, cfg, cache, jnp.asarray(ids[:, t : t + 1]),
            _plain_ctx(1, 1, start=t), None,
        )
        step_logits.append(np.asarray(logits)[:, 0])
    stepped = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(stepped, theirs, atol=3e-4, rtol=2e-3)


def test_chunked_prefill_matches_single_chunk():
    """Feeding a prompt in chunks through the cache must equal one forward."""
    model = _make_hf_llama(2)
    cfg, params = params_from_hf_model(model, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    T = 24
    ids = rng.integers(0, 96, size=(1, T))
    full, _ = _full_forward(cfg, params, ids)

    cache = init_cache(cfg.num_hidden_layers, 1, cfg.num_key_value_heads, T,
                       cfg.head_dim, jnp.float32)
    outs = []
    for s in range(0, T, 8):
        chunk = jnp.asarray(ids[:, s : s + 8])
        logits, cache = llama.forward(
            params, cfg, cache, chunk, _plain_ctx(1, 8, start=s), None
        )
        outs.append(np.asarray(logits))
    chunked = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(chunked, full, atol=3e-4, rtol=2e-3)


def test_decode_step_matches_prefill_row():
    """Decoding token-by-token over the cache reproduces the parallel
    (teacher-forced) logits — validates RoPE positions and cache writes."""
    model = _make_hf_llama(2)
    cfg, params = params_from_hf_model(model, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    T = 12
    ids = rng.integers(0, 96, size=(1, T))
    full, _ = _full_forward(cfg, params, ids)

    cache = init_cache(cfg.num_hidden_layers, 1, cfg.num_key_value_heads, T,
                       cfg.head_dim, jnp.float32)
    step_logits = []
    for t in range(T):
        logits, cache = llama.forward(
            params, cfg, cache, jnp.asarray(ids[:, t : t + 1]),
            _plain_ctx(1, 1, start=t), None,
        )
        step_logits.append(np.asarray(logits)[:, 0])
    stepped = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(stepped, full, atol=3e-4, rtol=2e-3)
