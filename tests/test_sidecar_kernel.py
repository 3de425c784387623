"""Fused sidecar kernel (ops/pallas/sidecar_update) parity vs the XLA path.

The write kernel (slot select + score update + sidecar row write) and the
evict kernel (bump + PHASE_DECODE select + invalidate) must be bit-exact
drop-ins: same retained positions, same greedy tokens, same sidecar values
as the free_slot_ids/_decode_write/evict_cache XLA chain — for every decode
policy. Runs the kernels in interpret mode on CPU.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from easykv_tpu import CausalLM, flags, generate
from easykv_tpu.config import ModelConfig
from easykv_tpu.models import llama

POLICIES = ["roco", "h2o_head", "tova", "recency", "random"]


@pytest.fixture(scope="module")
def model():
    cfg = ModelConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    return CausalLM(cfg, params)


def ids_of(n, seed=0):
    return np.random.default_rng(seed).integers(1, 120, size=(n,))


@pytest.mark.parametrize("policy", POLICIES)
def test_engine_decode_kernel_matches_xla(model, policy):
    gc = {"budget": 10, "kv_policy": policy, "max_new_tokens": 18,
          "temperature": 1e-9, "top_p": 1.0, "eos_token_ids": [], "seed": 3}
    ids = ids_of(30, seed=policy.__hash__() % 97)
    ref = generate(model, ids, gc, kv_mode="decoding")
    flags.use_pallas(True)
    try:
        out = generate(model, ids, gc, kv_mode="decoding")
    finally:
        flags.use_pallas(None)
    assert out == ref, f"kernel tokens diverge for {policy}"


def test_engine_decode_kernel_matches_xla_quantized(model):
    """int8 compressed-KV cache through the kernel write path."""
    m = CausalLM(model.cfg, model.params, dtype="float32", kv_quant=True)
    gc = {"budget": 10, "kv_policy": "roco", "max_new_tokens": 16,
          "temperature": 1e-9, "top_p": 1.0, "eos_token_ids": []}
    ids = ids_of(26, seed=5)
    ref = generate(m, ids, gc, kv_mode="decoding")
    flags.use_pallas(True)
    try:
        out = generate(m, ids, gc, kv_mode="decoding")
    finally:
        flags.use_pallas(None)
    assert out == ref


@pytest.mark.parametrize("policy", ["roco", "tova", "random"])
def test_fused_evict_matches_evict_cache(policy):
    """Direct bit-exactness of fused_evict vs the XLA select/bump/invalidate
    on randomized sidecar states."""
    from easykv_tpu.cache import KVCache
    from easykv_tpu.ops.pallas.sidecar_update import fused_evict
    from easykv_tpu.policies import PHASE_DECODE, PolicySpec, evict_cache

    L, B, H, S = 2, 2, 2, 128
    budget = 20
    rng = np.random.default_rng(11)
    valid = np.zeros((L, B, H, S), bool)
    valid[..., :40] = True
    pos = np.where(valid, np.arange(S)[None, None, None, :], -1).astype(np.int32)
    score = np.where(valid, rng.random((L, B, H, S)), 0).astype(np.float32)
    ssq = (score * rng.random((L, B, H, S))).astype(np.float32)
    counter = np.where(valid, rng.integers(1, 30, (L, B, H, S)), 0).astype(
        np.float32
    )
    cache = KVCache(
        k=jnp.zeros((L, B, H, S, 8), jnp.float32),
        v=jnp.zeros((L, B, H, S, 8), jnp.float32),
        pos=jnp.asarray(pos), score=jnp.asarray(score),
        score_sq=jnp.asarray(ssq), counter=jnp.asarray(counter),
        k_scale=jnp.zeros((L, B, H, 1), jnp.float32),
        v_scale=jnp.zeros((L, B, H, 1), jnp.float32),
    )
    rw = int(budget * 0.3)
    spec = PolicySpec(policy, PHASE_DECODE, 1, 4, rw,
                      feasible_k=max(budget - rw, 1), protect_prompt=True)
    next_pos = jnp.asarray([40, 40], jnp.int32)
    prompt_len = jnp.asarray([8, 8], jnp.int32)
    rand_rank = jnp.asarray([5, 17], jnp.int32)
    gate = jnp.asarray([True, False])  # second row gated off

    ref = evict_cache(cache, spec, next_pos, prompt_len, rand_rank, gate)
    pos_k, counter_k = fused_evict(
        cache.pos, cache.score, cache.score_sq, cache.counter,
        gate, next_pos, prompt_len, rand_rank, spec=spec, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(ref.pos), np.asarray(pos_k))
    np.testing.assert_array_equal(np.asarray(ref.counter),
                                  np.asarray(counter_k))
