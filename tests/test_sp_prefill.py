"""Sequence-parallel (ring attention) prefill wired into the engine
(VERDICT r1 next #4): with flags.set_sp_mesh active, _prefill shards the
prefix over the sp axis and runs ops/ring_attention with the traveling
Σp/Σp² score accumulators feeding the keep_attention bootstrap.

Parity target: the single-device chunked prefill — identical cache contents
(positions, K/V, bootstrap scores) and identical end-to-end engine outputs
(greedy tokens, retained-slot counts, ppl)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from easykv_tpu import CausalLM, flags, generate
from easykv_tpu.cache import init_cache
from easykv_tpu.config import ModelConfig
from easykv_tpu.engine.generate import EngineStatics, _prefill
from easykv_tpu.models import llama


@pytest.fixture()
def sp_mesh():
    mesh = Mesh(np.array(jax.devices()[:8]), ("sp",))
    yield mesh
    flags.set_sp_mesh(None)


def _cfg():
    return ModelConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, max_position_embeddings=512,
    )


def test_ring_prefill_matches_chunked_cache(sp_mesh):
    """Cache-level parity: positions, K/V and bootstrap Σp/Σp² scores after
    the ring prefill equal the chunked fori_loop prefill's."""
    cfg = _cfg()
    params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    import dataclasses

    st = EngineStatics(cfg=cfg, mode="encoding", policy="roco", stride=8,
                       length=104, budget=60, idx=56, r_idx=48,
                       max_new_tokens=4, recent_window=6, temp_length=4,
                       keep_attention=True, dtype="float32")
    spec = st.encode_spec()
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 128, size=(1, 48)), jnp.int32)
    prefix_len = jnp.full((1,), 48, jnp.int32)

    def run(st):
        cache = init_cache(cfg.num_hidden_layers, 1, cfg.num_key_value_heads,
                           st.idx + st.stride + st.max_new_tokens,
                           cfg.head_dim, jnp.float32)
        return _prefill(st, params, cache, ids, prefix_len, spec, "encode")

    cache_a, logits_a = run(st)
    cache_b, logits_b = run(dataclasses.replace(st, sp=(sp_mesh, "sp")))

    np.testing.assert_allclose(np.asarray(logits_a), np.asarray(logits_b),
                               atol=2e-4, rtol=2e-3)
    np.testing.assert_array_equal(np.asarray(cache_a.pos), np.asarray(cache_b.pos))
    np.testing.assert_allclose(np.asarray(cache_a.k), np.asarray(cache_b.k),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(cache_a.score),
                               np.asarray(cache_b.score), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(cache_a.score_sq),
                               np.asarray(cache_b.score_sq), atol=1e-6, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(cache_a.counter),
                                  np.asarray(cache_b.counter))


@pytest.mark.parametrize("keep", [False, True])
def test_engine_encoding_with_sp_prefill_matches(sp_mesh, keep):
    """End-to-end: encoding-mode generation (budgeted roco + strided encode
    after the prefix) emits the SAME greedy tokens with the sp prefill on."""
    cfg = _cfg()
    params = llama.init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    model = CausalLM(cfg, params, dtype="float32")
    rng = np.random.default_rng(1)
    ids = rng.integers(1, 128, size=(104,))
    gc = {"budget": 0.5, "kv_policy": "roco", "max_new_tokens": 8,
          "temperature": 1e-9, "top_p": 1.0, "eos_token_ids": [],
          "keep_attention": keep}
    base = generate(model, ids, gc, kv_mode="encoding", stride=8)
    flags.set_sp_mesh(sp_mesh, "sp")
    try:
        sp = generate(model, ids, gc, kv_mode="encoding", stride=8)
    finally:
        flags.set_sp_mesh(None)
    assert base == sp


def test_engine_ppl_with_sp_prefill_matches(sp_mesh):
    cfg = _cfg()
    params = llama.init_params(cfg, jax.random.PRNGKey(2), dtype=jnp.float32)
    model = CausalLM(cfg, params, dtype="float32")
    rng = np.random.default_rng(2)
    ids = rng.integers(1, 128, size=(104,))
    gc = {"budget": 0.5, "kv_policy": "roco", "keep_attention": True}
    base = generate(model, ids, gc, kv_mode="ppl", stride=8)
    flags.set_sp_mesh(sp_mesh, "sp")
    try:
        sp = generate(model, ids, gc, kv_mode="ppl", stride=8)
    finally:
        flags.set_sp_mesh(None)
    assert abs(base - sp) / base < 1e-4, (base, sp)
