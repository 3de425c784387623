"""Debug utilities + jit-vs-eager parity of the core forward."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from easykv_tpu.cache import init_cache
from easykv_tpu.config import ModelConfig
from easykv_tpu.models import llama
from easykv_tpu.models.llama import StepCtx
from easykv_tpu.testing import assert_finite_tree, check_jit_eager_parity


def test_assert_finite_tree():
    assert_finite_tree({"a": jnp.ones(3), "b": None, "c": jnp.arange(4)})
    with pytest.raises(FloatingPointError):
        assert_finite_tree({"x": jnp.asarray([1.0, np.nan])})


def test_forward_jit_eager_parity():
    cfg = ModelConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    cache = init_cache(2, 1, 2, 16, cfg.head_dim, jnp.float32)
    ids = jnp.asarray([[5, 9, 3, 7]], jnp.int32)
    ctx = StepCtx(
        q_pos=jnp.asarray([[0, 1, 2, 3]], jnp.int32),
        token_valid=jnp.ones((1, 4), bool),
        counter_init=jnp.zeros((1, 4), jnp.float32),
        next_pos=jnp.asarray([4], jnp.int32),
        prompt_len=jnp.asarray([4], jnp.int32),
        evict_gate=jnp.zeros((1,), bool),
        update_gate=jnp.zeros((), bool),
        rand_rank=jnp.zeros((1,), jnp.int32),
    )
    check_jit_eager_parity(
        lambda p, c: llama.forward(p, cfg, c, ids, ctx, None)[0], params, cache
    )
