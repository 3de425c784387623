"""Randomized engine configurations: every sampled (mode, policy, budget,
stride, length) combo must run to completion with the expected output shape
and a consistent budget accounting — no shape errors, no NaNs, no hangs."""
import numpy as np
import pytest

import jax

from easykv_tpu import CausalLM, ModelConfig, generate
from easykv_tpu.models import llama


@pytest.fixture(scope="module")
def model():
    cfg = ModelConfig(
        vocab_size=128, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=1024,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    return CausalLM(cfg, params)


def _cases():
    rng = np.random.default_rng(42)
    policies = ["roco", "h2o_head", "tova", "recency", "random"]
    cases = []
    for i in range(10):
        stride = int(rng.choice([1, 2, 4, 8]))
        length = int(rng.integers(30, 90))
        cases.append(dict(
            mode="encoding", stride=stride, length=length,
            policy=str(rng.choice(policies)),
            budget=float(rng.choice([0.4, 0.5, 0.75])),
            keep=bool(rng.integers(0, 2)),
        ))
    for i in range(6):
        length = int(rng.integers(20, 60))
        cases.append(dict(
            mode="decoding", stride=1, length=length,
            policy=str(rng.choice(policies)),
            budget=int(rng.integers(6, 16)), keep=False,
        ))
    for i in range(6):
        stride = int(rng.choice([2, 4]))
        length = int(rng.integers(40, 90))
        cases.append(dict(
            mode="encoding_decoding", stride=stride, length=length,
            policy=str(rng.choice(["roco", "tova", "recency", "random"])),
            budget=int(rng.integers(16, 30)), keep=False,
        ))
    return cases


@pytest.mark.parametrize("case", _cases())
def test_fuzz_generate(model, case):
    rng = np.random.default_rng(hash(str(case)) % 2**32)
    ids = rng.integers(1, 120, size=(case["length"],))
    out = generate(
        model, ids,
        {"budget": case["budget"], "kv_policy": case["policy"],
         "max_new_tokens": 6, "temperature": 0.7, "top_p": 0.9,
         "eos_token_ids": [], "keep_attention": case["keep"], "seed": 1},
        kv_mode=case["mode"], stride=case["stride"],
    )
    assert len(out) == 6
    assert all(0 <= t < 128 for t in out)


@pytest.mark.parametrize("policy", ["roco", "recency"])
def test_fuzz_ppl(model, policy):
    rng = np.random.default_rng(7)
    ids = rng.integers(1, 120, size=(64,))
    ppl = generate(model, ids, {"budget": 0.5, "kv_policy": policy},
                   kv_mode="ppl", stride=4)
    assert np.isfinite(ppl) and ppl > 0
