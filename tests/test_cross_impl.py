"""Cross-implementation end-to-end parity: our jitted jax engine vs an
independent torch reimplementation of the reference's budgeted-ppl algorithm
(tests/torch_reference.py) on identical weights.

This closes the loop the unit tests leave open: budget/stride alignment,
chunked feeding, GQA-mean score updates, eviction, and CE accounting all
have to agree end-to-end for the perplexities to match."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from easykv_tpu import CausalLM, generate
from easykv_tpu.models.hf import params_from_hf_model
from torch_reference import reference_budgeted_ppl


@pytest.fixture(scope="module")
def hf_model():
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    cfg = LlamaConfig(
        vocab_size=96, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, attn_implementation="eager",
    )
    return LlamaForCausalLM(cfg).eval().float()


@pytest.mark.parametrize("policy", ["roco", "h2o_head", "tova", "recency"])
def test_budgeted_ppl_matches_torch_reference(hf_model, policy):
    cfg, params = params_from_hf_model(hf_model, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    ids = rng.integers(0, 96, size=(72,))

    ref_ppl, _ = reference_budgeted_ppl(
        hf_model, torch.tensor(ids[None]), budget=0.5, stride=4, policy=policy,
    )
    ours = generate(
        CausalLM(cfg, params), ids,
        {"budget": 0.5, "kv_policy": policy}, kv_mode="ppl", stride=4,
    )
    assert abs(ours - ref_ppl) / ref_ppl < 2e-3, (policy, ours, ref_ppl)


def test_budgeted_ppl_matches_torch_reference_longer(hf_model):
    cfg, params = params_from_hf_model(hf_model, dtype=jnp.float32)
    rng = np.random.default_rng(9)
    ids = rng.integers(0, 96, size=(150,))
    ref_ppl, _ = reference_budgeted_ppl(
        hf_model, torch.tensor(ids[None]), budget=0.4, stride=8, policy="roco",
    )
    ours = generate(
        CausalLM(cfg, params), ids,
        {"budget": 0.4, "kv_policy": "roco"}, kv_mode="ppl", stride=8,
    )
    assert abs(ours - ref_ppl) / ref_ppl < 2e-3, (ours, ref_ppl)
