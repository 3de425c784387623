"""Continuous-batching engine: slot recycling, budget enforcement, and
parity of batched vs single-request greedy decoding."""
import numpy as np

import jax

from easykv_tpu import CausalLM, ModelConfig, generate
from easykv_tpu.models import llama
from easykv_tpu.serving import ContinuousBatchEngine, Request


def make_model():
    cfg = ModelConfig(
        vocab_size=96, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    return CausalLM(cfg, params)


def test_batched_greedy_matches_single_request():
    model = make_model()
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, 90, size=(n,)) for n in (17, 23, 9)]

    singles = []
    for p in prompts:
        out = generate(
            model, p,
            {"budget": 8, "kv_policy": "roco", "max_new_tokens": 10,
             "temperature": 1e-9, "top_p": 1.0, "eos_token_ids": []},
            kv_mode="decoding",
        )
        singles.append(out)

    eng = ContinuousBatchEngine(
        model, batch_slots=2, max_prompt=64, budget=8, kv_policy="roco",
        temperature=1e-9, top_p=1.0,
    )
    for i, p in enumerate(prompts):
        eng.submit(Request(request_id=i, ids=p, max_new_tokens=10))
    outs = eng.run_all()

    # 3 requests through 2 slots: all complete, greedy outputs identical to
    # the single-request engine
    assert set(outs) == {0, 1, 2}
    for i in range(3):
        assert outs[i] == singles[i], f"request {i} diverged"


def test_slot_recycling_and_eos():
    model = make_model()
    rng = np.random.default_rng(1)
    p = rng.integers(1, 90, size=(12,))
    # find the greedy first token, then use it as EOS for a second request
    out = generate(
        model, p,
        {"budget": 6, "kv_policy": "recency", "max_new_tokens": 4,
         "temperature": 1e-9, "top_p": 1.0, "eos_token_ids": []},
        kv_mode="decoding",
    )
    eng = ContinuousBatchEngine(
        model, batch_slots=1, max_prompt=32, budget=6, kv_policy="recency",
        temperature=1e-9, top_p=1.0, eos_token_ids=(out[0],),
    )
    p2 = rng.integers(1, 90, size=(8,))
    eng.submit(Request(request_id=7, ids=p, max_new_tokens=50))
    eng.submit(Request(request_id=8, ids=p2, max_new_tokens=3))
    outs = eng.run_all()
    assert outs[7] == [out[0]]          # stopped by EOS immediately
    # the slot was recycled for request 8, which ran to its max (or EOS)
    assert 1 <= len(outs[8]) <= 3
    if outs[8][-1] != out[0]:
        assert len(outs[8]) == 3


def test_serving_int4_batched_matches_single():
    """int4 (w4a16) model through the serving engine: the resident s4
    materialization (materialize_params_resident) + per-tick jits must give
    the same greedy tokens as single-request generate() on the same tree."""
    from easykv_tpu.ops.quant import quantize_params_int4

    base = make_model()
    qparams = quantize_params_int4(base.params, group_size=16)
    model = CausalLM(base.cfg, qparams)
    rng = np.random.default_rng(7)
    prompts = [rng.integers(1, 90, size=(n,)) for n in (14, 21)]
    singles = [
        generate(
            model, p,
            {"budget": 8, "kv_policy": "roco", "max_new_tokens": 8,
             "temperature": 1e-9, "top_p": 1.0, "eos_token_ids": []},
            kv_mode="decoding",
        )
        for p in prompts
    ]
    eng = ContinuousBatchEngine(
        model, batch_slots=2, max_prompt=64, budget=8, kv_policy="roco",
        temperature=1e-9, top_p=1.0,
    )
    for i, p in enumerate(prompts):
        eng.submit(Request(request_id=i, ids=p, max_new_tokens=8))
    outs = eng.run_all()
    assert outs[0] == singles[0] and outs[1] == singles[1]
