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


def _stream_cases():
    rng = np.random.default_rng(7)
    cases = []
    for _ in range(8):
        cases.append(dict(
            length=int(rng.integers(16, 48)),
            budget=int(rng.integers(6, 20)),
            policy=str(rng.choice(["roco", "h2o_head", "tova", "recency",
                                   "random"])),
            tokens=int(rng.integers(8, 24)),
            window=int(rng.choice([0, 5, 9])),
            seed=int(rng.integers(0, 99)),
        ))
    return cases


@pytest.mark.parametrize("case", _stream_cases())
def test_fuzz_streaming_rank_strategies(case):
    """All three streaming rank strategies — age-ORDERED compaction
    (production decoding mode), engine-carried incremental ranks, and the
    per-step argsort — produce the same trajectory under random budgets,
    policies, and sliding windows (the r4 ordered path + window masks)."""
    from easykv_tpu import flags

    cfg = ModelConfig(
        vocab_size=128, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=1024,
        sliding_window=case["window"] or None,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(3))
    m = CausalLM(cfg, params)
    ids = np.random.default_rng(case["seed"]).integers(
        1, 120, size=(case["length"],))
    gc = {"budget": case["budget"], "kv_policy": case["policy"],
          "max_new_tokens": case["tokens"], "temperature": 1e-9,
          "top_p": 1.0, "eos_token_ids": [], "streaming": True,
          "seed": case["seed"]}

    out = {}
    # default: ordered compaction; flag off: per-step argsort. The
    # incremental-ranks strategy is exercised by forcing mode-detection
    # off via a non-"decoding" shaped... it only triggers in encdec/enc
    # decode loops; here A/B ordered vs argsort.
    for label, flag in (("ordered", None), ("argsort", False)):
        flags.use_inc_ranks(flag)
        try:
            out[label] = generate(m, ids, dict(gc), kv_mode="decoding",
                                  stride=1)
        finally:
            flags.use_inc_ranks(None)
    assert out["ordered"] == out["argsort"], (case, out)


@pytest.mark.parametrize("mode", ["encoding", "encoding_decoding"])
def test_streaming_incremental_ranks_other_modes(mode):
    """The encode-family decode loops start from eviction-scrambled caches
    and use the INCREMENTAL-ranks strategy (ordered compaction is
    decoding-mode only); trajectories must match the per-step argsort."""
    from easykv_tpu import flags

    cfg = ModelConfig(
        vocab_size=128, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=1024,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(5))
    m = CausalLM(cfg, params)
    ids = np.random.default_rng(11).integers(1, 120, size=(40,))
    gc = {"budget": 24 if mode == "encoding_decoding" else 0.6,
          "kv_policy": "roco", "max_new_tokens": 10, "temperature": 1e-9,
          "top_p": 1.0, "eos_token_ids": [], "streaming": True, "seed": 2}
    out = {}
    for label, flag in (("inc", None), ("argsort", False)):
        flags.use_inc_ranks(flag)
        try:
            out[label] = generate(m, ids, dict(gc), kv_mode=mode, stride=4)
        finally:
            flags.use_inc_ranks(None)
    assert out["inc"] == out["argsort"], (mode, out)
