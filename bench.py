"""Headline benchmark: budget-constrained decode throughput vs full cache.

Mirrors the BASELINE.json target ("LLaMa2-7B decoding at budget=200 ...
sustaining >=90% of full-cache tokens/s/chip"): generates with the roco
policy at an integer budget of 200 and with policy='full', and reports
budgeted tokens/s plus the ratio to full-cache as vs_baseline.

Prints exactly ONE JSON line to stdout; progress goes to stderr.
On CPU (no TPU attached) a small config is used so the bench still runs.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from easykv_tpu import CausalLM, ModelConfig, generate
    from easykv_tpu.models import llama

    platform = jax.default_backend()
    on_tpu = platform == "tpu"
    log(f"backend={platform} devices={jax.devices()}")

    if on_tpu:
        # TinyLlama-1.1B architecture (random weights; throughput is
        # weight-independent). LLaMa2-7B bf16 (13.5 GB) does not fit the
        # 16 GB v5e chip alongside loop carries; int8 7B is future work.
        cfg = ModelConfig(
            vocab_size=32000, hidden_size=2048, intermediate_size=5632,
            num_hidden_layers=22, num_attention_heads=32, num_key_value_heads=4,
            max_position_embeddings=2048,
        )
        dtype = jnp.bfloat16
        # gen_tokens > budget so the eviction path actually runs in steady
        # state (184 evictions/run); full-cache run generates the same count.
        prompt_len, gen_tokens, budget = 512, 384, 200
        name = "tinyllama_1.1b"
    else:
        cfg = ModelConfig(
            vocab_size=1024, hidden_size=256, intermediate_size=688,
            num_hidden_layers=4, num_attention_heads=8, num_key_value_heads=8,
            max_position_embeddings=2048,
        )
        dtype = jnp.float32
        prompt_len, gen_tokens, budget = 128, 64, 48
        name = "tiny_cpu"

    t0 = time.time()
    params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
    jax.block_until_ready(params)
    log(f"params initialized in {time.time()-t0:.1f}s")
    model = CausalLM(cfg, params, dtype=str(jnp.dtype(dtype)))

    rng = np.random.default_rng(0)
    ids = rng.integers(1, cfg.vocab_size, size=(prompt_len,))

    def run(policy, budget_arg):
        gc = {
            "budget": budget_arg, "kv_policy": policy,
            "max_new_tokens": gen_tokens, "temperature": 1.0, "top_p": 0.95,
            "eos_token_ids": [],
        }
        # warm-up (compile)
        t0 = time.time()
        generate(model, ids, gc, kv_mode="decoding", stride=1)
        log(f"  {policy}: warm-up (compile+run) {time.time()-t0:.1f}s")
        # timed
        t0 = time.time()
        generate(model, ids, gc, kv_mode="decoding", stride=1)
        dt = time.time() - t0
        tps = gen_tokens / dt
        log(f"  {policy}: {gen_tokens} tokens in {dt:.2f}s -> {tps:.2f} tok/s")
        return tps

    log("benchmarking budgeted decode (roco, budget=%d)..." % budget)
    tps_budget = run("roco", budget)
    log("benchmarking full-cache decode...")
    tps_full = run("full", budget)

    result = {
        "metric": f"decode_tokens_per_sec_{name}_budget{budget}",
        "value": round(tps_budget, 2),
        "unit": "tokens/s/chip",
        "vs_baseline": round(tps_budget / tps_full, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
