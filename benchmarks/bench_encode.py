"""Strided-encoding (prefill eviction) throughput: tokens/s of consuming a
long prompt under a 0.5 budget vs full-cache prefill (reference
test_summarization/test_passkey workloads)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    globals().get("__file__", "benchmarks/x")))))

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from easykv_tpu import CausalLM, ModelConfig, generate
    from easykv_tpu.models import llama

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        cfg = ModelConfig(
            vocab_size=32000, hidden_size=2048, intermediate_size=5632,
            num_hidden_layers=22, num_attention_heads=32, num_key_value_heads=4,
            max_position_embeddings=8192,
        )
        length, stride, dtype = 4096, 96, jnp.bfloat16
    else:
        cfg = ModelConfig(
            vocab_size=512, hidden_size=128, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=2048,
        )
        length, stride, dtype = 512, 16, jnp.float32

    params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
    jax.block_until_ready(params)
    model = CausalLM(cfg, params, dtype=str(jnp.dtype(dtype)))
    ids = np.random.default_rng(0).integers(1, cfg.vocab_size, size=(length,))

    for policy, budget in [("roco", 0.5), ("h2o_head", 0.5), ("full", 1.0)]:
        gc = {"budget": budget, "kv_policy": policy, "max_new_tokens": 4,
              "temperature": 1e-9, "top_p": 1.0, "eos_token_ids": [],
              "seed": 0}
        generate(model, ids, gc, kv_mode="encoding", stride=stride)
        t0 = time.time()
        generate(model, ids, gc, kv_mode="encoding", stride=stride)
        dt = time.time() - t0
        log(f"encode[{policy:8s} b={budget}]: {length/dt:9.1f} prefill tok/s "
            f"({dt:.2f}s for {length})")


if __name__ == "__main__":
    main()
