"""Layer-major vs chunk-major strided encode A/B at 7B-int8 shapes (TPU).

The chunk-major encode is bound by the per-chunk weight pass (RESULTS.md
"Encode diagnosis": a 96-row int8 matmul streams ~280 GB/s, and every chunk
re-reads all ~6.7 GB). The layer-major path (EASYKV_TPU_LAYER_MAJOR /
flags.use_layer_major) runs one whole-width QKV/MLP matmul per layer and
scans the weight-free cache ops per chunk — weight traffic / n_chunks.

Interleaved reps in ONE process, warm-up discarded, on-device int8 weights.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    globals().get("__file__", "benchmarks/x")))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/easykv_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import bench as benchmod
    from easykv_tpu import CausalLM, ModelConfig, generate, flags

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        cfg = ModelConfig(
            vocab_size=32000, hidden_size=4096, intermediate_size=11008,
            num_hidden_layers=32, num_attention_heads=32,
            num_key_value_heads=32, max_position_embeddings=8192,
        )
        length, stride = 4096, 96
        params = benchmod.fake_int8_params(cfg)
        model = CausalLM(cfg, params, dtype="bfloat16", kv_quant=True)
    else:
        cfg = ModelConfig(
            vocab_size=512, hidden_size=128, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=2048,
        )
        length, stride = 512, 16
        from easykv_tpu.models import llama
        params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
        model = CausalLM(cfg, params)
    jax.block_until_ready(params)

    ids = np.random.default_rng(0).integers(1, cfg.vocab_size, size=(length,))
    variants = [("chunk-major", False), ("layer-major", True)]
    for policy, budget, keep in [("roco", 0.5, False), ("roco", 0.5, True),
                                 ("full", 1.0, False)]:
        gc = {"budget": budget, "kv_policy": policy, "max_new_tokens": 4,
              "temperature": 1e-9, "top_p": 1.0, "eos_token_ids": [],
              "keep_attention": keep, "seed": 0}
        res = {name: [] for name, _ in variants}
        toks = {}
        try:
            for name, lm in variants:  # warm-up / compile
                flags.use_layer_major(lm)
                toks[name] = generate(model, ids, gc, kv_mode="encoding",
                                      stride=stride)
            for rep in range(3):
                for name, lm in variants:
                    flags.use_layer_major(lm)
                    t0 = time.perf_counter()
                    generate(model, ids, gc, kv_mode="encoding", stride=stride)
                    res[name].append(time.perf_counter() - t0)
        finally:
            flags.use_layer_major(None)
        match = "tokens MATCH" if toks["chunk-major"] == toks["layer-major"] \
            else f"TOKEN MISMATCH {toks}"
        for name, ts in res.items():
            med = float(np.median(ts))
            log(f"encode[{policy} b={budget} keep={keep}] {name:12s}: "
                f"{length / med:9.1f} prefill tok/s ({med:.2f}s)")
        log(f"  greedy continuation: {match}")


if __name__ == "__main__":
    main()
