"""Fused chunk-attention kernel A/B under the layer-major encode (TPU).

The layer-major inner scan's per-chunk cost is dominated by the attend
against the static cache, which for int8-KV includes materializing a
dequantized K/V copy every chunk (RESULTS.md encode decomposition, level B).
The chunk kernel folds the dequant on-chip and streams K/V at half the
bytes; this interleaves kernel-on vs kernel-off in one process at the 7B
int8-weights + int8-KV encode shapes.
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
        length = int(os.environ.get("EASYKV_BENCH_CTX", "4096"))
        stride = 96
        kv_quant = os.environ.get("EASYKV_BENCH_KV", "int8") != "bf16"
        params = benchmod.fake_int8_params(cfg)
        model = CausalLM(cfg, params, dtype="bfloat16", kv_quant=kv_quant)
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
    # Forced on/off so the bf16-KV leg (where 'auto' gates the kernel off)
    # still measures kernel-vs-XLA; production default is 'auto' (int8 KV).
    variants = [("xla-attend", False), ("chunk-kernel", True)]
    for policy, budget, keep in [("roco", 0.5, False), ("roco", 0.5, True),
                                 ("full", 1.0, False)]:
        gc = {"budget": budget, "kv_policy": policy, "max_new_tokens": 4,
              "temperature": 1e-9, "top_p": 1.0, "eos_token_ids": [],
              "keep_attention": keep, "seed": 0}
        res = {name: [] for name, _ in variants}
        toks = {}
        try:
            for name, ck in variants:  # warm-up / compile
                flags.use_chunk_kernel(ck)
                toks[name] = generate(model, ids, gc, kv_mode="encoding",
                                      stride=stride)
            for rep in range(3):
                for name, ck in variants:
                    flags.use_chunk_kernel(ck)
                    t0 = time.perf_counter()
                    generate(model, ids, gc, kv_mode="encoding", stride=stride)
                    res[name].append(time.perf_counter() - t0)
        finally:
            flags.use_chunk_kernel(None)
        match = ("tokens MATCH" if toks[variants[0][0]] == toks[variants[1][0]]
                 else f"TOKEN MISMATCH {toks}")
        for name, ts in res.items():
            med = float(np.median(ts))
            log(f"encode[{policy} b={budget} keep={keep}] {name:12s}: "
                f"{length / med:9.1f} prefill tok/s ({med:.2f}s)")
        log(f"  greedy continuation: {match}")


if __name__ == "__main__":
    main()
