"""Interleaved A/B of the fused sidecar-update kernels (flags.use_sidecar)
on the 7B int8 + int8-KV headline decode config.

Both variants compile first (warm-up), then timed runs alternate OFF/ON in
one process so tunnel-state drift cancels (CLAUDE.md: cross-process numbers
vary). Prints per-rep tok/s and medians to stderr.

Run on the TPU host:  python benchmarks/bench_sidecar_ab.py
"""
import statistics
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/easykv_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

sys.path.insert(0, ".")  # repo root
import numpy as np

from bench import fake_int8_params, log


def main():
    from easykv_tpu import CausalLM, ModelConfig, flags, generate
    from easykv_tpu.ops.quant import fuse_gemv_params

    assert jax.default_backend() == "tpu", "A/B is meaningful on TPU only"
    cfg = ModelConfig(
        vocab_size=32000, hidden_size=4096, intermediate_size=11008,
        num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=32,
        max_position_embeddings=4096,
    )
    prompt_len, gen_tokens, budget = 512, 384, 200
    t0 = time.time()
    params = fuse_gemv_params(fake_int8_params(cfg))
    jax.block_until_ready(params)
    log(f"params in {time.time()-t0:.1f}s")
    model = CausalLM(cfg, params, dtype="bfloat16", kv_quant=True)

    ids = np.random.default_rng(0).integers(1, cfg.vocab_size, (prompt_len,))
    gc = {
        "budget": budget, "kv_policy": "roco", "max_new_tokens": gen_tokens,
        "temperature": 1.0, "top_p": 0.95, "eos_token_ids": [],
    }

    def run():
        t0 = time.time()
        generate(model, ids, gc, kv_mode="decoding", stride=1)
        return gen_tokens / (time.time() - t0)

    for name, sidecar in (("off", False), ("on", True)):
        flags.use_sidecar(sidecar)
        t0 = time.time()
        run()
        log(f"warm-up sidecar={name}: {time.time()-t0:.1f}s")

    res = {"off": [], "on": []}
    for rep in range(4):
        for name, sidecar in (("off", False), ("on", True)):
            flags.use_sidecar(sidecar)
            tps = run()
            res[name].append(tps)
            log(f"rep{rep} sidecar={name}: {tps:.2f} tok/s")
    flags.use_sidecar(None)
    for name in ("off", "on"):
        log(f"median sidecar={name}: {statistics.median(res[name]):.2f} tok/s")


if __name__ == "__main__":
    main()
