"""Inner-chunk-scan unroll A/B under the layer-major encode (TPU).

The layer-major inner scan is dispatch-bound (~0.7 ms per chunk-layer
iteration, RESULTS.md); unrolling the lax.scan body lets XLA overlap
consecutive chunks' small ops. Interleaved in one process — the unroll
factor is part of the engine jit cache key (EngineStatics.pallas), so
variants compile separately.
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
    from easykv_tpu import CausalLM, ModelConfig, generate

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
    unrolls = [int(u) for u in
               os.environ.get("EASYKV_BENCH_UNROLLS", "1,2,4").split(",")]
    for policy, budget in [("roco", 0.5), ("full", 1.0)]:
        gc = {"budget": budget, "kv_policy": policy, "max_new_tokens": 4,
              "temperature": 1e-9, "top_p": 1.0, "eos_token_ids": [],
              "seed": 0}
        res = {u: [] for u in unrolls}
        toks = {}
        try:
            for u in unrolls:  # warm-up / compile
                os.environ["EASYKV_TPU_ENCODE_UNROLL"] = str(u)
                toks[u] = generate(model, ids, gc, kv_mode="encoding",
                                   stride=stride)
            for rep in range(3):
                for u in unrolls:
                    os.environ["EASYKV_TPU_ENCODE_UNROLL"] = str(u)
                    t0 = time.perf_counter()
                    generate(model, ids, gc, kv_mode="encoding", stride=stride)
                    res[u].append(time.perf_counter() - t0)
        finally:
            os.environ.pop("EASYKV_TPU_ENCODE_UNROLL", None)
        match = ("tokens MATCH" if all(toks[u] == toks[unrolls[0]]
                                       for u in unrolls)
                 else f"TOKEN MISMATCH {toks}")
        for u, ts in res.items():
            med = float(np.median(ts))
            log(f"encode[{policy} b={budget}] unroll={u}: "
                f"{length / med:9.1f} prefill tok/s ({med:.2f}s)")
        log(f"  greedy continuation: {match}")


if __name__ == "__main__":
    main()
