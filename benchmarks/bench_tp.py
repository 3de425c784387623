"""Multi-chip tensor-parallel decode benchmark (ready-to-run).

Runs the headline budgeted-decode measurement (bench.py: LLaMa2-7B int8
weights + int8 compressed-KV, roco budget=200 vs full cache) with weights
TP-sharded over ALL attached devices via parallel/sharding.py and the engine
cache sharding-constrained per cache_pspecs. Only 1 real chip is attached in
this container, so multi-chip numbers are projections until a pod slice is
available — run this unchanged on a v5e-4/-8 to produce them:

    python benchmarks/bench_tp.py                # model axis = all devices
    EASYKV_TP_DATA=2 python benchmarks/bench_tp.py   # (2, N/2) DP x TP mesh

Off-TPU it runs a tiny config on the 8-virtual-device CPU mesh so the full
sharded engine path stays exercised in CI.

Expected TP scaling at 7B int8 (weight-streaming bound): step time ~=
weights_bytes / (N * BW) + attention (KV is head-sharded, also ~1/N) +
2 all-reduces/layer of the (1, D) residual over ICI. With D=4096 bf16 rows
(8 KB) the latency term, not bandwidth, dominates the collective: ~64 rings
* ~5 us ~= 0.3-0.5 ms/step -> projected ~3.5x at TP=4 (/= 2.6 ms + 0.4 ms),
~6x at TP=8. Measured single-chip floor: 8.9 ms GEMV chain (bench_gemv.py).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("EASYKV_BENCH_CPU"):
    # sitecustomize overrides JAX_PLATFORMS (CLAUDE.md); force CPU explicitly
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/tmp/easykv_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from bench import fake_int8_params

    from easykv_tpu import CausalLM, ModelConfig, flags, generate
    from easykv_tpu.config import MeshConfig
    from easykv_tpu.models import llama
    from easykv_tpu.parallel import make_mesh
    from easykv_tpu.parallel.sharding import shard_params

    on_tpu = jax.default_backend() == "tpu"
    n_dev = jax.device_count()
    data = int(os.environ.get("EASYKV_TP_DATA", "1"))
    model_par = n_dev // data
    mc = MeshConfig(data=data, model=model_par)
    mesh = make_mesh(mc)
    log(f"backend={jax.default_backend()} mesh=({data}x{model_par})")

    if on_tpu:
        cfg = ModelConfig(
            vocab_size=32000, hidden_size=4096, intermediate_size=11008,
            num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=32,
            max_position_embeddings=4096,
        )
        prompt_len, gen_tokens, budget = 512, 384, 200
        name = f"llama2_7b_int8w_int8kv_tp{model_par}dp{data}"
        params = fake_int8_params(cfg)  # unfused: the TP layout (quant.py
        # fuse_gemv_params docstring: fused qkv interleaves, single-chip only)
        model = CausalLM(cfg, shard_params(params, cfg, mc, mesh),
                         dtype="bfloat16", kv_quant=True)
    else:
        cfg = ModelConfig(
            vocab_size=1024, hidden_size=32 * model_par,
            intermediate_size=64 * model_par, num_hidden_layers=4,
            num_attention_heads=2 * model_par, num_key_value_heads=model_par,
            head_dim=16, max_position_embeddings=2048,
        )
        prompt_len, gen_tokens, budget = 128, 64, 48
        name = f"tiny_cpu_tp{model_par}dp{data}"
        params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        model = CausalLM(cfg, shard_params(params, cfg, mc, mesh),
                         dtype="float32")

    flags.set_active_mesh(mesh, mc.axis_data, mc.axis_model)
    rng = np.random.default_rng(0)
    B = data
    ids = rng.integers(1, cfg.vocab_size, size=(B, prompt_len))

    def run(policy):
        gc = {
            "budget": budget, "kv_policy": policy,
            "max_new_tokens": gen_tokens, "temperature": 1.0, "top_p": 0.95,
            "eos_token_ids": [],
        }
        t0 = time.time()
        generate(model, ids, gc, kv_mode="decoding", stride=1)
        log(f"  {policy}: warm-up {time.time()-t0:.1f}s")
        t0 = time.time()
        generate(model, ids, gc, kv_mode="decoding", stride=1)
        dt = time.time() - t0
        tps = gen_tokens * B / dt
        log(f"  {policy}: {gen_tokens}x{B} tokens in {dt:.2f}s -> {tps:.2f} tok/s")
        return tps

    try:
        tps_budget = run("roco")
        tps_full = run("full")
    finally:
        flags.set_active_mesh(None)

    print(json.dumps({
        "metric": f"decode_tokens_per_sec_{name}_budget{budget}",
        "value": round(tps_budget, 2),
        "unit": "tokens/s",
        "vs_baseline": round(tps_budget / tps_full, 4),
        "devices": n_dev,
    }))


if __name__ == "__main__":
    main()
