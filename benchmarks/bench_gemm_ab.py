"""End-to-end A/B (TPU): is the dual-format int8 copy (+3.4 GB resident)
still needed now that the batched arith-int4 Pallas GEMM works? (VERDICT
r3 next #4.)

Two end-to-end probes, each ONE jitted executable per timed call (this
tunneled backend's per-call timings below ~1 ms are dispatch-floor noise —
op-level microbenches here measured physically impossible rates; see git
history of this file):

1. PREFILL: 2048-token prompt, max_new_tokens=1, 7B — prefill chunks run
   M=128 matmuls, the regime the dual tree's q8 copy was added for.
   Formats: int4-arith (GEMM kernel), int4-dual (q8 routed at M>32),
   int8 (reference rate).
2. BATCHED DECODE: see benchmarks/bench_batch.py with
   EASYKV_BENCH_WEIGHTS=both EASYKV_BENCH_MODEL=7b (GEMM at M=B).

  python benchmarks/bench_gemm_ab.py        # on the TPU host
"""
import contextlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/easykv_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from bench import fake_int4_params, fake_int8_params, _dev_bytes

    from easykv_tpu import CausalLM, ModelConfig, generate
    from easykv_tpu.ops.quant import fuse_gemv_params

    assert jax.default_backend() == "tpu", "run on the TPU host"
    cfg = ModelConfig(
        vocab_size=32000, hidden_size=4096, intermediate_size=11008,
        num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=32,
        max_position_embeddings=4096,
    )
    prompt_len = 2048

    def dualize(tree):
        """Attach a deterministic int8 copy (q8/s8) to every int4 layer
        linear — the dual-format layout quantize_params_int4(dual_int8=True)
        produces (values independent; only the routing/HBM path matters)."""
        layers = {}
        seed = 101
        for name, lin in tree["layers"].items():
            if isinstance(lin, dict) and "q4a" in lin:
                L_, Kh, N = lin["q4a"].shape
                K = 2 * Kh
                q8 = _dev_bytes((L_, K, N), 255, seed)
                s8 = jnp.full((L_, N), (K ** -0.5) / 127.0, jnp.float32)
                lin = {**lin, "q8": q8, "s8": s8}
                seed += 2
            layers[name] = lin
        return {**tree, "layers": layers}

    # NO int8 model here: int4(3.4G) + dual(6.8G) + int8(6.8G) would
    # exceed the 16 GB chip; the int8 prefill reference rides bench.py
    builders = {
        "int4_arith": lambda: fuse_gemv_params(fake_int4_params(cfg)),
        "int4_dual": lambda: dualize(fuse_gemv_params(fake_int4_params(cfg))),
    }

    ids = np.random.default_rng(0).integers(1, cfg.vocab_size,
                                            size=(prompt_len,))
    gc = {"budget": 200, "kv_policy": "full", "max_new_tokens": 1,
          "temperature": 1.0, "top_p": 0.95, "eos_token_ids": []}

    models = {}
    for name, build in builders.items():
        t0 = time.time()
        params = build()
        jax.block_until_ready(params)
        models[name] = CausalLM(cfg, params, dtype="bfloat16", kv_quant=True)
        log(f"{name}: params built in {time.time()-t0:.1f}s")

    def run(model):
        t0 = time.time()
        with contextlib.redirect_stdout(sys.stderr):
            generate(model, ids, gc, kv_mode="decoding", stride=1)
        return time.time() - t0

    for name, model in models.items():
        log(f"{name}: warm-up (compile) {run(model):.2f}s")
    res = {n: [] for n in models}
    for _ in range(5):
        for name, model in models.items():
            res[name].append(run(model))
    for name, ts in res.items():
        log(f"prefill+1tok {prompt_len}tok [{name}]: "
            f"{np.median(ts)*1e3:.1f} ms  reps={[f'{t*1e3:.0f}' for t in ts]}")
    base = np.median(res["int4_dual"])
    log(f"arith/dual = {np.median(res['int4_arith'])/base:.3f} "
        f"(<= 1.0x means the dual copy is dead)")


if __name__ == "__main__":
    main()
