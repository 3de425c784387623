"""Mistral-7B-shaped decode bench (VERDICT r3 next #6 done-bar): GQA 32/8
+ sliding-window 4096 on the fused kernel paths — until r4 every kernel
gate bailed to XLA when cfg.sliding_window was set; the window mask is now
in-kernel (decode inflight, mega, chunk kernels).

Budgeted (roco b=200) vs full-cache decode at Mistral-7B shapes
(hidden 4096, inter 14336, Hq=32, Hkv=8, window 4096), int4-arith fused
weights + int8 KV — the same configuration as bench.py's LLaMa headline.

  python benchmarks/bench_mistral.py         # on the TPU host
  EASYKV_TPU_MEGA=0 ...                      # scan-path A/B
"""
import contextlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/easykv_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from bench import fake_int4_params

    from easykv_tpu import CausalLM, ModelConfig, generate
    from easykv_tpu.ops.quant import fuse_gemv_params

    assert jax.default_backend() == "tpu", "run on the TPU host"
    cfg = ModelConfig(
        vocab_size=32000, hidden_size=4096, intermediate_size=14336,
        num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=8,
        max_position_embeddings=8192, sliding_window=4096,
    )
    prompt_len, gen_tokens, budget = 512, 384, 200
    params = fuse_gemv_params(fake_int4_params(cfg))
    jax.block_until_ready(params)
    model = CausalLM(cfg, params, dtype="bfloat16", kv_quant=True)
    ids = np.random.default_rng(0).integers(1, cfg.vocab_size,
                                            size=(prompt_len,))

    def run(policy):
        gc = {"budget": budget, "kv_policy": policy,
              "max_new_tokens": gen_tokens, "temperature": 1.0,
              "top_p": 0.95, "eos_token_ids": []}
        t0 = time.time()
        with contextlib.redirect_stdout(sys.stderr):
            generate(model, ids, gc, kv_mode="decoding", stride=1)
        return gen_tokens / (time.time() - t0)

    for p in ("roco", "full"):
        t0 = time.time()
        run(p)
        log(f"{p}: warm-up {time.time()-t0:.1f}s")
    res = {"roco": [], "full": []}
    for _ in range(3):
        for p in res:
            res[p].append(run(p))
    r, f = float(np.median(res["roco"])), float(np.median(res["full"]))
    log(f"mistral7b int4w+int8kv budgeted(roco b={budget}): {r:.1f} tok/s "
        f"reps={[f'{x:.1f}' for x in res['roco']]}")
    log(f"mistral7b int4w+int8kv full-cache:               {f:.1f} tok/s "
        f"reps={[f'{x:.1f}' for x in res['full']]}")
    log(f"budgeted/full = {r/f:.3f}")


if __name__ == "__main__":
    main()
