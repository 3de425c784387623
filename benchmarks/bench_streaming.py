"""Streaming (StreamingLLM cache-relative RoPE) vs non-streaming budgeted
decode at 7B (VERDICT r2 next #5): the r3 late-write streaming path — one
batched rank computation, raw-K cache, in-kernel rank-rotation — must sit
within ~10% of non-streaming decode. Interleaved A/B in one process.

  python benchmarks/bench_streaming.py            # int8 weights (scan path)
"""
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
    from bench import fake_int8_params

    from easykv_tpu import CausalLM, ModelConfig, generate
    from easykv_tpu.ops.quant import fuse_gemv_params

    assert jax.default_backend() == "tpu", "run on the TPU host"
    cfg = ModelConfig(
        vocab_size=32000, hidden_size=4096, intermediate_size=11008,
        num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=32,
        max_position_embeddings=4096,
    )
    prompt_len, gen_tokens, budget = 512, 384, 200
    params = fuse_gemv_params(fake_int8_params(cfg))
    jax.block_until_ready(params)
    model = CausalLM(cfg, params, dtype="bfloat16", kv_quant=True)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, cfg.vocab_size, size=(prompt_len,))

    import contextlib

    def run(streaming):
        gc = {"budget": budget, "kv_policy": "roco",
              "max_new_tokens": gen_tokens, "temperature": 1.0, "top_p": 0.95,
              "eos_token_ids": [], "streaming": streaming}
        t0 = time.time()
        with contextlib.redirect_stdout(sys.stderr):
            generate(model, ids, gc, kv_mode="decoding", stride=1)
        dt = time.time() - t0
        return gen_tokens / dt

    for s in (False, True):
        t0 = time.time()
        run(s)
        log(f"streaming={s}: warm-up {time.time()-t0:.1f}s")
    res = {False: [], True: []}
    for _ in range(3):
        for s in (False, True):
            res[s].append(run(s))
    ns = float(np.median(res[False]))
    st = float(np.median(res[True]))
    log(f"non-streaming: {ns:.1f} tok/s  reps={[f'{x:.1f}' for x in res[False]]}")
    log(f"streaming:     {st:.1f} tok/s  reps={[f'{x:.1f}' for x in res[True]]}")
    log(f"ratio streaming/non-streaming = {st/ns:.3f}")


if __name__ == "__main__":
    main()
