"""Aggregate decode throughput vs batch size: B independent streams share
each weight pass, so tokens/s scales until the chip becomes compute/KV
bound. Exercises the batch dimension of the engine (the reference is
hard-wired to batch 1, SURVEY.md §2.3)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    globals().get("__file__", "benchmarks/x")))))

import jax

# honor an explicit CPU request (sitecustomize's axon registration overrides
# the env var alone; same pattern as examples/common.py)
if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from easykv_tpu import CausalLM, ModelConfig
    from easykv_tpu.engine.generate import EngineStatics, _run_decoding
    from easykv_tpu.models import llama

    on_tpu = jax.default_backend() == "tpu"
    model7b = os.environ.get("EASYKV_BENCH_MODEL", "1.1b") == "7b"
    kv_quant = False
    if on_tpu and model7b:
        # 7B with int8 and/or int4 weights (EASYKV_BENCH_WEIGHTS=int8|int4|
        # both; `both` interleaves the formats per batch size in ONE
        # process, the methodology CLAUDE.md prescribes) + int8 KV — the
        # production aggregate-serving configuration
        from bench import fake_int4_params, fake_int8_params

        cfg = ModelConfig(
            vocab_size=32000, hidden_size=4096, intermediate_size=11008,
            num_hidden_layers=32, num_attention_heads=32,
            num_key_value_heads=32, max_position_embeddings=4096,
        )
        dtype, P, gen, budget = jnp.bfloat16, 512, 256, 200
        batches = [int(x) for x in os.environ.get(
            "EASYKV_BENCH_BATCHES", "1,2,4,8").split(",")]
        fmts = {"int8": ("int8",), "int4": ("int4",),
                "both": ("int8", "int4")}[
                    os.environ.get("EASYKV_BENCH_WEIGHTS", "int8")]
        from easykv_tpu.ops.quant import fuse_gemv_params

        # formats built LAZILY and released between runs: int8 (6.8G) +
        # int4 (3.4G) resident together OOM the 16 GB chip once the B=8
        # caches/logits join them. Formats therefore run format-major
        # (not interleaved per B) — cross-format deltas carry cross-process
        # -style tunnel variance; the B-scaling trend within a format is
        # clean.
        params_by_fmt = {
            f: (lambda f=f: fuse_gemv_params(
                fake_int4_params(cfg) if f == "int4"
                else fake_int8_params(cfg)))
            for f in fmts
        }
        kv_quant = True
        log(f"7B {'+'.join(fmts)} weights, int8 KV (format-major)")
    elif on_tpu:
        cfg = ModelConfig(
            vocab_size=32000, hidden_size=2048, intermediate_size=5632,
            num_hidden_layers=22, num_attention_heads=32, num_key_value_heads=4,
            max_position_embeddings=2048,
        )
        dtype, P, gen, budget, batches = jnp.bfloat16, 512, 256, 200, [1, 4, 8, 16]
        params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
    else:
        cfg = ModelConfig(
            vocab_size=512, hidden_size=128, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=1024,
        )
        dtype, P, gen, budget, batches = jnp.float32, 64, 32, 16, [1, 4]
        params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=dtype)

    if not (on_tpu and model7b):
        jax.block_until_ready(params)
        params_by_fmt = {"": (lambda: params)}
    rng = np.random.default_rng(0)

    for f, build in params_by_fmt.items():
        model = CausalLM(cfg, build(), dtype=str(jnp.dtype(dtype)),
                         kv_quant=kv_quant)
        jax.block_until_ready(model.params)
        for B in batches:
            ids = jnp.asarray(rng.integers(1, cfg.vocab_size, size=(B, P)),
                              jnp.int32)
            st = EngineStatics(
                cfg=cfg, mode="decoding", policy="roco", stride=1, length=P,
                budget=budget, recent_window_dec=int(budget * 0.3),
                max_new_tokens=gen, dtype=str(jnp.dtype(dtype)),
                kv_quant=kv_quant,
            )
            prompt_len = jnp.full((B,), P, jnp.int32)
            args = (st, model.params, ids, prompt_len, jnp.float32(1.0),
                    jnp.float32(0.95), jax.random.PRNGKey(0))
            res = _run_decoding(*args)
            np.asarray(res.out_ids)
            # timed call uses a DIFFERENT seed: a bit-identical repeat of
            # the warm-up call can return ~instantly (the B=1 artifact in
            # the r4 tables), a fresh seed forces a real execution. Forced
            # np.asarray readback: block_until_ready intermittently
            # returns before execution finishes through the tunnel
            # (CLAUDE.md; the r5 B=16 first-light printed 18M tok/s).
            args = args[:-1] + (jax.random.PRNGKey(1),)
            t0 = time.time()
            res = _run_decoding(*args)
            np.asarray(res.out_ids)
            dt = time.time() - t0
            total = int(np.asarray(res.n_tokens).sum())
            log(f"B={B:3d}{' ' + f if f else ''}: "
                f"{total/dt:9.1f} tok/s aggregate "
                f"({total/dt/B:7.1f} per stream; {dt:.2f}s)")
            del args, res  # drop param/result refs so HBM frees
        del model
        jax.clear_caches()  # compiled executables pin their constants


if __name__ == "__main__":
    main()
