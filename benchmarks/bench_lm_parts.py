"""Production layer-major path decomposition (TPU): times
llama.prefill_layer_major and llama.strided_encode_layer_major directly at
7B-int8 shapes, separating the prefix and strided phases and the eviction
cost (roco vs full). Complements bench_encode_parts.py (which measured the
pre-write_tokens_at structure)."""
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
    from easykv_tpu import ModelConfig
    from easykv_tpu.cache import init_cache
    from easykv_tpu.engine.generate import (
        EngineStatics, _encode_counter_init, _prefill_layer_major,
        _strided_encode_layer_major, stride_align,
    )

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        cfg = ModelConfig(
            vocab_size=32000, hidden_size=4096, intermediate_size=11008,
            num_hidden_layers=32, num_attention_heads=32,
            num_key_value_heads=32, max_position_embeddings=8192,
        )
        length, stride = 4096, 96
        params = benchmod.fake_int8_params(cfg)
        dtype, kvq = "bfloat16", True
    else:
        cfg = ModelConfig(
            vocab_size=512, hidden_size=128, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=2048,
        )
        length, stride = 512, 16
        from easykv_tpu.models import llama as _l
        params = _l.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
        dtype, kvq = "float32", False
    jax.block_until_ready(params)

    B = 1
    ids = jnp.asarray(
        np.random.default_rng(0).integers(1, cfg.vocab_size, size=(B, length)),
        jnp.int32)

    for policy in ("roco", "full"):
        budget = length if policy == "full" else int(length * 0.5)
        idx, r_idx = stride_align(length, budget, stride)
        st = EngineStatics(
            cfg=cfg, mode="encoding", length=length, budget=budget, idx=idx,
            r_idx=r_idx, stride=stride, policy=policy, keep_attention=False,
            temp_length=4, recent_window=int(budget * 0.1),
            recent_window_dec=int(budget * 0.3), max_new_tokens=1,
            eos_token_ids=(), streaming=False, dtype=dtype, kv_quant=kvq,
        )
        S = ((idx + stride + 127) // 128) * 128
        spec = st.encode_spec()
        seed = jax.random.PRNGKey(0)
        prefix_len = jnp.full((B,), r_idx, jnp.int32)
        PC = int(os.environ.get("EASYKV_TPU_PREFILL_CHUNK", "128"))
        A_pad = ((r_idx + PC - 1) // PC) * PC

        @jax.jit
        def run_prefix(params, ids):
            cache = init_cache(cfg.num_hidden_layers, B,
                               cfg.num_key_value_heads, S, cfg.head_dim,
                               dtype=jnp.bfloat16 if on_tpu else jnp.float32,
                               quantized=kvq)
            ids_p = jnp.pad(ids[:, :r_idx], ((0, 0), (0, A_pad - r_idx)))
            cache, ll = _prefill_layer_major(
                st, params, cache, ids_p, prefix_len, None, "encode", PC)
            return ll, cache

        @jax.jit
        def run_full(params, ids):
            ll, cache = run_prefix.__wrapped__(params, ids)
            cache, last, _, kv_len = _strided_encode_layer_major(
                st, params, cache, ids, spec, seed, False, ll)
            return last

        t0 = time.perf_counter()
        np.asarray(jax.block_until_ready(run_prefix(params, ids)[0]))
        log(f"[{policy}] prefix compile+run {time.perf_counter() - t0:.1f}s "
            f"(r_idx={r_idx} idx={idx})")
        t0 = time.perf_counter()
        np.asarray(jax.block_until_ready(run_full(params, ids)))
        log(f"[{policy}] full compile+run {time.perf_counter() - t0:.1f}s")
        pre, full = [], []
        for rep in range(3):
            t0 = time.perf_counter()
            np.asarray(run_prefix(params, ids)[0])
            pre.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(run_full(params, ids))
            full.append(time.perf_counter() - t0)
        p, f = float(np.median(pre)), float(np.median(full))
        n_strided = length - r_idx
        log(f"[{policy}] prefix  {p:6.3f}s ({r_idx / p:8.1f} tok/s over {r_idx})")
        log(f"[{policy}] strided {f - p:6.3f}s ({n_strided / (f - p):8.1f} "
            f"tok/s over {n_strided})")
        log(f"[{policy}] total   {f:6.3f}s ({length / f:8.1f} tok/s)")


if __name__ == "__main__":
    main()
