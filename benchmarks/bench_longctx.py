"""Long-context strided encode/ppl at the reference's big regimes
(VERDICT r2 next #4): 10K-token ppl (reference test_ppl.py: 10,253-token
doc, stride 96, budget 0.5) and a 16K-token passkey-style encode
(reference test_passkey.py Vicuna-16K). Above S~5248 the one-pass fused
write+attend exceeds VMEM; these contexts exercise the S-tiled flash
variant (chunk_attention._wa_flash_kernel) instead of falling back to
dense-write + attend.

  python benchmarks/bench_longctx.py        # on the TPU host, 7B int8
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    jax.config.update("jax_platforms", "cpu")

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
    stride = 96
    params = None
    rng = np.random.default_rng(0)

    for mode, length in (("ppl", 10240), ("encoding", 16384)):
        cfg = ModelConfig(
            vocab_size=32000, hidden_size=4096, intermediate_size=11008,
            num_hidden_layers=32, num_attention_heads=32,
            num_key_value_heads=32,
            max_position_embeddings=max(length + 64, 4096),
        )
        if params is None:
            params = fuse_gemv_params(fake_int8_params(cfg))
            jax.block_until_ready(params)
        model = CausalLM(cfg, params, dtype="bfloat16", kv_quant=True)
        ids = rng.integers(1, cfg.vocab_size, size=(length,))

        # report which write+attend variant the budget regime dispatches to
        from easykv_tpu.ops.pallas.chunk_attention import wa_fits

        rep = cfg.num_attention_heads // cfg.num_key_value_heads
        S = int((int(length * 0.5) + stride + 127) // 128) * 128
        fits = wa_fits(rep * stride, stride, S, cfg.head_dim, 1)
        log(f"[{mode} {length}] S~{S}: "
            f"{'one-pass' if fits else 'S-tiled flash'} write+attend")

        import contextlib

        def run(policy, budget):
            gc = {"budget": budget, "kv_policy": policy,
                  "max_new_tokens": 4, "temperature": 1e-9, "top_p": 1.0,
                  "eos_token_ids": [], "seed": 0}
            t0 = time.time()
            with contextlib.redirect_stdout(sys.stderr):
                generate(model, ids, gc, kv_mode=mode, stride=stride)
            return time.time() - t0

        for policy, budget in (("roco", 0.5), ("full", 1.0)):
            run(policy, budget)                      # warm-up / compile
            ts = [run(policy, budget) for _ in range(2)]
            dt = float(np.median(ts))
            log(f"[{mode} {length}] {policy} b={budget}: "
                f"{length/dt:8.1f} tok/s, {dt:.2f} s/doc")


if __name__ == "__main__":
    main()
