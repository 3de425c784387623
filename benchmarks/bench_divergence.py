"""Quantify the on-TPU bf16 path divergence (VERDICT r2 next #9): the
layer-major encode and the fused chunk kernel produce logits that differ
from the chunk-major / XLA-attend paths in bf16 reduction order, which can
flip eviction near-ties and greedy continuations (RESULTS.md "Layer-major
encode"). This measures whether the divergence MATTERS: the ppl delta
between compute paths on the same weights/data must sit far below the
0.03-0.24 between-policy ppl deltas the reference reports
(/root/reference/README.md:308-318).

Caveat: the container has no real checkpoints, so this runs the bench's
deterministic synthetic 7B int8 weights. Path-divergence is a pure
numerics property of the compute graphs (reduction orders, kernel vs XLA),
so random weights quantify it fine — if anything near-uniform attention
makes eviction ties MORE likely, making this an upper-ish bound.

  python benchmarks/bench_divergence.py        # on the TPU host
"""
import contextlib
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

    from easykv_tpu import CausalLM, ModelConfig, flags, generate
    from easykv_tpu.ops.quant import fuse_gemv_params

    assert jax.default_backend() == "tpu", "run on the TPU host"
    cfg = ModelConfig(
        vocab_size=32000, hidden_size=4096, intermediate_size=11008,
        num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=32,
        max_position_embeddings=4096,
    )
    length, stride = 4096, 96
    params = fuse_gemv_params(fake_int8_params(cfg))
    jax.block_until_ready(params)
    model = CausalLM(cfg, params, dtype="bfloat16", kv_quant=True)
    ids = np.random.default_rng(3).integers(1, cfg.vocab_size, size=(length,))

    # (label, layer_major, chunk_kernel) — production is (True, None=auto)
    paths = [
        ("layer-major + kernel (prod)", True, True),
        ("layer-major + XLA attend", True, False),
        ("chunk-major + XLA attend", False, False),
    ]

    def run_ppl(budget, lm, ck):
        flags.use_layer_major(lm)
        flags.use_chunk_kernel(ck)
        try:
            gc = {"budget": budget, "kv_policy": "roco", "max_new_tokens": 4,
                  "temperature": 1e-9, "top_p": 1.0, "eos_token_ids": [],
                  "seed": 0}
            with contextlib.redirect_stdout(sys.stderr):
                return generate(model, ids, gc, kv_mode="ppl", stride=stride)
        finally:
            flags.use_layer_major(None)
            flags.use_chunk_kernel(None)

    for budget in (0.5, 1.0):
        vals = {}
        for label, lm, ck in paths:
            t0 = time.time()
            vals[label] = run_ppl(budget, lm, ck)
            log(f"b={budget} {label}: ppl {vals[label]:.6f} "
                f"({time.time()-t0:.1f}s)")
        base = vals[paths[0][0]]
        for label in list(vals)[1:]:
            log(f"b={budget} delta vs prod [{label}]: "
                f"{vals[label] - base:+.6f} "
                f"({abs(vals[label]-base)/base*100:.4f}%)")


if __name__ == "__main__":
    main()
