"""A/B (TPU): batched arith-int4 Pallas GEMM vs the dual-format int8 copy
vs the XLA arith fallback, at 7B linear shapes (VERDICT r3 next #4).

The dual-int8 tree (+3.4 GB resident at 7B) exists ONLY because int4's
batched widths (prefill chunks M=128-512, batched decode M=2-32) used to
run XLA paths that materialize unpacked nibble planes (~2.5x carrier
bytes) or a dequantized bf16 copy (~6x). w4a16_gemm_arith streams the
carrier once; if it matches the int8 copy's wall time at every batched
width the dual format is dead.

Variants per (shape, M), interleaved in one process:
  gemm : w4a16_gemm_arith (Pallas, carrier streamed once)
  int8 : jnp.matmul(x, q8.astype(bf16)) * s8   (the dual-format route)
  xla  : the arith fallback (grouped einsum M<=32 / dequant-dense M>32)

  python benchmarks/bench_gemm_ab.py        # on the TPU host
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/easykv_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

G = 128


def log(*a):
    print(*a, file=sys.stderr, flush=True)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _dev_q(seed, shape, mod=239):
    n = int(np.prod(shape))
    v = (jax.lax.iota(jnp.int32, n) * 29 + seed) % mod - mod // 2
    return v.astype(jnp.int8).reshape(shape)


def main():
    from easykv_tpu import flags
    from easykv_tpu.ops.pallas.w4_stream import w4a16_gemm_arith
    from easykv_tpu.ops import quant

    assert jax.default_backend() == "tpu", "run on the TPU host"
    flags.use_pallas(True)

    # 7B fused-layout linear shapes (K, N)
    shapes = {
        "wqkv": (4096, 12288),
        "wgu": (4096, 22016),
        "wd": (11008, 4096),
        "wo": (4096, 4096),
    }
    Ms = (2, 8, 32, 96, 256, 512)
    reps = 30

    @functools.partial(jax.jit, static_argnames=())
    def int8_mm(x, q8, s8):
        return jnp.matmul(x, q8.astype(x.dtype)) * s8.astype(x.dtype)

    # the xla fallback: _mm_w4a routes on the flag at trace time, and the
    # gemm variant below calls the kernel directly, so gate the flag off for
    # the whole bench — every xla_jit trace then takes the XLA path
    flags.use_w4a_kernel(False)
    xla_jit = jax.jit(lambda x, p, gs: quant._mm_w4a(x, p, gs))

    rows = []
    for name, (K, N) in shapes.items():
        p = _dev_q(3, (K // 2, N))
        gs = jnp.full((K // G, N), (K ** -0.5) / 7.0, jnp.float32)
        q8 = _dev_q(5, (K, N), mod=255)
        s8 = jnp.full((N,), (K ** -0.5) / 127.0, jnp.float32)
        jax.block_until_ready((p, gs, q8, s8))
        for M in Ms:
            x = (_dev_q(7, (M, K), mod=255).astype(jnp.bfloat16)
                 * (K ** -0.5) / 127.0)
            jax.block_until_ready(x)
            fns = {
                "gemm": lambda: w4a16_gemm_arith(x, p, gs),
                "int8": lambda: int8_mm(x, q8, s8),
                "xla": lambda: xla_jit(x, p, gs),
            }
            # warm-up (compile)
            for f in fns.values():
                jax.block_until_ready(f())
            t = {k: [] for k in fns}
            for _ in range(reps):
                for k, f in fns.items():
                    t0 = time.perf_counter()
                    jax.block_until_ready(f())
                    t[k].append(time.perf_counter() - t0)
            med = {k: float(np.median(v)) * 1e6 for k, v in t.items()}
            carrier_gb = (K // 2) * N / 1e9
            rate = carrier_gb / (med["gemm"] * 1e-6)
            log(f"{name:5s} K={K:5d} N={N:5d} M={M:3d}: "
                f"gemm {med['gemm']:8.1f}us ({rate:5.0f} GB/s carrier)  "
                f"int8 {med['int8']:8.1f}us  xla {med['xla']:8.1f}us  "
                f"gemm/int8 = {med['gemm']/med['int8']:.2f}")
            rows.append((name, M, med))

    # verdict line: does the GEMM beat/meet int8 everywhere it is routed?
    worst = max(rows, key=lambda r: r[2]["gemm"] / r[2]["int8"])
    log(f"worst gemm/int8 ratio: {worst[2]['gemm']/worst[2]['int8']:.2f} "
        f"at {worst[0]} M={worst[1]}")


if __name__ == "__main__":
    main()
