"""w8a8 probe (TPU): can a native s8 x s8 -> s32 dot lift the prefill
weight pass past the int8->bf16 convert-dot cap?

Context (RESULTS.md "Encode diagnosis"): the strided-encode chunk forward
is bound by the per-chunk weight pass — a 96-row w8a16 matmul measures
~280 GB/s on this backend (XLA dot and Pallas kernel alike), ~3x off the
819 GB/s spec, because the int8 weights are converted to bf16 ahead of the
MXU at M>1. A native int8 MXU dot (s8 activations x s8 weights -> s32)
skips the convert entirely; activations are quantized per-row on the fly
(dynamic per-token symmetric int8 — the standard w8a8 recipe).

Variants at the wgu shape (4096 x 11008, the largest decode-chain op),
interleaved reps in ONE process, on-device weights, np.asarray readback:

  A. w8a16: bf16 x @ int8 w (convert-dot; production prefill path)
  B. w8a8: pre-quantized s8 x @ s8 w -> s32, f32 scale epilogue
  C. w8a8 + on-the-fly activation quant (amax/round/clip included)

Run with M in {8, 96, 128, 512} to cover batched decode + chunk widths.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/easykv_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

K, N = 4096, 11008
STEPS = 256


def log(*a):
    print(*a, file=sys.stderr, flush=True)


@functools.partial(jax.jit, static_argnums=(1,))
def _dev_q(seed, shape):
    n = int(np.prod(shape))
    v = (jax.lax.iota(jnp.int32, n) * 29 + seed) % 255 - 127
    return v.astype(jnp.int8).reshape(shape)


def quant_rows(x):
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    s = jnp.maximum(amax.astype(jnp.float32), 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127)
    return q.astype(jnp.int8), s


def mm_a16(x, wq, ws):
    y = jnp.matmul(x, wq.astype(x.dtype))
    return y * ws


def mm_a8_pre(xq, xs, wq, ws):
    acc = jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (acc.astype(jnp.float32) * xs * ws).astype(jnp.bfloat16)


def mm_a8_fly(x, wq, ws):
    xq, xs = quant_rows(x)
    return mm_a8_pre(xq, xs, wq, ws)


def make_run(kind, M):
    @jax.jit
    def run(x, wq, ws):
        def step(h, _):
            if kind == "a16":
                y = mm_a16(h, wq, ws)
            elif kind == "a8pre":
                xq, xs = quant_rows(h)
                # quant once outside would hide the cost; keep it honest but
                # hoistable: a8pre quantizes h once per step, reuses for dot
                y = mm_a8_pre(xq, xs, wq, ws)
            else:
                y = mm_a8_fly(h, wq, ws)
            h2 = jnp.tanh(y[..., :K].astype(jnp.bfloat16))
            return h2, y[0, 0]

        h0 = x
        _, ys = jax.lax.scan(step, h0, None, length=STEPS)
        return ys

    return run


def main():
    for M in (8, 96, 128, 512):
        wq = _dev_q(3, (K, N))
        ws = jnp.full((N,), K ** -0.5 / 127.0, jnp.float32)
        x = jnp.ones((M, K), jnp.bfloat16) * 0.01
        runs = {k: make_run(k, M) for k in ("a16", "a8fly")}
        # warm-up
        for k, r in runs.items():
            np.asarray(jax.block_until_ready(r(x, wq, ws)))
        res = {k: [] for k in runs}
        for rep in range(4):
            for k, r in runs.items():
                t0 = time.perf_counter()
                np.asarray(r(x, wq, ws))
                dt = (time.perf_counter() - t0) / STEPS
                res[k].append(dt)
        gb = K * N / 1e9
        for k, ts in res.items():
            med = float(np.median(ts))
            log(f"M={M:4d} {k:6s}: {med * 1e3:7.3f} ms/op  "
                f"{gb / med:7.1f} GB/s (weight bytes)")


if __name__ == "__main__":
    main()
