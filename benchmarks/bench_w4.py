"""w4a16 A/B microbench (TPU): does XLA stream PACKED int4 weights?

Runs the serialized decode GEMV chain at LLaMa2-7B shapes three ways in ONE
process (interleaved, first timing discarded as compile):
  A. int8 per-channel (the current bench.py weight path) — baseline;
  B. packed-int4 + group-128 scales via the grouped-dot einsum
     (ops.quant._mm_int4: unpack nibbles, one grouped dot per half);
  C. packed-int4 dequant-then-single-dot (materializes bf16 (K, N) in-graph
     — measures what XLA's fusion does with the naive formulation).

If XLA fuses the nibble unpack + widening convert into the dots, B should
approach 2x A (the chain is weight-streaming-bound). If it materializes a
widened copy, B/C collapse below A and the Pallas w4 GEMV kernel is
required. Run on the TPU host: python benchmarks/bench_w4.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/easykv_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from easykv_tpu.ops.quant import _mm_int4, dequantize

L, D, F = 32, 4096, 11008
HQ, HKV, DH = 32, 32, 128
STEPS = 384
GROUP = 128


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def qlin8(shape, seed):
    pat = (np.arange(65536, dtype=np.int32) * 29 % 255 - 127).astype(np.int8)
    n = int(np.prod(shape))
    q = np.tile(pat, n // pat.size + 2)[seed : n + seed].reshape(shape)
    s = jnp.full(shape[:-2] + (shape[-1],), (shape[-2] ** -0.5) / 127.0,
                 jnp.float32)
    return {"q": jax.device_put(q), "s": s}


def qlin4(shape, seed):
    # packed nibbles host-side (two values/byte, halves packing)
    pat = (np.arange(65536, dtype=np.int32) * 29 % 15 - 7).astype(np.int8)
    n = int(np.prod(shape))
    q8 = np.tile(pat, n // pat.size + 2)[seed : n + seed].reshape(shape)
    Kh = shape[-2] // 2
    lo, hi = q8[..., :Kh, :], q8[..., Kh:, :]
    packed = ((lo & 0x0F) | (hi << 4)).astype(np.int8)
    gshape = shape[:-2] + (shape[-2] // GROUP, shape[-1])
    gs = jnp.full(gshape, (shape[-2] ** -0.5) / 7.0, jnp.float32)
    return {"q4p": jax.device_put(packed), "gs": gs}


def mm8(x, w):
    y = jnp.matmul(x, w["q"].astype(x.dtype))
    return y * w["s"].astype(x.dtype)


def mm4_deq(x, w):
    return jnp.matmul(x, dequantize(w, x.dtype))


def make_chain(mm):
    def chain(x, ws):
        def layer(h, p):
            y = mm(h, p["wqkv"])
            h = h + mm(y[:, : HQ * DH], p["wo"])
            gu = mm(h, p["wgu"])
            h = h + mm(jax.nn.silu(gu[:, :F]) * gu[:, F:], p["wd"])
            return h, ()
        x, _ = jax.lax.scan(layer, x, ws)
        return x

    @jax.jit
    def run(x, ws):
        x, _ = jax.lax.scan(lambda x, _: (chain(x, ws), ()), x, None,
                            length=STEPS)
        return x

    return run


def build(q):
    return {
        "wqkv": q((L, D, (HQ + 2 * HKV) * DH), 5),
        "wo": q((L, HQ * DH, D), 13),
        "wgu": q((L, D, 2 * F), 17),
        "wd": q((L, F, D), 23),
    }


def main():
    assert jax.default_backend() == "tpu", "run on the TPU host"
    t0 = time.time()
    ws8 = build(qlin8)
    ws4 = build(qlin4)
    log(f"params built in {time.time()-t0:.1f}s")
    per_layer = D * (HQ + 2 * HKV) * DH + HQ * DH * D + D * 2 * F + F * D
    bytes8 = per_layer * L
    bytes4 = bytes8 // 2

    x0 = jnp.ones((1, D), jnp.bfloat16)
    runs = [
        ("int8 per-channel", make_chain(mm8), ws8, bytes8),
        ("int4 grouped-dot", make_chain(lambda x, w: _mm_int4(x, w["q4p"], w["gs"])), ws4, bytes4),
        ("int4 dequant-dot", make_chain(mm4_deq), ws4, bytes4),
    ]
    # warm-up (compile) pass
    for name, fn, ws, _ in runs:
        t0 = time.time(); np.asarray(fn(x0, ws))
        log(f"{name}: warm-up {time.time()-t0:.1f}s")
    # interleaved timed reps; np.asarray readback (tunnel-safe)
    times = {name: [] for name, *_ in runs}
    for rep in range(3):
        for name, fn, ws, _ in runs:
            t0 = time.time(); np.asarray(fn(x0, ws))
            times[name].append((time.time() - t0) / STEPS)
    for name, fn, ws, nbytes in runs:
        dt = float(np.median(times[name]))
        log(f"{name}: {dt*1e3:.3f} ms/step -> {nbytes/dt/1e9:.0f} GB/s "
            f"effective ({1/dt:.1f} steps/s)  reps={[f'{t*1e3:.3f}' for t in times[name]]}")


if __name__ == "__main__":
    main()
