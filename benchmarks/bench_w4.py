"""w4a16 A/B microbench (TPU): which int4 weight path wins the decode GEMV?

Runs the serialized decode GEMV chain at LLaMa2-7B shapes in ONE process
(interleaved reps, warm-up discarded), weights built ON DEVICE (uploading
multi-GB tensors through the tunneled TPU takes tens of minutes):

  A. int8 per-channel (the r1/r2 int8 headline weight path) — baseline;
  B. s4-in-jit, per-channel scale, plain M=1 dot;
  C. s4-in-jit, group-128 scales via the masked-replication (gc, K) dot —
     the PRODUCTION path (ops.quant._mm_w4 after materialize_params).

Measured 2026-08-17 on 1x v5e (384-step scan, np.asarray readback):
  A 9.22 ms/step (703 GB/s) | B 7.51 (431) | C 5.91 (548)
Rejected variants (see RESULTS.md): grouped einsum over packed int8
(37 GB/s — 32 tiny dots), Pallas VPU unpack GEMV (172 GB/s — nibble
unpack is elementwise-bound), Pallas kernel on an s4 ref (301-330 GB/s —
Mosaic compiles s4 VMEM refs but streams them slower than XLA's own dot).

s4 arrays cannot cross the jit argument boundary on the tunneled TPU
plugin, hence storage stays packed int8 and the s4 conversion happens once
inside the jitted runner (ops.quant.materialize_params).
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/easykv_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

L, D, F = 32, 4096, 11008
HQ, HKV, DH = 32, 32, 128
STEPS, G = 384, 128


def log(*a):
    print(*a, file=sys.stderr, flush=True)


@functools.partial(jax.jit, static_argnums=(1,))
def _dev_q(seed, shape):
    n = int(np.prod(shape))
    v = (jax.lax.iota(jnp.int32, n) * 29 + seed) % 15 - 7
    return v.astype(jnp.int8).reshape(shape)


def qlin(shape, seed):
    gs = jnp.full(shape[:-2] + (shape[-2] // G, shape[-1]),
                  (shape[-2] ** -0.5) / 7.0, jnp.float32)
    return {"q": _dev_q(seed, tuple(shape)), "gs": gs}


def mm8(x, w):  # per-channel epilogue on the int8 values
    y = jnp.matmul(x, w["q"].astype(x.dtype))
    return y * w["gs"][0].astype(x.dtype)


def mm4_m1(x, w):  # s4 plain dot, per-channel stand-in scale
    y = jnp.matmul(x, w["q"].astype(x.dtype))
    return y * w["gs"][0].astype(x.dtype)


def mm4_masked(x, w):  # production path: masked-replication grouped dot
    w4, gs = w["q"], w["gs"]
    K, N = w4.shape
    gc = gs.shape[0]
    gmask = (jax.lax.broadcasted_iota(jnp.int32, (gc, K), 1) // (K // gc)
             == jax.lax.broadcasted_iota(jnp.int32, (gc, K), 0))
    xp = jnp.where(gmask, x.reshape(1, K), 0)
    Y = jnp.matmul(xp, w4.astype(x.dtype), preferred_element_type=jnp.float32)
    return jnp.sum(Y * gs, axis=0, keepdims=True).astype(x.dtype)


def make_run(mm, to_s4):
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
        if to_s4:
            ws = jax.tree.map(
                lambda w: {"q": w["q"].astype(jnp.int4), "gs": w["gs"]},
                ws, is_leaf=lambda t: isinstance(t, dict) and "q" in t)
        x, _ = jax.lax.scan(lambda x, _: (chain(x, ws), ()), x, None,
                            length=STEPS)
        return x

    return run


def main():
    assert jax.default_backend() == "tpu", "run on the TPU host"
    t0 = time.time()
    ws = {"wqkv": qlin((L, D, (HQ + 2 * HKV) * DH), 5),
          "wo": qlin((L, HQ * DH, D), 13),
          "wgu": qlin((L, D, 2 * F), 17),
          "wd": qlin((L, F, D), 23)}
    jax.block_until_ready(ws)
    log(f"params built {time.time()-t0:.1f}s")
    bytes8 = (D * (HQ + 2 * HKV) * DH + HQ * DH * D + D * 2 * F + F * D) * L

    x0 = jnp.ones((1, D), jnp.bfloat16)
    runs = [
        ("int8 per-channel", make_run(mm8, False), bytes8),
        ("s4 per-channel M=1", make_run(mm4_m1, True), bytes8 // 2),
        ("s4 group-128 masked", make_run(mm4_masked, True), bytes8 // 2),
    ]
    for name, fn, _ in runs:
        t0 = time.time(); np.asarray(fn(x0, ws))
        log(f"{name}: warm-up {time.time()-t0:.1f}s")
    times = {n: [] for n, _, _ in runs}
    for rep in range(3):
        for name, fn, _ in runs:
            t0 = time.time(); np.asarray(fn(x0, ws))
            times[name].append((time.time() - t0) / STEPS)
    for name, fn, nbytes in runs:
        dt = float(np.median(times[name]))
        log(f"{name}: {dt*1e3:.3f} ms/step -> {nbytes/dt/1e9:.0f} GB/s eff "
            f"({1/dt:.1f} steps/s) reps={[f'{t*1e3:.2f}' for t in times[name]]}")


if __name__ == "__main__":
    main()
