"""A/B (TPU): arithmetic-packed int4 Pallas streaming GEMV vs the XLA s4
masked-replication dot (the r2 production path) on the 7B decode chain.

Variants, all on the serialized 4-op/layer decode GEMV chain at LLaMa2-7B
shapes (one process, interleaved reps, on-device weights):

  A. int8 per-channel               — the int8 reference rate (~703 GB/s r2)
  B. s4 group-128 masked-rep dot    — r2 production (~548 GB/s)
  C. arith-carrier Pallas, mixed dot       (int8 operand fed to the MXU)
  D. arith-carrier Pallas, convert-then-dot (explicit astype(bf16))
  E. arith-carrier Pallas, DMA-only body   — read-rate ceiling probe

C/D/E all stream the SAME plain-int8 carrier (ops.quant.pack_int4_arith);
the deltas isolate the dot-feed cost (C vs D) and the unpack+dot cost
(C/D vs E). See ops/pallas/w4_stream.py for the math.
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

from easykv_tpu.ops.pallas.w4_stream import w4a16_gemv_arith

L, D, F = 32, 4096, 11008
HQ, HKV, DH = 32, 32, 128
STEPS, G = 384, 128


def log(*a):
    print(*a, file=sys.stderr, flush=True)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _dev_q(seed, shape, mod=15):
    n = int(np.prod(shape))
    v = (jax.lax.iota(jnp.int32, n) * 29 + seed) % mod - mod // 2
    return v.astype(jnp.int8).reshape(shape)


def qlin(shape, seed):
    gs = jnp.full(shape[:-2] + (shape[-2] // G, shape[-1]),
                  (shape[-2] ** -0.5) / 7.0, jnp.float32)
    return {"q": _dev_q(seed, tuple(shape)), "gs": gs}


def alin(shape, seed):
    """Arith carrier directly: any int8 value of the form 16*hi+lo with
    nibbles in [-7,7] — for throughput, plain pseudo-random bytes in
    [-119, 119] have identical streaming behavior."""
    L_, K, N = shape
    gs = jnp.full((L_, K // G, N), (K ** -0.5) / 7.0, jnp.float32)
    return {"p": _dev_q(seed, (L_, K // 2, N), 239), "gs": gs}


def mm8(x, w):
    y = jnp.matmul(x, w["q"].astype(x.dtype))
    return y * w["gs"][0].astype(x.dtype)


def mm4_masked(x, w):
    w4, gs = w["q"], w["gs"]
    K, N = w4.shape
    gc = gs.shape[0]
    gmask = (jax.lax.broadcasted_iota(jnp.int32, (gc, K), 1) // (K // gc)
             == jax.lax.broadcasted_iota(jnp.int32, (gc, K), 0))
    xp = jnp.where(gmask, x.reshape(1, K), 0)
    Y = jnp.matmul(xp, w4.astype(x.dtype), preferred_element_type=jnp.float32)
    return jnp.sum(Y * gs, axis=0, keepdims=True).astype(x.dtype)


def make_arith_mm():
    def mma(x, w):
        return w4a16_gemv_arith(x, w["p"], w["gs"])
    return mma


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


def make_single_call_probe(dma_only, n_bytes=None):
    """F/G: ONE pallas call streaming a chain-sized carrier through the
    arith 2-dot math (F) or a trivial body (G) — isolates Mosaic's
    achievable stream rate without per-op call bubbles. This is the
    feasibility probe for a one-call-per-step fused decode kernel."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from easykv_tpu.ops.pallas.w4_stream import _shl4_i8

    KH, TN, GC = 2048, 512, 32
    total = n_bytes or (L * (D * (HQ + 2 * HKV) * DH + HQ * DH * D
                             + D * 2 * F + F * D)) // 2
    NB = total // (KH * TN)

    def body(xa_ref, xb_ref, p_ref, gs_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        if dma_only:
            o_ref[:] += jnp.sum(p_ref[0, 0:8, :].astype(jnp.float32), axis=0,
                                keepdims=True).astype(o_ref.dtype)
        else:
            p = p_ref[0]
            u = _shl4_i8(p)
            dn = (((1,), (0,)), ((), ()))
            a = jax.lax.dot_general(xa_ref[:], p, dimension_numbers=dn,
                                    preferred_element_type=jnp.float32)
            b = jax.lax.dot_general(xb_ref[:], u, dimension_numbers=dn,
                                    preferred_element_type=jnp.float32)
            y = jnp.sum((a + b) * gs_ref[:], axis=0, keepdims=True)
            o_ref[:] += y.astype(o_ref.dtype)

    def run_op(xa, xb, carrier, gs):
        return pl.pallas_call(
            body,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec((GC, KH), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((GC, KH), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, KH, TN), lambda j: (j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((GC, TN), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TN), lambda j: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, TN), jnp.float32),
        )(xa, xb, carrier, gs)

    @jax.jit
    def run(x, ws):
        del ws
        xa = jnp.broadcast_to(x[:1, :1], (GC, KH)).astype(jnp.bfloat16)
        carrier = _dev_q(3, (NB, KH, TN), 239)
        gs = jnp.full((GC, TN), 1e-3, jnp.float32)
        def step(c, _):
            y = run_op(xa, xa, carrier, gs)
            return c + y[0, 0], ()
        acc, _ = jax.lax.scan(step, jnp.float32(0), None, length=STEPS)
        return acc

    return run, NB * KH * TN


def main():
    assert jax.default_backend() == "tpu", "run on the TPU host"
    if os.environ.get("BENCH_MODE") == "probe":
        x0 = jnp.ones((1, D), jnp.bfloat16)
        probes = [("F single-call arith 2-dot", *make_single_call_probe(False)),
                  ("G single-call dma-only", *make_single_call_probe(True))]
        for name, fn, nbytes in probes:
            t0 = time.time()
            np.asarray(fn(x0, None))
            log(f"{name}: warm-up {time.time()-t0:.1f}s")
            reps = []
            for _ in range(3):
                t0 = time.time()
                np.asarray(fn(x0, None))
                reps.append((time.time() - t0) / STEPS)
            dt = float(np.median(reps))
            log(f"{name}: {dt*1e3:.3f} ms/step -> {nbytes/dt/1e9:.0f} GB/s eff "
                f"reps={[f'{t*1e3:.2f}' for t in reps]}")
        return
    shapes = {"wqkv": (L, D, (HQ + 2 * HKV) * DH), "wo": (L, HQ * DH, D),
              "wgu": (L, D, 2 * F), "wd": (L, F, D)}
    t0 = time.time()
    ws8 = {k: qlin(s, i * 2 + 5) for i, (k, s) in enumerate(shapes.items())}
    wsa = {k: alin(s, i * 2 + 6) for i, (k, s) in enumerate(shapes.items())}
    jax.block_until_ready((ws8, wsa))
    log(f"params built {time.time()-t0:.1f}s")
    bytes8 = sum(s[1] * s[2] for s in shapes.values()) * L

    x0 = jnp.ones((1, D), jnp.bfloat16)
    runs = [
        ("A int8 per-channel", make_run(mm8, False), ws8, bytes8),
        ("B s4 g128 masked", make_run(mm4_masked, True), ws8, bytes8 // 2),
        ("C arith pallas per-op", make_run(make_arith_mm(), False),
         wsa, bytes8 // 2),
    ]
    for name, fn, ws, _ in runs:
        t0 = time.time()
        np.asarray(fn(x0, ws))
        log(f"{name}: warm-up {time.time()-t0:.1f}s")
    times = {n: [] for n, _, _, _ in runs}
    for rep in range(3):
        for name, fn, ws, _ in runs:
            t0 = time.time()
            np.asarray(fn(x0, ws))
            times[name].append((time.time() - t0) / STEPS)
    for name, _, _, nbytes in runs:
        dt = float(np.median(times[name]))
        log(f"{name}: {dt*1e3:.3f} ms/step -> {nbytes/dt/1e9:.0f} GB/s eff "
            f"({1/dt:.1f} steps/s) reps={[f'{t*1e3:.2f}' for t in times[name]]}")


if __name__ == "__main__":
    main()
