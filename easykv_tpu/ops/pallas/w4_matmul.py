"""Pallas w4a16 GEMV: packed int4 weights streamed from HBM (2 values/byte),
nibbles unpacked + group scales applied in VMEM.

The decode step at batch 1 is a GEMV whose speed of light IS the
weight-streaming time; this kernel reads each PACKED byte exactly once, so
its ceiling is 2x the int8 path. It exists because XLA may materialize a
widened copy of the unpack (shift) + convert chain ahead of the dot — see
benchmarks/bench_w4.py for the A/B that decides which path `ops.quant.mm`
uses (flags.w4_kernel_enabled).

Layout contract (ops.quant.quantize_linear_int4): w_packed (K/2, N) int8
holds original row r in the low nibble and row r + K/2 in the high nibble;
scales gs (gc, N) f32 are per (group-of-128-input-rows, output-channel),
and K/2 is a whole number of groups, so the lo/hi halves map to the
first/second gc/2 scale rows.

M == 1 only (the decode GEMV). Larger M falls back to the XLA grouped-dot
path (a 1-row MXU dot runs at 1/128 utilization anyway; the VPU
multiply-reduce here is bandwidth-bound instead).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 512


def _kernel(x_ref, w_ref, s_ref, o_ref):
    # x: (1, K); w: (K/2, TN) packed int8; s: (gc, TN) f32; o: (1, TN)
    K = x_ref.shape[1]
    Kh = K // 2
    gc = s_ref.shape[0]
    G = K // gc
    gch = gc // 2

    wp = w_ref[:].astype(jnp.int32)
    hi = jax.lax.shift_right_arithmetic(wp, 4)
    lo = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(wp, 28), 28
    )  # sign-extend the low nibble

    xf = x_ref[:].astype(jnp.float32)  # (1, K)
    x_lo = xf[0, :Kh].reshape(Kh, 1)
    x_hi = xf[0, Kh:].reshape(Kh, 1)

    def half(xh, wh, sh):
        p = xh * wh.astype(jnp.float32)                    # (Kh, TN)
        g = jnp.sum(p.reshape(gch, G, -1), axis=1)          # (gch, TN)
        return jnp.sum(g * sh, axis=0, keepdims=True)       # (1, TN)

    o_ref[:] = (
        half(x_lo, lo, s_ref[:gch]) + half(x_hi, hi, s_ref[gch:])
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def w4a16_gemv(
    x: jax.Array,        # (1, K) bf16/f32
    w_packed: jax.Array,  # (K/2, N) int8, halves packing
    gs: jax.Array,       # (gc, N) f32 group scales
    interpret: bool = False,
) -> jax.Array:
    """x @ dequant(w_packed, gs) -> (1, N) in x.dtype."""
    M, K = x.shape
    if M != 1:
        from ..quant import _mm_int4

        return _mm_int4(x, w_packed, gs)
    Kh, N = w_packed.shape
    gc = gs.shape[0]
    N_pad = ((N + TILE_N - 1) // TILE_N) * TILE_N
    if N_pad != N:
        w_packed = jnp.pad(w_packed, [(0, 0), (0, N_pad - N)])
        gs = jnp.pad(gs, [(0, 0), (0, N_pad - N)])

    out = pl.pallas_call(
        _kernel,
        grid=(N_pad // TILE_N,),
        in_specs=[
            pl.BlockSpec((1, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Kh, TILE_N), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gc, TILE_N), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_N), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N_pad), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * K * N_pad,
            bytes_accessed=Kh * N_pad + K * x.dtype.itemsize
            + gc * N_pad * 4 + N_pad * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w_packed, gs)
    return out[:, :N]
