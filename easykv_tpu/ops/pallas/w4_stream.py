"""Pallas w4a16 decode GEMV over ARITHMETIC-packed int4 weights.

The production s4 path (ops.quant._mm_w4 masked-replication dot) streams
XLA's packed s4 HBM layout at ~548 GB/s of the 819 GB/s v5e spec, while the
same chain on int8 weights streams at 700+ — the s4 HBM read path is the
bottleneck, not the dot (RESULTS.md "s4 streaming diagnosis"). This kernel
sidesteps s4 storage entirely:

- Weights are stored as a PLAIN int8 carrier with arithmetic packing
  (ops.quant.pack_int4_arith): byte = 16*hi + lo, both nibbles clipped to
  [-7, 7], paired WITHIN each scale group (carrier row g*(G/2)+t holds
  original rows g*G+t (lo) and g*G+G/2+t (hi) of group g). A plain int8
  array streams HBM at int8 rates.
- Unpacking costs ONE VPU shift per byte: (byte << 4) == 16*lo exactly in
  int8 arithmetic (lo in [-7,7] so 16*lo in [-112,112], no wrap), and the
  hi contribution is recovered algebraically from two MXU dots instead of
  a second elementwise unpack:

    A[g] = sum_{r in g} x_hi[r] * P[r]         (P = 16*hi + lo)
    B[g] = sum_{r in g} (x_lo[r] - x_hi[r]/16) * (P[r] << 4)
    A[g] + B[g] = 16 * (x_hi . hi + x_lo . lo)_g
    y[n] = sum_g gs[g, n]/16 * (A + B)[g, n]

  x_hi/x_lo are the query vector's group-paired halves, expanded to one
  masked row per scale group (the masked-replication trick, so both dots
  are single (gc, K/2) @ (K/2, TILE_N) MXU contractions).

Numerics: the (x_lo - x_hi/16) pre-subtraction rounds once to the compute
dtype — error the same order as the bf16 input rounding the dot performs
anyway; parity tests use f32 inputs where the subtraction is exact.

M == 1 only (the decode GEMV); wider matmuls take the XLA paths in
ops.quant._mm_w4a.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_MASK_F0 = int(jnp.int32(jnp.uint32(0xF0F0F0F0).view(jnp.int32)))


def _shl4_i8(p):
    """(p << 4) per int8 element == 16*lo of the arithmetic carrier.

    Mosaic legalizes NO arithmetic on int8 vectors (shli/muli/addi on i8
    all fail), so the shift rides i32 lanes via a width-changing
    pltpu.bitcast: 4 bytes per lane, one shift + one mask per lane
    (byte-local regardless of the pack's byte order — the mask drops every
    bit that crossed a byte boundary), then bitcast back. ~0.5 VPU ops per
    byte instead of the 3 an i8->i32 convert/shift/trunc chain costs."""
    v = pltpu.bitcast(p, jnp.int32)
    u = jnp.bitwise_and(jax.lax.shift_left(v, jnp.int32(4)),
                        jnp.int32(_MASK_F0))
    return pltpu.bitcast(u, jnp.int8)


def _kernel(xa_ref, xb_ref, p_ref, gs_ref, o_ref, *, mixed):
    p = p_ref[:]                         # (Kh, TN) int8 carrier
    u = _shl4_i8(p)                      # 16*lo, one VPU op per byte
    if not mixed:
        p = p.astype(xa_ref.dtype)
        u = u.astype(xb_ref.dtype)
    dn = (((1,), (0,)), ((), ()))
    a = jax.lax.dot_general(xa_ref[:], p, dimension_numbers=dn,
                            preferred_element_type=jnp.float32)  # (gc, TN)
    b = jax.lax.dot_general(xb_ref[:], u, dimension_numbers=dn,
                            preferred_element_type=jnp.float32)
    y = jnp.sum((a + b) * gs_ref[:], axis=0, keepdims=True) * 0.0625
    o_ref[:] = y.astype(o_ref.dtype)


def _dma_kernel(xa_ref, xb_ref, p_ref, gs_ref, o_ref):
    """Read-ceiling probe: the carrier block is DMA'd (BlockSpec) but only
    trivially consumed — measures the achievable int8 stream rate through
    this grid/block structure with no unpack or dot."""
    o_ref[:] = jnp.sum(p_ref[0:8, :].astype(jnp.float32), axis=0,
                       keepdims=True).astype(o_ref.dtype)


def arith_gemv_lhs(x: jax.Array, gc: int):
    """Build the two masked LHS matrices for the 2-dot arithmetic GEMV.

    x (.., K) with trailing dim the contraction; returns (xa, xb), each
    (gc, K/2) in x.dtype: row g holds the group-paired hi half (xa) and
    lo - hi/16 (xb) of group g, zero elsewhere."""
    K = x.shape[-1]
    Kh = K // 2
    Gh = Kh // gc
    xr = x.reshape(gc, 2, Gh)
    xl = xr[:, 0, :].reshape(Kh)
    xh = xr[:, 1, :].reshape(Kh)
    gmask = (
        jax.lax.broadcasted_iota(jnp.int32, (gc, Kh), 1) // Gh
        == jax.lax.broadcasted_iota(jnp.int32, (gc, Kh), 0)
    )
    xa = jnp.where(gmask, xh[None, :], 0).astype(x.dtype)
    xbv = xl.astype(jnp.float32) - xh.astype(jnp.float32) * 0.0625
    xb = jnp.where(gmask, xbv[None, :], 0.0).astype(x.dtype)
    return xa, xb


def _pick_tile_n(Kh: int, gc: int, N: int) -> int:
    """Largest TILE_N whose double-buffered carrier + bf16 temps + LHS fit
    a conservative VMEM budget."""
    budget = 12 * 1024 * 1024
    lhs = 2 * gc * Kh * 2
    for tn in (1024, 512, 256, 128):
        est = Kh * tn * (2 * 1 + 2 + 2) + lhs + 2 * gc * tn * 4
        if est <= budget:
            return tn
    return 128


@functools.partial(
    jax.jit, static_argnames=("interpret", "mixed", "dma_only"))
def w4a16_gemv_arith(
    x: jax.Array,         # (1, K) bf16/f32
    p: jax.Array,         # (K/2, N) int8, arithmetic group-paired packing
    gs: jax.Array,        # (gc, N) f32 group scales
    interpret: bool = False,
    mixed: bool = True,
    dma_only: bool = False,
) -> jax.Array:
    """x @ dequant_arith(p, gs) -> (1, N) in x.dtype."""
    M, K = x.shape
    assert M == 1, "decode GEMV only"
    Kh, N = p.shape
    gc = gs.shape[0]
    xa, xb = arith_gemv_lhs(x[0], gc)

    tn = _pick_tile_n(Kh, gc, N)
    N_pad = ((N + tn - 1) // tn) * tn
    if N_pad != N:
        p = jnp.pad(p, [(0, 0), (0, N_pad - N)])
        gs = jnp.pad(gs, [(0, 0), (0, N_pad - N)])

    kernel = (_dma_kernel if dma_only
              else functools.partial(_kernel, mixed=mixed))
    out = pl.pallas_call(
        kernel,
        grid=(N_pad // tn,),
        in_specs=[
            pl.BlockSpec((gc, Kh), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gc, Kh), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Kh, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((gc, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tn), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N_pad), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * gc * Kh * N_pad,
            bytes_accessed=Kh * N_pad + 2 * gc * Kh * 2 + gc * N_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xa, xb, p, gs)
    return out[:, :N]
