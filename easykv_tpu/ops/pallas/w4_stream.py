"""Pallas w4a16 decode GEMV over ARITHMETIC-packed int4 weights.

The production s4 path (ops.quant._mm_w4 masked-replication dot) streams
XLA's packed s4 HBM layout at ~548 GB/s of the 819 GB/s v5e spec, while the
same chain on int8 weights streams at 700+ — the s4 HBM read path is the
bottleneck, not the dot (RESULTS.md "s4 streaming diagnosis"). The
arithmetic carrier sidesteps s4 storage entirely:

- Weights are stored as a PLAIN int8 carrier (ops.quant.pack_int4_arith):
  carrier row r = 16*hi + lo with hi = W[r + K/2], lo = W[r], both nibble
  values clipped to [-7, 7]. A plain int8 array streams HBM at int8 rates.
- Unpacking costs ~0.5 VPU ops per byte: (byte << 4) == 16*lo exactly in
  int8 wraparound arithmetic (Mosaic legalizes NO int8 vector arithmetic,
  so the shift rides i32 lanes via a width-changing pltpu.bitcast + mask),
  and the two nibble planes are recovered algebraically from MXU dots
  instead of elementwise unpacks. With group-blocked masked replication of
  the query halves (xl = x[:K/2], xh = x[K/2:], one masked row per scale
  group j):

    A[j]  = (xh_j) . P          = 16*(xh.hi)_j + (xh.lo)_j
    B[j]  = (xl_j - xh_j/16) . (P<<4) = 16*(xl.lo)_j - (xh.lo)_j
    C[j]  = (xl_j) . (P<<4)     = 16*(xl.lo)_j
    y[n]  = sum_j [ gs_hi[j]*(A+B)[j] + (gs_lo[j]-gs_hi[j])*C[j] ] / 16

  (check: (A+B)/16 = (xh.hi)_j + (xl.lo)_j, C/16 = (xl.lo)_j.)
  Both dots are single (gch, K/2) @ (K/2, TILE_N) MXU contractions (B and
  C stack on the shared operand P<<4).

Numerics: the (xl - xh/16) pre-subtraction rounds once to the compute
dtype — error the same order as the bf16 input rounding the dot performs
anyway; parity tests use f32 inputs where the subtraction is exact.

NOTE on deployment: per-op pallas_call overhead is ~45 us on this backend
(RESULTS.md r3 diagnosis), so this standalone kernel does NOT beat XLA's
s4 dot per op — it is the tested reference for the arithmetic-carrier
math, which pays off inside the one-call-per-step fused decode kernel
(ops/pallas/fused_decode.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import numpy as _np

# 0xF0F0F0F0 as a signed int32 (plain numpy: this module may first be
# imported inside a jit trace, where module-level jnp ops would be traced)
_MASK_F0 = int(_np.uint32(0xF0F0F0F0).astype(_np.int32))


def _shl4_i8(p):
    """(p << 4) per int8 element == 16*lo of the arithmetic carrier.

    Mosaic legalizes no arithmetic on int8 vectors (shli/muli/addi on i8
    all fail), so the shift rides i32 lanes via a width-changing
    pltpu.bitcast: 4 bytes per lane, one shift + one mask per lane
    (byte-local regardless of the pack's byte order — the mask drops every
    bit that crossed a byte boundary), then bitcast back."""
    v = pltpu.bitcast(p, jnp.int32)
    u = jnp.bitwise_and(jax.lax.shift_left(v, jnp.int32(4)),
                        jnp.int32(_MASK_F0))
    return pltpu.bitcast(u, jnp.int8)


def arith_gemv_lhs(x: jax.Array, gch: int):
    """Masked-replicated LHS rows for the 3-functional arithmetic GEMV.

    x (.., K) with trailing contraction dim; returns (xa, xbc):
    xa (gch, K/2) — row j = xh masked to scale-group block j;
    xbc (2*gch, K/2) — rows [0,gch) = (xl - xh/16) masked, rows [gch,2gch)
    = xl masked. All in x.dtype."""
    K = x.shape[-1]
    Kh = K // 2
    G = Kh // gch
    xl = x.reshape(K)[:Kh]
    xh = x.reshape(K)[Kh:]
    gmask = (
        jax.lax.broadcasted_iota(jnp.int32, (gch, Kh), 1) // G
        == jax.lax.broadcasted_iota(jnp.int32, (gch, Kh), 0)
    )
    xa = jnp.where(gmask, xh[None, :], 0).astype(x.dtype)
    xbv = (xl.astype(jnp.float32) - xh.astype(jnp.float32) * 0.0625
           ).astype(x.dtype)
    xb = jnp.where(gmask, xbv[None, :], 0)
    xc = jnp.where(gmask, xl[None, :], 0).astype(x.dtype)
    return xa, jnp.concatenate([xb, xc], axis=0)


def arith_scale_triple(gs: jax.Array) -> jax.Array:
    """(.., gc, N) group scales -> (.., 2*gch, N) epilogue scales for the
    arithmetic-carrier kernels: since sA == sB == gs_hi/16, the A and B
    functionals are summed BEFORE scaling, so the epilogue needs only
    [gs_hi; gs_lo - gs_hi]/16 — one-third less scale traffic than the
    naive [sA; sB; sC] triple (the scale tensors are streamed every decode
    step: ~200 MB at 7B)."""
    gc = gs.shape[-2]
    gch = gc // 2
    lo, hi = gs[..., :gch, :], gs[..., gch:, :]
    return jnp.concatenate([hi, lo - hi], axis=-2) * 0.0625


def _kernel(xa_ref, xbc_ref, p_ref, gs2_ref, o_ref):
    p = p_ref[:]                         # (Kh, TN) int8 carrier
    u = _shl4_i8(p)                      # 16*lo
    dn = (((1,), (0,)), ((), ()))
    a = jax.lax.dot_general(xa_ref[:], p, dimension_numbers=dn,
                            preferred_element_type=jnp.float32)  # (gch, TN)
    bc = jax.lax.dot_general(xbc_ref[:], u, dimension_numbers=dn,
                             preferred_element_type=jnp.float32)  # (2gch, TN)
    gch = a.shape[0]
    # sA == sB: A and B sum before scaling (see arith_scale_triple)
    r = jnp.concatenate([a + bc[:gch], bc[gch:]], axis=0)         # (2gch, TN)
    y = jnp.sum(r * gs2_ref[:].astype(jnp.float32), axis=0, keepdims=True)
    o_ref[:] = y.astype(o_ref.dtype)


def _pick_tile_n(Kh: int, gch: int, N: int) -> int:
    """Largest TILE_N whose double-buffered carrier + temps + LHS fit a
    conservative VMEM budget."""
    budget = 12 * 1024 * 1024
    lhs = 3 * gch * Kh * 2
    for tn in (1024, 512, 256, 128):
        est = Kh * tn * (2 * 1 + 2 + 2) + lhs + 2 * 3 * gch * tn * 4
        if est <= budget:
            return tn
    return 128


@functools.partial(jax.jit, static_argnames=("interpret",))
def w4a16_gemv_arith(
    x: jax.Array,         # (1, K) bf16/f32
    p: jax.Array,         # (K/2, N) int8, arithmetic halves packing
    gs: jax.Array,        # (gc, N) f32 group scales
    interpret: bool = False,
) -> jax.Array:
    """x @ dequant_arith(p, gs) -> (1, N) in x.dtype."""
    M, K = x.shape
    assert M == 1, "decode GEMV only"
    Kh, N = p.shape
    gch = gs.shape[0] // 2
    xa, xbc = arith_gemv_lhs(x[0], gch)
    gs3 = arith_scale_triple(gs)

    tn = _pick_tile_n(Kh, gch, N)
    N_pad = ((N + tn - 1) // tn) * tn
    if N_pad != N:
        p = jnp.pad(p, [(0, 0), (0, N_pad - N)])
        gs3 = jnp.pad(gs3, [(0, 0), (0, N_pad - N)])

    out = pl.pallas_call(
        _kernel,
        grid=(N_pad // tn,),
        in_specs=[
            pl.BlockSpec((gch, Kh), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * gch, Kh), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kh, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * gch, tn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tn), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N_pad), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * gch * Kh * N_pad,
            bytes_accessed=Kh * N_pad + 3 * gch * Kh * 2
            + 2 * gch * N_pad * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xa, xbc, p, gs3)
    return out[:, :N]
