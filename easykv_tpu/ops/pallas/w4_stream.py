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


def arith_scale_pair(gs: jax.Array) -> jax.Array:
    """(.., gc, N) group scales -> (.., 2*gch, N) BF16 epilogue scales for
    the arithmetic-carrier kernels.

    Math: y = [gs_hi*(A+B) + (gs_lo-gs_hi)*C]/16 (sA == sB == gs_hi/16, so
    A and B sum before scaling) = (gs_hi/16)*(A+B-C) + (gs_lo/16)*C. The
    kernels compute (A+B-C) on the f32 accumulators (one extra VPU
    subtract) so the stored pair is just [gs_hi; gs_lo]/16 — which, with
    bf16-representable scales (quantize_linear_int4 rounds them), is
    EXACTLY representable in bf16 (/16 only shifts the exponent). Storing
    the pair in bf16 halves the per-step scale traffic (~200 -> ~100 MB at
    7B, VERDICT r3 next #5) with bit-identical results to the f32 pair."""
    gc = gs.shape[-2]
    gch = gc // 2
    lo, hi = gs[..., :gch, :], gs[..., gch:, :]
    return (jnp.concatenate([hi, lo], axis=-2) * 0.0625).astype(jnp.bfloat16)


def _kernel(xa_ref, xbc_ref, p_ref, gs2_ref, o_ref):
    p = p_ref[:]                         # (Kh, TN) int8 carrier
    u = _shl4_i8(p)                      # 16*lo
    dn = (((1,), (0,)), ((), ()))
    a = jax.lax.dot_general(xa_ref[:], p, dimension_numbers=dn,
                            preferred_element_type=jnp.float32)  # (gch, TN)
    bc = jax.lax.dot_general(xbc_ref[:], u, dimension_numbers=dn,
                             preferred_element_type=jnp.float32)  # (2gch, TN)
    gch = a.shape[0]
    # pair scales [hi; lo]/16: y = hi/16*(A+B-C) + lo/16*C
    # (see arith_scale_pair)
    r = jnp.concatenate([a + bc[:gch] - bc[gch:], bc[gch:]],
                        axis=0)                                   # (2gch, TN)
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


def _gemm_kernel(xl_ref, xh_ref, p_ref, gs3_ref, o_ref, acc_ref, *, nk):
    """One scale-group (G=128 carrier rows) per k-step: 2 MXU dots on the
    carrier planes + the per-group scale epilogue accumulate in f32.

    gs3_ref carries the FULL (2*gch, TN) scale block for this n-tile —
    Mosaic requires block sublane dims divisible by 8 or equal to the array
    dim, so the per-k-step (1, TN) row views that crashed BENCH_r03
    (rc=1, "block shape (1, 512), array shape (32, 12288)") are replaced by
    in-kernel pl.ds row slices at rows kstep (ga) and kstep+nk (gc). The
    block's index map depends only on n, so it is fetched once per n-tile
    and reused across all nk k-steps."""
    kstep = pl.program_id(2)

    @pl.when(kstep == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    p = p_ref[:]                          # (128, TN) int8 carrier
    u = _shl4_i8(p)                       # 16*lo
    xl = xl_ref[:].astype(jnp.float32)    # (TM, 128)
    xh = xh_ref[:].astype(jnp.float32)
    dt = xl_ref.dtype
    a = jax.lax.dot_general(
        xh.astype(dt), p, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (TM, TN)
    bc = jax.lax.dot_general(
        jnp.concatenate([(xl - xh * 0.0625).astype(dt), xl.astype(dt)],
                        axis=0),
        u, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (2TM, TN)
    tm = a.shape[0]
    ga = gs3_ref[pl.ds(kstep, 1), :].astype(jnp.float32)        # (1, TN)
    gc = gs3_ref[pl.ds(kstep + nk, 1), :].astype(jnp.float32)   # (1, TN)
    # pair scales [hi; lo]/16: hi/16*(A+B-C) + lo/16*C (arith_scale_pair)
    acc_ref[:] += ga * (a + bc[:tm] - bc[tm:]) + gc * bc[tm:]

    @pl.when(kstep == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def w4a16_gemm_arith(
    x: jax.Array,         # (M, K) bf16/f32, 1 < M
    p: jax.Array,         # (K/2, N) int8, arithmetic halves packing
    gs: jax.Array,        # (gc, N) f32 group scales, K/gc == 128
    interpret: bool = False,
) -> jax.Array:
    """Batched x @ dequant_arith(p, gs) -> (M, N) in x.dtype.

    The batched-decode / prefill-chunk widths (1 < M <= ~512) previously
    ran either the grouped einsum (XLA materializes the unpacked nibble
    planes: ~2.5x the carrier bytes in HBM traffic) or a dequantize-to-bf16
    dense dot (~6x) — the reason the dual-format int8 tree (+3.4 GB
    resident) existed. Here the carrier streams HBM ONCE: grid
    (M-tiles, N-tiles, K-groups) with one scale group (G=128 carrier rows)
    per k-step, so the group scales apply as a clean (1, TN) epilogue on
    the f32 accumulator and no unpacked or dequantized copy ever exists
    outside VMEM. FLOPs are 3x a plain dot (the 3-functional arithmetic
    reconstruction), irrelevant until M reaches the compute-bound regime
    (~512+), where ops.quant._mm_w4a keeps the dense dequant-dot."""
    M, K = x.shape
    Kh, N = p.shape
    gc = gs.shape[0]
    assert K == 2 * Kh and Kh % 128 == 0 and K // gc == 128
    nk = Kh // 128
    # f32 here, NOT the bf16 pair: the kernel row-slices gs3 at the dynamic
    # k-step offset (pl.ds), which Mosaic compiles for f32 (8, 128) tiling
    # but rejects for bf16's packed (16, 128) tiling ("cannot statically
    # prove that index in dimension 0 is a multiple of 8" — found by
    # bench.py; the lowering gate does NOT catch Mosaic-compile-stage
    # errors). The GEMM runs at prefill/batched widths where scale traffic
    # is amortized over M rows, so bf16 scales buy nothing here anyway.
    gs3 = arith_scale_pair(gs).astype(jnp.float32)  # (2*gch, N), gch == nk

    TM = min(256, ((M + 7) // 8) * 8)
    TN = 512 if N % 512 == 0 else (256 if N % 256 == 0 else 128)
    M_pad = ((M + TM - 1) // TM) * TM
    N_pad = ((N + TN - 1) // TN) * TN
    if M_pad != M:
        x = jnp.pad(x, [(0, M_pad - M), (0, 0)])
    if N_pad != N:
        p = jnp.pad(p, [(0, 0), (0, N_pad - N)])
        gs3 = jnp.pad(gs3, [(0, 0), (0, N_pad - N)])

    out = pl.pallas_call(
        functools.partial(_gemm_kernel, nk=nk),
        grid=(M_pad // TM, N_pad // TN, nk),
        in_specs=[
            # xl = x[:, :Kh] tiles, xh = x[:, Kh:] tiles (same array, the
            # hi view offset by nk blocks along K)
            pl.BlockSpec((TM, 128), lambda m, n, k: (m, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, 128), lambda m, n, k: (m, k + nk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, TN), lambda m, n, k: (k, n),
                         memory_space=pltpu.VMEM),
            # full scale block per n-tile (sublane dim == array dim, the
            # always-legal Mosaic block shape); rows selected in-kernel
            pl.BlockSpec((2 * nk, TN), lambda m, n, k: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda m, n, k: (m, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M_pad, N_pad), x.dtype),
        scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * M_pad * Kh * N_pad,
            bytes_accessed=Kh * N_pad + M_pad * K * x.dtype.itemsize
            + 2 * gc * N_pad * 4 + M_pad * N_pad * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, x, p, gs3)
    return out[:M, :N]


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
    gs3 = arith_scale_pair(gs)

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
