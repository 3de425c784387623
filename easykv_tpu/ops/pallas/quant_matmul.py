"""Pallas w8a16 matmul: activations in bf16/f32, weights streamed from HBM
as int8 and dequantized in VMEM, per-output-channel scale epilogue fused.

Motivation: XLA's int8->bf16 convert ahead of a dot can materialize the
widened weights, costing up to 3x the HBM traffic of the int8 bytes. Decode
at batch 1 is a GEMV whose speed-of-light IS the weight-streaming time, so
this kernel reads each weight byte exactly once.

Grid: tiles of the output dimension; the full contraction dim per program.
Used for x (M, K) @ w_q (K, N) with M <= 256 (decode steps and prefill
chunks); larger M falls back to the XLA path in ops/quant.mm.
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 256
MAX_M = 256


def _kernel(x_ref, w_ref, s_ref, o_ref):
    x = x_ref[:]                                   # (M, K)
    M = x.shape[0]
    if M == 1:
        # GEMV: a 1-row jnp.dot runs the MXU at 1/128 utilization; a VPU
        # broadcast-multiply + K-reduction is bandwidth-bound instead.
        w = w_ref[:].astype(jnp.float32)           # (K, TN)
        xf = x.astype(jnp.float32).reshape(-1, 1)  # 32-bit reshape (Mosaic)
        acc = jnp.sum(xf * w, axis=0, keepdims=True)  # (1, TN)
    else:
        w = w_ref[:].astype(x.dtype)               # (K, TN) int8 -> compute
        acc = jnp.dot(x, w, preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[:]).astype(o_ref.dtype)  # s: (1, TN)


@functools.partial(jax.jit, static_argnames=("interpret",))
def quant_matmul(
    x: jax.Array,        # (M, K) bf16/f32
    w_q: jax.Array,      # (K, N) int8
    scale: jax.Array,    # (N,) f32
    interpret: bool = False,
) -> jax.Array:
    """x @ dequant(w_q, scale) -> (M, N) in x.dtype."""
    M, K = x.shape
    _, N = w_q.shape
    N_pad = ((N + TILE_N - 1) // TILE_N) * TILE_N
    if N_pad != N:
        w_q = jnp.pad(w_q, [(0, 0), (0, N_pad - N)])
        scale = jnp.pad(scale, [(0, N_pad - N)])
    s2 = scale[None, :].astype(jnp.float32)        # (1, N_pad)

    out = pl.pallas_call(
        _kernel,
        grid=(N_pad // TILE_N,),
        in_specs=[
            pl.BlockSpec((M, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TILE_N), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, TILE_N), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N_pad), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N_pad,
            bytes_accessed=K * N_pad + M * K * x.dtype.itemsize
            + M * N_pad * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w_q, s2)
    return out[:, :N]
