"""Decode-step K/V row scatter as manual DMAs (ops/pallas).

The decode write puts ONE (Dh,)-row per (layer, batch, head) into the ring
cache at that head's free slot. XLA lowers the advanced-indexing scatter to
a serialized per-row loop: ~1.0 ms/step for the k+v pair at 7B B=8 (after
the scale rows moved into the sidecar kernel — benchmarks/bench_b8.py).

Mosaic cannot DMA a single row: every memref slice must be whole sublane
tiles (int8 (4, 128) / bf16 (8, 128) second-minor tiling — 1-row slices
are rejected in BOTH VMEM and HBM spaces, squeezed or not). So the kernel
does tile-granular read-modify-write: per (batch, head) it DMAs the
TILE-row-aligned window containing the slot into VMEM, merges the new row
with an iota mask (dynamic-sublane stores are also unimplemented), and
DMAs the window back. All windows of a layer are in flight together
(phase-batched: start all reads -> merge -> start all writes), so the
2*B*H round trips overlap instead of serializing like the XLA loop.

Grid is (L, B). Aliased in-place on k/v. Bytes are identical to
models.llama._write_kv_rows' unconditional scatter (dead rows' slots stay
pos-invalid, so their bytes are inert).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tile_rows(dtype) -> int:
    """Native-tile row granularity for DMA slices of this dtype (Mosaic
    rejects sub-tile sublane slices: int8 packs (32, 128) tiles)."""
    return {1: 32, 2: 16, 4: 8}[jnp.dtype(dtype).itemsize]


def write_rows(
    k: jax.Array,        # (L, B, H, S, Dh) int8 | bf16 cache (donated)
    v: jax.Array,
    kn: jax.Array,       # (L, B, H, 1, Dh) rows to write (cache dtype)
    vn: jax.Array,
    slots: jax.Array,    # (L, B, H) int32 target slot per head
    interpret: bool = False,
):
    """Returns (k, v) with the rows written in place."""
    L, B, H, S, Dh = k.shape
    TR = _tile_rows(k.dtype)
    NW = H * 2

    def kernel(slots_ref, kn_ref, vn_ref, k_any, v_any, k_out, v_out,
               win, sem):
        l = pl.program_id(0)
        b = pl.program_id(1)

        def windows():
            for h in range(H):
                s = slots_ref[(l * B + b) * H + h]
                s0 = (s // TR) * TR
                for i, (rows, dst) in enumerate(
                        ((kn_ref, k_out), (vn_ref, v_out))):
                    w = h * 2 + i
                    yield w, h, s, s0, rows, dst

        # phase 1: fetch every window (concurrent)
        dmas = []
        for w, h, s, s0, rows, dst in windows():
            d = pltpu.make_async_copy(
                dst.at[l, b, h, pl.ds(s0, TR)], win.at[w], sem.at[w])
            d.start()
            dmas.append((d, w, h, s, s0, rows, dst))
        for d, *_ in dmas:
            d.wait()
        # phase 2: merge the new row into each window (masked: dynamic
        # sublane stores are unimplemented)
        for _, w, h, s, s0, rows, dst in dmas:
            row = rows[0, 0, h].astype(jnp.float32)     # (1, Dh)
            cur = win[w].astype(jnp.float32)            # (TR, Dh)
            m = jax.lax.broadcasted_iota(jnp.int32, (TR, 1), 0) == (s - s0)
            win[w] = jnp.where(m, jnp.broadcast_to(row, (TR, Dh)),
                               cur).astype(win.dtype)
        # phase 3: write every window back (concurrent)
        outs = []
        for _, w, h, s, s0, rows, dst in dmas:
            d = pltpu.make_async_copy(
                win.at[w], dst.at[l, b, h, pl.ds(s0, TR)], sem.at[w])
            d.start()
            outs.append(d)
        for d in outs:
            d.wait()

    def vmem5(shape):
        return pl.BlockSpec(shape,
                            lambda l, b, sp: (l, b) + (0,) * (len(shape) - 2),
                            memory_space=pltpu.VMEM)

    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, B),
        in_specs=[vmem5((1, 1, H, 1, Dh)), vmem5((1, 1, H, 1, Dh)),
                  hbm, hbm],
        out_specs=[hbm, hbm],
        scratch_shapes=[pltpu.VMEM((NW, TR, Dh), k.dtype),
                        pltpu.SemaphoreType.DMA((NW,))],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)],
        # k/v alias onto the outputs (indices count the prefetch arg then
        # kn, vn, k, v)
        input_output_aliases={3: 0, 4: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(slots.reshape(-1), kn, vn, k, v)
