"""Fused Pallas chunk attention for the strided-encoding path: flash-style
attention over the ring buffer plus on-chip reduction of the eviction-score
statistics.

The XLA encode path materializes the (B, Hkv, rep, C, S) probability tensor
to HBM before reducing it to per-slot score updates (reference semantics:
easykv.py:443-457); at S≈5K, C≈96 that is ~60 MB per layer per chunk — more
traffic than the attention math itself. Here:

  * pass 1 (`_flash_kernel`): S-tiled online-softmax attention producing the
    output plus each query row's exact softmax stats (m, l);
  * pass 2 (`_score_kernel`): recomputes QK^T per S-tile (flops are cheap),
    normalizes with (m, l), and reduces on-chip to the three statistics every
    policy needs: sum_rows(p), sum_rows(p^2) and the last row — at KV-head
    granularity (GQA mean over the rep query heads, easykv.py:188-196).

Grid: (B, Hkv, S_tiles); VMEM scratch carries the accumulators across the
S_tile-innermost iterations.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
TILE_S = 512


def _row_qpos(qpos_ref, rep: int, C: int):
    """(rep*C, 1) per-row query positions from the pre-tiled (1,1,1,rep*C)
    block (host-side tiling — Mosaic cannot collapse (rep, C) -> (rep*C, 1)
    in one shape cast; a (1, N) -> (N, 1) 32-bit reshape is supported)."""
    qp = qpos_ref[0, 0]                      # (1, rep*C) int32
    return qp.reshape(rep * C, 1)


def _flash_kernel(q_ref, k_ref, v_ref, pos_ref, qpos_ref, *rest,
                  scale, rep, C, quantized, window=None):
    if quantized:
        ks_ref, vs_ref = rest[0], rest[1]
        rest = rest[2:]
    out_ref, m_ref, l_ref, acc, m_s, l_s = rest
    s = pl.program_id(2)
    nS = pl.num_programs(2)

    @pl.when(s == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        m_s[:] = jnp.full_like(m_s, NEG_INF)
        l_s[:] = jnp.zeros_like(l_s)

    q = q_ref[0, 0].astype(jnp.float32)       # (rep*C, D)
    k = k_ref[0, 0].astype(jnp.float32)       # (TS, D)
    pos = pos_ref[0, 0]                       # (1, TS)
    qp = _row_qpos(qpos_ref, rep, C)          # (rep*C, 1)

    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                  # (rep*C, TS)
    if quantized:
        # int8 KV: per-slot dequant folded into the logits (row-vector
        # multiply) and into the e·V accumulation, never materialized.
        logits = logits * ks_ref[0, 0]         # (1, TS) broadcast
    mask = (pos >= 0) & (pos <= qp)
    if window is not None:
        mask &= pos > qp - window  # Mistral sliding window (r4)
    logits = jnp.where(mask, logits, NEG_INF)

    m_new = jnp.maximum(m_s[:], jnp.max(logits, axis=-1, keepdims=True))
    e = jnp.where(mask, jnp.exp(logits - m_new), 0.0)
    c_old = jnp.exp(m_s[:] - m_new)
    l_s[:] = l_s[:] * c_old + jnp.sum(e, axis=-1, keepdims=True)
    ev = e * vs_ref[0, 0] if quantized else e
    acc[:] = acc[:] * c_old + jax.lax.dot_general(
        ev, v_ref[0, 0].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_s[:] = m_new

    @pl.when(s == nS - 1)
    def _():
        out_ref[0, 0] = (acc[:] / jnp.maximum(l_s[:], 1e-30)).astype(out_ref.dtype)
        m_ref[0, 0] = m_s[:]
        l_ref[0, 0] = l_s[:]


def _score_kernel(q_ref, k_ref, pos_ref, qpos_ref, *rest,
                  scale, rep, C, quantized, window=None):
    if quantized:
        ks_ref = rest[0]
        rest = rest[1:]
    m_ref, l_ref, ssum_ref, ssq_ref, last_ref = rest
    q = q_ref[0, 0].astype(jnp.float32)       # (rep*C, D)
    k = k_ref[0, 0].astype(jnp.float32)       # (TS, D)
    pos = pos_ref[0, 0]                       # (1, TS)
    qp = _row_qpos(qpos_ref, rep, C)

    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    if quantized:
        logits = logits * ks_ref[0, 0]
    mask = (pos >= 0) & (pos <= qp)
    if window is not None:
        mask &= pos > qp - window  # Mistral sliding window (r4)
    p = jnp.where(mask, jnp.exp(logits - m_ref[0, 0]), 0.0)
    p = p / jnp.maximum(l_ref[0, 0], 1e-30)    # exact probabilities (rep*C, TS)

    TS = p.shape[-1]
    pg = p.reshape(rep, C, TS)
    p_kv = jnp.mean(pg, axis=0)                # (C, TS) GQA mean
    ssum_ref[0, 0] = jnp.sum(p_kv, axis=0, keepdims=True)
    ssq_ref[0, 0] = jnp.sum(p_kv * p_kv, axis=0, keepdims=True)
    last_ref[0, 0] = p_kv[C - 1 :, :]          # last chunk row


def _onepass_kernel(q_ref, k_ref, v_ref, pos_ref, qpos_ref, *rest,
                    scale, rep, C, need_scores, quantized, window=None):
    """Single-pass chunk attention: the whole (rep*C, S) logits block lives
    in VMEM, so there is no online-softmax rescale, no second QK pass, and
    no m/l HBM round trip. Valid while the block fits VMEM (gated by the
    wrapper); the 2-pass flash variant covers larger S. int8-KV caches
    stream at half the bytes with the per-slot dequant scales folded into
    the logits (K) and the p·V dot (V)."""
    if quantized:
        ks_ref, vs_ref = rest[0], rest[1]
        rest = rest[2:]
    out_ref, ssum_ref, ssq_ref, last_ref = rest
    q = q_ref[0, 0].astype(jnp.float32)        # (rep*C, D)
    k = k_ref[0, 0].astype(jnp.float32)        # (S, D)
    pos = pos_ref[0, 0]                        # (1, S)
    qp = _row_qpos(qpos_ref, rep, C)           # (rep*C, 1)

    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                  # (rep*C, S)
    if quantized:
        logits = logits * ks_ref[0, 0]
    mask = (pos >= 0) & (pos <= qp)
    if window is not None:
        mask &= pos > qp - window  # Mistral sliding window (r4)
    logits = jnp.where(mask, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.where(mask, jnp.exp(logits - m), 0.0)
    p = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)

    pv = p * vs_ref[0, 0] if quantized else p
    out = jax.lax.dot_general(
        pv, v_ref[0, 0].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                          # (rep*C, D)
    out_ref[0, 0] = out.astype(out_ref.dtype)
    if need_scores:
        S = p.shape[-1]
        p_kv = jnp.mean(p.reshape(rep, C, S), axis=0)       # (C, S) GQA mean
        ssum_ref[0, 0] = jnp.sum(p_kv, axis=0, keepdims=True)
        ssq_ref[0, 0] = jnp.sum(p_kv * p_kv, axis=0, keepdims=True)
        last_ref[0, 0] = p_kv[C - 1 :, :]


# VMEM budget for the 1-pass kernel: K+V (bf16/f32) + logits & probs f32.
_ONEPASS_VMEM_CAP = 10 * 1024 * 1024


def _onepass_fits(rows: int, S_pad: int, D: int, kv_bytes: int) -> bool:
    kv = 2 * S_pad * D * kv_bytes
    work = 2 * rows * S_pad * 4 + 2 * rows * D * 4
    return kv + work <= _ONEPASS_VMEM_CAP


@functools.partial(jax.jit, static_argnames=("interpret", "need_scores",
                                               "sliding_window"))
def fused_chunk_attend(
    q: jax.Array,        # (B, Hq, C, D)
    k: jax.Array,        # (B, Hkv, S, D) compute dtype or int8
    v: jax.Array,        # (B, Hkv, S, D)
    kv_pos: jax.Array,   # (B, Hkv, S)
    q_pos: jax.Array,    # (B, C)
    k_scale: jax.Array = None,  # (B, Hkv, S) f32 per-slot dequant (int8 KV)
    v_scale: jax.Array = None,
    interpret: bool = False,
    need_scores: bool = True,
    sliding_window=None,  # Mistral window (static)
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Returns (out (B,Hq,C,D), ssum (B,Hkv,S), ssq (B,Hkv,S),
    last_row (B,Hkv,S)) — the reduced score statistics in slot order
    (None when need_scores=False: plain prefill skips the score pass).
    float32 softmax throughout; int8-KV caches pass k_scale/v_scale and the
    dequant is folded on-chip (half the K/V HBM bytes, no materialized
    dequantized copy)."""
    B, Hq, C, D = q.shape
    Hkv, S = k.shape[1], k.shape[2]
    rep = Hq // Hkv
    scale = D ** -0.5
    quantized = k_scale is not None

    # 1-pass kernel needs only lane alignment (S % 128, usually a no-op —
    # the engine lane-aligns S); the 2-pass flash needs TILE_S multiples.
    # Padding to TILE_S when S is already 128-aligned would copy the whole
    # K/V buffer every call (the decode kernel's jnp.pad lesson, RESULTS.md).
    S_128 = ((S + 127) // 128) * 128
    onepass = _onepass_fits(rep * C, S_128, D, k.dtype.itemsize)
    S_pad = S_128 if onepass else ((S + TILE_S - 1) // TILE_S) * TILE_S
    if S_pad != S:
        pad = [(0, 0), (0, 0), (0, S_pad - S), (0, 0)]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        kv_pos = jnp.pad(kv_pos, [(0, 0), (0, 0), (0, S_pad - S)],
                         constant_values=-1)
        if quantized:
            p3 = [(0, 0), (0, 0), (0, S_pad - S)]
            k_scale = jnp.pad(k_scale, p3)
            v_scale = jnp.pad(v_scale, p3)
    nS = S_pad // TILE_S

    qg = q.reshape(B, Hkv, rep * C, D)
    pos4 = kv_pos[:, :, None, :]
    qpos_rows = jnp.tile(q_pos, (1, rep))    # (B, rep*C), row r -> q_pos[r % C]
    qpos4 = qpos_rows[:, None, None, :]
    if quantized:
        ks4 = k_scale.astype(jnp.float32)[:, :, None, :]
        vs4 = v_scale.astype(jnp.float32)[:, :, None, :]

    def spec(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    if onepass:
        sc_specs = ([spec((1, 1, 1, S_pad), lambda b, h: (b, h, 0, 0))] * 2
                    if quantized else [])
        sc_args = (ks4, vs4) if quantized else ()
        out, ssum, ssq, last = pl.pallas_call(
            functools.partial(_onepass_kernel, scale=scale, rep=rep, C=C,
                              need_scores=need_scores, quantized=quantized,
                              window=sliding_window),
            grid=(B, Hkv),
            in_specs=[
                spec((1, 1, rep * C, D), lambda b, h: (b, h, 0, 0)),
                spec((1, 1, S_pad, D), lambda b, h: (b, h, 0, 0)),
                spec((1, 1, S_pad, D), lambda b, h: (b, h, 0, 0)),
                spec((1, 1, 1, S_pad), lambda b, h: (b, h, 0, 0)),
                spec((1, 1, 1, rep * C), lambda b, h: (b, 0, 0, 0)),
            ] + sc_specs,
            out_specs=[
                spec((1, 1, rep * C, D), lambda b, h: (b, h, 0, 0)),
                spec((1, 1, 1, S_pad), lambda b, h: (b, h, 0, 0)),
                spec((1, 1, 1, S_pad), lambda b, h: (b, h, 0, 0)),
                spec((1, 1, 1, S_pad), lambda b, h: (b, h, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, Hkv, rep * C, D), q.dtype),
                jax.ShapeDtypeStruct((B, Hkv, 1, S_pad), jnp.float32),
                jax.ShapeDtypeStruct((B, Hkv, 1, S_pad), jnp.float32),
                jax.ShapeDtypeStruct((B, Hkv, 1, S_pad), jnp.float32),
            ],
            interpret=interpret,
        )(qg, k, v, pos4, qpos4, *sc_args)
        out = out.reshape(B, Hkv, rep, C, D).reshape(B, Hq, C, D)
        if not need_scores:
            return out, None, None, None
        return out, ssum[:, :, 0, :S], ssq[:, :, 0, :S], last[:, :, 0, :S]

    # pass 1: flash attention + stats
    tile_sc = ([spec((1, 1, 1, TILE_S), lambda b, h, s: (b, h, 0, s))] * 2
               if quantized else [])
    sc_args = (ks4, vs4) if quantized else ()
    out, m, l = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, rep=rep, C=C,
                          quantized=quantized, window=sliding_window),
        grid=(B, Hkv, nS),
        in_specs=[
            spec((1, 1, rep * C, D), lambda b, h, s: (b, h, 0, 0)),
            spec((1, 1, TILE_S, D), lambda b, h, s: (b, h, s, 0)),
            spec((1, 1, TILE_S, D), lambda b, h, s: (b, h, s, 0)),
            spec((1, 1, 1, TILE_S), lambda b, h, s: (b, h, 0, s)),
            spec((1, 1, 1, rep * C), lambda b, h, s: (b, 0, 0, 0)),
        ] + tile_sc,
        out_specs=[
            spec((1, 1, rep * C, D), lambda b, h, s: (b, h, 0, 0)),
            spec((1, 1, rep * C, 1), lambda b, h, s: (b, h, 0, 0)),
            spec((1, 1, rep * C, 1), lambda b, h, s: (b, h, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, rep * C, D), q.dtype),
            jax.ShapeDtypeStruct((B, Hkv, rep * C, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, Hkv, rep * C, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rep * C, D), jnp.float32),
            pltpu.VMEM((rep * C, 1), jnp.float32),
            pltpu.VMEM((rep * C, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qg, k, v, pos4, qpos4, *sc_args)

    if not need_scores:
        out = out.reshape(B, Hkv, rep, C, D).reshape(B, Hq, C, D)
        return out, None, None, None

    # pass 2: score statistics per S tile
    ks_spec = ([spec((1, 1, 1, TILE_S), lambda b, h, s: (b, h, 0, s))]
               if quantized else [])
    ks_args = (ks4,) if quantized else ()
    ssum, ssq, last = pl.pallas_call(
        functools.partial(_score_kernel, scale=scale, rep=rep, C=C,
                          quantized=quantized, window=sliding_window),
        grid=(B, Hkv, nS),
        in_specs=[
            spec((1, 1, rep * C, D), lambda b, h, s: (b, h, 0, 0)),
            spec((1, 1, TILE_S, D), lambda b, h, s: (b, h, s, 0)),
            spec((1, 1, 1, TILE_S), lambda b, h, s: (b, h, 0, s)),
            spec((1, 1, 1, rep * C), lambda b, h, s: (b, 0, 0, 0)),
        ] + ks_spec + [
            spec((1, 1, rep * C, 1), lambda b, h, s: (b, h, 0, 0)),
            spec((1, 1, rep * C, 1), lambda b, h, s: (b, h, 0, 0)),
        ],
        out_specs=[
            spec((1, 1, 1, TILE_S), lambda b, h, s: (b, h, 0, s)),
            spec((1, 1, 1, TILE_S), lambda b, h, s: (b, h, 0, s)),
            spec((1, 1, 1, TILE_S), lambda b, h, s: (b, h, 0, s)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, 1, S_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, Hkv, 1, S_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, Hkv, 1, S_pad), jnp.float32),
        ],
        interpret=interpret,
    )(qg, k, pos4, qpos4, *ks_args, m, l)

    out = out.reshape(B, Hkv, rep, C, D).reshape(B, Hq, C, D)
    return (
        out,
        ssum[:, :, 0, :S],
        ssq[:, :, 0, :S],
        last[:, :, 0, :S],
    )


def fused_chunk_attend_sharded(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_pos: jax.Array,
    q_pos: jax.Array,
    k_scale: jax.Array = None,
    v_scale: jax.Array = None,
    *,
    mesh,
    data_axis: str = "data",
    model_axis: str = "model",
    interpret: bool = False,
    need_scores: bool = True,
    sliding_window=None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """fused_chunk_attend under a (data, model) mesh via shard_map: like the
    decode kernel's sharded wrap (decode_attention.py), the (B, Hkv) grid
    programs are fully independent, so the kernel partitions over batch
    (data) and KV heads (model) with zero communication. Callers must ensure
    even shards (B % data == 0, Hkv % model == 0)."""
    from jax.sharding import PartitionSpec as P

    d, m = data_axis, model_axis
    p4 = P(d, m, None, None)
    p3 = P(d, m, None)
    quant = k_scale is not None

    def fn(q_, k_, v_, pos_, qp_, *sc):
        ks_, vs_ = sc if quant else (None, None)
        return fused_chunk_attend(
            q_, k_, v_, pos_, qp_, k_scale=ks_, v_scale=vs_,
            interpret=interpret, need_scores=need_scores,
            sliding_window=sliding_window,
        )

    args = (q, k, v, kv_pos, q_pos) + ((k_scale, v_scale) if quant else ())
    in_specs = (p4, p4, p4, p3, P(d, None)) + ((p3, p3) if quant else ())
    out_specs = (p4, p3, p3, p3) if need_scores else (p4, None, None, None)
    return jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )(*args)


# ---------------------------------------------------------------------------
# Fused write + attend: the strided-encode chunk body in ONE kernel pass.
# ---------------------------------------------------------------------------

# The estimate below double-counts relative to Mosaic's liveness packing
# (spreads and logits don't coexist at peak); 15 MB estimated fits the
# ~16 MB/core VMEM in practice — measured at S=5248 (estimate 14 MB):
# compiles and runs +30% over the dense-write fallback (RESULTS.md
# "Reference ppl regime"). Larger shapes fall back gracefully.
_WA_VMEM_CAP = 15 * 1024 * 1024


def wa_fits(rows: int, C: int, S: int, D: int, kv_bytes: int) -> bool:
    """VMEM predicate for the fused write+attend kernel: K/V blocks in+out,
    f32 logits/probs, the (C, S) one-hot, and one f32 (S, D) spread."""
    S_pad = ((S + 127) // 128) * 128
    kv = 4 * S_pad * D * kv_bytes            # K,V x in,out
    work = 2 * rows * S_pad * 4              # logits + probs
    onehot = C * S_pad * 4
    spread = 2 * S_pad * D * 4
    return kv + work + onehot + spread <= _WA_VMEM_CAP


def _wa_kernel(q_ref, kc_ref, vc_ref, ids_ref, qpos_ref, cinit_ref,
               k_ref, v_ref, pos_ref, score_ref, ssq_ref, cnt_ref, *rest,
               scale, rep, C, need_scores, quantized, mdt, window=None):
    """Fused chunk write + 1-pass attention (strided-encode inner body).

    Writes the C incoming rows into the cached (S, D) K/V block in VMEM via
    a one-hot (S,C)@(C,D) contraction (bit-exact with
    cache.write_tokens_dense: int8 values <= 127 / bf16 values pass exactly
    through a bf16-multiply/f32-accumulate dot; sidecar vectors use
    eq*val max-reductions — exact for the nonnegative pos/counter/scale
    values), then attends against the updated block — one kernel pass
    instead of a scatter + a separate attention kernel, and the K/V block
    crosses HBM once in each direction."""
    if quantized:
        ks_ref, vs_ref = rest[0], rest[1]
        rest = rest[2:]
    (out_ref, ssum_ref, ssqs_ref, last_ref,
     ko_ref, vo_ref, poso_ref, scoreo_ref, ssqo_ref, cnto_ref) = rest[:10]
    if quantized:
        kso_ref, vso_ref = rest[10], rest[11]

    ids = ids_ref[0, 0]                        # (1, C) int32
    ids_col = ids.reshape(C, 1)
    S = k_ref.shape[-2]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)   # (1, S)
    eqb = ids_col == iota                      # (C, S) one-hot bool
    eqf = eqb.astype(jnp.float32)
    wmask = jnp.max(eqf, axis=0, keepdims=True) > 0         # (1, S)
    wm_col = wmask.astype(jnp.int32).reshape(S, 1) > 0      # (S, 1)

    kc = kc_ref[0, 0].astype(jnp.float32)      # (C, D)
    vc = vc_ref[0, 0].astype(jnp.float32)
    if quantized:
        # reciprocal multiply to match cache.quantize_kv bit-for-bit
        r127 = jnp.float32(1.0 / 127.0)
        k_amax = jnp.max(jnp.abs(kc), axis=-1, keepdims=True)
        ksc = jnp.maximum(k_amax, 1e-8) * r127               # (C, 1)
        kc = jnp.clip(jnp.round(kc / ksc), -127, 127)
        v_amax = jnp.max(jnp.abs(vc), axis=-1, keepdims=True)
        vsc = jnp.maximum(v_amax, 1e-8) * r127
        vc = jnp.clip(jnp.round(vc / vsc), -127, 127)

    eqm = eqf.astype(mdt)

    def spread(rows):                          # (C, D) -> (S, D) one-hot pick
        return jax.lax.dot_general(
            eqm, rows.astype(mdt),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    k_old = k_ref[0, 0]
    v_old = v_ref[0, 0]
    k_new_f = jnp.where(wm_col, spread(kc), k_old.astype(jnp.float32))
    v_new_f = jnp.where(wm_col, spread(vc), v_old.astype(jnp.float32))
    ko_ref[0, 0] = k_new_f.astype(ko_ref.dtype)
    vo_ref[0, 0] = v_new_f.astype(vo_ref.dtype)

    def pick(vals_col):                        # (C, 1) nonneg -> (1, S)
        return jnp.max(eqf * vals_col, axis=0, keepdims=True)

    qp = qpos_ref[0, 0].reshape(rep * C, 1)    # (rep*C, 1) int32
    qp_c = qp[:C].astype(jnp.float32)          # (C, 1) chunk positions
    pos_new = jnp.where(wmask, pick(qp_c).astype(jnp.int32), pos_ref[0, 0])
    poso_ref[0, 0] = pos_new
    cnt_col = cinit_ref[0, 0].reshape(C, 1)
    cnto_ref[0, 0] = jnp.where(wmask, pick(cnt_col), cnt_ref[0, 0])
    scoreo_ref[0, 0] = jnp.where(wmask, 0.0, score_ref[0, 0])
    ssqo_ref[0, 0] = jnp.where(wmask, 0.0, ssq_ref[0, 0])
    if quantized:
        ks_new = jnp.where(wmask, pick(ksc), ks_ref[0, 0])
        vs_new = jnp.where(wmask, pick(vsc), vs_ref[0, 0])
        kso_ref[0, 0] = ks_new
        vso_ref[0, 0] = vs_new

    # --- attend against the updated block (same math as _onepass_kernel) ---
    q = q_ref[0, 0].astype(jnp.float32)        # (rep*C, D)
    logits = jax.lax.dot_general(
        q, k_new_f, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    if quantized:
        logits = logits * ks_new
    mask = (pos_new >= 0) & (pos_new <= qp)
    if window is not None:
        mask &= pos_new > qp - window  # Mistral sliding window (r4)
    logits = jnp.where(mask, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.where(mask, jnp.exp(logits - m), 0.0)
    p = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
    pv = p * vs_new if quantized else p
    out = jax.lax.dot_general(
        pv, v_new_f, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0, 0] = out.astype(out_ref.dtype)
    if need_scores:
        p_kv = jnp.mean(p.reshape(rep, C, S), axis=0)
        ssum_ref[0, 0] = jnp.sum(p_kv, axis=0, keepdims=True)
        ssqs_ref[0, 0] = jnp.sum(p_kv * p_kv, axis=0, keepdims=True)
        last_ref[0, 0] = p_kv[C - 1 :, :]


def _wa_flash_kernel(q_ref, kc_ref, vc_ref, ids_ref, qpos_ref, cinit_ref,
                     k_ref, v_ref, pos_ref, score_ref, ssq_ref, cnt_ref,
                     *rest, scale, rep, C, quantized, mdt, window=None):
    """S-tiled fused write + flash attention (VERDICT r2 next #4): the
    strided chunk body for contexts whose (S, D) K/V block exceeds VMEM
    (wa_fits false — e.g. S >= 8K at D=128). Per S-tile: the incoming rows
    whose target slot falls in this tile are written via the one-hot
    contraction (bit-identical math to _wa_kernel), then the online-softmax
    accumulators advance over the UPDATED tile. Scores (ssum/ssq/last) come
    from the existing _score_kernel second pass over the updated cache."""
    if quantized:
        ks_ref, vs_ref = rest[0], rest[1]
        rest = rest[2:]
    (out_ref, m_ref, l_ref,
     ko_ref, vo_ref, poso_ref, scoreo_ref, ssqo_ref, cnto_ref) = rest[:9]
    rest = rest[9:]
    if quantized:
        kso_ref, vso_ref = rest[0], rest[1]
        rest = rest[2:]
    acc, m_s, l_s = rest
    s = pl.program_id(2)
    nS = pl.num_programs(2)

    @pl.when(s == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        m_s[:] = jnp.full_like(m_s, NEG_INF)
        l_s[:] = jnp.zeros_like(l_s)

    TS = k_ref.shape[-2]
    base = s * TS
    ids_col = ids_ref[0, 0].reshape(C, 1) - base          # tile-local slots
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, TS), 1)
    eqb = ids_col == iota                                  # (C, TS)
    eqf = eqb.astype(jnp.float32)
    wmask = jnp.max(eqf, axis=0, keepdims=True) > 0        # (1, TS)
    wm_col = wmask.astype(jnp.int32).reshape(TS, 1) > 0

    kc = kc_ref[0, 0].astype(jnp.float32)                  # (C, D)
    vc = vc_ref[0, 0].astype(jnp.float32)
    if quantized:
        r127 = jnp.float32(1.0 / 127.0)
        k_amax = jnp.max(jnp.abs(kc), axis=-1, keepdims=True)
        ksc = jnp.maximum(k_amax, 1e-8) * r127
        kc = jnp.clip(jnp.round(kc / ksc), -127, 127)
        v_amax = jnp.max(jnp.abs(vc), axis=-1, keepdims=True)
        vsc = jnp.maximum(v_amax, 1e-8) * r127
        vc = jnp.clip(jnp.round(vc / vsc), -127, 127)

    eqm = eqf.astype(mdt)

    def spread(rows):
        return jax.lax.dot_general(
            eqm, rows.astype(mdt),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def pick(vals_col):
        return jnp.max(eqf * vals_col, axis=0, keepdims=True)

    k_new_f = jnp.where(wm_col, spread(kc), k_ref[0, 0].astype(jnp.float32))
    v_new_f = jnp.where(wm_col, spread(vc), v_ref[0, 0].astype(jnp.float32))
    ko_ref[0, 0] = k_new_f.astype(ko_ref.dtype)
    vo_ref[0, 0] = v_new_f.astype(vo_ref.dtype)

    qp = _row_qpos(qpos_ref, rep, C)                       # (rep*C, 1)
    qp_c = qp[:C].astype(jnp.float32)
    pos_new = jnp.where(wmask, pick(qp_c).astype(jnp.int32), pos_ref[0, 0])
    poso_ref[0, 0] = pos_new
    cnt_col = cinit_ref[0, 0].reshape(C, 1)
    cnto_ref[0, 0] = jnp.where(wmask, pick(cnt_col), cnt_ref[0, 0])
    scoreo_ref[0, 0] = jnp.where(wmask, 0.0, score_ref[0, 0])
    ssqo_ref[0, 0] = jnp.where(wmask, 0.0, ssq_ref[0, 0])
    if quantized:
        ks_new = jnp.where(wmask, pick(ksc), ks_ref[0, 0])
        vs_new = jnp.where(wmask, pick(vsc), vs_ref[0, 0])
        kso_ref[0, 0] = ks_new
        vso_ref[0, 0] = vs_new

    # --- flash accumulate over the updated tile ---
    q = q_ref[0, 0].astype(jnp.float32)                    # (rep*C, D)
    logits = jax.lax.dot_general(
        q, k_new_f, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    if quantized:
        logits = logits * ks_new
    mask = (pos_new >= 0) & (pos_new <= qp)
    if window is not None:
        mask &= pos_new > qp - window  # Mistral sliding window (r4)
    logits = jnp.where(mask, logits, NEG_INF)
    m_new = jnp.maximum(m_s[:], jnp.max(logits, axis=-1, keepdims=True))
    e = jnp.where(mask, jnp.exp(logits - m_new), 0.0)
    c_old = jnp.exp(m_s[:] - m_new)
    l_s[:] = l_s[:] * c_old + jnp.sum(e, axis=-1, keepdims=True)
    ev = e * vs_new if quantized else e
    acc[:] = acc[:] * c_old + jax.lax.dot_general(
        ev, v_new_f, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_s[:] = m_new

    @pl.when(s == nS - 1)
    def _():
        out_ref[0, 0] = (acc[:] / jnp.maximum(l_s[:], 1e-30)
                         ).astype(out_ref.dtype)
        m_ref[0, 0] = m_s[:]
        l_ref[0, 0] = l_s[:]


def _flash_tile(S: int) -> int:
    """Largest tile in (512, 256, 128) dividing the (128-aligned) S — no
    padding, so the K/V buffer is never copied just to tile it."""
    for ts in (512, 256, 128):
        if S % ts == 0:
            return ts
    return S


@functools.partial(jax.jit, static_argnames=("interpret", "need_scores",
                                               "sliding_window"))
def fused_chunk_write_attend(
    q: jax.Array,         # (B, Hq, C, D)
    k_c: jax.Array,       # (B, Hkv, C, D) incoming chunk, compute dtype
    v_c: jax.Array,       # (B, Hkv, C, D)
    ids: jax.Array,       # (B, Hkv, C) int32 target slots per head
    q_pos: jax.Array,     # (B, C) int32
    counter_init: jax.Array,  # (B, C) f32, nonnegative
    k: jax.Array,         # (B, Hkv, S, D) cache, compute dtype or int8
    v: jax.Array,
    kv_pos: jax.Array,    # (B, Hkv, S)
    score: jax.Array,     # (B, Hkv, S) f32
    score_sq: jax.Array,
    counter: jax.Array,
    k_scale: jax.Array = None,  # (B, Hkv, S) f32 (int8 KV) or None
    v_scale: jax.Array = None,
    interpret: bool = False,
    need_scores: bool = True,
    sliding_window=None,  # Mistral window (static)
):
    """One kernel pass for the strided-encode chunk body: write the chunk
    into the cache (quantizing in-kernel for int8 KV) and attend against the
    updated cache, emitting the reduced score statistics.

    Returns (out (B,Hq,C,D), ssum, ssq, last (B,Hkv,S) or Nones,
    (k, v, pos, score, score_sq, counter, k_scale, v_scale)) — the updated
    cache arrays (aliased in-place with the inputs)."""
    B, Hq, C, D = q.shape
    Hkv, S = k.shape[1], k.shape[2]
    rep = Hq // Hkv
    scale = D ** -0.5
    quantized = k_scale is not None
    assert S % 128 == 0, "fused write+attend requires lane-aligned S"
    mdt = jnp.float32 if k.dtype == jnp.float32 else jnp.bfloat16
    onepass = wa_fits(rep * C, C, S, D, k.dtype.itemsize)

    qg = q.reshape(B, Hkv, rep * C, D)
    qpos_rows = jnp.tile(q_pos, (1, rep))[:, None, None, :]   # (B,1,1,rep*C)
    cinit4 = counter_init[:, None, None, :]                   # (B,1,1,C)
    ids4 = ids[:, :, None, :]                                 # (B,Hkv,1,C)
    pos4 = kv_pos[:, :, None, :]
    sc4 = score[:, :, None, :]
    sq4 = score_sq[:, :, None, :]
    cn4 = counter[:, :, None, :]
    if quantized:
        ks4 = k_scale.astype(jnp.float32)[:, :, None, :]
        vs4 = v_scale.astype(jnp.float32)[:, :, None, :]

    def spec(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    bh = lambda b, h: (b, h, 0, 0)
    b0 = lambda b, h: (b, 0, 0, 0)
    sKD = spec((1, 1, S, D), bh)
    sS = spec((1, 1, 1, S), bh)
    sC = spec((1, 1, 1, C), bh)

    in_arrs = [qg, k_c, v_c, ids4, qpos_rows, cinit4,
               k, v, pos4, sc4, sq4, cn4]
    in_specs = [spec((1, 1, rep * C, D), bh), spec((1, 1, C, D), bh),
                spec((1, 1, C, D), bh), sC,
                spec((1, 1, 1, rep * C), b0), spec((1, 1, 1, C), b0),
                sKD, sKD, sS, sS, sS, sS]
    if quantized:
        in_arrs += [ks4, vs4]
        in_specs += [sS, sS]

    if onepass:
        out_specs = [spec((1, 1, rep * C, D), bh), sS, sS, sS,
                     sKD, sKD, sS, sS, sS, sS]
        out_shape = [
            jax.ShapeDtypeStruct((B, Hkv, rep * C, D), q.dtype),
            jax.ShapeDtypeStruct((B, Hkv, 1, S), jnp.float32),
            jax.ShapeDtypeStruct((B, Hkv, 1, S), jnp.float32),
            jax.ShapeDtypeStruct((B, Hkv, 1, S), jnp.float32),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
            jax.ShapeDtypeStruct(pos4.shape, jnp.int32),
            jax.ShapeDtypeStruct(sc4.shape, jnp.float32),
            jax.ShapeDtypeStruct(sq4.shape, jnp.float32),
            jax.ShapeDtypeStruct(cn4.shape, jnp.float32),
        ]
        # cache arrays update in place: input i -> output i - 2 (k starts at
        # input 6 / output 4)
        aliases = {6: 4, 7: 5, 8: 6, 9: 7, 10: 8, 11: 9}
        if quantized:
            out_specs += [sS, sS]
            out_shape += [jax.ShapeDtypeStruct(ks4.shape, jnp.float32),
                          jax.ShapeDtypeStruct(vs4.shape, jnp.float32)]
            aliases.update({12: 10, 13: 11})

        res = pl.pallas_call(
            functools.partial(_wa_kernel, scale=scale, rep=rep, C=C,
                              need_scores=need_scores, quantized=quantized,
                              mdt=mdt, window=sliding_window),
            grid=(B, Hkv),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            input_output_aliases=aliases,
            interpret=interpret,
        )(*in_arrs)
        out, ssum, ssq, last = res[0], res[1], res[2], res[3]
        k_n, v_n, pos_n, sc_n, sq_n, cn_n = res[4:10]
        out = out.reshape(B, Hkv, rep, C, D).reshape(B, Hq, C, D)
        stats = ((ssum[:, :, 0, :], ssq[:, :, 0, :], last[:, :, 0, :])
                 if need_scores else (None, None, None))
        cache_arrs = (k_n, v_n, pos_n[:, :, 0, :], sc_n[:, :, 0, :],
                      sq_n[:, :, 0, :], cn_n[:, :, 0, :])
        if quantized:
            cache_arrs += (res[10][:, :, 0, :], res[11][:, :, 0, :])
        return (out,) + stats + (cache_arrs,)

    # --- S-tiled flash write+attend (S beyond the one-pass VMEM cap) ---
    ts = _flash_tile(S)
    nS = S // ts
    bhs = lambda b, h, s: (b, h, 0, 0)
    b0s = lambda b, h, s: (b, 0, 0, 0)
    tKD = spec((1, 1, ts, D), lambda b, h, s: (b, h, s, 0))
    tS = spec((1, 1, 1, ts), lambda b, h, s: (b, h, 0, s))
    in_specs_f = [spec((1, 1, rep * C, D), bhs), spec((1, 1, C, D), bhs),
                  spec((1, 1, C, D), bhs), spec((1, 1, 1, C), bhs),
                  spec((1, 1, 1, rep * C), b0s), spec((1, 1, 1, C), b0s),
                  tKD, tKD, tS, tS, tS, tS]
    if quantized:
        in_specs_f += [tS, tS]
    out_specs_f = [spec((1, 1, rep * C, D), bhs),
                   spec((1, 1, rep * C, 1), bhs),
                   spec((1, 1, rep * C, 1), bhs),
                   tKD, tKD, tS, tS, tS, tS]
    out_shape_f = [
        jax.ShapeDtypeStruct((B, Hkv, rep * C, D), q.dtype),
        jax.ShapeDtypeStruct((B, Hkv, rep * C, 1), jnp.float32),
        jax.ShapeDtypeStruct((B, Hkv, rep * C, 1), jnp.float32),
        jax.ShapeDtypeStruct(k.shape, k.dtype),
        jax.ShapeDtypeStruct(v.shape, v.dtype),
        jax.ShapeDtypeStruct(pos4.shape, jnp.int32),
        jax.ShapeDtypeStruct(sc4.shape, jnp.float32),
        jax.ShapeDtypeStruct(sq4.shape, jnp.float32),
        jax.ShapeDtypeStruct(cn4.shape, jnp.float32),
    ]
    aliases = {6: 3, 7: 4, 8: 5, 9: 6, 10: 7, 11: 8}
    if quantized:
        out_specs_f += [tS, tS]
        out_shape_f += [jax.ShapeDtypeStruct(ks4.shape, jnp.float32),
                        jax.ShapeDtypeStruct(vs4.shape, jnp.float32)]
        aliases.update({12: 9, 13: 10})
    res = pl.pallas_call(
        functools.partial(_wa_flash_kernel, scale=scale, rep=rep, C=C,
                          quantized=quantized, mdt=mdt,
                          window=sliding_window),
        grid=(B, Hkv, nS),
        in_specs=in_specs_f,
        out_specs=out_specs_f,
        out_shape=out_shape_f,
        input_output_aliases=aliases,
        scratch_shapes=[
            pltpu.VMEM((rep * C, D), jnp.float32),
            pltpu.VMEM((rep * C, 1), jnp.float32),
            pltpu.VMEM((rep * C, 1), jnp.float32),
        ],
        interpret=interpret,
    )(*in_arrs)
    out, m, l = res[0], res[1], res[2]
    k_n, v_n, pos_n, sc_n, sq_n, cn_n = res[3:9]
    ks_n = vs_n = None
    if quantized:
        ks_n, vs_n = res[9], res[10]
    out = out.reshape(B, Hkv, rep, C, D).reshape(B, Hq, C, D)
    cache_arrs = (k_n, v_n, pos_n[:, :, 0, :], sc_n[:, :, 0, :],
                  sq_n[:, :, 0, :], cn_n[:, :, 0, :])
    if quantized:
        cache_arrs += (ks_n[:, :, 0, :], vs_n[:, :, 0, :])
    if not need_scores:
        return (out, None, None, None, cache_arrs)

    # pass 2: exact score statistics over the UPDATED cache (_score_kernel)
    ks_spec = [tS] if quantized else []
    ks_args = (ks_n,) if quantized else ()
    ssum, ssq, last = pl.pallas_call(
        functools.partial(_score_kernel, scale=scale, rep=rep, C=C,
                          quantized=quantized, window=sliding_window),
        grid=(B, Hkv, nS),
        in_specs=[
            spec((1, 1, rep * C, D), bhs),
            tKD,
            tS,
            spec((1, 1, 1, rep * C), b0s),
        ] + ks_spec + [
            spec((1, 1, rep * C, 1), bhs),
            spec((1, 1, rep * C, 1), bhs),
        ],
        out_specs=[tS, tS, tS],
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, 1, S), jnp.float32),
            jax.ShapeDtypeStruct((B, Hkv, 1, S), jnp.float32),
            jax.ShapeDtypeStruct((B, Hkv, 1, S), jnp.float32),
        ],
        interpret=interpret,
    )(qg, k_n, pos_n, qpos_rows, *ks_args, m, l)
    return (out, ssum[:, :, 0, :], ssq[:, :, 0, :], last[:, :, 0, :],
            cache_arrs)


def fused_chunk_write_attend_sharded(
    q, k_c, v_c, ids, q_pos, counter_init,
    k, v, kv_pos, score, score_sq, counter,
    k_scale=None, v_scale=None, *,
    mesh, data_axis: str = "data", model_axis: str = "model",
    interpret: bool = False, need_scores: bool = True,
    sliding_window=None,
):
    """fused_chunk_write_attend under a (data, model) mesh via shard_map —
    (B, Hkv) grid programs are independent, zero communication (same
    contract as fused_chunk_attend_sharded: even shards required)."""
    from jax.sharding import PartitionSpec as P

    d, m = data_axis, model_axis
    p4 = P(d, m, None, None)
    p3 = P(d, m, None)
    pB = P(d, None)
    quant = k_scale is not None

    def fn(q_, kc_, vc_, ids_, qp_, ci_, k_, v_, pos_, sc_, sq_, cn_, *sc2):
        ks_, vs_ = sc2 if quant else (None, None)
        return fused_chunk_write_attend(
            q_, kc_, vc_, ids_, qp_, ci_, k_, v_, pos_, sc_, sq_, cn_,
            k_scale=ks_, v_scale=vs_, interpret=interpret,
            need_scores=need_scores, sliding_window=sliding_window,
        )

    args = (q, k_c, v_c, ids, q_pos, counter_init,
            k, v, kv_pos, score, score_sq, counter)
    in_specs = (p4, p4, p4, p3, pB, pB, p4, p4, p3, p3, p3, p3)
    if quant:
        args += (k_scale, v_scale)
        in_specs += (p3, p3)
    stats = (p3, p3, p3) if need_scores else (None, None, None)
    cache_specs = (p4, p4, p3, p3, p3, p3) + ((p3, p3) if quant else ())
    out_specs = (p4,) + stats + (cache_specs,)
    return jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )(*args)


# ---------------------------------------------------------------------------
# Fused full chunk step: write + attend + score update + eviction in ONE
# kernel pass (roco / h2o_head strided encoding).
# ---------------------------------------------------------------------------

STD_FORCE = 1e9       # policies.STD_FORCE
STD_EXCLUDE = 1e30    # policies.STD_EXCLUDE
ROCO_STD_GUARD = 10   # policies.ROCO_STD_GUARD

STEP_POLICIES = ("roco", "h2o_head")


def _cumsum_lanes(x):
    """Inclusive prefix sum along the lane axis of a (1, S) int32 vector —
    log-step shift-adds (Mosaic has no cumsum lowering)."""
    S = x.shape[-1]
    step = 1
    while step < S:
        shifted = jnp.concatenate(
            [jnp.zeros((1, step), x.dtype), x[:, : S - step]], axis=1)
        x = x + shifted
        step *= 2
    return x


def _kth_smallest_pos_f32(vals, k):
    """Exact k-th smallest of NON-NEGATIVE f32 (NaN sorts last, like XLA's
    total-order sort) along the last axis via 31-step int-bisection on the
    bit pattern (non-negative f32 order == int32 order). Returns (..., 1)
    f32 — bit-identical to policies._kth_smallest on non-negative input."""
    bits = jax.lax.bitcast_convert_type(vals.astype(jnp.float32), jnp.int32)

    def body(i, prefix):
        cand = prefix | jax.lax.shift_left(jnp.int32(1), 30 - i)
        cnt = jnp.sum((bits < cand).astype(jnp.int32), axis=-1, keepdims=True)
        return jnp.where(cnt >= k, prefix, cand)

    kth = jax.lax.fori_loop(0, 31, body, jnp.zeros_like(bits[..., :1]))
    return jax.lax.bitcast_convert_type(kth, jnp.float32)


def _select_smallest_mask(vals, cand, k):
    """Boolean mask of the k smallest `vals` where `cand` (1, S), ties at
    the threshold filled in ascending slot order — the exact selection set
    and tie order of policies._smallest_k's stable sort."""
    masked = jnp.where(cand, vals, jnp.float32(jnp.inf))
    thresh = _kth_smallest_pos_f32(masked, k)
    below = masked < thresh
    at = masked == thresh
    need = k - jnp.sum(below.astype(jnp.int32), axis=-1, keepdims=True)
    fill_rank = _cumsum_lanes(at.astype(jnp.int32)) - 1
    return below | (at & (fill_rank < need))


def _step_kernel(q_ref, kc_ref, vc_ref, wm_ref, qpos_ref, cinit_ref,
                 iparams_ref,
                 k_ref, v_ref, pos_ref, score_ref, ssq_ref, cnt_ref, *rest,
                 scale, rep, C, quantized, mdt, policy, feasible_k,
                 sink, recent_window, window=None):
    """Whole strided-encode chunk body for one (batch, kv-head):

      write chunk rows at the carried mask's slots (rank r -> row r) ->
      1-pass attention over the updated block -> gated score update
      (roco: +sum p, +sum p^2; h2o: +sum p) -> gated eviction (counter
      bump, policy selection via exact kth-threshold + stable tie fill,
      slot invalidation) -> emit the next chunk's write mask (evicted
      slots, or the next contiguous window when no event fired).

    Selection semantics are bit-identical to policies.select_evictions for
    the encode phase (same masked values, same kth threshold from the bit
    bisection, same first-occurrence tie order)."""
    if quantized:
        ks_ref, vs_ref = rest[0], rest[1]
        rest = rest[2:]
    (out_ref, ko_ref, vo_ref, poso_ref, scoreo_ref, ssqo_ref, cnto_ref
     ) = rest[:7]
    rest = rest[7:]
    if quantized:
        kso_ref, vso_ref = rest[0], rest[1]
        rest = rest[2:]
    wmo_ref = rest[0]

    b = pl.program_id(0)
    g_upd = iparams_ref[b, 0] != 0
    g_evt = iparams_ref[b, 1] != 0
    next_pos = iparams_ref[b, 2]
    next_start = iparams_ref[b, 3]

    S = k_ref.shape[-2]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)    # (1, S)
    wm_in = wm_ref[0, 0] != 0                                 # (1, S)
    # rank-r masked slot receives chunk row r
    ranks = _cumsum_lanes(wm_in.astype(jnp.int32)) - 1        # (1, S)
    rows = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
    eqb = wm_in & (ranks == rows)                             # (C, S)
    eqf = eqb.astype(jnp.float32)
    wmask = wm_in
    wm_col = wm_in.astype(jnp.int32).reshape(S, 1) > 0

    kc = kc_ref[0, 0].astype(jnp.float32)
    vc = vc_ref[0, 0].astype(jnp.float32)
    if quantized:
        r127 = jnp.float32(1.0 / 127.0)
        ksc = jnp.maximum(jnp.max(jnp.abs(kc), axis=-1, keepdims=True),
                          1e-8) * r127
        kc = jnp.clip(jnp.round(kc / ksc), -127, 127)
        vsc = jnp.maximum(jnp.max(jnp.abs(vc), axis=-1, keepdims=True),
                          1e-8) * r127
        vc = jnp.clip(jnp.round(vc / vsc), -127, 127)

    eqm = eqf.astype(mdt)

    def spread(rows_cd):
        return jax.lax.dot_general(
            eqm, rows_cd.astype(mdt),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    k_new_f = jnp.where(wm_col, spread(kc), k_ref[0, 0].astype(jnp.float32))
    v_new_f = jnp.where(wm_col, spread(vc), v_ref[0, 0].astype(jnp.float32))
    ko_ref[0, 0] = k_new_f.astype(ko_ref.dtype)
    vo_ref[0, 0] = v_new_f.astype(vo_ref.dtype)

    def pick(vals_col):
        return jnp.max(eqf * vals_col, axis=0, keepdims=True)

    qp = qpos_ref[0, 0].reshape(rep * C, 1)
    qp_c = qp[:C].astype(jnp.float32)
    pos = jnp.where(wmask, pick(qp_c).astype(jnp.int32), pos_ref[0, 0])
    cnt_col = cinit_ref[0, 0].reshape(C, 1)
    counter = jnp.where(wmask, pick(cnt_col), cnt_ref[0, 0])
    score = jnp.where(wmask, 0.0, score_ref[0, 0])
    ssq = jnp.where(wmask, 0.0, ssq_ref[0, 0])
    if quantized:
        ks_new = jnp.where(wmask, pick(ksc), ks_ref[0, 0])
        vs_new = jnp.where(wmask, pick(vsc), vs_ref[0, 0])
        kso_ref[0, 0] = ks_new
        vso_ref[0, 0] = vs_new

    # --- attend ---
    q = q_ref[0, 0].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q, k_new_f, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    if quantized:
        logits = logits * ks_new
    amask = (pos >= 0) & (pos <= qp)
    if window is not None:
        amask &= pos > qp - window  # Mistral sliding window (r4)
    logits = jnp.where(amask, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.where(amask, jnp.exp(logits - m), 0.0)
    p = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
    pv = p * vs_new if quantized else p
    out = jax.lax.dot_general(
        pv, v_new_f, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0, 0] = out.astype(out_ref.dtype)

    # --- gated score update (policies.update_scores_reduced) ---
    p_kv = jnp.mean(p.reshape(rep, C, S), axis=0)             # (C, S)
    gf = g_upd.astype(jnp.float32)
    score = score + jnp.sum(p_kv, axis=0, keepdims=True) * gf
    if policy == "roco":
        ssq = ssq + jnp.sum(p_kv * p_kv, axis=0, keepdims=True) * gf

    # --- gated eviction (policies.evict_layer, encode phase) ---
    counter = counter + jnp.float32(C) * g_evt.astype(jnp.float32)
    base = pos >= 0
    if policy == "roco":
        mean = score / counter
        var = ssq / counter - mean * mean
        std = jnp.sqrt(jnp.maximum(var, 0.0))
        forced = (pos >= next_pos - ROCO_STD_GUARD) | (pos < sink)
        force_val = jnp.float32(STD_FORCE) + pos.astype(jnp.float32) * 1024.0
        std = jnp.where(forced, force_val, std)
        std = jnp.where(base, std, jnp.float32(STD_EXCLUDE))
        thresh = _kth_smallest_pos_f32(std, feasible_k)
        feasible = std <= thresh
        emask = _select_smallest_mask(mean, feasible, C)
    else:  # h2o_head
        cand = base & (pos >= sink) & (pos < next_pos - recent_window)
        emask = _select_smallest_mask(score, cand, C)
    emask = emask & g_evt
    pos = jnp.where(emask, -1, pos)

    poso_ref[0, 0] = pos
    scoreo_ref[0, 0] = score
    ssqo_ref[0, 0] = ssq
    cnto_ref[0, 0] = counter
    contig = (iota >= next_start) & (iota < next_start + C)
    # int32 select: Mosaic cannot legalize arith.select on i1 vectors
    wmo_ref[0, 0] = jnp.where(g_evt, emask.astype(jnp.int32),
                              contig.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=(
    "interpret", "policy", "feasible_k", "sink", "recent_window",
    "sliding_window"))
def fused_chunk_step(
    q: jax.Array,          # (B, Hq, C, D)
    k_c: jax.Array,        # (B, Hkv, C, D)
    v_c: jax.Array,        # (B, Hkv, C, D)
    write_mask: jax.Array,  # (B, Hkv, S) int32/bool: this chunk's slots
    q_pos: jax.Array,      # (B, C) int32
    counter_init: jax.Array,  # (B, C) f32 nonnegative
    update_gate: jax.Array,   # (B,) bool
    evict_gate: jax.Array,    # (B,) bool
    next_pos: jax.Array,      # (B,) int32
    next_start: jax.Array,    # (B,) int32: next contiguous window start
    k: jax.Array, v: jax.Array, kv_pos: jax.Array,
    score: jax.Array, score_sq: jax.Array, counter: jax.Array,
    k_scale: jax.Array = None, v_scale: jax.Array = None,
    *, policy: str, feasible_k: int = 0, sink: int = 0,
    recent_window: int = 0, sliding_window=None, interpret: bool = False,
):
    """Entire strided-encode chunk body in one kernel (write + attend +
    score update + eviction). Returns (out (B,Hq,C,D),
    (k, v, pos, score, score_sq, counter[, k_scale, v_scale]) updated
    in place, next write_mask (B,Hkv,S) int32)."""
    assert policy in STEP_POLICIES
    B, Hq, C, D = q.shape
    Hkv, S = k.shape[1], k.shape[2]
    rep = Hq // Hkv
    scale = D ** -0.5
    quantized = k_scale is not None
    assert S % 128 == 0
    mdt = jnp.float32 if k.dtype == jnp.float32 else jnp.bfloat16

    qg = q.reshape(B, Hkv, rep * C, D)
    qpos_rows = jnp.tile(q_pos, (1, rep))[:, None, None, :]
    cinit4 = counter_init[:, None, None, :]
    wm4 = write_mask.astype(jnp.int32)[:, :, None, :]
    pos4 = kv_pos[:, :, None, :]
    sc4 = score[:, :, None, :]
    sq4 = score_sq[:, :, None, :]
    cn4 = counter[:, :, None, :]
    iparams = jnp.stack([
        update_gate.astype(jnp.int32), evict_gate.astype(jnp.int32),
        next_pos.astype(jnp.int32), next_start.astype(jnp.int32),
    ], axis=1)                                            # (B, 4)
    if quantized:
        ks4 = k_scale.astype(jnp.float32)[:, :, None, :]
        vs4 = v_scale.astype(jnp.float32)[:, :, None, :]

    def spec(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    bh = lambda b, h: (b, h, 0, 0)
    b0 = lambda b, h: (b, 0, 0, 0)
    sKD = spec((1, 1, S, D), bh)
    sS = spec((1, 1, 1, S), bh)

    in_arrs = [qg, k_c, v_c, wm4, qpos_rows, cinit4, iparams,
               k, v, pos4, sc4, sq4, cn4]
    in_specs = [spec((1, 1, rep * C, D), bh), spec((1, 1, C, D), bh),
                spec((1, 1, C, D), bh), sS,
                spec((1, 1, 1, rep * C), b0), spec((1, 1, 1, C), b0),
                pl.BlockSpec((B, 4), lambda b, h: (0, 0),
                             memory_space=pltpu.VMEM),
                sKD, sKD, sS, sS, sS, sS]
    if quantized:
        in_arrs += [ks4, vs4]
        in_specs += [sS, sS]

    out_specs = [spec((1, 1, rep * C, D), bh),
                 sKD, sKD, sS, sS, sS, sS]
    out_shape = [
        jax.ShapeDtypeStruct((B, Hkv, rep * C, D), q.dtype),
        jax.ShapeDtypeStruct(k.shape, k.dtype),
        jax.ShapeDtypeStruct(v.shape, v.dtype),
        jax.ShapeDtypeStruct(pos4.shape, jnp.int32),
        jax.ShapeDtypeStruct(sc4.shape, jnp.float32),
        jax.ShapeDtypeStruct(sq4.shape, jnp.float32),
        jax.ShapeDtypeStruct(cn4.shape, jnp.float32),
    ]
    aliases = {7: 1, 8: 2, 9: 3, 10: 4, 11: 5, 12: 6}
    if quantized:
        out_specs += [sS, sS]
        out_shape += [jax.ShapeDtypeStruct(ks4.shape, jnp.float32),
                      jax.ShapeDtypeStruct(vs4.shape, jnp.float32)]
        aliases.update({13: 7, 14: 8})
    out_specs += [sS]
    out_shape += [jax.ShapeDtypeStruct(wm4.shape, jnp.int32)]

    res = pl.pallas_call(
        functools.partial(_step_kernel, scale=scale, rep=rep, C=C,
                          quantized=quantized, mdt=mdt, policy=policy,
                          feasible_k=feasible_k, sink=sink,
                          recent_window=recent_window,
                          window=sliding_window),
        grid=(B, Hkv),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases=aliases,
        interpret=interpret,
    )(*in_arrs)
    out = res[0].reshape(B, Hkv, rep, C, D).reshape(B, Hq, C, D)
    k_n, v_n, pos_n, sc_n, sq_n, cn_n = res[1:7]
    cache_arrs = (k_n, v_n, pos_n[:, :, 0, :], sc_n[:, :, 0, :],
                  sq_n[:, :, 0, :], cn_n[:, :, 0, :])
    i = 7
    if quantized:
        cache_arrs += (res[7][:, :, 0, :], res[8][:, :, 0, :])
        i = 9
    wm_next = res[i][:, :, 0, :]
    return out, cache_arrs, wm_next


def fused_chunk_step_sharded(
    q, k_c, v_c, write_mask, q_pos, counter_init,
    update_gate, evict_gate, next_pos, next_start,
    k, v, kv_pos, score, score_sq, counter,
    k_scale=None, v_scale=None, *,
    mesh, data_axis: str = "data", model_axis: str = "model",
    policy: str, feasible_k: int = 0, sink: int = 0, recent_window: int = 0,
    sliding_window=None, interpret: bool = False,
):
    """fused_chunk_step under a (data, model) mesh via shard_map (even
    shards required; programs are fully independent)."""
    from jax.sharding import PartitionSpec as P

    d, m = data_axis, model_axis
    p4 = P(d, m, None, None)
    p3 = P(d, m, None)
    pB = P(d, None)
    p1 = P(d)
    quant = k_scale is not None

    def fn(q_, kc_, vc_, wm_, qp_, ci_, ug_, eg_, np_, ns_,
           k_, v_, pos_, sc_, sq_, cn_, *sc2):
        ks_, vs_ = sc2 if quant else (None, None)
        return fused_chunk_step(
            q_, kc_, vc_, wm_, qp_, ci_, ug_, eg_, np_, ns_,
            k_, v_, pos_, sc_, sq_, cn_, k_scale=ks_, v_scale=vs_,
            policy=policy, feasible_k=feasible_k, sink=sink,
            recent_window=recent_window, sliding_window=sliding_window,
            interpret=interpret,
        )

    args = (q, k_c, v_c, write_mask, q_pos, counter_init,
            update_gate, evict_gate, next_pos, next_start,
            k, v, kv_pos, score, score_sq, counter)
    in_specs = (p4, p4, p4, p3, pB, pB, p1, p1, p1, p1,
                p4, p4, p3, p3, p3, p3)
    if quant:
        args += (k_scale, v_scale)
        in_specs += (p3, p3)
    cache_specs = (p4, p4, p3, p3, p3, p3) + ((p3, p3) if quant else ())
    out_specs = (p4, cache_specs, p3)
    return jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )(*args)
