"""Fused Pallas TPU kernel: single-token decode attention over the budgeted
KV ring buffer + eviction-score probability emission in one VMEM pass.

Replaces (on TPU, T=1) the XLA path in ops/attention.py, which itself
replaces the reference's materialize-attention-maps design
(reference llama_patch.py:244-247 + easykv.py:271-300): here K and V are
read from HBM exactly once per step; masking (slot validity + causality),
the fp32 softmax, the GQA group mean for KV-head-granular scores
(reference process_for_mqa_gqa, easykv.py:188-196), and the attention
output all happen on-chip.

Quantized (int8) KV is supported natively: K/V stream from HBM as int8
(half the bytes) and the per-slot dequant scales fold into the attention
logits (k_scale) and the probability matrix (v_scale) — no dequantized
copy is ever materialized.

Grid: (B, Hkv). Per program: q (rep, D), K/V (S, D), pos (1, S) in VMEM.
VMEM footprint ~ 2*S*D*(1|2)B; S up to ~16K fits comfortably at D=128.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30  # plain float: jnp constants would be captured as kernel consts

# Timing-only debug knob (results become garbage): compile out the streaming
# rank-rotation to attribute its share of the step. EASYKV_TPU_STREAM_SKIP=rot
import os as _os

_SKIP_ROT = "rot" in _os.environ.get("EASYKV_TPU_STREAM_SKIP", "")


def _kernel(qpos_ref, q_ref, k_ref, v_ref, pos_ref, *rest, scale, quant,
            sliding_window=None):
    if quant:
        ksc_ref, vsc_ref, out_ref, probs_ref = rest
    else:
        out_ref, probs_ref = rest
    b = pl.program_id(0)
    q = q_ref[0, 0].astype(jnp.float32)          # (rep, D)
    k = k_ref[0, 0].astype(jnp.float32)          # (S, D)
    v = v_ref[0, 0]                              # (S, D)
    pos = pos_ref[0, 0]                          # (1, S)
    q_pos = qpos_ref[b]

    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                     # (rep, S)
    if quant:
        logits = logits * ksc_ref[0, 0]           # fold k dequant into logits
    mask = (pos >= 0) & (pos <= q_pos)            # (1, S)
    if sliding_window is not None:
        # Mistral sliding-window attention (reference mistral_patch.py:90-186
        # via HF's window mask): one extra compare, same semantics as
        # ops.attention.attend
        mask &= pos > q_pos - sliding_window
    logits = jnp.where(mask, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    e = jnp.where(mask, e, 0.0)
    denom = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
    p = e / denom                                 # (rep, S) f32

    pv = p * vsc_ref[0, 0] if quant else p        # fold v dequant into probs
    out = jax.lax.dot_general(
        pv, v.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                             # (rep, D)
    out_ref[0, 0] = out.astype(out_ref.dtype)
    probs_ref[0, 0] = jnp.mean(p, axis=0, keepdims=True)  # (1, S) GQA mean


def _kernel_inflight(qpos_ref, q_ref, kn_ref, vn_ref, k_ref, v_ref, pos_ref,
                     *rest, scale, quant, hb, streaming=False,
                     ordered=False, sliding_window=None):
    """_kernel plus an in-flight (not yet cached) token: its logit joins the
    softmax and its value joins the output; emits the GQA-mean probability of
    both the cached slots and the in-flight token (late-write decode path).

    `hb` KV heads per program (unrolled): fewer program dispatches and
    larger contiguous DMA blocks than one-head-per-program.

    streaming=True (StreamingLLM cache-relative RoPE, reference
    llama_patch.py:251-379): cached K is stored UN-rotated and each slot is
    rotated on-chip by its age rank via a TWO-LEVEL angle decomposition:
    rank = 128*qh + m, R(rank*theta) = R(qh*128*theta) o R(m*theta), so the
    cos/sin rows come from one (S, 128) and one (S, S/128) one-hot MXU pick
    (~25 MFLOP/head at S=768) instead of a full (S, S) pick (~300 MFLOP) —
    the direct in-kernel transcendental variant measured ~7 us per head
    (5+ ms/step at 7B). Each f32 table is SPLIT into two bf16 planes
    (t1 = bf16(t), t2 = bf16(t - t1)) so the picked values reconstruct to
    ~2^-17 while the dots run at bf16 MXU rate; both tables pack
    [c1|c2|s1|s2] column-wise so each level is ONE 4*(D/2)-wide dot. No
    dequantized K copy: rotation is linear, so the int8 values rotate raw
    and the per-slot dequant scale still folds into the logits. q and the
    in-flight K arrive pre-rotated by the caller."""
    if streaming and ordered:
        # age-ordered cache (engine compacts on evict): rank == slot index,
        # so the split-bf16 cos/sin table applies ROW-DIRECT — no one-hot
        # pick dots at all (they cost 2.7 ms/step at 7B, RESULTS.md r4
        # streaming attribution)
        td_ref = rest[0]
        rest = rest[1:]
    elif streaming:
        rank_ref, tm_ref, tq_ref = rest[0], rest[1], rest[2]
        rest = rest[3:]
    if quant:
        ksc_ref, vsc_ref, out_ref, probs_ref, pnew_ref = rest
    else:
        out_ref, probs_ref, pnew_ref = rest
    b = pl.program_id(0)
    q_pos = qpos_ref[b]
    live = q_pos >= 0

    for i in range(hb):
        q = q_ref[0, i].astype(jnp.float32)          # (rep, D)
        kn = kn_ref[0, i].astype(jnp.float32)        # (1, D)
        vn = vn_ref[0, i].astype(jnp.float32)        # (1, D)
        k = k_ref[0, i].astype(jnp.float32)          # (S, D)
        v = v_ref[0, i]                              # (S, D)
        pos = pos_ref[0, i]                          # (1, S)
        if streaming and ordered and not _SKIP_ROT:
            S, D = k.shape
            d2 = D // 2
            td = td_ref[:].astype(jnp.float32)       # (S, 4*d2)
            cm = td[:, :d2] + td[:, d2:2 * d2]       # ~f32-exact cos
            sm = td[:, 2 * d2:3 * d2] + td[:, 3 * d2:]
            k1, k2 = k[:, :d2], k[:, d2:]
            k = jnp.concatenate(
                [k1 * cm - k2 * sm, k2 * cm + k1 * sm], axis=-1)
        elif streaming and not _SKIP_ROT:
            S, D = k.shape
            d2 = D // 2
            rank = rank_ref[0, i].reshape(S, 1)      # (S, 1)
            dnr = (((1,), (0,)), ((), ()))

            def pick4(idx, width, tref):
                # one-hot (S, width) @ [c1|c2|s1|s2] (width, 4*d2) -> summed
                # split planes: (cos, sin) each (S, d2) ~f32-exact
                oneh = jnp.where(
                    idx == jax.lax.broadcasted_iota(jnp.int32, (1, width), 1),
                    1.0, 0.0).astype(jnp.bfloat16)
                y = jax.lax.dot_general(
                    oneh, tref[:], dimension_numbers=dnr,
                    preferred_element_type=jnp.float32)      # (S, 4*d2)
                return (y[:, :d2] + y[:, d2:2 * d2],
                        y[:, 2 * d2:3 * d2] + y[:, 3 * d2:])

            cm, sm = pick4(jnp.bitwise_and(rank, 127), 128, tm_ref)
            cq, sq = pick4(jnp.right_shift(rank, 7),
                           tq_ref.shape[0], tq_ref)
            k1, k2 = k[:, :d2], k[:, d2:]
            # R(rank) = R(128*qh) o R(m): two successive Givens rotations
            k1m = k1 * cm - k2 * sm
            k2m = k2 * cm + k1 * sm
            k = jnp.concatenate(
                [k1m * cq - k2m * sq, k2m * cq + k1m * sq], axis=-1)

        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                     # (rep, S)
        if quant:
            logits = logits * ksc_ref[0, i]
        logit_new = jax.lax.dot_general(
            q, kn, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                     # (rep, 1)
        mask = (pos >= 0) & (pos <= q_pos)            # (1, S)
        if sliding_window is not None:
            # Mistral sliding window: true-position compare, matching
            # ops.attention.attend_inflight (the in-flight token sits at
            # q_pos, always inside its own window)
            mask &= pos > q_pos - sliding_window
        logits = jnp.where(mask, logits, NEG_INF)
        logit_new = jnp.where(live, logit_new, NEG_INF)
        m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), logit_new)
        e = jnp.where(mask, jnp.exp(logits - m), 0.0)
        e_new = jnp.where(live, jnp.exp(logit_new - m), 0.0)
        denom = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True) + e_new, 1e-30)
        p = e / denom                                 # (rep, S)
        p_new = e_new / denom                         # (rep, 1)

        pv = p * vsc_ref[0, i] if quant else p
        out = jax.lax.dot_general(
            pv, v.astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + p_new * vn                                # (rep, D)
        out_ref[0, i] = out.astype(out_ref.dtype)
        probs_ref[0, i] = jnp.mean(p, axis=0, keepdims=True)   # (1, S)
        pnew_ref[0, i] = jnp.broadcast_to(
            jnp.mean(p_new, axis=0, keepdims=True), pnew_ref.shape[2:]
        )


@functools.partial(jax.jit, static_argnames=("interpret", "sliding_window",
                                             "ordered"))
def fused_decode_attend_inflight(
    q: jax.Array,       # (B, Hq, 1, D) rotated
    k_new: jax.Array,   # (B, Hkv, 1, D) unquantized, rotated
    v_new: jax.Array,   # (B, Hkv, 1, D)
    k: jax.Array,       # (B, Hkv, S, D) compute dtype or int8
    v: jax.Array,       # (B, Hkv, S, D)
    kv_pos: jax.Array,  # (B, Hkv, S) int32
    q_pos: jax.Array,   # (B,) int32
    k_scale: Optional[jax.Array] = None,  # (B, Hkv, S) f32 when int8
    v_scale: Optional[jax.Array] = None,
    rank: Optional[jax.Array] = None,     # (B, Hkv, S) age ranks (streaming)
    inv_freq: Optional[jax.Array] = None,  # (D/2,) f32 rope frequencies
    ordered: bool = False,   # age-ordered cache: rank == slot (no rank arg)
    sliding_window: Optional[int] = None,  # Mistral window (static)
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Late-write decode attention: the current token's K/V is passed
    directly instead of being scattered into the cache first. Returns
    (out (B, Hq, 1, D), probs_kv (B, Hkv, 1, S) f32, p_new (B, Hkv, 1) f32);
    see ops.attention.attend_inflight for the semantics. With rank/cos_t/
    sin_t the cached (un-rotated) K is rotated by age rank on-chip —
    StreamingLLM mode on the same fast path."""
    B, Hq, T, D = q.shape
    assert T == 1
    Hkv, S = k.shape[1], k.shape[2]
    rep = Hq // Hkv
    scale = D ** -0.5
    quant = k_scale is not None
    streaming = (rank is not None) or (ordered and inv_freq is not None)

    S_pad = ((S + 127) // 128) * 128
    if S_pad != S:
        pad = [(0, 0), (0, 0), (0, S_pad - S), (0, 0)]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        kv_pos = jnp.pad(kv_pos, [(0, 0), (0, 0), (0, S_pad - S)],
                         constant_values=-1)
        if quant:
            k_scale = jnp.pad(k_scale, [(0, 0), (0, 0), (0, S_pad - S)])
            v_scale = jnp.pad(v_scale, [(0, 0), (0, 0), (0, S_pad - S)])
        if streaming and not ordered:
            rank = jnp.pad(rank, [(0, 0), (0, 0), (0, S_pad - S)])

    qg = q.reshape(B, Hkv, rep, D)
    pos4 = kv_pos[:, :, None, :]

    # Multi-head-per-program blocking: fewer program dispatches + larger
    # contiguous DMAs, capped so the per-program KV block stays well under
    # VMEM (hb * S * D * 2 bytes for K+V).
    hb = 1
    for cand in (8, 4, 2):
        if Hkv % cand == 0 and cand * S_pad * D * 2 * k.dtype.itemsize \
                <= 4 * 1024 * 1024:
            hb = cand
            break

    def spec4(shape):
        return pl.BlockSpec(shape, lambda b, h, qp: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [
        spec4((1, hb, rep, D)),
        spec4((1, hb, 1, D)),
        spec4((1, hb, 1, D)),
        spec4((1, hb, S_pad, D)),
        spec4((1, hb, S_pad, D)),
        spec4((1, hb, 1, S_pad)),
    ]
    inputs = [qg, k_new, v_new, k, v, pos4]
    if streaming:
        # Split-bf16 rope tables, [c1|c2|s1|s2] column-packed (see kernel).
        def split_tab(rows):
            ang = (rows.astype(jnp.float32)[:, None]
                   * inv_freq.astype(jnp.float32)[None, :])
            c, s = jnp.cos(ang), jnp.sin(ang)
            c1, s1 = c.astype(jnp.bfloat16), s.astype(jnp.bfloat16)
            c2 = (c - c1.astype(jnp.float32)).astype(jnp.bfloat16)
            s2 = (s - s1.astype(jnp.float32)).astype(jnp.bfloat16)
            return jnp.concatenate([c1, c2, s1, s2], axis=1)

        const2 = lambda shape: pl.BlockSpec(
            shape, lambda b, h, qp: (0, 0), memory_space=pltpu.VMEM)
        if ordered:
            # one row per SLOT, applied directly (rank == slot index)
            td = split_tab(jnp.arange(S_pad))            # (S_pad, 2D)
            in_specs += [const2((S_pad, 2 * D))]
            inputs += [td]
        else:
            # two-level pick: level m covers ranks mod 128, level q the
            # rank's 128-block index
            nq = S_pad // 128
            tm = split_tab(jnp.arange(128))              # (128, 2D)
            tq = split_tab(jnp.arange(nq) * 128)         # (S/128, 2D)
            in_specs += [spec4((1, hb, 1, S_pad)),
                         const2((128, 2 * D)), const2((nq, 2 * D))]
            inputs += [rank[:, :, None, :], tm, tq]
    if quant:
        in_specs += [spec4((1, hb, 1, S_pad)), spec4((1, hb, 1, S_pad))]
        inputs += [k_scale[:, :, None, :], v_scale[:, :, None, :]]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Hkv // hb),
        in_specs=in_specs,
        out_specs=[spec4((1, hb, rep, D)), spec4((1, hb, 1, S_pad)),
                   spec4((1, hb, 1, 128))],
    )
    out, probs, pnew = pl.pallas_call(
        functools.partial(_kernel_inflight, scale=scale, quant=quant, hb=hb,
                          streaming=streaming, ordered=ordered,
                          sliding_window=sliding_window),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, rep, D), q.dtype),
            jax.ShapeDtypeStruct((B, Hkv, 1, S_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, Hkv, 1, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Hkv * rep * S_pad * D * 2
            + (2 * B * Hkv * S_pad * (128 + S_pad // 128) * 2 * D
               if streaming and not ordered else 0),
            bytes_accessed=B * Hkv * S_pad * D * 2 * k.dtype.itemsize,
            transcendentals=B * Hkv * rep * S_pad,
        ),
        interpret=interpret,
    )(q_pos, *inputs)

    out = out.reshape(B, Hq, 1, D)
    return out, probs[:, :, :, :S], pnew[:, :, 0, 0][:, :, None]


def fused_decode_attend_inflight_sharded(
    q: jax.Array,
    k_new: jax.Array,
    v_new: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_pos: jax.Array,
    q_pos: jax.Array,
    k_scale: Optional[jax.Array] = None,
    v_scale: Optional[jax.Array] = None,
    rank: Optional[jax.Array] = None,
    inv_freq: Optional[jax.Array] = None,
    *,
    mesh,
    data_axis: str = "data",
    model_axis: str = "model",
    ordered: bool = False,
    sliding_window: Optional[int] = None,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """fused_decode_attend_inflight under a (data, model) mesh via shard_map.

    The kernel's grid is (B, Hkv) with fully independent programs, so it
    partitions over batch (data axis) and KV heads (model axis) with zero
    communication — each device runs the kernel on its local (B/d, Hkv/m)
    shard. This is what keeps the fused int8-KV decode path available under
    TP/DP meshes (r1 gated it off to single-chip; VERDICT r1 missing #3).
    Streaming (rank + inv_freq) shards like the scales: ranks are per
    (batch, KV-head) rows, the rope tables are rebuilt per-shard from the
    replicated inv_freq."""
    from jax.sharding import PartitionSpec as P

    d, m = data_axis, model_axis
    p4 = P(d, m, None, None)
    p3 = P(d, m, None)
    quant = k_scale is not None
    streaming = (rank is not None) or (ordered and inv_freq is not None)

    args = [q, k_new, v_new, k, v, kv_pos, q_pos]
    in_specs = [p4, p4, p4, p4, p4, p3, P(d)]
    kw_keys = []
    if quant:
        args += [k_scale, v_scale]
        in_specs += [p3, p3]
        kw_keys += ["k_scale", "v_scale"]
    if streaming and ordered:
        args += [inv_freq]
        in_specs += [P(None)]
        kw_keys += ["inv_freq"]
    elif streaming:
        args += [rank, inv_freq]
        in_specs += [p3, P(None)]
        kw_keys += ["rank", "inv_freq"]

    def fn(q_, kn_, vn_, k_, v_, pos_, qp_, *rest):
        kw = dict(zip(kw_keys, rest))
        return fused_decode_attend_inflight(
            q_, kn_, vn_, k_, v_, pos_, qp_, interpret=interpret,
            ordered=ordered, sliding_window=sliding_window, **kw
        )

    return jax.shard_map(
        fn, mesh=mesh, in_specs=tuple(in_specs), out_specs=(p4, p4, p3),
        check_vma=False,
    )(*args)


@functools.partial(jax.jit, static_argnames=("interpret", "sliding_window"))
def fused_decode_attend(
    q: jax.Array,       # (B, Hq, 1, D)
    k: jax.Array,       # (B, Hkv, S, D) compute dtype or int8
    v: jax.Array,       # (B, Hkv, S, D)
    kv_pos: jax.Array,  # (B, Hkv, S) int32
    q_pos: jax.Array,   # (B,) int32
    k_scale: Optional[jax.Array] = None,  # (B, Hkv, S) f32 when int8
    v_scale: Optional[jax.Array] = None,
    sliding_window: Optional[int] = None,  # Mistral window (static)
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (out (B, Hq, 1, D), probs_kv (B, Hkv, 1, S) float32) —
    drop-in for ops.attention.attend at T=1."""
    B, Hq, T, D = q.shape
    assert T == 1
    Hkv, S = k.shape[1], k.shape[2]
    rep = Hq // Hkv
    scale = D ** -0.5
    quant = k_scale is not None

    S_pad = ((S + 127) // 128) * 128
    if S_pad != S:
        pad = [(0, 0), (0, 0), (0, S_pad - S), (0, 0)]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        kv_pos = jnp.pad(kv_pos, [(0, 0), (0, 0), (0, S_pad - S)],
                         constant_values=-1)
        if quant:
            k_scale = jnp.pad(k_scale, [(0, 0), (0, 0), (0, S_pad - S)])
            v_scale = jnp.pad(v_scale, [(0, 0), (0, 0), (0, S_pad - S)])

    qg = q.reshape(B, Hkv, rep, D)
    pos4 = kv_pos[:, :, None, :]  # (B, Hkv, 1, S_pad)

    def spec4(shape):
        return pl.BlockSpec(shape, lambda b, h, qp: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [
        spec4((1, 1, rep, D)),
        spec4((1, 1, S_pad, D)),
        spec4((1, 1, S_pad, D)),
        spec4((1, 1, 1, S_pad)),
    ]
    inputs = [qg, k, v, pos4]
    if quant:
        in_specs += [spec4((1, 1, 1, S_pad)), spec4((1, 1, 1, S_pad))]
        inputs += [k_scale[:, :, None, :], v_scale[:, :, None, :]]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Hkv),
        in_specs=in_specs,
        out_specs=[spec4((1, 1, rep, D)), spec4((1, 1, 1, S_pad))],
    )
    out, probs = pl.pallas_call(
        functools.partial(_kernel, scale=scale, quant=quant,
                          sliding_window=sliding_window),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, rep, D), q.dtype),
            jax.ShapeDtypeStruct((B, Hkv, 1, S_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Hkv * rep * S_pad * D * 2,
            bytes_accessed=B * Hkv * S_pad * D * 2 * k.dtype.itemsize,
            transcendentals=B * Hkv * rep * S_pad,
        ),
        interpret=interpret,
    )(q_pos, *inputs)

    out = out.reshape(B, Hq, 1, D)
    return out, probs[:, :, :, :S]
