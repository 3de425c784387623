"""ONE-pallas-call decode step: all L layers — QKV/O/MLP GEMVs over
arithmetic-packed int4 weights, RoPE, and budgeted-cache attention — in a
single kernel.

Why one call (RESULTS.md "r3 arithmetic int4 packing + Pallas call-overhead
diagnosis"): per-pallas_call overhead is ~45 us on this backend and XLA
overlaps weight prefetch across op boundaries while separate pallas calls
cannot, so per-op kernels cap at ~300 GB/s vs XLA's 548 on s4. A single
call streaming every layer's weights through one grid reaches ~600+ GB/s
on the plain-int8 arithmetic carrier AND deletes the 32 per-layer
attention-kernel dispatches (~0.8 ms/step, r2 TODO).

Grid: (L, NP) iterated sequentially; phase schedule per layer
  [0, TQ)                 QKV GEMV tiles     (wqkv carrier)
  [TQ, TQ+TA)             attention, hb KV heads per phase (late-write:
                          the new K/V joins the softmax in-flight and is
                          emitted for the engine's batched cache write)
  [TQ+TA, +TO)            O GEMV tiles       (wo carrier, residual add)
  [+TG)                   gate|up GEMV tiles (wgu carrier)
  [+TD)                   down GEMV tiles    (wd carrier, residual add)

Residual h and all intermediate activations live in VMEM scratch across
the whole grid (f32); weights stream through double-buffered blocks. The
int4 GEMV math is the 3-functional arithmetic-carrier reconstruction of
ops/pallas/w4_stream.py (see its docstring); masked-replicated LHS rows
are built in-VMEM from plain slices of the activation vector once per
weight per layer.

Semantics match models.llama._decode_forward's layer scan exactly
(fp32 softmax, slot-validity masking, GQA-mean probability emission for
the eviction scores — reference easykv.py:288-300, process_for_mqa_gqa
easykv.py:188-196); the engine's sidecar update + batched KV write stay
outside, unchanged. B == 1, T == 1, no attention bias, non-streaming
(sliding-window Mistral attention is in-kernel since r4).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .w4_stream import _shl4_i8

NEG_INF = -1e30
DN = (((1,), (0,)), ((), ()))


def _pick_tn(Kh: int, N: int, budget: int = (3 << 20) // 2) -> int:
    # ~1 MB carrier tiles: double-buffered across 4 weight inputs they are
    # the bulk of the kernel's VMEM (16 MB/core); larger tiles OOM the
    # scoped allocation at full-cache S. The batched kernel passes a
    # smaller budget at Bp=16 (wider activation/LHS scratch).
    for tn in (512, 256, 128):
        if N % tn == 0 and Kh * tn <= budget:
            return tn
    return N  # tiny test models: whole width


def _pick_hb(Hkv: int, S: int, Dh: int, itemsize: int,
             budget: int = 1 << 19) -> int:
    """KV heads per attention phase, largest divisor of Hkv whose K/V block
    fits `budget` bytes of VMEM (the batched kernel passes a tighter budget
    — its LHS/activation scratch leaves less headroom)."""
    for hb in (8, 4, 2):
        if Hkv % hb == 0 and hb * S * Dh * itemsize <= budget:
            return hb
    return 1


def _rms(x, w, eps):
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)


def fused_decode_step(
    layers: dict,            # stacked layer tree: wqkv/wo/wgu/wd as
                             # {"q4a": (L, K/2, N), "gs3": (L, 2gch, N)
                             # bf16 scale pair (arith_scale_pair)},
                             # ln_attn/ln_mlp (L, D)
    cfg,                     # ModelConfig
    k: jax.Array,            # (L, 1, Hkv, S, Dh) int8 or compute dtype
    v: jax.Array,
    pos: jax.Array,          # (L, 1, Hkv, S) int32
    h0: jax.Array,           # (1, D) embedded token (compute dtype)
    q_pos: jax.Array,        # (1,) int32 current position
    k_scale: Optional[jax.Array] = None,   # (L, 1, Hkv, S) f32 when int8
    v_scale: Optional[jax.Array] = None,
    rope_pos: Optional[jax.Array] = None,  # (1,) int32 RoPE angle position
                                           # (streaming-prerotated: the
                                           # cache-relative position; mask
                                           # still compares q_pos)
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Returns (h (1, D) pre-final-norm, kn (L, Hkv, 1, Dh) rotated,
    vn (L, Hkv, 1, Dh), probs (L, Hkv, 1, S) f32, p_new (L, Hkv) f32)."""
    L, _, Hkv, S, Dh = k.shape
    D = cfg.hidden_size
    F = cfg.intermediate_size
    Hq = cfg.num_attention_heads
    rep = Hq // Hkv
    Nq = (Hq + 2 * Hkv) * Dh
    eps = cfg.rms_norm_eps
    scale = Dh ** -0.5
    sliding_window = cfg.sliding_window
    quant = k_scale is not None
    dt = h0.dtype

    wq_p, wq_g = layers["wqkv"]["q4a"], layers["wqkv"]["gs3"]
    wo_p, wo_g = layers["wo"]["q4a"], layers["wo"]["gs3"]
    wg_p, wg_g = layers["wgu"]["q4a"], layers["wgu"]["gs3"]
    wd_p, wd_g = layers["wd"]["q4a"], layers["wd"]["gs3"]

    gq, go, gg, gd = (t.shape[1] // 2 for t in (wq_g, wo_g, wg_g, wd_g))
    khq, kho, khd = D // 2, (Hq * Dh) // 2, F // 2

    tnq, tno = _pick_tn(khq, Nq), _pick_tn(kho, D)
    tng, tnd = _pick_tn(khq, 2 * F), _pick_tn(khd, D)
    TQ, TO, TG, TD = Nq // tnq, D // tno, 2 * F // tng, D // tnd
    # 1M KV budget: hb=8 at 7B budgeted S (was 4 at the r3 512K budget) —
    # half the attention phases, double the DMA block (VERDICT r4 #4)
    hb = _pick_hb(Hkv, S, Dh, k.dtype.itemsize, budget=1 << 20)
    TA = Hkv // hb
    NP = TQ + TA + TO + TG + TD
    oQ, oA, oO, oG, oD = 0, TQ, TQ + TA, TQ + TA + TO, TQ + TA + TO + TG

    gch_max = max(gq, go, gg, gd)
    kh_max = max(khq, kho, khd)
    GCH_MAX = gch_max
    import os

    # int8-MXU two-plane activation feed (see prep_lhs): default ON —
    # measured faster than the mixed bf16*int8 feed and numerically tighter
    # than bf16 rounding. EASYKV_TPU_MEGA_A8=0 for the mixed-feed A/B.
    a8 = os.environ.get("EASYKV_TPU_MEGA_A8", "1") not in ("0", "false",
                                                           "off")
    # Timing-only debug knobs (results become garbage): compile out the
    # attention math / the LHS prep to attribute the kernel's non-stream
    # time. EASYKV_TPU_MEGA_SKIP=attn | prep | attn,prep
    _skip = os.environ.get("EASYKV_TPU_MEGA_SKIP", "")
    skip_attn = "attn" in _skip
    skip_prep = "prep" in _skip

    # cos/sin of the current position (f32, matches ops.rope.apply_rope)
    from ..rope import rope_base_for, rope_inv_freq

    inv_freq = rope_inv_freq(Dh, rope_base_for(cfg))          # (Dh/2,)
    rp = q_pos if rope_pos is None else rope_pos
    ang = jnp.maximum(rp[0], 0).astype(jnp.float32) * inv_freq
    cos = jnp.cos(ang)[None, :]                                # (1, Dh/2)
    sin = jnp.sin(ang)[None, :]

    def kernel(qp_ref, x0, lna, lnm, cos_r, sin_r,
               qp_p, qp_g, op_p, op_g, gp_p, gp_g, dp_p, dp_g,
               k_r, v_r, pos_r, *rest):
        if quant:
            ksc_r, vsc_r = rest[0], rest[1]
            rest = rest[2:]
        h_out, kn_o, vn_o, probs_o, pnew_o = rest[:5]
        h_s, lhsA, lhsBC, sr_s, qkv_s, attn_s, gu_s, swig_s, xh_s = rest[5:]
        l = pl.program_id(0)
        t = pl.program_id(1)
        qpos = qp_ref[0]

        def _masked(src_vec, gch, kh):
            G = kh // gch
            mask = (
                jax.lax.broadcasted_iota(jnp.int32, (gch, kh), 1) // G
                == jax.lax.broadcasted_iota(jnp.int32, (gch, kh), 0)
            )
            return jnp.where(mask, src_vec, jnp.zeros((gch, kh), jnp.float32))

        def prep_lhs(src, gch, kh):
            if skip_prep:
                return
            # src (1, 2*kh) f32: halves slices -> masked-replicated LHS.
            # The select stays in f32 (an i1 mask produced by i32 compares
            # lives in (8,128) tiling and Mosaic cannot relayout it to the
            # bf16-native (16,128) a bf16 `where` would need).
            xl = src[:, :kh]
            # realign the hi half through scratch: a slice starting at a
            # non-tile-aligned lane offset (kh % 512 != 0, e.g. wd's 5504)
            # cannot be broadcast by Mosaic ("Invalid input layout")
            xh_s[0:1, 0:kh] = src[:, kh:]
            xh = xh_s[0:1, 0:kh]
            A = _masked(xh, gch, kh)
            Bv = _masked(xl - xh * 0.0625, gch, kh)
            Cv = _masked(xl, gch, kh)
            if not a8:
                lhsA[0:gch, 0:kh] = A.astype(dt)
                lhsBC[0:gch, 0:kh] = Bv.astype(dt)
                lhsBC[gch:2 * gch, 0:kh] = Cv.astype(dt)
                return
            # int8-MXU feed: each row quantized to TWO int8 planes
            # X ~= sr * (P1 + P2/127), |err| <= sr/(2*127) — tighter than
            # the bf16 rounding the mixed feed pays, and the dots run on
            # the int8 MXU with no operand converts (RESULTS.md r3 probes:
            # 620 vs 552 GB/s chain rate).

            def planes(X, row0, off2, ka):
                sr = jnp.maximum(jnp.max(jnp.abs(X), axis=-1, keepdims=True),
                                 1e-30) * jnp.float32(1.0 / 127.0)
                x1 = jnp.round(X / sr)
                p1 = jnp.clip(x1, -127, 127)
                p2 = jnp.clip(jnp.round((X / sr - p1) * 127.0), -127, 127)
                ka[row0:row0 + gch, 0:kh] = p1.astype(jnp.int8)
                ka[off2 + row0:off2 + row0 + gch, 0:kh] = p2.astype(jnp.int8)
                return sr

            sr_s[0:gch, 0:1] = planes(A, 0, GCH_MAX, lhsA)
            sr_s[GCH_MAX:GCH_MAX + gch, 0:1] = planes(
                Bv, 0, 2 * GCH_MAX, lhsBC)
            sr_s[2 * GCH_MAX:2 * GCH_MAX + gch, 0:1] = planes(
                Cv, gch, 2 * GCH_MAX, lhsBC)

        def mm_tile(p_ref, g_ref, gch, kh):
            p = p_ref[0]                       # (kh, tn) int8 carrier
            u = _shl4_i8(p)                    # 16*lo
            g2 = g_ref[0].astype(jnp.float32)             # (2gch, tn)
            if not a8:
                a = jax.lax.dot_general(
                    lhsA[0:gch, 0:kh], p, dimension_numbers=DN,
                    preferred_element_type=jnp.float32)
                bc = jax.lax.dot_general(
                    lhsBC[0:2 * gch, 0:kh], u, dimension_numbers=DN,
                    preferred_element_type=jnp.float32)
                # bf16 pair scales [hi; lo]/16: hi/16*(A+B-C) + lo/16*C
                # (w4_stream.arith_scale_pair)
                r = jnp.concatenate([a + bc[:gch] - bc[gch:], bc[gch:]],
                                    axis=0)
                return jnp.sum(r * g2, axis=0, keepdims=True)
            r127 = jnp.float32(1.0 / 127.0)
            ra = jax.lax.dot_general(
                lhsA[0:gch, 0:kh], p, dimension_numbers=DN,
                preferred_element_type=jnp.int32)
            ra2 = jax.lax.dot_general(
                lhsA[GCH_MAX:GCH_MAX + gch, 0:kh], p, dimension_numbers=DN,
                preferred_element_type=jnp.int32)
            af = (ra.astype(jnp.float32) + ra2.astype(jnp.float32) * r127
                  ) * sr_s[0:gch, 0:1]
            rbc = jax.lax.dot_general(
                lhsBC[0:2 * gch, 0:kh], u, dimension_numbers=DN,
                preferred_element_type=jnp.int32)
            rbc2 = jax.lax.dot_general(
                lhsBC[2 * GCH_MAX:2 * GCH_MAX + 2 * gch, 0:kh], u,
                dimension_numbers=DN, preferred_element_type=jnp.int32)
            bcf = (rbc.astype(jnp.float32)
                   + rbc2.astype(jnp.float32) * r127
                   ) * jnp.concatenate(
                       [sr_s[GCH_MAX:GCH_MAX + gch, 0:1],
                        sr_s[2 * GCH_MAX:2 * GCH_MAX + gch, 0:1]], axis=0)
            r = jnp.concatenate([af + bcf[:gch] - bcf[gch:], bcf[gch:]],
                                axis=0)
            return jnp.sum(r * g2, axis=0, keepdims=True)

        # ---- QKV phases -------------------------------------------------
        @pl.when(t < oA)
        def _qkv():
            @pl.when(t == 0)
            def _pro():
                @pl.when(l == 0)
                def _():
                    h_s[:] = x0[:].astype(jnp.float32)
                x = _rms(h_s[:], lna[0], eps)
                prep_lhs(x, gq, khq)

            j = t
            y = mm_tile(qp_p, qp_g, gq, khq)
            qkv_s[:, pl.ds(j * tnq, tnq)] = y

        # ---- attention phases ------------------------------------------
        @pl.when((t >= oA) & (t < oO))
        def _attn():
            if skip_attn:
                for hh in range(hb):
                    probs_o[0, hh] = jnp.zeros_like(probs_o[0, hh])
                    kn_o[0, hh] = jnp.zeros_like(kn_o[0, hh])
                    vn_o[0, hh] = jnp.zeros_like(vn_o[0, hh])
                    pnew_o[0, hh] = jnp.zeros_like(pnew_o[0, hh])
                return
            ai = t - oA
            live = qpos >= 0
            d2 = Dh // 2
            c = cos_r[:]                      # (1, Dh/2) f32
            s_ = sin_r[:]

            def rot(x2):                       # (rows, Dh) f32 -> rope'd
                x1, xx2 = x2[:, :d2], x2[:, d2:]
                return jnp.concatenate(
                    [x1 * c - xx2 * s_, xx2 * c + x1 * s_], axis=-1)

            for hh in range(hb):
                head = ai * hb + hh
                qoff = head * rep * Dh
                q2 = qkv_s[:, pl.ds(qoff, rep * Dh)].reshape(rep, Dh)
                koff = Hq * Dh + head * Dh
                voff = (Hq + Hkv) * Dh + head * Dh
                kn2 = qkv_s[:, pl.ds(koff, Dh)]              # (1, Dh) f32
                vn2 = qkv_s[:, pl.ds(voff, Dh)]
                q_rot = rot(q2)
                kn_rot = rot(kn2)

                kc = k_r[0, 0, hh].astype(jnp.float32)       # (S, Dh)
                vc = v_r[0, 0, hh]
                pv = pos_r[0, hh]                            # (1, S)
                logits = jax.lax.dot_general(
                    q_rot, kc, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale  # (rep, S)
                if quant:
                    logits = logits * ksc_r[0, hh]
                logit_new = jnp.sum(q_rot * kn_rot, axis=-1,
                                    keepdims=True) * scale       # (rep, 1)
                mask = (pv >= 0) & (pv <= qpos)
                if sliding_window is not None:
                    # Mistral sliding window (one compare; matches
                    # ops.attention.attend_inflight semantics)
                    mask &= pv > qpos - sliding_window
                logits = jnp.where(mask, logits, NEG_INF)
                logit_new = jnp.where(live, logit_new, NEG_INF)
                m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True),
                                logit_new)
                e = jnp.where(mask, jnp.exp(logits - m), 0.0)
                e_new = jnp.where(live, jnp.exp(logit_new - m), 0.0)
                denom = jnp.maximum(
                    jnp.sum(e, axis=-1, keepdims=True) + e_new, 1e-30)
                p = e / denom                                # (rep, S)
                p_new = e_new / denom                        # (rep, 1)

                pvv = p * vsc_r[0, hh] if quant else p
                out = jax.lax.dot_general(
                    pvv, vc.astype(jnp.float32),
                    dimension_numbers=DN,
                    preferred_element_type=jnp.float32) + p_new * vn2
                attn_s[:, pl.ds(qoff, rep * Dh)] = out.reshape(1, rep * Dh)
                probs_o[0, hh] = jnp.mean(p, axis=0, keepdims=True)
                kn_o[0, hh] = kn_rot.astype(kn_o.dtype)
                vn_o[0, hh] = vn2.astype(vn_o.dtype)
                pnew_o[0, hh] = jnp.broadcast_to(
                    jnp.mean(p_new, axis=0, keepdims=True), (1, 128))

        # ---- O phases ---------------------------------------------------
        @pl.when((t >= oO) & (t < oG))
        def _o():
            @pl.when(t == oO)
            def _pro():
                prep_lhs(attn_s[:], go, kho)
            j = t - oO
            y = mm_tile(op_p, op_g, go, kho)
            sl = pl.ds(j * tno, tno)
            h_s[:, sl] += y

        # ---- gate|up phases --------------------------------------------
        @pl.when((t >= oG) & (t < oD))
        def _gu():
            @pl.when(t == oG)
            def _pro():
                x2 = _rms(h_s[:], lnm[0], eps)
                prep_lhs(x2, gg, khq)
            j = t - oG
            y = mm_tile(gp_p, gp_g, gg, khq)
            gu_s[:, pl.ds(j * tng, tng)] = y

        # ---- down phases ------------------------------------------------
        @pl.when(t >= oD)
        def _d():
            @pl.when(t == oD)
            def _pro():
                g = gu_s[:, :F]
                up = gu_s[:, F:]
                swig_s[:] = (g * jax.lax.logistic(g)) * up
                prep_lhs(swig_s[:], gd, khd)
            j = t - oD
            y = mm_tile(dp_p, dp_g, gd, khd)
            sl = pl.ds(j * tnd, tnd)
            h_s[:, sl] += y

            @pl.when((l == L - 1) & (t == NP - 1))
            def _fin():
                h_out[:] = h_s[:].astype(h_out.dtype)

    # ---- block specs ----------------------------------------------------
    def c2(shape):  # per-layer constant block (leading singleton for tiling)
        return pl.BlockSpec(shape, lambda l, t, qp: (l, 0, 0),
                            memory_space=pltpu.VMEM)

    def tile3(kh, tn, off, count):
        return pl.BlockSpec(
            (1, kh, tn),
            lambda l, t, qp, o=off, c=count: (
                l, 0, jnp.clip(t - o, 0, c - 1)),
            memory_space=pltpu.VMEM)

    def gtile(g3, tn, off, count):
        return pl.BlockSpec(
            (1, g3, tn),
            lambda l, t, qp, o=off, c=count: (
                l, 0, jnp.clip(t - o, 0, c - 1)),
            memory_space=pltpu.VMEM)

    def ahead(shape):  # attention per-head-block
        return pl.BlockSpec(
            shape,
            lambda l, t, qp: (l, 0, jnp.clip(t - oA, 0, TA - 1))
            + (0,) * (len(shape) - 3),
            memory_space=pltpu.VMEM)

    def ahead_out(shape):
        return pl.BlockSpec(
            shape,
            lambda l, t, qp: (l, jnp.clip(t - oA, 0, TA - 1))
            + (0,) * (len(shape) - 2),
            memory_space=pltpu.VMEM)

    const = lambda shape: pl.BlockSpec(
        shape, lambda l, t, qp: (0,) * len(shape), memory_space=pltpu.VMEM)

    in_specs = [
        const((1, D)),                    # x0
        c2((1, 1, D)),                    # ln_attn
        c2((1, 1, D)),                    # ln_mlp
        const((1, Dh // 2)),              # cos
        const((1, Dh // 2)),              # sin
        tile3(khq, tnq, oQ, TQ), gtile(2 * gq, tnq, oQ, TQ),
        tile3(kho, tno, oO, TO), gtile(2 * go, tno, oO, TO),
        tile3(khq, tng, oG, TG), gtile(2 * gg, tng, oG, TG),
        tile3(khd, tnd, oD, TD), gtile(2 * gd, tnd, oD, TD),
        ahead((1, 1, hb, S, Dh)),         # k
        ahead((1, 1, hb, S, Dh)),         # v
        ahead_out((1, hb, 1, S)),         # pos (L, Hkv, 1, S)
    ]
    inputs = [h0, layers["ln_attn"][:, None, :], layers["ln_mlp"][:, None, :],
              cos, sin,
              wq_p, wq_g, wo_p, wo_g, wg_p, wg_g, wd_p, wd_g,
              k, v, pos[:, 0, :, None, :]]
    if quant:
        in_specs += [ahead_out((1, hb, 1, S)), ahead_out((1, hb, 1, S))]
        inputs += [k_scale[:, 0, :, None, :], v_scale[:, 0, :, None, :]]

    out_specs = [
        const((1, D)),                    # h_out
        ahead_out((1, hb, 1, Dh)),        # kn
        ahead_out((1, hb, 1, Dh)),        # vn
        ahead_out((1, hb, 1, S)),         # probs
        ahead_out((1, hb, 1, 128)),       # p_new
    ]
    out_shape = [
        jax.ShapeDtypeStruct((1, D), dt),
        jax.ShapeDtypeStruct((L, Hkv, 1, Dh), dt),
        jax.ShapeDtypeStruct((L, Hkv, 1, Dh), dt),
        jax.ShapeDtypeStruct((L, Hkv, 1, S), jnp.float32),
        jax.ShapeDtypeStruct((L, Hkv, 1, 128), jnp.float32),
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, NP),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((1, D), jnp.float32),                  # h_s
            (pltpu.VMEM((2 * gch_max, kh_max), jnp.int8) if a8
             else pltpu.VMEM((gch_max, kh_max), dt)),         # lhsA
            (pltpu.VMEM((4 * gch_max, kh_max), jnp.int8) if a8
             else pltpu.VMEM((2 * gch_max, kh_max), dt)),     # lhsBC
            pltpu.VMEM((3 * gch_max if a8 else 8, 128),
                       jnp.float32),                          # sr_s
            pltpu.VMEM((1, Nq), jnp.float32),                 # qkv_s
            pltpu.VMEM((1, Hq * Dh), jnp.float32),            # attn_s
            pltpu.VMEM((1, 2 * F), jnp.float32),              # gu_s
            pltpu.VMEM((1, F), jnp.float32),                  # swig_s
            pltpu.VMEM((1, kh_max), jnp.float32),             # xh_s (realign)
        ],
    )

    weight_bytes = (wq_p.size + wo_p.size + wg_p.size + wd_p.size)
    h, kn, vn, probs, pnew = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * weight_bytes * 2 + 4 * L * Hq * S * Dh,
            bytes_accessed=weight_bytes
            + L * Hkv * S * Dh * 2 * k.dtype.itemsize,
            transcendentals=L * Hq * S,
        ),
        interpret=interpret,
    )(q_pos, *inputs)
    return h, kn, vn, probs, pnew[:, :, 0, 0]
