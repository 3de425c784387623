"""Batched (B > 1) one-pallas-call decode step over arithmetic-int4 weights.

The B == 1 mega kernel (ops/pallas/fused_decode.py) deletes per-op Pallas
dispatch (~45 us/call on this backend) and lets one grid stream every
layer's weights once per step. Batched decode previously lost exactly that:
each arith-int4 GEMM ran as its own pallas_call (4 per layer, 128 per
step), and RESULTS.md "r4 batched decode" measured int4 at 61% of the int8
aggregate at B=8 purely from those op boundaries. This kernel is the B>1
variant: same phase schedule, same weight streaming, with the GEMV math
generalized to a batched GEMM.

Batched arith-int4 GEMM (the CG-chunked masked replication):
  The 3-functional reconstruction (w4_stream.py docstring) needs per-scale-
  group partial sums. Full masked replication (one LHS row per (b, group))
  costs 3*B*gch*kh*tn MXU MACs per weight tile — at B=8, gch=43 that is
  ~10x the HBM-floor budget. Instead groups are processed in chunks of CG:
  chunk c covers groups [c*CG, c*CG+cg), its LHS holds cg*B rows laid
  g-major (row g*B + b = activation row b masked to group g's 128-column
  block), and the two carrier dots contract only over the chunk's CG*128
  carrier rows. MACs drop to 3*CG*B*kh*tn — linear in CG, not gch — while
  rows per dot stay >= CG*B (MXU-utilizable). The per-group scale epilogue
  is then static row slices: acc[b] += gs_hi[j]*(A+B-C)[g*B+b] +
  gs_lo[j]*C[g*B+b] (arith_scale_pair layout, [hi; lo]/16).

Alignment: B is padded to Bp (multiple of 8) so every LHS scratch region
offset (c*CG*Bp) and every f32 value slice (g*Bp) is tiling-legal; padded
rows carry zeros end-to-end (rows never mix across the batch dim, so
garbage cannot leak into real rows). Attention runs only for the B real
rows: ONE phase per head block covers ALL B rows (blocks (1, B, hb, S, Dh);
the batch index is a Python loop constant, so every row access is a static
slice) — the r4 per-(batch, head-block) schedule's B*(Hkv/hb) programs per
layer cost 2.4 ms/step at B=8 in dispatch + masked-pick VPU work
(benchmarks/bench_b8.py decomposition).

Semantics match models.llama._decode_forward's batched layer scan exactly
(fp32 softmax, slot-validity + optional sliding-window masking, GQA-mean
probability emission — reference easykv.py:288-300, process_for_mqa_gqa
easykv.py:188-196). Non-streaming, T == 1, no attention bias.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_decode import _pick_hb, _pick_tn, _rms
from .w4_stream import _shl4_i8

NEG_INF = -1e30
DN = (((1,), (0,)), ((), ()))


def _cg_default(Bp: int) -> int:
    """Groups per LHS chunk. Even (keeps bf16 scratch offsets 16-aligned)
    and the knob for the MXU-rows vs MACs trade: MACs scale linearly with
    CG, rows per dot = CG*Bp. Default keeps the dots 32-row (CG=4 at Bp=8,
    CG=2 at Bp=16 — the MXU time sits under the HBM tile fetch either way;
    CG=8 at Bp=8 was ~1.4x over it AND its LHS scratch tipped the kernel
    664K over the 16M scoped vmem limit at 7B). EASYKV_TPU_MEGAB_CG for
    A/Bs."""
    default = 4 if Bp <= 8 else 2
    try:
        cg = int(os.environ.get("EASYKV_TPU_MEGAB_CG", str(default)))
    except ValueError:
        cg = default
    return max(2, (cg // 2) * 2)


def fused_decode_step_batch(
    layers: dict,            # stacked layer tree: wqkv/wo/wgu/wd as
                             # {"q4a": (L, K/2, N), "gs3": (L, 2gch, N)},
                             # ln_attn/ln_mlp (L, D)
    cfg,                     # ModelConfig
    k: jax.Array,            # (L, B, Hkv, S, Dh) int8 or compute dtype
    v: jax.Array,
    pos: jax.Array,          # (L, B, Hkv, S) int32
    h0: jax.Array,           # (B, D) embedded tokens (compute dtype)
    q_pos: jax.Array,        # (B,) int32 current positions (-1 = dead row)
    k_scale: Optional[jax.Array] = None,   # (L, B, Hkv, S) f32 when int8
    v_scale: Optional[jax.Array] = None,
    rope_pos: Optional[jax.Array] = None,  # (B,) int32 RoPE angle positions
                                           # (streaming-prerotated)
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Returns (h (B, D) pre-final-norm, kn (L, B, Hkv, 1, Dh) rotated,
    vn (L, B, Hkv, 1, Dh), probs (L, B, Hkv, 1, S) f32, p_new (L, B, Hkv))."""
    L, B, Hkv, S, Dh = k.shape
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

    Bp = ((B + 7) // 8) * 8
    if Bp != B:
        h0 = jnp.pad(h0, [(0, Bp - B), (0, 0)])
    CG = _cg_default(Bp)

    wq_p, wq_g = layers["wqkv"]["q4a"], layers["wqkv"]["gs3"]
    wo_p, wo_g = layers["wo"]["q4a"], layers["wo"]["gs3"]
    wg_p, wg_g = layers["wgu"]["q4a"], layers["wgu"]["gs3"]
    wd_p, wd_g = layers["wd"]["q4a"], layers["wd"]["gs3"]

    gq, go, gg, gd = (t.shape[1] // 2 for t in (wq_g, wo_g, wg_g, wd_g))
    khq, kho, khd = D // 2, (Hq * Dh) // 2, F // 2

    # Bp=16 halves the weight-tile budget: the wider activation/LHS scratch
    # plus the larger attention blocks would otherwise overflow scoped VMEM
    tn_budget = (3 << 20) // 2 if Bp <= 8 else (2 << 20) // 2
    tnq, tno = _pick_tn(khq, Nq, tn_budget), _pick_tn(kho, D, tn_budget)
    tng = _pick_tn(khq, 2 * F, tn_budget)
    tnd = _pick_tn(khd, D, tn_budget)
    TQ, TO, TG, TD = Nq // tnq, D // tno, 2 * F // tng, D // tnd
    # ONE attention phase per head block covering ALL B rows (r5): the r4
    # per-(batch, head-block) schedule ran B*(Hkv/hb) = 128 programs/layer
    # at B=8 and cost 2.4 ms/step in program dispatch + masked-pick VPU
    # work (bench_b8.py decomposition). Blocks are (1, B, hb, St, Dh); the
    # batch index is a PYTHON loop constant in-kernel, so every row access
    # is a static (relayout-able) slice — no iota-mask picks, no masked
    # read-modify-write stores. When B*S*Dh exceeds the VMEM budget
    # (B=16 at 7B S=768) the K/V blocks tile over S (NT flash tiles per
    # head, rep==1 only) with running max/denom/acc carried in scratch.
    hb = _pick_hb(Hkv, S, Dh, B * k.dtype.itemsize, budget=1 << 20)
    NT = 1
    if rep == 1:
        # Bp=16 also tightens the K/V tile budget: b16 compiles came in 40K
        # (NT=2 x 768K tiles) then 8K (NT=3 x 512K) over the 16M scoped-vmem
        # limit — 256K tiles clear it with margin
        nt_budget = 1 << 20 if Bp <= 8 else 1 << 18
        nlanes = S // 128
        for cand in range(1, nlanes + 1):
            if nlanes % cand:
                continue
            if B * hb * (S // cand) * Dh * k.dtype.itemsize <= nt_budget:
                NT = cand
                break
        nt_env = os.environ.get("EASYKV_TPU_MEGAB_NT")  # test/A-B override
        if nt_env:
            nt = int(nt_env)
            if nlanes == 0 or nlanes % nt == 0:
                NT = nt
                hb = 1
    if NT > 1:
        hb = 1
    St = S // NT
    assert NT == 1 or hb == 1, "S-tiling implies hb == 1"
    TAh = Hkv // hb
    TA = TAh * NT
    NP = TQ + TA + TO + TG + TD
    oQ, oA, oO, oG, oD = 0, TQ, TQ + TA, TQ + TA + TO, TQ + TA + TO + TG

    kh_max = max(khq, kho, khd)
    nc_of = lambda g: (g + CG - 1) // CG
    NC_MAX = max(nc_of(g) for g in (gq, go, gg, gd))
    RMAX = NC_MAX * CG * Bp          # LHS scratch rows per carrier plane
    # group width in PACKED columns == the quantization group size (lo and
    # hi planes pair packed row r with unpacked rows r / r+Kh, so a scale
    # group spans kh/gch contiguous packed columns)
    Gq, Go, Gg, Gd = khq // gq, kho // go, khq // gg, khd // gd
    G_MAX = max(Gq, Go, Gg, Gd)

    # Timing-only debug knob (results become garbage): compile out the
    # attention phases' math to attribute the batched step's time.
    # EASYKV_TPU_MEGA_SKIP=attn (same knob as the B=1 kernel)
    skip_attn = "attn" in os.environ.get("EASYKV_TPU_MEGA_SKIP", "")

    # cos/sin per batch row (f32, matches ops.rope.apply_rope)
    from ..rope import rope_base_for, rope_inv_freq

    inv_freq = rope_inv_freq(Dh, rope_base_for(cfg))          # (Dh/2,)
    rp = q_pos if rope_pos is None else rope_pos
    ang = (jnp.maximum(rp, 0).astype(jnp.float32)[:, None]
           * inv_freq[None, :])                                # (B, Dh/2)
    cos = jnp.cos(ang)
    sin = jnp.sin(ang)
    if Bp != B:   # padded rows: angle irrelevant (their activations are 0)
        cos = jnp.pad(cos, [(0, Bp - B), (0, 0)])
        sin = jnp.pad(sin, [(0, Bp - B), (0, 0)])

    def kernel(qp_ref, x0, lna, lnm, cos_r, sin_r,
               qp_p, qp_g, op_p, op_g, gp_p, gp_g, dp_p, dp_g,
               k_r, v_r, pos_r, *rest):
        if quant:
            ksc_r, vsc_r = rest[0], rest[1]
            rest = rest[2:]
        h_out, kn_o, vn_o, probs_o, pnew_o = rest[:5]
        (h_s, xln_s, lhsA, lhsBC, qkv_s, attn_s, gu_s, swig_s,
         xh_s, lgs_s, fm_s, fd_s, facc_s) = rest[5:]
        l = pl.program_id(0)
        t = pl.program_id(1)

        def prep_lhs(src_ref, gch, kh, G):
            # src_ref (Bp, 2*kh) f32 scratch: lo half = [:, :kh], hi half
            # realigned through xh_s (a slice at lane offset kh is not
            # tile-aligned for kh % tn != 0 — same Mosaic constraint as the
            # B=1 kernel's xh realign).
            xh_s[:, 0:kh] = src_ref[:, kh:2 * kh]
            for c in range(nc_of(gch)):
                g0 = c * CG
                cg = min(CG, gch - g0)
                kc = cg * G
                col0 = g0 * G
                rows = cg * Bp
                r0 = c * CG * Bp
                xl = src_ref[:, col0:col0 + kc]          # (Bp, kc) f32
                xh = xh_s[:, col0:col0 + kc]
                # g-major tiles: rows [g*Bp, (g+1)*Bp) = batch rows for
                # group g0+g; mask keeps only group g's G-column block
                gi = jax.lax.broadcasted_iota(jnp.int32, (rows, kc), 0) // Bp
                ci = jax.lax.broadcasted_iota(jnp.int32, (rows, kc), 1) // G
                m = gi == ci
                th = jnp.concatenate([xh] * cg, axis=0) if cg > 1 else xh
                tl = jnp.concatenate([xl] * cg, axis=0) if cg > 1 else xl
                z = jnp.zeros((rows, kc), jnp.float32)
                lhsA[r0:r0 + rows, 0:kc] = jnp.where(m, th, z).astype(dt)
                lhsBC[2 * r0:2 * r0 + rows, 0:kc] = jnp.where(
                    m, tl - th * 0.0625, z).astype(dt)
                # C plane at a fixed CG*Bp stride so its start stays
                # 16-aligned for bf16 scratch even when cg < CG (the gap
                # rows are never read back as results)
                c0 = 2 * r0 + CG * Bp
                lhsBC[c0:c0 + rows, 0:kc] = jnp.where(m, tl, z).astype(dt)

        def mm_tile(p_ref, g_ref, gch, kh, tn, G):
            g2 = g_ref[0].astype(jnp.float32)            # (2gch, tn)
            acc = jnp.zeros((Bp, tn), jnp.float32)
            for c in range(nc_of(gch)):
                g0 = c * CG
                cg = min(CG, gch - g0)
                kc = cg * G
                col0 = g0 * G
                rows = cg * Bp
                r0 = c * CG * Bp
                p_c = p_ref[0, col0:col0 + kc, :]        # (kc, tn) int8
                u_c = _shl4_i8(p_c)                      # 16*lo
                a = jax.lax.dot_general(
                    lhsA[r0:r0 + rows, 0:kc], p_c, dimension_numbers=DN,
                    preferred_element_type=jnp.float32)  # (rows, tn)
                bc = jax.lax.dot_general(
                    lhsBC[2 * r0:2 * r0 + CG * Bp + rows, 0:kc], u_c,
                    dimension_numbers=DN,
                    preferred_element_type=jnp.float32)
                # INVARIANT: when cg < CG the lhsBC rows [rows, CG*Bp) of
                # this chunk's B region are never written by prep_lhs and
                # hold arbitrary scratch bits; they are sound to feed the
                # dot ONLY because matmul rows are independent and the
                # slices below discard exactly those rows — keep bv/cv
                # bounds in sync with prep_lhs's c0 layout if refactoring.
                bv = bc[0:rows]
                cv = bc[CG * Bp:CG * Bp + rows]
                rhi = a + bv - cv
                # pair scales [hi; lo]/16: hi/16*(A+B-C) + lo/16*C
                # (w4_stream.arith_scale_pair)
                for g in range(cg):
                    j = g0 + g
                    acc += (g2[j:j + 1] * rhi[g * Bp:(g + 1) * Bp]
                            + g2[gch + j:gch + j + 1]
                            * cv[g * Bp:(g + 1) * Bp])
            return acc

        # ---- QKV phases -------------------------------------------------
        @pl.when(t < oA)
        def _qkv():
            @pl.when(t == 0)
            def _pro():
                @pl.when(l == 0)
                def _():
                    h_s[:] = x0[:].astype(jnp.float32)
                    # padded rows of attn_s are only ever written through
                    # the masked merge below; zero them once so no
                    # uninitialized-VMEM NaNs sit in the O-phase LHS
                    attn_s[:] = jnp.zeros_like(attn_s)
                xln_s[:] = _rms(h_s[:], lna[0], eps)
                prep_lhs(xln_s, gq, khq, Gq)

            j = t
            y = mm_tile(qp_p, qp_g, gq, khq, tnq, Gq)
            qkv_s[:, pl.ds(j * tnq, tnq)] = y

        # ---- attention phases (one program per head block, ALL B rows) --
        @pl.when((t >= oA) & (t < oO))
        def _attn():
            if skip_attn:
                for hh in range(hb):
                    for b in range(B):
                        probs_o[0, b, hh] = jnp.zeros_like(probs_o[0, b, hh])
                        kn_o[0, b, hh] = jnp.zeros_like(kn_o[0, b, hh])
                        vn_o[0, b, hh] = jnp.zeros_like(vn_o[0, b, hh])
                        pnew_o[0, b, hh] = jnp.zeros_like(pnew_o[0, b, hh])
                return
            ai = t - oA
            d2 = Dh // 2

            if rep == 1:
                # MHA fast path (7B/13B-class): every per-row op vectorizes
                # over the batch dim — one RoPE pair, one masked softmax,
                # one store per head instead of B of each; only the two
                # cache dots stay per-row (each row attends its own cache).
                # Runs as NT flash tiles over S (NT == 1 collapses to the
                # single-pass math): running max/denom/acc in scratch,
                # masked logits accumulated in lg_s for the final probs
                # emission (the sidecar scores need the full row).
                if NT > 1:
                    hc = ai // NT
                    jt = ai - hc * NT                   # S-tile index
                else:
                    hc, jt = ai, 0                      # jt STATIC
                qpos_v = jnp.concatenate(
                    [jnp.full((1, 1), qp_ref[b], jnp.int32)
                     for b in range(B)], axis=0)             # (B, 1)
                live_v = qpos_v >= 0
                cB = cos_r[:]                                # (Bp, Dh/2)
                sB = sin_r[:]

                def rotv(x2):              # (Bp, Dh) f32 -> rope'd
                    x1, xx2 = x2[:, :d2], x2[:, d2:]
                    return jnp.concatenate(
                        [x1 * cB - xx2 * sB, xx2 * cB + x1 * sB], axis=-1)

                for hh in range(hb):
                    head = hc * hb + hh
                    qoff = head * Dh
                    koff = Hq * Dh + head * Dh
                    voff = (Hq + Hkv) * Dh + head * Dh
                    q_rot = rotv(qkv_s[:, pl.ds(qoff, Dh)])   # (Bp, Dh)
                    kn_rot = rotv(qkv_s[:, pl.ds(koff, Dh)])
                    vn_all = qkv_s[:, pl.ds(voff, Dh)]
                    logit_new = jnp.sum(
                        q_rot[:B] * kn_rot[:B], axis=-1,
                        keepdims=True) * scale               # (B, 1)
                    logit_new = jnp.where(live_v, logit_new, NEG_INF)
                    s_lo = jt * St
                    lg = jnp.concatenate([
                        jax.lax.dot_general(
                            q_rot[b:b + 1],
                            k_r[0, b, hh].astype(jnp.float32),
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        for b in range(B)], axis=0) * scale  # (B, St)
                    # per-b (all-ints) ref reads: a (int, slice, int) index
                    # mix lowers to an unsupported >2D Mosaic gather
                    if quant:
                        lg = lg * jnp.concatenate(
                            [ksc_r[0, b, hh, 0:1, pl.ds(s_lo, St)]
                             for b in range(B)], axis=0)
                    pv = jnp.concatenate(
                        [pos_r[0, b, hh, 0:1, pl.ds(s_lo, St)]
                         for b in range(B)], axis=0)         # (B, St)
                    mask = (pv >= 0) & (pv <= qpos_v)
                    if sliding_window is not None:
                        mask &= pv > qpos_v - sliding_window
                    lg = jnp.where(mask, lg, NEG_INF)
                    if NT > 1:
                        lgs_s[:B, pl.ds(s_lo, St)] = lg
                        m_pr = jnp.where(jt == 0, NEG_INF, fm_s[:B, 0:1])
                        d_pr = jnp.where(jt == 0, 0.0, fd_s[:B, 0:1])
                        a_pr = jnp.where(jt == 0, 0.0, facc_s[:B])
                    else:
                        m_pr = jnp.full_like(logit_new, NEG_INF)
                        d_pr = jnp.zeros_like(logit_new)
                        a_pr = jnp.zeros((B, Dh), jnp.float32)
                    # the in-flight logit joins at tile 0 (its e-term then
                    # rescales along with the rest)
                    m0 = jnp.maximum(jnp.max(lg, axis=-1, keepdims=True),
                                     jnp.where(jt == 0, logit_new, NEG_INF))
                    m_nw = jnp.maximum(m_pr, m0)
                    r = jnp.exp(m_pr - m_nw)                 # (B, 1)
                    e = jnp.where(mask, jnp.exp(lg - m_nw), 0.0)
                    e_new0 = jnp.where(
                        (jt == 0) & live_v, jnp.exp(logit_new - m_nw), 0.0)
                    d_nw = d_pr * r + jnp.sum(e, axis=-1, keepdims=True) \
                        + e_new0
                    pvv = e * jnp.concatenate(
                        [vsc_r[0, b, hh, 0:1, pl.ds(s_lo, St)]
                         for b in range(B)], axis=0) if quant else e
                    ev = jnp.concatenate([
                        jax.lax.dot_general(
                            pvv[b:b + 1],
                            v_r[0, b, hh].astype(jnp.float32),
                            dimension_numbers=DN,
                            preferred_element_type=jnp.float32)
                        for b in range(B)], axis=0)          # (B, Dh)
                    a_nw = a_pr * r + ev
                    if NT > 1:
                        fm_s[:B, 0:1] = m_nw
                        fd_s[:B, 0:1] = d_nw
                        facc_s[:B] = a_nw

                    def _fin_attn(m_nw=m_nw, d_nw=d_nw, a_nw=a_nw,
                                  logit_new=logit_new, kn_rot=kn_rot,
                                  vn_all=vn_all, e=e, qoff=qoff, hh=hh):
                        e_new = jnp.where(
                            live_v, jnp.exp(logit_new - m_nw), 0.0)
                        denom = jnp.maximum(d_nw, 1e-30)
                        out = (a_nw + e_new * vn_all[:B]) / denom
                        if Bp != B:
                            out = jnp.concatenate(
                                [out, jnp.zeros((Bp - B, Dh), jnp.float32)],
                                axis=0)
                        attn_s[:, pl.ds(qoff, Dh)] = out
                        if NT > 1:
                            lg_full = lgs_s[:B]              # (B, S)
                            p = jnp.where(lg_full > NEG_INF / 2,
                                          jnp.exp(lg_full - m_nw), 0.0) \
                                / denom
                        else:
                            p = e / denom                    # (B, S)
                        p_new = e_new / denom                # (B, 1)
                        for b in range(B):   # all-ints stores (see above)
                            probs_o[0, b, hh] = p[b:b + 1]
                            kn_o[0, b, hh] = kn_rot[b:b + 1].astype(
                                kn_o.dtype)
                            vn_o[0, b, hh] = vn_all[b:b + 1].astype(
                                vn_o.dtype)
                            pnew_o[0, b, hh] = jnp.broadcast_to(
                                p_new[b:b + 1], (1, 128))

                    if NT > 1:
                        pl.when(jt == NT - 1)(_fin_attn)
                    else:
                        _fin_attn()
                return

            for hh in range(hb):
                head = ai * hb + hh          # traced; lane offsets below
                qoff = head * rep * Dh       # stay Dh-aligned (128)
                koff = Hq * Dh + head * Dh
                voff = (Hq + Hkv) * Dh + head * Dh
                for b in range(B):
                    qpos = qp_ref[b]
                    live = qpos >= 0
                    c = cos_r[b:b + 1]                   # (1, Dh/2) f32
                    s_ = sin_r[b:b + 1]

                    def rot(x2):               # (rows, Dh) f32 -> rope'd
                        x1, xx2 = x2[:, :d2], x2[:, d2:]
                        return jnp.concatenate(
                            [x1 * c - xx2 * s_, xx2 * c + x1 * s_], axis=-1)

                    q2 = qkv_s[b:b + 1, pl.ds(qoff, rep * Dh)].reshape(
                        rep, Dh)
                    kn2 = qkv_s[b:b + 1, pl.ds(koff, Dh)]        # (1, Dh)
                    vn2 = qkv_s[b:b + 1, pl.ds(voff, Dh)]
                    q_rot = rot(q2)
                    kn_rot = rot(kn2)

                    kc = k_r[0, b, hh].astype(jnp.float32)       # (S, Dh)
                    vc = v_r[0, b, hh]
                    pv = pos_r[0, b, hh]                         # (1, S)
                    logits = jax.lax.dot_general(
                        q_rot, kc,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) * scale
                    if quant:
                        logits = logits * ksc_r[0, b, hh]
                    logit_new = jnp.sum(q_rot * kn_rot, axis=-1,
                                        keepdims=True) * scale   # (rep, 1)
                    mask = (pv >= 0) & (pv <= qpos)
                    if sliding_window is not None:
                        # Mistral sliding window (matches
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

                    pvv = p * vsc_r[0, b, hh] if quant else p
                    out = jax.lax.dot_general(
                        pvv, vc.astype(jnp.float32),
                        dimension_numbers=DN,
                        preferred_element_type=jnp.float32) + p_new * vn2
                    attn_s[b:b + 1, pl.ds(qoff, rep * Dh)] = out.reshape(
                        1, rep * Dh)
                    probs_o[0, b, hh] = jnp.mean(p, axis=0, keepdims=True)
                    kn_o[0, b, hh] = kn_rot.astype(kn_o.dtype)
                    vn_o[0, b, hh] = vn2.astype(vn_o.dtype)
                    pnew_o[0, b, hh] = jnp.broadcast_to(
                        jnp.mean(p_new, axis=0, keepdims=True), (1, 128))

        # ---- O phases ---------------------------------------------------
        @pl.when((t >= oO) & (t < oG))
        def _o():
            @pl.when(t == oO)
            def _pro():
                prep_lhs(attn_s, go, kho, Go)
            j = t - oO
            y = mm_tile(op_p, op_g, go, kho, tno, Go)
            sl = pl.ds(j * tno, tno)
            h_s[:, sl] += y

        # ---- gate|up phases --------------------------------------------
        @pl.when((t >= oG) & (t < oD))
        def _gu():
            @pl.when(t == oG)
            def _pro():
                xln_s[:] = _rms(h_s[:], lnm[0], eps)
                prep_lhs(xln_s, gg, khq, Gg)
            j = t - oG
            y = mm_tile(gp_p, gp_g, gg, khq, tng, Gg)
            gu_s[:, pl.ds(j * tng, tng)] = y

        # ---- down phases ------------------------------------------------
        @pl.when(t >= oD)
        def _d():
            @pl.when(t == oD)
            def _pro():
                g = gu_s[:, :F]
                up = gu_s[:, F:]
                swig_s[:] = (g * jax.lax.logistic(g)) * up
                prep_lhs(swig_s, gd, khd, Gd)
            j = t - oD
            y = mm_tile(dp_p, dp_g, gd, khd, tnd, Gd)
            sl = pl.ds(j * tnd, tnd)
            h_s[:, sl] += y

            @pl.when((l == L - 1) & (t == NP - 1))
            def _fin():
                h_out[:] = h_s[:].astype(h_out.dtype)

    # ---- block specs ----------------------------------------------------
    def c2(shape):  # per-layer constant block
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

    def _ahc(t):
        a = jnp.clip(t - oA, 0, TA - 1)
        return a // NT if NT > 1 else a

    def _ajt(t):
        a = jnp.clip(t - oA, 0, TA - 1)
        return a - (a // NT) * NT if NT > 1 else 0

    def ahead(shape):  # full-S attention block (pos/scales/outputs)
        return pl.BlockSpec(
            shape,
            lambda l, t, qp: (l, 0, _ahc(t)) + (0,) * (len(shape) - 3),
            memory_space=pltpu.VMEM)

    def akv(shape):    # S-tiled K/V block (NT flash tiles per head)
        return pl.BlockSpec(
            shape,
            lambda l, t, qp: (l, 0, _ahc(t), _ajt(t), 0),
            memory_space=pltpu.VMEM)

    const = lambda shape: pl.BlockSpec(
        shape, lambda l, t, qp: (0,) * len(shape), memory_space=pltpu.VMEM)

    in_specs = [
        const((Bp, D)),                   # x0
        c2((1, 1, D)),                    # ln_attn
        c2((1, 1, D)),                    # ln_mlp
        const((Bp, Dh // 2)),             # cos
        const((Bp, Dh // 2)),             # sin
        tile3(khq, tnq, oQ, TQ), gtile(2 * gq, tnq, oQ, TQ),
        tile3(kho, tno, oO, TO), gtile(2 * go, tno, oO, TO),
        tile3(khq, tng, oG, TG), gtile(2 * gg, tng, oG, TG),
        tile3(khd, tnd, oD, TD), gtile(2 * gd, tnd, oD, TD),
        akv((1, B, hb, St, Dh)),          # k
        akv((1, B, hb, St, Dh)),          # v
        ahead((1, B, hb, 1, S)),          # pos (L, B, Hkv, 1, S)
    ]
    inputs = [h0, layers["ln_attn"][:, None, :], layers["ln_mlp"][:, None, :],
              cos, sin,
              wq_p, wq_g, wo_p, wo_g, wg_p, wg_g, wd_p, wd_g,
              k, v, pos[:, :, :, None, :]]
    if quant:
        in_specs += [ahead((1, B, hb, 1, S)), ahead((1, B, hb, 1, S))]
        inputs += [k_scale[:, :, :, None, :], v_scale[:, :, :, None, :]]

    out_specs = [
        const((Bp, D)),                   # h_out
        ahead((1, B, hb, 1, Dh)),         # kn
        ahead((1, B, hb, 1, Dh)),         # vn
        ahead((1, B, hb, 1, S)),          # probs
        ahead((1, B, hb, 1, 128)),        # p_new
    ]
    out_shape = [
        jax.ShapeDtypeStruct((Bp, D), dt),
        jax.ShapeDtypeStruct((L, B, Hkv, 1, Dh), dt),
        jax.ShapeDtypeStruct((L, B, Hkv, 1, Dh), dt),
        jax.ShapeDtypeStruct((L, B, Hkv, 1, S), jnp.float32),
        jax.ShapeDtypeStruct((L, B, Hkv, 1, 128), jnp.float32),
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, NP),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((Bp, D), jnp.float32),                 # h_s
            pltpu.VMEM((Bp, D), jnp.float32),                 # xln_s
            pltpu.VMEM((RMAX, CG * G_MAX), dt),               # lhsA
            pltpu.VMEM((2 * RMAX + CG * Bp, CG * G_MAX), dt),  # lhsBC
            pltpu.VMEM((Bp, Nq), jnp.float32),                # qkv_s
            pltpu.VMEM((Bp, Hq * Dh), jnp.float32),           # attn_s
            pltpu.VMEM((Bp, 2 * F), jnp.float32),             # gu_s
            pltpu.VMEM((Bp, F), jnp.float32),                 # swig_s
            pltpu.VMEM((Bp, kh_max), jnp.float32),            # xh_s
            pltpu.VMEM((Bp, S), jnp.float32),                 # lgs_s (flash)
            pltpu.VMEM((Bp, 128), jnp.float32),               # fm_s
            pltpu.VMEM((Bp, 128), jnp.float32),               # fd_s
            pltpu.VMEM((Bp, Dh), jnp.float32),                # facc_s
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
            flops=3 * 2 * CG * Bp * weight_bytes
            + 4 * L * B * Hq * S * Dh,
            bytes_accessed=weight_bytes
            + L * B * Hkv * S * Dh * 2 * k.dtype.itemsize,
            transcendentals=L * B * Hq * S,
        ),
        interpret=interpret,
    )(q_pos, *inputs)
    return h[:B], kn, vn, probs, pnew[:, :, :, 0, 0]
