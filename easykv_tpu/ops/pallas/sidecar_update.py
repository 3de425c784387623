"""Fused Pallas TPU kernels for the per-step sidecar pipeline of a budgeted
decode step.

Two entry points, matching the engine's two-phase structure (forward writes,
then the engine applies one eviction event — reference easykv.py:302-362
ordering):

  fused_write_update   replaces free_slot_ids (top_k) + the policy score
                       update + the 4-array sidecar scatter of
                       models/llama._decode_write — slot select, score/
                       score_sq update (reference easykv.py:288-300), and
                       the new token's sidecar row write in one VMEM pass.
                       K/V row writes stay outside (128-byte scatters;
                       routing the multi-MB K/V blocks through VMEM would
                       double attention-class HBM traffic).

  fused_evict          replaces bump_counters + select_evictions (std +
                       threshold + argmin, multiple full-buffer passes) +
                       evict_slots inside policies.evict_cache for
                       PHASE_DECODE / k=1 specs.

Exactness: same masks, the same first-occurrence tie-breaks as
lax.top_k(k=1), and the roco threshold as the exact k-th smallest std via
bit bisection (non-negative f32s bitcast to int32 preserve order — see
policies._kth_smallest). Verified bit-exact against the XLA path by
tests/test_sidecar_kernel.py and the oracle lockstep suite.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...policies import ROCO_STD_GUARD, PHASE_DECODE, PolicySpec

INT_MAX = 2**31 - 1
F32_EXCLUDE = 1e30   # matches policies.STD_EXCLUDE
F32_FORCE = 1e9      # matches policies.STD_FORCE

# Eviction selections the kernel implements (PHASE_DECODE paths).
SUPPORTED = ("h2o_head", "tova", "roco", "recency", "random")


def evict_supported(spec: Optional[PolicySpec]) -> bool:
    return (spec is not None and spec.phase == PHASE_DECODE and spec.k == 1
            and spec.policy in SUPPORTED)


def _iota_s(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _first_min_idx(val, sentinel_count):
    """Index of the first occurrence of the minimum along the last axis —
    the lax.top_k(-x, 1) / stable-sort tie order."""
    m = jnp.min(val, axis=-1, keepdims=True)
    idx = jnp.where(val == m, _iota_s(val.shape), sentinel_count)
    return jnp.min(idx, axis=-1, keepdims=True)


def _kth_smallest_bits(bits, k, nbits=31):
    """Exact k-th smallest of non-negative int32 `bits` along the last axis
    (31-step bisection; values must be >= 0 so the sign bit is clear).
    Returns (..., 1)."""

    def body(i, prefix):
        cand = prefix | jax.lax.shift_left(jnp.int32(1), nbits - 1 - i)
        cnt = jnp.sum((bits < cand).astype(jnp.int32), axis=-1, keepdims=True)
        return jnp.where(cnt >= k, prefix, cand)

    return jax.lax.fori_loop(0, nbits, body, jnp.zeros_like(bits[..., :1]))


# ---------------------------------------------------------------------------
# write kernel
# ---------------------------------------------------------------------------


def _pick_hb(H: int, S: int, n_blocks: int) -> int:
    """Largest KV-head block count whose (hb, S) f32 blocks fit a
    conservative VMEM budget (double-buffered). The sidecar kernels are
    per-head-row independent, so the grid tiles heads freely; one program
    per (L, B) with the full (H, S) block VMEM-OOMs past S ~ 6K at H=32
    (caught by the 16K-regime bench: 16.5M > 16M scoped vmem)."""
    budget = 10 * 1024 * 1024
    hb = H
    while hb > 1 and n_blocks * hb * S * 4 * 2 > budget:
        hb //= 2
    return hb


def _select_victim(pos, score, ssq, counter, next_pos, prompt_len,
                   rand_rank, *, policy: str, recent_window: int,
                   feasible_k: int, protect_prompt: bool):
    """Per-head eviction victim over (H, S) blocks — the selection math of
    policies.select_evictions for PHASE_DECODE / k=1, shared by
    _evict_kernel and the write+evict fused kernel. `counter` must already
    be bumped."""
    H, S = pos.shape
    iota = _iota_s((H, S))
    valid = pos >= 0
    base = valid
    if protect_prompt:
        base = base & (pos >= prompt_len)

    if policy in ("h2o_head", "tova"):
        cand = base
        if policy == "h2o_head":
            cand = cand & (pos < next_pos - recent_window)
        victim = _first_min_idx(
            jnp.where(cand, score, jnp.float32(jnp.inf)), S
        )
    elif policy == "recency":
        victim = _first_min_idx(
            jnp.where(base, pos.astype(jnp.float32), jnp.float32(jnp.inf)), S
        )
    elif policy == "random":
        p_masked = jnp.where(base, pos, INT_MAX)
        target = _kth_smallest_bits(p_masked, rand_rank + 1)
        victim = _first_min_idx(jnp.where(p_masked == target, iota, S), S)
    else:  # roco
        mean = score / counter
        var = ssq / counter - mean * mean
        std = jnp.sqrt(jnp.maximum(var, 0.0))
        forced = pos >= next_pos - ROCO_STD_GUARD
        force_val = jnp.float32(F32_FORCE) + pos.astype(jnp.float32) * 1024.0
        std = jnp.where(forced, force_val, std)
        std = jnp.where(base, std, jnp.float32(F32_EXCLUDE))
        # stds are all >= 0, so the raw bit pattern is order-preserving
        bits = jax.lax.bitcast_convert_type(std, jnp.int32)
        kth = _kth_smallest_bits(bits, feasible_k)
        feasible = bits <= kth
        avg = score / counter
        victim = _first_min_idx(
            jnp.where(feasible, avg, jnp.float32(jnp.inf)), S
        )
    return victim


def _write_kernel(iparams_ref, fparams_ref,
                  pos_ref, score_ref, ssq_ref, counter_ref, probs_ref,
                  pnew_ref, *rest,
                  policy: Optional[str],
                  espec: Optional[PolicySpec] = None,
                  with_scales: bool = False,
                  compact: bool = False):
    outs = list(rest)
    vslot_out = outs.pop() if compact else None
    if with_scales:
        (ksn_ref, vsn_ref, ksc_ref, vsc_ref,
         pos_out, score_out, ssq_out, counter_out, slot_out,
         ksc_out, vsc_out) = outs
    else:
        pos_out, score_out, ssq_out, counter_out, slot_out = outs
    b = pl.program_id(1)
    pos = pos_ref[0, 0]          # (H, S) int32
    score = score_ref[0, 0]      # (H, S) f32
    ssq = ssq_ref[0, 0]
    counter = counter_ref[0, 0]
    probs = probs_ref[0, 0]      # (H, S) f32 (exactly 0 at invalid slots)
    p_new = pnew_ref[0, 0]       # (H, 1) f32

    q_pos = iparams_ref[b, 0]
    live = iparams_ref[b, 1] != 0
    g_upd = iparams_ref[b, 2] != 0
    cinit = fparams_ref[b, 0]

    H, S = pos.shape
    iota = _iota_s((H, S))

    # write slot: first free (pos < 0) index per head; an all-full row falls
    # back to slot 0 exactly like free_slot_ids' top_k over an all-zero key
    # (cannot fire: the ring always keeps >= 1 free slot pre-write)
    free_key = jnp.where(pos < 0, 2 * S - iota, 0)
    m = jnp.max(free_key, axis=-1, keepdims=True)
    slot = jnp.min(jnp.where(free_key == m, iota, S), axis=-1, keepdims=True)

    # policy score update over cached slots (_decode_write semantics)
    gf = (g_upd).astype(jnp.float32)
    s_new = jnp.zeros_like(p_new)
    sq_new = jnp.zeros_like(p_new)
    if policy in ("h2o_head", "roco"):
        score = score + probs * gf
        s_new = p_new * gf
        if policy == "roco":
            ssq = ssq + probs * probs * gf
            sq_new = p_new * p_new * gf
    elif policy == "tova":
        score = jnp.where(g_upd, probs, score)
        s_new = p_new * gf

    # write the new token's sidecar row at `slot`
    at_slot = (iota == slot) & live
    pos = jnp.where(at_slot, q_pos, pos)
    counter = jnp.where(at_slot, cinit, counter)
    score = jnp.where(at_slot, s_new, score)
    ssq = jnp.where(at_slot, sq_new, ssq)

    pos_out[0, 0] = pos
    score_out[0, 0] = score
    ssq_out[0, 0] = ssq
    counter_out[0, 0] = counter
    slot_out[0, 0] = jnp.broadcast_to(slot, slot_out.shape[2:])

    if with_scales:
        # int8-KV dequant-scale row write folded in (vectorized masked
        # update of data already streaming through this kernel) — each
        # scale was a (L*B*H)-row XLA scalar scatter before (~half the
        # 1.95 ms/step _write_kv_rows cost at 7B B=8, bench_b8.py).
        # Unconditional like _write_kv_rows: dead rows' slots stay
        # pos-invalid, so their bytes are inert.
        ksc_out[0, 0] = jnp.where(iota == slot, ksn_ref[0, 0], ksc_ref[0, 0])
        vsc_out[0, 0] = jnp.where(iota == slot, vsn_ref[0, 0], vsc_ref[0, 0])

    if espec is not None:
        # Folded eviction event (engine ordering: forward writes, THEN one
        # gated eviction — reference easykv.py:302-362): bump + select +
        # invalidate on the freshly written arrays, all still in VMEM. The
        # separate fused_evict dispatch re-read every sidecar from HBM
        # (+0.69 ms/step at 7B B=8, benchmarks/bench_b8.py). The selection
        # only runs on evicting steps (pl.when on the per-row gate —
        # replaces the engine-level lax.cond).
        g_evt = iparams_ref[b, 3] != 0
        e_next_pos = iparams_ref[b, 4]
        e_prompt_len = iparams_ref[b, 5]
        e_rand_rank = iparams_ref[b, 6]
        if compact:
            vslot_out[0, 0] = jnp.broadcast_to(jnp.int32(S),
                                               vslot_out.shape[2:])

        @pl.when(g_evt)
        def _evict():
            cb = counter + jnp.float32(espec.k)   # bump_counters, gated
            victim = _select_victim(
                pos, score, ssq, cb, e_next_pos, e_prompt_len, e_rand_rank,
                policy=espec.policy, recent_window=espec.recent_window,
                feasible_k=max(espec.feasible_k, 1),
                protect_prompt=bool(espec.protect_prompt),
            )
            ev = iota == victim
            if not compact:
                pos_out[0, 0] = jnp.where(ev, -1, pos)
                counter_out[0, 0] = cb
                return
            # ordered-streaming fold (engine/generate._compact_one's
            # sidecar half): slots above each head's victim shift down by
            # one in the SAME pass; the victim slot goes to the K/V
            # compact kernel (vslot_out), which shifts + pre-rotates the
            # big arrays. k=1 per head under the gate, so every head row
            # fires.
            ge = iota >= victim

            def shl(x):
                return jnp.concatenate([x[:, 1:], x[:, :1]], axis=1)

            pos_c = jnp.where(ge, shl(pos), pos)
            pos_out[0, 0] = jnp.where(iota == S - 1, -1, pos_c)
            score_out[0, 0] = jnp.where(ge, shl(score), score)
            ssq_out[0, 0] = jnp.where(ge, shl(ssq), ssq)
            counter_out[0, 0] = jnp.where(ge, shl(cb), cb)
            vslot_out[0, 0] = jnp.broadcast_to(victim, vslot_out.shape[2:])


@functools.partial(jax.jit, static_argnames=("policy", "espec", "compact",
                                             "interpret"))
def fused_write_update(
    pos: jax.Array,        # (L, B, H, S) int32
    score: jax.Array,      # (L, B, H, S) f32
    score_sq: jax.Array,   # (L, B, H, S) f32
    counter: jax.Array,    # (L, B, H, S) f32
    probs: jax.Array,      # (L, B, H, S) f32 GQA-mean attention mass
    p_new: jax.Array,      # (L, B, H, 1) f32 in-flight token's probability
    q_pos: jax.Array,          # (B,) int32
    token_valid: jax.Array,    # (B,) bool
    update_gate: jax.Array,    # (B,) bool
    counter_init: jax.Array,   # (B,) f32
    policy: Optional[str],
    espec: Optional[PolicySpec] = None,   # fold the (gated) eviction event
    evict_gate: Optional[jax.Array] = None,   # (B,) bool
    next_pos: Optional[jax.Array] = None,     # (B,) int32
    prompt_len: Optional[jax.Array] = None,   # (B,) int32
    rand_rank: Optional[jax.Array] = None,    # (B,) int32
    k_sc_new: Optional[jax.Array] = None,     # (L, B, H, 1) f32 new-row K
    v_sc_new: Optional[jax.Array] = None,     # dequant scales (int8 KV)
    k_scale: Optional[jax.Array] = None,      # (L, B, H, S) f32
    v_scale: Optional[jax.Array] = None,
    compact: bool = False,   # ordered-streaming: sidecars compact in-kernel
    interpret: bool = False,
):
    """Returns (pos, score, score_sq, counter, write_slot (L, B, H, 1)
    [, k_scale, v_scale when k_sc_new is given]
    [, victim_slot (L, B, H, 1) when compact — S = no eviction]).
    With espec, pos/counter are POST-eviction (the engine then skips its
    separate evict_cache dispatch — see _write_kernel's folded-evict note);
    with compact, they are also POST-compaction, write_slot stays the
    PRE-compact slot (the engine writes K/V rows there BEFORE handing
    victim_slot to fused_kv_compact, which then shifts those rows too —
    same order as the two-phase path)."""
    L, B, H, S = pos.shape
    assert not compact or espec is not None
    assert S % 128 == 0, "ring buffer must be lane-aligned (engine rounds up)"
    with_scales = k_sc_new is not None
    icols = [q_pos, token_valid.astype(jnp.int32),
             update_gate.astype(jnp.int32)]
    if espec is not None:
        icols += [evict_gate.astype(jnp.int32), next_pos, prompt_len,
                  rand_rank]
    iparams = jnp.stack(icols, axis=-1)
    fparams = counter_init[:, None].astype(jnp.float32)

    hb = _pick_hb(H, S, 13 if with_scales else 9)

    def spec4(shape):
        return pl.BlockSpec(shape, lambda l, b, h, ip, fp: (l, b, h, 0),
                            memory_space=pltpu.VMEM)

    sS = spec4((1, 1, hb, S))
    s1 = spec4((1, 1, hb, 1))
    in_specs = [sS] * 5 + [s1]
    out_specs = [sS] * 4 + [s1]
    out_shape = [
        jax.ShapeDtypeStruct((L, B, H, S), jnp.int32),
        jax.ShapeDtypeStruct((L, B, H, S), jnp.float32),
        jax.ShapeDtypeStruct((L, B, H, S), jnp.float32),
        jax.ShapeDtypeStruct((L, B, H, S), jnp.float32),
        jax.ShapeDtypeStruct((L, B, H, 1), jnp.int32),
    ]
    # in-place: pos/score/ssq/counter donate onto their outputs (alias
    # indices count the 2 scalar-prefetch args first)
    aliases = {2: 0, 3: 1, 4: 2, 5: 3}
    inputs = [iparams, fparams, pos, score, score_sq, counter, probs, p_new]
    if with_scales:
        in_specs += [s1, s1, sS, sS]
        out_specs += [sS, sS]
        out_shape += [jax.ShapeDtypeStruct((L, B, H, S), jnp.float32)] * 2
        aliases.update({10: 5, 11: 6})
        inputs += [k_sc_new, v_sc_new, k_scale, v_scale]
    if compact:
        out_specs += [s1]
        out_shape += [jax.ShapeDtypeStruct((L, B, H, 1), jnp.int32)]
    return pl.pallas_call(
        functools.partial(_write_kernel, policy=policy, espec=espec,
                          with_scales=with_scales, compact=compact),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(L, B, H // hb),
            in_specs=in_specs,
            out_specs=out_specs,
        ),
        out_shape=out_shape,
        input_output_aliases=aliases,
        interpret=interpret,
    )(*inputs)


def fused_write_update_sharded(
    *args, mesh, data_axis="data", model_axis="model", policy, interpret=False
):
    """fused_write_update under a (data, model) mesh via shard_map: batch
    shards over data, KV heads over model, zero communication."""
    from jax.sharding import PartitionSpec as P

    d, m = data_axis, model_axis
    p4 = P(None, d, m, None)
    pb = P(d)

    def fn(pos, score, ssq, counter, probs, p_new, q_pos, tv, ug, ci):
        return fused_write_update(pos, score, ssq, counter, probs, p_new,
                                  q_pos, tv, ug, ci, policy=policy,
                                  interpret=interpret)

    return jax.shard_map(
        fn, mesh=mesh, in_specs=(p4,) * 6 + (pb,) * 4,
        out_specs=(p4,) * 5, check_vma=False,
    )(*args)


# ---------------------------------------------------------------------------
# evict kernel
# ---------------------------------------------------------------------------

def _evict_kernel(iparams_ref,
                  pos_ref, score_ref, ssq_ref, counter_ref,
                  pos_out, counter_out,
                  *, policy: str, k_evict: int, recent_window: int,
                  feasible_k: int, protect_prompt: bool):
    b = pl.program_id(1)
    pos = pos_ref[0, 0]
    score = score_ref[0, 0]
    ssq = ssq_ref[0, 0]
    counter = counter_ref[0, 0]

    g_evt = iparams_ref[b, 0] != 0
    next_pos = iparams_ref[b, 1]
    prompt_len = iparams_ref[b, 2]
    rand_rank = iparams_ref[b, 3]

    H, S = pos.shape
    iota = _iota_s((H, S))

    # bump (policies.bump_counters, gated per batch row)
    counter = counter + jnp.float32(k_evict) * g_evt.astype(jnp.float32)

    victim = _select_victim(
        pos, score, ssq, counter, next_pos, prompt_len, rand_rank,
        policy=policy, recent_window=recent_window, feasible_k=feasible_k,
        protect_prompt=protect_prompt,
    )
    ev = (iota == victim) & g_evt
    pos_out[0, 0] = jnp.where(ev, -1, pos)
    counter_out[0, 0] = counter


@functools.partial(jax.jit, static_argnames=("spec", "interpret"))
def fused_evict(
    pos: jax.Array,        # (L, B, H, S) int32
    score: jax.Array,      # (L, B, H, S) f32
    score_sq: jax.Array,   # (L, B, H, S) f32
    counter: jax.Array,    # (L, B, H, S) f32
    evict_gate: jax.Array,   # (B,) bool
    next_pos: jax.Array,     # (B,) int32
    prompt_len: jax.Array,   # (B,) int32
    rand_rank: jax.Array,    # (B,) int32
    spec: PolicySpec,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """One gated eviction event. Returns (pos, counter) — score/score_sq are
    read-only here (evict_slots only invalidates pos; bump only ages
    counters)."""
    L, B, H, S = pos.shape
    assert S % 128 == 0
    iparams = jnp.stack(
        [evict_gate.astype(jnp.int32), next_pos, prompt_len, rand_rank],
        axis=-1,
    )

    hb = _pick_hb(H, S, 6)

    def spec4(shape):
        return pl.BlockSpec(shape, lambda l, b, h, ip: (l, b, h, 0),
                            memory_space=pltpu.VMEM)

    kern = functools.partial(
        _evict_kernel, policy=spec.policy, k_evict=spec.k,
        recent_window=spec.recent_window,
        feasible_k=max(spec.feasible_k, 1),
        protect_prompt=bool(spec.protect_prompt),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, B, H // hb),
        in_specs=[spec4((1, 1, hb, S))] * 4,
        out_specs=[spec4((1, 1, hb, S))] * 2,
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((L, B, H, S), jnp.int32),
            jax.ShapeDtypeStruct((L, B, H, S), jnp.float32),
        ],
        # pos/counter in-place (alias indices count the prefetch arg first)
        input_output_aliases={1: 0, 4: 1},
        interpret=interpret,
    )(iparams, pos, score, score_sq, counter)


def fused_evict_sharded(
    *args, mesh, data_axis="data", model_axis="model", spec, interpret=False
):
    from jax.sharding import PartitionSpec as P

    d, m = data_axis, model_axis
    p4 = P(None, d, m, None)
    pb = P(d)

    def fn(pos, score, ssq, counter, eg, np_, pl_, rr):
        return fused_evict(pos, score, ssq, counter, eg, np_, pl_, rr,
                           spec=spec, interpret=interpret)

    return jax.shard_map(
        fn, mesh=mesh, in_specs=(p4,) * 4 + (pb,) * 4,
        out_specs=(p4, p4), check_vma=False,
    )(*args)


# ---------------------------------------------------------------------------
# compact kernel (ordered streaming decode)
# ---------------------------------------------------------------------------

def _compact_kernel(pm_ref, pos_ref, score_ref, ssq_ref, cnt_ref,
                    k_ref, v_ref, *rest, quant):
    """Age-ordered compaction after a k=1 eviction (ordered streaming
    decode): per head, slots above the victim shift down by one so valid
    slots stay contiguous/age-ordered — the reference's physical removal
    (truncate_kv_cache_silo, easykv.py:56-68) as ONE VMEM pass over all
    cache arrays, replacing the 8-array XLA roll+select chain
    (engine/generate._compact_one)."""
    if quant:
        ks_ref, vs_ref = rest[0], rest[1]
        outs = rest[2:]
    else:
        outs = rest
    pos_o, score_o, ssq_o, cnt_o, k_o, v_o = outs[:6]

    pm = pm_ref[0, 0]                        # (hb, S) pre-evict pos
    pos = pos_ref[0, 0]
    H, S = pos.shape
    iota = _iota_s((H, S))
    evicted = (pm >= 0) & (pos < 0)
    fired = jnp.any(evicted, axis=-1, keepdims=True)          # (hb, 1)
    v_slot = jnp.min(jnp.where(evicted, iota, S), axis=-1, keepdims=True)
    ge = (iota >= v_slot) & fired                              # (hb, S)

    def shift2(ref, out):
        a = ref[0, 0]
        sh = jnp.concatenate([a[:, 1:], a[:, :1]], axis=1)
        out[0, 0] = jnp.where(ge, sh, a)

    pos_n = jnp.where(ge, jnp.concatenate([pos[:, 1:], pos[:, :1]], axis=1),
                      pos)
    # the (now one-past-the-end) last slot wrapped around to slot 0's value
    pos_o[0, 0] = jnp.where(fired & (iota == S - 1), -1, pos_n)
    shift2(score_ref, score_o)
    shift2(ssq_ref, ssq_o)
    shift2(cnt_ref, cnt_o)
    if quant:
        ks_o, vs_o = outs[6], outs[7]
        shift2(ks_ref, ks_o)
        shift2(vs_ref, vs_o)

    ge3 = ge[:, :, None]                                       # (hb, S, 1)
    for ref, out in ((k_ref, k_o), (v_ref, v_o)):
        a = ref[0, 0]                                          # (hb, S, D)
        # sub-32-bit K/V (int8/bf16): Mosaic can't insert a minor dim on
        # narrow types ("only supported for 32-bit") and pltpu.bitcast
        # packs along the SUBLANE (S) dim — useless for S-row shifts — so
        # the select runs on an exact f32 upcast (int8 values and bf16
        # round-trip losslessly through f32)
        a32 = a.astype(jnp.float32) if a.dtype.itemsize < 4 else a
        sh = jnp.concatenate([a32[:, 1:, :], a32[:, :1, :]], axis=1)
        out[0, 0] = jnp.where(ge3, sh, a32).astype(a.dtype)


def compact_fits(H: int, S: int, D: int, kv_bytes: int) -> bool:
    """Mosaic requires block sublane dims divisible by 8, so the compact
    kernel's head blocks are fixed at hb=8 (or the whole H when H < 8 —
    then the block equals the array dim, always legal); past the VMEM
    budget (K/V in+out + f32 select temps) callers keep the XLA
    roll+select."""
    hb = 8 if H >= 8 else H
    return hb * S * (2 * D * (kv_bytes * 2 + 8) + 7 * 4 * 2) \
        <= 12 * 1024 * 1024


def _pick_hb_compact(H: int) -> int:
    return 8 if H >= 8 else H


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_compact(
    pos_mid: jax.Array,    # (L, B, H, S) int32 pre-evict positions
    pos: jax.Array,        # (L, B, H, S) int32 post-evict
    score: jax.Array,      # (L, B, H, S) f32
    score_sq: jax.Array,
    counter: jax.Array,
    k: jax.Array,          # (L, B, H, S, D)
    v: jax.Array,
    k_scale: Optional[jax.Array] = None,   # (L, B, H, S) f32 (int8 KV)
    v_scale: Optional[jax.Array] = None,
    interpret: bool = False,
):
    """Returns (pos, score, score_sq, counter, k, v[, k_scale, v_scale])
    compacted."""
    L, B, H, S = pos.shape
    D = k.shape[-1]
    assert S % 128 == 0
    quant = k_scale is not None
    assert compact_fits(H, S, D, k.dtype.itemsize)
    hb = _pick_hb_compact(H)

    def s4(shape):
        return pl.BlockSpec(shape, lambda l, b, h: (l, b, h, 0),
                            memory_space=pltpu.VMEM)

    def s5(shape):
        return pl.BlockSpec(shape, lambda l, b, h: (l, b, h, 0, 0),
                            memory_space=pltpu.VMEM)

    side = s4((1, 1, hb, S))
    kv5 = s5((1, 1, hb, S, D))
    in_specs = [side] * 5 + [kv5, kv5] + ([side, side] if quant else [])
    out_specs = [side] * 4 + [kv5, kv5] + ([side, side] if quant else [])
    out_shape = [
        jax.ShapeDtypeStruct(pos.shape, pos.dtype),
        jax.ShapeDtypeStruct(score.shape, score.dtype),
        jax.ShapeDtypeStruct(score_sq.shape, score_sq.dtype),
        jax.ShapeDtypeStruct(counter.shape, counter.dtype),
        jax.ShapeDtypeStruct(k.shape, k.dtype),
        jax.ShapeDtypeStruct(v.shape, v.dtype),
    ] + ([jax.ShapeDtypeStruct(k_scale.shape, k_scale.dtype),
          jax.ShapeDtypeStruct(v_scale.shape, v_scale.dtype)]
         if quant else [])
    inputs = [pos_mid, pos, score, score_sq, counter, k, v]
    if quant:
        inputs += [k_scale, v_scale]
    # alias every array input (all but pos_mid) onto its output: compaction
    # is in-place, no second HBM allocation
    aliases = {i + 1: i for i in range(len(out_shape))}
    return pl.pallas_call(
        functools.partial(_compact_kernel, quant=quant),
        grid=(L, B, H // hb),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases=aliases,
        interpret=interpret,
    )(*inputs)


# ---------------------------------------------------------------------------
# K/V compact (+ pre-rotation Givens) kernel — ordered streaming decode
# ---------------------------------------------------------------------------


def _kv_compact_kernel(vslot_ref, cos_ref, sin_ref, k_ref, v_ref, *rest,
                       quant, rotate, H):
    """Per (layer, batch, head-block): shift K/V rows above the victim down
    by one; with `rotate`, every SHIFTED K row picks up the fixed R(-theta)
    Givens update (its age rank dropped by one) and is requantized with a
    fresh per-row scale. V and its scale shift unrotated. The XLA
    formulation of the same math materializes full-cache f32 intermediates
    (dequant + rotate + rowmax + requant) and cost ~3.6 ms/step at 7B
    (bench_streaming r5 first-light 0.614 ratio); here the f32 stages live
    only in VMEM.

    Layout notes: rotation operates on the RAW int8 values (it commutes
    with the per-row scalar scale) and the requant divides by the raw
    rowmax — the scale cancels, so the (S, D) value pipeline never touches
    the scale vectors. Scales ride in a PACKED (S/128, 128) lane layout
    (a (S, 1)-shaped block would be lane-padded 128x — the first cut
    moved ~1.5 GB/step of padding and showed up as a 0.672 streaming
    ratio); the one sublane->lane handoff (the rowmax factor) is a
    one-hot (S/128, S) @ (S, 128) MXU dot."""
    amax_s = rest[-1]                                # (S, 128) f32 scratch
    rest = rest[:-1]
    if quant:
        ksc_ref, vsc_ref = rest[0], rest[1]
        outs = rest[2:]
        k_o, v_o, ksc_o, vsc_o = outs[:4]
    else:
        k_o, v_o = rest[:2]
    l = pl.program_id(0)
    b = pl.program_id(1)
    hc = pl.program_id(2)
    B = pl.num_programs(1)
    hb = k_ref.shape[2]
    S, D = k_ref.shape[3], k_ref.shape[4]
    SL = S // 128
    d2 = D // 2
    c = cos_ref[:]                                   # (1, D/2) f32
    s_ = sin_ref[:]
    iota = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    if quant:
        # one-hot repack operands (shared across heads)
        E = (jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0) % 128
             == jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)
             ).astype(jnp.float32)
        G = (jax.lax.broadcasted_iota(jnp.int32, (SL, S), 1) // 128
             == jax.lax.broadcasted_iota(jnp.int32, (SL, S), 0)
             ).astype(jnp.float32)
        flat = (jax.lax.broadcasted_iota(jnp.int32, (SL, 128), 0) * 128
                + jax.lax.broadcasted_iota(jnp.int32, (SL, 128), 1))

    def shift_lane(x):     # (SL, 128) flat-index shift by +1
        wrap = jnp.concatenate([x[1:, 0:1], x[0:1, 0:1]], axis=0)
        return jnp.concatenate([x[:, 1:], wrap], axis=1)

    for h in range(hb):
        vs = vslot_ref[(l * B + b) * H + hc * hb + h]
        ge = iota >= vs                              # (S, 1)
        if quant and rotate and S % 128 == 0 and S >= 256:
            # Tile-skipped pipeline: only slots >= the victim shift, and
            # with protect_prompt the victim sits above the prompt — at the
            # bench shapes ~2/3 of the cache never moves. Tiles entirely
            # below the victim are a raw int8 copy (the aliased OUT block
            # must still be fully written); tiles at/above it pay the f32
            # cast + rotate + requant. Cuts the kernel's full-cache VPU
            # work (~10 ops/elt over 400 MB of values) to the moving tail.
            for tl in range(S // 128):
                lo, hi = tl * 128, tl * 128 + 128

                @pl.when(vs < hi)
                def _move(lo=lo, hi=hi, h=h, vs=vs):
                    if hi < S:
                        src = k_ref[0, 0, h, pl.ds(lo + 1, 128)]
                    else:
                        src = jnp.concatenate(
                            [k_ref[0, 0, h, pl.ds(lo + 1, 127)],
                             k_ref[0, 0, h, pl.ds(0, 1)]], axis=0)
                    shf = src.astype(jnp.float32)
                    x1, x2 = shf[:, :d2], shf[:, d2:]
                    shf = jnp.concatenate(
                        [x1 * c + x2 * s_, x2 * c - x1 * s_], axis=-1)
                    amax_t = jnp.max(jnp.abs(shf), axis=-1, keepdims=True)
                    amax_s[pl.ds(lo, 128), 0:1] = amax_t
                    qn = jnp.clip(jnp.round(
                        shf * (jnp.float32(127.0)
                               / jnp.maximum(amax_t, 1e-30))), -127, 127)
                    cur = k_ref[0, 0, h, pl.ds(lo, 128)].astype(jnp.float32)
                    ge_t = iota[lo:hi] >= vs
                    k_o[0, 0, h, pl.ds(lo, 128)] = jnp.where(
                        ge_t, qn, cur).astype(k_o.dtype)
                    vcur = v_ref[0, 0, h, pl.ds(lo, 128)].astype(jnp.float32)
                    if hi < S:
                        vsrc = v_ref[0, 0, h, pl.ds(lo + 1, 128)]
                    else:
                        vsrc = jnp.concatenate(
                            [v_ref[0, 0, h, pl.ds(lo + 1, 127)],
                             v_ref[0, 0, h, pl.ds(0, 1)]], axis=0)
                    v_o[0, 0, h, pl.ds(lo, 128)] = jnp.where(
                        ge_t, vsrc.astype(jnp.float32), vcur).astype(
                            v_o.dtype)
                    # scale tile: lane layout row tl <-> slot rows
                    # [lo, hi); the rowmax factor crosses layouts via a
                    # one-hot (1, 128) pick... handled below full-row
                    #  (scales are tiny; no tiling needed)

                @pl.when(vs >= hi)
                def _copy(lo=lo, h=h):
                    k_o[0, 0, h, pl.ds(lo, 128)] = k_ref[0, 0, h,
                                                         pl.ds(lo, 128)]
                    v_o[0, 0, h, pl.ds(lo, 128)] = v_ref[0, 0, h,
                                                         pl.ds(lo, 128)]
                    # finite filler: the one-hot repack dot multiplies
                    # every amax element by 0/1 — NaN garbage would leak
                    amax_s[pl.ds(lo, 128), 0:1] = jnp.zeros(
                        (128, 1), jnp.float32)
            # scale rows: the rowmax column crosses to the packed lane
            # layout via the one-hot dot; entries below the victim are
            # masked by ge_l (each output lane maps to exactly one row)
            ksc = ksc_ref[0, 0, h]                   # (SL, 128) f32
            vsc = vsc_ref[0, 0, h]
            amax_l = jax.lax.dot_general(
                G, amax_s[:, 0:1] * E,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (SL, 128)
            ge_l = flat >= vs
            nsc = jnp.maximum(shift_lane(ksc) * amax_l, 1e-8) \
                * jnp.float32(1.0 / 127.0)
            ksc_o[0, 0, h] = jnp.where(ge_l, nsc, ksc)
            vsc_o[0, 0, h] = jnp.where(ge_l, shift_lane(vsc), vsc)
            continue
        kf = k_ref[0, 0, h].astype(jnp.float32)      # (S, D) raw values
        vf = v_ref[0, 0, h].astype(jnp.float32)
        sh = jnp.concatenate([kf[1:], kf[:1]], axis=0)
        if rotate:
            x1, x2 = sh[:, :d2], sh[:, d2:]
            # R(-theta): the shifted row's rank dropped by exactly one
            sh = jnp.concatenate([x1 * c + x2 * s_, x2 * c - x1 * s_],
                                 axis=-1)
        vsh = jnp.concatenate([vf[1:], vf[:1]], axis=0)
        if quant and rotate:
            amax = jnp.max(jnp.abs(sh), axis=-1, keepdims=True)  # (S, 1)
            qn = jnp.clip(jnp.round(
                sh * (jnp.float32(127.0) / jnp.maximum(amax, 1e-30))),
                -127, 127)
            k_o[0, 0, h] = jnp.where(ge, qn, kf).astype(k_o.dtype)
            v_o[0, 0, h] = jnp.where(ge, vsh, vf).astype(v_o.dtype)
            # scale updates in the packed lane layout
            ksc = ksc_ref[0, 0, h]                   # (SL, 128) f32
            vsc = vsc_ref[0, 0, h]
            amax_l = jax.lax.dot_general(
                G, amax * E, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (SL, 128)
            ge_l = flat >= vs
            nsc = jnp.maximum(shift_lane(ksc) * amax_l, 1e-8) \
                * jnp.float32(1.0 / 127.0)
            ksc_o[0, 0, h] = jnp.where(ge_l, nsc, ksc)
            vsc_o[0, 0, h] = jnp.where(ge_l, shift_lane(vsc), vsc)
        elif quant:
            # plain quantized shift: values and scales move together,
            # bit-untouched
            k_o[0, 0, h] = jnp.where(ge, sh, kf).astype(k_o.dtype)
            v_o[0, 0, h] = jnp.where(ge, vsh, vf).astype(v_o.dtype)
            ge_l = flat >= vs
            ksc = ksc_ref[0, 0, h]
            vsc = vsc_ref[0, 0, h]
            ksc_o[0, 0, h] = jnp.where(ge_l, shift_lane(ksc), ksc)
            vsc_o[0, 0, h] = jnp.where(ge_l, shift_lane(vsc), vsc)
        else:
            k_o[0, 0, h] = jnp.where(ge, sh, kf).astype(k_o.dtype)
            v_o[0, 0, h] = jnp.where(ge, vsh, vf).astype(v_o.dtype)


@functools.partial(jax.jit, static_argnames=("rotate", "interpret"))
def fused_kv_compact(
    k: jax.Array,          # (L, B, H, S, D) int8 | bf16 (donated)
    v: jax.Array,
    v_slot: jax.Array,     # (L, B, H) int32 victim slot; S = no eviction
    k_scale: Optional[jax.Array] = None,   # (L, B, H, S) f32 (int8 KV)
    v_scale: Optional[jax.Array] = None,
    inv_freq: Optional[jax.Array] = None,  # (D/2,) — rotate shifted K rows
    rotate: bool = False,
    interpret: bool = False,
):
    """K/V (+ scales) age-ordered compaction, optionally with the
    pre-rotated-cache R(-theta) update on shifted K rows. Unlike
    fused_compact this uses 5-D blocks only (head-block size is free of the
    4-D sublane-tiling constraint), so it fits scoped VMEM at 7B S=768.
    Returns (k, v[, k_scale, v_scale]) aliased in place."""
    L, B, H, S, D = k.shape
    quant = k_scale is not None
    assert not quant or S % 128 == 0, "packed scale layout needs S % 128"
    SL = max(S // 128, 1)
    hb = 1
    for cand in (4, 2):
        if H % cand == 0 and cand * S * D * (2 + 8) * 2 <= 10 * (1 << 20):
            hb = cand
            break
    if rotate:
        c = jnp.cos(inv_freq)[None, :].astype(jnp.float32)
        s_ = jnp.sin(inv_freq)[None, :].astype(jnp.float32)
    else:
        c = jnp.zeros((1, D // 2), jnp.float32)
        s_ = jnp.zeros((1, D // 2), jnp.float32)

    def s5(shape):
        return pl.BlockSpec(shape, lambda l, b, h, vp: (l, b, h, 0, 0),
                            memory_space=pltpu.VMEM)

    const = pl.BlockSpec((1, D // 2), lambda l, b, h, vp: (0, 0),
                         memory_space=pltpu.VMEM)
    kv5 = s5((1, 1, hb, S, D))
    sc5 = s5((1, 1, hb, SL, 128))    # packed lane layout (see kernel note)
    in_specs = [const, const, kv5, kv5]
    out_specs = [kv5, kv5]
    out_shape = [jax.ShapeDtypeStruct(k.shape, k.dtype),
                 jax.ShapeDtypeStruct(v.shape, v.dtype)]
    inputs = [v_slot.reshape(-1), c, s_, k, v]
    # alias indices count the scalar-prefetch arg first
    aliases = {3: 0, 4: 1}
    if quant:
        in_specs += [sc5, sc5]
        out_specs += [sc5, sc5]
        out_shape += [jax.ShapeDtypeStruct((L, B, H, SL, 128),
                                           jnp.float32)] * 2
        inputs += [k_scale.reshape(L, B, H, SL, 128),
                   v_scale.reshape(L, B, H, SL, 128)]
        aliases.update({5: 2, 6: 3})
    res = pl.pallas_call(
        functools.partial(_kv_compact_kernel, quant=quant, rotate=rotate,
                          H=H),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(L, B, H // hb),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[pltpu.VMEM((S, 128), jnp.float32)],  # amax_s
        ),
        out_shape=out_shape,
        input_output_aliases=aliases,
        interpret=interpret,
    )(*inputs)
    if quant:
        return (res[0], res[1], res[2].reshape(L, B, H, S),
                res[3].reshape(L, B, H, S))
    return res[0], res[1]
