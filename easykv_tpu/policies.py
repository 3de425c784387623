"""Eviction policies over the static KV ring buffer.

Reimplements the reference's five policies — random / recency / h2o_head /
tova / roco (reference easykv/easykv.py:288-362 decode, :443-499 encode,
:694-747 encoding_decoding decode) — as vectorized on-device selection over
per-(layer, kv-head, slot) sidecars. The reference's buffer-order semantics
translate to position tests (see cache.py docstring):

  * recent-window protection  "scores[:, :, :-w]"  -> pos <  next_pos - w
  * roco std guard            "std[:, :, -10:]=1e9" -> pos >= next_pos - 10
  * sink protection           "scores[:, :, :4]"    -> pos <  sink_length
  * decode prompt protection  (easykv.py:290,311)   -> pos >= prompt_len

Known reference quirks reproduced intentionally (SURVEY.md §2.4):
  * decode-phase recent_ratio is hard-overridden to 0.3 (easykv.py:308, 709);
  * roco's recency guard is double-layered (std of the 10 newest slots forced
    to 1e9 AND feasible-set size budget - recent_window, easykv.py:320-324);
  * tova uses per-head last-token attention in decode but the head-mean in
    strided encoding (easykv.py:297-300 vs :454-457);
  * `h2o_head_std_avg` / `h2o_head_decay_avg_std` are aliases of roco.

Deviation: the reference's `random` branch in encoding_decoding decode
references an undefined variable and would crash (easykv.py:744, SURVEY
§2.4.4); we implement the evident intent (uniform over non-sink slots).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .cache import KVCache, LayerCache, evict_slots

INT_MAX = jnp.int32(2**31 - 1)
STD_FORCE = jnp.float32(1e9)     # reference's 1e9 std override (easykv.py:321)
STD_EXCLUDE = jnp.float32(1e30)  # strictly above STD_FORCE: never feasible
ROCO_STD_GUARD = 10              # "last 10 slots" guard (easykv.py:321, 472)

# Phase determines candidate masks + score-update flavor.
PHASE_DECODE = "decode"                # reference easykv.py:288-362
PHASE_ENCODE = "encode"                # reference easykv.py:443-499
PHASE_ENCDEC_DECODE = "encdec_decode"  # reference easykv.py:694-747


@dataclasses.dataclass(frozen=True)
class PolicySpec:
    """Static (compile-time) policy configuration for one engine run."""

    policy: str               # canonical: random|recency|h2o_head|tova|roco|full
    phase: str                # PHASE_*
    k: int                    # slots evicted per event (1 decode, stride encode)
    sink_length: int          # temp_length, reference easykv.py:206
    recent_window: int        # int(budget * recent_ratio), phase-specific
    feasible_k: int = 0       # roco stage-1 top-k size
    protect_prompt: bool = False  # decode mode: only generated slots evictable


# Above this k, selection switches from lax.top_k to a full bitonic sort:
# TPU top_k lowering (and its compile time) scales with k, while a sort is a
# fixed-size network — the budgeted decode graph compiled ~25x slower than
# full-cache purely from a k~140 top_k inside the while_loop (RESULTS.md).
_SORT_SELECT_K = 8


def _kth_smallest(values: jax.Array, k: int) -> jax.Array:
    """Exact k-th smallest value (1-indexed) along the last axis, via 32-step
    binary search on the order-preserving bit pattern of f32 (sign bit
    flipped for positives, all bits for negatives — the IEEE 754 total-order
    trick). Returns (..., 1).

    Replaces `jnp.sort(v)[..., k-1:k]` on the roco decode path: the bitonic
    sort network inside the decode while_loop dominated the budgeted graph's
    compile time (a scanned evict loop at 7B shapes took 21 min to compile
    with the sort vs seconds with this; VERDICT r1 #2), and 32 masked
    reductions are also cheaper to run than a full S·log²S sort.
    NaN-free input assumed (the eviction masks use ±inf-like sentinels,
    which map to the extremes and work fine)."""
    bits = jax.lax.bitcast_convert_type(values.astype(jnp.float32), jnp.uint32)
    flip = jnp.where(bits >> 31 == 1, jnp.uint32(0xFFFFFFFF),
                     jnp.uint32(0x80000000))
    bits = bits ^ flip

    def body(i, prefix):
        cand = prefix | (jnp.uint32(1) << (31 - i))
        cnt = jnp.sum((bits < cand).astype(jnp.int32), axis=-1, keepdims=True)
        return jnp.where(cnt >= k, prefix, cand)

    kth = jax.lax.fori_loop(0, 32, body, jnp.zeros_like(bits[..., :1]))
    flip = jnp.where(kth >> 31 == 0, jnp.uint32(0xFFFFFFFF),
                     jnp.uint32(0x80000000))
    return jax.lax.bitcast_convert_type(kth ^ flip, jnp.float32)


def _smallest_k(
    values: jax.Array, mask: jax.Array, k: int
) -> Tuple[jax.Array, jax.Array]:
    """Indices (and values) of the k smallest `values` where `mask`, per the
    leading batch dims. Ties break toward the lower slot index, matching
    torch.topk/argmin first-occurrence behavior (stable ascending sort has
    the same tie order)."""
    masked = jnp.where(mask, values.astype(jnp.float32), jnp.float32(jnp.inf))
    if k > _SORT_SELECT_K:
        vals, ids = jax.lax.sort_key_val(
            masked,
            jax.lax.broadcasted_iota(jnp.int32, masked.shape, masked.ndim - 1),
            is_stable=True,
        )
        return ids[..., :k].astype(jnp.int32), vals[..., :k]
    neg_vals, ids = jax.lax.top_k(-masked, k)
    return ids.astype(jnp.int32), -neg_vals


def _slots_at_ranks(
    pos: jax.Array, cand: jax.Array, start_rank: jax.Array, k: int
) -> jax.Array:
    """Slots holding the candidates with age-rank start_rank..start_rank+k-1
    (rank 0 = oldest candidate). pos: (B, H, S); start_rank: scalar or (B,).

    Used by recency (evict oldest-after-sink span, reference easykv.py:492)
    and random (evict a uniform rank span, reference easykv.py:494-499)."""
    B, H, S = pos.shape
    sorted_pos = jnp.sort(jnp.where(cand, pos, INT_MAX), axis=-1)  # (B, H, S)
    start = jnp.broadcast_to(jnp.asarray(start_rank, jnp.int32), (B,))
    start = jnp.clip(start, 0, S - k)
    ranks = start[:, None, None] + jnp.arange(k, dtype=jnp.int32)[None, None, :]
    lo = jnp.take_along_axis(sorted_pos, ranks[:, :1, :1].repeat(H, axis=1), axis=-1)
    hi = jnp.take_along_axis(
        sorted_pos, (ranks[:, :1, -1:]).repeat(H, axis=1), axis=-1
    )
    span = cand & (pos >= lo) & (pos <= hi)
    key = (
        span.astype(jnp.int32) * (2 * S)
        - jax.lax.broadcasted_iota(jnp.int32, pos.shape, dimension=2)
    )
    if k > _SORT_SELECT_K:
        # Descending sort of the span key == span slots in ascending slot
        # order first (sort instead of top_k: compile time, see _smallest_k).
        _, ids = jax.lax.sort_key_val(
            -key, jax.lax.broadcasted_iota(jnp.int32, pos.shape, 2), is_stable=True
        )
        return ids[..., :k].astype(jnp.int32)
    _, ids = jax.lax.top_k(key, k)
    # top_k above returns span slots in ascending slot order.
    return ids.astype(jnp.int32)


def select_evictions(
    cache: LayerCache,
    spec: PolicySpec,
    next_pos: jax.Array,       # (B,) position id the next token will get
    prompt_len: jax.Array,     # (B,) prompt length (decode prompt protection)
    rand_rank: jax.Array,      # (B,) pre-drawn rank for the random policy
) -> jax.Array:
    """Select spec.k slots per (B, H) to evict. Returns (B, H, k) int32.

    Called when an eviction is due for at least one batch row (evict_cache
    guards with lax.cond on jnp.any(gate)); rows whose gate is False have
    their results discarded by evict_slots' gating. Scores may contain
    NaN/garbage for such rows (e.g. roco's score/counter with zero
    counters) — ids are always in-range, so gated discard is safe."""
    pos = cache.pos
    B, H, S = pos.shape
    valid = pos >= 0
    npos = next_pos[:, None, None]

    base = valid
    if spec.phase == PHASE_DECODE and spec.protect_prompt:
        base = base & (pos >= prompt_len[:, None, None])

    if spec.policy == "h2o_head":
        cand = base
        if spec.phase == PHASE_ENCODE:
            cand = cand & (pos >= spec.sink_length)
        if spec.phase in (PHASE_DECODE, PHASE_ENCODE, PHASE_ENCDEC_DECODE):
            # decode: easykv.py:311; encode: :463; encdec: :712 — all exclude
            # the newest recent_window slots (encdec h2o is dead code in the
            # reference whitelist but implemented for completeness).
            cand = cand & (pos < npos - spec.recent_window)
        ids, _ = _smallest_k(cache.score, cand, spec.k)
        return ids

    if spec.policy == "tova":
        cand = base
        if spec.phase == PHASE_ENCODE:
            # easykv.py:485: sink + recent window excluded.
            cand = cand & (pos >= spec.sink_length) & (pos < npos - spec.recent_window)
        # decode (easykv.py:335) and encdec decode (:734): plain argmin.
        ids, _ = _smallest_k(cache.score, cand, spec.k)
        return ids

    if spec.policy == "roco":
        # Stage 1: feasible set = lowest-std slots (std guard on the 10 newest
        # and, in encode, the sink; easykv.py:320-322, :471-473, :720-722).
        counter = cache.counter
        mean = cache.score / counter
        var = cache.score_sq / counter - mean * mean
        std = jnp.sqrt(jnp.maximum(var, 0.0))
        # The reference's forced slots all share the same 1e9 value. When
        # feasible_k exceeds the number of unforced slots the reference's
        # behavior is torch.topk's tie order among identical values — which
        # is heap-arbitrary (verified: NOT index order), i.e. the reference
        # is nondeterministic in that regime. It only arises for toy configs
        # (stride < 10 with small budgets; real workloads use stride 24-96).
        # We make it deterministic: encode arrival order into the forced
        # values (position-scaled offsets stay monotone in f32: steps of
        # 1024 exceed the 128-ulp resolution near 2e9), so the OLDEST forced
        # slots fill the remainder of the feasible set.
        forced = pos >= npos - ROCO_STD_GUARD
        if spec.phase == PHASE_ENCODE:
            forced |= pos < spec.sink_length
        force_val = STD_FORCE + pos.astype(jnp.float32) * 1024.0
        std = jnp.where(forced, force_val, std)
        std = jnp.where(base, std, STD_EXCLUDE)
        # Feasible set = spec.feasible_k smallest stds. Rather than gathering
        # the set and running a second top_k (reference easykv.py:322-323),
        # take the k-th smallest std as a threshold and mask — equivalent
        # because the force encoding keeps stds distinct, and cheaper on TPU.
        # The k-th smallest comes from a 32-step bit bisection (_kth_smallest),
        # not a sort or top_k: top_k's TPU lowering scales with k (k~140) and
        # the bitonic sort network blew the budgeted-graph compile up ~25x
        # vs full-cache (VERDICT r1 #2).
        thresh = _kth_smallest(std, spec.feasible_k)
        feasible = std <= thresh
        # Stage 2: lowest time-averaged score within the feasible set
        # (easykv.py:323, :475, :723).
        avg = cache.score / counter
        ids, _ = _smallest_k(avg, feasible, spec.k)
        return ids

    if spec.policy == "recency":
        if spec.phase == PHASE_DECODE:
            # Oldest generated token (easykv.py:343-352 via positions_tensor).
            ids, _ = _smallest_k(pos.astype(jnp.float32), base, spec.k)
            return ids
        # encode / encdec decode: oldest span after the sink
        # (easykv.py:491-493, :741-742).
        start = jnp.full((B,), spec.sink_length, jnp.int32)
        return _slots_at_ranks(pos, valid, start, spec.k)

    if spec.policy == "random":
        if spec.phase == PHASE_DECODE:
            # Uniform over generated tokens (easykv.py:353-362).
            return _slots_at_ranks(pos, base, rand_rank, spec.k)
        if spec.phase == PHASE_ENCODE:
            # Uniform span start over buffer ranks [0, S-k) (easykv.py:494-499;
            # note: the reference does NOT sink-protect random in encode).
            return _slots_at_ranks(pos, valid, rand_rank, spec.k)
        # encdec decode: reference path crashes (easykv.py:744); implement the
        # intent: uniform over non-sink candidates (offset rank by sink).
        start = rand_rank + spec.sink_length
        return _slots_at_ranks(pos, valid, start, spec.k)

    raise ValueError(f"policy {spec.policy!r} does not evict")


def update_scores(
    cache: LayerCache,
    probs_kv: jax.Array,     # (B, Hkv, T, S) f32 from ops.attention.attend
    spec: PolicySpec,
    update_gate: jax.Array,  # scalar or (B,) bool: apply this chunk's update?
    bootstrap: bool = False,
) -> LayerCache:
    """Fold a chunk's attention probabilities into the score sidecars.

    bootstrap=True: prefix-prefill accumulation used for keep_attention
    (reference h2o_head_score, easykv.py:173-186) — always sum + sum-of-
    squares regardless of policy.

    Otherwise per-policy (reference easykv.py:288-300 decode, :443-457
    encode): h2o accumulates mass; roco accumulates mass + squared mass;
    tova overwrites with the last query row (decode: per-head; encode:
    head-mean broadcast, easykv.py:456-457). Padding queries contribute
    zero rows by construction (masked softmax).
    """
    gate_b = row_gate(update_gate)  # bool, broadcastable over (B, Hkv, S)
    gate = gate_b.astype(jnp.float32)
    if bootstrap or spec.policy in ("h2o_head", "roco"):
        delta = jnp.sum(probs_kv, axis=2) * gate
        score = cache.score + delta
        score_sq = cache.score_sq
        if bootstrap or spec.policy == "roco":
            delta_sq = jnp.sum(probs_kv * probs_kv, axis=2) * gate
            score_sq = cache.score_sq + delta_sq
        return cache._replace(score=score, score_sq=score_sq)
    if spec.policy == "tova":
        last = probs_kv[:, :, -1, :]  # (B, Hkv, S)
        if spec.phase == PHASE_ENCODE:
            last = jnp.mean(last, axis=1, keepdims=True)
            last = jnp.broadcast_to(last, cache.score.shape)
        score = jnp.where(gate_b, last, cache.score)
        return cache._replace(score=score)
    return cache  # recency / random / full keep no scores


def row_gate(update_gate: jax.Array) -> jax.Array:
    """Normalize a scalar or per-row (B,) update gate so it broadcasts over
    (B, Hkv, S) score arrays. Per-row gates keep batched strided encoding
    correct when rows trigger on different chunks."""
    if update_gate.ndim == 1:
        return update_gate[:, None, None]
    return update_gate


def update_scores_reduced(
    cache: LayerCache,
    ssum: jax.Array,         # (B, Hkv, S) sum over chunk rows of GQA-mean p
    ssq: jax.Array,          # (B, Hkv, S) sum of squares
    last: jax.Array,         # (B, Hkv, S) last chunk row (GQA-mean p)
    spec: PolicySpec,
    update_gate: jax.Array,
    bootstrap: bool = False,
) -> LayerCache:
    """update_scores for kernels that reduce the probability tensor on-chip
    (ops/pallas/chunk_attention.py, decode kernel) — same semantics, no
    (B, Hkv, C, S) materialization."""
    gate_b = row_gate(update_gate)
    gate = gate_b.astype(jnp.float32)
    if bootstrap or spec.policy in ("h2o_head", "roco"):
        score = cache.score + ssum * gate
        score_sq = cache.score_sq
        if bootstrap or spec.policy == "roco":
            score_sq = cache.score_sq + ssq * gate
        return cache._replace(score=score, score_sq=score_sq)
    if spec.policy == "tova":
        if spec.phase == PHASE_ENCODE:
            last = jnp.broadcast_to(
                jnp.mean(last, axis=1, keepdims=True), cache.score.shape
            )
        score = jnp.where(gate_b, last, cache.score)
        return cache._replace(score=score)
    return cache


def bump_counters(
    cache: LayerCache, amount: float, gate: Optional[jax.Array] = None
) -> LayerCache:
    """Age all slots by `amount` (reference easykv.py:304, :460-461) —
    applied only when an eviction event fires, like the reference.
    gate: optional (B,) bool restricting to live batch rows."""
    delta = jnp.float32(amount)
    if gate is not None:
        delta = delta * gate[:, None, None].astype(jnp.float32)
    return cache._replace(counter=cache.counter + delta)


def evict_layer(
    cache: LayerCache,
    spec: PolicySpec,
    next_pos: jax.Array,    # (B,)
    prompt_len: jax.Array,  # (B,)
    rand_rank: jax.Array,   # (B,)
    gate: jax.Array,        # (B,) bool
) -> LayerCache:
    """One gated eviction event for a single layer's cache — the in-scan
    companion of evict_cache, used by the layer-major strided encode
    (models/llama.strided_encode_layer_major) where each layer processes all
    chunks before the next layer runs. Same order as evict_cache: bump
    counters, select, invalidate; the lax.cond carries only the sidecars
    (eviction never touches K/V data).

    Returns (cache, evict_ids (B, H, k)): the ids are only meaningful for
    rows whose gate fired (zeros otherwise) — the layer-major encode sorts
    them into the next chunk's write slots (cache.write_tokens_at)."""
    B, H, _ = cache.pos.shape

    def do_evict(sc):
        pos, score, score_sq, counter = sc
        lc = LayerCache(k=None, v=None, pos=pos, score=score,
                        score_sq=score_sq, counter=counter,
                        k_scale=None, v_scale=None)
        lc = bump_counters(lc, float(spec.k), gate)
        ids = select_evictions(lc, spec, next_pos, prompt_len, rand_rank)
        lc = evict_slots(lc, ids, gate)
        return (lc.pos, lc.score, lc.score_sq, lc.counter, ids)

    def no_evict(sc):
        pos, score, score_sq, counter = sc
        return (pos, score, score_sq, counter,
                jnp.zeros((B, H, spec.k), jnp.int32))

    sc = (cache.pos, cache.score, cache.score_sq, cache.counter)
    pos, score, score_sq, counter, ids = jax.lax.cond(
        jnp.any(gate), do_evict, no_evict, sc
    )
    return cache._replace(pos=pos, score=score, score_sq=score_sq,
                          counter=counter), ids


def evict_cache(
    cache: KVCache,
    spec: PolicySpec,
    next_pos: jax.Array,    # (B,)
    prompt_len: jax.Array,  # (B,)
    rand_rank: jax.Array,   # (B,)
    gate: jax.Array,        # (B,) bool
) -> KVCache:
    """One eviction event across ALL layers, vectorized by folding the layer
    axis into the batch axis — a single top_k over (L*B, H, S) instead of L
    small ones inside the layer scan (8x faster on v5e at 7B shapes).
    Matches the reference's ordering exactly: forward all layers, update
    scores, then evict every layer's cache (easykv.py:302-362).

    The lax.cond skips the selection sort on non-evicting steps, and its
    operands are ONLY the sidecar arrays: eviction is a pos-invalidate
    (cache.py), so K/V never enter the conditional — routing the multi-GB
    K/V buffers through the cond as pass-throughs adds compile-time risk and
    buys nothing. (r2 bisection note: warm-up wall time through the remote
    TPU compile service varies 8–545 s run-to-run regardless of graph
    structure — AOT phase timing shows the actual XLA compile of this graph
    is ~14 s. An unconditional gated variant was also benched: it compiles
    the same but costs ~3% decode throughput from the every-step sort, so
    the cond stays.)"""
    L, B = cache.pos.shape[:2]
    H, S = cache.pos.shape[2:]

    # Fused Pallas path: bump + select + invalidate in ONE VMEM pass
    # (ops/pallas/sidecar_update.fused_evict) instead of the multi-pass
    # std/threshold/argmin/scatter chain — PHASE_DECODE / k=1 specs only.
    from . import flags as _flags
    from .ops.pallas import sidecar_update as _sk

    use_kernel = (_sk.evict_supported(spec) and _flags.sidecar_enabled()
                  and S % 128 == 0)
    mesh_info = _flags.active_mesh() if use_kernel else None
    if mesh_info is not None:
        mesh = mesh_info[0]
        dsz = mesh.shape.get(mesh_info[1], 1)
        msz = mesh.shape.get(mesh_info[2], 1)
        if B % dsz != 0 or H % msz != 0:
            use_kernel = mesh.size == 1  # uneven shards under a real mesh
            mesh_info = None
        elif mesh.size == 1:
            mesh_info = None  # trivial mesh: call the kernel directly

    if use_kernel:
        interp = _flags.pallas_interpret()

        def do_evict_k(sc):
            pos, score, score_sq, counter = sc
            if mesh_info is not None:
                pos, counter = _sk.fused_evict_sharded(
                    pos, score, score_sq, counter, gate, next_pos,
                    prompt_len, rand_rank, mesh=mesh_info[0],
                    data_axis=mesh_info[1], model_axis=mesh_info[2],
                    spec=spec, interpret=interp,
                )
            else:
                pos, counter = _sk.fused_evict(
                    pos, score, score_sq, counter, gate, next_pos,
                    prompt_len, rand_rank, spec=spec, interpret=interp,
                )
            return (pos, score, score_sq, counter)

        sc = (cache.pos, cache.score, cache.score_sq, cache.counter)
        pos, score, score_sq, counter = jax.lax.cond(
            jnp.any(gate), do_evict_k, lambda s: s, sc
        )
        return cache._replace(pos=pos, score=score, score_sq=score_sq,
                              counter=counter)

    def fold(x):
        return x.reshape((L * B,) + x.shape[2:])

    def unfold(x):
        return x.reshape((L, B) + x.shape[1:])

    tile = lambda v: jnp.tile(v, L)
    gate_t = tile(gate)
    sidecars = (fold(cache.pos), fold(cache.score), fold(cache.score_sq),
                fold(cache.counter))

    def do_evict(sc):
        pos, score, score_sq, counter = sc
        lc = LayerCache(k=None, v=None, pos=pos, score=score,
                        score_sq=score_sq, counter=counter,
                        k_scale=None, v_scale=None)
        lc = bump_counters(lc, float(spec.k), gate_t)
        ids = select_evictions(lc, spec, tile(next_pos), tile(prompt_len),
                               tile(rand_rank))
        lc = evict_slots(lc, ids, gate_t)
        return (lc.pos, lc.score, lc.score_sq, lc.counter)

    pos, score, score_sq, counter = jax.lax.cond(
        jnp.any(gate), do_evict, lambda sc: sc, sidecars
    )
    return cache._replace(pos=unfold(pos), score=unfold(score),
                          score_sq=unfold(score_sq), counter=unfold(counter))
