"""Static-shape budgeted KV cache: the TPU-native replacement for the
reference's dynamic-shape `past_key_values` tuple surgery
(reference easykv/easykv.py:56-112, truncate_kv_cache_*).

Design (SURVEY.md §7):
  * K/V live in fixed-size buffers `(L, B, H_kv, S, D)`; a slot is valid iff
    its `pos` sidecar is >= 0.
  * "Eviction" = set pos[slot] = -1 (no data movement). "Insertion" = scatter
    the new tokens into the lowest-index invalid slots.
  * Because token position ids are strictly increasing and never reused, the
    reference's buffer-order semantics map to elementwise position tests:
      - last-m buffer slots ("recent window", reference easykv.py:309-311)
          <=> pos >= next_pos - m
      - attention sink = first temp_length slots (reference easykv.py:463)
          <=> pos < sink_length
      - oldest non-sink (recency, reference easykv.py:492)
          <=> masked argmin of pos
  * Score sidecars (cumulative attention mass, squared mass, observation
    counter — reference easykv.py:242-247) are per-(layer, head, slot) and are
    reset at insertion time, which is equivalent to the reference's
    compact-and-append-zeros (reference easykv.py:318, 468).

Per-(layer, head) eviction independence (reference truncate_kv_cache_silo,
easykv.py:56-68) is just a batched gather/scatter here — every head owns its
own slot<->token mapping via its own `pos` row.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

BIG = jnp.float32(1e9)
INF = jnp.float32(3e38)


class KVCache(NamedTuple):
    """Stacked over layers; scanned over axis 0 by the model.

    k, v:      (L, B, H_kv, S, D)   compute dtype, or int8 (quantized KV)
    pos:       (L, B, H_kv, S) int32   original token position; -1 = invalid
    score:     (L, B, H_kv, S) f32     cumulative attention mass
    score_sq:  (L, B, H_kv, S) f32     cumulative squared attention mass
    counter:   (L, B, H_kv, S) f32     per-slot observation counter
    k_scale:   (L, B, H_kv, S) f32     per-slot dequant scales (int8 KV);
    v_scale:                           (L, B, H_kv, 1) dummies otherwise
    """

    k: jax.Array
    v: jax.Array
    pos: jax.Array
    score: jax.Array
    score_sq: jax.Array
    counter: jax.Array
    k_scale: Optional[jax.Array] = None
    v_scale: Optional[jax.Array] = None

    @property
    def num_slots(self) -> int:
        return self.k.shape[-2]

    def layer_count(self) -> int:
        return self.k.shape[0]


class LayerCache(NamedTuple):
    """One layer's slice of a KVCache, as carried through the layer scan."""

    k: jax.Array          # (B, H, S, D)
    v: jax.Array          # (B, H, S, D)
    pos: jax.Array        # (B, H, S)
    score: jax.Array      # (B, H, S)
    score_sq: jax.Array   # (B, H, S)
    counter: jax.Array    # (B, H, S)
    k_scale: Optional[jax.Array] = None  # (B, H, S) f32 or (B, H, 1) dummy
    v_scale: Optional[jax.Array] = None

    @property
    def quantized(self) -> bool:
        return self.k.dtype == jnp.int8

    @property
    def valid(self) -> jax.Array:
        return self.pos >= 0

    def length(self) -> jax.Array:
        """(B,) number of valid slots (identical across heads by construction;
        head 0 is representative)."""
        return jnp.sum(self.valid[:, 0, :].astype(jnp.int32), axis=-1)


def init_cache(
    num_layers: int,
    batch: int,
    num_kv_heads: int,
    num_slots: int,
    head_dim: int,
    dtype=jnp.bfloat16,
    quantized: bool = False,
) -> KVCache:
    """quantized=True stores K/V as int8 with per-slot dequant scales —
    halves KV HBM traffic and capacity (the "compressed-KV" mode)."""
    shape = (num_layers, batch, num_kv_heads, num_slots)
    kv_dtype = jnp.int8 if quantized else dtype
    scale_shape = shape if quantized else shape[:-1] + (1,)
    return KVCache(
        k=jnp.zeros(shape + (head_dim,), dtype=kv_dtype),
        v=jnp.zeros(shape + (head_dim,), dtype=kv_dtype),
        pos=jnp.full(shape, -1, dtype=jnp.int32),
        score=jnp.zeros(shape, dtype=jnp.float32),
        score_sq=jnp.zeros(shape, dtype=jnp.float32),
        counter=jnp.zeros(shape, dtype=jnp.float32),
        k_scale=jnp.zeros(scale_shape, dtype=jnp.float32),
        v_scale=jnp.zeros(scale_shape, dtype=jnp.float32),
    )


def quantize_kv(x: jax.Array):
    """Per-(slot) symmetric int8 quantization over the head dim.
    x: (B, H, C, D) -> (int8 (B, H, C, D), scale f32 (B, H, C))."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    # explicit reciprocal multiply: XLA strength-reduces /127.0 to *(1/127)
    # in some fusion contexts but not others; writing the multiply keeps the
    # scale bit-identical between this path and the fused Pallas kernel
    # (ops/pallas/chunk_attention._wa_kernel), which quantizes in-kernel.
    scale = jnp.maximum(amax, 1e-8) * jnp.float32(1.0 / 127.0)
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def kv_dequant(cache: LayerCache, dtype):
    """(k, v) in compute dtype, dequantizing if the cache is int8."""
    if cache.quantized:
        k = cache.k.astype(dtype) * cache.k_scale[..., None].astype(dtype)
        v = cache.v.astype(dtype) * cache.v_scale[..., None].astype(dtype)
        return k, v
    return cache.k, cache.v


def free_slot_ids(pos: jax.Array, count: int) -> jax.Array:
    """Per (B, H): indices of the `count` lowest-index invalid slots.

    pos: (B, H, S) -> (B, H, count) int32.

    Replaces the reference's implicit "append at the end of the compacted
    buffer" (reference easykv.py:66-67): after an eviction invalidates k slots,
    the next insertion fills exactly those slots.
    """
    S = pos.shape[-1]
    slot_idx = jax.lax.broadcasted_iota(jnp.int32, pos.shape, dimension=pos.ndim - 1)
    # Invalid slots get a large positive key, minus the slot index so that
    # lower indices sort first; valid slots sort last.
    sort_key = jnp.where(pos < 0, 2 * S - slot_idx, 0)
    if count > 8:
        # Sort instead of top_k for large counts: TPU top_k lowering (and
        # compile time) scales with k, a bitonic sort is a fixed network.
        _, ids = jax.lax.sort_key_val(-sort_key, slot_idx, is_stable=True)
        return ids[..., :count].astype(jnp.int32)
    _, ids = jax.lax.top_k(sort_key, count)
    return ids.astype(jnp.int32)


def write_tokens(
    cache: LayerCache,
    new_k: jax.Array,        # (B, H, C, D) post-RoPE (pre-RoPE in streaming mode)
    new_v: jax.Array,        # (B, H, C, D)
    new_pos: jax.Array,      # (B, C) int32 position ids of the incoming tokens
    counter_init: jax.Array,  # (B, C) f32 initial observation counter
    token_valid: Optional[jax.Array] = None,  # (B, C) bool; False = padding
) -> LayerCache:
    """Insert C tokens into the lowest-index free slots of each (B, H).

    Padding tokens (token_valid False) are written with pos = -1, i.e. the
    slot stays invalid and the garbage K/V is masked out of attention.
    Score sidecars of the written slots are reset (the reference appends
    zero-initialized score columns after compaction, easykv.py:318, 468-469).
    """
    B, H, C, _ = new_k.shape
    ids = free_slot_ids(cache.pos, C)  # (B, H, C)
    if token_valid is not None:
        # Map VALID tokens onto the lowest-index free slots regardless of
        # their column (a merged serving tick carries a decode row's token in
        # the last column; without this it would take the C-th "free" slot,
        # which may be a live one when the ring is nearly full). Padding
        # columns get the remaining ids and write no-ops.
        tv_i = token_valid.astype(jnp.int32)
        rank_v = jnp.cumsum(tv_i, axis=1) - 1
        n_valid = jnp.sum(tv_i, axis=1, keepdims=True)
        rank_p = jnp.cumsum(1 - tv_i, axis=1) - 1
        order = jnp.where(token_valid, rank_v, n_valid + rank_p)  # (B, C)
        ids = jnp.take_along_axis(
            ids, jnp.broadcast_to(order[:, None, :], (B, H, C)), axis=2
        )
    b_ix = jnp.arange(B)[:, None, None]
    h_ix = jnp.arange(H)[None, :, None]

    if cache.quantized:
        new_k, k_sc = quantize_kv(new_k)
        new_v, v_sc = quantize_kv(new_v)
    else:
        new_k = new_k.astype(cache.k.dtype)
        new_v = new_v.astype(cache.v.dtype)

    if token_valid is None:
        pos_write = jnp.broadcast_to(new_pos[:, None, :], (B, H, C))
        cnt_write = jnp.broadcast_to(counter_init[:, None, :], (B, H, C))
        k_write, v_write = new_k, new_v
        zeros = jnp.zeros((B, H, C), jnp.float32)
        score_write = score_sq_write = zeros
        if cache.quantized:
            k_sc_write, v_sc_write = k_sc, v_sc
    else:
        # Masked (padding) entries must leave the slot untouched — a batch row
        # may have fewer free slots than C (e.g. an active serving slot during
        # another request's masked prefill), in which case free_slot_ids falls
        # back to valid slots and an unconditional write would destroy them.
        tv = token_valid[:, None, :]  # (B, 1, C)
        cur = lambda arr: jnp.take_along_axis(arr, ids, axis=2)
        pos_write = jnp.where(tv, new_pos[:, None, :], cur(cache.pos))
        cnt_write = jnp.where(tv, counter_init[:, None, :], cur(cache.counter))
        tvd = tv[..., None]
        k_write = jnp.where(tvd, new_k, jnp.take_along_axis(cache.k, ids[..., None], axis=2))
        v_write = jnp.where(tvd, new_v, jnp.take_along_axis(cache.v, ids[..., None], axis=2))
        tvf = tv.astype(jnp.float32)
        score_write = (1.0 - tvf) * cur(cache.score)
        score_sq_write = (1.0 - tvf) * cur(cache.score_sq)
        if cache.quantized:
            k_sc_write = jnp.where(tv, k_sc, cur(cache.k_scale))
            v_sc_write = jnp.where(tv, v_sc, cur(cache.v_scale))

    k_scale, v_scale = cache.k_scale, cache.v_scale
    if cache.quantized:
        k_scale = k_scale.at[b_ix, h_ix, ids].set(k_sc_write)
        v_scale = v_scale.at[b_ix, h_ix, ids].set(v_sc_write)
    return LayerCache(
        k=cache.k.at[b_ix, h_ix, ids].set(k_write),
        v=cache.v.at[b_ix, h_ix, ids].set(v_write),
        pos=cache.pos.at[b_ix, h_ix, ids].set(pos_write),
        score=cache.score.at[b_ix, h_ix, ids].set(score_write),
        score_sq=cache.score_sq.at[b_ix, h_ix, ids].set(score_sq_write),
        counter=cache.counter.at[b_ix, h_ix, ids].set(cnt_write),
        k_scale=k_scale,
        v_scale=v_scale,
    )


def write_tokens_at(
    cache: LayerCache,
    new_k: jax.Array,        # (B, H, C, D)
    new_v: jax.Array,        # (B, H, C, D)
    new_pos: jax.Array,      # (B, C) int32
    counter_init: jax.Array,  # (B, C) f32
    ids: jax.Array,          # (B, H, C) int32 target slots, per head
) -> LayerCache:
    """write_tokens with caller-provided target slots (all tokens valid).

    The layer-major strided encode knows its free slots without searching:
    writes are contiguous until the cache saturates, and afterwards each
    chunk fills exactly the slots the previous eviction invalidated — so the
    per-chunk free_slot_ids sort over (B, H, S) (the dominant encode cost,
    RESULTS.md encode decomposition) is replaced by carrying the evicted ids
    into the next chunk. Identical result to write_tokens when `ids` equals
    free_slot_ids(cache.pos, C) — asserted by tests/test_layer_major.py's
    slot-exact parity."""
    B, H, C, _ = new_k.shape
    b_ix = jnp.arange(B)[:, None, None]
    h_ix = jnp.arange(H)[None, :, None]
    if cache.quantized:
        new_k, k_sc = quantize_kv(new_k)
        new_v, v_sc = quantize_kv(new_v)
    else:
        new_k = new_k.astype(cache.k.dtype)
        new_v = new_v.astype(cache.v.dtype)
    k_scale, v_scale = cache.k_scale, cache.v_scale
    if cache.quantized:
        k_scale = k_scale.at[b_ix, h_ix, ids].set(k_sc)
        v_scale = v_scale.at[b_ix, h_ix, ids].set(v_sc)
    zeros = jnp.zeros((B, H, C), jnp.float32)
    return LayerCache(
        k=cache.k.at[b_ix, h_ix, ids].set(new_k),
        v=cache.v.at[b_ix, h_ix, ids].set(new_v),
        pos=cache.pos.at[b_ix, h_ix, ids].set(
            jnp.broadcast_to(new_pos[:, None, :], (B, H, C))
        ),
        score=cache.score.at[b_ix, h_ix, ids].set(zeros),
        score_sq=cache.score_sq.at[b_ix, h_ix, ids].set(zeros),
        counter=cache.counter.at[b_ix, h_ix, ids].set(
            jnp.broadcast_to(counter_init[:, None, :], (B, H, C))
        ),
        k_scale=k_scale,
        v_scale=v_scale,
    )


def write_tokens_dense(
    cache: LayerCache,
    new_k: jax.Array,        # (B, H, C, D)
    new_v: jax.Array,        # (B, H, C, D)
    new_pos: jax.Array,      # (B, C) int32
    counter_init: jax.Array,  # (B, C) f32
    ids: jax.Array,          # (B, H, C) int32 target slots, per head
) -> LayerCache:
    """write_tokens_at with the K/V scatter replaced by a one-hot MXU
    contraction and the (S,) sidecar scatters collapsed into one stacked
    scatter.

    XLA lowers a TPU scatter to a serialized per-index loop; at 7B
    layer-major encode shapes the 8 scatters of write_tokens_at cost
    ~0.6 ms per chunk-layer iteration — 70% of the strided phase
    (RESULTS.md "strided-encode ablation"). Here K/V ride a
    (S,C)@(C,D) dot with a 0/1 matrix: exact, because each output row is
    a single input row (int8 values <= 127 and bf16 cache values are
    reproduced bit-exactly through a bf16-multiply/f32-accumulate dot;
    f32 caches use an f32 dot). Sidecar vectors keep a real scatter for
    bit-exact f32 scales, but all six (pos/counter/score/score_sq/
    k_scale/v_scale) go in ONE op via an f32 stack (pos < 2^24 is exact
    in f32).

    Result is identical to write_tokens_at (asserted by
    tests/test_cache_ops.py::test_write_tokens_dense_matches_at)."""
    B, H, C, D = new_k.shape
    S = cache.pos.shape[-1]
    if cache.quantized:
        qk, k_sc = quantize_kv(new_k)
        qv, v_sc = quantize_kv(new_v)
    else:
        qk = new_k.astype(cache.k.dtype)
        qv = new_v.astype(cache.v.dtype)

    mdt = jnp.float32 if cache.k.dtype == jnp.float32 else jnp.bfloat16
    iota = jnp.arange(S, dtype=jnp.int32)
    eq = (ids[..., None] == iota).astype(mdt)            # (B, H, C, S)
    wmask = jnp.max(eq, axis=2) > 0                      # (B, H, S)

    def spread(vals):  # (B, H, C, D) -> (B, H, S, D), exact one-hot pick
        out = jnp.einsum("bhcs,bhcd->bhsd", eq, vals.astype(mdt),
                         preferred_element_type=jnp.float32)
        return out.astype(cache.k.dtype)

    k_new = jnp.where(wmask[..., None], spread(qk), cache.k)
    v_new = jnp.where(wmask[..., None], spread(qv), cache.v)

    # one stacked scatter for every (S,) sidecar
    pos_bc = jnp.broadcast_to(new_pos[:, None, :], (B, H, C))
    cnt_bc = jnp.broadcast_to(counter_init[:, None, :], (B, H, C))
    zeros = jnp.zeros((B, H, C), jnp.float32)
    planes = [pos_bc.astype(jnp.float32), cnt_bc, zeros, zeros]
    tgts = [cache.pos.astype(jnp.float32), cache.counter, cache.score,
            cache.score_sq]
    if cache.quantized:
        planes += [k_sc, v_sc]
        tgts += [cache.k_scale, cache.v_scale]
    n = len(planes)
    stacked = jnp.stack(tgts, axis=2)                    # (B, H, n, S)
    vals = jnp.stack(planes, axis=2)                     # (B, H, n, C)
    b_ix = jnp.arange(B)[:, None, None, None]
    h_ix = jnp.arange(H)[None, :, None, None]
    n_ix = jnp.arange(n)[None, None, :, None]
    stacked = stacked.at[b_ix, h_ix, n_ix, ids[:, :, None, :]].set(vals)
    k_scale, v_scale = cache.k_scale, cache.v_scale
    if cache.quantized:
        k_scale, v_scale = stacked[:, :, 4], stacked[:, :, 5]
    return LayerCache(
        k=k_new, v=v_new,
        pos=stacked[:, :, 0].astype(jnp.int32),
        score=stacked[:, :, 2],
        score_sq=stacked[:, :, 3],
        counter=stacked[:, :, 1],
        k_scale=k_scale, v_scale=v_scale,
    )


def write_tokens_slice(
    cache: LayerCache,
    new_k: jax.Array,        # (B, H, C, D)
    new_v: jax.Array,        # (B, H, C, D)
    new_pos: jax.Array,      # (B, C) int32
    counter_init: jax.Array,  # (B, C) f32
    start,                   # scalar int32: slot offset, same for all (B, H)
) -> LayerCache:
    """write_tokens_at for the contiguous case: all heads write slots
    [start, start+C), so every update is a dynamic_update_slice — no
    scatter at all. Used by the layer-major prefill, whose write targets
    are always virgin slots at the chunk offset (token j -> slot j)."""
    B, H, C, _ = new_k.shape
    if cache.quantized:
        qk, k_sc = quantize_kv(new_k)
        qv, v_sc = quantize_kv(new_v)
    else:
        qk = new_k.astype(cache.k.dtype)
        qv = new_v.astype(cache.v.dtype)
    z = jnp.int32(0)
    dus = jax.lax.dynamic_update_slice
    pos_bc = jnp.broadcast_to(new_pos[:, None, :], (B, H, C))
    cnt_bc = jnp.broadcast_to(counter_init[:, None, :], (B, H, C))
    zeros = jnp.zeros((B, H, C), jnp.float32)
    k_scale, v_scale = cache.k_scale, cache.v_scale
    if cache.quantized:
        k_scale = dus(k_scale, k_sc, (z, z, start))
        v_scale = dus(v_scale, v_sc, (z, z, start))
    return LayerCache(
        k=dus(cache.k, qk, (z, z, start, z)),
        v=dus(cache.v, qv, (z, z, start, z)),
        pos=dus(cache.pos, pos_bc, (z, z, start)),
        score=dus(cache.score, zeros, (z, z, start)),
        score_sq=dus(cache.score_sq, zeros, (z, z, start)),
        counter=dus(cache.counter, cnt_bc, (z, z, start)),
        k_scale=k_scale, v_scale=v_scale,
    )


def evict_slots(
    cache: LayerCache, evict_ids: jax.Array, gate: Optional[jax.Array] = None
) -> LayerCache:
    """Invalidate per-(B, H) slots. evict_ids: (B, H, k) int32; gate: (B,)
    bool — rows with gate False are untouched (e.g. finished batch rows).

    Equivalent to the reference's per-head gather-compaction
    (truncate_kv_cache_silo / _liso, reference easykv.py:56-82) — the K/V data
    stays in place, only the validity changes, and the freed slots are reused
    by the next write_tokens.
    """
    B, H, _ = evict_ids.shape
    b_ix = jnp.arange(B)[:, None, None]
    h_ix = jnp.arange(H)[None, :, None]
    if gate is None:
        new_vals = jnp.full(evict_ids.shape, -1, cache.pos.dtype)
    else:
        current = jnp.take_along_axis(cache.pos, evict_ids, axis=-1)
        new_vals = jnp.where(gate[:, None, None], -1, current)
    return cache._replace(pos=cache.pos.at[b_ix, h_ix, evict_ids].set(new_vals))


def evict_slots_merged(
    cache: LayerCache, evict_ids: jax.Array, gate: Optional[jax.Array] = None
) -> LayerCache:
    """Evict-with-merge: replace the evicted slots by a single slot holding
    their mean K/V (the reference's unused truncate_kv_cache_liso_mean,
    easykv.py:84-102). The merged vector lands in the first evicted slot
    (keeping its position id); the remaining k-1 slots are invalidated.

    Only supported for unquantized caches."""
    assert not cache.quantized, "merged eviction requires an fp cache"
    B, H, kk = evict_ids.shape
    b_ix = jnp.arange(B)[:, None, None]
    h_ix = jnp.arange(H)[None, :, None]
    k_ev = jnp.take_along_axis(cache.k, evict_ids[..., None], axis=2)  # (B,H,k,D)
    v_ev = jnp.take_along_axis(cache.v, evict_ids[..., None], axis=2)
    k_mean = jnp.mean(k_ev.astype(jnp.float32), axis=2).astype(cache.k.dtype)
    v_mean = jnp.mean(v_ev.astype(jnp.float32), axis=2).astype(cache.v.dtype)
    # invalidate all evicted slots, then revive the first with the mean.
    # (The reference appends the merged vector at the buffer end,
    # easykv.py:96-99; with slot semantics the merged vector instead keeps
    # the first evicted slot and its position id — recency ordering of the
    # merged entry therefore follows the evicted span, not "most recent".)
    out = evict_slots(cache, evict_ids, gate)
    first = evict_ids[:, :, :1]
    pos_first = jnp.take_along_axis(cache.pos, first, axis=-1)
    k_new = k_mean[:, :, None]
    v_new = v_mean[:, :, None]
    if gate is not None:
        # Rows with gate=False must be left untouched: write back their
        # current pos/K/V instead of the merged values.
        g = gate[:, None, None, None]
        k_cur = jnp.take_along_axis(cache.k, first[..., None], axis=2)
        v_cur = jnp.take_along_axis(cache.v, first[..., None], axis=2)
        k_new = jnp.where(g, k_new, k_cur)
        v_new = jnp.where(g, v_new, v_cur)
    return out._replace(
        k=out.k.at[b_ix, h_ix, first].set(k_new),
        v=out.v.at[b_ix, h_ix, first].set(v_new),
        pos=out.pos.at[b_ix, h_ix, first].set(pos_first),
    )


def stack_layer(cache_layers: LayerCache) -> KVCache:
    """LayerCache whose arrays already carry a leading L axis -> KVCache."""
    return KVCache(*cache_layers)


def layer_slice(cache: KVCache) -> LayerCache:
    """KVCache leaves -> LayerCache leaves (for use as lax.scan xs)."""
    return LayerCache(*cache)
