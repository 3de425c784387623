"""Unit tests for cache primitives not covered by the oracle lockstep suite:
gated merged eviction (reference truncate_kv_cache_liso_mean,
easykv.py:84-102) and free-slot reuse."""
import jax.numpy as jnp
import numpy as np

from easykv_tpu.cache import (
    LayerCache,
    evict_slots,
    evict_slots_merged,
    free_slot_ids,
    write_tokens,
)


def _cache(B=2, H=2, S=8, D=4, seed=0):
    rng = np.random.default_rng(seed)
    k = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, H, S))
    zeros = jnp.zeros((B, H, S), jnp.float32)
    return LayerCache(k=k, v=v, pos=pos, score=zeros, score_sq=zeros,
                      counter=zeros, k_scale=zeros[..., :1], v_scale=zeros[..., :1])


def test_evict_slots_merged_writes_mean_and_keeps_first_pos():
    cl = _cache()
    ids = jnp.asarray(np.tile(np.array([[2, 4, 5]], np.int32), (2, 2, 1)).reshape(2, 2, 3))
    out = evict_slots_merged(cl, ids)
    k_mean = np.mean(np.asarray(cl.k)[:, :, [2, 4, 5]], axis=2)
    np.testing.assert_allclose(np.asarray(out.k)[:, :, 2], k_mean, rtol=1e-6)
    # first evicted slot keeps its position, the rest are invalidated
    assert np.all(np.asarray(out.pos)[:, :, 2] == 2)
    assert np.all(np.asarray(out.pos)[:, :, [4, 5]] == -1)
    # untouched slots unchanged
    np.testing.assert_array_equal(np.asarray(out.k)[:, :, [0, 1, 3, 6, 7]],
                                  np.asarray(cl.k)[:, :, [0, 1, 3, 6, 7]])


def test_evict_slots_merged_gate_false_rows_untouched():
    cl = _cache()
    ids = jnp.asarray(np.tile(np.array([[1, 3]], np.int32), (2, 2, 1)).reshape(2, 2, 2))
    gate = jnp.asarray([True, False])
    out = evict_slots_merged(cl, ids, gate)
    # gated-off row is bit-identical to the input
    for a, b in zip(out, cl):
        if a is None:
            continue
        np.testing.assert_array_equal(np.asarray(a)[1], np.asarray(b)[1])
    # gated-on row merged as usual
    k_mean = np.mean(np.asarray(cl.k)[0, :, [1, 3]], axis=0)
    np.testing.assert_allclose(np.asarray(out.k)[0, :, 1], k_mean, rtol=1e-6)
    assert np.all(np.asarray(out.pos)[0, :, 1] == 1)
    assert np.all(np.asarray(out.pos)[0, :, 3] == -1)


def test_free_slots_refill_after_merged_evict():
    cl = _cache(B=1, H=1)
    ids = jnp.asarray([[[2, 4, 5]]], jnp.int32)
    out = evict_slots_merged(cl, ids)
    free = np.asarray(free_slot_ids(out.pos, 2))[0, 0]
    np.testing.assert_array_equal(free, [4, 5])
    out2 = write_tokens(out, jnp.ones((1, 1, 2, 4)), jnp.ones((1, 1, 2, 4)),
                        jnp.asarray([[8, 9]], jnp.int32), jnp.zeros((1, 2)))
    assert np.all(np.asarray(out2.pos)[0, 0, [4, 5]] == [8, 9])


def test_evict_slots_gate_false_noop():
    cl = _cache()
    ids = jnp.zeros((2, 2, 3), jnp.int32)
    out = evict_slots(cl, ids, jnp.asarray([False, False]))
    np.testing.assert_array_equal(np.asarray(out.pos), np.asarray(cl.pos))
