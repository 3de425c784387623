"""Fused chunk attention kernel (flash + score reduction) parity vs the XLA
attention path, interpret mode."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from easykv_tpu.ops.attention import attend
from easykv_tpu.ops.pallas.chunk_attention import fused_chunk_attend


@pytest.mark.parametrize("rep,C,S", [(1, 8, 40), (2, 16, 130), (4, 8, 520)])
def test_fused_chunk_attend_matches_xla(rep, C, S):
    B, Hkv, D = 2, 2, 128
    Hq = Hkv * rep
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, Hq, C, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    pos = rng.integers(0, 60, size=(B, Hkv, S)).astype(np.int32)
    pos[:, :, ::7] = -1
    kv_pos = jnp.asarray(pos)
    # chunk positions: consecutive, the newest in the buffer
    q_pos = jnp.broadcast_to(
        60 + jnp.arange(C, dtype=jnp.int32)[None, :], (B, C)
    )
    # also write the chunk's own keys into some slots (intra-chunk causality)
    pos2 = pos.copy()
    pos2[:, :, :C] = 60 + np.arange(C)
    kv_pos = jnp.asarray(pos2)

    ref_out, ref_probs = attend(q, k, v, kv_pos, q_pos)
    ref_ssum = np.asarray(jnp.sum(ref_probs, axis=2))
    ref_ssq = np.asarray(jnp.sum(ref_probs**2, axis=2))
    ref_last = np.asarray(ref_probs[:, :, -1, :])

    out, ssum, ssq, last = fused_chunk_attend(
        q, k, v, kv_pos, q_pos, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ssum), ref_ssum, atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ssq), ref_ssq, atol=1e-6, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(last), ref_last, atol=1e-6, rtol=1e-4)


def test_padding_queries_zero():
    B, Hkv, rep, C, S, D = 1, 1, 1, 8, 32, 128
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(B, Hkv * rep, C, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    pos = np.full((B, Hkv, S), -1, np.int32)
    pos[:, :, :10] = np.arange(10)
    q_pos = np.full((B, C), -1, np.int32)
    q_pos[0, :4] = [10, 11, 12, 13]
    pos[:, :, 10:14] = [10, 11, 12, 13]
    out, ssum, ssq, last = fused_chunk_attend(
        q, jnp.asarray(k), jnp.asarray(v), jnp.asarray(pos),
        jnp.asarray(q_pos), interpret=True,
    )
    # padding query rows (q_pos == -1) contribute nothing
    ref_out, ref_probs = attend(q, k, v, jnp.asarray(pos), jnp.asarray(q_pos))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(ssum), np.asarray(jnp.sum(ref_probs, axis=2)),
        atol=1e-5, rtol=1e-4,
    )


def test_onepass_matches_twopass_flash(monkeypatch):
    """The 1-pass (whole-logits-in-VMEM) and 2-pass flash variants must
    agree bit-tightly; force the 2-pass by shrinking the VMEM cap."""
    import easykv_tpu.ops.pallas.chunk_attention as ca

    B, Hkv, rep, C, S, D = 1, 2, 2, 16, 600, 128
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(B, Hkv * rep, C, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    pos = rng.integers(0, 500, size=(B, Hkv, S)).astype(np.int32)
    pos[:, :, ::5] = -1
    q_pos = jnp.broadcast_to(
        500 + jnp.arange(C, dtype=jnp.int32)[None, :], (B, C)
    )
    one = fused_chunk_attend(q, k, v, jnp.asarray(pos), q_pos, interpret=True)
    monkeypatch.setattr(ca, "_ONEPASS_VMEM_CAP", 0)
    two = ca.fused_chunk_attend.__wrapped__(  # bypass jit cache (static flag)
        q, k, v, jnp.asarray(pos), q_pos, interpret=True, need_scores=True
    )
    for a, b in zip(one, two):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("rep,C,S", [(1, 8, 40), (2, 8, 520)])
def test_fused_chunk_attend_int8_kv(rep, C, S):
    """int8-KV path: dequant folded into logits/pV must match the XLA path
    over the materialized dequantized cache (both 1-pass and flash tiles)."""
    from easykv_tpu.cache import quantize_kv

    B, Hkv, D = 1, 2, 128
    Hq = Hkv * rep
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(B, Hq, C, D)), jnp.float32)
    k_f = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    v_f = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    kq, ks = quantize_kv(k_f)
    vq, vs = quantize_kv(v_f)
    pos = rng.integers(0, 60, size=(B, Hkv, S)).astype(np.int32)
    pos[:, :, ::5] = -1
    pos[:, :, :C] = 60 + np.arange(C)
    kv_pos = jnp.asarray(pos)
    q_pos = jnp.broadcast_to(
        60 + jnp.arange(C, dtype=jnp.int32)[None, :], (B, C)
    )

    k_deq = kq.astype(jnp.float32) * ks[..., None]
    v_deq = vq.astype(jnp.float32) * vs[..., None]
    ref_out, ref_probs = attend(q, k_deq, v_deq, kv_pos, q_pos)
    out, ssum, ssq, last = fused_chunk_attend(
        q, kq, vq, kv_pos, q_pos, k_scale=ks, v_scale=vs, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ssum),
                               np.asarray(jnp.sum(ref_probs, axis=2)),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ssq),
                               np.asarray(jnp.sum(ref_probs**2, axis=2)),
                               atol=1e-6, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(last),
                               np.asarray(ref_probs[:, :, -1, :]),
                               atol=1e-6, rtol=1e-4)


def test_fused_chunk_attend_int8_kv_flash_path(monkeypatch):
    """Same parity with the 2-pass flash variant forced (1-pass cap at 0)."""
    import easykv_tpu.ops.pallas.chunk_attention as ca
    from easykv_tpu.cache import quantize_kv

    monkeypatch.setattr(ca, "_ONEPASS_VMEM_CAP", 0)
    B, Hkv, rep, C, S, D = 1, 2, 2, 8, 520, 128
    Hq = Hkv * rep
    rng = np.random.default_rng(9)
    q = jnp.asarray(rng.normal(size=(B, Hq, C, D)), jnp.float32)
    kq, ks = quantize_kv(jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32))
    vq, vs = quantize_kv(jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32))
    pos = rng.integers(0, 60, size=(B, Hkv, S)).astype(np.int32)
    pos[:, :, ::5] = -1
    pos[:, :, :C] = 60 + np.arange(C)
    kv_pos = jnp.asarray(pos)
    q_pos = jnp.broadcast_to(60 + jnp.arange(C, dtype=jnp.int32)[None, :], (B, C))

    k_deq = kq.astype(jnp.float32) * ks[..., None]
    v_deq = vq.astype(jnp.float32) * vs[..., None]
    ref_out, ref_probs = attend(q, k_deq, v_deq, kv_pos, q_pos)
    out, ssum, ssq, last = ca.fused_chunk_attend.__wrapped__(
        q, kq, vq, kv_pos, q_pos, k_scale=ks, v_scale=vs, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ssum),
                               np.asarray(jnp.sum(ref_probs, axis=2)),
                               atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("need_scores", [True, False])
def test_fused_chunk_attend_sharded_matches_local(need_scores):
    """shard_map wrap on a (2, 4) CPU mesh == direct kernel call (int8 KV)."""
    from easykv_tpu.cache import quantize_kv
    from easykv_tpu.config import MeshConfig
    from easykv_tpu.ops.pallas.chunk_attention import (
        fused_chunk_attend_sharded,
    )
    from easykv_tpu.parallel import make_mesh

    mesh = make_mesh(MeshConfig(data=2, model=4))
    B, Hkv, rep, C, S, D = 2, 4, 2, 8, 48, 128
    Hq = Hkv * rep
    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.normal(size=(B, Hq, C, D)), jnp.float32)
    kq, ks = quantize_kv(jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32))
    vq, vs = quantize_kv(jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32))
    pos = rng.integers(0, 60, size=(B, Hkv, S)).astype(np.int32)
    pos[:, :, ::5] = -1
    pos[:, :, :C] = 60 + np.arange(C)
    kv_pos = jnp.asarray(pos)
    q_pos = jnp.broadcast_to(60 + jnp.arange(C, dtype=jnp.int32)[None, :], (B, C))

    # q must group KV-head-major for the model-axis shard to be self-contained
    ref = fused_chunk_attend(q, kq, vq, kv_pos, q_pos, k_scale=ks, v_scale=vs,
                             interpret=True, need_scores=need_scores)
    got = fused_chunk_attend_sharded(
        q, kq, vq, kv_pos, q_pos, k_scale=ks, v_scale=vs, mesh=mesh,
        interpret=True, need_scores=need_scores,
    )
    for r, g in zip(ref, got):
        if r is None:
            assert g is None
            continue
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("quantized", [True, False])
def test_fused_write_attend_matches_write_then_attend(quantized):
    """fused_chunk_write_attend == write_tokens_dense + fused_chunk_attend,
    bit-exact on CPU interpret (cache arrays AND attention outputs)."""
    from easykv_tpu.cache import LayerCache, quantize_kv, write_tokens_dense
    from easykv_tpu.ops.pallas.chunk_attention import (
        fused_chunk_attend,
        fused_chunk_write_attend,
    )

    B, Hkv, rep, C, S, D = 2, 3, 2, 8, 128, 64
    Hq = Hkv * rep
    rng = np.random.default_rng(21)
    kf = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    vf = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    if quantized:
        k, ks = quantize_kv(kf)
        v, vs = quantize_kv(vf)
    else:
        k, v = kf, vf
        ks = vs = jnp.zeros((B, Hkv, 1), jnp.float32)
    pos = rng.integers(0, 50, size=(B, Hkv, S)).astype(np.int32)
    pos[:, :, ::3] = -1
    f3 = lambda: jnp.asarray(
        np.abs(rng.normal(size=(B, Hkv, S))).astype(np.float32))
    cl = LayerCache(k=k, v=v, pos=jnp.asarray(pos), score=f3(),
                    score_sq=f3(), counter=f3(), k_scale=ks, v_scale=vs)

    q = jnp.asarray(rng.normal(size=(B, Hq, C, D)), jnp.float32)
    k_c = jnp.asarray(rng.normal(size=(B, Hkv, C, D)), jnp.float32)
    v_c = jnp.asarray(rng.normal(size=(B, Hkv, C, D)), jnp.float32)
    q_pos = jnp.broadcast_to(50 + jnp.arange(C, dtype=jnp.int32)[None], (B, C))
    cinit = jnp.asarray(np.abs(rng.normal(size=(B, C))).astype(np.float32))
    ids = np.stack([rng.choice(S, size=C, replace=False)
                    for _ in range(B * Hkv)]).reshape(B, Hkv, C).astype(
                        np.int32)
    ids = jnp.asarray(ids)

    ref_cl = write_tokens_dense(cl, k_c, v_c, q_pos, cinit, ids)
    ref = fused_chunk_attend(
        q, ref_cl.k, ref_cl.v, ref_cl.pos, q_pos,
        k_scale=ref_cl.k_scale if quantized else None,
        v_scale=ref_cl.v_scale if quantized else None,
        interpret=True, need_scores=True)

    got = fused_chunk_write_attend(
        q, k_c, v_c, ids, q_pos, cinit,
        cl.k, cl.v, cl.pos, cl.score, cl.score_sq, cl.counter,
        k_scale=cl.k_scale if quantized else None,
        v_scale=cl.v_scale if quantized else None,
        interpret=True, need_scores=True)
    out, ssum, ssq, last = got[:4]
    cache_arrs = got[4]

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref[0]),
                               atol=2e-6, rtol=1e-5)
    for g, r in zip((ssum, ssq, last), ref[1:]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=2e-6, rtol=1e-5)
    names = ["k", "v", "pos", "score", "score_sq", "counter"] + (
        ["k_scale", "v_scale"] if quantized else [])
    for name, g in zip(names, cache_arrs):
        np.testing.assert_array_equal(np.asarray(g),
                                      np.asarray(getattr(ref_cl, name)),
                                      err_msg=name)


def test_fused_write_attend_sharded_matches_local():
    from easykv_tpu.cache import LayerCache, quantize_kv
    from easykv_tpu.config import MeshConfig
    from easykv_tpu.ops.pallas.chunk_attention import (
        fused_chunk_write_attend,
        fused_chunk_write_attend_sharded,
    )
    from easykv_tpu.parallel import make_mesh

    mesh = make_mesh(MeshConfig(data=2, model=4))
    B, Hkv, rep, C, S, D = 2, 4, 2, 8, 128, 64
    Hq = Hkv * rep
    rng = np.random.default_rng(31)
    k, ks = quantize_kv(jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32))
    v, vs = quantize_kv(jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32))
    pos = rng.integers(0, 50, size=(B, Hkv, S)).astype(np.int32)
    pos[:, :, ::4] = -1
    f3 = lambda: jnp.asarray(
        np.abs(rng.normal(size=(B, Hkv, S))).astype(np.float32))
    score, ssq0, cnt = f3(), f3(), f3()
    q = jnp.asarray(rng.normal(size=(B, Hq, C, D)), jnp.float32)
    k_c = jnp.asarray(rng.normal(size=(B, Hkv, C, D)), jnp.float32)
    v_c = jnp.asarray(rng.normal(size=(B, Hkv, C, D)), jnp.float32)
    q_pos = jnp.broadcast_to(50 + jnp.arange(C, dtype=jnp.int32)[None], (B, C))
    cinit = jnp.asarray(np.abs(rng.normal(size=(B, C))).astype(np.float32))
    ids = np.stack([rng.choice(S, size=C, replace=False)
                    for _ in range(B * Hkv)]).reshape(B, Hkv, C).astype(np.int32)
    ids = jnp.asarray(ids)

    args = (q, k_c, v_c, ids, q_pos, cinit, k, v, jnp.asarray(pos),
            score, ssq0, cnt)
    ref = fused_chunk_write_attend(*args, k_scale=ks, v_scale=vs,
                                   interpret=True)
    got = fused_chunk_write_attend_sharded(*args, k_scale=ks, v_scale=vs,
                                           mesh=mesh, interpret=True)

    def flat(t):
        return [x for x in jax.tree_util.tree_leaves(t)]

    for g, r in zip(flat(got), flat(ref)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("policy", ["roco", "h2o_head"])
@pytest.mark.parametrize("gates", [(True, True), (True, False),
                                   (False, True)])
@pytest.mark.parametrize("quantized", [True, False])
def test_fused_chunk_step_matches_unfused(policy, gates, quantized):
    """fused_chunk_step == write_tokens_dense + fused_chunk_attend +
    update_scores_reduced + evict_layer, bit-exact on CPU, including the
    eviction CHOICES and the next chunk's write slots."""
    import jax

    from easykv_tpu.cache import LayerCache, quantize_kv, write_tokens_dense
    from easykv_tpu.ops.pallas.chunk_attention import (
        fused_chunk_attend,
        fused_chunk_step,
    )
    from easykv_tpu.policies import (
        PHASE_ENCODE, PolicySpec, evict_layer, update_scores_reduced,
    )

    g_upd, g_evt = gates
    B, Hkv, rep, C, S, D = 2, 3, 2, 8, 128, 64
    Hq = Hkv * rep
    sink, recent = 4, 10
    spec = PolicySpec(policy=policy, phase=PHASE_ENCODE, k=C,
                      sink_length=sink, recent_window=recent,
                      feasible_k=min(S - 1, 40))
    rng = np.random.default_rng(41)
    kf = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    vf = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    if quantized:
        k, ks = quantize_kv(kf)
        v, vs = quantize_kv(vf)
    else:
        k, v = kf, vf
        ks = vs = jnp.zeros((B, Hkv, 1), jnp.float32)
    # a mostly-full cache: positions 0..S-1 with some holes
    pos = np.tile(np.arange(S, dtype=np.int32), (B, Hkv, 1))
    pos[:, :, 17] = -1
    pos[:, :, 63] = -1
    f3 = lambda: jnp.asarray(
        np.abs(rng.normal(size=(B, Hkv, S))).astype(np.float32))
    cnt = jnp.asarray(1.0 + np.abs(rng.normal(size=(B, Hkv, S))).astype(
        np.float32))
    cl = LayerCache(k=k, v=v, pos=jnp.asarray(pos), score=f3(),
                    score_sq=f3(), counter=cnt, k_scale=ks, v_scale=vs)

    q = jnp.asarray(rng.normal(size=(B, Hq, C, D)), jnp.float32)
    k_c = jnp.asarray(rng.normal(size=(B, Hkv, C, D)), jnp.float32)
    v_c = jnp.asarray(rng.normal(size=(B, Hkv, C, D)), jnp.float32)
    q_pos = jnp.broadcast_to(
        S + jnp.arange(C, dtype=jnp.int32)[None], (B, C))
    cinit = jnp.asarray(np.abs(rng.normal(size=(B, C))).astype(np.float32))
    # per-head write slots, sorted ascending (the engine invariant)
    ids = np.stack([np.sort(rng.choice(S, size=C, replace=False))
                    for _ in range(B * Hkv)]).reshape(B, Hkv, C).astype(
                        np.int32)
    idsj = jnp.asarray(ids)
    wm = np.zeros((B, Hkv, S), np.int32)
    np.put_along_axis(wm, ids, 1, axis=-1)
    next_pos = q_pos[:, -1] + 1
    ug = jnp.full((B,), g_upd)
    eg = jnp.full((B,), g_evt)
    nstart = jnp.full((B,), 3, jnp.int32)
    rand_rank = jnp.zeros((B,), jnp.int32)

    # --- unfused reference ---
    rcl = write_tokens_dense(cl, k_c, v_c, q_pos, cinit, idsj)
    out_r, ssum, ssq, last = fused_chunk_attend(
        q, rcl.k, rcl.v, rcl.pos, q_pos,
        k_scale=rcl.k_scale if quantized else None,
        v_scale=rcl.v_scale if quantized else None,
        interpret=True, need_scores=True)
    rcl = update_scores_reduced(rcl, ssum, ssq, last, spec, ug)
    rcl, eids = evict_layer(rcl, spec, next_pos, jnp.zeros((B,), jnp.int32),
                            rand_rank, eg)
    contig = nstart[:, None, None] + jnp.arange(C, dtype=jnp.int32)
    wids_ref = jnp.where(eg[:, None, None], jnp.sort(eids, axis=-1),
                         jnp.broadcast_to(contig, (B, Hkv, C)))

    # --- fused ---
    out_g, arrs, wm_next = fused_chunk_step(
        q, k_c, v_c, jnp.asarray(wm), q_pos, cinit, ug, eg, next_pos,
        nstart, cl.k, cl.v, cl.pos, cl.score, cl.score_sq, cl.counter,
        k_scale=cl.k_scale if quantized else None,
        v_scale=cl.v_scale if quantized else None,
        policy=policy, feasible_k=spec.feasible_k, sink=sink,
        recent_window=recent, interpret=True)

    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_r),
                               atol=2e-6, rtol=1e-5)
    names = ["k", "v", "pos", "score", "score_sq", "counter"] + (
        ["k_scale", "v_scale"] if quantized else [])
    for name, g in zip(names, arrs):
        if name in ("score", "score_sq"):
            # the p-stat reduction can fuse differently between the two
            # compilation contexts (1-ulp drift); everything discrete —
            # eviction choices, positions, K/V, counters — must be exact
            np.testing.assert_allclose(np.asarray(g),
                                       np.asarray(getattr(rcl, name)),
                                       atol=1e-6, rtol=1e-6, err_msg=name)
            continue
        np.testing.assert_array_equal(np.asarray(g),
                                      np.asarray(getattr(rcl, name)),
                                      err_msg=name)
    # next write slots: mask == sorted ids
    wm_ids = np.argsort(-np.asarray(wm_next), axis=-1, kind="stable")[
        :, :, :C]
    wm_ids.sort(axis=-1)
    np.testing.assert_array_equal(wm_ids, np.sort(np.asarray(wids_ref),
                                                  axis=-1))
    assert np.all(np.asarray(wm_next).sum(-1) == C)


@pytest.mark.parametrize("quantized", [False, True])
def test_fused_write_attend_flash_path_matches(quantized, monkeypatch):
    """S-tiled flash write+attend (VERDICT r2 next #4): with the one-pass
    VMEM gate forced off, the tiled variant (write on the resident tile +
    online softmax + _score_kernel second pass) must match
    write_tokens_dense + fused_chunk_attend, cache arrays included."""
    from easykv_tpu.cache import LayerCache, quantize_kv, write_tokens_dense
    from easykv_tpu.ops.pallas import chunk_attention as ca

    monkeypatch.setattr(ca, "wa_fits", lambda *a: False)

    B, Hkv, rep, C, S, D = 2, 2, 2, 8, 384, 64  # S=384 -> 3 tiles of 128
    Hq = Hkv * rep
    rng = np.random.default_rng(33)
    kf = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    vf = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    if quantized:
        k, ks = quantize_kv(kf)
        v, vs = quantize_kv(vf)
    else:
        k, v = kf, vf
        ks = vs = jnp.zeros((B, Hkv, 1), jnp.float32)
    pos = rng.integers(0, 90, size=(B, Hkv, S)).astype(np.int32)
    pos[:, :, ::3] = -1
    f3 = lambda: jnp.asarray(
        np.abs(rng.normal(size=(B, Hkv, S))).astype(np.float32))
    cl = LayerCache(k=k, v=v, pos=jnp.asarray(pos), score=f3(),
                    score_sq=f3(), counter=f3(), k_scale=ks, v_scale=vs)

    q = jnp.asarray(rng.normal(size=(B, Hq, C, D)), jnp.float32)
    k_c = jnp.asarray(rng.normal(size=(B, Hkv, C, D)), jnp.float32)
    v_c = jnp.asarray(rng.normal(size=(B, Hkv, C, D)), jnp.float32)
    q_pos = jnp.broadcast_to(90 + jnp.arange(C, dtype=jnp.int32)[None], (B, C))
    cinit = jnp.asarray(np.abs(rng.normal(size=(B, C))).astype(np.float32))
    # target slots deliberately spread across all three tiles
    ids = np.stack([rng.choice(S, size=C, replace=False)
                    for _ in range(B * Hkv)]).reshape(B, Hkv, C).astype(
                        np.int32)
    ids = jnp.asarray(ids)

    ref_cl = write_tokens_dense(cl, k_c, v_c, q_pos, cinit, ids)
    ref = ca.fused_chunk_attend(
        q, ref_cl.k, ref_cl.v, ref_cl.pos, q_pos,
        k_scale=ref_cl.k_scale if quantized else None,
        v_scale=ref_cl.v_scale if quantized else None,
        interpret=True, need_scores=True)

    got = ca.fused_chunk_write_attend(
        q, k_c, v_c, ids, q_pos, cinit,
        cl.k, cl.v, cl.pos, cl.score, cl.score_sq, cl.counter,
        k_scale=cl.k_scale if quantized else None,
        v_scale=cl.v_scale if quantized else None,
        interpret=True, need_scores=True)
    out, ssum, ssq, last = got[:4]
    cache_arrs = got[4]

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref[0]),
                               atol=1e-5, rtol=1e-5)
    for g, r in zip((ssum, ssq, last), ref[1:]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=1e-5, rtol=1e-5)
    names = ["k", "v", "pos", "score", "score_sq", "counter"] + (
        ["k_scale", "v_scale"] if quantized else [])
    for name, g in zip(names, cache_arrs):
        np.testing.assert_array_equal(np.asarray(g),
                                      np.asarray(getattr(ref_cl, name)),
                                      err_msg=name)
