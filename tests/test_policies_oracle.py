"""Lockstep comparison of the ring-buffer policy machinery against the numpy
oracle (tests/oracle.py) that literally implements the reference algorithm.

Both sides are fed identical per-(step, head, position) attention weights;
we assert the retained position sets match exactly after every eviction
event, and that scores/counters agree per retained position.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from easykv_tpu.cache import LayerCache, evict_slots, write_tokens
from easykv_tpu.policies import (
    PHASE_DECODE,
    PHASE_ENCDEC_DECODE,
    PHASE_ENCODE,
    PolicySpec,
    bump_counters,
    select_evictions,
    update_scores,
)
from oracle import DecodeOracle, EncDecDecodeOracle, EncodeOracle

H, D = 3, 4


def fresh_cache(S):
    z = jnp.zeros((1, H, S))
    return LayerCache(
        k=jnp.zeros((1, H, S, D)), v=jnp.zeros((1, H, S, D)),
        pos=jnp.full((1, H, S), -1, jnp.int32),
        score=z, score_sq=z, counter=z,
    )


def write(cl, positions, counter_init):
    C = len(positions)
    return write_tokens(
        cl,
        jnp.zeros((1, H, C, D)), jnp.zeros((1, H, C, D)),
        jnp.asarray([positions], jnp.int32),
        jnp.asarray([counter_init], jnp.float32),
    )


def slot_probs(cl, Wt, q_positions):
    """(1, H, C, S) probs matching the oracle's per-row causal softmax:
    weight Wt[h, pos] over valid slots with pos <= q_pos, normalized."""
    pos = np.asarray(cl.pos)[0]          # (H, S)
    valid = pos >= 0
    w = np.where(valid, Wt[np.arange(H)[:, None], np.maximum(pos, 0)], 0.0)
    rows = []
    for q in q_positions:
        vis = np.where(valid & (pos <= q), w, 0.0)
        rows.append(vis / vis.sum(axis=-1, keepdims=True))
    return jnp.asarray(np.stack(rows, axis=1)[None], jnp.float32)  # (1,H,C,S)


def retained(cl, min_pos=0):
    pos = np.asarray(cl.pos)[0]
    return [sorted(p for p in pos[h] if p >= min_pos) for h in range(H)]


def check_sidecars(cl, oracle, min_pos=0, counters=False):
    """Score (and for roco, counter) agreement per retained position.
    Counters are only compacted/read by roco in the reference
    (easykv.py:333 vs :318), so they are only comparable there."""
    pos = np.asarray(cl.pos)[0]
    score = np.asarray(cl.score)[0]
    counter = np.asarray(cl.counter)[0]
    for h in range(H):
        omap = {p: i for i, p in enumerate(oracle.positions[h])}
        for s in range(pos.shape[1]):
            p = pos[h, s]
            if p < min_pos or p not in omap:
                continue
            i = omap[p]
            np.testing.assert_allclose(
                score[h, s], oracle.scores[h, i], rtol=2e-3, atol=2e-4,
                err_msg=f"score mismatch h={h} pos={p}",
            )
            if counters:
                np.testing.assert_allclose(
                    counter[h, s], oracle.counter[h, i], rtol=1e-5,
                    err_msg=f"counter mismatch h={h} pos={p}",
                )


def weights_for(seed, T, maxpos):
    rng = np.random.default_rng(seed)
    return rng.uniform(0.05, 1.0, size=(T, H, maxpos))


@pytest.mark.parametrize("policy", ["h2o_head", "roco", "tova", "recency"])
def test_decode_phase_matches_oracle(policy):
    P, budget, T = 5, 12, 40
    rw = int(budget * 0.3)
    spec = PolicySpec(policy, PHASE_DECODE, 1, 4, rw,
                      feasible_k=budget - rw, protect_prompt=True)
    Wts = weights_for(0, T, P + T + 1)
    oracle = DecodeOracle(H, budget, P, policy)
    cl = fresh_cache(P + budget + 1)
    cl = write(cl, list(range(P)), [0.0] * P)

    for t in range(T):
        pos = P + t
        cl = write(cl, [pos], [float(max(budget - t, 0))])
        Wt = Wts[t]
        probs = slot_probs(cl, Wt, [pos])
        cl = update_scores(cl, probs, spec, jnp.ones((), bool))
        if t + 1 > budget:
            cl = bump_counters(cl, 1.0, jnp.ones((1,), bool))
            ids = select_evictions(
                cl, spec, jnp.asarray([pos + 1], jnp.int32),
                jnp.asarray([P], jnp.int32), jnp.zeros((1,), jnp.int32),
            )
            cl = evict_slots(cl, ids, jnp.ones((1,), bool))
        oracle.step(pos, lambda h, q, Wt=Wt: Wt[h, q])
        assert retained(cl, P) == [sorted(p) for p in oracle.positions], (
            f"retained mismatch at t={t}"
        )
        if policy in ("h2o_head", "roco", "tova"):
            check_sidecars(cl, oracle, P, counters=(policy == "roco"))


@pytest.mark.parametrize("policy", ["h2o_head", "roco", "tova", "recency", "random"])
@pytest.mark.parametrize("keep_attention", [False, True])
def test_encode_phase_matches_oracle(policy, keep_attention):
    if keep_attention and policy in ("recency", "random"):
        pytest.skip("keep_attention only affects score-based policies")
    stride, length = 3, 48
    budget = 24 + stride           # reference int-budget shift
    idx, r_idx = 24, 21
    rw = int(budget * 0.1)
    sink = 4
    spec = PolicySpec(
        policy, PHASE_ENCODE, stride, sink, rw,
        feasible_k=max(budget - rw - sink, stride),
    )
    n_chunks = (length - r_idx) // stride
    Wts = weights_for(1, n_chunks + 1, length + 1)
    oracle = EncodeOracle(H, idx, stride, r_idx, policy, budget,
                          sink=sink, keep_attention=keep_attention)
    cl = fresh_cache(idx + stride)

    def cinit(ps):
        # engine formula (_encode_counter_init): pos>=idx -> -((pos-idx)%stride);
        # pos<idx -> idx-pos if keep_attention else 0
        return [
            -float((p - idx) % stride) if p >= idx
            else (float(idx - p) if keep_attention else 0.0)
            for p in ps
        ]

    # prefix
    prefix = list(range(r_idx))
    cl = write(cl, prefix, cinit(prefix))
    if keep_attention:
        probs = slot_probs(cl, Wts[-1], prefix)
        cl = update_scores(cl, probs, spec, jnp.ones((), bool), bootstrap=True)
        oracle.bootstrap(lambda h, q: Wts[-1][h, q])

    kv = r_idx
    for i in range(n_chunks):
        start = r_idx + i * stride
        chunk = list(range(start, start + stride))
        cl = write(cl, chunk, cinit(chunk))
        kv_after = kv + stride
        trigger = kv_after > idx
        Wt = Wts[i]
        if keep_attention or trigger:
            probs = slot_probs(cl, Wt, chunk)
            cl = update_scores(cl, probs, spec, jnp.ones((), bool))
        rr = (7 * i) % (idx + stride - stride)
        if trigger:
            cl = bump_counters(cl, float(stride), jnp.ones((1,), bool))
            ids = select_evictions(
                cl, spec, jnp.asarray([start + stride], jnp.int32),
                jnp.zeros((1,), jnp.int32), jnp.asarray([rr], jnp.int32),
            )
            cl = evict_slots(cl, ids, jnp.ones((1,), bool))
            kv = kv_after - stride
        else:
            kv = kv_after
        oracle.chunk(chunk, lambda h, q, Wt=Wt: Wt[h, q], rand_rank=rr)
        assert retained(cl) == [sorted(p) for p in oracle.positions], (
            f"retained mismatch at chunk={i} (policy={policy})"
        )
        if policy in ("h2o_head", "roco", "tova"):
            check_sidecars(cl, oracle, counters=(policy == "roco"))


@pytest.mark.parametrize("policy", ["roco", "tova", "recency", "random"])
def test_encdec_decode_phase_matches_oracle(policy):
    """Encode phase then per-step eviction through decode
    (reference easykv.py:530-753)."""
    stride, length = 3, 48
    budget = 24 + stride
    idx, r_idx = 24, 21
    sink = 4
    enc_spec = PolicySpec(
        policy, PHASE_ENCODE, stride, sink, int(budget * 0.1),
        feasible_k=max(budget - int(budget * 0.1) - sink, stride),
    )
    rw_dec = int(budget * 0.3)
    dec_spec = PolicySpec(
        policy, PHASE_ENCDEC_DECODE, 1, sink, rw_dec,
        feasible_k=max(min(budget - rw_dec, idx), 1),
    )
    n_chunks = (length - r_idx) // stride
    T_dec = 15
    Wts = weights_for(2, n_chunks + T_dec, length + T_dec + 1)
    oracle_enc = EncodeOracle(H, idx, stride, r_idx, policy, budget, sink=sink)
    cl = fresh_cache(idx + stride)
    prefix = list(range(r_idx))
    cl = write(cl, prefix, [0.0] * r_idx)
    kv = r_idx
    for i in range(n_chunks):
        start = r_idx + i * stride
        chunk = list(range(start, start + stride))
        cl = write(
            cl, chunk,
            [-float((p - idx) % stride) if p >= idx else 0.0 for p in chunk],
        )
        kv_after = kv + stride
        trigger = kv_after > idx
        Wt = Wts[i]
        if trigger:
            probs = slot_probs(cl, Wt, chunk)
            cl = update_scores(cl, probs, enc_spec, jnp.ones((), bool))
        rr = (5 * i) % idx
        if trigger:
            cl = bump_counters(cl, float(stride), jnp.ones((1,), bool))
            ids = select_evictions(
                cl, enc_spec, jnp.asarray([start + stride], jnp.int32),
                jnp.zeros((1,), jnp.int32), jnp.asarray([rr], jnp.int32),
            )
            cl = evict_slots(cl, ids, jnp.ones((1,), bool))
            kv = kv_after - stride
        else:
            kv = kv_after
        oracle_enc.chunk(chunk, lambda h, q, Wt=Wt: Wt[h, q], rand_rank=rr)
    assert retained(cl) == [sorted(p) for p in oracle_enc.positions]

    oracle = EncDecDecodeOracle(oracle_enc, budget)
    for t in range(T_dec):
        pos = length + t
        cl = write(cl, [pos], [0.0])
        Wt = Wts[n_chunks + t]
        probs = slot_probs(cl, Wt, [pos])
        cl = update_scores(cl, probs, dec_spec, jnp.ones((), bool))
        rr = (3 * t) % (idx + 1 - sink)
        cl = bump_counters(cl, 1.0, jnp.ones((1,), bool))
        ids = select_evictions(
            cl, dec_spec, jnp.asarray([pos + 1], jnp.int32),
            jnp.zeros((1,), jnp.int32), jnp.asarray([rr], jnp.int32),
        )
        cl = evict_slots(cl, ids, jnp.ones((1,), bool))
        oracle.step(pos, lambda h, q, Wt=Wt: Wt[h, q], rand_rank=rr)
        assert retained(cl) == [sorted(p) for p in oracle.positions], (
            f"retained mismatch at decode step {t} (policy={policy})"
        )
        if policy in ("roco", "tova"):
            check_sidecars(cl, oracle, counters=(policy == "roco"))


def test_kth_smallest_matches_sort():
    """_kth_smallest (bit-bisection radix select) is bit-exact vs jnp.sort
    for every k, including inf sentinels, duplicates, and negatives."""
    import numpy as np

    from easykv_tpu.policies import _kth_smallest

    rng = np.random.default_rng(7)
    x = (rng.standard_normal((3, 4, 97)) * 50).astype(np.float32)
    x[..., :20] = np.float32(1e30)            # STD_EXCLUDE-style sentinel
    x[0, 0, 30:35] = x[0, 0, 40]              # ties
    ref = np.sort(x, axis=-1)
    for k in (1, 7, 50, 97):
        got = np.asarray(_kth_smallest(jnp.asarray(x), k))[..., 0]
        np.testing.assert_array_equal(got, ref[..., k - 1])
