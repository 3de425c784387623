"""Decode-step small-op overhead microbench (TPU).

Times the non-GEMV, non-attention components of a budgeted decode step at
LLaMa2-7B int8-KV shapes, each in its own scanned loop:

  evict     policies.evict_cache (roco decode spec, gate always on)
  write     free_slot_ids + models.llama._decode_write (8-scatter batched)
  sample    sampling.sample_topp over the 32K vocab

Together with bench_gemv.py (GEMV chain / +head+argsort / +inflight attn)
this accounts for the full engine step so the remaining gap is attributable.
Run on the TPU host.

CAVEAT (measured 2026-08-17): these isolated scan loops do NOT reproduce the
engine's buffer aliasing — XLA copies the 200 MB K/V carry every iteration
when the loop body both reads and scatters it, so evict/write report ~23-26
ms/step here while the whole engine step is ~12 ms. Treat the evict/write
numbers as upper bounds only; sample_topp (no big carry) is accurate
(~320 us). The honest decomposition is bench_gemv.py (floor) vs bench.py
(engine). The evict warm-up (~21 min with the jnp.sort threshold, seconds
with the _kth_smallest bisection) is still a valid compile-cost probe.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/easykv_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp
import numpy as np

L, B, H, DH = 32, 1, 32, 128
P_LEN, BUDGET = 512, 200
S = ((P_LEN + BUDGET + 1 + 127) // 128) * 128
V = 32000
STEPS = 384


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_cache():
    from easykv_tpu.cache import KVCache

    rng = np.random.default_rng(0)
    valid = np.zeros((L, B, H, S), bool)
    valid[..., : P_LEN + BUDGET] = True
    pos = np.where(valid, np.arange(S)[None, None, None, :], -1).astype(np.int32)
    score = np.where(valid, rng.random((L, B, H, S)), 0).astype(np.float32)
    ssq = (score * score).astype(np.float32)
    counter = np.where(valid, rng.integers(1, 50, (L, B, H, S)), 0).astype(
        np.float32
    )
    return KVCache(
        k=jnp.zeros((L, B, H, S, DH), jnp.int8),
        v=jnp.zeros((L, B, H, S, DH), jnp.int8),
        pos=jnp.asarray(pos),
        score=jnp.asarray(score),
        score_sq=jnp.asarray(ssq),
        counter=jnp.asarray(counter),
        k_scale=jnp.full((L, B, H, S), 1e-2, jnp.float32),
        v_scale=jnp.full((L, B, H, S), 1e-2, jnp.float32),
    )


def main():
    assert jax.default_backend() == "tpu", "run on the TPU host"
    from easykv_tpu.cache import free_slot_ids
    from easykv_tpu.models.llama import StepCtx, _decode_write
    from easykv_tpu.policies import PHASE_DECODE, PolicySpec, evict_cache
    from easykv_tpu.sampling import sample_topp

    rw = int(BUDGET * 0.3)
    spec = PolicySpec("roco", PHASE_DECODE, 1, 4, rw,
                      feasible_k=max(BUDGET - rw, 1), protect_prompt=True)
    cache0 = make_cache()
    next_pos = jnp.full((B,), P_LEN + BUDGET, jnp.int32)
    prompt_len = jnp.full((B,), P_LEN, jnp.int32)
    zero_rank = jnp.zeros((B,), jnp.int32)
    gate = jnp.ones((B,), bool)

    @jax.jit
    def run_evict(cache):
        def step(cache, _):
            cache = evict_cache(cache, spec, next_pos, prompt_len, zero_rank,
                                gate)
            # keep the loop from converging to a fixed point: re-mark one
            # slot valid so each iteration has real work
            cache = cache._replace(
                pos=cache.pos.at[..., 0].set(next_pos[0]),
                counter=cache.counter.at[..., 0].set(1.0),
            )
            return cache, ()
        cache, _ = jax.lax.scan(step, cache, None, length=STEPS)
        return cache

    ctx = StepCtx(
        q_pos=jnp.full((B, 1), P_LEN + BUDGET, jnp.int32),
        token_valid=jnp.ones((B, 1), bool),
        counter_init=jnp.zeros((B, 1), jnp.float32),
        next_pos=next_pos,
        prompt_len=prompt_len,
        evict_gate=gate,
        update_gate=jnp.ones((B,), bool),
        rand_rank=zero_rank,
    )

    @jax.jit
    def run_write(cache, kn, vn, probs, p_new):
        def step(cache, _):
            ids_all = free_slot_ids(cache.pos.reshape(L * B, H, S), 1)
            ids_all = ids_all.reshape(L, B, H, 1)
            cache = _decode_write(cache, ids_all, kn, vn, probs, p_new, ctx,
                                  spec)
            # free the slot again so every iteration scatters
            cache = cache._replace(pos=cache.pos.at[..., -1].set(-1))
            return cache, ()
        cache, _ = jax.lax.scan(step, cache, None, length=STEPS)
        return cache

    @jax.jit
    def run_sample(key, logits):
        def step(key, _):
            key, sub = jax.random.split(key)
            tok = sample_topp(sub, logits, jnp.float32(1.0), jnp.float32(0.95))
            return key, tok
        key, toks = jax.lax.scan(step, key, None, length=STEPS)
        return toks

    kn = jnp.ones((L, B, H, 1, DH), jnp.bfloat16)
    vn = jnp.ones((L, B, H, 1, DH), jnp.bfloat16)
    probs = jnp.full((L, B, H, S), 1e-3, jnp.float32)
    p_new = jnp.full((L, B, H, 1), 1e-3, jnp.float32)
    logits = jnp.asarray(np.random.default_rng(1).random((B, V)), jnp.float32)

    for name, fn, args in [
        ("evict(roco)", run_evict, (cache0,)),
        ("write(select+8scatter)", run_write, (cache0, kn, vn, probs, p_new)),
        ("sample_topp", run_sample, (jax.random.PRNGKey(0), logits)),
    ]:
        t0 = time.time(); jax.tree.map(np.asarray, fn(*args))
        log(f"{name}: warm-up {time.time()-t0:.1f}s")
        t0 = time.time(); jax.tree.map(np.asarray, fn(*args))
        dt = (time.time() - t0) / STEPS
        log(f"{name}: {dt*1e6:.0f} us/step")


if __name__ == "__main__":
    main()
