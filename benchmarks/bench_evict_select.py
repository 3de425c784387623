"""Eviction-selection micro A/B at encode shapes (TPU): the layer-major
encode pays one roco selection per (chunk, layer) event — ~640 events per
4K-token prefill. Variants over (B=1, H=32, S=2048), 512-iteration scan:

  A. production select_evictions (roco: 32-step _kth_smallest bisection on
     std + stable-sort _smallest_k on avg)
  B. sort-threshold roco: jnp.sort(std)[k-1] as the stage-1 threshold
     (compile-time risk in the decode while_loop, but the encode scan
     compiles once)
  C. h2o_head (single _smallest_k sort) for reference
  D. full eviction event (bump + select + invalidate scatter), production
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    globals().get("__file__", "benchmarks/x")))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/easykv_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from easykv_tpu.cache import LayerCache
    from easykv_tpu.policies import (
        PHASE_ENCODE, PolicySpec, STD_EXCLUDE, STD_FORCE, ROCO_STD_GUARD,
        _smallest_k, select_evictions, evict_layer,
    )

    B, H, S = 1, 32, 2048
    k = 96
    idx = 1984
    spec = PolicySpec(policy="roco", phase=PHASE_ENCODE, k=k, sink_length=4,
                      recent_window=198, feasible_k=idx - 198 - 4)
    spec_h2o = PolicySpec(policy="h2o_head", phase=PHASE_ENCODE, k=k,
                          sink_length=4, recent_window=198)
    STEPS = 512

    key = jax.random.PRNGKey(0)
    pos0 = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (B, H, S), 2) < idx,
        jax.lax.broadcasted_iota(jnp.int32, (B, H, S), 2), -1)
    score0 = jax.random.uniform(key, (B, H, S))
    sq0 = score0 * score0 * jax.random.uniform(jax.random.fold_in(key, 1),
                                               (B, H, S))
    cnt0 = 1.0 + jax.random.uniform(jax.random.fold_in(key, 2), (B, H, S)) * 8

    def mk_cl(score):
        return LayerCache(k=None, v=None, pos=pos0, score=score,
                          score_sq=sq0, counter=cnt0,
                          k_scale=None, v_scale=None)

    next_pos = jnp.full((B,), idx, jnp.int32)
    zeros_b = jnp.zeros((B,), jnp.int32)
    gate = jnp.ones((B,), bool)

    def roco_sort_select(cl):
        pos = cl.pos
        counter = cl.counter
        mean = cl.score / counter
        var = cl.score_sq / counter - mean * mean
        std = jnp.sqrt(jnp.maximum(var, 0.0))
        forced = pos >= next_pos[:, None, None] - ROCO_STD_GUARD
        forced |= pos < spec.sink_length
        std = jnp.where(forced, STD_FORCE + pos.astype(jnp.float32) * 1024.0,
                        std)
        std = jnp.where(pos >= 0, std, STD_EXCLUDE)
        thresh = jnp.sort(std, axis=-1)[..., spec.feasible_k - 1:spec.feasible_k]
        feasible = std <= thresh
        ids, _ = _smallest_k(cl.score / counter, feasible, spec.k)
        return ids

    def make_run(kind):
        @jax.jit
        def run(score):
            def step(s, _):
                cl = mk_cl(s)
                if kind == "A":
                    ids = select_evictions(cl, spec, next_pos, zeros_b, zeros_b)
                elif kind == "B":
                    ids = roco_sort_select(cl)
                elif kind == "C":
                    ids = select_evictions(cl, spec_h2o, next_pos, zeros_b,
                                           zeros_b)
                else:
                    cl2, ids = evict_layer(cl, spec, next_pos, zeros_b,
                                           zeros_b, gate)
                    return s + cl2.counter * 1e-9, ids[0, 0, 0]
                s2 = s + ids.astype(jnp.float32).mean() * 1e-9
                return s2, ids[0, 0, 0]

            _, ys = jax.lax.scan(step, score, None, length=STEPS)
            return ys

        return run

    runs = {kk: make_run(kk) for kk in ("A", "B", "C", "D")}
    for kk, r in runs.items():
        np.asarray(jax.block_until_ready(r(score0)))
    res = {kk: [] for kk in runs}
    for rep in range(4):
        for kk, r in runs.items():
            t0 = time.perf_counter()
            np.asarray(r(score0))
            res[kk].append((time.perf_counter() - t0) / STEPS)
    for kk, ts in res.items():
        med = float(np.median(ts))
        log(f"{kk}: {med * 1e3:7.3f} ms/event")


if __name__ == "__main__":
    main()
