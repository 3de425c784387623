"""Batched decode-step decomposition at B>1 (VERDICT r4 #1).

BENCH_r04 measured B=8 int4 decode at 15.5 ms/step vs a ~10 ms
HBM-floor budget (weights 3.4 GB once + K/V 1.6 GB per step at ~600 GB/s)
with the engine side unprofiled. This bench rebuilds the engine's decode
step as CUMULATIVE levels — each level adds one component of the real
step body — so every delta attributes one component's cost:

  kernel      fused_decode_step_batch alone (B>1) / fused_decode_step (B=1)
  kernel-attn same, attention phases compiled out (EASYKV_TPU_MEGA_SKIP)
  +sidecar    + fused_write_update (slot select + score update)
  +kvwrite    + models.llama._write_kv_rows (K/V + scale row scatter)
  +evict      + policies.evict_cache (roco decode, gate always on)
  +sample     + lm head + sample_topp + embed lookup (~ the full step)
  engine      _run_decoding end-to-end (anchor; includes prefill ~6%)

Methodology per CLAUDE.md: one process, scanned loops (128 steps), forced
np.asarray readback, medians of 3 interleaved reps. EASYKV_BENCH_B picks
the batch (default 8). Run on the TPU host.
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

L, H, DH = 32, 32, 128
P_LEN, BUDGET = 512, 200
S = ((P_LEN + BUDGET + 1 + 127) // 128) * 128
STEPS = 128
REPS = 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    B = int(os.environ.get("EASYKV_BENCH_B", "8"))
    from bench import fake_int4_params
    from easykv_tpu import CausalLM, ModelConfig
    from easykv_tpu.cache import KVCache
    from easykv_tpu.engine.generate import EngineStatics, _run_decoding
    from easykv_tpu.models import llama
    from easykv_tpu.models.llama import StepCtx, _logits_tail, _write_kv_rows
    from easykv_tpu.ops.pallas.fused_decode import fused_decode_step
    from easykv_tpu.ops.pallas.fused_decode_batch import fused_decode_step_batch
    from easykv_tpu.ops.pallas.sidecar_update import fused_write_update
    from easykv_tpu.ops.quant import fuse_gemv_params, materialize_params
    from easykv_tpu.policies import PHASE_DECODE, PolicySpec, evict_cache
    from easykv_tpu.sampling import sample_topp

    assert jax.default_backend() == "tpu", "run on the TPU host"
    cfg = ModelConfig(
        vocab_size=32000, hidden_size=4096, intermediate_size=11008,
        num_hidden_layers=L, num_attention_heads=H, num_key_value_heads=H,
        max_position_embeddings=4096,
    )
    params = fuse_gemv_params(fake_int4_params(cfg))
    params = jax.jit(materialize_params)(params)
    jax.block_until_ready(params)
    log(f"7B int4-arith params ready; B={B} S={S}")

    rw = int(BUDGET * 0.3)
    spec = PolicySpec("roco", PHASE_DECODE, 1, 4, rw,
                      feasible_k=max(BUDGET - rw, 1), protect_prompt=True)

    rng = np.random.default_rng(0)
    valid = np.zeros((L, B, H, S), bool)
    valid[..., : P_LEN + BUDGET] = True
    pos0 = np.where(valid, np.arange(S)[None, None, None, :], -1).astype(
        np.int32)
    score0 = np.where(valid, rng.random((L, B, H, S)), 0).astype(np.float32)
    cache0 = KVCache(
        k=jnp.asarray(rng.integers(-100, 100, (L, B, H, S, DH)), jnp.int8),
        v=jnp.asarray(rng.integers(-100, 100, (L, B, H, S, DH)), jnp.int8),
        pos=jnp.asarray(pos0),
        score=jnp.asarray(score0),
        score_sq=jnp.asarray(score0 * score0),
        counter=jnp.asarray(
            np.where(valid, rng.integers(1, 50, (L, B, H, S)), 0).astype(
                np.float32)),
        k_scale=jnp.full((L, B, H, S), 1e-2, jnp.float32),
        v_scale=jnp.full((L, B, H, S), 1e-2, jnp.float32),
    )
    h0 = jnp.asarray(rng.standard_normal((B, cfg.hidden_size)) * 0.03,
                     jnp.bfloat16)
    start = P_LEN + BUDGET
    prompt_len = jnp.full((B,), P_LEN, jnp.int32)
    ones_b = jnp.ones((B,), bool)
    zeros_bi = jnp.zeros((B,), jnp.int32)
    zeros_bf = jnp.zeros((B,), jnp.float32)

    def kernel_step(lyr, cache, h, n):
        q_pos = jnp.full((B,), start, jnp.int32) + n
        if B == 1:
            hm, kn_m, vn_m, probs_m, pnew_m = fused_decode_step(
                lyr, cfg, cache.k, cache.v, cache.pos, h, q_pos,
                k_scale=cache.k_scale, v_scale=cache.v_scale)
            kn = kn_m[:, None]
            vn = vn_m[:, None]
            probs = probs_m[:, None, :, 0, :]
            p_new = pnew_m[:, None, :, None]
        else:
            hm, kn, vn, probs_m, pnew_m = fused_decode_step_batch(
                lyr, cfg, cache.k, cache.v, cache.pos, h, q_pos,
                k_scale=cache.k_scale, v_scale=cache.v_scale)
            probs = probs_m[:, :, :, 0, :]
            p_new = pnew_m[..., None]
        return hm, kn, vn, probs, p_new, q_pos

    def make_body(level, params):
        lyr = params["layers"]

        def body(carry, _):
            cache, h, n, key = carry
            hm, kn, vn, probs, p_new, q_pos = kernel_step(lyr, cache, h, n)
            h_next = jnp.tanh(hm.astype(jnp.float32)).astype(h.dtype) * 0.03
            if level >= 1:
                pos, score, ssq, counter, ids = fused_write_update(
                    cache.pos, cache.score, cache.score_sq, cache.counter,
                    probs, p_new, q_pos, ones_b, ones_b, zeros_bf,
                    policy=spec.policy)
                cache = cache._replace(pos=pos, score=score, score_sq=ssq,
                                       counter=counter)
            if level >= 2:
                cache = _write_kv_rows(cache, ids, kn, vn, ones_b)
            if level >= 3:
                cache = evict_cache(cache, spec, q_pos + 1, prompt_len,
                                    zeros_bi, ones_b)
            if level >= 4:
                logits = _logits_tail(hm[:, None], params, cfg)[:, 0]
                key, sub = jax.random.split(key)
                token = sample_topp(sub, logits, jnp.float32(1.0),
                                    jnp.float32(0.95))
                h_next = jnp.take(params["embed"], token, axis=0)
            return (cache, h_next, n + 1, key), ()
        return body

    levels = [
        (0, "kernel"),
        (1, "+sidecar"),
        (2, "+kvwrite"),
        (3, "+evict"),
        (4, "+sample"),
    ]

    runners = {}
    for lv, name in levels:
        def run(p, cache, h, lv=lv):
            carry = (cache, h, jnp.int32(0), jax.random.PRNGKey(0))
            (cache, h, _, _), _ = jax.lax.scan(make_body(lv, p), carry,
                                               None, length=STEPS)
            return h, cache.pos
        runners[name] = jax.jit(run)

    # attention phases compiled out (trace-time env knob)
    os.environ["EASYKV_TPU_MEGA_SKIP"] = "attn"
    try:
        runners["kernel-attn"] = jax.jit(
            lambda p, cache, h: jax.lax.scan(
                make_body(0, p), (cache, h, jnp.int32(0),
                                  jax.random.PRNGKey(0)),
                None, length=STEPS)[0][1])
        runners["kernel-attn"].lower(params, cache0, h0)  # trace w/ knob set
    finally:
        del os.environ["EASYKV_TPU_MEGA_SKIP"]

    order = ["kernel-attn", "kernel", "+sidecar", "+kvwrite", "+evict",
             "+sample"]
    times = {k: [] for k in order}
    for rep in range(REPS):
        for name in order:
            fn = runners[name]
            out = fn(params, cache0, h0)
            first = out[0] if isinstance(out, tuple) else out
            np.asarray(first)    # sync
            t0 = time.time()
            out = fn(params, cache0, h0)
            first = out[0] if isinstance(out, tuple) else out
            np.asarray(first)
            dt = (time.time() - t0) / STEPS * 1e3
            times[name].append(dt)
            log(f"rep{rep} {name:12s} {dt:7.3f} ms/step")

    log("\n=== medians ===")
    prev = None
    for name in order:
        m = float(np.median(times[name]))
        delta = "" if prev is None or name in ("kernel-attn", "kernel") \
            else f"  (+{m - prev:.3f})"
        log(f"{name:12s} {m:7.3f} ms/step{delta}")
        if name != "kernel-attn":
            prev = m

    # engine anchor
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, size=(B, P_LEN)),
                      jnp.int32)
    st = EngineStatics(
        cfg=cfg, mode="decoding", policy="roco", stride=1, length=P_LEN,
        budget=BUDGET, recent_window_dec=rw, max_new_tokens=256,
        dtype="bfloat16", kv_quant=True,
    )
    args = (st, params, ids, prompt_len, jnp.float32(1.0),
            jnp.float32(0.95), jax.random.PRNGKey(0))
    res = _run_decoding(*args)
    jax.block_until_ready(res.out_ids)
    args = args[:-1] + (jax.random.PRNGKey(1),)
    t0 = time.time()
    res = _run_decoding(*args)
    jax.block_until_ready(res.out_ids)
    dt = time.time() - t0
    total = int(np.asarray(res.n_tokens).sum())
    log(f"engine       {dt / 256 * 1e3:7.3f} ms/step "
        f"({total / dt:.1f} tok/s aggregate, B={B})")


if __name__ == "__main__":
    main()
