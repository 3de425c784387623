"""Decode-step decomposition microbench (TPU).

Measures, per simulated decode step at LLaMa2-7B int8 shapes:
  A. pure fused-GEMV chain (wqkv -> wo -> wgu -> wd per layer, serialized
     through the residual stream) — the weight-streaming floor in practice;
  B. A + the lm-head GEMV and a sampling argsort;
  C. the real engine step (prefill excluded) from bench.py for reference.

Prints effective HBM bandwidth so the gap to the ~819 GB/s v5e spec (and to
the full engine's step time) is attributable: GEMV efficiency vs attention/
scatter/loop overhead. Run on the TPU host: python benchmarks/bench_gemv.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/easykv_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

L, D, F = 32, 4096, 11008
HQ, HKV, DH = 32, 32, 128
V = 32000
STEPS = 384


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def qlin(shape, seed):
    pat = (np.arange(65536, dtype=np.int32) * 29 % 255 - 127).astype(np.int8)
    n = int(np.prod(shape))
    q = np.tile(pat, n // pat.size + 2)[seed : n + seed].reshape(shape)
    s = jnp.full(shape[:-2] + (shape[-1],), (shape[-2] ** -0.5) / 127.0,
                 jnp.float32)
    return {"q": jax.device_put(q), "s": s}


def mmq(x, w):
    y = jnp.matmul(x, w["q"].astype(x.dtype))
    return y * w["s"].astype(x.dtype)


def main():
    assert jax.default_backend() == "tpu", "run on the TPU host"
    ws = {
        "wqkv": qlin((L, D, (HQ + 2 * HKV) * DH), 5),
        "wo": qlin((L, HQ * DH, D), 13),
        "wgu": qlin((L, D, 2 * F), 17),
        "wd": qlin((L, F, D), 23),
    }
    head = qlin((D, V), 3)
    gemv_bytes = (D * (HQ + 2 * HKV) * DH + HQ * DH * D + D * 2 * F + F * D) * L
    head_bytes = D * V

    def chain(x, ws):
        def layer(h, p):
            y = mmq(h, p["wqkv"])
            h = h + mmq(y[:, : HQ * DH], p["wo"])
            gu = mmq(h, p["wgu"])
            h = h + mmq(jax.nn.silu(gu[:, :F]) * gu[:, F:], p["wd"])
            return h, ()
        x, _ = jax.lax.scan(layer, x, ws)
        return x

    @jax.jit
    def run_chain(x, ws):
        x, _ = jax.lax.scan(lambda x, _: (chain(x, ws), ()), x, None,
                            length=STEPS)
        return x

    @jax.jit
    def run_chain_head(x, ws, head):
        def step(x, _):
            x = chain(x, ws)
            logits = jnp.matmul(x, head["q"].astype(x.dtype),
                                preferred_element_type=jnp.float32) * head["s"]
            tok = jnp.argsort(-logits[0])[:1]
            x = x + tok.astype(x.dtype) * 1e-9
            return x, ()
        x, _ = jax.lax.scan(step, x, None, length=STEPS)
        return x

    S = 713  # bench.py budgeted-cache slot count (512 prompt + 200 + 1)
    kv = {
        "k": jax.device_put(np.ones((L, 1, HKV, S, DH), np.int8)),
        "v": jax.device_put(np.ones((L, 1, HKV, S, DH), np.int8)),
        "pos": jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32),
                                (L, 1, HKV, S)),
        "ks": jnp.full((L, 1, HKV, S), 1e-2, jnp.float32),
        "vs": jnp.full((L, 1, HKV, S), 1e-2, jnp.float32),
    }
    kv_bytes = (2 * S * DH + 4 * S * 2 + 4 * S) * HKV * L  # k,v,scales,pos

    @jax.jit
    def run_chain_attn(x, ws, kv):
        from easykv_tpu.ops.pallas import fused_decode_attend_inflight

        def step(x, _):
            def layer(h, p_cl):
                p, cl = p_cl
                y = mmq(h, p["wqkv"])
                q = y[:, : HQ * DH].reshape(1, 1, HQ, DH).transpose(0, 2, 1, 3)
                kn = y[:, HQ * DH : (HQ + HKV) * DH].reshape(
                    1, 1, HKV, DH).transpose(0, 2, 1, 3)
                vn = y[:, (HQ + HKV) * DH :].reshape(
                    1, 1, HKV, DH).transpose(0, 2, 1, 3)
                out, probs, p_new = fused_decode_attend_inflight(
                    q, kn, vn, cl["k"], cl["v"], cl["pos"],
                    jnp.full((1,), S + 5, jnp.int32),
                    k_scale=cl["ks"], v_scale=cl["vs"],
                )
                h = h + mmq(out.reshape(1, HQ * DH), p["wo"])
                gu = mmq(h, p["wgu"])
                h = h + mmq(jax.nn.silu(gu[:, :F]) * gu[:, F:], p["wd"])
                return h, jnp.sum(probs)
            x, ps = jax.lax.scan(layer, x, (ws, kv))
            return x + jnp.sum(ps).astype(x.dtype) * 1e-9, ()
        x, _ = jax.lax.scan(step, x, None, length=STEPS)
        return x

    x0 = jnp.ones((1, D), jnp.bfloat16)
    for name, fn, args, nbytes in [
        ("gemv_chain", run_chain, (x0, ws), gemv_bytes),
        ("gemv_chain+head+argsort", run_chain_head, (x0, ws, head),
         gemv_bytes + head_bytes),
        ("gemv_chain+inflight_attn", run_chain_attn, (x0, ws, kv),
         gemv_bytes + kv_bytes),
    ]:
        t0 = time.time(); np.asarray(fn(*args))
        log(f"{name}: warm-up {time.time()-t0:.1f}s")
        # NB: np.asarray (host readback), NOT block_until_ready — through the
        # tunneled remote TPU the latter returns before execution finishes.
        t0 = time.time(); np.asarray(fn(*args))
        dt = (time.time() - t0) / STEPS
        bw = nbytes / dt / 1e9
        log(f"{name}: {dt*1e3:.3f} ms/step  -> {bw:.0f} GB/s effective "
            f"({1/dt:.1f} steps/s)")


if __name__ == "__main__":
    main()
