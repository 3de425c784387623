"""Headline benchmark: budget-constrained decode throughput vs full cache.

Mirrors the BASELINE.json target ("LLaMa2-7B decoding at budget=200 ...
sustaining >=90% of full-cache tokens/s/chip"): LLaMa2-7B with int8 (w8a16)
weights — bf16 7B does not fit a 16 GB v5e chip — and the int8 compressed-KV
cache, decoding 384 tokens from a 512-token prompt with the roco policy at
budget=200 (so ~184 eviction events run in steady state) vs policy='full'.

Prints exactly ONE JSON line to stdout; progress goes to stderr.
On CPU (no TPU attached) a small config is used so the bench still runs.
"""
import json
import sys
import time

import jax

# persistent compilation cache: the budgeted 7B graph takes minutes through
# the remote-compile service; repeated runs (e.g. the round driver) hit the
# cache instead
jax.config.update("jax_compilation_cache_dir", "/tmp/easykv_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


import functools


@functools.partial(jax.jit, static_argnums=(0, 1))
def _dev_bytes(shape, mod, seed):
    """Deterministic pseudo-random int8 values built ON DEVICE — uploading
    multi-GB weights through the tunneled TPU takes tens of minutes; an
    on-device iota takes milliseconds. Throughput is weight-independent."""
    n = int(np.prod(shape))
    v = (jax.lax.iota(jnp.int32, n) * 37 + seed) % mod - mod // 2
    return v.astype(jnp.int8).reshape(shape)


def fake_int8_params(cfg):
    """Deterministic int8 weights, built on device (no host upload)."""
    L, D, F = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    Hq, Hkv, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    V = cfg.vocab_size

    def qlin(shape, seed):
        s = jnp.full(shape[:-2] + (shape[-1],), (shape[-2] ** -0.5) / 127.0,
                     jnp.float32)
        return {"q": _dev_bytes(tuple(shape), 255, seed), "s": s}

    emb = _dev_bytes((V, D), 255, 3).astype(jnp.bfloat16) * (D ** -0.5) / 127.0
    return {
        "embed": emb,
        "final_norm": jnp.ones((D,), jnp.bfloat16),
        "lm_head": qlin((D, V), 3),
        "layers": {
            "wq": qlin((L, D, Hq * Dh), 5),
            "wk": qlin((L, D, Hkv * Dh), 7),
            "wv": qlin((L, D, Hkv * Dh), 11),
            "wo": qlin((L, Hq * Dh, D), 13),
            "wg": qlin((L, D, F), 17),
            "wu": qlin((L, D, F), 19),
            "wd": qlin((L, F, D), 23),
            "ln_attn": jnp.ones((L, D), jnp.bfloat16),
            "ln_mlp": jnp.ones((L, D), jnp.bfloat16),
        },
    }


def fake_int4_params(cfg, group=128, layout="arith"):
    """Deterministic int4 weights (group-128 scales), built host-side like
    fake_int8_params. layout="arith" (the r3 default — plain-int8 carrier
    consumed by the fused one-call decode kernel) or "halves" (bit-packed,
    s4-materialized, the r2 path; EASYKV_BENCH_W4_LAYOUT=halves). The lm
    head stays int8 (the production quantize_params_int4 default)."""
    L, D, F = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    Hq, Hkv, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    V = cfg.vocab_size

    def qlin4(shape, seed):
        K = shape[-2]
        pshape = shape[:-2] + (K // 2, shape[-1])
        gshape = shape[:-2] + (K // group, shape[-1])
        gs = jnp.full(gshape, (K ** -0.5) / 7.0, jnp.float32)
        if layout == "arith":
            # arithmetic carrier: any byte of the form 16*hi+lo with nibbles
            # in [-7,7] == any value in [-119, 119]
            return {"q4a": _dev_bytes(tuple(pshape), 239, seed), "gs": gs}
        # on-device nibble pack: two 4-bit values per byte
        lo = _dev_bytes(tuple(pshape), 15, seed)
        hi = _dev_bytes(tuple(pshape), 15, seed + 1)
        packed = jnp.bitwise_or(jnp.bitwise_and(lo, jnp.int8(0x0F)),
                                jnp.left_shift(hi, 4))
        return {"q4p": packed, "gs": gs}

    base = fake_int8_params(cfg)
    return {
        "embed": base["embed"],
        "final_norm": base["final_norm"],
        "lm_head": base["lm_head"],
        "layers": {
            "wq": qlin4((L, D, Hq * Dh), 5),
            "wk": qlin4((L, D, Hkv * Dh), 7),
            "wv": qlin4((L, D, Hkv * Dh), 11),
            "wo": qlin4((L, Hq * Dh, D), 13),
            "wg": qlin4((L, D, F), 17),
            "wu": qlin4((L, D, F), 19),
            "wd": qlin4((L, F, D), 23),
            "ln_attn": base["layers"]["ln_attn"],
            "ln_mlp": base["layers"]["ln_mlp"],
        },
    }


def main():
    from easykv_tpu import CausalLM, ModelConfig, generate
    from easykv_tpu.models import llama

    platform = jax.default_backend()
    on_tpu = platform == "tpu"
    log(f"backend={platform} devices={jax.devices()}")

    import os

    if on_tpu:
        cfg = ModelConfig(
            vocab_size=32000, hidden_size=4096, intermediate_size=11008,
            num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=32,
            max_position_embeddings=4096,
        )
        prompt_len, gen_tokens, budget = 512, 384, 200
        # int4 (w4a16 group-128) is the headline format; int8 (w8a16) is
        # measured as the `secondary` field so the driver-visible trend line
        # covers both (VERDICT r2 weak #7). Current numbers live in
        # RESULTS.md. EASYKV_BENCH_WEIGHTS=int4|int8 runs one format only.
        formats = {"both": ("int4", "int8"), "int4": ("int4",),
                   "int8": ("int8",)}[
                       os.environ.get("EASYKV_BENCH_WEIGHTS", "both")]
    else:
        cfg = ModelConfig(
            vocab_size=1024, hidden_size=256, intermediate_size=688,
            num_hidden_layers=4, num_attention_heads=8, num_key_value_heads=8,
            max_position_embeddings=2048,
        )
        prompt_len, gen_tokens, budget = 128, 64, 48
        formats = ("tiny_cpu",)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, cfg.vocab_size, size=(prompt_len,))

    def build_model(fmt):
        if fmt == "tiny_cpu":
            params = llama.init_params(cfg, jax.random.PRNGKey(0),
                                       dtype=jnp.float32)
            return CausalLM(cfg, params, dtype="float32"), "tiny_cpu"
        t0 = time.time()
        lay = os.environ.get("EASYKV_BENCH_W4_LAYOUT", "arith")
        params = (fake_int4_params(cfg, layout=lay) if fmt == "int4"
                  else fake_int8_params(cfg))
        if os.environ.get("EASYKV_BENCH_FUSED", "1") != "0":
            # fused wqkv/wgu single-GEMV layout: 4 weight streams per layer
            # instead of 7 (bit-exact; test_quant.py::test_fused_gemv_params)
            from easykv_tpu.ops.quant import fuse_gemv_params

            params = fuse_gemv_params(params)
        jax.block_until_ready(params)
        log(f"7B {fmt} params built in {time.time()-t0:.1f}s")
        # int8 compressed-KV: the production configuration — measured FASTER
        # than bf16 KV at 7B (the Pallas decode kernel streams KV at half
        # the bytes)
        model = CausalLM(cfg, params, dtype="bfloat16", kv_quant=True)
        return model, f"llama2_7b_{fmt}w_int8kv"

    def run(model, policy, budget_arg):
        gc = {
            "budget": budget_arg, "kv_policy": policy,
            "max_new_tokens": gen_tokens, "temperature": 1.0, "top_p": 0.95,
            "eos_token_ids": [],
        }
        import contextlib

        t0 = time.time()
        # engine report strings (budget ratio etc.) go to stdout for
        # reference parity — keep bench stdout to the single JSON line
        with contextlib.redirect_stdout(sys.stderr):
            generate(model, ids, gc, kv_mode="decoding", stride=1)
        log(f"  {policy}: warm-up (compile+run) {time.time()-t0:.1f}s")
        t0 = time.time()
        with contextlib.redirect_stdout(sys.stderr):
            generate(model, ids, gc, kv_mode="decoding", stride=1)
        dt = time.time() - t0
        tps = gen_tokens / dt
        log(f"  {policy}: {gen_tokens} tokens in {dt:.2f}s -> {tps:.2f} tok/s")
        return tps

    def run_batched(model, B):
        gc = {
            "budget": budget, "kv_policy": "roco",
            "max_new_tokens": gen_tokens, "temperature": 1.0, "top_p": 0.95,
            "eos_token_ids": [],
        }
        import contextlib

        ids_b = np.broadcast_to(ids, (B, ids.shape[-1])).copy()
        t0 = time.time()
        with contextlib.redirect_stdout(sys.stderr):
            generate(model, ids_b, gc, kv_mode="decoding", stride=1)
        log(f"  B={B}: warm-up (compile+run) {time.time()-t0:.1f}s")
        t0 = time.time()
        with contextlib.redirect_stdout(sys.stderr):
            # different seed: a bit-identical repeat can return ~instantly
            generate(model, ids_b, {**gc, "seed": 1}, kv_mode="decoding",
                     stride=1)
        dt = time.time() - t0
        tps = B * gen_tokens / dt
        log(f"  B={B}: {B * gen_tokens} tokens in {dt:.2f}s -> "
            f"{tps:.1f} tok/s aggregate")
        return tps

    results = []
    for fmt in formats:
        model, name = build_model(fmt)
        log(f"[{name}] benchmarking budgeted decode (roco, budget={budget})...")
        tps_budget = run(model, "roco", budget)
        log(f"[{name}] benchmarking full-cache decode...")
        tps_full = run(model, "full", budget)
        results.append({
            "metric": f"decode_tokens_per_sec_{name}_budget{budget}",
            "value": round(tps_budget, 2),
            "unit": "tokens/s/chip",
            "vs_baseline": round(tps_budget / tps_full, 4),
        })
        if fmt == "int4" and on_tpu:
            # batched serving aggregate through the B>1 mega kernel
            # (RESULTS.md "r4 batched mega"); vs_baseline = batching
            # efficiency (aggregate / B*single-stream)
            tps_b8 = run_batched(model, 8)
            results.append({
                "metric": f"decode_tokens_per_sec_{name}_b8_aggregate",
                "value": round(tps_b8, 1),
                "unit": "tokens/s/chip",
                "vs_baseline": round(tps_b8 / (8 * tps_budget), 4),
            })
        del model  # free device HBM before building the next format

    result = results[0]
    if len(results) > 1:
        result["secondary"] = results[1:]
    print(json.dumps(result))


if __name__ == "__main__":
    main()
