"""Strided-encode cost decomposition at 7B-int8-KV shapes (TPU).

Builds the layer-major encode structure piece by piece to find the binding
cost — cumulative variants, interleaved reps, np.asarray readback:

  A. weights-only: per layer, whole-width QKV + (fake) attn-out + MLP
     matmuls, attention replaced by a reshape of v (no cache at all)
  B. + attend: per-chunk XLA attention (+ GQA probs) vs a STATIC int8 cache
     (kv_dequant materialization included), no cache mutation
  C. + write_tokens (free-slot sort + 8-buffer scatter) per chunk
  D. + update_scores (roco) per chunk
  E. + evict_layer (bump/select/invalidate, every saturated chunk)

E is the full layer-major path. Chunk-major re-runs the weight pass per
chunk; its A-equivalent would be ~n_chunks slower, everything else equal.
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
    import bench as benchmod
    from easykv_tpu import ModelConfig
    from easykv_tpu.cache import init_cache, write_tokens, kv_dequant, LayerCache, KVCache
    from easykv_tpu.engine.generate import EngineStatics, _encode_counter_init
    from easykv_tpu.models import llama
    from easykv_tpu.models.llama import StepCtx, rmsnorm, _proj_qkv, _mlp
    from easykv_tpu.ops.attention import attend
    from easykv_tpu.ops.quant import mm, fuse_gemv_params
    from easykv_tpu.ops.rope import apply_rope, rope_base_for, rope_inv_freq
    from easykv_tpu.policies import PolicySpec, PHASE_ENCODE, update_scores, evict_layer

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        cfg = ModelConfig(
            vocab_size=32000, hidden_size=4096, intermediate_size=11008,
            num_hidden_layers=32, num_attention_heads=32,
            num_key_value_heads=32, max_position_embeddings=8192,
        )
        T, stride = 3840, 96  # the strided part after a r_idx=256-ish prefix
        params = benchmod.fake_int8_params(cfg)
    else:
        cfg = ModelConfig(
            vocab_size=512, hidden_size=128, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=2048,
        )
        T, stride = 256, 16
        params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    jax.block_until_ready(params)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    B = 1
    n = T // stride
    idx = T // 2
    S = ((idx + stride + 127) // 128) * 128
    Hq, Hkv, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    inv_freq = rope_inv_freq(cfg.head_dim, rope_base_for(cfg))
    scale = cfg.head_dim ** -0.5
    spec = PolicySpec(policy="roco", phase=PHASE_ENCODE, k=stride,
                      sink_length=4, recent_window=int(idx * 0.1),
                      feasible_k=max(idx - int(idx * 0.1) - 4, stride))

    starts = stride * np.arange(n)
    pos = jnp.asarray(starts[:, None] + np.arange(stride)[None, :], jnp.int32)
    trig_l, kv = [], 0
    for _ in range(n):
        t = kv + stride > idx
        trig_l.append(t)
        kv = kv + stride - (stride if t else 0)
    trig = jnp.asarray(trig_l, bool)
    ctxs = StepCtx(
        q_pos=jnp.broadcast_to(pos[:, None, :], (n, B, stride)),
        token_valid=jnp.ones((n, B, stride), bool),
        counter_init=jnp.broadcast_to(
            _encode_counter_init(pos, idx, stride, False)[:, None, :],
            (n, B, stride)).astype(jnp.float32),
        next_pos=jnp.broadcast_to(
            jnp.asarray(starts + stride, jnp.int32)[:, None], (n, B)),
        prompt_len=jnp.zeros((n, B), jnp.int32),
        evict_gate=jnp.broadcast_to(trig[:, None], (n, B)),
        update_gate=jnp.broadcast_to(trig[:, None], (n, B)),
        rand_rank=jnp.zeros((n, B), jnp.int32),
    )
    token_ids = jnp.ones((B, T), jnp.int32)

    def make_run(level):
        @jax.jit
        def run(params, cache, token_ids):
            q_pos_flat = ctxs.q_pos.transpose(1, 0, 2).reshape(B, T)
            h = jnp.take(params["embed"], token_ids, axis=0)

            def layer(h, xs):
                p, cl0 = xs
                x = rmsnorm(h, p["ln_attn"], cfg.rms_norm_eps)
                q, k, v = _proj_qkv(x, p, B, T, Hq, Hkv, Dh)
                q = apply_rope(q, q_pos_flat[:, None, :], inv_freq)
                k = apply_rope(k, q_pos_flat[:, None, :], inv_freq)
                if level == "A":
                    attn_out = (v.transpose(0, 2, 1, 3)
                                .reshape(B, T, Hkv * Dh))
                    attn_out = jnp.tile(attn_out, (1, 1, Hq // Hkv))
                    cl_t = tuple(LayerCache(*cl0))
                else:
                    qc = q.reshape(B, Hq, n, stride, Dh).transpose(2, 0, 1, 3, 4)
                    kc = k.reshape(B, Hkv, n, stride, Dh).transpose(2, 0, 1, 3, 4)
                    vc = v.reshape(B, Hkv, n, stride, Dh).transpose(2, 0, 1, 3, 4)

                    def chunk(cl_t, cxs):
                        cl = LayerCache(*cl_t)
                        q_c, k_c, v_c, ctx = cxs
                        if level >= "C":
                            cl = write_tokens(cl, k_c, v_c, ctx.q_pos,
                                              ctx.counter_init, ctx.token_valid)
                        k_raw, v_raw = kv_dequant(cl, q_c.dtype)
                        out, probs = attend(q_c, k_raw, v_raw, cl.pos,
                                            ctx.q_pos, scale=scale)
                        if level >= "D":
                            cl = update_scores(cl, probs, spec, ctx.update_gate)
                        if level >= "E":
                            cl, _ = evict_layer(cl, spec, ctx.next_pos,
                                                ctx.prompt_len, ctx.rand_rank,
                                                ctx.evict_gate)
                        return tuple(cl), out

                    cl_t, outs = jax.lax.scan(chunk, tuple(LayerCache(*cl0)),
                                              (qc, kc, vc, ctxs))
                    attn_out = outs.transpose(1, 0, 3, 2, 4).reshape(B, T, Hq * Dh)
                h = h + mm(attn_out, p["wo"])
                x2 = rmsnorm(h, p["ln_mlp"], cfg.rms_norm_eps)
                h = h + _mlp(x2, p)
                return h, cl_t

            h, _ = jax.lax.scan(layer, h, (params["layers"], tuple(cache)))
            return h[:, -1]

        return run

    cache0 = init_cache(cfg.num_hidden_layers, B, Hkv, S, Dh, dtype=dtype,
                        quantized=on_tpu)
    if on_tpu:
        # pre-fill the static cache for level B (valid slots to attend over)
        cache0 = cache0._replace(
            pos=jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, cache0.pos.shape, 3) < idx,
                jax.lax.broadcasted_iota(jnp.int32, cache0.pos.shape, 3), -1),
            counter=jnp.ones_like(cache0.counter),
        )
    levels = ["A", "B", "C", "D", "E"]
    runs = {lv: make_run(lv) for lv in levels}
    for lv in levels:
        t0 = time.perf_counter()
        np.asarray(jax.block_until_ready(runs[lv](params, cache0, token_ids)))
        log(f"compile+run {lv}: {time.perf_counter() - t0:.1f}s")
    res = {lv: [] for lv in levels}
    for rep in range(3):
        for lv in levels:
            t0 = time.perf_counter()
            np.asarray(runs[lv](params, cache0, token_ids))
            res[lv].append(time.perf_counter() - t0)
    for lv in levels:
        med = float(np.median(res[lv]))
        log(f"{lv}: {med:6.3f} s  ({T / med:8.1f} tok/s)")


if __name__ == "__main__":
    main()
