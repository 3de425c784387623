"""Cumulative ablation of the layer-major strided-encode inner loop (TPU).

Monkeypatches the per-chunk ops out one at a time (production -> -evict ->
-score-update -> -attend -> -write) and times the strided phase at 7B
int8-weights + int8-KV roco shapes, so each delta itemizes one op's cost in
situ (including its share of the scan/dispatch overhead). Each variant is a
fresh jax.jit closure — monkeypatches bind at trace time.
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
    import easykv_tpu.policies as policies
    from easykv_tpu import ModelConfig
    from easykv_tpu.cache import init_cache
    from easykv_tpu.engine.generate import (
        EngineStatics, _prefill_layer_major, _strided_encode_layer_major,
        stride_align,
    )
    from easykv_tpu.models import llama

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        cfg = ModelConfig(
            vocab_size=32000, hidden_size=4096, intermediate_size=11008,
            num_hidden_layers=32, num_attention_heads=32,
            num_key_value_heads=32, max_position_embeddings=8192,
        )
        length, stride = 4096, 96
        params = benchmod.fake_int8_params(cfg)
        dtype, kvq = "bfloat16", True
    else:
        cfg = ModelConfig(
            vocab_size=512, hidden_size=128, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=2048,
        )
        length, stride = 512, 16
        params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
        dtype, kvq = "float32", False
    jax.block_until_ready(params)

    B = 1
    ids = jnp.asarray(
        np.random.default_rng(0).integers(1, cfg.vocab_size, size=(B, length)),
        jnp.int32)
    budget = int(length * 0.5)
    idx, r_idx = stride_align(length, budget, stride)
    st = EngineStatics(
        cfg=cfg, mode="encoding", length=length, budget=budget, idx=idx,
        r_idx=r_idx, stride=stride, policy="roco", keep_attention=False,
        temp_length=4, recent_window=int(budget * 0.1),
        recent_window_dec=int(budget * 0.3), max_new_tokens=1,
        eos_token_ids=(), streaming=False, dtype=dtype, kv_quant=kvq,
    )
    S = ((idx + stride + 127) // 128) * 128
    spec = st.encode_spec()
    seed = jax.random.PRNGKey(0)
    prefix_len = jnp.full((B,), r_idx, jnp.int32)
    PC = int(os.environ.get("EASYKV_TPU_PREFILL_CHUNK", "128"))
    A_pad = ((r_idx + PC - 1) // PC) * PC
    n_strided = length - r_idx

    orig = dict(
        evict_layer=policies.evict_layer,
        update_scores_reduced=llama.update_scores_reduced,
        update_scores=llama.update_scores,
        chunk_attend=llama._chunk_attend,
        write_tokens_at=llama.write_tokens_at,
        write_tokens_dense=llama.write_tokens_dense,
    )

    def stub_evict(cl, spec_, next_pos, prompt_len, rand_rank, gate):
        eids = jnp.zeros(cl.pos.shape[:2] + (stride,), jnp.int32)
        return cl, eids

    def stub_scores(cl, *a, **kw):
        return cl

    def stub_attend(cl, q_c, q_pos, need):
        # keep the K/V-projection + write pipeline alive (a pure-zeros out
        # would let XLA DCE everything upstream of the attend)
        t = (cl.k.reshape(-1)[0].astype(jnp.float32) * 0
             + cl.v.reshape(-1)[0].astype(jnp.float32) * 0)
        Sl = cl.pos.shape[-1]
        z3 = jnp.zeros(cl.pos.shape[:2] + (Sl,), jnp.float32)
        return q_c + t.astype(q_c.dtype), z3, z3, z3

    def stub_write(cl, *a, **kw):
        return cl

    levels = [
        ("production (roco, chunk kernel auto)", {}),
        ("- evict_layer", {"evict": True}),
        ("- score update", {"evict": True, "scores": True}),
        ("- attend", {"evict": True, "scores": True, "attend": True}),
        ("- write_tokens_at",
         {"evict": True, "scores": True, "attend": True, "write": True}),
    ]

    @jax.jit
    def run_prefix(params, ids):
        cache = init_cache(cfg.num_hidden_layers, B, cfg.num_key_value_heads,
                           S, cfg.head_dim,
                           dtype=jnp.bfloat16 if on_tpu else jnp.float32,
                           quantized=kvq)
        ids_p = jnp.pad(ids[:, :r_idx], ((0, 0), (0, A_pad - r_idx)))
        cache, ll = _prefill_layer_major(
            st, params, cache, ids_p, prefix_len, None, "encode", PC)
        return ll, cache

    t0 = time.perf_counter()
    np.asarray(jax.block_until_ready(run_prefix(params, ids)[0]))
    log(f"prefix compile+run {time.perf_counter() - t0:.1f}s "
        f"(r_idx={r_idx} idx={idx} S={S})")
    pre = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run_prefix(params, ids)[0])
        pre.append(time.perf_counter() - t0)
    p = float(np.median(pre))
    log(f"prefix  {p:6.3f}s ({r_idx / p:8.1f} tok/s over {r_idx})")

    prev = None
    for name, cut in levels:
        policies.evict_layer = stub_evict if cut.get("evict") else orig["evict_layer"]
        llama.update_scores_reduced = (stub_scores if cut.get("scores")
                                       else orig["update_scores_reduced"])
        llama.update_scores = (stub_scores if cut.get("scores")
                               else orig["update_scores"])
        llama._chunk_attend = (stub_attend if cut.get("attend")
                               else orig["chunk_attend"])
        llama.write_tokens_at = (stub_write if cut.get("write")
                                 else orig["write_tokens_at"])
        llama.write_tokens_dense = (stub_write if cut.get("write")
                                    else orig["write_tokens_dense"])

        @jax.jit
        def run_full(params, ids):
            ll, cache = run_prefix.__wrapped__(params, ids)
            cache, last, _, kv_len = _strided_encode_layer_major(
                st, params, cache, ids, spec, seed, False, ll)
            return last

        try:
            t0 = time.perf_counter()
            np.asarray(jax.block_until_ready(run_full(params, ids)))
            log(f"[{name}] compile+run {time.perf_counter() - t0:.1f}s")
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(run_full(params, ids))
                ts.append(time.perf_counter() - t0)
        finally:
            policies.evict_layer = orig["evict_layer"]
            llama.update_scores_reduced = orig["update_scores_reduced"]
            llama.update_scores = orig["update_scores"]
            llama._chunk_attend = orig["chunk_attend"]
            llama.write_tokens_at = orig["write_tokens_at"]
            llama.write_tokens_dense = orig["write_tokens_dense"]
        f = float(np.median(ts))
        s = f - p
        delta = "" if prev is None else f"  (op cost {prev - s:+6.3f}s)"
        log(f"[{name}] strided {s:6.3f}s "
            f"({n_strided / s:8.1f} tok/s over {n_strided}){delta}")
        prev = s


if __name__ == "__main__":
    main()
