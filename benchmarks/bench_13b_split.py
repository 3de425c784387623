"""Full-depth (L=40) LLaMa2-13B int4 decode on one 16 GB v5e via SPLIT
EXECUTION (VERDICT r4 #5).

The tunneled axon runtime caps the per-EXECUTION working set at ~6-7 GB
(bench_13b.py pins the constraint: L=40 ResourceExhausted, L=32 runs, 10 GB
resident idle is fine). 13B int4 weights are 7.3 GB, so the decode step is
partitioned into TWO jitted executables of 20 layers each (~3.7 GB weights
+ its cache half per execution) driven by a HOST loop:

  f1(half1, cache1, token)  -> h_mid, cache1'   (embed + layers 0..19)
  f2(half2, cache2, h_mid)  -> token', cache2'  (layers 20..39 + head +
                                                 sample + sidecar/evict)

Token and h_mid stay on device; the host pays 2 dispatches/step through
the tunnel. Each half runs the same mega-kernel + fused-sidecar +
fold-evict step the engine uses, so the number is the engine path's cost
plus the measured split overhead (also reported, via a dispatch probe).

  python benchmarks/bench_13b_split.py     # on the TPU host
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

P_LEN, GEN, BUDGET = 512, 256, 200
S = ((P_LEN + BUDGET + 1 + 127) // 128) * 128
HL = 20   # layers per half


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from bench import fake_int4_params
    from easykv_tpu import ModelConfig
    from easykv_tpu.cache import KVCache, init_cache, quantize_kv
    from easykv_tpu.models import llama
    from easykv_tpu.models.llama import StepCtx, _logits_tail
    from easykv_tpu.ops.pallas.fused_decode import fused_decode_step
    from easykv_tpu.ops.pallas.sidecar_update import fused_write_update
    from easykv_tpu.ops.quant import fuse_gemv_params, materialize_params
    from easykv_tpu.policies import PHASE_DECODE, PolicySpec
    from easykv_tpu.sampling import sample_topp

    assert jax.default_backend() == "tpu", "run on the TPU host"

    # half-model config: 20 layers of the 13B architecture
    cfg = ModelConfig(
        vocab_size=32000, hidden_size=5120, intermediate_size=13824,
        num_hidden_layers=HL, num_attention_heads=40,
        num_key_value_heads=40, max_position_embeddings=4096,
    )
    D, H, DH = cfg.hidden_size, cfg.num_key_value_heads, cfg.head_dim

    t0 = time.time()
    halves = []
    for part in ("embed", "head"):
        p = jax.jit(materialize_params)(fuse_gemv_params(
            fake_int4_params(cfg)))
        # strip what this half never touches — the dead embed/lm_head
        # otherwise rides along in the execution working set (the tunnel
        # caps it at ~6-7 GB; bench_13b.py pinned the constraint)
        keep = ("embed", "layers") if part == "embed" else (
            "final_norm", "lm_head", "layers")
        halves.append({kk: p[kk] for kk in keep})
        del p
    jax.block_until_ready(halves)
    log(f"2x 20-layer 13B halves built in {time.time()-t0:.1f}s "
        f"(full-depth L={2*HL})")

    rw = int(BUDGET * 0.3)
    spec = PolicySpec("roco", PHASE_DECODE, 1, 4, rw,
                      feasible_k=max(BUDGET - rw, 1), protect_prompt=True)

    rng = np.random.default_rng(0)
    valid = np.zeros((HL, 1, H, S), bool)
    valid[..., : P_LEN + BUDGET] = True
    pos0 = np.where(valid, np.arange(S)[None, None, None, :], -1).astype(
        np.int32)
    score0 = np.where(valid, rng.random((HL, 1, H, S)), 0).astype(np.float32)

    def make_cache():
        return KVCache(
            k=jnp.asarray(rng.integers(-100, 100, (HL, 1, H, S, DH)),
                          jnp.int8),
            v=jnp.asarray(rng.integers(-100, 100, (HL, 1, H, S, DH)),
                          jnp.int8),
            pos=jnp.asarray(pos0),
            score=jnp.asarray(score0),
            score_sq=jnp.asarray(score0 * score0),
            counter=jnp.asarray(np.where(
                valid, rng.integers(1, 50, (HL, 1, H, S)), 0).astype(
                    np.float32)),
            k_scale=jnp.full((HL, 1, H, S), 1e-2, jnp.float32),
            v_scale=jnp.full((HL, 1, H, S), 1e-2, jnp.float32),
        )

    # numpy constants: device-array closures would be re-downloaded at
    # trace time to embed as HLO constants
    ones1 = np.ones((1,), bool)
    zeros1i = np.zeros((1,), np.int32)
    zeros1f = np.zeros((1,), np.float32)
    prompt_len = np.full((1,), P_LEN, np.int32)
    sync = os.environ.get("EASYKV_13B_SYNC", "0") not in ("0", "", "off")

    def half_step(params, cache, h, n):
        """One 20-layer mega-kernel pass + fused sidecar/evict + row write
        (mirrors llama._decode_forward's folded path at these shapes)."""
        lyr = params["layers"]
        q_pos = jnp.full((1,), P_LEN + BUDGET, jnp.int32) + n
        hm, kn_m, vn_m, probs_m, pnew_m = fused_decode_step(
            lyr, cfg, cache.k, cache.v, cache.pos, h, q_pos,
            k_scale=cache.k_scale, v_scale=cache.v_scale)
        kn = kn_m[:, None]
        vn = vn_m[:, None]
        probs = probs_m[:, None, :, 0, :]
        p_new = pnew_m[:, None, :, None]
        k_w, k_sc = quantize_kv(kn)
        v_w, v_sc = quantize_kv(vn)
        res = fused_write_update(
            cache.pos, cache.score, cache.score_sq, cache.counter,
            probs, p_new, q_pos, ones1, ones1, zeros1f,
            policy=spec.policy, espec=spec, evict_gate=ones1,
            next_pos=q_pos + 1, prompt_len=prompt_len, rand_rank=zeros1i,
            k_sc_new=k_sc, v_sc_new=v_sc,
            k_scale=cache.k_scale, v_scale=cache.v_scale)
        pos, score, ssq, counter, ids = res[:5]
        l_ix = jnp.arange(HL)[:, None, None, None]
        b_ix = jnp.zeros((1,), jnp.int32)[None, :, None, None]
        h_ix = jnp.arange(H)[None, None, :, None]
        cache = cache._replace(
            pos=pos, score=score, score_sq=ssq, counter=counter,
            k_scale=res[5], v_scale=res[6],
            k=cache.k.at[l_ix, b_ix, h_ix, ids].set(k_w),
            v=cache.v.at[l_ix, b_ix, h_ix, ids].set(v_w),
        )
        return hm, cache

    @jax.jit
    def f1(params, cache, token, n):
        h = jnp.take(params["embed"], token, axis=0)      # (1, D)
        hm, cache = half_step(params, cache, h, n)
        return hm, cache

    @jax.jit
    def f2(params, cache, h_mid, n, key):
        hm, cache = half_step(params, cache, h_mid, n)
        logits = _logits_tail(hm[:, None], params, cfg)[:, 0]
        key, sub = jax.random.split(key)
        token = sample_topp(sub, logits, jnp.float32(1.0), jnp.float32(0.95))
        # n increments ON DEVICE (an eager `n + 1` through the tunnel costs
        # ~0.4 s; a fresh host int32 per step costs a tunnel upload)
        return token, cache, key, n + 1

    cache1, cache2 = make_cache(), make_cache()
    token = jnp.asarray([17], jnp.int32)
    key = jax.random.PRNGKey(0)

    # dispatch-overhead probe: back-to-back no-op-sized jitted calls
    @jax.jit
    def tiny(x):
        return x + 1

    x = jnp.zeros((8, 128), jnp.float32)
    x = tiny(x)
    np.asarray(x)
    t0 = time.time()
    for _ in range(64):
        x = tiny(x)
    np.asarray(x)
    disp = (time.time() - t0) / 64 * 1e3
    log(f"host-loop dispatch probe (chained, forced readback): "
        f"{disp:.3f} ms/call")

    n = jnp.int32(0)

    def run(steps):
        nonlocal cache1, cache2, token, key, n
        t0 = time.time()
        for _ in range(steps):
            h_mid, cache1 = f1(halves[0], cache1, token, n)
            if sync:
                # serialize the two executions (EASYKV_13B_SYNC=1): caps
                # the instantaneous working set at one half, at the cost
                # of a host sync per step
                jax.block_until_ready(h_mid)
            token, cache2, key, n = f2(halves[1], cache2, h_mid, n, key)
        np.asarray(token)  # forced readback: through the tunnel,
        # block_until_ready returns before execution finishes (CLAUDE.md)
        return time.time() - t0

    run(4)  # warm-up/compile
    log("warm-up done; timing...")
    times = []
    for _ in range(3):
        dt = run(GEN)
        times.append(dt)
        log(f"  {GEN} steps in {dt:.2f}s -> {GEN/dt:.1f} tok/s")
    best = min(times)
    log(f"13B FULL-DEPTH (2x{HL} layers, split execution): "
        f"{GEN/best:.1f} tok/s budgeted; dispatch probe {disp:.3f} ms")


if __name__ == "__main__":
    main()
