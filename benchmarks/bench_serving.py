"""Serving-stack throughput on TPU (VERDICT r4 #6): ScheduledBatchEngine
(C++ continuous-batching scheduler + chunked prefill + slot recycling)
driving 7B int4 decode — the first TPU timing of the serving layer itself.

Reports aggregate tok/s over a mixed-prompt-length request set plus
p50/p95 inter-token latency, to be read against the raw-engine B=8
aggregate (bench_b8.py / bench.py b8 secondary): the delta is
scheduler/host overhead (host plan + per-tick readbacks/uploads through
the tunnel).

  python benchmarks/bench_serving.py          # on the TPU host
  EASYKV_BENCH_SLOTS=8 EASYKV_BENCH_REQS=16 to vary load
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/easykv_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from bench import fake_int4_params
    from easykv_tpu import CausalLM, ModelConfig
    from easykv_tpu.ops.quant import fuse_gemv_params
    from easykv_tpu.serving.engine import Request
    from easykv_tpu.serving.scheduled import ScheduledBatchEngine

    assert jax.default_backend() == "tpu", "run on the TPU host"
    slots = int(os.environ.get("EASYKV_BENCH_SLOTS", "8"))
    n_reqs = int(os.environ.get("EASYKV_BENCH_REQS", "16"))
    gen = int(os.environ.get("EASYKV_BENCH_GEN", "128"))

    cfg = ModelConfig(
        vocab_size=32000, hidden_size=4096, intermediate_size=11008,
        num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=32,
        max_position_embeddings=4096,
    )
    t0 = time.time()
    params = fuse_gemv_params(fake_int4_params(cfg))
    jax.block_until_ready(params)
    log(f"7B int4 params built in {time.time()-t0:.1f}s")
    model = CausalLM(cfg, params, dtype="bfloat16", kv_quant=True)

    rng = np.random.default_rng(0)
    lengths = rng.integers(128, 513, size=n_reqs)

    def make_engine():
        return ScheduledBatchEngine(
            model, batch_slots=slots, max_prompt=512, budget=200,
            kv_policy="roco", temperature=1.0, top_p=0.95,
            prefill_chunk=128, seed=0,
        )

    def run(measure):
        eng = make_engine()
        for i, T in enumerate(lengths):
            eng.submit(Request(
                request_id=i,
                ids=rng.integers(1, cfg.vocab_size, size=int(T)),
                max_new_tokens=gen,
            ))
        emit_times = {}       # rid -> [t, ...]
        tick_times = []
        total = 0
        t0 = time.time()
        while eng.requests or eng.sched.num_waiting:
            tt0 = time.time()
            emitted = eng.tick()
            now = time.time()
            tick_times.append(now - tt0)
            for rid, _tok in emitted:
                emit_times.setdefault(rid, []).append(now)
            total += len(emitted)
            if not emitted and now - t0 > 600:
                log("stalled; aborting")
                break
        wall = time.time() - t0
        if not measure:
            return None
        itls = []
        for rid, ts in emit_times.items():
            itls.extend(np.diff(ts))
        itls = np.asarray(itls) * 1e3
        return wall, total, tick_times, itls

    log("warm-up run (compiles)...")
    t0 = time.time()
    run(False)
    log(f"warm-up {time.time()-t0:.1f}s; measuring...")
    wall, total, tick_times, itls = run(True)
    tps = total / wall
    log(f"requests={n_reqs} slots={slots} gen<={gen}: "
        f"{total} tokens in {wall:.2f}s -> {tps:.1f} tok/s aggregate")
    log(f"tick: n={len(tick_times)} mean {np.mean(tick_times)*1e3:.2f} ms "
        f"p50 {np.percentile(tick_times, 50)*1e3:.2f} "
        f"p95 {np.percentile(tick_times, 95)*1e3:.2f}")
    if len(itls):
        log(f"inter-token latency: p50 {np.percentile(itls, 50):.2f} ms "
            f"p95 {np.percentile(itls, 95):.2f} ms")


if __name__ == "__main__":
    main()
