"""Scheduled (native-scheduler-driven) serving engine: greedy parity with
the single-request engine, and chunked-prefill interleaving with decode."""
import numpy as np

import jax

from easykv_tpu import CausalLM, ModelConfig, generate
from easykv_tpu.models import llama
from easykv_tpu.serving import Request
from easykv_tpu.serving.scheduled import ScheduledBatchEngine


def make_model():
    cfg = ModelConfig(
        vocab_size=96, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    return CausalLM(cfg, params)


def test_scheduled_greedy_matches_single_request():
    model = make_model()
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, 90, size=(n,)) for n in (17, 23, 9)]
    singles = [
        generate(model, p,
                 {"budget": 8, "kv_policy": "roco", "max_new_tokens": 10,
                  "temperature": 1e-9, "top_p": 1.0, "eos_token_ids": []},
                 kv_mode="decoding")
        for p in prompts
    ]
    eng = ScheduledBatchEngine(model, batch_slots=2, max_prompt=64, budget=8,
                               kv_policy="roco", temperature=1e-9, top_p=1.0,
                               prefill_chunk=16)
    for i, p in enumerate(prompts):
        eng.submit(Request(request_id=i, ids=p, max_new_tokens=10))
    outs = eng.run_all()
    assert set(outs) == {0, 1, 2}
    for i in range(3):
        assert outs[i] == singles[i], f"request {i} diverged"


def test_prefill_interleaves_with_decode():
    model = make_model()
    rng = np.random.default_rng(1)
    short = rng.integers(1, 90, size=(8,))
    long = rng.integers(1, 90, size=(60,))
    eng = ScheduledBatchEngine(model, batch_slots=2, max_prompt=64, budget=8,
                               kv_policy="recency", temperature=1e-9, top_p=1.0,
                               prefill_chunk=16)
    eng.submit(Request(request_id=1, ids=short, max_new_tokens=12))
    # let request 1 start decoding
    for _ in range(3):
        eng.tick()
    eng.submit(Request(request_id=2, ids=long, max_new_tokens=4))
    # the long prompt needs 4 prefill ticks; request 1 must keep emitting
    # tokens during them
    emitted_during_prefill = []
    for _ in range(4):
        ev = eng.tick()
        emitted_during_prefill.extend(rid for rid, _ in ev)
    assert 1 in emitted_during_prefill, "decode stalled during chunked prefill"
    outs = eng.run_all()
    assert len(outs[1]) == 12 and len(outs[2]) == 4


def test_simultaneous_multi_request_prefill_one_dispatch():
    """Two requests submitted together prefill their chunks in the SAME
    merged tick (one dispatch), and their outputs still match the
    single-request engine exactly."""
    model = make_model()
    rng = np.random.default_rng(2)
    prompts = [rng.integers(1, 90, size=(n,)) for n in (14, 11)]
    singles = [
        generate(model, p,
                 {"budget": 8, "kv_policy": "roco", "max_new_tokens": 8,
                  "temperature": 1e-9, "top_p": 1.0, "eos_token_ids": []},
                 kv_mode="decoding")
        for p in prompts
    ]
    eng = ScheduledBatchEngine(model, batch_slots=2, max_prompt=64, budget=8,
                               kv_policy="roco", temperature=1e-9, top_p=1.0,
                               prefill_chunk=16)
    for i, p in enumerate(prompts):
        eng.submit(Request(request_id=i, ids=p, max_new_tokens=8))
    # first tick: the plan must hold BOTH prefill chunks (chunk_cap == pc,
    # budget == B*pc), and both first tokens must be emitted together
    ev = eng.tick()
    assert sorted(rid for rid, _ in ev) == [0, 1], ev
    outs = eng.run_all()
    for i in range(2):
        assert outs[i] == singles[i], f"request {i} diverged"


def test_merged_tick_decode_rides_prefill_dispatch():
    """A decoding request keeps emitting while a newcomer prefills — in the
    SAME merged dispatch (no separate decode step on prefill ticks)."""
    from easykv_tpu.serving import scheduled as sched_mod

    model = make_model()
    rng = np.random.default_rng(3)
    a = rng.integers(1, 90, size=(10,))
    b = rng.integers(1, 90, size=(48,))
    single_a = generate(model, a,
                        {"budget": 8, "kv_policy": "roco", "max_new_tokens": 12,
                         "temperature": 1e-9, "top_p": 1.0,
                         "eos_token_ids": []}, kv_mode="decoding")
    eng = ScheduledBatchEngine(model, batch_slots=2, max_prompt=64, budget=8,
                               kv_policy="roco", temperature=1e-9, top_p=1.0,
                               prefill_chunk=16)
    eng.submit(Request(request_id=1, ids=a, max_new_tokens=12))
    for _ in range(2):
        eng.tick()
    eng.submit(Request(request_id=2, ids=b, max_new_tokens=3))
    calls = {"decode": 0}
    orig = sched_mod._decode_step

    def counting_decode(*args, **kw):
        calls["decode"] += 1
        return orig(*args, **kw)

    sched_mod._decode_step = counting_decode
    try:
        ev = eng.tick()  # prefill chunk 1 of request 2 + decode of request 1
    finally:
        sched_mod._decode_step = orig
    assert calls["decode"] == 0, "prefill tick issued a separate decode dispatch"
    assert any(rid == 1 for rid, _ in ev), "decode starved during prefill"
    outs = eng.run_all()
    assert outs[1] == single_a


def test_scheduled_engine_on_mesh_matches_single_request():
    """Data+model-sharded serving (VERDICT r1 next #6, single-process leg):
    the engine on a (2,2) mesh — slots over `data`, heads/KV over `model` —
    emits exactly the single-request engine's greedy tokens."""
    from easykv_tpu.config import MeshConfig
    from easykv_tpu.parallel import make_mesh

    model = make_model()
    rng = np.random.default_rng(7)
    prompts = [rng.integers(1, 90, size=(n,)) for n in (19, 11)]
    singles = [
        generate(model, p,
                 {"budget": 8, "kv_policy": "roco", "max_new_tokens": 10,
                  "temperature": 1e-9, "top_p": 1.0, "eos_token_ids": []},
                 kv_mode="decoding")
        for p in prompts
    ]
    mc = MeshConfig(data=2, model=2)  # Hkv=2 bounds the model axis
    model2 = make_model()
    eng = ScheduledBatchEngine(model2, batch_slots=2, max_prompt=64, budget=8,
                               kv_policy="roco", temperature=1e-9, top_p=1.0,
                               prefill_chunk=16, mesh=make_mesh(mc),
                               mesh_config=mc)
    for i, p in enumerate(prompts):
        eng.submit(Request(request_id=i, ids=p, max_new_tokens=10))
    outs = eng.run_all()
    for i in range(2):
        assert outs[i] == singles[i], f"request {i} diverged on the mesh"


def test_snapshot_resume_mid_flight(tmp_path):
    """Failure recovery: kill an engine mid-generation (one request decoding,
    one still waiting), resume from the snapshot in a fresh engine, and the
    completed outputs equal an uninterrupted run token for token."""
    model = make_model()
    rng = np.random.default_rng(11)
    prompts = [rng.integers(1, 90, size=(n,)) for n in (15, 21, 12)]

    def fresh(m):
        return ScheduledBatchEngine(m, batch_slots=2, max_prompt=64, budget=8,
                                    kv_policy="roco", temperature=1e-9,
                                    top_p=1.0, prefill_chunk=16)

    ref = fresh(model)
    for i, p in enumerate(prompts):
        ref.submit(Request(request_id=i, ids=p, max_new_tokens=9))
    expected = ref.run_all()

    eng = fresh(model)
    for i, p in enumerate(prompts):
        eng.submit(Request(request_id=i, ids=p, max_new_tokens=9))
    for _ in range(4):  # mid-flight: prefills done, some decodes emitted
        eng.tick()
    snap = str(tmp_path / "engine.snap")
    eng.snapshot(snap)
    del eng  # "crash"

    resumed = ScheduledBatchEngine.resume(
        snap, make_model(), batch_slots=2, max_prompt=64, budget=8,
        kv_policy="roco", temperature=1e-9, top_p=1.0, prefill_chunk=16)
    outs = resumed.run_all()
    assert outs == expected
