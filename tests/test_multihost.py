"""Multi-process (simulated multi-host) smoke test: two processes join via
jax.distributed, build a global 2x4 mesh (4 local CPU devices each), shard
params + budgeted KV cache, and run a decode step with eviction.

Exercises the cross-host path of parallel/: global device enumeration,
NamedSharding over a mesh spanning processes, and shard-local eviction."""
import os
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
proc = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=proc
)
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4

sys.path.insert(0, os.environ["REPO"])
import jax.numpy as jnp
import numpy as np
from easykv_tpu.cache import init_cache
from easykv_tpu.config import MeshConfig, ModelConfig
from easykv_tpu.models import llama
from easykv_tpu.models.llama import StepCtx
from easykv_tpu.parallel import make_mesh, shard_cache, shard_params
from easykv_tpu.policies import PHASE_DECODE, PolicySpec, evict_cache

mc = MeshConfig(data=2, model=4)
mesh = make_mesh(mc)
cfg = ModelConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                  num_hidden_layers=2, num_attention_heads=8,
                  num_key_value_heads=4, head_dim=8,
                  max_position_embeddings=64)
params = llama.init_params(cfg, jax.random.PRNGKey(0))
B, P, budget = 2, 8, 6
cache = init_cache(cfg.num_hidden_layers, B, 4, P + budget + 1, cfg.head_dim,
                   jnp.float32)
params = shard_params(params, cfg, mc, mesh)
cache = shard_cache(cache, mc, mesh)
rw = int(budget * 0.3)
spec = PolicySpec("roco", PHASE_DECODE, 1, 4, rw, feasible_k=budget - rw,
                  protect_prompt=True)

ids = jnp.ones((B, P), jnp.int32)
pos = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32)[None], (B, P))
ctx = StepCtx(q_pos=pos, token_valid=jnp.ones((B, P), bool),
              counter_init=jnp.zeros((B, P), jnp.float32),
              next_pos=jnp.full((B,), P, jnp.int32),
              prompt_len=jnp.full((B,), P, jnp.int32),
              evict_gate=jnp.zeros((B,), bool),
              update_gate=jnp.zeros((), bool),
              rand_rank=jnp.zeros((B,), jnp.int32))
logits, cache = jax.jit(lambda p, c: llama.forward(p, cfg, c, ids, ctx, None))(params, cache)

def step(params, cache, g):
    tp = jnp.full((B,), P + g, jnp.int32)
    c2 = StepCtx(q_pos=tp[:, None], token_valid=jnp.ones((B, 1), bool),
                 counter_init=jnp.zeros((B, 1), jnp.float32),
                 next_pos=tp + 1, prompt_len=jnp.full((B,), P, jnp.int32),
                 evict_gate=jnp.full((B,), g + 1 > budget, bool),
                 update_gate=jnp.ones((), bool),
                 rand_rank=jnp.zeros((B,), jnp.int32))
    lg, cache = llama.forward(params, cfg, cache, jnp.ones((B, 1), jnp.int32), c2, spec)
    cache = evict_cache(cache, spec, c2.next_pos, c2.prompt_len,
                        c2.rand_rank, c2.evict_gate)
    return lg, cache

jstep = jax.jit(step, static_argnums=())
for g in range(budget + 2):
    lg, cache = jstep(params, cache, g)
jax.block_until_ready(lg)
for shard in lg.addressable_shards:
    assert np.isfinite(np.asarray(shard.data, np.float32)).all()
print(f"proc {proc}: multihost ok", flush=True)
"""


SERVING_WORKER = r"""
import os, sys
proc = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=proc
)
assert jax.device_count() == 8

sys.path.insert(0, os.environ["REPO"])
import numpy as np
from easykv_tpu import CausalLM, ModelConfig, generate
from easykv_tpu.config import MeshConfig
from easykv_tpu.models import llama
from easykv_tpu.parallel import make_mesh
from easykv_tpu.serving import Request
from easykv_tpu.serving.scheduled import ScheduledBatchEngine

cfg = ModelConfig(vocab_size=96, hidden_size=32, intermediate_size=64,
                  num_hidden_layers=2, num_attention_heads=4,
                  num_key_value_heads=4, head_dim=8,
                  max_position_embeddings=256)
params = llama.init_params(cfg, jax.random.PRNGKey(0))
rng = np.random.default_rng(5)
prompts = [rng.integers(1, 90, size=(n,)) for n in (14, 9)]
# expected outputs: single-request engine, process-local
singles = [
    generate(CausalLM(cfg, params), p,
             {"budget": 6, "kv_policy": "roco", "max_new_tokens": 8,
              "temperature": 1e-9, "top_p": 1.0, "eos_token_ids": []},
             kv_mode="decoding")
    for p in prompts
]
# cross-process engine: slots sharded over `data` (1 slot per process)
mc = MeshConfig(data=2, model=4)
eng = ScheduledBatchEngine(CausalLM(cfg, params), batch_slots=2,
                           max_prompt=32, budget=6, kv_policy="roco",
                           temperature=1e-9, top_p=1.0, prefill_chunk=16,
                           mesh=make_mesh(mc), mesh_config=mc)
for i, p in enumerate(prompts):
    eng.submit(Request(request_id=i, ids=p, max_new_tokens=8))
outs = eng.run_all()
for i in range(2):
    assert outs[i] == singles[i], (proc, i, outs[i], singles[i])
print(f"proc {proc}: serving multihost ok", flush=True)
"""


def _run_two_process(tmp_path, worker_src, expect, extra_args=()):
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    script = tmp_path / "worker.py"
    script.write_text(worker_src)
    env = dict(os.environ, REPO=os.path.dirname(os.path.dirname(__file__)),
               JAX_PLATFORMS="")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), "2", port, *extra_args],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert expect in out


SNAPSHOT_WORKER = r"""
import os, sys
proc = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
mode = sys.argv[4]; snapdir = sys.argv[5]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=proc
)
sys.path.insert(0, os.environ["REPO"])
import numpy as np
from easykv_tpu import CausalLM, ModelConfig, generate
from easykv_tpu.config import MeshConfig
from easykv_tpu.models import llama
from easykv_tpu.parallel import make_mesh
from easykv_tpu.serving import Request
from easykv_tpu.serving.scheduled import ScheduledBatchEngine

cfg = ModelConfig(vocab_size=96, hidden_size=32, intermediate_size=64,
                  num_hidden_layers=2, num_attention_heads=4,
                  num_key_value_heads=4, head_dim=8,
                  max_position_embeddings=256)
params = llama.init_params(cfg, jax.random.PRNGKey(0))
rng = np.random.default_rng(5)
prompts = [rng.integers(1, 90, size=(n,)) for n in (14, 9)]
mc = MeshConfig(data=2, model=4)
kw = dict(batch_slots=2, max_prompt=32, budget=6, kv_policy="roco",
          temperature=1e-9, top_p=1.0, prefill_chunk=16,
          mesh=make_mesh(mc), mesh_config=mc)

if mode == "crash":
    eng = ScheduledBatchEngine(CausalLM(cfg, params), **kw)
    for i, p in enumerate(prompts):
        eng.submit(Request(request_id=i, ids=p, max_new_tokens=8))
    # run past prefill into mid-generation, then "crash" (snapshot + exit)
    for _ in range(4):
        eng.tick()
    assert eng.requests, "must die with requests still in flight"
    eng.snapshot(snapdir)
    print(f"proc {proc}: crashed mid-flight ok", flush=True)
else:
    singles = [
        generate(CausalLM(cfg, params), p,
                 {"budget": 6, "kv_policy": "roco", "max_new_tokens": 8,
                  "temperature": 1e-9, "top_p": 1.0, "eos_token_ids": []},
                 kv_mode="decoding")
        for p in prompts
    ]
    eng = ScheduledBatchEngine.resume(snapdir, CausalLM(cfg, params), **kw)
    assert eng.requests, "snapshot should carry in-flight requests"
    outs = eng.run_all()
    for i in range(2):
        assert outs[i] == singles[i], (proc, i, outs[i], singles[i])
    print(f"proc {proc}: resume multihost ok", flush=True)
"""


@pytest.mark.skipif(os.environ.get("EASYKV_SKIP_MULTIHOST") == "1",
                    reason="multihost test disabled")
def test_two_process_mesh(tmp_path):
    _run_two_process(tmp_path, WORKER, "multihost ok")


@pytest.mark.skipif(os.environ.get("EASYKV_SKIP_MULTIHOST") == "1",
                    reason="multihost test disabled")
def test_two_process_scheduled_serving(tmp_path):
    """Cross-host continuous batching (VERDICT r1 next #6): the scheduled
    engine with slots sharded over `data` across 2 processes emits exactly
    the single-request engine's greedy tokens."""
    _run_two_process(tmp_path, SERVING_WORKER, "serving multihost ok")


@pytest.mark.skipif(os.environ.get("EASYKV_SKIP_MULTIHOST") == "1",
                    reason="multihost test disabled")
def test_two_process_snapshot_resume(tmp_path):
    """Multi-process failure recovery (VERDICT r2 next #6): both processes
    die mid-generation after a collective Orbax snapshot (globally sharded
    cache + replicated host bookkeeping); a fresh 2-process launch resumes
    and the final tokens equal the uninterrupted single-request run."""
    snapdir = str(tmp_path / "snap")
    _run_two_process(tmp_path, SNAPSHOT_WORKER, "crashed mid-flight ok",
                     extra_args=("crash", snapdir))
    _run_two_process(tmp_path, SNAPSHOT_WORKER, "resume multihost ok",
                     extra_args=("resume", snapdir))
