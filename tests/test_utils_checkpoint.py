"""Utilities + Orbax checkpoint round-trip."""
import numpy as np

import jax
import jax.numpy as jnp

from easykv_tpu.cache import init_cache
from easykv_tpu.config import ModelConfig
from easykv_tpu.models import llama
from easykv_tpu.models.checkpoint import load_checkpoint, save_checkpoint
from easykv_tpu.utils import cache_size_mb, step_timer


def test_cache_size_mb():
    cache = init_cache(2, 1, 2, 64, 16, jnp.float32)
    # k+v; 4 full sidecars; 2 dummy (B,H,1) scale arrays
    expect = (2 * 2 * 1 * 2 * 64 * 16 * 4 + 4 * 2 * 1 * 2 * 64 * 4
              + 2 * 2 * 1 * 2 * 1 * 4) / 1024**2
    assert abs(cache_size_mb(cache) - expect) < 1e-9


def test_step_timer():
    t = step_timer()
    for _ in range(3):
        with t:
            pass
    assert len(t.times) == 3 and t.mean >= 0


def test_checkpoint_restore_sharded(tmp_path):
    """Mesh-aware restore (VERDICT r1 next #9): params land directly in their
    param_pspecs NamedShardings on a (2,4) mesh — values identical, shardings
    correct — including a quantized ({"q","s"}) tree."""
    from easykv_tpu.config import MeshConfig
    from easykv_tpu.ops.quant import quantize_params
    from easykv_tpu.parallel import make_mesh
    from easykv_tpu.parallel.sharding import param_pspecs

    cfg = ModelConfig(
        vocab_size=32, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        attention_bias=True,
    )
    params = quantize_params(llama.init_params(cfg, jax.random.PRNGKey(1)))
    path = str(tmp_path / "ckpt_sharded")
    save_checkpoint(path, cfg, params)

    mc = MeshConfig(data=2, model=4)
    mesh = make_mesh(mc)
    cfg2, restored = load_checkpoint(path, mesh=mesh, mesh_config=mc)
    assert cfg2 == cfg

    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, restored,
    )
    specs = param_pspecs(cfg, mc)
    assert restored["layers"]["wq"]["q"].sharding.spec == specs["layers"]["wq"]
    assert restored["layers"]["bq"].sharding.spec == specs["layers"]["bq"]
    # per-output-channel scales: weight spec minus the contracted dim
    from jax.sharding import PartitionSpec as P

    assert restored["layers"]["wo"]["q"].sharding.spec == P(None, "model", None)
    assert restored["layers"]["wo"]["s"].sharding.spec == P(None, None)
    assert restored["lm_head"]["s"].sharding.spec == P("model")


def test_checkpoint_restore_sharded_dual_int4(tmp_path):
    """ADVICE r2 (medium): mesh-aware restore of a dual-format int4 tree —
    the q8/s8 leaves must resolve to the weight spec / scale spec instead of
    falling through leaf_spec's node walk."""
    from easykv_tpu.config import MeshConfig
    from easykv_tpu.ops.quant import quantize_params_int4
    from easykv_tpu.parallel import make_mesh
    from jax.sharding import PartitionSpec as P

    cfg = ModelConfig(
        vocab_size=32, hidden_size=64, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
    )
    # group 16 so the (.., in//G, out) group-scale dim splits 4 ways
    params = quantize_params_int4(
        llama.init_params(cfg, jax.random.PRNGKey(2)),
        group_size=16, dual_int8=True,
    )
    path = str(tmp_path / "ckpt_dual")
    save_checkpoint(path, cfg, params)

    mc = MeshConfig(data=2, model=4)
    mesh = make_mesh(mc)
    cfg2, restored = load_checkpoint(path, mesh=mesh, mesh_config=mc)
    assert cfg2 == cfg
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, restored,
    )
    wq = restored["layers"]["wq"]
    assert wq["q8"].sharding.spec == P(None, None, "model")
    assert wq["s8"].sharding.spec == P(None, "model")
    assert restored["layers"]["wo"]["q8"].sharding.spec == P(None, "model", None)
    assert restored["layers"]["wo"]["s8"].sharding.spec == P(None, None)
    assert wq["q4p"].sharding.spec == P(None, None, "model")
    assert wq["gs"].sharding.spec == P(None, None, "model")


def test_checkpoint_roundtrip(tmp_path):
    cfg = ModelConfig(
        vocab_size=32, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=2,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, cfg, params)
    cfg2, params2 = load_checkpoint(path)
    assert cfg2 == cfg
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, params2,
    )
