"""Native mmap safetensors loader: parity with the Python safetensors
library, zero-copy semantics, and error handling."""
import os

import numpy as np
import pytest


def _write_st(path, tensors):
    from safetensors.numpy import save_file

    save_file(tensors, path)


@pytest.fixture(scope="module")
def st_file(tmp_path_factory):
    rng = np.random.default_rng(0)
    tensors = {
        "model.layers.0.weight": rng.normal(size=(64, 32)).astype(np.float32),
        "model.layers.0.bias": rng.normal(size=(64,)).astype(np.float32),
        "emb": rng.integers(-127, 127, size=(16, 8)).astype(np.int8),
        "h": rng.normal(size=(4, 4)).astype(np.float16),
        "scalar3d": rng.normal(size=(2, 3, 5)).astype(np.float32),
    }
    path = str(tmp_path_factory.mktemp("st") / "test.safetensors")
    _write_st(path, tensors)
    return path, tensors


def test_reads_match_reference_library(st_file):
    from easykv_tpu.native import SafetensorsFile

    path, tensors = st_file
    with SafetensorsFile(path) as f:
        names = set(f.keys())
        assert names == set(tensors)
        for name, expect in tensors.items():
            got = f.tensor(name)
            assert got.dtype == expect.dtype and got.shape == expect.shape
            np.testing.assert_array_equal(got, expect)


def test_bf16(tmp_path):
    import ml_dtypes
    from safetensors.numpy import save_file

    from easykv_tpu.native import SafetensorsFile

    w = np.arange(24, dtype=np.float32).reshape(4, 6).astype(ml_dtypes.bfloat16)
    path = str(tmp_path / "bf16.safetensors")
    save_file({"w": w}, path)
    with SafetensorsFile(path) as f:
        got = f.tensor("w")
        assert got.dtype == np.dtype(ml_dtypes.bfloat16)
        np.testing.assert_array_equal(got, w)


def test_missing_tensor_and_bad_file(tmp_path, st_file):
    from easykv_tpu.native import SafetensorsFile

    path, _ = st_file
    with SafetensorsFile(path) as f:
        with pytest.raises(KeyError):
            f.tensor("nope")
    bad = tmp_path / "bad.safetensors"
    bad.write_bytes(b"\x00")
    with pytest.raises(OSError):
        SafetensorsFile(str(bad))


def test_load_dir_and_hf_params(tmp_path):
    """End-to-end: write an HF-style checkpoint, load via the native reader,
    convert to a param tree."""
    import jax.numpy as jnp
    from safetensors.numpy import save_file

    from easykv_tpu.config import ModelConfig
    from easykv_tpu.models.hf import params_from_hf_state_dict
    from easykv_tpu.native import load_safetensors_dir

    cfg = ModelConfig(
        vocab_size=32, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=2,
    )
    rng = np.random.default_rng(1)
    sd = {}
    D, F, V = 16, 32, 32
    sd["model.embed_tokens.weight"] = rng.normal(size=(V, D)).astype(np.float32)
    sd["model.norm.weight"] = np.ones(D, np.float32)
    sd["lm_head.weight"] = rng.normal(size=(V, D)).astype(np.float32)
    for i in range(2):
        p = f"model.layers.{i}"
        sd[f"{p}.self_attn.q_proj.weight"] = rng.normal(size=(D, D)).astype(np.float32)
        sd[f"{p}.self_attn.k_proj.weight"] = rng.normal(size=(D, D)).astype(np.float32)
        sd[f"{p}.self_attn.v_proj.weight"] = rng.normal(size=(D, D)).astype(np.float32)
        sd[f"{p}.self_attn.o_proj.weight"] = rng.normal(size=(D, D)).astype(np.float32)
        sd[f"{p}.mlp.gate_proj.weight"] = rng.normal(size=(F, D)).astype(np.float32)
        sd[f"{p}.mlp.up_proj.weight"] = rng.normal(size=(F, D)).astype(np.float32)
        sd[f"{p}.mlp.down_proj.weight"] = rng.normal(size=(D, F)).astype(np.float32)
        sd[f"{p}.input_layernorm.weight"] = np.ones(D, np.float32)
        sd[f"{p}.post_attention_layernorm.weight"] = np.ones(D, np.float32)
    save_file(sd, str(tmp_path / "model.safetensors"))

    tensors, files = load_safetensors_dir(str(tmp_path))
    params = params_from_hf_state_dict(cfg, tensors, dtype=jnp.float32)
    assert params["layers"]["wq"].shape == (2, D, D)
    np.testing.assert_allclose(
        np.asarray(params["layers"]["wq"][0]),
        sd["model.layers.0.self_attn.q_proj.weight"].T,
    )


def test_streamed_load_matches_host_path(tmp_path):
    """load_hf_checkpoint's streamed per-family assembly (+ on-device
    quantization) vs the host-stacked conversion followed by
    quantize_params*: identical trees. The streamed path exists so
    real-weight 7B+ loads never hold both the bf16 and quantized trees on
    device (RUNBOOK.md)."""
    import json

    import jax
    import jax.numpy as jnp
    from safetensors.numpy import save_file

    from easykv_tpu.config import ModelConfig
    from easykv_tpu.models.hf import (load_hf_checkpoint,
                                      params_from_hf_state_dict)
    from easykv_tpu.ops.quant import quantize_params, quantize_params_int4

    D, F, V, L = 64, 128, 48, 2
    cfg = ModelConfig(
        vocab_size=V, hidden_size=D, intermediate_size=F,
        num_hidden_layers=L, num_attention_heads=2,
    )
    rng = np.random.default_rng(5)
    sd = {
        "model.embed_tokens.weight": rng.normal(size=(V, D)).astype(np.float32),
        "model.norm.weight": np.ones(D, np.float32),
        "lm_head.weight": rng.normal(size=(V, D)).astype(np.float32),
    }
    for i in range(L):
        p = f"model.layers.{i}"
        for nm, shp in (("self_attn.q_proj", (D, D)),
                        ("self_attn.k_proj", (D, D)),
                        ("self_attn.v_proj", (D, D)),
                        ("self_attn.o_proj", (D, D)),
                        ("mlp.gate_proj", (F, D)), ("mlp.up_proj", (F, D)),
                        ("mlp.down_proj", (D, F))):
            sd[f"{p}.{nm}.weight"] = rng.normal(size=shp).astype(np.float32)
        sd[f"{p}.input_layernorm.weight"] = np.ones(D, np.float32)
        sd[f"{p}.post_attention_layernorm.weight"] = np.ones(D, np.float32)
    save_file(sd, str(tmp_path / "model.safetensors"))
    hf_cfg = {
        "vocab_size": V, "hidden_size": D, "intermediate_size": F,
        "num_hidden_layers": L, "num_attention_heads": 2,
        "num_key_value_heads": 2, "max_position_embeddings": 128,
        "rms_norm_eps": 1e-6, "tie_word_embeddings": False,
        "model_type": "llama",
    }
    (tmp_path / "config.json").write_text(json.dumps(hf_cfg))

    host = params_from_hf_state_dict(cfg, sd, dtype=jnp.float32)
    for quant, host_tree in (
        (None, host),
        ("int8", quantize_params(host)),
        ("int4", quantize_params_int4(host, group_size=32)),
        ("int4_dual", quantize_params_int4(host, group_size=32,
                                           dual_int8=True)),
    ):
        _, got = load_hf_checkpoint(str(tmp_path), dtype=jnp.float32,
                                    quantize=quant, group_size=32,
                                    int4_layout="halves")
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-6),
            got, host_tree)


def test_views_keep_mapping_alive(tmp_path):
    """Dropping the SafetensorsFile while views circulate must not leave the
    views pointing at unmapped memory (ADVICE r1: owner was a no-op)."""
    import gc

    from easykv_tpu.native.loader import SafetensorsFile

    data = {"w": np.arange(4096, dtype=np.float32).reshape(64, 64)}
    path = str(tmp_path / "alive.safetensors")
    _write_st(path, data)
    f = SafetensorsFile(path)
    view = f.tensor("w")
    sliced = view[3:10, 4:]  # derived view: base chain must pin the file too
    del f, view
    gc.collect()
    np.testing.assert_array_equal(sliced, data["w"][3:10, 4:])


def test_header_length_overflow_rejected(tmp_path):
    """A corrupt header length near UINT64_MAX must fail cleanly, not read
    out of bounds (ADVICE r1: 8 + hlen wrapped)."""
    from easykv_tpu.native.loader import SafetensorsFile

    path = str(tmp_path / "corrupt.safetensors")
    with open(path, "wb") as fh:
        fh.write((2**64 - 4).to_bytes(8, "little"))
        fh.write(b"{}" + b" " * 64)
    with pytest.raises(OSError, match="header length out of range"):
        SafetensorsFile(path)
