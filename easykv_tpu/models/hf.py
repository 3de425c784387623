"""HF checkpoint -> easykv-tpu parameter-tree conversion.

The reference loads models via `AutoModelForCausalLM.from_pretrained`
(reference test_decoding.py:25); our equivalent converts HF LLaMa/Mistral
weights (a live torch module, a state dict, or a safetensors directory)
into the stacked-layer layout used by models/llama.py's lax.scan.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Mapping

import numpy as np
import jax.numpy as jnp

from ..config import ModelConfig
from .llama import Params


def _to_np(t: Any) -> np.ndarray:
    if hasattr(t, "detach"):  # torch tensor
        t = t.detach().to("cpu")
        if t.dtype.__str__() == "torch.bfloat16":
            t = t.float()
        return t.numpy()
    return np.asarray(t)


def params_from_hf_state_dict(
    cfg: ModelConfig, sd: Mapping[str, Any], dtype=jnp.float32
) -> Params:
    """Convert an HF LlamaForCausalLM / MistralForCausalLM state dict.

    HF linear weights are (out_features, in_features); ours are
    (in, out) so x @ w applies the layer. Layers are stacked on axis 0.
    """
    L = cfg.num_hidden_layers

    def get(name):
        return _to_np(sd[name])

    def stack(fmt, transpose=True):
        ws = [get(fmt.format(i)) for i in range(L)]
        ws = [w.T if transpose else w for w in ws]
        return jnp.asarray(np.stack(ws), dtype=dtype)

    prefix = "model." if "model.embed_tokens.weight" in sd else ""
    p: Params = {
        "embed": jnp.asarray(get(f"{prefix}embed_tokens.weight"), dtype=dtype),
        "final_norm": jnp.asarray(get(f"{prefix}norm.weight"), dtype=dtype),
        "layers": {
            "wq": stack(f"{prefix}layers.{{}}.self_attn.q_proj.weight"),
            "wk": stack(f"{prefix}layers.{{}}.self_attn.k_proj.weight"),
            "wv": stack(f"{prefix}layers.{{}}.self_attn.v_proj.weight"),
            "wo": stack(f"{prefix}layers.{{}}.self_attn.o_proj.weight"),
            "wg": stack(f"{prefix}layers.{{}}.mlp.gate_proj.weight"),
            "wu": stack(f"{prefix}layers.{{}}.mlp.up_proj.weight"),
            "wd": stack(f"{prefix}layers.{{}}.mlp.down_proj.weight"),
            "ln_attn": stack(f"{prefix}layers.{{}}.input_layernorm.weight", transpose=False),
            "ln_mlp": stack(
                f"{prefix}layers.{{}}.post_attention_layernorm.weight", transpose=False
            ),
        },
    }
    if f"{prefix}layers.0.self_attn.q_proj.bias" in sd:
        # Qwen2-style attention biases (q/k/v only; o_proj is unbiased)
        p["layers"]["bq"] = stack(
            f"{prefix}layers.{{}}.self_attn.q_proj.bias", transpose=False)
        p["layers"]["bk"] = stack(
            f"{prefix}layers.{{}}.self_attn.k_proj.bias", transpose=False)
        p["layers"]["bv"] = stack(
            f"{prefix}layers.{{}}.self_attn.v_proj.bias", transpose=False)
    if not cfg.tie_word_embeddings:
        if "lm_head.weight" in sd:
            p["lm_head"] = jnp.asarray(get("lm_head.weight").T, dtype=dtype)
        else:  # tied checkpoints without explicit head
            p["lm_head"] = p["embed"].T
    return p


def params_from_hf_model(model: Any, dtype=jnp.float32) -> tuple[ModelConfig, Params]:
    """Convert a live transformers *ForCausalLM torch module."""
    cfg = ModelConfig.from_hf_config(model.config)
    sd = dict(model.state_dict())
    return cfg, params_from_hf_state_dict(cfg, sd, dtype=dtype)


def load_hf_checkpoint(path: str, dtype=jnp.bfloat16) -> tuple[ModelConfig, Params]:
    """Load from a local HF checkpoint directory (config.json + safetensors).

    Prefers the native zero-copy mmap reader (native/safetensors_mmap.cc);
    falls back to the Python safetensors library."""
    with open(os.path.join(path, "config.json")) as f:
        cfg = ModelConfig.from_hf_config(json.load(f))
    try:
        from ..native import load_safetensors_dir

        sd, _files = load_safetensors_dir(path)
        return cfg, params_from_hf_state_dict(cfg, sd, dtype=dtype)
    except Exception:
        pass
    from safetensors import safe_open  # fallback

    sd: Dict[str, np.ndarray] = {}
    files = [f for f in os.listdir(path) if f.endswith(".safetensors")]
    if not files:
        raise FileNotFoundError(f"no .safetensors files under {path}")
    for fname in sorted(files):
        with safe_open(os.path.join(path, fname), framework="np") as f:
            for key in f.keys():
                sd[key] = f.get_tensor(key)
    return cfg, params_from_hf_state_dict(cfg, sd, dtype=dtype)
