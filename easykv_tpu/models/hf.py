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
import jax
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


def params_from_hf_state_dict_streamed(
    cfg: ModelConfig, sd: Mapping[str, Any], dtype=jnp.bfloat16,
    quantize: str | None = None, group_size: int = 128,
    int4_layout: str = "arith",
) -> Params:
    """Per-family streamed device assembly of an HF numpy state dict.

    The host path (params_from_hf_state_dict) stacks each weight family on
    the HOST (a full second copy of the checkpoint in RAM) and, when the
    caller quantizes afterwards, the device transiently holds BOTH the
    bf16 tree and the quantized tree — 13.5 + 6.7 GB at 7B int8, which
    does not fit a 16 GB chip. Here each per-layer tensor is device_put
    directly from its (zero-copy mmap) numpy view and ONE jitted call per
    family stacks, transposes, casts, and (optionally) quantizes it
    on-device — peak device memory is the final tree plus a single raw
    family (~+1.9 GB at 7B), and the host never materializes a stacked
    copy. This is what makes the RUNBOOK.md real-weight commands
    (7B/13B --quant int8/int4) loadable at all on one chip.

    quantize: None (plain `dtype` tree) | "int8" (per-channel w8a16, like
    ops.quant.quantize_params) | "int4" (group-wise w4a16 with an int8 lm
    head, like quantize_params_int4) | "int4_dual" (int4 + the int8 copy
    on every layer linear, like quantize_params_int4(dual_int8=True) —
    the fastest batched-serving configuration, RESULTS.md r4)."""
    from ..ops.quant import (_fit_group, quantize_linear,
                             quantize_linear_int4)

    L = cfg.num_hidden_layers
    prefix = "model." if "model.embed_tokens.weight" in sd else ""

    def put(name):
        return jax.device_put(np.asarray(sd[name]))

    def assemble(ws, transpose, qmode):
        w = jnp.stack(ws)
        if transpose:
            w = jnp.swapaxes(w, -1, -2)
        w = w.astype(dtype)
        if qmode == "int8":
            return quantize_linear(w)
        if qmode in ("int4", "int4_dual"):
            q4 = quantize_linear_int4(
                w, _fit_group(w.shape[-2], group_size), layout=int4_layout)
            if qmode == "int4_dual":
                q8 = quantize_linear(w)
                q4 = {**q4, "q8": q8["q"], "s8": q8["s"]}
            return q4
        return w

    def family(fmt, transpose=True, qmode=None):
        raws = [put(fmt.format(i)) for i in range(L)]  # async uploads
        out = jax.jit(assemble, static_argnums=(1, 2))(raws, transpose, qmode)
        jax.block_until_ready(out)  # free the raw family before the next
        return out

    qw = quantize if quantize in ("int8", "int4", "int4_dual") else None
    p: Params = {
        "embed": jax.jit(lambda e: e.astype(dtype))(
            put(f"{prefix}embed_tokens.weight")),
        "final_norm": jax.jit(lambda e: e.astype(dtype))(
            put(f"{prefix}norm.weight")),
        "layers": {},
    }
    lay = p["layers"]
    for name, fmt, tr in (
        ("wq", "self_attn.q_proj.weight", True),
        ("wk", "self_attn.k_proj.weight", True),
        ("wv", "self_attn.v_proj.weight", True),
        ("wo", "self_attn.o_proj.weight", True),
        ("wg", "mlp.gate_proj.weight", True),
        ("wu", "mlp.up_proj.weight", True),
        ("wd", "mlp.down_proj.weight", True),
        ("ln_attn", "input_layernorm.weight", False),
        ("ln_mlp", "post_attention_layernorm.weight", False),
    ):
        qmode = qw if name.startswith("w") else None
        lay[name] = family(f"{prefix}layers.{{}}.{fmt}",
                           transpose=tr, qmode=qmode)
    if f"{prefix}layers.0.self_attn.q_proj.bias" in sd:
        for bn, fmt in (("bq", "self_attn.q_proj.bias"),
                        ("bk", "self_attn.k_proj.bias"),
                        ("bv", "self_attn.v_proj.bias")):
            lay[bn] = family(f"{prefix}layers.{{}}.{fmt}", transpose=False)
    if not cfg.tie_word_embeddings:
        # the lm head quantizes to int8 under BOTH modes (the
        # quantize_params_int4 default: read once per step, vocab quality)
        head_q = "int8" if qw else None
        if "lm_head.weight" in sd:
            p["lm_head"] = jax.jit(assemble, static_argnums=(1, 2))(
                [put("lm_head.weight")], True, head_q)
            p["lm_head"] = jax.tree.map(lambda x: x[0], p["lm_head"])
        else:
            p["lm_head"] = jax.jit(
                lambda e: (quantize_linear(e.T.astype(dtype)) if head_q
                           else e.T.astype(dtype)))(put(
                               f"{prefix}embed_tokens.weight"))
    return p


def load_hf_checkpoint(
    path: str, dtype=jnp.bfloat16, quantize: str | None = None,
    group_size: int = 128, int4_layout: str = "arith",
) -> tuple[ModelConfig, Params]:
    """Load from a local HF checkpoint directory (config.json + safetensors).

    Prefers the native zero-copy mmap reader (native/safetensors_mmap.cc);
    falls back to the Python safetensors library. Assembly streams
    per-family straight to the device, optionally quantizing on the fly
    (see params_from_hf_state_dict_streamed) — required for 7B+ real-weight
    loads on a 16 GB chip."""
    with open(os.path.join(path, "config.json")) as f:
        cfg = ModelConfig.from_hf_config(json.load(f))
    try:
        from ..native import load_safetensors_dir

        sd, _files = load_safetensors_dir(path)
    except Exception:
        from safetensors import safe_open  # fallback

        sd = {}
        files = [f for f in os.listdir(path) if f.endswith(".safetensors")]
        if not files:
            raise FileNotFoundError(f"no .safetensors files under {path}")
        for fname in sorted(files):
            with safe_open(os.path.join(path, fname), framework="np") as f:
                for key in f.keys():
                    sd[key] = f.get_tensor(key)
    return cfg, params_from_hf_state_dict_streamed(
        cfg, sd, dtype=dtype, quantize=quantize, group_size=group_size,
        int4_layout=int4_layout)
