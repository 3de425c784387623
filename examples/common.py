"""Shared helpers for the example scripts.

The reference examples hard-code cluster checkpoint paths
(reference test_decoding.py:8-20). Here each example accepts --model PATH
pointing at a local HF checkpoint directory (config.json + safetensors);
when no checkpoint is available, --random builds a small random-weight model
so the full pipeline can still be exercised.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# Honor an explicit JAX_PLATFORMS=cpu request: the container's sitecustomize
# registers the tunneled TPU backend and overrides the platform selection,
# so the env var alone does not stick — flip the config before the first op
# (same pattern as tests/conftest.py).
if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from easykv_tpu import CausalLM, ModelConfig
from easykv_tpu.models import llama
from easykv_tpu.models.hf import load_hf_checkpoint


# Chat templates mirroring the reference MODEL_CONFIGS (test_decoding.py:8-20)
TEMPLATES = {
    "llama2": "[INST] <<SYS>>\nYou are a helpful assistant.\n<</SYS>>\n\n{inst} [/INST]",
    "vicuna": (
        "A chat between a curious user and an artificial intelligence assistant. "
        "The assistant gives helpful, detailed, and polite answers to the user's "
        "questions. USER: {inst} ASSISTANT:"
    ),
    "mistral": "<|system|>\nYou are a friendly chatbot.</s>\n<|user|>\n{inst}</s>\n<|assistant|>\n",
}


def add_model_args(ap: argparse.ArgumentParser):
    ap.add_argument("--model", help="local HF checkpoint dir (config.json + safetensors)")
    ap.add_argument("--random", action="store_true",
                    help="use a small random-weight model (no checkpoint needed)")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--template", default="llama2", choices=sorted(TEMPLATES))
    ap.add_argument("--quant",
                    choices=["none", "int8", "int4", "int4_dual"],
                    default="none",
                    help="weight quantization: int8 = w8a16 per-channel, "
                    "int4 = w4a16 group-128 scales, int4_dual = int4 + an "
                    "int8 copy routed at every batched width (fastest "
                    "serving config; +1x int8 HBM)")


def _maybe_quantize(params, args):
    if getattr(args, "quant", "none") == "int8":
        from easykv_tpu.ops.quant import quantize_params

        return quantize_params(params)
    if getattr(args, "quant", "none") == "int4":
        from easykv_tpu.ops.quant import quantize_params_int4

        return quantize_params_int4(params)
    if getattr(args, "quant", "none") == "int4_dual":
        from easykv_tpu.ops.quant import quantize_params_int4

        return quantize_params_int4(params, dual_int8=True)
    return params


def build_model(args) -> CausalLM:
    dtype = jnp.dtype(args.dtype)
    if args.model:
        # quantization happens per-family DURING the streamed load: the
        # load-bf16-then-quantize flow would transiently hold both trees on
        # device (7B int8: 13.5 + 6.7 GB — over a 16 GB chip)
        q = getattr(args, "quant", "none")
        cfg, params = load_hf_checkpoint(
            args.model, dtype=dtype, quantize=None if q == "none" else q)
        tok = None
        try:
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(args.model)
        except Exception:
            pass
        return CausalLM(cfg, params, tokenizer=tok, dtype=str(dtype))
    cfg = ModelConfig(
        vocab_size=32000, hidden_size=512, intermediate_size=1376,
        num_hidden_layers=4, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=4096,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
    params = _maybe_quantize(params, args)
    return CausalLM(cfg, params, dtype=str(dtype))


def encode_prompt(model: CausalLM, text: str):
    if model.tokenizer is not None:
        return model.tokenizer(text, return_tensors="np").input_ids[0]
    # no tokenizer: hash characters into a deterministic pseudo-token stream
    return [(3 + (ord(c) * 31) % (model.cfg.vocab_size - 4)) for c in text][:512]
