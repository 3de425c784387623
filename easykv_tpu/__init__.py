"""easykv-tpu: TPU-native budget-constrained KV-cache inference engine.

A from-scratch JAX/XLA + Pallas reimplementation of the capabilities of the
reference EasyKV package (PyTorch/CUDA monkey-patches), redesigned TPU-first:
static-shape KV ring buffers, fused attention + eviction-score accumulation,
on-device top-k eviction, and pjit/NamedSharding parallelism.

Public API mirrors the reference (reference easykv/__init__.py:1-2):
    enable_fixed_kv(model, tokenizer, mode, stride)
    set_dynamicntk_rope_length(model, max_length)
"""
from .config import GenerationConfig, MeshConfig, ModelConfig, canonical_policy
from .engine.generate import (
    CausalLM,
    enable_fixed_kv,
    generate,
    set_dynamicntk_rope_length,
)

__version__ = "0.1.0"

__all__ = [
    "CausalLM",
    "GenerationConfig",
    "MeshConfig",
    "ModelConfig",
    "canonical_policy",
    "enable_fixed_kv",
    "generate",
    "set_dynamicntk_rope_length",
]
