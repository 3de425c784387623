"""Int8 weight quantization (w8a16): per-output-channel symmetric scales.

Enables LLaMa2-7B on a single 16 GB v5e chip (bf16 weights alone are
13.5 GB; int8 halves that) and halves the HBM traffic of the weight-bound
decode loop. The int8->bf16 convert is fused into the matmul by XLA; the
scale multiply is a fused epilogue.

A quantized linear is a dict {"q": int8 (in, out), "s": f32 (out,)}; plain
arrays pass through `mm` untouched, so the model code is layout-agnostic.
"""
from __future__ import annotations

from typing import Any, Union

import jax
import jax.numpy as jnp

QuantLinear = dict


def quantize_linear(w: jax.Array, axis: int = -1) -> QuantLinear:
    """Symmetric per-output-channel int8 quantization of (.., in, out)."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # reduce the `in` dim
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "s": scale.squeeze(-2).astype(jnp.float32)}


USE_PALLAS_MATMUL = False  # measured slower than XLA's int8 path end-to-end
# on v5e (39.5 vs 62.3 tok/s at 7B decode) — XLA's convert-before-dot fuses
# better than feared; ops/pallas/quant_matmul.py remains available for
# experimentation via this flag.


def mm(x: jax.Array, w: Union[jax.Array, QuantLinear]) -> jax.Array:
    """x @ w for a plain array or a quantized linear (int8 dequant fused by
    XLA into the dot; see USE_PALLAS_MATMUL for the Pallas alternative)."""
    if not isinstance(w, dict):
        return x @ w
    if USE_PALLAS_MATMUL and w["q"].ndim == 2:
        lead = x.shape[:-1]
        M = 1
        for d in lead:
            M *= d
        from ..flags import pallas_enabled

        if M <= 256 and pallas_enabled():
            from .pallas.quant_matmul import quant_matmul

            y2 = quant_matmul(x.reshape(M, x.shape[-1]), w["q"], w["s"])
            return y2.reshape(lead + (w["q"].shape[-1],))
    y = jnp.matmul(x, w["q"].astype(x.dtype))
    return y * w["s"].astype(x.dtype)


def dequantize(w: Union[jax.Array, QuantLinear], dtype=jnp.float32) -> jax.Array:
    if isinstance(w, dict):
        return (w["q"].astype(jnp.float32) * w["s"][..., None, :]).astype(dtype)
    return w.astype(dtype)


def concat_linears(ws, axis: int = -1):
    """Concatenate plain or quantized ({"q","s"}) linears along the output
    dim (per-output-channel scales concatenate 1:1)."""
    if isinstance(ws[0], dict):
        return {
            "q": jnp.concatenate([w["q"] for w in ws], axis=axis),
            "s": jnp.concatenate([w["s"] for w in ws], axis=axis),
        }
    return jnp.concatenate(ws, axis=axis)


def fuse_gemv_params(params: Any) -> Any:
    """Fuse wq|wk|wv -> wqkv and wg|wu -> wgu (and bq|bk|bv -> bqkv).

    The decode step is weight-streaming-bound; merging the projections that
    share an input turns 7 narrow GEMVs per layer into 4 long ones, which
    stream HBM with fewer per-op ramp-downs. Single-chip layout only: the
    concatenated output dim interleaves q/k/v blocks, which does not
    TP-shard cleanly (keep the split tree + param_pspecs under meshes)."""
    out = dict(params)
    layers = dict(params["layers"])
    layers["wqkv"] = concat_linears(
        [layers.pop("wq"), layers.pop("wk"), layers.pop("wv")]
    )
    layers["wgu"] = concat_linears([layers.pop("wg"), layers.pop("wu")])
    if "bq" in layers:
        layers["bqkv"] = jnp.concatenate(
            [layers.pop("bq"), layers.pop("bk"), layers.pop("bv")], axis=-1
        )
    out["layers"] = layers
    return out


def quantize_params(params: Any) -> Any:
    """Quantize every stacked linear of a llama param tree to int8; norms and
    the embedding table stay in the original dtype (the embedding is read by
    gather, not matmul, and norm scales are tiny)."""
    out = dict(params)
    layers = dict(params["layers"])
    for name in ("wq", "wk", "wv", "wo", "wg", "wu", "wd"):
        layers[name] = quantize_linear(layers[name])
    out["layers"] = layers
    if "lm_head" in params:
        out["lm_head"] = quantize_linear(params["lm_head"])
    return out
