"""PartitionSpecs for parameters and the budgeted KV cache.

Weights are TP-sharded over attention heads / FFN dim on the `model` axis;
the KV ring buffer and its score sidecars shard over KV heads on the same
axis so that per-head eviction indices never cross devices (SURVEY.md §7
design decision 4). Batch shards over `data`.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..cache import KVCache
from ..config import MeshConfig, ModelConfig


def param_pspecs(cfg: ModelConfig, mc: MeshConfig) -> Dict[str, Any]:
    m = mc.axis_model
    specs = {
        # embed is replicated (gathers are cheap, the table is small relative
        # to layer weights); the LM head is TP-sharded over vocab.
        "embed": P(None, None),
        "final_norm": P(None),
        "layers": {
            "wq": P(None, None, m),   # (L, D, Hq*Dh) — heads on model axis
            "wk": P(None, None, m),   # (L, D, Hkv*Dh)
            "wv": P(None, None, m),
            "wo": P(None, m, None),   # row-parallel; XLA all-reduces the output
            "wg": P(None, None, m),   # (L, D, F)
            "wu": P(None, None, m),
            "wd": P(None, m, None),
            "ln_attn": P(None, None),
            "ln_mlp": P(None, None),
            # Qwen2-style attention biases follow their weights' output dim
            "bq": P(None, m),
            "bk": P(None, m),
            "bv": P(None, m),
        },
    }
    specs["lm_head"] = P(None, m)
    return specs


def cache_pspecs(mc: MeshConfig) -> KVCache:
    d, m = mc.axis_data, mc.axis_model
    return KVCache(
        k=P(None, d, m, None, None),
        v=P(None, d, m, None, None),
        pos=P(None, d, m, None),
        score=P(None, d, m, None),
        score_sq=P(None, d, m, None),
        counter=P(None, d, m, None),
        k_scale=P(None, d, m, None),
        v_scale=P(None, d, m, None),
    )


def _tree_device_put(tree, specs, mesh: Mesh):
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        tree,
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def param_pspecs_tree(params, cfg: ModelConfig, mc: MeshConfig):
    """param_pspecs expanded to match a concrete param tree: quantized
    linears ({"q","s"}) get the weight's spec on "q" and drop the contracted
    (in) dim for the per-output-channel "s" scales; absent optional entries
    (lm_head, biases) are pruned."""

    def expand(spec: P, leaf):
        if isinstance(leaf, dict) and (
                "q4p" in leaf or "q4a" in leaf or "w4" in leaf):
            key = next(k for k in ("q4p", "q4a", "w4") if k in leaf)
            # packed nibbles (.., in//2, out) and group scales (.., in//G,
            # out) keep the weight's spec layout — an in-dim ("row-parallel")
            # sharding splits whole halves/groups as long as the local
            # in-shard is a multiple of 2x the group size.
            d = {key: spec, "gs": spec}
            if "q8" in leaf:  # dual-format int8 prefill copy
                d["q8"] = spec
                d["s8"] = P(*(tuple(spec)[:-2] + tuple(spec)[-1:]))
            return d
        if isinstance(leaf, dict):
            return {"q": spec, "s": P(*(tuple(spec)[:-2] + tuple(spec)[-1:]))}
        return spec

    specs = param_pspecs(cfg, mc)
    out = {}
    for k, v in params.items():
        if k == "layers":
            out[k] = {n: expand(specs["layers"][n], v[n]) for n in v}
        else:
            out[k] = expand(specs[k], v)
    return out


def shard_params(params, cfg: ModelConfig, mc: MeshConfig, mesh: Mesh):
    return _tree_device_put(params, param_pspecs_tree(params, cfg, mc), mesh)


def shard_cache(cache: KVCache, mc: MeshConfig, mesh: Mesh) -> KVCache:
    return KVCache(*_tree_device_put(tuple(cache), tuple(cache_pspecs(mc)), mesh))
