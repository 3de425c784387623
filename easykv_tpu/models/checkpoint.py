"""Native checkpoint save/restore (Orbax) — the persistence layer the
reference lacks (it only ever loads HF checkpoints, SURVEY.md §5).

Converts once from HF with models.hf and then round-trips through Orbax.
Restore is mesh-aware: pass a Mesh (+ MeshConfig) and every parameter is
restored directly into its NamedSharding from parallel.param_pspecs — each
process/device reads only its shard, so a pod slice never materializes the
full parameter tree on one host.
"""
from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax

from ..config import MeshConfig, ModelConfig


def save_checkpoint(path: str, cfg: ModelConfig, params: Any) -> None:
    """Works for replicated and for mesh-sharded params alike (Orbax writes
    each array's addressable shards; a multi-process save composes)."""
    import dataclasses
    import json

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "params"), params)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2)


def _sharded_abstract_params(
    meta: Any, cfg: ModelConfig, mc: MeshConfig, mesh
) -> Any:
    """Abstract param tree (ShapeDtypeStruct + NamedSharding) for restoring
    straight into the TP/DP layout.

    Specs come from parallel.param_pspecs; quantized linears ({"q", "s"})
    inherit the weight's spec for "q" and drop the contracted (in) dim for
    the per-output-channel "s" scales."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.sharding import param_pspecs

    specs = param_pspecs(cfg, mc)

    def leaf_spec(path) -> P:
        keys = [getattr(p, "key", None) for p in path]
        node: Any = specs
        quant_key = None
        for k in keys:
            if k in ("q", "s", "q4p", "q4a", "gs", "q8", "s8"):
                quant_key = k
                break
            node = node[k]
        base: P = node
        if quant_key in ("s", "s8"):
            # per-output-channel scales: weight spec minus the `in` dim
            return P(*(tuple(base)[:-2] + tuple(base)[-1:]))
        # int4 group scales (.., in//G, out) keep the weight's spec layout
        return base

    def to_abstract(path, m):
        spec = leaf_spec(path)
        return jax.ShapeDtypeStruct(
            tuple(m.shape), m.dtype, sharding=NamedSharding(mesh, spec)
        )

    return jax.tree_util.tree_map_with_path(to_abstract, meta)


def load_checkpoint(
    path: str,
    dtype=None,
    abstract_params: Optional[Any] = None,
    mesh=None,
    mesh_config: Optional[MeshConfig] = None,
) -> Tuple[ModelConfig, Any]:
    """Restore (cfg, params). With `mesh` (and optionally `mesh_config`),
    params land sharded per parallel.param_pspecs without an intermediate
    replicated copy — the multi-process / pod-slice restore path."""
    import json

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, "config.json")) as f:
        cfg = ModelConfig(**json.load(f))
    with ocp.StandardCheckpointer() as ckptr:
        if abstract_params is None and mesh is not None:
            meta = ocp.PyTreeCheckpointer().metadata(
                os.path.join(path, "params")
            ).item_metadata.tree
            abstract_params = _sharded_abstract_params(
                meta, cfg, mesh_config or MeshConfig(model=mesh.size), mesh
            )
        params = ckptr.restore(os.path.join(path, "params"), abstract_params)
    if dtype is not None:
        params = jax.tree.map(lambda x: x.astype(dtype), params)
    return cfg, params
