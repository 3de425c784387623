"""Native checkpoint save/restore (Orbax) — the persistence layer the
reference lacks (it only ever loads HF checkpoints, SURVEY.md §5).

Converts once from HF with models.hf and then round-trips through Orbax for
fast sharded reload on pod slices.
"""
from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax

from ..config import ModelConfig


def save_checkpoint(path: str, cfg: ModelConfig, params: Any) -> None:
    import dataclasses
    import json

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "params"), params)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2)


def load_checkpoint(
    path: str, dtype=None, abstract_params: Optional[Any] = None
) -> Tuple[ModelConfig, Any]:
    import json

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, "config.json")) as f:
        cfg = ModelConfig(**json.load(f))
    with ocp.StandardCheckpointer() as ckptr:
        params = ckptr.restore(os.path.join(path, "params"), abstract_params)
    if dtype is not None:
        params = jax.tree.map(lambda x: x.astype(dtype), params)
    return cfg, params
