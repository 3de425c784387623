"""Device mesh construction for (data, model) parallelism.

The reference has no distribution story at all (SURVEY.md §2.3: the closest
it gets is HF Accelerate layer placement). Here the mesh is first-class:
  * `data` shards the batch (DP / continuous batching across hosts, DCN)
  * `model` shards attention heads, MLP and the budgeted KV ring buffer
    over ICI. Eviction is per-(layer, kv-head), so the score/evict/attend
    loop never communicates across model shards; the only collectives are
    the usual TP all-reduces on o_proj/down_proj outputs, inserted by XLA.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

from ..config import MeshConfig


def make_mesh(cfg: MeshConfig, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    n = cfg.data * cfg.model
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    try:
        arr = mesh_utils.create_device_mesh((cfg.data, cfg.model), devices[:n])
    except Exception:
        arr = np.array(devices[:n]).reshape(cfg.data, cfg.model)
    return Mesh(arr, (cfg.axis_data, cfg.axis_model))


def init_distributed(coordinator: Optional[str] = None, num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (jax.distributed). No-op when single-process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
