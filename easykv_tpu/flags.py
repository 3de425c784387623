"""Runtime feature flags (kernel selection)."""
from __future__ import annotations

from typing import Optional

_PALLAS_OVERRIDE: Optional[bool] = None


def use_pallas(enabled: Optional[bool]) -> None:
    """Force the fused Pallas kernels on/off (None = auto: single-chip TPU)."""
    global _PALLAS_OVERRIDE
    _PALLAS_OVERRIDE = enabled


def pallas_enabled() -> bool:
    import os

    if _PALLAS_OVERRIDE is not None:
        return _PALLAS_OVERRIDE
    env = os.environ.get("EASYKV_TPU_PALLAS")
    if env is not None:
        return env not in ("0", "false", "off")
    import jax

    # Single-chip TPU only by default: pallas_call is not auto-partitionable
    # by GSPMD, so multi-device meshes take the (partitionable) XLA paths
    # until the kernels are wrapped in shard_map.
    return jax.default_backend() == "tpu" and jax.device_count() == 1
