"""Device memory accounting — the TPU equivalent of the reference's
`cache_size` / `gpu_stats` (reference easykv/easykv.py:10-25)."""
from __future__ import annotations

from typing import Dict, Optional

import jax

from ..cache import KVCache


def cache_size_mb(cache: KVCache) -> float:
    """Total bytes of the KV cache + sidecars in MB (reference cache_size,
    easykv.py:10-18 counts fp16 K/V only; we count everything we allocate)."""
    total = sum(leaf.size * leaf.dtype.itemsize for leaf in cache if leaf is not None)
    return total / (1024**2)


def device_memory_stats(device: Optional[jax.Device] = None) -> Dict[str, float]:
    """Current/peak HBM usage in GB (reference gpu_stats, easykv.py:20-25).
    Returns {} when the backend doesn't expose memory_stats (e.g. CPU)."""
    device = device or jax.local_devices()[0]
    stats = device.memory_stats()
    if not stats:
        return {}
    out = {}
    for key, name in [
        ("bytes_in_use", "current_gb"),
        ("peak_bytes_in_use", "peak_gb"),
        ("bytes_limit", "limit_gb"),
    ]:
        if key in stats:
            out[name] = round(stats[key] / (1024**3), 3)
    return out


def print_device_stats(device: Optional[jax.Device] = None) -> None:
    stats = device_memory_stats(device)
    if stats:
        print(f"Current device memory usage: {stats.get('current_gb', '?')} GB")
        print(f"Peak device memory usage: {stats.get('peak_gb', '?')} GB")
