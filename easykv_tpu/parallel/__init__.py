from .mesh import make_mesh
from .sharding import cache_pspecs, param_pspecs, shard_cache, shard_params

__all__ = [
    "cache_pspecs",
    "make_mesh",
    "param_pspecs",
    "shard_cache",
    "shard_params",
]
