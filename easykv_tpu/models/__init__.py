from . import hf, llama
from .llama import forward, init_params

__all__ = ["forward", "hf", "init_params", "llama"]
