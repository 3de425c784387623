from .decode_attention import fused_decode_attend

__all__ = ["fused_decode_attend"]
