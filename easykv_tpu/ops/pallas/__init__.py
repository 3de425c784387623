from .decode_attention import fused_decode_attend, fused_decode_attend_inflight

__all__ = ["fused_decode_attend", "fused_decode_attend_inflight"]
