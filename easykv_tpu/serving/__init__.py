from .engine import ContinuousBatchEngine, Request

__all__ = ["ContinuousBatchEngine", "Request"]
