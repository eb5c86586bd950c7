from .engine import StreamingTSE

__all__ = ["StreamingTSE"]
