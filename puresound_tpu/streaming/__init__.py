from .engine import StreamingTSE, offline_equivalent_input
from .file_eval import build_engine, engine_delay_samples, stream_signal
from .halfprec import to_half
from .ns_engine import StreamingNS
from .server import (ServeStats, SessionServer, StreamingServer,
                     infer_slot_axes)
from .simo_engine import StreamingDSS

__all__ = ["StreamingTSE", "StreamingNS", "StreamingDSS", "build_engine",
           "stream_signal", "engine_delay_samples", "to_half",
           "offline_equivalent_input", "StreamingServer", "SessionServer",
           "ServeStats", "infer_slot_axes"]
