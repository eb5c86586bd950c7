from .deploy import ServingBundle, make_session_server, run_serve
from .engine import StreamingTSE, offline_equivalent_input
from .file_eval import (build_engine, engine_delay_samples,
                        engine_step_options, stream_signal)
from .halfprec import to_half
from .ns_engine import StreamingNS
from .server import (ServeStats, SessionServer, StreamingServer,
                     infer_slot_axes)
from .simo_engine import StreamingDSS
from .socket_server import SocketServingFront, StreamingClient

__all__ = ["StreamingTSE", "StreamingNS", "StreamingDSS", "build_engine",
           "stream_signal", "engine_delay_samples", "engine_step_options",
           "to_half", "offline_equivalent_input", "StreamingServer",
           "SessionServer", "ServeStats", "infer_slot_axes",
           "ServingBundle", "make_session_server", "run_serve",
           "SocketServingFront", "StreamingClient"]
