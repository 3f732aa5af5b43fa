from .incremental import (
    available_now_bar_stream,
    stage_events_dir,
    stream_events,
    streaming_ohlcv,
    gated_idempotent_sink,
)
from .stateful import stateful_session_stream

__all__ = [
    "available_now_bar_stream",
    "stage_events_dir",
    "stream_events",
    "streaming_ohlcv",
    "gated_idempotent_sink",
    "stateful_session_stream",
]
