from .incremental import (
    available_now_bar_stream,
    stage_events_dir,
    stream_events,
    streaming_ohlcv,
    gated_idempotent_sink,
)

__all__ = [
    "available_now_bar_stream",
    "stage_events_dir",
    "stream_events",
    "streaming_ohlcv",
    "gated_idempotent_sink",
]
