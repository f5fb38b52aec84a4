from .windows import (
    run_stream_to_batch,
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)

__all__ = [
    "run_stream_to_batch",
    "session_window_agg",
    "sliding_window_agg",
    "tumbling_window_agg",
]
