from .events import (
    read_events_stream,
    tumbling_counts,
    sliding_value_sums,
    session_aggregates,
    run_stream_to_memory,
)

__all__ = [
    "read_events_stream", "tumbling_counts", "sliding_value_sums",
    "session_aggregates", "run_stream_to_memory",
]
