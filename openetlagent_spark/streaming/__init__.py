from .events import (
    read_event_stream,
    read_event_table,
    sessionize,
    windowed_event_counts,
)

__all__ = ["read_event_stream", "read_event_table", "sessionize", "windowed_event_counts"]
