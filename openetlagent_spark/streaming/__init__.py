from .events import (
    dedup_events,
    enrich_stream,
    read_event_stream,
    read_event_table,
    sessionize,
    windowed_event_counts,
)

__all__ = [
    "dedup_events",
    "enrich_stream",
    "read_event_stream",
    "read_event_table",
    "sessionize",
    "windowed_event_counts",
]
