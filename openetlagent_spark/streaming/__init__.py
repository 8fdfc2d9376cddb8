from .events import (
    admit_new_documents,
    dedup_events,
    join_event_streams,
    quality_gate_stream,
    enrich_stream,
    read_event_stream,
    read_event_table,
    running_totals,
    session_window_agg,
    sessionize,
    windowed_event_counts,
    write_stream_idempotent,
)

__all__ = [
    "admit_new_documents",
    "dedup_events",
    "join_event_streams",
    "quality_gate_stream",
    "enrich_stream",
    "read_event_stream",
    "read_event_table",
    "running_totals",
    "session_window_agg",
    "sessionize",
    "windowed_event_counts",
    "write_stream_idempotent",
]
