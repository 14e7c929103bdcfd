from .events import (
    EVENTS_SCHEMA,
    read_events_stream,
    windowed_event_aggregate,
    sliding_window_aggregate,
    sessionized_event_aggregate,
    stateful_latest_per_key,
    stateful_user_totals,
    stream_static_enrich,
    stream_stream_purchase_attribution,
    streaming_dedup,
    sessionize_batch,
    run_stream_to_memory,
)

__all__ = [
    "EVENTS_SCHEMA",
    "read_events_stream",
    "windowed_event_aggregate",
    "sliding_window_aggregate",
    "sessionized_event_aggregate",
    "stateful_latest_per_key",
    "stateful_user_totals",
    "stream_static_enrich",
    "stream_stream_purchase_attribution",
    "streaming_dedup",
    "sessionize_batch",
    "run_stream_to_memory",
]
