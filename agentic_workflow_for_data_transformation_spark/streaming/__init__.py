from .ingest import (
    append_digests,
    dedup_batch_against_archive,
    ensure_digest_archive,
    ingest_stream_dedup,
    read_documents_stream,
)
from .serve import (
    read_query_stream,
    serve_ann_stream,
)
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
    "append_digests",
    "dedup_batch_against_archive",
    "ensure_digest_archive",
    "ingest_stream_dedup",
    "read_documents_stream",
    "read_events_stream",
    "read_query_stream",
    "serve_ann_stream",
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
