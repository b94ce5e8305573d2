"""Structured Streaming mode for the event operators (SURVEY §2 C-VIII).

The reference has no streaming at all (no threads/async anywhere — SURVEY §3);
this package is north-star surface. Batch and streaming share the SAME
windowing operators (`F.window` / `F.session_window`) — the batch forms in
``rtcdb_spark.queries.events_time`` are the oracle-checkable twins of these.
"""

from rtcdb_spark.streaming.dedup import (  # noqa: F401
    stream_ingest_near_dedup_to_versioned,
    stream_near_dedup_simhash,
    stream_near_dedup_simhash_unordered,
)
from rtcdb_spark.streaming.events import (  # noqa: F401
    read_events_stream,
    read_table_stream,
    run_available_now,
    stream_dedup,
    stream_enrich_static,
    stream_session,
    stream_sliding,
    stream_stream_join,
    stream_tumbling,
)
from rtcdb_spark.streaming.sinks import (  # noqa: F401
    stream_agg_foreach_batch,
    stream_to_parquet,
)
from rtcdb_spark.streaming.stateful import (  # noqa: F401
    stream_user_running_totals,
    stream_user_value_stats,
    transform_with_state_available,
)

__all__ = [
    "read_events_stream",
    "read_table_stream",
    "run_available_now",
    "stream_ingest_near_dedup_to_versioned",
    "stream_near_dedup_simhash",
    "stream_near_dedup_simhash_unordered",
    "stream_dedup",
    "stream_enrich_static",
    "stream_session",
    "stream_sliding",
    "stream_stream_join",
    "stream_tumbling",
    "stream_agg_foreach_batch",
    "stream_to_parquet",
    "stream_user_running_totals",
    "stream_user_value_stats",
    "transform_with_state_available",
]
