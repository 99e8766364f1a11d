"""Structured Streaming operators over event-shaped tables.

Batch-mode twins of every streaming query here are registered in
:mod:`etl_project_spark.plans.events` so the DuckDB oracle can verify
the shared logical semantics; the streaming variants are exercised in
tests/test_streaming.py with rate/memory sinks.
"""

from etl_project_spark.streaming.events import (
    read_events_stream,
    stream_tumbling_counts,
    stream_sliding_counts,
    stream_session_windows,
    stream_dedup_events,
    stream_static_join_segments,
    stream_stream_click_purchase_join,
    stream_user_running_totals,
    stream_user_totals_tws,
)

__all__ = [
    "read_events_stream",
    "stream_tumbling_counts",
    "stream_sliding_counts",
    "stream_session_windows",
    "stream_dedup_events",
    "stream_static_join_segments",
    "stream_stream_click_purchase_join",
    "stream_user_running_totals",
    "stream_user_totals_tws",
]
