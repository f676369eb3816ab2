"""Structured Streaming surface.

The reference (runreveal/pql) is batch-only — its language has no
watermarks, windows, or state (SURVEY.md §2.5).  This module is the
beyond-reference streaming tier: the same PQL compiler runs against
``readStream`` sources (stateless operators stream as-is; aggregations
become continuous windowed aggs), plus the stateful building blocks a
security/analytics pipeline needs — tumbling/sliding windows, session
windows, and a custom per-key stateful operator via
``applyInPandasWithState``.
"""

from .pipeline import (
    curate_stream,
    pql_stream,
    run_available_now,
    run_available_now_df,
    sessionize,
    stream_dedup,
    stream_interval_join,
    stream_near_dup,
    stream_sequence_detect,
    stream_parquet_table,
    stream_upsert_to_parquet,
    stream_upsert_to_table,
    merge_upsert_sql,
    stateful_user_counts,
    windowed_agg,
    write_stream_parquet,
)

__all__ = [
    "curate_stream",
    "pql_stream",
    "run_available_now",
    "run_available_now_df",
    "sessionize",
    "stream_dedup",
    "stream_interval_join",
    "stream_near_dup",
    "stream_sequence_detect",
    "stream_parquet_table",
    "stream_upsert_to_parquet",
    "stream_upsert_to_table",
    "merge_upsert_sql",
    "stateful_user_counts",
    "windowed_agg",
    "write_stream_parquet",
]
