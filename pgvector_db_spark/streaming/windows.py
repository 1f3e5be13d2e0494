"""Windowed streaming aggregation (SURVEY §2.2 streaming surface).

Tumbling-window counts/sums over event time with watermark-based late-data
handling — the reference's declared scope — plus gap-based session windows
(``F.session_window``), the streaming counterpart of the batch
sessionization query (queries.py rel_sessionize_events).

State considerations at scale: watermarking bounds the state store —
windows older than (watermark) are finalized and evicted, so state size is
O(active windows × groups) regardless of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(
    events: DataFrame,
    window_duration: str = "5 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """count(*) + sum(value) per (tumbling window, group).

    Output columns: window_start, window_end, <group>, n_events, sum_value
    — sum over decimal so a batch-mode oracle matches exactly.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration), F.col(group_col))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            F.col(group_col),
            "n_events",
            "sum_value",
        )
    )


def batch_window_agg(
    events: DataFrame,
    window_duration: str = "5 minutes",
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """The same aggregation in batch mode — the oracle for the streaming
    path (FIXTURES §3: 'streaming results are oracle-checked by computing
    the same windowed aggregates in batch mode')."""
    return (
        events.groupBy(F.window(F.col(ts_col), window_duration), F.col(group_col))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            F.col(group_col),
            "n_events",
            "sum_value",
        )
    )


def session_window_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Gap-based session windows per key: a session closes after ``gap``
    of silence (pgvector_db has no streaming surface at all — this is the
    Structured Streaming expression of the reference's record-at-a-time
    realtime ingest loop, notebooks/pgvector_db.ipynb:118-241, upgraded to
    stateful event-time semantics).

    Dynamic windows merge as events arrive, so unlike tumbling windows the
    state key set is not fixed up front; the watermark still bounds state —
    a session whose [start, last+gap) span falls fully behind the watermark
    is finalized and evicted. Scale shape: state is hash-partitioned by
    ``key_col``, so N executors hold disjoint session maps; skewed keys
    (one user with millions of events) collapse into ONE session row per
    gap-separated burst, so state stays O(active sessions), not O(events).

    Output: key, session_start, session_end (= last event + gap), n_events.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(key_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def batch_session_window_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Batch-mode session windows (same F.session_window expression) — the
    oracle for the streaming path, itself cross-checked against the pure
    lag/running-sum SQL islands formulation in queries.py."""
    return (
        events.groupBy(F.session_window(F.col(ts_col), gap), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(key_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
