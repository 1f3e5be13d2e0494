"""Windowed streaming aggregation (SURVEY §2.2 streaming surface).

Tumbling-window counts/sums over event time with watermark-based late-data
handling — the declared scope (session/sliding windows are explicit
non-goals; the reference shows no evidence of them).

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
