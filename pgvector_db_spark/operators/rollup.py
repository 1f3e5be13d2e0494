"""Multi-resolution time rollups (hypertable continuous-aggregate style).

A metrics/hypertable engine keeps the same aggregate at several time
resolutions (5 min → 1 h → 1 d). The scale-correct way is to aggregate
the raw rows ONCE at the finest resolution, then derive every coarser
level from the next finer one — each successive rollup processes
``n_buckets`` rows, not ``n_events``. At 100 TB the raw pass dominates
and the cascade is ~free; recomputing each resolution from raw would
multiply the scan count by the number of resolutions.

Exactness: counts are longs and sums stay DECIMAL through the cascade
(decimal addition is exact and associative, so cascaded sums equal
direct per-resolution sums bitwise — which is what the DuckDB oracle
computes). Cast to double only at the edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_bucket(ts_col, width_sec: int):
    """Epoch-second bucket start for a timestamp column (truncating)."""
    epoch = F.unix_timestamp(F.col(ts_col) if isinstance(ts_col, str) else ts_col)
    return (F.floor(epoch / width_sec) * width_sec).cast("long")


def time_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    widths: tuple[int, ...] = (300, 3600, 86400),
) -> DataFrame:
    """Cascaded rollup: one raw aggregation at ``widths[0]``, every coarser
    resolution derived from the previous. Returns the union of all levels:
    (resolution_sec, bucket_epoch, n_events, sum_value).
    """
    for finer, coarser in zip(widths, widths[1:]):
        if coarser % finer != 0:
            raise ValueError(f"width {coarser} is not a multiple of {finer}")

    finest = widths[0]
    level = df.groupBy(
        time_bucket(ts_col, finest).alias("bucket_epoch")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col(value_col).cast("decimal(18,2)")).alias("_sum_dec"),
    )

    out = level.select(
        F.lit(finest).cast("long").alias("resolution_sec"),
        "bucket_epoch",
        "n_events",
        F.col("_sum_dec").cast("double").alias("sum_value"),
    )
    for width in widths[1:]:
        level = level.groupBy(
            ((F.floor(F.col("bucket_epoch") / width)) * width)
            .cast("long")
            .alias("bucket_epoch")
        ).agg(
            F.sum("n_events").alias("n_events"),
            F.sum("_sum_dec").alias("_sum_dec"),
        )
        out = out.unionByName(
            level.select(
                F.lit(width).cast("long").alias("resolution_sec"),
                "bucket_epoch",
                "n_events",
                F.col("_sum_dec").cast("double").alias("sum_value"),
            )
        )
    return out
