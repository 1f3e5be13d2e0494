"""Continuous aggregate: a rollup table maintained incrementally by a
stream (the streaming side of operators/rollup.py's hypertable story).

Each micro-batch partial-aggregates its own rows (tiny), merges them
additively into the persisted rollup table, and swaps the result in
atomically. Because counts are longs and sums stay DECIMAL (exact,
associative), the incrementally-maintained table equals the batch rollup
over all data bitwise — tested against ``batch_rollup_level``.

Scale note: the merge rewrites the rollup table, which is ~n_buckets
rows (minutes × keys), not event-scale; at 100 TB partition the rollup
by day and rewrite only partitions the batch touched (same code path —
the join prunes untouched partitions when bucketed by the key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from pgvector_db_spark.operators.rollup import time_bucket
from pgvector_db_spark.sources.table import ParquetTable


def _partial(df: DataFrame, ts_col: str, value_col: str, width_sec: int) -> DataFrame:
    return df.groupBy(
        time_bucket(ts_col, width_sec).alias("bucket_epoch")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col(value_col).cast("decimal(18,2)"))
        .cast("decimal(28,2)")
        .alias("sum_dec"),
    )


def batch_rollup_level(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value", width_sec: int = 300
) -> DataFrame:
    """The batch truth the continuous aggregate must equal."""
    return _partial(df, ts_col, value_col, width_sec)


def continuous_rollup(
    stream_df: DataFrame,
    table: ParquetTable,
    checkpoint: str,
    ts_col: str = "ts",
    value_col: str = "value",
    width_sec: int = 300,
) -> StreamingQuery:
    """Maintain ``table`` as the running rollup of the stream.

    foreachBatch: partial-agg the batch, additively merge with the
    current table (full outer on bucket), atomic swap. Exactly-once per
    batch via the streaming commit log + idempotent swap.
    """
    spark = table.spark

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        inc = _partial(batch_df, ts_col, value_col, width_sec)
        try:
            current = table.read()
            exists = True
        except Exception:
            exists = False
        if not exists:
            inc.write.mode("overwrite").parquet(table.path)
            return
        merged = (
            current.unionByName(inc)
            .groupBy("bucket_epoch")
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_dec").cast("decimal(28,2)").alias("sum_dec"),
            )
        )
        table._swap_in(merged)

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .start()
    )
