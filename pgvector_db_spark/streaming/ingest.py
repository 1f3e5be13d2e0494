"""Streaming ingest sinks (reference A20/A21).

- ``stream_insert``: ``foreachBatch`` → validated ``ParquetTable.insert``
  per micro-batch — the Spark-native version of the reference's
  record-at-a-time loop (notebooks/pgvector_db.ipynb:118-211). Per-record
  writes are an anti-pattern at scale; micro-batches amortize commit cost
  exactly like the reference's own recommendation (:127).
- ``stream_append``: direct parquet-append sink with checkpointing —
  the ``pg_copy``-per-interval analogue (ipynb:213-241), exactly-once via
  the streaming commit log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from pgvector_db_spark.sources.table import ParquetTable


def stream_insert(
    stream_df: DataFrame,
    table: ParquetTable,
    checkpoint: str,
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """foreachBatch sink: each micro-batch goes through the table's
    validated insert path (schema + vector-dim checks per batch)."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        table.insert(batch_df)

    writer = stream_df.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def stream_upsert(
    stream_df: DataFrame,
    table: ParquetTable,
    key: str,
    checkpoint: str,
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """foreachBatch → keyed ``ParquetTable.upsert``: incoming rows replace
    same-key rows, new keys append. Because the merge is idempotent per
    key, a micro-batch REPLAYED after a crash (foreachBatch is
    at-least-once) converges to the same table — end-to-end exactly-once
    semantics on a mutable table, which plain append sinks can't give.
    The reference's closest analogue is Postgres ``INSERT ... ON CONFLICT
    DO UPDATE`` applied per micro-batch."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # the merge input must be key-unique; dropDuplicates picks one row
        # per key (arbitrary within the batch — callers needing a specific
        # winner should pre-aggregate, e.g. max_by over an event time)
        deduped = batch_df.dropDuplicates([key])
        table.upsert(deduped, key)

    writer = stream_df.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def stream_append(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """Parquet-append sink with exactly-once semantics from the streaming
    commit log (stronger than the reference's per-batch commit)."""
    writer = (
        stream_df.writeStream.format("parquet")
        .outputMode("append")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
