"""Streaming ANN search: a stream of query vectors probed against a
static IVF layout, micro-batch by micro-batch.

The retrieval-serving shape of the batch ANN path (operators/ivf.py):
queries arrive continuously (Kafka in production; file replay in tests),
and each micro-batch runs ONE pruned ``batch_search`` plan over the
layout via ``foreachBatch`` — non-time window functions aren't allowed
inside a streaming query, so the top-k ranking lives in the batch plan,
which is exactly where it belongs: every micro-batch gets the identical
WindowGroupLimit partial top-k the interactive path uses, including the
``mode='distributed'`` probe table for large batches.

Exactly-once: results land partitioned by ``batch_id`` with dynamic
partition overwrite, so a micro-batch retried after a partial write (or
replayed from the checkpoint after a crash) OVERWRITES its own partition
instead of appending duplicates — foreachBatch alone is only
at-least-once. Output is plain parquet any engine can read; drop the
``batch_id`` column if the provenance isn't wanted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def stream_ann_search(
    queries_stream: DataFrame,
    index,
    out_path: str,
    checkpoint: str,
    k: int = 10,
    nprobe: int = 1,
    mode: str = "auto",
    q_id_col: str = "query_id",
    q_vec_col: str = "query_vec",
) -> StreamingQuery:
    """Attach a probed top-k search to a streaming query-vector source.

    ``index`` is an operators/ivf.IVFIndex; every micro-batch of
    (query_id, query_vec) rows is answered with one partition-pruned
    batch plan and landed under its own ``batch_id`` partition of
    ``out_path`` (dynamic partition overwrite — the exactly-once
    mechanism described in the module docstring, NOT a blind append).
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        res = index.batch_search(
            batch_df, k=k, nprobe=nprobe,
            q_id_col=q_id_col, q_vec_col=q_vec_col, mode=mode,
        )
        # idempotent per batch id: a retry overwrites its own partition
        (
            res.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_path)
        )

    return (
        queries_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
