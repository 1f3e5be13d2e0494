"""Sequence packing: assign documents to fixed-token-budget bins
(context-length packing for training data loaders).

The bin id is ``floor(prefix_sum_before_doc / budget)`` over docs in
``order_col`` order — a GLOBAL running sum. The naive SQL window
(``SUM() OVER (ORDER BY ...)``) moves all rows to ONE partition; at
100 TB that is the job. This operator computes the same exact integer
prefix sum distributed, the classic two-pass scan:

1. range-partition by ``order_col`` (so partition i holds a contiguous
   key range), compute each partition's LOCAL running sum + total;
2. collect the P partition totals (P ~ thousands — driver-tiny),
   prefix-sum them, broadcast the per-partition offsets back;
3. bin id = (local_cum - n_tok + offset) div budget.

Integer arithmetic end-to-end -> bitwise equal to the single-partition
window at any parallelism (oracle-checked in queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_bins(
    df: DataFrame,
    tokens_col: str,
    order_col: str,
    budget: int = 512,
    partitions: int = 32,
) -> DataFrame:
    """Returns df's (order_col, tokens_col) plus ``bin_id``."""
    ranged = df.select(order_col, tokens_col).repartitionByRange(
        partitions, F.col(order_col)
    )
    pid = F.spark_partition_id()
    local = ranged.withColumn("_pid", pid).withColumn(
        "_lcum",
        F.sum(tokens_col).over(
            Window.partitionBy("_pid")
            .orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    # AQE would merge the range partitions under the window's
    # hash-exchange and break _pid<->range alignment; cache the assigned
    # frame so totals and rows see the same pids
    local = local.persist()
    totals = {
        r["_pid"]: r["t"]
        for r in local.groupBy("_pid").agg(F.sum(tokens_col).alias("t")).collect()
    }
    offsets, acc = {}, 0
    for p in sorted(totals):
        offsets[p] = acc
        acc += totals[p]
    omap = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    return (
        local.withColumn("_cum_before", F.col("_lcum") - F.col(tokens_col) + omap[F.col("_pid")])
        .withColumn("bin_id", F.expr(f"CAST(_cum_before div {budget} AS BIGINT)"))
        .select(order_col, tokens_col, "bin_id")
    )
