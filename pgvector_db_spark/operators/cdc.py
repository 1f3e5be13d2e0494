"""CDC changelog application: ordered (key, seq, op, payload) → table state.

The reference's write surface is append/upsert (pg_insert/pg_copy →
Postgres, which resolves conflicts server-side). A Spark-native engine
has to implement the resolution itself; this module is the MERGE /
change-data-feed analogue: a changelog of I(nsert)/U(pdate)/D(elete)
operations with a total per-key order (``seq``) folds to the final
row-set.

Two consumers:
- batch: :func:`apply_changes` — one window pass, latest-seq-wins,
  tombstones dropped;
- streaming: :func:`merge_changes_into` — micro-batches folded into a
  ``ParquetTable`` that CARRIES tombstones (op column retained, max-seq
  per key), so the fold is order-insensitive across batches: a D
  arriving before its I still wins because resolution is by seq, not by
  arrival. ``read_state`` filters tombstones at read (the Delta-style
  "latest snapshot" view).

Scale: the only shuffle is the per-key max-seq reduction
(``row_number`` over (key, seq desc) — WindowGroupLimit gives partial
top-1 per partition before the exchange, so a hot key costs 1 row per
input partition, not its full update history). The streaming fold's
anti-join prunes to touched partitions when the table is partitioned by
key range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pgvector_db_spark.sources.table import ParquetTable


def latest_changes(changes: DataFrame, key: str, seq: str) -> DataFrame:
    """Reduce a changelog to the highest-``seq`` row per ``key``
    (ties broken tombstone-first so a same-seq D beats its I —
    documented, deterministic; well-formed logs never tie)."""
    w = Window.partitionBy(key).orderBy(
        F.col(seq).desc(), (F.col("op") == "D").desc(), F.col("op").desc()
    )
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_changes(changes: DataFrame, key: str, seq: str) -> DataFrame:
    """Batch CDC apply: final state = latest non-tombstone per key."""
    return latest_changes(changes, key, seq).filter(F.col("op") != "D").drop(
        "op", seq
    )


def merge_changes_into(
    table: ParquetTable, batch: DataFrame, key: str, seq: str
) -> int:
    """Fold one changelog micro-batch into a tombstone-carrying state
    table. Resolution is max-``seq`` per key over (current state ∪
    batch), so batches may arrive in any order. Returns the stored row
    count (including tombstones)."""
    batch_latest = latest_changes(batch, key, seq)
    if not table.exists():
        # first fold: nothing to merge with (mirrors ParquetTable.upsert)
        batch_latest.write.mode("errorifexists").parquet(table.path)
        return table.read().count()
    merged = latest_changes(table.read().unionByName(batch_latest), key, seq)
    return table._swap_in(merged)


def read_state(table: ParquetTable, seq: str = "seq") -> DataFrame:
    """Latest-snapshot view over a tombstone-carrying state table."""
    return table.read().filter(F.col("op") != "D").drop("op", seq)
