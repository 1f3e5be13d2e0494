"""Parquet export paths (reference generate_embeddings.py:111-147).

- ``save_to_parquet`` ↔ the local single-file export (:142-146)
- ``save_partitioned`` ↔ the S3 partitioned-append export (:122-141):
  adds a ``generation_date`` ISO-date column and writes a Hive-partitioned
  dataset in append mode. On a cluster the same call targets s3a:// —
  partition pruning on ``generation_date`` is then free for readers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def save_to_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """(text, embedding) → Parquet (reference generate_embeddings.py:142-146)."""
    df.write.mode(mode).parquet(path)


def save_partitioned(
    df: DataFrame,
    path: str,
    partition_col: str = "generation_date",
    date: str | None = None,
) -> None:
    """Partitioned append export (reference generate_embeddings.py:122-141).

    ``date=None`` stamps the current date exactly like the reference's
    ``datetime.now().date().isoformat()`` (:123); pass an explicit ISO date
    for deterministic tests.
    """
    stamp = F.lit(date) if date is not None else F.date_format(F.current_date(), "yyyy-MM-dd")
    out = df.withColumn(partition_col, stamp)
    out.write.mode("append").partitionBy(partition_col).parquet(path)
