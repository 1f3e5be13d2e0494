"""Physical data layouts for shuffle elimination at scale.

Two tools the 100 TB plan needs that no single query shows:

- **Bucketed tables** — co-locate both sides of a recurring equi-join
  (fact ⋈ fact, too big to broadcast) by writing each `bucketBy(n, key)`.
  Joins and aggregations on the bucket key then read pre-shuffled data:
  the Exchange disappears from the plan, which is the difference between
  an O(data) network step per query and none. Verified by plan assertion
  in tests/test_plans.py.

- **Salted joins** — when one join key value dominates (power-law user
  ids, null-heavy keys), hash-partitioning sends the hot key to one task.
  Salting splits each hot build row into ``salt`` copies and scatters the
  probe side uniformly, bounding any task at ~1/salt of the hot key.
  AQE's skew-join handles moderate skew automatically (session.py turns
  it on); explicit salting is for the pathological tail and for
  deterministic layout control. Result-equivalent to the plain join
  (verified by test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (+sorted) managed Parquet table. Readers that
    join or aggregate on ``key`` skip the shuffle (and the sort, if
    sorted) — Spark's equivalent of a clustered index layout."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # a managed-table location orphaned by a previous session (dir present,
    # no catalog entry) blocks creation; clear it for local warehouses
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    if warehouse.startswith("file:") or warehouse.startswith("/"):
        import shutil
        from pathlib import Path

        loc = Path(warehouse.removeprefix("file:")) / table_name.split(".")[-1]
        shutil.rmtree(loc, ignore_errors=True)
    writer = df.write.format("parquet").mode("overwrite").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table_name)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Skew-resistant equi-join: scatter ``left`` across ``salt`` sub-keys,
    replicate ``right`` once per sub-key, join on (key, salt).

    Use when ``right`` is the smaller-but-not-broadcastable side and the
    key distribution is pathological. Output columns = left's columns +
    right's non-key columns (same as a plain join on ``key``).
    """
    salted_left = left.withColumn(
        "_salt", (F.rand(seed) * salt).cast("int")
    )
    salt_ids = F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("_salt")
    salted_right = right.select("*", salt_ids)
    out = salted_left.join(salted_right, [key, "_salt"], how)
    return out.drop("_salt")
