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
    """Persist as a bucketed (+sorted) MANAGED Parquet table. Readers that
    join or aggregate on ``key`` skip the shuffle (and the sort, if
    sorted) — Spark's equivalent of a clustered index layout.

    For external-path, multi-column-bucket layouts and the co-located
    fact⋈fact join contract, use ``sources/bucketed.py`` — that module is
    the canonical bucketed writer; this wrapper keeps the managed-table
    convenience (stale-table drop + orphaned-warehouse-location cleanup)
    used by plan tests.
    """
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
    """Skew-resistant equi-join — delegates to the canonical
    ``operators/joins.salted_join`` (deterministic xxhash64 row salt; the
    old ``F.rand``-based salt here made retried stages non-reproducible).
    ``seed`` is retained for API compatibility and ignored."""
    from pgvector_db_spark.operators.joins import salted_join as _sj

    del seed
    return _sj(left, right, key, num_salts=salt, how=how)


def zvalue(cols: list, maxima: list[tuple[float, float]], bits: int = 12):
    """Morton (Z-order) value of ``cols`` as a pure Catalyst expression.

    Each column is min/max-normalized onto a ``bits``-bit integer grid,
    then the grids' bits are interleaved (column i contributes bit b to
    output position ``b * n_cols + i``). Locality on the curve implies
    locality in EVERY input dimension — the property multi-column file
    pruning needs.
    """
    n = len(cols)
    graded = []
    for c, (lo, hi) in zip(cols, maxima):
        c = F.col(c) if isinstance(c, str) else c
        span = (hi - lo) or 1.0
        scaled = (c.cast("double") - F.lit(float(lo))) / F.lit(float(span))
        clamped = F.least(F.greatest(scaled, F.lit(0.0)), F.lit(1.0))
        graded.append(
            F.least(
                (clamped * (1 << bits)).cast("bigint"), F.lit((1 << bits) - 1)
            )
        )
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, g in enumerate(graded):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(g, b).bitwiseAND(F.lit(1)), b * n + i)
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 12,
    files: int = 16,
) -> None:
    """Z-order layout: range-partition + sort by the Morton value of
    ``cols``, so each output file covers a small hyper-rectangle of the
    key space. Parquet footer min/max stats on EVERY z-ordered column are
    then narrow per file/row-group, and a selective filter on ANY of the
    columns prunes most files at the scan — the multi-dimensional analogue
    of partition pruning, without the small-partition explosion of
    ``partitionBy(col1, col2)``. One stats pass + one range shuffle.
    """
    stats = df.agg(
        *[f(c).alias(f"{tag}_{c}") for c in cols for tag, f in (("mn", F.min), ("mx", F.max))]
    ).first()
    maxima = [(float(stats[f"mn_{c}"]), float(stats[f"mx_{c}"])) for c in cols]
    (
        df.withColumn("_z", zvalue(cols, maxima, bits))
        .repartitionByRange(files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
