"""Bucketed table layouts — the shuffle-free fact⋈fact join at 100 TB.

The star joins in this engine broadcast their dimensions, so the only
remaining exchange in a query like revenue-by-nation is the
lineitem⋈orders join on orderkey (docs/SCALE_AUDIT.md). At 100 TB that
exchange moves the fact tables across the cluster on every query. The
fix is a WRITE-TIME contract: persist both tables bucketed (hashed) into
the same number of buckets on the join key — Spark's scan then reports
`HashPartitioning(key, n)` and the sort-merge join needs NO Exchange on
either side, query after query. (Same idea as pg's clustered layouts;
here it is Spark's native `bucketBy`, readable by any Spark job.)

Bucket metadata lives in the session catalog (`saveAsTable`); data files
are plain parquet at ``path``. One bucket file per (bucket, writing
task), so repartition by the bucket key before writing to get exactly
``num_buckets`` files.

Sizing at 100 TB: pick ``num_buckets`` so one bucket of the LARGER table
fits an executor's shuffle-free sort budget (~1-2 GB of parquet) —
e.g. 50 TB of lineitem → ~32k buckets. Both tables MUST use the same
``num_buckets`` for the exchange-free plan (Spark does not coalesce
mismatched bucket counts unless ``spark.sql.bucketing.coalesceBucketsInJoin``
is enabled).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed parquet table ``name`` at ``path``.

    ``sort_cols`` additionally sorts within each bucket file, which lets
    the sort-merge join skip its per-task sort too (scan is
    ordered-by-key already).
    """
    writer = (
        df.repartition(num_buckets, *bucket_cols)
        .write.format("parquet")
        .mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.option("path", path).saveAsTable(name)


def ensure_bucketed(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    path: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """Idempotent: (re)register-or-write the bucketed layout and return
    the catalog-backed DataFrame. A fresh session has an empty in-memory
    catalog even when the files exist, so the write is re-run (overwrite)
    — production would use a persistent metastore and skip it."""
    if not spark.catalog.tableExists(name):
        write_bucketed(
            df, name, path, bucket_cols, num_buckets, sort_cols=sort_cols
        )
    return spark.table(name)
