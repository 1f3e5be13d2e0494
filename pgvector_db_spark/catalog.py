"""Table registry: named Parquet datasets registered as temp views.

Mirrors the reference's ``(schema_name, table_name)`` addressing in
``DBConfigLocal`` (reference src/pgvector_db/utils.py:38-48) without a live
Postgres: each table is a Parquet dataset directory/file, loaded lazily and
registered in the session catalog so both the DataFrame API and
``spark.sql`` see the same names the DuckDB oracle uses.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects. We read them as raw int64 nanos
    (``spark.sql.legacy.parquet.nanosAsLong``) and rebuild microsecond
    timestamps — the test fixtures carry exact-microsecond values, so the
    conversion is lossless and matches what DuckDB reads natively."""
    if os.path.isdir(path):
        inner = [f for f in os.listdir(path) if f.endswith(".parquet")]
        if not inner:
            return []
        path = os.path.join(path, inner[0])
    schema = pq.read_schema(path)
    return [
        f.name
        for f in schema
        if str(f.type).startswith("timestamp[ns")
    ]


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table, normalizing timestamp columns to TimestampType.

    Two normalizations keep the engine's view of time identical to the
    DuckDB oracle's:
      - parquet TIMESTAMP(NANOS) → read as int64 nanos, rebuild micros;
      - naive parquet timestamps (isAdjustedToUTC=false), which Spark 4
        infers as TIMESTAMP_NTZ → cast to TIMESTAMP. The session timezone
        is pinned to UTC (session.py), so the cast preserves the stored
        wall-clock micros bit-for-bit while restoring the full function
        surface (unix_micros, window, to_utc_timestamp, …) that rejects
        NTZ inputs.
    """
    path = table_path(sf_dir, name)
    ns_cols = _nanos_timestamp_cols(path)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        # integer div, not `/`: float division of int64 nanos (~2^61) loses
        # precision beyond double's 53-bit mantissa and can round the
        # microsecond up; `div` truncates exactly like DuckDB's ns→us read
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    for f_ in df.schema.fields:
        if f_.dataType.typeName() == "timestamp_ntz":
            df = df.withColumn(f_.name, F.col(f_.name).cast("timestamp"))
    return df


def profile_table(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column data profile: rows, nulls, distincts, min/max (as
    strings). One distributed aggregate pass over the table, then a tiny
    unpivot of the single result row — the introspection surface next to
    the reference's pg_extension / relation-size checks (A22).
    """
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.countDistinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    one = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', `{c}__rows`, `{c}__nulls`, `{c}__distinct`, `{c}__min`, `{c}__max`"
        for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack}) AS "
        "(column_name, n_rows, n_nulls, n_distinct, min_str, max_str)"
    )


# per-session registry cache: session id → (sf_dir, names, tables). Reading
# 10 parquet footers + re-registering views per query call is pure driver
# overhead. Keyed by session with the *current* sf_dir so a switch to a
# different scale factor re-registers the views (temp views are global per
# session — a stale cache entry would leave them pointing elsewhere).
_REGISTRY_CACHE: dict[int, tuple[str, tuple[str, ...], dict[str, DataFrame]]] = {}


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Read each table and register it as a temp view of the same name.

    Parquet scans get predicate pushdown + column pruning from Catalyst for
    free; at cluster scale the same call reads a partitioned dataset
    directory and partition pruning applies to any partition columns.
    Also installs the SQL vector-function surface (functions/sql_registry).
    """
    from pgvector_db_spark.functions.sql_registry import register_sql_functions

    # Timestamp semantics (NTZ→LTZ normalization in read_table, epoch
    # extraction, window bucketing) are defined against a UTC session —
    # pin it here so correctness doesn't depend on who built the session
    # (the driver harness constructs its own SparkSession).
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    cached = _REGISTRY_CACHE.get(id(spark))
    if cached is not None and cached[0] == sf_dir and cached[1] == names:
        return cached[2]
    out: dict[str, DataFrame] = {}
    for name in names:
        df = read_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    register_sql_functions(spark)
    _REGISTRY_CACHE[id(spark)] = (sf_dir, names, out)
    return out
