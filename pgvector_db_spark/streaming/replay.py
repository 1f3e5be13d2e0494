"""Stream sources for the engine.

The reference *simulates* streaming by looping records client-side
(notebooks/pgvector_db.ipynb:118-241) and itself recommends "batch
streaming frameworks like Spark Streaming" for the COPY path (:127).
Here streams are real Structured Streaming sources:

- ``file_stream``: replay a parquet table as a file-source stream —
  ``maxFilesPerTrigger`` controls micro-batch granularity (the test
  harness writes N files to get N micro-batches).
- ``rate_stream``: synthetic rate source for load tests.

In production the same transformations attach to Kafka/Kinesis sources
unchanged — source choice is orthogonal to the operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def file_stream(
    spark: SparkSession,
    path: str,
    schema,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def rate_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
