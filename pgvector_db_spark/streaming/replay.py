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


def stage_replay_splits(
    spark: SparkSession, src_path: str, replay_dir: str, n_files: int
) -> str:
    """Stage a parquet table as ``n_files`` part files so a
    ``maxFilesPerTrigger=1`` file stream replays it as ``n_files``
    micro-batches — the harness for multi-batch maintenance paths
    (segment growth, compaction policy). Atomic like
    :func:`stage_replay_file`: written to a ``.tmp`` dir then renamed,
    with a marker file so a finished staging is reused across runs (the
    split ASSIGNMENT may vary between Spark runs, but every row lands in
    exactly one file, which is all additive-stats consumers need)."""
    import os
    import shutil

    # underscore-prefixed files are invisible to Spark's file index, so
    # the marker can live inside the streamed dir; it records the source
    # size so a regenerated fixture forces a restage
    marker = os.path.join(replay_dir, f"_staged_{n_files}")
    src_size = str(os.path.getsize(src_path))
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == src_size:
                return replay_dir
    shutil.rmtree(replay_dir, ignore_errors=True)
    tmp = replay_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    (
        spark.read.parquet(src_path)
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(tmp)
    )
    # _SUCCESS and the dot-prefixed .crc files Spark leaves behind are
    # hidden from its own file index — no cleanup needed
    os.rename(tmp, replay_dir)
    with open(marker, "w") as f:
        f.write(src_size)
    return replay_dir


def stage_replay_df(
    df: DataFrame, replay_dir: str, n_files: int, fingerprint: str
) -> str:
    """Stage a DERIVED DataFrame (no single source file to size-check)
    as ``n_files`` part files for ``maxFilesPerTrigger=1`` replay, with
    the same atomicity discipline as :func:`stage_replay_splits`:
    written to a ``.tmp`` dir, renamed into place, marker recording the
    caller's ``fingerprint`` so a changed derivation forces a restage.
    Row-to-file assignment may vary between Spark runs — callers must be
    split-insensitive (e.g. seq-resolved CDC folds)."""
    import os
    import shutil

    marker = os.path.join(replay_dir, f"_staged_{n_files}")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == fingerprint:
                return replay_dir
    shutil.rmtree(replay_dir, ignore_errors=True)
    tmp = replay_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    os.rename(tmp, replay_dir)
    with open(marker, "w") as f:
        f.write(fingerprint)
    return replay_dir


def stage_replay_file(src_path: str, replay_dir: str, name: str) -> str:
    """Stage one fixture file into a replay directory, atomically and
    freshness-checked — the shared helper behind every file-replay gate
    query (copy to ``.tmp`` then rename, so a killed run never leaves a
    truncated file a later run would stream; re-copy when the source's
    size changed, so a regenerated fixture isn't shadowed by a stale
    cached copy)."""
    import os
    import shutil

    os.makedirs(replay_dir, exist_ok=True)
    dst = os.path.join(replay_dir, name)
    if (
        not os.path.exists(dst)
        or os.path.getsize(dst) != os.path.getsize(src_path)
    ):
        shutil.copy(src_path, dst + ".tmp")
        os.rename(dst + ".tmp", dst)
    return dst
