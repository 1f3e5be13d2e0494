"""Raw media-file ingestion via Spark's built-in ``binaryFile`` source.

Turns a directory tree of opaque media files (images/audio/video) into
the engine's multimodal table convention (operators/multimodal.py):
``media binary, media_type string, meta struct<...>`` plus the file's
path and modification time from the source.

Scale shape: ``binaryFile`` is a first-class FileFormat — listing is
distributed, each file becomes one row in a partition-parallel scan, and
``pathGlobFilter``/``recursiveFileLookup`` prune at the listing (no
bytes read for skipped files). ``spark.sql.files.maxPartitionBytes``
governs how many files pack into a task, so millions of small media
files coalesce into sane tasks instead of one-task-per-file.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# extension → media_type convention; anything else is 'other'
_TYPE_BY_EXT = {
    "jpg": "image", "jpeg": "image", "png": "image", "gif": "image",
    "wav": "audio", "mp3": "audio", "flac": "audio",
    "mp4": "video", "mkv": "video", "webm": "video",
}


def media_type_for(path_col) -> F.Column:
    ext = F.lower(F.element_at(F.split(path_col, r"\."), -1))
    expr = F.lit("other")
    for e, t in _TYPE_BY_EXT.items():
        expr = F.when(ext == e, F.lit(t)).otherwise(expr)
    return expr


def read_media_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Directory of media files → multimodal table (one row per file)."""
    from pgvector_db_spark.operators.multimodal import with_media_metadata

    reader = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", str(recursive).lower())
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    df = raw.select(
        F.col("path"),
        F.col("modificationTime").alias("modification_time"),
        F.col("content").alias("media"),
        media_type_for(F.col("path")).alias("media_type"),
    )
    return with_media_metadata(df)


def write_media_files(rows: list[tuple[str, bytes]], root: str) -> str:
    """Test helper: materialize (relative_path, bytes) pairs under root."""
    for rel, data in rows:
        full = os.path.join(root, rel)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        with open(full, "wb") as f:
            f.write(data)
    return root
