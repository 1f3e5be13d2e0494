"""Multimodal columns: image/audio/video as opaque binary + typed metadata
(SURVEY §2.3 north-star extension).

Convention: a media table carries
    media        binary            — the raw bytes (opaque to the engine)
    media_type   string            — 'image' | 'audio' | 'video'
    meta         struct<...>       — typed, queryable metadata

The Spark-side plumbing is real and tested: schema handling, Arrow-batched
``mapInPandas`` decode/feature/frame operators, partition-parallel
execution. The actual codecs (PIL/librosa/ffmpeg) are NOT in this image,
so decoding is gated: ``codec='fake'`` produces deterministic
hash-derived outputs with the correct shapes; any real codec name raises
``NotImplementedError`` at the import boundary, clearly marked.

At 100 TB: binaries stay columnar in parquet; metadata predicates prune
row groups before any byte is decoded (filter on ``meta.*`` or
``media_type`` pushes down); decode cost is per-partition Python, Arrow-
batched, and scales with executors.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = "struct<width:int,height:int,format:string,n_bytes:bigint>"


def with_media_metadata(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Attach the typed metadata struct, derived engine-side (JVM) from the
    bytes: length always; fake width/height from a stable byte hash so
    tests are deterministic. A real system would parse container headers
    here — still cheap, still per-row, same plumbing."""
    h = F.conv(F.substring(F.md5(F.col(media_col)), 1, 4), 16, 10).cast("int")
    return df.withColumn(
        "meta",
        F.struct(
            (F.pmod(h, F.lit(1024)) + 1).cast("int").alias("width"),
            (F.pmod(F.shiftright(h, 2), F.lit(1024)) + 1).cast("int").alias("height"),
            F.lit("fake/raw").alias("format"),
            F.length(F.col(media_col)).cast("bigint").alias("n_bytes"),
        ),
    )


def _require_fake(codec: str, op: str) -> None:
    if codec != "fake":
        raise NotImplementedError(
            f"{op}: real codec {codec!r} is not available in this environment "
            "(image/audio libs not installed); use codec='fake' for the "
            "deterministic plumbing path"
        )


def decode_image(
    df: DataFrame,
    media_col: str = "media",
    out_col: str = "pixels",
    target: tuple[int, int] = (4, 4),
    codec: str = "fake",
) -> DataFrame:
    """Decode (+resize) to a flat float array of ``target`` size.

    Arrow-batched ``mapInPandas``: one Python roundtrip per partition
    batch, never per row. Fake codec: pixels are md5-derived floats in
    [0, 1) — deterministic, shape-correct.
    """
    _require_fake(codec, "decode_image")
    w, h = target
    n_px = w * h
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema = f"{fields}, {out_col} array<float>"

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pixels = []
            for raw in pdf[media_col]:
                d = hashlib.md5(bytes(raw) if raw is not None else b"").digest()
                # stretch 16 digest bytes deterministically over n_px floats
                pixels.append(
                    [d[i % 16] / 256.0 + (i // 16) * 0.0 for i in range(n_px)]
                )
            yield pdf.assign(**{out_col: pixels})

    return df.mapInPandas(decode, schema=out_schema)


def resize_image(
    df: DataFrame,
    pixels_col: str = "pixels",
    src: tuple[int, int] = (4, 4),
    target: tuple[int, int] = (2, 2),
    out_col: str = "pixels_resized",
) -> DataFrame:
    """Resize an already-decoded flat pixel array by area-average
    pooling (the standard downsample kernel). No codec needed — this is
    pure numpy over Arrow batches, so the operator itself is real, not a
    stub, and it composes after :func:`decode_image`.

    Scale shape: embarrassingly parallel per row, vectorized per batch;
    the only data movement is the pipeline's existing partitioning.
    """
    import numpy as np

    sw, sh = src
    tw, th = target
    if sw % tw or sh % th:
        raise ValueError(f"target {target} must divide source {src}")
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema = f"{fields}, {out_col} array<float>"

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            arr = np.asarray(list(pdf[pixels_col]), dtype=np.float64)
            out: list[list[float]] = []
            if len(arr):
                imgs = arr.reshape(len(arr), sh, sw)
                pooled = imgs.reshape(
                    len(arr), th, sh // th, tw, sw // tw
                ).mean(axis=(2, 4))
                out = pooled.reshape(len(arr), th * tw).astype(np.float32).tolist()
            yield pdf.assign(**{out_col: out})

    return df.mapInPandas(resize, schema=out_schema)


def media_features(
    df: DataFrame,
    media_col: str = "media",
    out_col: str = "features",
    dim: int = 8,
    codec: str = "fake",
) -> DataFrame:
    """Feature-extraction UDF boundary (embed-the-image analogue of
    functions/embedding.py). Fake codec: hash-derived unit-scaled floats."""
    _require_fake(codec, "media_features")
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema = f"{fields}, {out_col} array<double>"

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for raw in pdf[media_col]:
                b = bytes(raw) if raw is not None else b""
                vals = []
                for i in range(dim):
                    d = hashlib.md5(b + f"_f{i}".encode()).digest()
                    vals.append(int.from_bytes(d[:4], "big") / 2**31 - 1.0)
                feats.append(vals)
            yield pdf.assign(**{out_col: feats})

    return df.mapInPandas(featurize, schema=out_schema)


def sample_frames(
    df: DataFrame,
    media_col: str = "media",
    n_frames: int = 4,
    frame_bytes: int = 16,
    codec: str = "fake",
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (explode),
    frame = evenly-spaced byte slice. Real ffmpeg extraction would keep
    the identical row-explosion shape; only the slicing differs."""
    _require_fake(codec, "sample_frames")
    n = F.length(F.col(media_col))
    idxs = F.sequence(F.lit(0), F.lit(n_frames - 1))
    frames = F.transform(
        idxs,
        lambda i: F.struct(
            i.cast("int").alias("frame_idx"),
            F.substring(
                F.col(media_col).cast("string"),
                (i * F.greatest(n / n_frames, F.lit(1))).cast("int") + 1,
                frame_bytes,
            ).alias("frame_data"),
        ),
    )
    return (
        df.withColumn("_frame", F.explode(frames))
        .withColumn("frame_idx", F.col("_frame.frame_idx"))
        .withColumn("frame_data", F.col("_frame.frame_data"))
        .drop("_frame")
    )


def audio_rms_windows(
    df: DataFrame,
    media_col: str = "media",
    window: int = 16,
) -> DataFrame:
    """Audio analysis shape: treat the media bytes as unsigned 8-bit PCM
    samples and emit one row per fixed-size window with its RMS energy —
    the VAD/silence-trim primitive of an audio pipeline. PURE Catalyst:
    bytes → hex pairs → integer samples → per-window sqrt(mean(s²)), no
    Python anywhere. The window mean divides by a power of two and the
    samples are exact small ints, so the RMS doubles are bit-identical
    on any engine (the gate oracle recomputes them in DuckDB SQL).

    A real codec front-end (ffmpeg decode to PCM) would replace only the
    byte source; the windowing/energy plan is the production shape.
    Output: one row per (input row, window_idx) with ``rms``.
    """
    h = F.upper(F.hex(F.col(media_col)))
    n_samples = (F.length(h) / 2).cast("int")
    n_windows = F.ceil(n_samples / F.lit(window)).cast("int")

    def sample(j):  # j: 0-based sample index Column → double in [0, 255]
        pair = F.substring(h, j * 2 + 1, 2)
        # conv('') is NULL — coalesce to 0 so the final partial window is
        # zero-padded instead of NULL-poisoned
        return F.coalesce(F.conv(pair, 16, 10).cast("double"), F.lit(0.0))

    def window_rms(w):
        sq_sum = F.aggregate(
            F.sequence(F.lit(0), F.lit(window - 1)),
            F.lit(0.0),
            # samples past the end read as empty substring → conv '' = 0,
            # matching zero-padding of the final partial window
            lambda acc, i: acc + sample(w * window + i) * sample(w * window + i),
        )
        return F.sqrt(sq_sum / F.lit(float(window)))

    # sequence(0, -1) counts DOWN — empty media must yield zero windows
    wins = F.when(
        n_windows > 0,
        F.transform(
            F.sequence(F.lit(0), n_windows - 1),
            lambda w: F.struct(
                w.cast("int").alias("window_idx"), window_rms(w).alias("rms")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<window_idx:int,rms:double>>"))
    return (
        df.withColumn("_w", F.explode(wins))
        .withColumn("window_idx", F.col("_w.window_idx"))
        .withColumn("rms", F.col("_w.rms"))
        .drop("_w")
    )
