"""Multimodal plumbing tests: binary columns, metadata struct, Arrow-
batched decode/feature/frame operators (fake codec), real-codec gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pgvector_db_spark.operators.multimodal import (
    decode_image,
    media_features,
    resize_image,
    sample_frames,
    with_media_metadata,
)


@pytest.fixture(scope="module")
def media_df(spark):
    df = spark.createDataFrame(
        [(i, f"media-payload-{i}" * 8, "image") for i in range(20)],
        "media_id bigint, payload string, media_type string",
    )
    return df.withColumn("media", F.to_binary(F.col("payload"), F.lit("utf-8"))).drop(
        "payload"
    )


def test_metadata_struct(media_df):
    out = with_media_metadata(media_df)
    assert out.schema["meta"].dataType.simpleString() == (
        "struct<width:int,height:int,format:string,n_bytes:bigint>"
    )
    rows = out.collect()
    assert all(1 <= r["meta"]["width"] <= 1024 for r in rows)
    assert all(
        r["meta"]["n_bytes"] == len(f"media-payload-{r['media_id']}") * 8
        for r in rows
    )


def test_metadata_deterministic(media_df):
    a = with_media_metadata(media_df).select("media_id", "meta").collect()
    b = with_media_metadata(media_df).select("media_id", "meta").collect()
    assert a == b


def test_decode_image_shapes(media_df):
    out = decode_image(media_df, target=(4, 4))
    rows = out.collect()
    assert len(rows) == 20
    assert all(len(r["pixels"]) == 16 for r in rows)
    assert all(0.0 <= p < 1.0 for r in rows for p in r["pixels"])


def test_decode_deterministic_per_content(media_df):
    rows = decode_image(media_df).collect()
    by_id = {r["media_id"]: r["pixels"] for r in rows}
    rows2 = decode_image(media_df).collect()
    assert {r["media_id"]: r["pixels"] for r in rows2} == by_id


def test_resize_image_area_average(media_df):
    out = resize_image(decode_image(media_df, target=(4, 4)), src=(4, 4), target=(2, 2))
    rows = out.collect()
    assert len(rows) == 20
    assert all(len(r["pixels_resized"]) == 4 for r in rows)
    # each output pixel is the mean of its 2x2 source block
    r = rows[0]
    px = r["pixels"]
    expected = (px[0] + px[1] + px[4] + px[5]) / 4.0
    assert abs(r["pixels_resized"][0] - expected) < 1e-6


def test_resize_rejects_non_divisible():
    with pytest.raises(ValueError):
        resize_image(None, src=(4, 4), target=(3, 3))


def test_media_features_dim(media_df):
    rows = media_features(media_df, dim=8).collect()
    assert all(len(r["features"]) == 8 for r in rows)
    assert all(-1.0 <= v <= 1.0 for r in rows for v in r["features"])


def test_sample_frames_explodes(media_df):
    out = sample_frames(media_df, n_frames=4)
    assert out.count() == 80
    idxs = {r["frame_idx"] for r in out.select("frame_idx").collect()}
    assert idxs == {0, 1, 2, 3}


def test_real_codec_raises(media_df):
    with pytest.raises(NotImplementedError, match="pillow"):
        decode_image(media_df, codec="pillow")
    with pytest.raises(NotImplementedError):
        media_features(media_df, codec="librosa")
    with pytest.raises(NotImplementedError):
        sample_frames(media_df, codec="ffmpeg")


def test_metadata_predicate_prunes_before_decode(media_df, tmp_path):
    """Filtering on metadata must push to the parquet scan — bytes of
    non-matching rows are never decoded."""
    from pgvector_db_spark.plans.explain import assert_pushed_filters

    path = str(tmp_path / "media")
    with_media_metadata(media_df).write.parquet(path)
    spark = media_df.sparkSession
    back = spark.read.parquet(path).filter(F.col("media_type") == "image")
    assert_pushed_filters(back, "media_type")


def test_read_media_dir_binaryfile(spark, tmp_path):
    """binaryFile source → multimodal table: one row per file, typed by
    extension, metadata attached, glob pruning at the listing."""
    from pgvector_db_spark.sources.media import read_media_dir, write_media_files

    root = write_media_files(
        [
            ("a/x.jpg", b"\xff\xd8fakejpeg"),
            ("a/y.wav", b"RIFFfakewav"),
            ("b/z.mp4", b"\x00fakemp4"),
            ("b/skip.txt", b"not media"),
        ],
        str(tmp_path / "media"),
    )
    df = read_media_dir(spark, root)
    rows = {r["media_type"] for r in df.collect()}
    assert rows == {"image", "audio", "video", "other"}
    got = {r["path"].rsplit("/", 1)[-1]: r for r in df.collect()}
    assert got["x.jpg"]["media_type"] == "image"
    assert bytes(got["y.wav"]["media"]) == b"RIFFfakewav"
    assert got["z.mp4"]["meta"]["n_bytes"] == 8
    # glob filter prunes at listing time — only jpgs are read
    only_jpg = read_media_dir(spark, root, glob="*.jpg")
    assert [r["media_type"] for r in only_jpg.collect()] == ["image"]
    # decode plumbing runs on the ingested table
    from pgvector_db_spark.operators.multimodal import decode_image

    dec = decode_image(only_jpg.select("media", "media_type", "meta"))
    assert dec.count() == 1
