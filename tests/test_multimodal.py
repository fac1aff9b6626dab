"""Multimodal plumbing tests: schema, mapInPandas batch shape, stubbed
decode behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from e_commerce_data_pipeline_spark.operators.multimodal import (
    decode_image_meta,
    resize_images,
    sample_video_frames,
    synthetic_media_table,
)


def test_real_decode_is_explicitly_stubbed(spark):
    df = synthetic_media_table(spark, 5)
    with pytest.raises(NotImplementedError):
        decode_image_meta(df)  # no imaging library in this container


def test_fake_decode_parses_header(spark):
    df = synthetic_media_table(spark, 40)
    meta = decode_image_meta(df, fake=True)
    rows = meta.collect()
    assert len(rows) == 40
    assert all(r["format"] == "fakeimg" for r in rows)
    assert all(64 <= r["width"] <= 64 + 7 * 32 for r in rows)
    # deterministic: id 0 -> 64x64
    r0 = [r for r in rows if r["media_id"] == 0][0]
    assert (r0["width"], r0["height"], r0["channels"]) == (64, 64, 3)


def test_corrupt_content_yields_nulls_not_errors(spark):
    df = spark.createDataFrame(
        [(1, "image", bytearray(b"not an image"), 12, None)],
        "media_id long, media_type string, content binary, content_length long, source_uri string",
    )
    row = decode_image_meta(df, fake=True).collect()[0]
    assert row["width"] is None and row["format"] is None


def test_resize_plumbing(spark):
    df = synthetic_media_table(spark, 10)
    resized = resize_images(df, (16, 16), fake=True)
    meta = decode_image_meta(resized, fake=True)
    assert all((r["width"], r["height"]) == (16, 16) for r in meta.collect())


def test_video_frame_sampling(spark):
    df = synthetic_media_table(spark, 6)
    frames = sample_video_frames(df, every_n=5, fake=True)
    per_media = frames.groupBy("media_id").count()
    assert per_media.count() == 6
    assert frames.filter(F.col("frame_no") % 5 != 0).count() == 0
