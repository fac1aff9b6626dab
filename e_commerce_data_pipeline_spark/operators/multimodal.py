"""Multimodal column plumbing (north-star): image/audio/video as opaque
``binary`` columns + typed metadata, processed via Arrow-batched
``mapInPandas``.

The container has no image/audio libraries, so the decode kernels are
STUBBED: ``decode_image_meta`` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder (header
parse of our synthetic byte layout) runs — the Spark-side plumbing
(schema, batch iteration, partitioning, UDF signatures) is real and
tested either way.

Batch shape: mapInPandas receives an iterator of Arrow record batches;
kernels must stream batch-by-batch (never materialize the iterator) so
peak executor memory is one batch regardless of partition size — the
property that matters at 100 TB.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("content", BinaryType(), True),
        StructField("content_length", LongType(), True),
        StructField("source_uri", StringType(), True),
    ]
)

IMAGE_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("format", StringType(), True),
    ]
)

# Synthetic byte layout for the fake decoder: b"FAKEIMG" + w(2) + h(2) + c(1)
_MAGIC = b"FAKEIMG"


def make_fake_image_bytes(width: int, height: int, channels: int = 3) -> bytes:
    return _MAGIC + width.to_bytes(2, "big") + height.to_bytes(2, "big") + bytes([channels])


def synthetic_media_table(spark, n: int = 100) -> DataFrame:
    """Deterministic media table for plumbing tests."""
    rows = [
        (
            i,
            "image",
            make_fake_image_bytes(64 + (i % 8) * 32, 64 + (i % 5) * 48),
            None,
            f"mem://media/{i}.img",
        )
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    return df.withColumn("content_length", F.length("content").cast("long"))


def decode_image_meta(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode image dimensions via mapInPandas.

    Real decode needs an imaging library (not in this container):
    raises NotImplementedError unless ``fake=True`` (deterministic
    header parse of the synthetic layout).
    """
    if not fake:
        raise NotImplementedError(
            "image decode requires an imaging library (e.g. Pillow); "
            "run with fake=True for the deterministic stub decoder"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:  # one Arrow batch at a time — bounded memory
            out = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                if content is not None and bytes(content[:7]) == _MAGIC:
                    w = int.from_bytes(bytes(content[7:9]), "big")
                    h = int.from_bytes(bytes(content[9:11]), "big")
                    c = content[11]
                    out.append((media_id, w, h, int(c), "fakeimg"))
                else:
                    out.append((media_id, None, None, None, None))
            yield pd.DataFrame(
                out, columns=["media_id", "width", "height", "channels", "format"]
            )

    return df.select("media_id", "content").mapInPandas(kernel, IMAGE_META_SCHEMA)


def resize_images(df: DataFrame, target: tuple[int, int], fake: bool = False) -> DataFrame:
    """Resize kernel plumbing; stubbed like decode."""
    if not fake:
        raise NotImplementedError("resize requires an imaging library")
    tw, th = target

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["content"] = [
                make_fake_image_bytes(tw, th) if c is not None else None
                for c in pdf["content"]
            ]
            yield pdf

    return df.select("media_id", "content").mapInPandas(
        kernel, "media_id long, content binary"
    )


def sample_video_frames(
    df: DataFrame, every_n: int = 10, fake: bool = False
) -> DataFrame:
    """Frame-sampling plumbing for video columns (stubbed decode)."""
    if not fake:
        raise NotImplementedError("video decode requires a codec library")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                n_frames = (len(content) if content is not None else 0) % 97 + 3
                for f in range(0, n_frames, every_n):
                    rows.append((media_id, f, make_fake_image_bytes(32, 32)))
            yield pd.DataFrame(rows, columns=["media_id", "frame_no", "frame"])

    return df.select("media_id", "content").mapInPandas(
        kernel, "media_id long, frame_no int, frame binary"
    )
