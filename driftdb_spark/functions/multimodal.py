"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched Pandas functions.

The decode step itself is STUBBED (no image/audio libraries in this
container): ``_decode_image_stub`` produces a deterministic fake
(dimensions + per-channel means derived from the bytes), clearly marked.
Everything around it — the schema contract, ``mapInPandas`` batch shape,
partition behavior, feature-vector output — is real and tested; swapping in
PIL/ffmpeg later changes only the stub's body.

Design: binary payloads never pass through Python row-at-a-time. The batch
arrives as Arrow; the UDF is vectorized over the pandas Series. Feature
extraction emits fixed-width arrays so downstream similarity ops
(functions/similarity.py) apply unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("source", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channel_means", T.ArrayType(T.DoubleType()), True),
        T.StructField("phash", T.StringType(), True),
    ]
)


def _decode_image_stub(content: bytes) -> tuple[int, int, list[float]]:
    """DETERMINISTIC FAKE decoder — stands in for PIL/libvips (not available
    in this container). Derives (width, height, channel means) from a content
    digest so tests are stable. Replace the body with a real decode to go
    live; the schema/batching contract stays identical."""
    digest = hashlib.sha256(content).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    means = [digest[2 + c] / 255.0 for c in range(3)]
    return width, height, means


def extract_image_features(media: DataFrame) -> DataFrame:
    """Vectorized feature extraction over binary image columns.

    ``mapInPandas``: each Arrow batch of (media_id, content) pandas frames →
    fixed-width feature rows. Binary bytes stay in Arrow buffers until the
    stub touches them.
    """

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                _decode_image_stub(c if c is not None else b"") for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "channel_means": [d[2] for d in decoded],
                    "phash": [
                        hashlib.sha256(c if c is not None else b"").hexdigest()[:16]
                        for c in pdf["content"]
                    ],
                }
            )

    return media.filter(F.col("kind") == "image").select("media_id", "content").mapInPandas(
        features, IMAGE_FEATURES_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: emits (media_id, frame_idx) work units
    from the metadata without decoding — the shuffle-friendly shape where
    each frame decode lands on its own task. The decode itself is the same
    stubbed boundary as images."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        (F.col("meta.n_bytes") / (every_n * 1024)).cast("int"), F.lit(0)
                    ),
                )
            ).alias("frame_idx"),
        )
    )


def synthetic_media(spark, n: int = 8) -> DataFrame:
    """Deterministic in-memory media fixture (the testdata has no binary
    table); used by tests and demos."""
    rows = []
    for i in range(n):
        content = bytes([(i * 37 + j) % 256 for j in range(256 + i)])
        kind = ["image", "audio", "video"][i % 3]
        rows.append(
            (i, kind, content, (f"{kind}/x-fake", f"src{i % 3}", len(content)))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
