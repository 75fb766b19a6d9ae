"""Multimodal (image/audio/video) column plumbing.

North-star extension (SURVEY.md §7 Phase 3): treat media as opaque
``binary`` payload columns with a typed metadata struct; run decode /
feature-extract / resize / frame-sample as Arrow-batched pandas
functions over ``mapInPandas`` so each executor processes columnar
batches (zero-copy Arrow transfer), never row-at-a-time Python.

The decode kernels themselves are STUBBED (no image/audio libraries in
this container — clearly marked below); the Spark-side contract that
matters at 100 TB is real and tested:
  - schema: payload stays a lazy binary column; metadata is queryable
    without touching payload bytes (column pruning drops the blob read
    when only metadata is selected — parquet columnar wins)
  - partitioning: blobs are size-bucketed so row groups stay balanced
  - batch shape: mapInPandas yields bounded-size record batches
    (``spark.sql.execution.arrow.maxRecordsPerBatch``)
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("content_md5", T.StringType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)


def documents_as_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter: build a media-shaped table from the documents fixture
    (text bytes stand in for blob payloads in tests)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.length(payload).cast("long").alias("n_bytes"),
            F.md5(payload).alias("content_md5"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )


def extract_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Metadata extraction with built-ins only (no UDF): byte length +
    content hash. Runs without decoding and without Python."""
    p = F.col(payload_col)
    return df.withColumn(
        "meta",
        F.struct(
            F.length(p).cast("long").alias("n_bytes"),
            F.md5(p).alias("content_md5"),
            F.lit("application/octet-stream").alias("mime"),
        ),
    )


_FEATURE_DIM = 8


def _fake_decode_features(payload: bytes | None, dim: int = _FEATURE_DIM) -> list[float]:
    """Deterministic FAKE decode: derives `dim` floats from the content
    hash. Stands in for a real image/audio decoder (library not in this
    container); replace the body, keep the signature."""
    if payload is None:
        return [0.0] * dim
    digest = hashlib.md5(payload).digest()
    return [digest[i] / 255.0 for i in range(dim)]


def decode_and_featurize(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Arrow-batched decode → feature vector via mapInPandas.

    The batch shape is the contract: each iterator element is a pandas
    DataFrame of ~arrow-batch-size rows; we return only (media_id,
    features) so the heavy payload column is dropped as early as
    possible (projection happens Spark-side BEFORE the Python worker —
    select the needed columns first).
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("features", T.ArrayType(T.DoubleType()), False),
        ]
    )
    narrow = df.select("media_id", payload_col)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "features": pdf[payload_col].map(_fake_decode_features),
                }
            )

    return narrow.mapInPandas(batches, out_schema)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:  # pragma: no cover
    """STUB — requires an image library not present in this container."""
    raise NotImplementedError(
        "Image resize requires PIL/opencv which are not available; "
        "wire the real decoder into decode_and_featurize-style mapInPandas."
    )


def sample_video_frames(df: DataFrame, every_n: int) -> DataFrame:  # pragma: no cover
    """STUB — requires a video library not present in this container."""
    raise NotImplementedError(
        "Video frame sampling requires ffmpeg/decord which are not available."
    )


def size_bucketed(df: DataFrame, *, target_bytes: int = 64 << 20) -> DataFrame:
    """Repartition media rows so each task sees ~target_bytes of payload
    (keeps Arrow batches and parquet row groups balanced when blob sizes
    are skewed). NOTE: runs one Spark action (a sum) to size the
    exchange — call once per pipeline, not per batch."""
    total = df.agg(F.sum(F.length("payload"))).first()[0] or 0
    n = max(1, int(total / target_bytes))
    return df.repartition(n, "media_id")
