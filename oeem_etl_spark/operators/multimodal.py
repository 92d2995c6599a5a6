"""Multimodal column plumbing (SURVEY.md §2.L8).

Image/audio/video payloads are opaque ``binary`` columns + a typed
metadata struct. The Spark-side plumbing — schema, partition-friendly
layout, Arrow-batched UDF signatures, batch shapes — is real and tested;
the actual codec work is stubbed (no image/audio libraries in this
container) behind ``decode_image``, which raises NotImplementedError, and
``fake_features``, a deterministic stand-in with the same dataflow shape.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as Ty

# Canonical multimodal schema: payload + typed metadata.
MULTIMODAL_SCHEMA = Ty.StructType(
    [
        Ty.StructField("asset_id", Ty.LongType(), False),
        Ty.StructField("content", Ty.BinaryType(), True),
        Ty.StructField(
            "meta",
            Ty.StructType(
                [
                    Ty.StructField("mime", Ty.StringType(), True),
                    Ty.StructField("width", Ty.IntegerType(), True),
                    Ty.StructField("height", Ty.IntegerType(), True),
                    Ty.StructField("n_bytes", Ty.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16


def to_multimodal(df: DataFrame, key: str, payload_col: str, mime: str) -> DataFrame:
    """Wrap an arbitrary binary/string column into the canonical
    multimodal shape (ingestion adapter)."""
    content = F.col(payload_col).cast("binary")
    return df.select(
        F.col(key).cast("long").alias("asset_id"),
        content.alias("content"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.length(content).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(content: bytes) -> "object":
    """Real decode would use PIL/libvips — STUB: not available here.

    Cited design: at scale this runs inside ``extract_features``'s
    mapInPandas loop, one Arrow batch of payloads at a time, never
    materializing more than a batch per core.
    """
    raise NotImplementedError(
        "image decoding requires PIL/libvips, not present in this environment"
    )


def _fake_feature_row(content: bytes) -> list[float]:
    """Deterministic stand-in for a feature extractor: FEATURE_DIM floats
    derived from an md5 of the payload. Same signature/batch shape as a
    real CNN embedding."""
    import hashlib

    if content is None:
        return [0.0] * FEATURE_DIM
    d = hashlib.md5(bytes(content)).digest()
    return [d[i % 16] / 255.0 for i in range(FEATURE_DIM)]


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over multimodal rows: iterator of
    Arrow batches in/out — constant memory, schema declared explicitly.
    Swap ``_fake_feature_row`` for a real model call in production."""
    schema = "asset_id long, features array<float>, n_bytes long"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "features": pdf["content"].map(_fake_feature_row),
                    "n_bytes": pdf["content"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                }
            )

    return df.mapInPandas(fn, schema)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling PLUMBING: expands each asset into frame-index
    rows (decode stubbed). Real decoding happens in extract_features-style
    batches downstream; here we materialize the (asset_id, frame_idx) plan
    JVM-side so the expensive Python step sees pre-pruned work."""
    n_frames = (F.length(F.col("content")) / every_n).cast("int")
    return df.select(
        "asset_id",
        F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))).alias(
            "frame_idx"
        ),
    ).withColumn("byte_offset", F.col("frame_idx") * every_n)
