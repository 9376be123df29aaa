"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side machinery (schemas, Arrow batch shapes, ``mapInPandas``
signatures, partitioning) is real and tested; the actual codec calls are
STUBBED behind ``_decode_image_bytes`` (the image/audio libraries are not in
this container). Swapping in PIL/torchaudio is a one-function change — batch
shapes and schemas stay identical.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),      # image | audio | video
        StructField("payload", BinaryType()),   # opaque encoded bytes
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("digest", StringType()),
        StructField("feature", ArrayType(FloatType())),  # fixed-dim embedding
    ]
)

FEATURE_DIM = 16


def _decode_image_bytes(payload: bytes) -> list[float]:
    """STUB decode: deterministic fake feature from the payload digest.

    Real implementation: PIL.Image.open(io.BytesIO(payload)) -> resize ->
    normalized pixel stats / model embedding. Raises nothing here so the
    distributed plumbing is exercised end-to-end with the fake."""
    d = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in d[:FEATURE_DIM]]


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes) for tests."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.pmod(F.col("id"), 3) + 1).cast("int")).alias("kind"),
        F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string")), 256).cast("binary").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        F.lit(1000).alias("duration_ms"),
    )


def extract_features(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow batches of encoded
    payloads in, fixed-dim float vectors out). At 100 TB this is the only
    Python stage; everything around it stays columnar."""

    def gen(batches):
        for pdf in batches:
            feats = [_decode_image_bytes(bytes(p) if p is not None else b"") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) if p is not None else 0 for p in pdf["payload"]],
                    "digest": [hashlib.sha256(bytes(p) if p is not None else b"").hexdigest() for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(gen, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 200) -> DataFrame:
    """Video frame-sampling plumbing: explode a deterministic frame timeline
    (decode stubbed; the row-explosion + partitioning is the real part)."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))).alias("frame_ms"),
        )
    )
