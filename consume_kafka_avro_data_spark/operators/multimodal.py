"""Multimodal columns (charter U8): image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

Convention: one row per asset —

    asset_id long, modality string, media binary,
    meta struct<mime string, width int, height int, duration_ms long>

The Spark-side plumbing (schema, partition sizing, UDF batch shape) is
real and tested; the actual pixel/sample decoding is STUBBED because no
image/audio library exists in this container:

* ``decode_features(..., codec="fake")`` — deterministic fake decoder:
  derives a fixed-dim feature vector from the bytes (seeded by a 64-bit
  FNV-1a of the payload), so downstream similarity/dedup pipelines are
  fully exercisable.
* ``codec="real"`` raises ``NotImplementedError`` at the exact seam
  where a PIL/libav call belongs.

Scale notes: media bytes never leave the executor — ``mapInPandas``
streams Arrow batches; ``frames_per_asset``-style explosion happens
inside the generator so peak memory is one batch, not one asset list.
Keep ``spark.sql.files.maxPartitionBytes`` moderate when assets are
large (a 128 MB parquet partition of 1 MB blobs ⇒ ~128 rows/task).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
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

from consume_kafka_avro_data_spark._serde import self_contained

MEDIA_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("media", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType(), True),
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("duration_ms", LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

_FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), True),
        StructField("features", ArrayType(FloatType()), True),
        StructField("n_bytes", LongType(), True),
    ]
)


def _fnv1a64(data: bytes) -> int:
    h = 0xCBF29CE484222325
    for byte in data:
        h ^= byte
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def _fake_decode(data: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for decode→feature-extract: a unit vector
    seeded by the payload hash.  Identical bytes ⇒ identical features,
    so exact/near-dup semantics downstream stay meaningful."""
    rng = np.random.default_rng(_fnv1a64(data))
    v = rng.standard_normal(dim)
    return (v / np.linalg.norm(v)).astype(np.float32)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter for the testdata: treat each document's UTF-8 bytes as an
    opaque media payload so the multimodal plumbing has real rows."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("text").alias("modality"),
        F.encode(F.col("text"), "utf-8").alias("media"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def decode_features(media: DataFrame, codec: str = "fake") -> DataFrame:
    """media rows → feature vectors via mapInPandas (Arrow batches).

    ``codec="real"`` marks the seam for an actual decoder (PIL/libav):
    not available in this container, so it raises NotImplementedError.
    """
    if codec == "real":
        raise NotImplementedError(
            "real media decoding needs an image/audio library not present "
            "in this environment; use codec='fake' for pipeline testing"
        )
    if codec != "fake":
        raise ValueError(f"unknown codec {codec!r}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "features": [
                        None if b is None else _fake_decode(bytes(b)).tolist()
                        for b in pdf["media"]
                    ],
                    "n_bytes": [
                        0 if b is None else len(b) for b in pdf["media"]
                    ],
                }
            )

    return media.mapInPandas(gen, schema=_FEATURES_SCHEMA)


_FRAMES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("frame_no", IntegerType(), False),
        StructField("frame", BinaryType(), True),
    ]
)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling for video-like payloads: split the byte stream into
    ``n_frames`` evenly spaced slices (stub for keyframe extraction) —
    one asset row fans out to n rows inside the Arrow batch generator."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for aid, blob in zip(pdf["asset_id"], pdf["media"]):
                if blob is None:
                    continue
                raw = bytes(blob)
                step = max(len(raw) // n_frames, 1)
                for i in range(n_frames):
                    ids.append(aid)
                    nos.append(i)
                    frames.append(raw[i * step : (i + 1) * step])
            yield pd.DataFrame({"asset_id": ids, "frame_no": nos, "frame": frames})

    return media.mapInPandas(gen, schema=_FRAMES_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize seam: records the requested geometry in meta; the pixel
    work belongs at the NotImplementedError in decode_features."""
    return media.withColumn(
        "meta",
        F.struct(
            F.col("meta.mime").alias("mime"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
        ),
    )


self_contained(__name__)
