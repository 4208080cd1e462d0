"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The decode step is STUBBED (no image/audio libraries exist in this runtime):
``decode_image``/``extract_audio_features``/``sample_video_frames`` raise
NotImplementedError unless ``deterministic_fake=True``, which produces
seeded, shape-correct fake outputs so the Spark-side plumbing — schemas,
mapInPandas batch shapes, partition sizing, metadata propagation — is real
and tested end-to-end. Swapping in PIL/ffmpeg later changes only the inner
``_decode_*`` functions, nothing at the DataFrame layer.

Scale notes: binary columns dominate partition bytes — callers should size
``spark.sql.files.maxPartitionBytes`` down (64 MB) for media tables, and
project metadata columns WITHOUT the binary payload whenever possible so
column pruning keeps the payload unread.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
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
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), True),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sha256", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),  # pooled embedding
        StructField("thumb_w", IntegerType(), True),
        StructField("thumb_h", IntegerType(), True),
    ]
)


def _decode_image(payload: bytes, deterministic_fake: bool):
    if not deterministic_fake:
        raise NotImplementedError(
            "image decode requires an imaging library not present in this "
            "runtime; run with deterministic_fake=True for plumbing tests"
        )
    # seeded fake: pixels derived from payload bytes, fixed 8x8 RGB
    h = zlib.crc32(payload or b"")
    rng = np.random.default_rng(h)
    return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


def image_features(
    media: DataFrame, feature_dim: int = 16, deterministic_fake: bool = False
) -> DataFrame:
    """Decode -> resize(thumbnail) -> pooled feature vector, one mapInPandas
    pass; Arrow carries binary in, float arrays out."""

    def fn(batches):
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "sha256", "n_bytes", "feature", "thumb_w", "thumb_h")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                img = _decode_image(b, deterministic_fake)
                pooled = img.astype(np.float64).mean(axis=(0, 1))  # (3,)
                # project 3 -> feature_dim deterministically
                feat = np.array(
                    [pooled[d % 3] * ((d * 2654435761 % 1000) / 1000.0 + 0.5) for d in range(feature_dim)],
                    dtype=np.float32,
                )
                rows["media_id"].append(mid)
                rows["sha256"].append(hashlib.sha256(b).hexdigest())
                rows["n_bytes"].append(len(b))
                rows["feature"].append(feat / 255.0)
                rows["thumb_w"].append(img.shape[1])
                rows["thumb_h"].append(img.shape[0])
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(fn, schema=IMAGE_FEATURES_SCHEMA)


def media_metadata(media: DataFrame) -> DataFrame:
    """Metadata-only projection — binary column pruned at the scan."""
    return media.select("media_id", "kind", "mime", "width", "height", "duration_ms").withColumn(
        "aspect",
        F.when(F.col("height") > 0, F.round(F.col("width") / F.col("height"), 4)),
    )


def fake_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    rows = []
    for i in range(n):
        payload = (f"media-{i}-" + "x" * (i % 37)).encode()
        rows.append((i, ["image", "audio", "video"][i % 3], payload, "application/octet-stream", 640 + i % 3, 480, 1000 + i))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
