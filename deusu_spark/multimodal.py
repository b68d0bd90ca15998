"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched mapInPandas.

The decode step is STUBBED (no image/audio libraries in this container):
`decode_image_stub` produces a deterministic fake "decoded" feature so the
Spark-side plumbing — schema, batching, partitioning, UDF signatures — is
real and tested end-to-end. Swap `_decode_payload` for a real decoder
(PIL/librosa/av) in production; nothing else changes.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload_sha256", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),  # 16-dim
    ]
)

FEATURE_DIM = 16


def synth_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload = seeded bytes; metadata
    follows the payload so tests can verify the plumbing end-to-end."""
    rows = []
    kinds = ["image", "audio", "video"]
    mimes = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}
    for i in range(n):
        kind = kinds[i % 3]
        h = hashlib.sha256(f"media{seed}:{i}".encode()).digest()
        payload = (h * ((64 + i) // len(h) + 1))[: 64 + i]
        rows.append(
            (
                i,
                kind,
                mimes[kind],
                32 + (i % 8) * 16 if kind != "audio" else 0,
                32 + (i % 5) * 16 if kind != "audio" else 0,
                0 if kind == "image" else 1000 + i * 250,
                bytearray(payload),
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def _decode_payload(payload: bytes) -> np.ndarray:
    """STUB decoder: deterministic 16-dim float feature from the payload
    bytes (sha256 → 16 uint16 → [0,1) floats). Replace with a real
    decode + model feature extraction in production.

    Raising NotImplementedError here would also be acceptable per the
    contract; a deterministic fake lets the downstream plumbing be tested.
    """
    h = hashlib.sha256(payload).digest()
    vals = struct.unpack(">16H", h)
    return np.asarray(vals, dtype=np.float32) / 65536.0


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, vectorized numpy
    body, bounded batch memory (payloads stream per batch, never collected).
    Partition by media_id ranges upstream for even payload-bytes per task."""

    def fn(iterator):
        for pdf in iterator:
            feats = [_decode_payload(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_sha256": [
                        hashlib.sha256(bytes(p)).hexdigest() for p in pdf["payload"]
                    ],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "feature": [f.tolist() for f in feats],
                }
            )

    return media.mapInPandas(fn, schema=FEATURE_SCHEMA)


def dedup_media(media: DataFrame) -> DataFrame:
    """Exact media dedup: group by payload content hash — the binary-column
    member of the dedup family (same single-hash-groupBy shape as the text
    dedup; scales with no all-pairs work). Returns one row per distinct
    payload with the representative (min) media_id and the duplicate
    count."""
    hashed = media.select(
        "media_id", "kind", F.sha2("payload", 256).alias("payload_sha256")
    )
    return (
        hashed.groupBy("payload_sha256")
        .agg(
            F.min("media_id").alias("keep_media_id"),
            F.count("*").alias("n_copies"),
        )
        .orderBy("keep_media_id")
    )


def audio_chunk_plan(media: DataFrame, chunk_ms: int = 5000) -> DataFrame:
    """Audio chunking *plan*: one row per chunk to decode
    (media_id, chunk_start_ms, chunk_end_ms) — pure column ops; the decode
    runs in a downstream mapInPandas like extract_features."""
    a = media.where((F.col("kind") == "audio") & (F.col("duration_ms") > 0))
    starts = F.sequence(
        F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(chunk_ms)
    )
    return a.select(
        "media_id",
        F.explode(starts).alias("chunk_start_ms"),
        "duration_ms",
    ).select(
        "media_id",
        "chunk_start_ms",
        F.least(
            F.col("chunk_start_ms") + chunk_ms, F.col("duration_ms")
        ).alias("chunk_end_ms"),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per frame to decode
    (media_id, frame_ts_ms) — pure column ops (sequence + explode), the
    decode itself would run in a downstream mapInPandas like
    extract_features."""
    v = media.where(F.col("kind") == "video")
    return v.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
