"""Multimodal (image/audio/video) column handling for training-data
pipelines.

Media payloads are opaque ``binary`` columns with a typed metadata struct —
the layout Iceberg/parquet handle efficiently (no row-group bloat: binary
columns are contiguous and column-pruned away unless selected). Decoding /
feature extraction runs as Arrow-batched mapInPandas so bytes cross the
JVM<->Python boundary once per batch, never per row.

The actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so the
decode kernels are stubbed behind ``_HAS_CODECS`` with a deterministic
fake (documented, seeded from the payload bytes) — the Spark-side plumbing
(schema, batch shape, partitioning, size capping) is real and tested.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401

    _HAS_CODECS = True
except ImportError:
    _HAS_CODECS = False

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), False),
        StructField("mime", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("content_sha", StringType(), False),
        StructField("feature", ArrayType(DoubleType(), False), False),
    ]
)

FEATURE_DIM = 16
MAX_BATCH_BYTES = 64 << 20  # re-chunk cap: bytes per decode batch


def _fake_decode_feature(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decode+embed kernel: FEATURE_DIM
    floats derived from rolling crc32 of the payload. Replaced wholesale
    when codecs exist; the pipeline shape does not change."""
    out = np.zeros(FEATURE_DIM, dtype=np.float64)
    h = 0
    for i in range(FEATURE_DIM):
        h = zlib.crc32(payload[i::FEATURE_DIM] or b"\x00", h)
        out[i] = (h % 2000) / 1000.0 - 1.0
    return out


def extract_features(media: DataFrame) -> DataFrame:
    """media rows -> per-item feature vectors, batch-size-capped by bytes
    (one oversized video can't blow the Python worker)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            sizes = pdf["payload"].map(len).to_numpy()
            start, acc = 0, 0
            bounds = []
            for i, s in enumerate(sizes):
                if acc + int(s) > MAX_BATCH_BYTES and i > start:
                    bounds.append((start, i))
                    start, acc = i, 0
                acc += int(s)
            bounds.append((start, len(pdf)))
            for lo, hi in bounds:
                chunk = pdf.iloc[lo:hi]
                if _HAS_CODECS:  # pragma: no cover
                    raise NotImplementedError(
                        "real decode kernels go here (PIL/librosa/ffmpeg)"
                    )
                feats = [
                    _fake_decode_feature(bytes(p)) for p in chunk["payload"]
                ]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].values,
                        "kind": chunk["kind"].values,
                        "n_bytes": sizes[lo:hi],
                        "content_sha": [
                            hashlib.sha256(bytes(p)).hexdigest()[:16]
                            for p in chunk["payload"]
                        ],
                        "feature": feats,
                    }
                )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per (media_id, frame_ts_ms) —
    pure column math (sequence over duration), no decode. The decode of
    each planned frame is the stubbed kernel above."""
    # duration must be strictly positive: sequence(0, -1, step>0) throws at
    # runtime, so a zero-length video row would fail the whole job
    vids = media.filter(F.col("kind") == "video").filter(
        F.col("duration_ms").isNotNull() & (F.col("duration_ms") > 0)
    )
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.col("duration_ms") - 1,
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Per-kind corpus stats (bytes are never shuffled — only lengths)."""
    return media.groupBy("kind").agg(
        F.count("*").alias("n_items"),
        F.sum(F.length("payload").cast("long")).alias("total_bytes"),
        F.max(F.length("payload").cast("long")).alias("max_bytes"),
    )
