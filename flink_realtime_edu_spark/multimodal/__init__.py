"""Multimodal columns — SURVEY.md §2.10 X8 (north star).

Convention: a multimodal asset is an opaque ``binary`` payload column
plus a typed metadata struct — the pattern that scales to 100 TB
because Spark shuffles/spills binary columns like any other, formats
(parquet) store them page-compressed, and column pruning means
metadata-only queries never read payload bytes.

    media: STRUCT<
        media_id:   BIGINT,
        modality:   STRING,         -- 'image' | 'audio' | 'video'
        mime:       STRING,
        width:      INT,  height: INT,      -- images/video
        sample_rate:INT,  n_frames: BIGINT, -- audio/video
        payload:    BINARY>

Processing (decode / resize / feature-extract / frame-sample) runs as
Arrow-batched ``mapInPandas``: one Python process per partition, one
pandas batch at a time, so payload bytes cross the JVM↔Python
boundary exactly once per stage. The actual codecs (PIL/ffmpeg/...)
are NOT in this container, so `decode_image` raises
NotImplementedError; `extract_features` uses a deterministic
byte-histogram stand-in with the REAL batch shape, schema and
partitioning, which is what the tests pin down.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
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

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("payload", BinaryType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def demo_media_frame(spark: SparkSession, n: int = 64, partitions: int = 4) -> DataFrame:
    """Deterministic fake corpus: payload bytes derived from sha256 of
    the id (stable across runs/partitionings) with plausible metadata."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(str(i).encode()).digest() * (4 + i % 7)
        modality = ["image", "audio", "video"][i % 3]
        rows.append(
            (
                i,
                modality,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[modality],
                64 + (i % 8) * 16 if modality != "audio" else None,
                64 + (i % 5) * 16 if modality != "audio" else None,
                16000 if modality != "image" else None,
                (i % 30 + 1) if modality == "video" else None,
                bytearray(payload),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(partitions, "media_id")


def decode_image(payload: bytes, mime: str) -> "np.ndarray":
    """STUB — image decode requires a codec library (PIL/opencv) not
    present in this container. The mapInPandas pipeline below is the
    real integration point; swap this implementation when codecs are
    available."""
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "extract_features uses a deterministic byte-level stand-in"
    )


def extract_features(media: DataFrame, n_bins: int = 16) -> DataFrame:
    """Per-asset feature vector via mapInPandas (Arrow batches).

    Stand-in featurizer: normalized byte histogram (n_bins buckets) —
    deterministic, codec-free, but exercises the exact production
    shape: binary column in, fixed-length double vector out, schema
    declared up front, partition-local work, no shuffle."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        edges = np.linspace(0, 256, n_bins + 1)
        for pdf in batches:
            feats, nbytes = [], []
            for payload in pdf["payload"]:
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=edges)
                feats.append((hist / max(len(arr), 1)).tolist())
                nbytes.append(len(arr))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pd.Series(nbytes, dtype="int64"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(featurize, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_nth: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: one row per (video, frame index to
    decode) — pure JVM sequence/explode, no Python. The decode itself
    would be a mapInPandas over this plan joined back to payloads;
    emitting the plan separately keeps the explode (cheap, metadata
    only) apart from the byte-heavy decode stage."""
    vids = media.filter(
        (F.col("modality") == "video") & F.col("n_frames").isNotNull()
    )
    idx = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth))
    return vids.select(
        "media_id", F.explode(idx).alias("frame_index"), "mime"
    )
