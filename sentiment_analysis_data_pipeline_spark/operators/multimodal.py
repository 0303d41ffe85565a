"""Multimodal column plumbing: image/audio/video as opaque binary columns with
typed metadata (north-star extension).

The decode step is STUBBED (no image/audio libraries in this container --
see decode_image_batch), but everything Spark-side is real and tested:
schema (schemas.MEDIA_SCHEMA), Arrow batch shape, mapInPandas signatures,
partition sizing. Swapping the stub for PIL/torchaudio is a one-function
change that touches no plan.

Design for 100 TB of media:
  * payloads stay binary columns in parquet -- never JSON/base64; Spark's
    vectorized reader streams them batch-wise.
  * decode/feature steps are mapInPandas (Arrow zero-copy batches), so the
    Python boundary is crossed per-BATCH, not per-row.
  * spark.sql.files.maxPartitionBytes (and parquet row-group size at write)
    keep one task's payload bytes bounded; metadata-only queries never touch
    `payload` thanks to parquet column pruning.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def decode_image_batch(payloads: pd.Series) -> pd.Series:
    """STUB: real image decode (PIL.Image.open etc.) is unavailable in this
    environment. Raises to make the boundary explicit; extract_features uses
    the deterministic fake below instead."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this container; "
        "replace this function with PIL/cv2 decode -- the Spark plumbing "
        "(schema, batching, partitioning) is already wired."
    )


def _fake_features(payload: bytes | None, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in feature extractor: md5-derived floats in [0,1).
    Keeps the full pipeline testable end-to-end with stable goldens."""
    if payload is None:
        return [0.0] * dim
    h = hashlib.md5(payload).digest()
    return [b / 255.0 for b in h[:dim]]


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow streams (media_id, kind, payload) batches into Python; each batch
    yields (media_id, kind, n_bytes, features). The iterator form keeps peak
    memory at one batch regardless of partition size.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda p: 0 if p is None else len(p)).astype("int64"),
                    "features": pdf["payload"].map(_fake_features),
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(run, FEATURES_SCHEMA)


BYTE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_entropy", T.DoubleType()),
        T.StructField("distinct_byte_ratio", T.DoubleType()),
        T.StructField("mean_byte", T.DoubleType()),
    ]
)


def byte_stats_features(media: DataFrame) -> DataFrame:
    """REAL (non-stub) payload feature extraction: byte-histogram entropy,
    distinct-byte ratio, and mean byte value per media row -- the media-QA
    signals that need no decoder. Truncated/corrupt files and
    wrong-container payloads show up as entropy/ratio outliers (a valid
    compressed image sits near 8 bits/byte; text mislabeled as JPEG
    doesn't), so this is the cheap first gate a 100 TB media pipeline runs
    BEFORE spending decode cycles.

    Arrow-batched mapInPandas with numpy histograms: the Python boundary is
    crossed per batch, and each payload is one vectorized np.bincount --
    no per-byte Python loops."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ent, ratio, mean = [], [], []
            for p in pdf["payload"]:
                if p is None or len(p) == 0:
                    ent.append(0.0)
                    ratio.append(0.0)
                    mean.append(0.0)
                    continue
                arr = np.frombuffer(bytes(p), dtype=np.uint8)
                counts = np.bincount(arr, minlength=256)
                probs = counts[counts > 0] / arr.size
                ent.append(float(-(probs * np.log2(probs)).sum()))
                ratio.append(float((counts > 0).sum() / 256.0))
                mean.append(float(arr.mean()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda p: 0 if p is None else len(p)).astype("int64"),
                    "byte_entropy": ent,
                    "distinct_byte_ratio": ratio,
                    "mean_byte": mean,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(run, BYTE_STATS_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: expand each video row into frame
    timestamps (0, every_ms, ...) capped by duration_ms. The decode of each
    frame is the stubbed boundary; the EXPLODE shape (one row per frame,
    partition-parallel) is the real design."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(str(i).encode()).digest() * (i % 5 + 1)
        rows.append(
            (
                f"m{i:04d}",
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 if kind == "image" else None,
                64 if kind == "image" else None,
                5000 if kind == "video" else None,
            )
        )
    from ..schemas import MEDIA_SCHEMA

    return spark.createDataFrame(rows, MEDIA_SCHEMA)
