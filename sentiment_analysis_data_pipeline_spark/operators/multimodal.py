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
    """STUB: full PIXEL decode (PIL.Image.open etc.) is unavailable in this
    environment. Raises to make the boundary explicit; extract_features uses
    the deterministic fake below, and HEADER decode (dimensions/format) is
    real -- see parse_image_dimensions."""
    raise NotImplementedError(
        "image PIXEL decode requires an imaging library not present in this "
        "container; replace this function with PIL/cv2 decode -- the Spark "
        "plumbing (schema, batching, partitioning) is already wired, and "
        "header-level decode (parse_image_dimensions) already works."
    )


# SOFn markers that carry frame dimensions (C0-CF minus DHT C4 / JPG C8 /
# DAC CC, per ITU-T T.81 Table B.1)
_JPEG_SOF_MARKERS = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}
_PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def parse_image_dimensions(payload: bytes | None) -> tuple[str | None, int | None, int | None]:
    """REAL header decode, stdlib-only (round 7): (format, width, height)
    for the two dominant raster formats, from plain bytes.

    - PNG: the IHDR chunk is REQUIRED to be first (PNG spec 5.6), so width
      and height are the big-endian u32s at offsets 16/20 after the 8-byte
      signature + 4-byte length + 'IHDR'.
    - JPEG (ITU-T T.81): walk the marker segments from SOI, skipping fill
      bytes and standalone markers (TEM, RSTn; D8/D9 have no length field),
      until a SOFn frame header -- its payload is [precision u8]
      [height u16] [width u16]. DHT/JPG/DAC are excluded from the SOF set.

    Anything else -- other containers, truncated/corrupt headers, None --
    returns (None, None, None): at 100 TB the parser must CLASSIFY bad
    payloads, never throw mid-batch. Full pixel decode stays behind the
    decode_image_batch stub (no imaging libs here)."""
    if not payload:
        return (None, None, None)
    b = bytes(payload)
    if b[:8] == _PNG_SIGNATURE:
        if len(b) >= 24 and b[12:16] == b"IHDR":
            return (
                "png",
                int.from_bytes(b[16:20], "big"),
                int.from_bytes(b[20:24], "big"),
            )
        return (None, None, None)
    if b[:2] == b"\xff\xd8":
        i = 2
        while i + 1 < len(b):
            if b[i] != 0xFF:
                return (None, None, None)  # lost marker sync: corrupt
            while i < len(b) and b[i] == 0xFF:
                i += 1  # fill bytes before a marker are legal
            if i >= len(b):
                break
            marker = b[i]
            i += 1
            if marker == 0x01 or 0xD0 <= marker <= 0xD9:
                continue  # standalone: no length field
            if i + 2 > len(b):
                break
            seglen = int.from_bytes(b[i : i + 2], "big")
            if marker in _JPEG_SOF_MARKERS:
                if i + 7 > len(b):
                    break
                return (
                    "jpeg",
                    int.from_bytes(b[i + 5 : i + 7], "big"),
                    int.from_bytes(b[i + 3 : i + 5], "big"),
                )
            if seglen < 2:
                return (None, None, None)
            i += seglen
    return (None, None, None)


def decode_image_metadata(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    id_ddl: str = "media_id string",
) -> DataFrame:
    """Header-decode operator: (id, payload) -> (id, fmt, width, height)
    via Arrow-batched mapInPandas over parse_image_dimensions. Pure
    projection -- parallelizes with the scan, no shuffle; the Python
    boundary is crossed per batch. `id_ddl` lets callers keep their id
    type (e.g. 'doc_id bigint')."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idname = id_ddl.split()[0]
        for pdf in batches:
            parsed = pdf[payload_col].map(parse_image_dimensions)
            yield pd.DataFrame(
                {
                    idname: pdf[id_col],
                    "fmt": parsed.map(lambda t: t[0]),
                    "width": parsed.map(lambda t: t[1]).astype("Int64"),
                    "height": parsed.map(lambda t: t[2]).astype("Int64"),
                }
            )

    return media.select(id_col, payload_col).mapInPandas(
        run, f"{id_ddl}, fmt string, width bigint, height bigint"
    )


def parse_wav_header(
    payload: bytes | None,
) -> tuple[str | None, int | None, int | None, int | None, int | None]:
    """REAL audio header decode, stdlib-only: (format, sample_rate, channels,
    bits_per_sample, n_frames) for RIFF/WAVE containers -- the audio sibling
    of parse_image_dimensions.

    RIFF (Microsoft/IBM 1991, the WAVE container): bytes 0-3 'RIFF',
    8-11 'WAVE', then a chunk walk -- [id u32][size u32 LE][body], chunks
    word-aligned (odd sizes padded). The 'fmt ' chunk body carries
    [audio_format u16][channels u16][sample_rate u32][byte_rate u32]
    [block_align u16][bits_per_sample u16], all little-endian; the 'data'
    chunk's size divided by block_align is the frame count (duration =
    n_frames / sample_rate). Both chunks are required; order is not fixed
    by the spec, so the walk continues until both are seen.

    Anything else -- other containers, truncated/corrupt headers, a zero
    block_align, None -- returns all-None: at 100 TB the parser must
    CLASSIFY bad payloads, never throw mid-batch. Full sample decode stays
    behind the decode_image_batch-style stub boundary (no audio libs here).
    """
    bad = (None, None, None, None, None)
    if not payload:
        return bad
    b = bytes(payload)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return bad
    i = 12
    rate = channels = bits = block_align = None
    data_size = None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        size = int.from_bytes(b[i + 4 : i + 8], "little")
        body = i + 8
        if cid == b"fmt ":
            if body + 16 > len(b):
                return bad
            channels = int.from_bytes(b[body + 2 : body + 4], "little")
            rate = int.from_bytes(b[body + 4 : body + 8], "little")
            block_align = int.from_bytes(b[body + 12 : body + 14], "little")
            bits = int.from_bytes(b[body + 14 : body + 16], "little")
        elif cid == b"data":
            data_size = size
        if rate is not None and data_size is not None:
            if not block_align:
                return bad
            return ("wav", rate, channels, bits, data_size // block_align)
        i = body + size + (size & 1)  # chunks are word-aligned
    return bad


def decode_audio_metadata(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    id_ddl: str = "media_id string",
) -> DataFrame:
    """Header-decode operator: (id, payload) -> (id, fmt, sample_rate,
    channels, bits, n_frames) via Arrow-batched mapInPandas over
    parse_wav_header. Pure projection -- parallelizes with the scan, no
    shuffle; the Python boundary is crossed per batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idname = id_ddl.split()[0]
        for pdf in batches:
            parsed = pdf[payload_col].map(parse_wav_header)
            yield pd.DataFrame(
                {
                    idname: pdf[id_col],
                    "fmt": parsed.map(lambda t: t[0]),
                    "sample_rate": parsed.map(lambda t: t[1]).astype("Int64"),
                    "channels": parsed.map(lambda t: t[2]).astype("Int64"),
                    "bits": parsed.map(lambda t: t[3]).astype("Int64"),
                    "n_frames": parsed.map(lambda t: t[4]).astype("Int64"),
                }
            )

    return media.select(id_col, payload_col).mapInPandas(
        run,
        f"{id_ddl}, fmt string, sample_rate bigint, channels bigint,"
        " bits bigint, n_frames bigint",
    )


def parse_pcm_loudness(
    payload: bytes | None,
) -> tuple[str | None, int | None, int | None, float | None, int | None]:
    """REAL sample-level PCM analysis, stdlib+numpy only: (format, n_samples,
    peak, rms, zero_crossings) for 16-bit PCM RIFF/WAVE payloads -- one step
    past parse_wav_header: this one decodes the `data` chunk's SAMPLES and
    computes the loudness/activity statistics an audio curation pipeline
    gates on (silence detection, clipping detection, speech-band activity).

    Exactness contract (the engine's cross-engine parity discipline applied
    to DSP): peak and zero_crossings are integers; the mean-square
    accumulates in int64 (max 16-bit sample^2 = 2^30; 2^23 samples per
    payload stay inside 2^53 even as a double), and rms is ONE sqrt of one
    exact division -- sqrt is correctly rounded in IEEE 754, so an oracle
    computing the same rational arrives at the same double bit-for-bit.

    Non-WAV / non-16-bit / truncated-data payloads return all-None: at
    100 TB the parser classifies bad payloads, never throws mid-batch."""
    bad = (None, None, None, None, None)
    if not payload:
        return bad
    b = bytes(payload)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return bad
    i = 12
    bits = None
    data: bytes | None = None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        size = int.from_bytes(b[i + 4 : i + 8], "little")
        body = i + 8
        if cid == b"fmt ":
            if body + 16 > len(b):
                return bad
            bits = int.from_bytes(b[body + 14 : body + 16], "little")
        elif cid == b"data":
            if body + size > len(b):
                return bad
            data = b[body : body + size]
        if bits is not None and data is not None:
            break
        i = body + size + (size & 1)
    if bits != 16 or data is None or len(data) < 2:
        return bad
    import math

    import numpy as np

    x = np.frombuffer(data[: len(data) - (len(data) % 2)], dtype="<i2").astype(
        np.int64
    )
    n = int(x.size)
    peak = int(np.abs(x).max())
    sum_sq = int((x * x).sum())
    rms = math.sqrt(sum_sq / n)
    # sign flips between consecutive samples; exact zeros break a run
    crossings = int(((x[:-1] * x[1:]) < 0).sum()) if n > 1 else 0
    return ("wav", n, peak, rms, crossings)


def decode_audio_loudness(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    id_ddl: str = "media_id string",
) -> DataFrame:
    """Sample-decode operator: (id, payload) -> (id, fmt, n_samples, peak,
    rms, zero_crossings) via Arrow-batched mapInPandas over
    parse_pcm_loudness. Pure projection like decode_audio_metadata -- no
    shuffle, Python crossed per batch, numpy-vectorized inside the batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idname = id_ddl.split()[0]
        for pdf in batches:
            parsed = pdf[payload_col].map(parse_pcm_loudness)
            yield pd.DataFrame(
                {
                    idname: pdf[id_col],
                    "fmt": parsed.map(lambda t: t[0]),
                    "n_samples": parsed.map(lambda t: t[1]).astype("Int64"),
                    "peak": parsed.map(lambda t: t[2]).astype("Int64"),
                    "rms": parsed.map(lambda t: t[3]).astype("float64"),
                    "zero_crossings": parsed.map(lambda t: t[4]).astype("Int64"),
                }
            )

    return media.select(id_col, payload_col).mapInPandas(
        run,
        f"{id_ddl}, fmt string, n_samples bigint, peak bigint,"
        " rms double, zero_crossings bigint",
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


# Annex K.1 luminance quantization table (ITU-T T.81) in ZIGZAG order as
# stored in a DQT segment -- the base every IJG-style encoder scales by
# quality. Sum = the denominator of the integer inverse below.
JPEG_STD_LUMINANCE_ZIGZAG = (
    16, 11, 12, 14, 12, 10, 16, 14, 13, 14, 18, 17, 16, 19, 24, 40,
    26, 24, 22, 22, 24, 49, 35, 37, 29, 40, 58, 51, 61, 60, 57, 51,
    56, 55, 64, 72, 92, 78, 64, 68, 87, 69, 55, 56, 80, 109, 81, 87,
    95, 98, 103, 104, 103, 62, 77, 113, 121, 112, 100, 120, 92, 101,
    103, 99,
)
_STD_LUM_SUM = sum(JPEG_STD_LUMINANCE_ZIGZAG)


def ijg_scaled_table(quality: int) -> list[int]:
    """The IJG quality->table scaling (jcparam.c jpeg_quality_scaling +
    jpeg_add_quant_table): scale = 5000/Q below 50 else 200-2Q; each base
    value maps to clamp((base*scale + 50) // 100, 1, 255). Pure integer
    math -- the encoder side of the estimator, used by tests and the
    driver query's payload synthesis."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return [
        min(255, max(1, (b * scale + 50) // 100))
        for b in JPEG_STD_LUMINANCE_ZIGZAG
    ]


def estimate_quality_from_table(table: list[int]) -> int:
    """Invert the IJG scaling from a parsed 64-entry luminance table, all
    integer math (deterministic at any batch shape): scale_pct is the
    rounded percentage ratio of the table sum to the Annex K base sum;
    quality = (200 - scale)/2 above the 50-point, 5000/scale below.
    Clamped to [1, 100]. Saturation (clamping at 1/255) makes extreme
    qualities approximate -- that is inherent to the format, and the
    driver oracle states the EXACT value this inverse yields per
    synthesized quality, so the parse+invert round trip is hash-checked,
    not eyeballed."""
    s = sum(table)
    scale_pct = (100 * s + _STD_LUM_SUM // 2) // _STD_LUM_SUM
    if scale_pct <= 0:
        return 100
    if scale_pct <= 100:
        quality = (200 - scale_pct) // 2
    else:
        quality = (5000 + scale_pct // 2) // scale_pct
    return min(100, max(1, quality))


def parse_jpeg_quality(payload: bytes | None) -> tuple[int, int]:
    """(n_tables, quality_estimate) from a JPEG byte stream's DQT
    segments: walk the marker stream (same discipline as
    parse_image_dimensions), collect 8-bit-precision quantization tables,
    and estimate encode quality from the luminance table (id 0) via the
    integer IJG inverse. Non-JPEG/corrupt/absent-DQT payloads return
    (0, 0) -- classify, never throw. A DQT segment may carry multiple
    tables back-to-back (T.81 B.2.4.1)."""
    if not payload:
        return (0, 0)
    b = bytes(payload)
    if b[:2] != b"\xff\xd8":
        return (0, 0)
    n_tables = 0
    lum: list[int] | None = None
    i = 2
    while i + 1 < len(b):
        if b[i] != 0xFF:
            break
        while i < len(b) and b[i] == 0xFF:
            i += 1
        if i >= len(b):
            break
        marker = b[i]
        i += 1
        if marker == 0x01 or 0xD0 <= marker <= 0xD9:
            continue
        if i + 2 > len(b):
            break
        seglen = int.from_bytes(b[i : i + 2], "big")
        if seglen < 2:
            break
        if marker == 0xDB:  # DQT
            j = i + 2
            end = i + seglen
            while j < end and j < len(b):
                pq_tq = b[j]
                pq, _tq = pq_tq >> 4, pq_tq & 0x0F
                width = 128 if pq == 1 else 64
                if j + 1 + width > len(b):
                    break
                if pq == 0:  # 8-bit entries only (the common case)
                    table = list(b[j + 1 : j + 65])
                    n_tables += 1
                    if _tq == 0 and lum is None:
                        lum = table
                else:
                    n_tables += 1
                j += 1 + width
        i += seglen
    if lum is None:
        return (n_tables, 0)
    return (n_tables, estimate_quality_from_table(lum))


def decode_jpeg_quality(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    id_ddl: str = "media_id string",
) -> DataFrame:
    """(id, payload) -> (id, n_tables, quality) via Arrow-batched
    mapInPandas over parse_jpeg_quality. Pure projection, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idname = id_ddl.split()[0]
        for pdf in batches:
            parsed = pdf[payload_col].map(parse_jpeg_quality)
            yield pd.DataFrame(
                {
                    idname: pdf[id_col],
                    "n_tables": parsed.map(lambda t: t[0]).astype("int64"),
                    "quality": parsed.map(lambda t: t[1]).astype("int64"),
                }
            )

    return media.select(id_col, payload_col).mapInPandas(
        run, f"{id_ddl}, n_tables bigint, quality bigint"
    )
