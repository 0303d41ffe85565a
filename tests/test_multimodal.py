"""Multimodal plumbing tests: the decode is stubbed (no imaging libs in this
environment), the Spark-side schema/batching/explode shapes are real."""

from __future__ import annotations

import pytest

from sentiment_analysis_data_pipeline_spark.operators import multimodal


def test_extract_features_schema_and_determinism(spark):
    media = multimodal.synthetic_media(spark, n=12)
    out = multimodal.extract_features(media)
    rows = out.collect()
    assert out.schema.simpleString() == multimodal.FEATURES_SCHEMA.simpleString()
    assert len(rows) == 12
    by_id = {r["media_id"]: r for r in rows}
    assert all(len(r["features"]) == multimodal.FEATURE_DIM for r in rows)
    assert all(r["n_bytes"] > 0 for r in rows)
    # deterministic: same payload -> same features
    again = {r["media_id"]: r for r in multimodal.extract_features(media).collect()}
    assert by_id["m0000"]["features"] == again["m0000"]["features"]


def test_decode_stub_is_explicit():
    import pandas as pd

    with pytest.raises(NotImplementedError):
        multimodal.decode_image_batch(pd.Series([b"x"]))


def test_frame_sample_plan(spark):
    media = multimodal.synthetic_media(spark, n=9)
    frames = multimodal.frame_sample_plan(media, every_ms=1000)
    rows = frames.collect()
    # only video rows expand; 5000 ms duration -> 5 frames (0..4999 step 1000)
    videos = media.filter("kind = 'video'").count()
    assert len(rows) == videos * 5
    assert {r["frame_ts_ms"] for r in rows} == {0, 1000, 2000, 3000, 4000}


def test_byte_stats_features_real_values(spark):
    """byte_stats_features is NOT a stub: verify entropy/ratio/mean against
    exact Python recomputation on the same payloads."""
    import math
    from collections import Counter

    media = multimodal.synthetic_media(spark, n=9)
    rows = {r["media_id"]: r for r in multimodal.byte_stats_features(media).collect()}
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    assert rows.keys() == src.keys()
    for mid, payload in src.items():
        counts = Counter(payload)
        n = len(payload)
        want_ent = -sum((c / n) * math.log2(c / n) for c in counts.values())
        got = rows[mid]
        assert got["n_bytes"] == n
        assert abs(got["byte_entropy"] - want_ent) < 1e-9
        assert abs(got["distinct_byte_ratio"] - len(counts) / 256.0) < 1e-12
        assert abs(got["mean_byte"] - sum(payload) / n) < 1e-9
    # sha256-derived payloads are high-entropy: the QA signal actually signals
    assert all(r["byte_entropy"] > 4.0 for r in rows.values())


def test_documents_text_is_ascii_for_byte_oracle(spark):
    """q_media_byte_stats' DuckDB oracle reads payload bytes via per-CHAR
    ord(substr(...)); that equals per-BYTE values only while documents.text
    is pure ASCII. Pin the assumption so a future testdata change fails
    loudly here instead of hash-mismatching in CORRECTNESS."""
    import duckdb

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        (multibyte,) = duckdb.sql(
            f"select max(octet_length(encode(text)) != length(text)) "
            f"from '/root/testdata/{sf}/documents.parquet'"
        ).fetchone()
        assert multibyte is False, f"{sf}: non-ASCII text breaks the byte oracle"
