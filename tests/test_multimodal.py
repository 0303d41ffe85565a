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


def test_parse_image_dimensions_golden_bytes():
    """Round 7: the stdlib header parser against hand-built REAL byte
    sequences -- PNG IHDR, JPEG marker streams (with skipped segments,
    fill bytes, restart markers), and every corrupt/truncation path."""
    from sentiment_analysis_data_pipeline_spark.operators.multimodal import (
        parse_image_dimensions,
    )

    def png(w, h):
        return (
            b"\x89PNG\r\n\x1a\n"
            + (13).to_bytes(4, "big")
            + b"IHDR"
            + w.to_bytes(4, "big")
            + h.to_bytes(4, "big")
            + b"\x08\x06\x00\x00\x00"
        )

    def seg(marker, payload):
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    def sof0(w, h):
        return seg(0xC0, b"\x08" + h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x01\x01\x11\x00")

    assert parse_image_dimensions(png(640, 480)) == ("png", 640, 480)
    assert parse_image_dimensions(png(1, 1)) == ("png", 1, 1)
    assert parse_image_dimensions(png(70000, 3)) == ("png", 70000, 3)  # >u16

    soi = b"\xff\xd8"
    app0 = seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    dqt = seg(0xDB, bytes(65))
    # SOF0 straight after SOI
    assert parse_image_dimensions(soi + sof0(320, 240)) == ("jpeg", 320, 240)
    # segments to skip before the frame header, progressive SOF2, fill bytes
    assert parse_image_dimensions(soi + app0 + dqt + sof0(12, 7)) == ("jpeg", 12, 7)
    sof2 = seg(0xC2, b"\x08" + (99).to_bytes(2, "big") + (44).to_bytes(2, "big") + b"\x01\x01\x11\x00")
    assert parse_image_dimensions(soi + app0 + sof2) == ("jpeg", 44, 99)
    assert parse_image_dimensions(soi + b"\xff" + app0[1:] + sof0(5, 6)) == ("jpeg", 5, 6)
    # DHT (C4) must NOT be taken for a SOF marker
    dht = seg(0xC4, bytes(19))
    assert parse_image_dimensions(soi + dht + sof0(8, 9)) == ("jpeg", 8, 9)
    # standalone restart marker between segments
    assert parse_image_dimensions(soi + b"\xff\xd0" + sof0(10, 11)) == ("jpeg", 10, 11)

    none3 = (None, None, None)
    assert parse_image_dimensions(None) == none3
    assert parse_image_dimensions(b"") == none3
    assert parse_image_dimensions(b"plain text payload") == none3
    assert parse_image_dimensions(b"\x89PNG\r\n\x1a\n1234IHDX" + bytes(8)) == none3
    assert parse_image_dimensions(png(640, 480)[:20]) == none3  # truncated IHDR
    assert parse_image_dimensions(soi + app0[:5]) == none3      # truncated segment
    assert parse_image_dimensions(soi + b"\x00\x00\x00") == none3  # lost sync
    assert parse_image_dimensions(soi + seg(0xE0, b"")[:2] + b"\x00\x01") == none3  # seglen < 2


def test_decode_image_metadata_operator(spark):
    """The mapInPandas operator end-to-end: schema, NULL rows for
    non-images, id type passthrough."""
    from sentiment_analysis_data_pipeline_spark.operators.multimodal import (
        decode_image_metadata,
    )

    png = (
        b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
        + (64).to_bytes(4, "big") + (32).to_bytes(4, "big") + b"\x08\x06\x00\x00\x00"
    )
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(b"not an image")), (3, None)],
        "doc_id long, payload binary",
    )
    out = decode_image_metadata(df, id_col="doc_id", id_ddl="doc_id bigint")
    assert out.schema.simpleString() == "struct<doc_id:bigint,fmt:string,width:bigint,height:bigint>"
    rows = {r["doc_id"]: (r["fmt"], r["width"], r["height"]) for r in out.collect()}
    assert rows == {1: ("png", 64, 32), 2: (None, None, None), 3: (None, None, None)}


def _wav(rate=44100, channels=2, bits=16, n_frames=1000, pre_chunks=b"", fmt_tag=1):
    """Build a real RIFF/WAVE header with struct-packed fields."""
    import struct

    block_align = channels * bits // 8
    data_size = n_frames * block_align
    fmt_body = struct.pack(
        "<HHIIHH", fmt_tag, channels, rate, rate * block_align, block_align, bits
    )
    chunks = pre_chunks
    chunks += b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    chunks += b"data" + struct.pack("<I", data_size)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks) + data_size) + b"WAVE" + chunks


def test_parse_wav_header_golden_bytes():
    p = multimodal.parse_wav_header
    assert p(_wav()) == ("wav", 44100, 2, 16, 1000)
    assert p(_wav(rate=8000, channels=1, bits=8, n_frames=77)) == ("wav", 8000, 1, 8, 77)
    # odd-size chunk before fmt: the walk must apply the word-alignment pad
    odd = b"LIST" + (5).to_bytes(4, "little") + b"ABCDE" + b"\x00"
    assert p(_wav(pre_chunks=odd)) == ("wav", 44100, 2, 16, 1000)
    # even-size pre-chunk, no pad
    even = b"LIST" + (4).to_bytes(4, "little") + b"ABCD"
    assert p(_wav(pre_chunks=even)) == ("wav", 44100, 2, 16, 1000)
    bad = (None, None, None, None, None)
    assert p(None) == bad
    assert p(b"") == bad
    assert p(b"not audio at all") == bad
    assert p(b"RIFF\x00\x00\x00\x00AVI ") == bad  # other RIFF container
    assert p(_wav()[:20]) == bad  # truncated inside fmt
    # data chunk but no fmt chunk seen: walk runs off the end -> bad
    assert p(b"RIFF\x10\x00\x00\x00WAVEdata\x04\x00\x00\x00abcd") == bad
    # zero block_align must classify, not ZeroDivisionError
    z = _wav(channels=0, bits=0)
    assert p(z) == bad


def test_decode_audio_metadata_operator(spark):
    rows = [("a", _wav(rate=16000, channels=1, bits=16, n_frames=320)),
            ("b", b"garbage"), ("c", None)]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    out = {r["media_id"]: r for r in multimodal.decode_audio_metadata(df).collect()}
    a = out["a"]
    assert (a["fmt"], a["sample_rate"], a["channels"], a["bits"], a["n_frames"]) == (
        "wav", 16000, 1, 16, 320
    )
    assert out["b"]["fmt"] is None and out["b"]["sample_rate"] is None
    assert out["c"]["fmt"] is None
