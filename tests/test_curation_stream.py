"""Streaming curation gate (streaming/curation_stream.py): flag-for-flag
parity with the batch filter_reasons query on the same documents, and the
ingest stream landing every doc with its audit flags."""

from __future__ import annotations

import json
import shutil
import tempfile
from pathlib import Path

import pytest

# fixtures chosen so every gate fires at least once, including the
# repetition gate's per-row fold vs the batch explode/agg equivalence
DOCS = [
    (1, "short text"),                                        # too_short
    (2, " ".join(["spam"] * 30)),                             # too_repetitive
    (3, "le monde est grand et la vie est belle et le soleil brille sur la mer"),  # non_english
    (4, (
        "the quick brown fox jumps over a lazy dog while bright sun rises "
        "above quiet hills and rivers run through green valleys this morning"
    )),                                                        # kept
    (5, None),                                                 # null text
    (6, "a b c d e f g h i j k l m n o p q r s t u v w x y z one two three"),
]


def _batch_flags(spark):
    from sentiment_analysis_data_pipeline_spark import queries as Q
    from sentiment_analysis_data_pipeline_spark.functions import dialect as D

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    df.createOrReplaceTempView("documents")
    rows = spark.sql(Q._filter_reasons_sql(D.SPARK)).collect()
    return {
        r["doc_id"]: (
            r["too_short"], r["too_repetitive"], r["low_quality"],
            r["non_english"], r["kept"],
        )
        for r in rows
    }


def _flags_of(rows):
    return {
        r["doc_id"]: (
            r["too_short"], r["too_repetitive"], r["low_quality"],
            r["non_english"], r["kept"],
        )
        for r in rows
    }


def test_curation_gate_matches_batch_query(spark):
    """The stateless projection gate must agree flag-for-flag with the
    batch filter_reasons explode/agg plan on every fixture."""
    from sentiment_analysis_data_pipeline_spark.streaming.curation_stream import curation_gate

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = _flags_of(curation_gate(df).collect())
    want = _batch_flags(spark)
    assert got == want
    # and the fixtures actually exercise each gate
    fired = [any(f[i] for f in got.values()) for i in range(5)]
    assert all(fired), f"some gate never fired: {fired}"


def test_curation_stream_lands_flags(spark):
    """End-to-end availableNow stream: every source doc lands exactly once
    with flags identical to the batch query's."""
    from sentiment_analysis_data_pipeline_spark.streaming.curation_stream import (
        run_curation_stream,
    )

    root = Path(tempfile.mkdtemp(prefix="curation-stream-"))
    src, out, ckpt = root / "src", root / "out", root / "ckpt"
    src.mkdir()
    try:
        with open(src / "docs.json", "w") as f:
            for doc_id, text in DOCS:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
        q = run_curation_stream(spark, str(src), str(out), str(ckpt))
        q.awaitTermination(120)
        landed = spark.read.parquet(str(out))
        assert landed.count() == len(DOCS)
        assert _flags_of(landed.collect()) == _batch_flags(spark)
        # replay: a second start with the same checkpoint lands nothing new
        q2 = run_curation_stream(spark, str(src), str(out), str(ckpt))
        q2.awaitTermination(120)
        assert spark.read.parquet(str(out)).count() == len(DOCS)
    finally:
        shutil.rmtree(root, ignore_errors=True)
