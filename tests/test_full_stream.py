"""Full streaming sentiment pipeline (EP1+EP2+EP3 in one query) + corrupt
quarantine."""

from __future__ import annotations

import json
import shutil
import tempfile
from pathlib import Path

from sentiment_analysis_data_pipeline_spark.streaming.ingest import (
    run_sentiment_stream,
    split_valid_corrupt,
)


def _env(i, title, url=None):
    return json.dumps(
        {
            "source_api": "newsapi",
            "fetched_at": "2024-01-01T00:00:00.000Z",
            "article": {"title": title, "url": url or f"https://e.com/{i}", "publishedAt": "2024-01-01T00:00:00.000Z"},
        }
    )


def test_full_stream_pipeline(spark):
    root = Path(tempfile.mkdtemp(prefix="fullstream-"))
    try:
        (root / "src").mkdir()
        raw, proc, ckpt = str(root / "raw"), str(root / "proc"), str(root / "ckpt")
        (root / "src" / "a.json").write_text(
            "\n".join([_env(0, "great excellent best"), _env(1, "terrible worst hate"), _env(2, "table scan merge")]) + "\n"
        )
        run_sentiment_stream(spark, str(root / "src"), raw, proc, ckpt).awaitTermination(120)
        processed = spark.read.parquet(proc)
        labels = {r["url"]: r["sentiment"]["overall"] for r in processed.collect()}
        assert labels["https://e.com/0"] == "positive"
        assert labels["https://e.com/1"] == "negative"
        assert labels["https://e.com/2"] == "neutral"
        assert spark.read.parquet(raw).count() == 3

        # epoch 2: redelivered url 0 + one new -> exactly one new processed row
        (root / "src" / "b.json").write_text(_env(0, "great excellent best") + "\n" + _env(9, "good fast win") + "\n")
        run_sentiment_stream(spark, str(root / "src"), raw, proc, ckpt).awaitTermination(120)
        assert spark.read.parquet(proc).count() == 4
        assert spark.read.parquet(raw).count() == 4
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_split_valid_corrupt(spark):
    rows = [(_env(1, "ok"),), ("not json at all",), ('{"source_api": "x"}',)]
    df = spark.createDataFrame(rows, "json string")
    valid, rejects = split_valid_corrupt(df)
    assert valid.count() == 1
    kept = [r["raw_payload"] for r in rejects.collect()]
    assert "not json at all" in kept and len(kept) == 2
