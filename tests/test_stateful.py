"""applyInPandasWithState: state must accumulate across epochs through the
checkpoint (restart-safe running counters)."""

from __future__ import annotations

import json
import shutil
import tempfile
from pathlib import Path

import pytest

from sentiment_analysis_data_pipeline_spark.streaming import file_article_stream
from sentiment_analysis_data_pipeline_spark.streaming.stateful import running_source_stats


def _envelope(i: int, api: str, title: str) -> str:
    return json.dumps(
        {
            "source_api": api,
            "fetched_at": "2024-01-01T00:00:00.000Z",
            "article": {"title": title, "url": f"https://e.com/{i}", "publishedAt": "2024-01-01T00:00:00.000Z"},
        }
    )


def _run_epoch(spark, src, ckpt, out_dir):
    # memory sink cannot recover from a checkpoint; foreachBatch + parquet
    # per epoch exercises the real restart path
    stream = file_article_stream(spark, src)
    q = (
        running_source_stats(stream)
        .writeStream.foreachBatch(lambda df, _bid: df.write.mode("append").parquet(out_dir))
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {
        r["source_api"]: (r["n_articles"], r["mean_title_len"])
        for r in spark.read.parquet(out_dir).collect()
    }


def test_state_accumulates_across_epochs(spark):
    root = Path(tempfile.mkdtemp(prefix="stateful-test-"))
    try:
        (root / "src").mkdir()
        src, ckpt = str(root / "src"), str(root / "ckpt")

        (root / "src" / "a.json").write_text(
            "\n".join([_envelope(0, "newsapi", "abcd"), _envelope(1, "newsapi", "ab"), _envelope(2, "gnews", "abc")]) + "\n"
        )
        out1 = _run_epoch(spark, src, ckpt, str(root / "out1"))
        assert out1["newsapi"] == (2, 3.0)
        assert out1["gnews"] == (1, 3.0)

        # epoch 2: two more newsapi articles -> running count is 4, not 2
        (root / "src" / "b.json").write_text(
            "\n".join([_envelope(3, "newsapi", "abcdef"), _envelope(4, "newsapi", "")]) + "\n"
        )
        out2 = _run_epoch(spark, src, ckpt, str(root / "out2"))
        assert out2["newsapi"] == (4, (4 + 2 + 6 + 0) / 4)
    finally:
        shutil.rmtree(root, ignore_errors=True)
