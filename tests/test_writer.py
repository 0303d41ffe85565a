"""Processed-table writer: partitioned layout + pruning + materialized tokens."""

from __future__ import annotations

import shutil
import tempfile

from sentiment_analysis_data_pipeline_spark.plans.pipeline import write_processed


def test_write_processed_partitioned(spark, sf_dir):
    out = tempfile.mkdtemp(prefix="processed-")
    try:
        write_processed(spark, sf_dir, out)
        back = spark.read.parquet(out)
        assert back.count() > 400
        assert "processed_date" in back.columns and "tokens" in back.columns
        assert back.schema["sentiment"].dataType.typeName() == "struct"
        # partition pruning: filter on the partition column must prune at scan
        pruned = back.filter("processed_date = date'1900-01-01'")
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert pruned.count() == 0
        # tokens usable for search without re-tokenization
        hit = back.filter("array_contains(tokens, 'spark')").count()
        assert hit > 0
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_stream_dedup_within_watermark(spark):
    import json, tempfile as tf
    from pathlib import Path
    from sentiment_analysis_data_pipeline_spark.streaming import file_article_stream
    from sentiment_analysis_data_pipeline_spark.streaming.ingest import with_stream_dedup

    root = Path(tf.mkdtemp(prefix="wmdedup-"))
    try:
        (root / "src").mkdir()
        env = lambda i, url: json.dumps(
            {"source_api": "newsapi", "fetched_at": f"2024-01-01T00:0{i}:00.000Z",
             "article": {"title": f"t{i}", "url": url, "publishedAt": "2024-01-01T00:00:00.000Z"}})
        (root / "src" / "a.json").write_text(
            "\n".join([env(1, "https://e.com/x"), env(2, "https://e.com/x"), env(3, "https://e.com/y")]) + "\n")
        stream = with_stream_dedup(file_article_stream(spark, str(root / "src")))
        q = (stream.writeStream.foreachBatch(
                lambda df, b: df.write.mode("append").parquet(str(root / "out")))
             .option("checkpointLocation", str(root / "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        urls = [r["url"] for r in spark.read.parquet(str(root / "out")).collect()]
        assert sorted(urls) == ["https://e.com/x", "https://e.com/y"]
    finally:
        shutil.rmtree(root, ignore_errors=True)
