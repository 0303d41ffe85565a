"""Spark 4 Python DataSource for the NewsAPI page protocol
(sources/newsapi_source.py): page-per-partition planning, typed envelope
rows, protocol error propagation, and composition with the validation
operator -- the reference's producer loop as a first-class Spark source."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sentiment_analysis_data_pipeline_spark.schemas import ENVELOPE_SCHEMA
from sentiment_analysis_data_pipeline_spark.sources import newsapi_source as NS


def _articles(n, prefix="a"):
    return [
        {
            "title": f"{prefix} title {i}",
            "description": f"desc {i}",
            "content": f"{prefix} body text {i} with words",
            "url": f"https://example.com/{prefix}/{i}",
            "publishedAt": f"2024-01-0{(i % 9) + 1}T12:00:00Z",
            "author": "au",
            "source": {"id": "src-id", "name": "Example", "url": None},
            "urlToImage": None,
            "image": None,
        }
        for i in range(n)
    ]


def test_reads_pages_as_partitions_with_envelope_schema(spark, tmp_path):
    d = str(tmp_path / "fixtures")
    n_pages = NS.write_fixture_pages(d, _articles(5), page_size=3)
    assert n_pages == 2
    spark.dataSource.register(NS.NewsApiFixtureDataSource)
    df = (
        spark.read.format(NS.FORMAT_NAME)
        .option("path", d)
        .option("source_api", "newsapi")
        .load()
    )
    assert df.schema == ENVELOPE_SCHEMA
    rows = df.collect()
    assert len(rows) == 5
    assert {r["source_api"] for r in rows} == {"newsapi"}
    # page-per-partition: the two fixture pages land in two partitions
    nparts = df.select(F.spark_partition_id().alias("p")).distinct().count()
    assert nparts == 2
    # typed article struct round-trips (timestamp parsed, nested source)
    one = df.filter(F.col("article.url") == "https://example.com/a/0").collect()[0]
    assert one["article"]["source"]["name"] == "Example"
    assert one["article"]["publishedAt"].year == 2024
    assert one["inserted_at"] is None  # sink MERGE's job, not the source's


def test_protocol_error_propagates(spark, tmp_path):
    d = str(tmp_path / "bad")
    NS.write_fixture_pages(d, _articles(2), page_size=2)
    import json, os  # noqa: E401

    with open(os.path.join(d, "page-2.json"), "w") as f:
        json.dump({"status": "error", "articles": []}, f)
    spark.dataSource.register(NS.NewsApiFixtureDataSource)
    df = spark.read.format(NS.FORMAT_NAME).option("path", d).load()
    with pytest.raises(Exception, match="status"):
        df.collect()


def test_composes_with_validation_lineage(spark, tmp_path):
    # the source output IS the envelope relation the rest of the engine
    # consumes: run the P1/P2/P7 validation operator directly on it
    from sentiment_analysis_data_pipeline_spark.operators import validate

    d = str(tmp_path / "fx")
    arts = _articles(4)
    arts[0]["url"] = "notaurl"  # P2 reject
    arts[1]["title"] = None  # P1 reject
    NS.write_fixture_pages(d, arts, page_size=4)
    spark.dataSource.register(NS.NewsApiFixtureDataSource)
    env = spark.read.format(NS.FORMAT_NAME).option("path", d).load()
    ok = validate.validate_articles(
        env, title="article.title", url="article.url",
        published_at="article.publishedAt",
    )
    assert ok.count() == 2


def test_streaming_pages_arrive_incrementally(spark, tmp_path):
    # the streaming twin: each micro-batch consumes pages beyond the
    # committed offset; a page landing later is picked up by a later epoch,
    # and nothing is double-read
    import time

    d = str(tmp_path / "stream_fx")
    NS.write_fixture_pages(d, _articles(4, "s"), page_size=2)  # page-1, page-2
    spark.dataSource.register(NS.NewsApiFixtureDataSource)
    q = (
        spark.readStream.format(NS.FORMAT_NAME)
        .option("path", d)
        .option("source_api", "newsapi")
        .load()
        .selectExpr("article.url AS url")
        .writeStream.format("memory")
        .queryName("newsapi_mem")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        def wait_count(n, timeout=60):
            t0 = time.time()
            while time.time() - t0 < timeout:
                if spark.table("newsapi_mem").count() >= n:
                    return spark.table("newsapi_mem").count()
                time.sleep(0.5)
            return spark.table("newsapi_mem").count()

        assert wait_count(4) == 4
        # a third page lands mid-stream (the next poll of the API)
        import json, os  # noqa: E401

        with open(os.path.join(d, "page-3.json"), "w") as f:
            json.dump(
                {"status": "ok", "totalResults": 6,
                 "articles": _articles(2, "late")}, f)
        assert wait_count(6) == 6
    finally:
        q.stop()
    urls = {r["url"] for r in spark.table("newsapi_mem").collect()}
    assert len(urls) == 6  # no double-read across epochs
