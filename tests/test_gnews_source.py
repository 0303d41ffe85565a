"""GNews DataSource twin (sources/newsapi_source.GnewsFixtureDataSource):
page-per-partition planning over the GNews body protocol
(producers/gnews_producer.py:17-46 -- no status field, articles-key
presence check, image / source{name,url} article shape), stream epochs,
and the two-producer union end-to-end."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from sentiment_analysis_data_pipeline_spark.schemas import ENVELOPE_SCHEMA
from sentiment_analysis_data_pipeline_spark.sources import newsapi_source as NS


def _gnews_articles(n, prefix="g"):
    # the GNews article shape: image (not urlToImage), source{name,url}
    # (no id), no author field
    return [
        {
            "title": f"{prefix} title {i}",
            "description": f"gdesc {i}",
            "content": f"{prefix} gnews body {i} with words",
            "url": f"https://gnews.example.com/{prefix}/{i}",
            "publishedAt": f"2024-02-0{(i % 9) + 1}T08:30:00Z",
            "source": {"name": "GExample", "url": "https://gexample.com"},
            "image": f"https://img.example.com/{i}.jpg",
        }
        for i in range(n)
    ]


def test_reads_gnews_pages_as_partitions_with_envelope_schema(spark, tmp_path):
    d = str(tmp_path / "gfx")
    n_pages = NS.write_gnews_fixture_pages(d, _gnews_articles(5), page_size=3)
    assert n_pages == 2
    spark.dataSource.register(NS.GnewsFixtureDataSource)
    df = spark.read.format(NS.GNEWS_FORMAT_NAME).option("path", d).load()
    assert df.schema == ENVELOPE_SCHEMA
    rows = df.collect()
    assert len(rows) == 5
    assert {r["source_api"] for r in rows} == {"gnews"}
    nparts = df.select(F.spark_partition_id().alias("p")).distinct().count()
    assert nparts == 2
    one = df.filter(
        F.col("article.url") == "https://gnews.example.com/g/0"
    ).collect()[0]
    # GNews spellings land in the union-reconciled envelope fields
    assert one["article"]["source"]["name"] == "GExample"
    assert one["article"]["source"]["url"] == "https://gexample.com"
    assert one["article"]["source"]["id"] is None
    assert one["article"]["image"] == "https://img.example.com/0.jpg"
    assert one["article"]["urlToImage"] is None
    assert one["article"]["author"] is None
    assert one["article"]["publishedAt"].month == 2


def test_gnews_protocol_error_propagates(spark, tmp_path):
    """The GNews validity check is articles-key PRESENCE (the reference's
    'Invalid response format' branch), not a status field -- and a GNews
    body must NOT be rejected for lacking 'status'."""
    d = str(tmp_path / "gbad")
    NS.write_gnews_fixture_pages(d, _gnews_articles(2), page_size=2)
    with open(os.path.join(d, "page-2.json"), "w") as f:
        json.dump({"totalArticles": 0}, f)  # no articles key
    spark.dataSource.register(NS.GnewsFixtureDataSource)
    df = spark.read.format(NS.GNEWS_FORMAT_NAME).option("path", d).load()
    with pytest.raises(Exception, match="[Ii]nvalid"):
        df.collect()


def test_gnews_streaming_pages_arrive_incrementally(spark, tmp_path):
    import time

    d = str(tmp_path / "gstream")
    NS.write_gnews_fixture_pages(d, _gnews_articles(4, "s"), page_size=2)
    spark.dataSource.register(NS.GnewsFixtureDataSource)
    q = (
        spark.readStream.format(NS.GNEWS_FORMAT_NAME)
        .option("path", d)
        .load()
        .selectExpr("article.url AS url", "source_api")
        .writeStream.format("memory")
        .queryName("gnews_mem")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        def wait_count(n, timeout=60):
            t0 = time.time()
            while time.time() - t0 < timeout:
                if spark.table("gnews_mem").count() >= n:
                    return spark.table("gnews_mem").count()
                time.sleep(0.5)
            return spark.table("gnews_mem").count()

        assert wait_count(4) == 4
        with open(os.path.join(d, "page-3.json"), "w") as f:
            json.dump(
                {"totalArticles": 6, "articles": _gnews_articles(2, "late")}, f
            )
        assert wait_count(6) == 6
    finally:
        q.stop()
    rows = spark.table("gnews_mem").collect()
    assert {r["source_api"] for r in rows} == {"gnews"}
    assert len({r["url"] for r in rows}) == 6  # no double-read


def test_two_producer_union_end_to_end(spark, tmp_path):
    """Both reference producers as first-class sources feeding ONE envelope
    relation (the topic-union shape, SURVEY.md §2.6): read each fixture
    protocol, union, validate, and dedup by url -- the same lineage the
    batch pipeline runs."""
    from sentiment_analysis_data_pipeline_spark.operators import validate

    nd = str(tmp_path / "nfx")
    gd = str(tmp_path / "gfx")
    news = [
        {
            "title": f"n title {i}",
            "description": "d",
            "content": "news body words",
            "url": f"https://example.com/shared/{i}",
            "publishedAt": "2024-01-05T12:00:00Z",
            "author": "au",
            "source": {"id": "sid", "name": "N", "url": None},
            "urlToImage": "https://img/n.jpg",
        }
        for i in range(3)
    ]
    NS.write_fixture_pages(nd, news, page_size=2)
    # one GNews article shares a URL with a NewsAPI one (the cross-source
    # duplicate the reference dedups by unique url index)
    garts = _gnews_articles(2)
    garts[0]["url"] = "https://example.com/shared/0"
    NS.write_gnews_fixture_pages(gd, garts, page_size=2)
    spark.dataSource.register(NS.NewsApiFixtureDataSource)
    spark.dataSource.register(NS.GnewsFixtureDataSource)
    n_df = spark.read.format(NS.FORMAT_NAME).option("path", nd).load()
    g_df = spark.read.format(NS.GNEWS_FORMAT_NAME).option("path", gd).load()
    assert n_df.schema == g_df.schema == ENVELOPE_SCHEMA
    env = n_df.unionByName(g_df)
    ok = validate.validate_articles(
        env,
        title="article.title",
        url="article.url",
        published_at="article.publishedAt",
    )
    assert ok.count() == 5
    deduped = ok.withColumn("u", F.col("article.url")).dropDuplicates(["u"]).drop("u")
    assert deduped.count() == 4  # the shared url collapses
    by_src = {
        r["source_api"]: r["count"]
        for r in env.groupBy("source_api").count().collect()
    }
    assert by_src == {"newsapi": 3, "gnews": 2}
