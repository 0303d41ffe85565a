"""The reference deployment, end to end, on this engine in ONE test:
both producers (NewsAPI + GNews page protocols) -> streaming union ->
validation (the producers' gate) -> exactly-once MERGE landing (the
consumer + unique-index role) -> the hourly sentiment ETL (EP3) ->
terms aggregation (the ES query surface). A reference user's whole
system, driven through the engine's own components -- the 'switch from
the reference' proof as a single composed run."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from sentiment_analysis_data_pipeline_spark.operators import validate
from sentiment_analysis_data_pipeline_spark.plans.pipeline import sentiment_enrich
from sentiment_analysis_data_pipeline_spark.sources import newsapi_source as NS
from sentiment_analysis_data_pipeline_spark.streaming.ingest import merge_into_parquet


def _news_articles():
    arts = [
        {
            "title": f"markets {w} today as growth beats every forecast",
            "description": "a good and happy outcome for investors",
            "content": "the rally was great and wonderful for everyone involved",
            "url": f"https://news.example.com/n/{i}",
            "publishedAt": f"2024-03-0{i + 1}T09:00:00Z",
            "author": "desk",
            "source": {"id": "nx", "name": "NewsX", "url": None},
            "urlToImage": None,
        }
        for i, w in enumerate(("surge", "rally", "climb"))
    ]
    arts.append(  # invalid: fails the URL regex gate (P2), must not land
        {
            "title": "broken row",
            "description": "d",
            "content": "c",
            "url": "notaurl",
            "publishedAt": "2024-03-04T09:00:00Z",
            "author": "desk",
            "source": {"id": "nx", "name": "NewsX", "url": None},
            "urlToImage": None,
        }
    )
    return arts


def _gnews_articles():
    arts = [
        {
            "title": f"terrible {w} crisis deepens with awful losses",
            "description": "a bad and sad day for the sector",
            "content": "the collapse was horrible and the damage is devastating",
            "url": f"https://gnews.example.com/g/{i}",
            "publishedAt": f"2024-03-0{i + 1}T10:30:00Z",
            "source": {"name": "GNewsY", "url": "https://gy.example.com"},
            "image": None,
        }
        for i, w in enumerate(("banking", "energy"))
    ]
    # cross-source duplicate: same URL the NewsAPI producer already fetched
    # (the reference dedups these via the unique Mongo index)
    arts.append(
        {
            "title": "markets surge today as growth beats every forecast",
            "description": "syndicated copy",
            "content": "the rally was great and wonderful for everyone involved",
            "url": "https://news.example.com/n/0",
            "publishedAt": "2024-03-01T11:00:00Z",
            "source": {"name": "GNewsY", "url": "https://gy.example.com"},
            "image": None,
        }
    )
    return arts


def test_reference_deployment_end_to_end(spark, tmp_path):
    news_dir = str(tmp_path / "newsapi")
    gnews_dir = str(tmp_path / "gnews")
    NS.write_fixture_pages(news_dir, _news_articles(), page_size=2)
    NS.write_gnews_fixture_pages(gnews_dir, _gnews_articles(), page_size=2)
    spark.dataSource.register(NS.NewsApiFixtureDataSource)
    spark.dataSource.register(NS.GnewsFixtureDataSource)

    landed = str(tmp_path / "raw_news")
    ckpt = str(tmp_path / "ckpt")

    def run_ingest(ck: str):
        # EP1+EP2: both producers stream, union, validate, flatten, MERGE
        n_stream = spark.readStream.format(NS.FORMAT_NAME).option("path", news_dir).load()
        g_stream = (
            spark.readStream.format(NS.GNEWS_FORMAT_NAME).option("path", gnews_dir).load()
        )
        env = n_stream.unionByName(g_stream)
        ok = validate.validate_articles(
            env,
            title="article.title",
            url="article.url",
            published_at="article.publishedAt",
        ).select(
            "source_api",
            F.col("article.url").alias("url"),
            F.col("article.title").alias("title"),
            F.col("article.description").alias("description"),
            F.col("article.content").alias("content"),
            F.col("article.publishedAt").alias("published_at"),
        )
        q = (
            ok.writeStream.foreachBatch(merge_into_parquet(landed, key="url"))
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_ingest(ckpt)
    raw = spark.read.parquet(landed)
    urls = {r["url"] for r in raw.select("url").collect()}
    # 3 valid NewsAPI + 2 valid GNews; the invalid row gated out, the
    # cross-source duplicate collapsed by the MERGE
    assert len(urls) == 5
    assert "notaurl" not in urls

    # replay from a FRESH checkpoint (the restarted-consumer case): the
    # MERGE anti-join must land nothing new
    run_ingest(str(tmp_path / "ckpt2"))
    assert spark.read.parquet(landed).count() == 5

    # EP3: the hourly sentiment ETL over the landed articles -- text
    # assembly (F1), kernel, fusion/classify (F8-F11)
    text = "concat_ws(' ', title, description, substring(content, 1, 500))"
    scored = sentiment_enrich(
        spark.read.parquet(landed), text_expr=text, id_col="url"
    )
    rows = {r["url"]: r for r in scored.collect()}
    assert len(rows) == 5
    # the deliberately-polarized fixtures must classify accordingly
    for u, r in rows.items():
        assert r["overall"] in ("positive", "neutral", "negative")
        assert abs(r["confidence"]) <= 1.0
        if u.startswith("https://news.example.com/"):
            assert r["overall"] == "positive", (u, r["vader_compound"])
        else:
            assert r["overall"] == "negative", (u, r["vader_compound"])

    # EP4/A4: the ES terms-agg surface over the processed corpus
    agg = {
        r["overall"]: r["count"]
        for r in scored.groupBy("overall").count().collect()
    }
    assert agg == {"positive": 3, "negative": 2}
    # T6 quality monitor semantics: every landed row carries a sentiment
    assert scored.filter(F.col("overall").isNull()).count() == 0
