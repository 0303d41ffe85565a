"""Validation operator tests (P1/P2/P7/P11 -- utilities/data_validator.py
semantics)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from sentiment_analysis_data_pipeline_spark.operators import validate

TS = datetime.datetime(2024, 1, 1)


def _articles(spark):
    rows = [
        (1, "Good title", "https://example.com/a", TS),
        (2, "", "https://example.com/b", TS),           # empty title -> invalid
        (3, None, "https://example.com/c", TS),          # null title -> invalid
        (4, "ok", "not a url", TS),                      # bad url -> invalid
        (5, "ok", "ftp://example.com/e", TS),            # wrong scheme -> invalid
        (6, "ok", "https://example.com/f", None),        # no publishedAt -> invalid
        (7, "  ok  ", "http://sub.example.co/path_1", TS),
    ]
    return spark.createDataFrame(
        rows, "id long, title string, url string, publishedAt timestamp"
    )


def test_validate_articles(spark):
    kept = validate.validate_articles(_articles(spark)).select("id").collect()
    assert sorted(r["id"] for r in kept) == [1, 7]


def test_sanitize_str(spark):
    df = spark.createDataFrame([("  a\x00b  ",), (None,)], "s string")
    out = df.select(validate.sanitize_str(F.col("s")).alias("c")).collect()
    assert out[0]["c"] == "ab"
    assert out[1]["c"] is None


def test_non_empty_text(spark):
    df = spark.createDataFrame([("x",), ("   ",), ("",)], "t string")
    n = df.filter(validate.non_empty_text(F.col("t"))).count()
    assert n == 1
