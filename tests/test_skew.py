"""Salted-join / salted-agg equivalence tests (skew mitigation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sentiment_analysis_data_pipeline_spark.operators.skew import salted_join, skewed_group_count


def _skewed(spark):
    # 1000 rows of hot key 'h', a few cold keys
    hot = spark.range(1000).select(F.lit("h").alias("k"), F.col("id").alias("v"))
    cold = spark.range(5).select(F.concat(F.lit("c"), F.col("id")).alias("k"), F.col("id").alias("v"))
    return hot.unionByName(cold)


def test_salted_join_matches_plain_join(spark):
    left = _skewed(spark)
    right = spark.createDataFrame(
        [("h", 1.0), ("c1", 2.0), ("c3", 3.0)], "k string, w double"
    )
    plain = left.join(right, "k", "inner").orderBy("k", "v")
    salted = salted_join(left, right, "k", n_salts=8).orderBy("k", "v")
    assert [r.asDict() for r in salted.collect()] == [r.asDict() for r in plain.collect()]


def test_salted_left_join(spark):
    left = _skewed(spark)
    right = spark.createDataFrame([("h", 1.0)], "k string, w double")
    plain = left.join(right, "k", "left").count()
    salted = salted_join(left, right, "k", n_salts=4, how="left").count()
    assert salted == plain


def test_skewed_group_count(spark):
    df = _skewed(spark)
    truth = {r["k"]: r["count"] for r in df.groupBy("k").count().collect()}
    out = {r["k"]: r["n"] for r in skewed_group_count(df, "k").collect()}
    assert out == truth
