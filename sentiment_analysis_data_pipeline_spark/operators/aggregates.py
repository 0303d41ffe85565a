"""Aggregation + monitoring operators (SURVEY.md §2.4, §2.10 T6).

  A1 filtered count (freshness)      dags/data_quality.py:30-32
  A2 quality rate (null-sentiment)   dags/data_quality.py:50-67
  A3 distinct set                    dags/sentiment_analysis_dag.py:36-38
  A4 terms agg (group-count top-10)  database/elasticsearch_handler.py:82-93
  O1-O3 sort / limit / top-k         database/elasticsearch_handler.py:53-89

The reference runs A1/A2 as two separate Mongo count_documents round-trips;
here A2 is one scan with a conditional count (partial aggregation map-side,
single shuffle of one row per group).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUALITY_THRESHOLD = 90.0  # dags/data_quality.py:65
FRESHNESS_WINDOW = "INTERVAL 2 HOURS"  # dags/data_quality.py:29


def freshness_count(df: DataFrame, ts_col: str, now: Column | None = None) -> DataFrame:
    """A1/T6: rows with ts >= now - 2h. `now` defaults to current_timestamp();
    tests pass a fixed instant (e.g. max(ts)) for determinism."""
    now = now if now is not None else F.current_timestamp()
    return df.filter(F.col(ts_col) >= now - F.expr(FRESHNESS_WINDOW)).agg(
        F.count("*").alias("recent_count")
    )


def quality_rate(df: DataFrame, quality_pred: Column) -> DataFrame:
    """A2/T6: single-pass total vs failing count and the derived rate
    (reference computes (total-missing)/total*100, dags/data_quality.py:63-64)."""
    agg = df.agg(
        F.count("*").alias("total"),
        F.count(F.when(~quality_pred, F.lit(1))).alias("missing"),
    )
    return agg.select(
        "total",
        "missing",
        F.when(F.col("total") == 0, F.lit(0.0))
        .otherwise((F.col("total") - F.col("missing")) * 100.0 / F.col("total"))
        .alias("quality_rate"),
    )


def terms_agg(df: DataFrame, field: str, size: int = 10) -> DataFrame:
    """A4/O3: ES terms aggregation = group-count, top-`size` buckets by count
    desc (ES default ordering), key asc as the deterministic tiebreak."""
    return (
        df.groupBy(F.col(field).alias("key"))
        .agg(F.count("*").alias("doc_count"))
        .orderBy(F.col("doc_count").desc(), F.col("key").asc())
        .limit(size)
    )


def assert_freshness(df: DataFrame, ts_col: str, now: Column | None = None) -> int:
    """T6 freshness monitor: raise if no rows in the window (dags/data_quality.py:34-36)."""
    n = freshness_count(df, ts_col, now).collect()[0]["recent_count"]
    if n == 0:
        raise AssertionError("freshness check failed: no recent data")
    return n


def assert_quality(df: DataFrame, quality_pred: Column, threshold: float = QUALITY_THRESHOLD) -> float:
    """T6 quality monitor: raise if quality rate below threshold
    (dags/data_quality.py:63-67)."""
    row = quality_rate(df, quality_pred).collect()[0]
    rate = row["quality_rate"]
    if row["total"] > 0 and rate < threshold:
        raise AssertionError(f"quality check failed: {rate:.2f}% < {threshold}%")
    return rate
