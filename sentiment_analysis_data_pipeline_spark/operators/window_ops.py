"""Time-window & sessionization operators over event streams (batch form).

The reference has NO window operators (SURVEY.md §2.10 T3: its hourly job is
an incremental batch over `fetched_at >= now()-1h`). These are the idiomatic
Spark equivalents the engine ships so the same semantics run as tumbling
windows / sessions, batch or streaming (streaming/ingest.py wires the same
expressions behind withWatermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_agg(df: DataFrame, ts_col: str, unit: str = "hour") -> DataFrame:
    """Tumbling-window count+sum via date_trunc (deterministic, oracle-friendly
    form of window(ts, '1 hour') -- identical bucketing for aligned windows)."""
    return (
        df.groupBy(F.date_trunc(unit, F.col(ts_col)).alias("window_start"))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
    )


def sessionize(df: DataFrame, ts_col: str, user_col: str, gap_minutes: int = 30) -> DataFrame:
    """Sessionization: per-user sessions split on inactivity gaps.

    lag(ts) over (user, ts) -> gap flag -> running sum = session index. Two
    window functions over ONE partitioning (single shuffle on user); at scale
    the sort within user is the only per-key cost and AQE handles hot users.
    Batch analog of streaming session_window(ts, gap).
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col("event_id").asc())
    gap = F.col(ts_col).cast("long") - F.lag(F.col(ts_col).cast("long")).over(w)
    new_session = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    return (
        df.withColumn("_new", new_session)
        .withColumn("session_idx", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .drop("_new")
    )


def session_stats(df: DataFrame, ts_col: str = "ts", user_col: str = "user_id", gap_minutes: int = 30) -> DataFrame:
    """Per-user session count + mean session length (events)."""
    s = sessionize(df, ts_col, user_col, gap_minutes)
    per_session = s.groupBy(user_col, "session_idx").agg(F.count("*").alias("n_events"))
    return per_session.groupBy(user_col).agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
    )


def topk_per_group(df: DataFrame, group_col: str, order_col: str, tiebreak: str, k: int = 3) -> DataFrame:
    """Top-k rows per group via row_number window (single shuffle on group)."""
    w = Window.partitionBy(group_col).orderBy(F.col(order_col).desc(), F.col(tiebreak).asc())
    return df.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
