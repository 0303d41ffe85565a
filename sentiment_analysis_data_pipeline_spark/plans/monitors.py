"""Data-quality monitors: the reference's `data_quality` DAG (T6, SURVEY.md
§2.10) as reusable assertion jobs over the sink tables.

Reference: dags/data_quality.py -- freshness (raw rows in last 2 h must be
> 0, :29-36) and quality rate (>= 90% of last-day rows with non-null
sentiment, :44-67), scheduled every 2 h (:17). Here both are single-scan
DataFrame checks runnable on any cadence (or from a
StreamingQueryListener); the two Mongo count round-trips per check collapse
into one conditional aggregation.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.aggregates import (
    QUALITY_THRESHOLD,
    assert_freshness,
    assert_quality,
    freshness_count,
    quality_rate,
)


@dataclass
class MonitorReport:
    fresh_count: int
    quality_rate: float
    passed: bool
    failures: list[str]


def run_monitors(
    raw: DataFrame,
    processed: DataFrame,
    ts_col: str = "fetched_at",
    quality_pred: Column | None = None,
    now: Column | None = None,
    threshold: float = QUALITY_THRESHOLD,
    strict: bool = False,
) -> MonitorReport:
    """Run both monitors; strict=True raises like the reference DAG's task
    failures, otherwise returns a report (for dashboards/listeners)."""
    pred = quality_pred if quality_pred is not None else F.col("sentiment").isNotNull()
    failures: list[str] = []

    if strict:
        n = assert_freshness(raw, ts_col, now)
        rate = assert_quality(processed, pred, threshold)
        return MonitorReport(n, rate, True, [])

    n = freshness_count(raw, ts_col, now).collect()[0]["recent_count"]
    if n == 0:
        failures.append("freshness: no rows in trailing window")
    row = quality_rate(processed, pred).collect()[0]
    rate = float(row["quality_rate"])
    if row["total"] > 0 and rate < threshold:
        failures.append(f"quality: {rate:.2f}% < {threshold}%")
    return MonitorReport(n, rate, not failures, failures)


class BatchMetricsListener:
    """A5/T6 streaming form: per-microbatch run counters captured from the
    engine's own progress events (rows in, rows/sec, batch id, sink), the
    restart-safe replacement for the reference's operational log counters
    (dags/sentiment_analysis_dag.py:98-129). Attach with
    spark.streams.addListener(listener); `records` accumulates one dict per
    completed batch -- feed them to run_monitors cadence decisions or ship
    them to any metrics sink.

    Implemented against pyspark's StreamingQueryListener interface; import
    is deferred so the module stays importable on stripped runtimes.
    """

    def __new__(cls):
        from pyspark.sql.streaming import StreamingQueryListener

        class _Listener(StreamingQueryListener):
            def __init__(self) -> None:
                self.records: list[dict] = []

            def onQueryStarted(self, event) -> None:
                pass

            def onQueryProgress(self, event) -> None:
                p = event.progress
                self.records.append(
                    {
                        "query_id": str(p.id),
                        "batch_id": p.batchId,
                        "num_input_rows": p.numInputRows,
                        "rows_per_sec": p.processedRowsPerSecond,
                        "timestamp": p.timestamp,
                    }
                )

            def onQueryTerminated(self, event) -> None:
                pass

            def onQueryIdle(self, event) -> None:
                pass

        return _Listener()
