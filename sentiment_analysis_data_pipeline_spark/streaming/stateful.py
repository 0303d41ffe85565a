"""Custom stateful streaming operator: running per-source ingest statistics
via applyInPandasWithState.

The reference has no stateful operator beyond the URL unique-index (T5);
this is the engine's demonstration of the *capability* SURVEY.md §2.10 maps
to `applyInPandasWithState` -- arbitrary keyed state with exactly-once
semantics from the checkpoint. The running counters here are what the
reference's operational logging (A5, dags/sentiment_analysis_dag.py:98-129)
would need to survive restarts.

State shape per source_api key: (n_articles, sum of title lengths). Emits
one updated row per key per epoch: the cumulative count and mean title
length. Arrow moves batches; state is a tiny tuple per key -- at 1000
executors this scales with DISTINCT KEYS, not rows.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("source_api", T.StringType()),
        T.StructField("n_articles", T.LongType()),
        T.StructField("mean_title_len", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("title_len_sum", T.LongType()),
    ]
)


def _update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    n, s = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        titles = pdf["title"].fillna("")
        n += len(pdf)
        s += int(titles.str.len().sum())
    state.update((n, s))
    yield pd.DataFrame(
        {
            "source_api": [key[0]],
            "n_articles": [n],
            "mean_title_len": [s / n if n else 0.0],
        }
    )


def running_source_stats(envelopes: DataFrame) -> DataFrame:
    """envelopes: streaming DataFrame with source_api + article.title."""
    flat = envelopes.selectExpr("source_api", "article.title AS title")
    return flat.groupBy("source_api").applyInPandasWithState(
        _update,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


from pyspark.sql.streaming.stateful_processor import StatefulProcessor


class _SourceStatsProcessor(StatefulProcessor):
    """transformWithStateInPandas version of the running counters: the
    Spark 4 arbitrary-state API (typed state handles, timers, TTL) that
    supersedes applyInPandasWithState. Both operators are kept: the handle
    API is where streaming state is headed; the GroupState form documents
    the widely-deployed shape."""

    def init(self, handle) -> None:
        self._state = handle.getValueState("counts", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        existing = self._state.get()
        n, s = existing if existing is not None else (0, 0)
        for pdf in rows:
            titles = pdf["title"].fillna("")
            n += len(pdf)
            s += int(titles.str.len().sum())
        self._state.update((n, s))
        yield pd.DataFrame(
            {
                "source_api": [key[0]],
                "n_articles": [n],
                "mean_title_len": [s / n if n else 0.0],
            }
        )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter(())

    def close(self) -> None:
        pass


def running_source_stats_tws(envelopes: DataFrame) -> DataFrame:
    """running_source_stats via transformWithStateInPandas (Spark 4 typed
    state handles). Same semantics, same output schema; state scales with
    distinct keys, not rows."""
    flat = envelopes.selectExpr("source_api", "article.title AS title")
    return flat.groupBy("source_api").transformWithStateInPandas(
        _SourceStatsProcessor(), OUTPUT_SCHEMA, "Update", "None"
    )
