"""Bucketed co-located joins: same key, same bucket count -> join plans with
NO Exchange on either side (the at-scale answer to recurring fact-fact
shuffles; see sources/tables.write_bucketed)."""

from __future__ import annotations

import re

from sentiment_analysis_data_pipeline_spark.sources.tables import load_table, write_bucketed

SF = "/root/testdata/sf0.001"


def test_bucketed_join_is_shuffle_free(spark):
    write_bucketed(load_table(spark, SF, "lineitem"), "bkt_lineitem", "l_orderkey", 8)
    write_bucketed(load_table(spark, SF, "orders"), "bkt_orders", "o_orderkey", 8)
    try:
        # MERGE hint: at sf0.001 the orders side is broadcast-sized, which
        # would ALSO be shuffle-free but wouldn't exercise bucketing; at real
        # fact-fact scale SMJ is what the planner picks unhinted.
        joined = spark.sql(
            """SELECT /*+ MERGE(l) */ l.l_orderkey, o.o_orderkey, l.l_extendedprice
               FROM bkt_lineitem l JOIN bkt_orders o
                 ON l.l_orderkey = o.o_orderkey"""
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        assert not re.search(r"Exchange (hash|range)partitioning|Exchange SinglePartition", plan), (
            f"bucketed join still shuffles:\n{plan}"
        )

        li, od = load_table(spark, SF, "lineitem"), load_table(spark, SF, "orders")
        n_plain = li.join(od, li["l_orderkey"] == od["o_orderkey"]).count()
        assert joined.count() == n_plain
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
        spark.sql("DROP TABLE IF EXISTS bkt_orders")


def test_bucketed_band_key_candidate_join_is_shuffle_free(spark):
    """The dedup-at-scale staging SCALE.md describes: write the LSH
    signature relation ONCE, bucketed by band_key; candidate generation is
    then a zero-Exchange sort-merge self-join over bucket files."""
    from sentiment_analysis_data_pipeline_spark.operators.dedup import minhash_band_keys

    docs = load_table(spark, SF, "documents")
    write_bucketed(minhash_band_keys(docs, "text", "doc_id"), "bkt_bands", "band_key", 8)
    try:
        joined = spark.sql(
            """SELECT /*+ MERGE(a) */ a.doc AS id_a, b.doc AS id_b
               FROM bkt_bands a JOIN bkt_bands b ON a.band_key = b.band_key
               WHERE a.doc < b.doc"""
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        assert not re.search(r"Exchange (hash|range)partitioning|Exchange SinglePartition", plan), (
            f"bucketed candidate join still shuffles:\n{plan}"
        )
        # same candidate set as the in-memory self-join
        banded = minhash_band_keys(docs, "text", "doc_id")
        n_mem = (
            banded.alias("a")
            .join(banded.alias("b"), "band_key")
            .where("a.doc < b.doc")
            .count()
        )
        assert joined.count() == n_mem > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_bands")
