"""Concurrency model: registry queries materialize fixed-name temp views
(bm25_ex, emb_cand, ...), so ONE SparkSession serves one query at a time --
the driver's sequential contract. Concurrent tenants get isolation the
Spark way: `spark.newSession()` shares the SparkContext (executors, cache)
but has its OWN temp-view catalog. This test pins that claim: two
view-colliding queries interleaved across sibling sessions both return
exactly their sequential results."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from sentiment_analysis_data_pipeline_spark import queries as Q

SF = "/root/testdata/sf0.001"


def test_new_session_isolates_temp_views(spark):
    # both queries register a view named `documents` + private work views
    seq_bm25 = {(r["doc_id"], r["bm25"]) for r in Q.q_bm25_search(spark, SF).collect()}
    seq_mlt = {(r["doc_id"],) for r in Q.q_more_like_this(spark, SF).collect()}

    s1, s2 = spark.newSession(), spark.newSession()
    with ThreadPoolExecutor(2) as ex:
        f1 = ex.submit(lambda: Q.q_bm25_search(s1, SF).collect())
        f2 = ex.submit(lambda: Q.q_more_like_this(s2, SF).collect())
        got_bm25 = {(r["doc_id"], r["bm25"]) for r in f1.result(300)}
        got_mlt = {(r["doc_id"],) for r in f2.result(300)}

    assert got_bm25 == seq_bm25
    assert got_mlt == seq_mlt
    # canary: a temp view registered in one sibling is invisible to the other
    s1.range(1).createOrReplaceTempView("concurrency_canary")
    assert s1.catalog.tableExists("concurrency_canary")
    assert not s2.catalog.tableExists("concurrency_canary")
