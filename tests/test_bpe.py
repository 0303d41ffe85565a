"""Golden tests for distributed BPE merge training: the Spark implementation
must learn the exact same merge sequence (order, pairs, frequencies) as the
pure-Python replica of the reference algorithm (Sennrich et al. 2016),
including greedy leftmost overlap resolution and lexicographic tie-breaks."""

from __future__ import annotations

from pyspark.sql import functions as F

from sentiment_analysis_data_pipeline_spark.operators.bpe import (
    bpe_merges,
    bpe_merges_py,
)


def _words_df(spark, freqs: dict[str, int]):
    return spark.createDataFrame(
        [(w, f) for w, f in freqs.items()], "word string, freq long"
    )


def test_bpe_matches_python_replica_sennrich_example(spark):
    # The worked example from the BPE paper: es -> est -> est</w> -> lo ...
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_freq"])
        for r in bpe_merges(spark, _words_df(spark, freqs), n_merges=10).orderBy("rank").collect()
    ]
    want = bpe_merges_py(freqs, n_merges=10)
    assert got == want
    assert got[0][1:4] == ("e", "s", "es")  # freq 9: newest+widest
    assert got[1][1:4] == ("es", "t", "est")


def test_bpe_greedy_overlap_and_stop(spark):
    # 'aaaa': merge (a,a) applies leftmost-first -> [aa, aa], so the second
    # round merges (aa, aa) -- the overlap case naive pair replacement gets
    # wrong. min_freq stops training before single-occurrence pairs.
    freqs = {"aaaa": 3, "b": 9}
    got = [
        (r["left"], r["right"], r["pair_freq"])
        for r in bpe_merges(spark, _words_df(spark, freqs), n_merges=10, min_freq=3)
        .orderBy("rank")
        .collect()
    ]
    want = [(l, r, f) for _, l, r, _, f in bpe_merges_py(freqs, n_merges=10, min_freq=3)]
    assert got == want
    assert got[0] == ("a", "a", 9)  # 3 adjacent pairs x corpus freq 3
    assert all(f >= 3 for _, _, f in got)


def test_bpe_query_entry_runs(spark):
    from sentiment_analysis_data_pipeline_spark.queries import q_bpe_merges

    out = q_bpe_merges(spark, "/root/testdata/sf0.001").collect()
    assert len(out) > 0
    ranks = [r["rank"] for r in out]
    assert ranks == sorted(ranks) and ranks[0] == 1
    # frequencies are non-increasing is NOT guaranteed (merges create new
    # pairs), but every learned pair must meet the min frequency
    assert all(r["pair_freq"] >= 2 for r in out)
