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


def test_bpe_encode_matches_python_replica(spark):
    """encode_documents must reproduce the pure-Python rank-ordered encode
    word-for-word, and encoding the training words with the learned table
    must reproduce the training end-state (concatenation invariant)."""
    from sentiment_analysis_data_pipeline_spark.operators.bpe import (
        bpe_encode_py,
        encode_documents,
    )

    freqs = {"lower": 5, "lowest": 4, "newer": 3, "wider": 2, "low": 7}
    merges = [(l, r) for _, l, r, _, _ in bpe_merges_py(freqs, n_merges=8, min_freq=2)]
    assert merges, "fixture must learn at least one merge"
    docs = spark.createDataFrame(
        [(1, ["lower", "low"]), (2, ["lowest", "unseen"]), (3, []), (4, None)],
        "doc_id long, toks array<string>",
    )
    rows = {r["doc_id"]: r["bpe_tokens"] for r in encode_documents(docs, merges).collect()}
    for doc_id, words in [(1, ["lower", "low"]), (2, ["lowest", "unseen"])]:
        want = [t for w in words for t in bpe_encode_py(w, merges)]
        assert rows[doc_id] == want, doc_id
        # losslessness: stripping end-marks reconstructs the exact text
        assert "".join(rows[doc_id]).replace("</w>", "") == "".join(words)
    assert rows[3] == [] and rows[4] == []
    # the learned merges actually compress: fewer tokens than characters
    assert len(rows[1]) < len("lowerlow") + 2


def test_bpe_encode_query_entry_runs(spark):
    from sentiment_analysis_data_pipeline_spark.queries import q_bpe_encode

    out = q_bpe_encode(spark, "/root/testdata/sf0.001").collect()
    assert len(out) > 0
    assert {c for c in out[0].asDict()} == {"doc_id", "n_bpe_tokens", "encoding_md5"}
    # BPE can only shorten a character-level encoding, never lengthen it
    assert all(r["n_bpe_tokens"] >= 0 for r in out)
