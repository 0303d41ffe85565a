"""Composed streaming ingest (streaming/full_pipeline.py): validate ->
curation gate -> dedup probe -> sentiment in ONE foreachBatch epoch, with
component-for-component BATCH parity on the same drops -- the round-7
composition of the individually-parity-tested twins."""

from __future__ import annotations

import json
import uuid

import pyspark.sql.functions as F

from sentiment_analysis_data_pipeline_spark.operators.dedup import minhash_band_keys
from sentiment_analysis_data_pipeline_spark.plans.pipeline import sentiment_enrich
from sentiment_analysis_data_pipeline_spark.sources.tables import write_bucketed
from sentiment_analysis_data_pipeline_spark.streaming import dedup_stream, full_pipeline
from sentiment_analysis_data_pipeline_spark.streaming.curation_stream import curation_gate
from sentiment_analysis_data_pipeline_spark.sources.tables import drop_table_with_files as _drop_with_files

# gate-clean base texts (verified: every flag false -- low repetition,
# >= 10 words, English-classified, quality above the bound)
BASE = (
    "every morning brings fresh coffee and quiet conversation about distant "
    "mountains where eager travelers discover hidden valleys beneath golden "
    "sunlight while children play near rivers full of shining fish"
)
ALT = (
    "completely different material concerning engine rooms with broadcast joins "
    "running across many executors at considerable scale during long nights "
    "when operators watch dashboards showing steady progress everywhere"
)
FLAGS = ["too_short", "too_repetitive", "low_quality", "non_english", "kept"]


def _write_batch(path, rows):
    with open(path, "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


def _bootstrap(spark, table, corpus_path):
    corpus = spark.createDataFrame([(1, BASE), (2, ALT)], "doc_id long, text string")
    corpus.write.parquet(corpus_path)
    write_bucketed(
        minhash_band_keys(corpus, "text", "doc_id"),
        table,
        "band_key",
        dedup_stream.INDEX_BUCKETS,
    )


def test_composed_stream_matches_batch_components(spark, tmp_path):
    table = f"full_pipe_idx_{uuid.uuid4().hex[:8]}"
    batch_table = f"full_pipe_idx_b_{uuid.uuid4().hex[:8]}"
    source = tmp_path / "incoming"
    source.mkdir()
    corpus_path = str(tmp_path / "corpus")
    batch_corpus_path = str(tmp_path / "corpus_batch")
    pairs_path = str(tmp_path / "pairs")
    curated_path = str(tmp_path / "curated")
    ckpt = str(tmp_path / "ckpt")

    # identical bootstrapped state for the stream and the batch replica
    _bootstrap(spark, table, corpus_path)
    _bootstrap(spark, batch_table, batch_corpus_path)

    drop = [
        (101, BASE + " v2"),                     # near-dup of corpus doc 1 -> kept, paired
        (102, "great excellent best work by the fine team with a happy win today"),
        (103, "short text"),                      # too_short -> rejected, NO dedup probe
        (104, "spam " * 40),                      # too_repetitive -> rejected
        (2, ALT),                                 # re-crawl of corpus doc 2 -> dropped entirely
    ]
    try:
        _write_batch(str(source / "b1.json"), drop)
        q = full_pipeline.run_curated_ingest(
            spark, str(source), table, corpus_path, pairs_path, curated_path, ckpt
        )
        q.awaitTermination(180)

        curated = spark.read.parquet(curated_path)
        got_rows = {r["doc_id"]: r for r in curated.collect()}
        # the re-crawled id 2 must not re-land; everything else lands with flags
        assert set(got_rows) == {101, 102, 103, 104}

        # --- batch parity: curation flags + sentiment on the SAME drop ---
        batch_df = spark.createDataFrame(
            [(i, t) for i, t in drop if i != 2], "doc_id long, text string"
        )
        exp_flags = {
            r["doc_id"]: tuple(r[f] for f in FLAGS)
            for r in curation_gate(batch_df).collect()
        }
        got_flags = {i: tuple(got_rows[i][f] for f in FLAGS) for i in got_rows}
        assert got_flags == exp_flags
        assert got_flags[103][0] is True      # too_short
        assert got_flags[104][1] is True      # too_repetitive
        assert got_flags[101][4] and got_flags[102][4]  # kept

        exp_sent = {
            r["doc_id"]: (r["vader_compound"], r["textblob_polarity"], r["overall"])
            for r in sentiment_enrich(batch_df).collect()
        }
        for i, row in got_rows.items():
            s = row["sentiment"]
            assert (s["vader_compound"], s["textblob_polarity"], s["overall"]) == exp_sent[i], i
        assert got_rows[102]["sentiment"]["overall"] == "positive"

        # --- batch parity: dedup pairs over the KEPT docs on the replica ---
        kept_df = batch_df.filter(F.col("doc_id").isin(101, 102))
        exp_pairs = {
            (r["id_a"], r["id_b"], r["kind"], round(r["jaccard"], 12))
            for r in dedup_stream.dedup_micro_batch(
                spark, kept_df, batch_table, batch_corpus_path
            ).collect()
        }
        got_pairs = {
            (r["id_a"], r["id_b"], r["kind"], round(r["jaccard"], 12))
            for r in spark.read.parquet(pairs_path).collect()
        }
        assert got_pairs == exp_pairs
        assert any(p[:3] == (101, 1, "corpus") for p in got_pairs)
        # rejected docs must never reach the dedup probe or the stores
        assert not any(103 in p[:2] or 104 in p[:2] for p in got_pairs)
        store_ids = {r["doc_id"] for r in spark.read.parquet(corpus_path).collect()}
        assert store_ids == {1, 2, 101, 102}

        # --- epoch 2: near-dup of a KEPT epoch-1 doc -> the index grew;
        # near-dup of a REJECTED epoch-1 doc -> no pair (it was never indexed)
        _write_batch(
            str(source / "b2.json"),
            [(201, BASE + " v3"), (202, "spam " * 40 + "x")],
        )
        q = full_pipeline.run_curated_ingest(
            spark, str(source), table, corpus_path, pairs_path, curated_path, ckpt
        )
        q.awaitTermination(180)
        pairs2 = {
            (r["id_a"], r["id_b"], r["kind"])
            for r in spark.read.parquet(pairs_path).filter("batch_id > 0").collect()
        }
        assert any(a == 201 and b in (1, 101) and k == "corpus" for a, b, k in pairs2)
        assert not any(202 in (a, b) for a, b, _ in pairs2)
        curated2 = spark.read.parquet(curated_path)
        assert {r["doc_id"] for r in curated2.collect()} == {101, 102, 103, 104, 201, 202}
    finally:
        _drop_with_files(spark, table)
        _drop_with_files(spark, batch_table)


def test_composed_epoch_replay_is_idempotent(spark, tmp_path):
    """Re-running the SAME epoch (foreachBatch retry semantics) must not
    duplicate curated rows, corpus rows, or index signatures; pairs carry
    the batch_id stamp for downstream replay dedupe."""
    table = f"full_pipe_idx_{uuid.uuid4().hex[:8]}"
    corpus_path = str(tmp_path / "corpus")
    pairs_path = str(tmp_path / "pairs")
    curated_path = str(tmp_path / "curated")
    _bootstrap(spark, table, corpus_path)
    batch = spark.createDataFrame(
        [(101, BASE + " v2"), (103, "short text")], "doc_id long, text string"
    )
    for _ in range(2):  # original + replay
        full_pipeline.curated_epoch(
            spark, batch, 0, table, corpus_path, pairs_path, curated_path
        )
    try:
        assert spark.read.parquet(curated_path).groupBy("doc_id").count().filter(
            "count > 1"
        ).count() == 0
        assert spark.read.parquet(corpus_path).groupBy("doc_id").count().filter(
            "count > 1"
        ).count() == 0
        sig_dupes = (
            spark.table(table)
            .groupBy("doc", "band_key")
            .count()
            .filter("count > 1")
            .count()
        )
        assert sig_dupes == 0
        # the replay re-emitted its pairs under the SAME batch_id: a
        # downstream exactly-once consumer dedupes on (batch_id, id_a, id_b)
        pairs = spark.read.parquet(pairs_path)
        assert pairs.select("batch_id").distinct().count() == 1
    finally:
        _drop_with_files(spark, table)
