"""Streaming incremental dedup (streaming/dedup_stream.py): each
micro-batch probes the persisted minhash band index, verifies with exact
Jaccard, and grows the index -- so batch N+1 dedups against batch N, the
property a continuous-crawl pipeline actually needs."""

from __future__ import annotations

import json
import uuid

import pyspark.sql.functions as F

from sentiment_analysis_data_pipeline_spark.operators.dedup import minhash_band_keys
from sentiment_analysis_data_pipeline_spark.sources.tables import write_bucketed
from sentiment_analysis_data_pipeline_spark.streaming import dedup_stream
from sentiment_analysis_data_pipeline_spark.sources.tables import drop_table_with_files as _drop_with_files

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "near the warm fire and the birds sing in the tall green trees"
)
ALT = (
    "completely different content about spark partitions shuffles and "
    "broadcast joins running across one thousand executors at scale"
)


def _near(text: str, tag: str) -> str:
    """A near-duplicate: same long token run, one trailing word changed."""
    return text + " " + tag


def _write_batch(path: str, rows: list[tuple[int, str]]) -> None:
    with open(path, "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


def _drain(spark, source, table, corpus, pairs, ckpt):
    q = dedup_stream.run_streaming_dedup(spark, source, table, corpus, pairs, ckpt)
    q.awaitTermination(120)


def test_streaming_dedup_grows_index(spark, tmp_path):
    table = f"stream_mh_idx_{uuid.uuid4().hex[:8]}"
    source = tmp_path / "incoming"
    source.mkdir()
    corpus_path = str(tmp_path / "corpus")
    pairs_path = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")

    # corpus snapshot: two docs, indexed once
    corpus = spark.createDataFrame(
        [(1, BASE), (2, ALT)], "doc_id long, text string"
    )
    corpus.write.parquet(corpus_path)
    write_bucketed(
        minhash_band_keys(corpus, "text", "doc_id"),
        table,
        "band_key",
        dedup_stream.INDEX_BUCKETS,
    )

    try:
        # batch 1: near-dup of corpus doc 1, one unique doc, and a re-crawl
        # of doc 2 (identical id -- must not land or self-pair)
        _write_batch(
            str(source / "b1.json"),
            [(101, _near(BASE, "v2")), (102, "totally unique short text here"), (2, ALT)],
        )
        _drain(spark, str(source), table, corpus_path, pairs_path, ckpt)

        pairs = {
            (r["id_a"], r["id_b"], r["kind"])
            for r in spark.read.parquet(pairs_path).collect()
        }
        assert (101, 1, "corpus") in pairs
        assert not any(102 in (a, b) for a, b, _ in pairs)
        assert not any(a == b for a, b, _ in pairs)  # no re-crawl self-pair

        # the re-crawled doc 2 must not have landed twice
        store = spark.read.parquet(corpus_path)
        assert store.filter(F.col("doc_id") == 2).count() == 1

        # batch 2: near-dup of BATCH-1 doc 101 (proves the index grew) and
        # an in-batch near-dup pair
        _write_batch(
            str(source / "b2.json"),
            [(201, _near(BASE, "v3")), (202, _near(ALT, "x")), (203, _near(ALT, "y"))],
        )
        _drain(spark, str(source), table, corpus_path, pairs_path, ckpt)

        pairs = {
            (r["id_a"], r["id_b"], r["kind"])
            for r in spark.read.parquet(pairs_path).collect()
        }
        assert (201, 101, "corpus") in pairs  # batch-2 doc matched a batch-1 doc
        assert (202, 203, "batch") in pairs or (203, 202, "batch") in pairs
        # every corpus-kind pair's jaccard is a real score in (0, 1]
        for r in spark.read.parquet(pairs_path).filter("kind = 'corpus'").collect():
            assert 0.0 < r["jaccard"] <= 1.0
    finally:
        _drop_with_files(spark, table)
