"""Streaming near-dup dedup against the persisted minhash band index -- the
continuous-crawl twin of the batch `incremental_dedup` workflow
(operators/dedup_index.new_batch_candidates).

100 TB design: the historical corpus exists ONLY as (a) its bucketed
band-key index table and (b) a doc-store parquet. Each micro-batch

  1. PROBES the index for candidate pairs -- the corpus side reads its
     bucket files in place (no Exchange above the scan) and is never
     re-signatured; only the batch, smaller by the corpus/interval ratio,
     moves across the wire;
  2. exact-Jaccard-VERIFIES candidates, computing shingles for candidate
     MEMBERS only (semi-join-filtered doc-store read -- at corpus scale the
     tokenize cost covers the ~0.x% of docs LSH surfaced, not the corpus);
  3. finds IN-BATCH near-dup pairs with the same banded-LSH self-join
     (a batch is never large enough to need its own persisted index);
  4. APPENDS the batch's signatures to the index table (same bucketBy spec,
     so the co-located-join property survives the append) and the batch's
     docs to the doc store -- batch N+1 dedups against everything before it.

Delivery: probe-before-append makes a replayed batch (foreachBatch retry)
re-emit the same pairs rather than miss any; pair output is
batch_id-stamped so downstream consumers can dedupe replays exactly once
(the same contract merge_into_parquet implements for the article sink). A
re-crawled doc_id already in the doc store is dropped before landing, and
the index append itself anti-joins against ids already indexed
(append_to_band_index) -- so even a foreachBatch RETRY that fires after
the index write but before the doc-store write cannot land a second
signature set for an id. The three epoch writes are individually
idempotent under replay, not transactional: a crash between them leaves
(at worst) pairs without corpus rows, which the next attempt repairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import dialect as D
from ..functions import text as TX
from ..operators.dedup import minhash_band_keys, minhash_pairs
from ..operators.dedup_index import new_batch_candidates

DOC_STREAM_SCHEMA = "doc_id long, text string"
INDEX_BUCKETS = 8


def shingle_sets(docs: DataFrame, ngram: int = 3) -> DataFrame:
    """(doc, shingles) distinct word-n-gram sets, empty-set rows dropped --
    the exact-verification input relation."""
    toks = TX.tokenize(D.SPARK, "coalesce(text, '')")
    sh = D.arr_distinct(D.SPARK, TX.ngrams(D.SPARK, "_toks", ngram))
    return (
        docs.selectExpr("doc_id AS doc", f"{toks} AS _toks")
        .selectExpr("doc", f"{sh} AS shingles")
        .filter("size(shingles) > 0")
    )


def verify_candidates(
    spark: SparkSession,
    cands: DataFrame,
    members: DataFrame,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact-Jaccard filter of (id_a, id_b) candidate pairs; `members` must
    hold the text of every id referenced by `cands`. The shingle relation
    is materialized once (both join sides read it; CTE re-inlining would
    tokenize the member set twice -- same measurement as the batch
    incremental_dedup query: -33% at sf0.1)."""
    sh = shingle_sets(members).localCheckpoint(eager=True)
    a = sh.selectExpr("doc AS id_a", "shingles AS sh_a")
    b = sh.selectExpr("doc AS id_b", "shingles AS sh_b")
    inter = F.expr("cast(size(array_intersect(sh_a, sh_b)) as double)")
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "jaccard",
            inter / (F.expr("cast(size(sh_a) + size(sh_b) as double)") - inter),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def dedup_micro_batch(
    spark: SparkSession,
    batch: DataFrame,
    index_table: str,
    corpus_path: str,
    threshold: float = 0.5,
) -> DataFrame:
    """One micro-batch's near-dup pairs: batch-vs-corpus (via the persisted
    index) plus batch-internal, as (id_a, id_b, jaccard, kind)."""
    cands = new_batch_candidates(spark, batch, table=index_table).selectExpr(
        "new_doc AS id_a", "corpus_doc AS id_b"
    )
    corpus_members = (
        spark.read.parquet(corpus_path)
        .join(cands.select(F.col("id_b").alias("doc_id")).distinct(), "doc_id", "left_semi")
        .select("doc_id", "text")
    )
    members = batch.select("doc_id", "text").unionByName(corpus_members)
    vs_corpus = verify_candidates(spark, cands, members, threshold).withColumn(
        "kind", F.lit("corpus")
    )
    in_batch = (
        minhash_pairs(batch, "text", "doc_id", jaccard_threshold=threshold)
        .select("id_a", "id_b", "jaccard")
        .withColumn("kind", F.lit("batch"))
    )
    return vs_corpus.unionByName(in_batch)


def append_to_band_index(spark: SparkSession, batch: DataFrame, index_table: str) -> None:
    """Append the batch's (doc, band_key) signatures with the SAME bucketBy
    spec the index was created with (sources/tables.write_bucketed) -- the
    new files land in the correct buckets and the zero-Exchange probe join
    keeps holding for every later batch.

    Replay-idempotent: ids already present in the index are dropped before
    signaturing, so a foreachBatch retry that re-runs the append cannot
    leave two signature sets for one id (which would inflate every later
    probe's candidate fan-out). The guard reads ONLY the index's doc column
    (column-pruned bucketed scan) and the anti-join broadcasts the batch
    side; at corpus scale this is one narrow column sweep per micro-batch
    -- acceptable for a correctness invariant, and replaceable by a
    batch_id-stamped index if even that sweep matters."""
    indexed = spark.table(index_table).select(F.col("doc").alias("doc_id")).distinct()
    fresh = batch.join(indexed, "doc_id", "left_anti")
    (
        minhash_band_keys(fresh, "text", "doc_id")
        .write.mode("append")
        .bucketBy(INDEX_BUCKETS, "band_key")
        .sortBy("band_key")
        .format("parquet")
        .saveAsTable(index_table)
    )


def run_streaming_dedup(
    spark: SparkSession,
    source_dir: str,
    index_table: str,
    corpus_path: str,
    pairs_path: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
):
    """File-source streaming dedup: json docs land in `source_dir`; verified
    near-dup pairs append to `pairs_path`; the index table and doc store
    grow with each batch. availableNow trigger -- drains what is present,
    then stops (the batch/stream-shared processing contract)."""
    stream = spark.readStream.schema(DOC_STREAM_SCHEMA).json(source_dir)

    def epoch(batch: DataFrame, batch_id: int) -> None:
        # foreachBatch hands the batch to a CLONED session -- temp views the
        # probe registers live there, so every read/sql in this epoch must
        # use the batch's session, not the outer one
        bs = batch.sparkSession
        batch = batch.dropDuplicates(["doc_id"]).filter(F.col("text").isNotNull())
        # re-crawl guard: ids already in the doc store keep their original
        # signatures; the fresh copy is neither landed nor re-signatured
        seen = bs.read.parquet(corpus_path).select("doc_id")
        batch = batch.join(seen, "doc_id", "left_anti").localCheckpoint(eager=True)
        if not batch.take(1):
            return
        pairs = dedup_micro_batch(bs, batch, index_table, corpus_path, threshold)
        (
            pairs.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(pairs_path)
        )
        append_to_band_index(bs, batch, index_table)
        batch.select("doc_id", "text").write.mode("append").parquet(corpus_path)

    return (
        stream.writeStream.foreachBatch(epoch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
