"""The composed streaming twins, end-to-end (round 7, VERDICT r6 item 8):
ingest -> validate -> curation gate -> near-dup probe -> sentiment in ONE
foreachBatch epoch -- every piece is the already-parity-tested component,
chained the way a continuous training-data ingest actually runs.

Epoch shape per micro-batch:

  1. VALIDATE: in-batch id dedup, null-text drop, then the re-crawl /
     replay guard (anti-join the doc store's ids -- a doc already landed
     keeps its original record and signatures).
  2. CURATION GATE (streaming/curation_stream.curation_gate): the
     stateless flag projection -- too_short / too_repetitive /
     low_quality / non_english / kept -- flag-for-flag equal to the batch
     filter_reasons semantics.
  3. DEDUP PROBE (streaming/dedup_stream.dedup_micro_batch) over the KEPT
     docs only (curation upstream of dedup, as in the batch
     curation_pipeline): batch-vs-corpus pairs via the persisted band
     index (corpus never re-signatured) plus in-batch pairs.
  4. SENTIMENT (plans/pipeline.sentiment_enrich) over ALL gated rows --
     rejected docs keep their scores too, so the curated store stays
     fully explainable without a re-run.
  5. LAND: curated rows (flags + sentiment struct) guarded by an
     anti-join on the curated store's ids; pairs batch_id-stamped
     (replay-dedupable downstream); index append (internally idempotent,
     append_to_band_index's anti-join); doc-store append LAST -- the
     probe-before-append ordering means a replayed epoch re-emits the
     same pairs rather than missing any, and every write is individually
     idempotent under replay (the dedup_stream delivery contract,
     extended to the curated sink).

100 TB shape: everything per-epoch is projection + broadcast/bucketed
joins sized by the BATCH (the corpus side of the probe reads bucket files
in place); no streaming aggregation state, no watermark -- the only
cross-batch state is the persisted index + stores, exactly the artifacts
a deployment already maintains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .curation_stream import curation_gate
from .dedup_stream import DOC_STREAM_SCHEMA, append_to_band_index, dedup_micro_batch


def curated_epoch(
    bs: SparkSession,
    batch: DataFrame,
    batch_id: int,
    index_table: str,
    corpus_path: str,
    pairs_path: str,
    curated_path: str,
    threshold: float = 0.5,
) -> None:
    """One composed epoch (factored out so tests can drive it directly on a
    batch frame -- foreachBatch hands a CLONED session, so all reads here
    use `bs`)."""
    from ..plans.pipeline import sentiment_enrich

    batch = batch.dropDuplicates(["doc_id"]).filter(F.col("text").isNotNull())
    # like dedup_stream, the pipeline starts from a BOOTSTRAPPED corpus
    # snapshot + band index (possibly empty relations, but existing) -- so
    # the re-crawl guard reads unconditionally
    seen = bs.read.parquet(corpus_path).select("doc_id")
    batch = batch.join(seen, "doc_id", "left_anti").localCheckpoint(eager=True)
    if not batch.take(1):
        return

    gated = curation_gate(batch).localCheckpoint(eager=True)
    kept = gated.filter("kept").select("doc_id", "text")

    pairs = dedup_micro_batch(bs, kept, index_table, corpus_path, threshold)
    (
        pairs.withColumn("batch_id", F.lit(batch_id))
        .write.mode("append")
        .parquet(pairs_path)
    )

    scored = sentiment_enrich(gated).select(
        "doc_id",
        "text",
        "too_short",
        "too_repetitive",
        "low_quality",
        "non_english",
        "kept",
        F.struct(
            F.col("overall"),
            F.col("confidence"),
            F.col("vader_compound"),
            F.col("textblob_polarity"),
        ).alias("sentiment"),
    )
    # Path-absent (first epoch) is an FS existence check, not a swallowed
    # exception: any real read error must propagate, or a replayed epoch
    # would silently skip the idempotence anti-join and land duplicate
    # curated rows (round-8 ADVICE fix).
    from ..sources.tables import _fs_for

    fs, hpath = _fs_for(bs, curated_path)
    if fs.exists(hpath):
        landed = bs.read.parquet(curated_path).select("doc_id")
        scored = scored.join(landed, "doc_id", "left_anti")
    scored.write.mode("append").parquet(curated_path)

    append_to_band_index(bs, kept, index_table)
    kept.write.mode("append").parquet(corpus_path)


def run_curated_ingest(
    spark: SparkSession,
    source_dir: str,
    index_table: str,
    corpus_path: str,
    pairs_path: str,
    curated_path: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
):
    """File-source composed ingest: json docs (doc_id, text) land in
    `source_dir`; availableNow trigger drains what is present, then
    stops."""
    stream = spark.readStream.schema(DOC_STREAM_SCHEMA).json(source_dir)

    def epoch(batch: DataFrame, batch_id: int) -> None:
        curated_epoch(
            batch.sparkSession,
            batch,
            batch_id,
            index_table,
            corpus_path,
            pairs_path,
            curated_path,
            threshold,
        )

    return (
        stream.writeStream.foreachBatch(epoch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
