"""Scale-up smoke: synthetically multiply the documents corpus Nx (unique
texts, stable dup structure) and measure the heavy per-row operators --
evidence for the 'would this hold at 1000x' question the small-SF bench
can't answer.

Usage: python tools/scale_smoke.py [multiplier=40]
Writes nothing to the repo; uses /tmp for the inflated corpus.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from sentiment_analysis_data_pipeline_spark.operators import dedup
from sentiment_analysis_data_pipeline_spark.plans.pipeline import sentiment_enrich
from sentiment_analysis_data_pipeline_spark.session import get_spark


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    spark = get_spark("scale-smoke")
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    n_base = base.count()

    # inflate with per-copy token interleaving: a copy marker inserted
    # between every pair of words makes the copies' shingle sets disjoint,
    # so this measures per-row THROUGHPUT scaling, not pair explosion.
    # (The suffix-only variant keeps copies near-identical and becomes a
    # dedup-heavy workload: 40x sf0.1 -> 4.1M verified near-dup pairs.)
    inflated = (
        base.select(
            "doc_id",
            F.explode(F.expr(f"sequence(0, {mult - 1})")).alias("copy"),
            "text",
        )
        .select(
            (F.col("doc_id") * mult + F.col("copy")).alias("doc_id"),
            F.expr("replace(coalesce(text, ''), ' ', concat(' c', cast(copy as string), ' '))").alias("text"),
        )
    )
    # write as <dir>/documents.parquet so registry queries can treat the
    # inflated corpus as an sf_dir
    out = tempfile.mkdtemp(prefix="scale-smoke-")
    inflated = inflated.withColumn("lang", F.lit("en")).withColumn(
        "source", F.concat(F.lit("src"), (F.col("doc_id") % 20).cast("string"))
    ).withColumn("n_chars", F.length("text"))
    inflated.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    docs = spark.read.parquet(f"{out}/documents.parquet").withColumn(
        "text", F.coalesce("text", F.lit(""))
    )
    n = docs.count()

    # inflate embeddings the same way (identical vectors, fresh vec_ids):
    # right for per-row/top-k throughput ops (embedding_standardize, the
    # hybrid fusion arms); dedup-family ops are NOT smoked on this copy
    # (identical vectors would measure pair explosion, not throughput)
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    (
        emb.select(
            "vec_id", F.explode(F.expr(f"sequence(0, {mult - 1})")).alias("copy"), "embedding", "label"
        )
        .select(
            (F.col("vec_id") * mult + F.col("copy")).alias("vec_id"), "embedding", "label"
        )
        .write.mode("overwrite")
        .parquet(f"{out}/embeddings.parquet")
    )

    timings = {}
    t0 = time.perf_counter()
    sentiment_enrich(docs, "text").groupBy("overall").count().collect()
    timings["sentiment_kernel"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    pairs = dedup.minhash_pairs(docs, "text", "doc_id").count()
    timings["minhash_pairs"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    dedup.exact_dedup(docs, "text", "doc_id").count()
    timings["exact_dedup"] = round(time.perf_counter() - t0, 2)

    # round-2 curation ops straight from the registry over the inflated dir
    from sentiment_analysis_data_pipeline_spark.queries import spark_queries

    qs = spark_queries()
    extra_counts = {}
    for name in (
        "decontaminate",
        "repetition_metrics",
        "url_normalize",
        "simhash_pairs",
        "curation_pipeline",
        "unigram_surprisal",
        "tfidf_topk",
        "pmi_collocations",
        # round-4 additions (documents-table ops)
        "containment_pairs",
        "zipf_slope",
        "domain_quota_sample",
        "winnow_pairs",
        # round-5 additions: incremental dedup builds + probes the persisted
        # minhash band index over the inflated corpus; media byte stats runs
        # the Arrow-batched histogram kernel over every payload
        "incremental_dedup",
        "media_byte_stats",
        "boilerplate_blocks",
        # round-5 batch-2: corpus-linear curation/retrieval ops
        "temperature_resample",
        "perplexity_bands",
        "frame_sample",
        "embedding_standardize",
        "hybrid_search_rrf",
        # round-5 batch-3: drift monitor, PCA matvec, IVF cell QA
        "source_drift",
        "pca_power_step",
        "ivf_cell_balance",
        # round-7: per-char substring dedup + pair attribution, CDC chunk
        # dedup, held-out LM scoring, near-dup-graph PageRank, CM sketch
        # audit, bloom membership probe, image header decode
        "duplicate_spans",
        "dup_span_pairs",
        "cdc_chunks",
        "heldout_bigram_nll",
        "pagerank_step",
        "countmin_heavy_hitters",
        "bloom_dedup_probe",
        "image_dimensions",
        # round-7 batch 5: PQ ADC ANN + codebook QA (embeddings-side)
        "pq_ann",
        "pq_distortion",
    ):
        t0 = time.perf_counter()
        extra_counts[name] = qs[name](spark, out).count()
        timings[name] = round(time.perf_counter() - t0, 2)

    print(
        json.dumps(
            {
                "multiplier": mult,
                "rows": n,
                "base_rows": n_base,
                "timings_sec": timings,
                "minhash_pairs_found": pairs,
                "r2_counts": extra_counts,
            }
        )
    )


if __name__ == "__main__":
    main()
