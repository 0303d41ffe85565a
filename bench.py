"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints exactly ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {name: sec},
   "sf": ..., "rows": {name: n}}

Baseline context (BASELINE.md): the reference publishes no benchmark numbers;
its operating envelope tops out at ~0.67 rows/s ingest and an hourly batch of
<=1,200 articles. Anything here beats that by orders of magnitude -- the
driver target is therefore staying within 2x of the recorded per-round
baseline at the same scale factor.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the flagship pipeline + the heaviest representatives of each
# operator family (joins/aggs, windows, dedup, similarity, search).
BENCH_QUERIES = [
    "sentiment_terms_agg",
    "sentiment_scores",
    "pricing_summary",
    "top_customer_revenue",
    "regional_revenue",
    "hourly_events",
    "sessionize",
    "topk_per_type",
    "asof_last_signup",
    "keyword_search",
    "exact_dedup",
    "minhash_pairs",
    "ngram_jaccard_pairs",
    "simhash_fingerprints",
    "cosine_topk",
    "ann_lsh",
    "ivf_ann",
    "embedding_dedup_pairs",
    "quality_score",
    "corpus_prep",
    "stratified_sample",
    "sequence_packing",
    "decontaminate",
    "pii_redact",
    "repetition_metrics",
    "knn_batch",
    "simhash_pairs",
    "url_normalize",
    "bm25_search",
    "curation_pipeline",
    "unigram_surprisal",
    "tfidf_topk",
    "pmi_collocations",
    "winnow_pairs",
    "phrase_search",
    "more_like_this",
    "mixture_weights",
    "chunk_documents",
]


def main() -> None:
    from sentiment_analysis_data_pipeline_spark.queries import spark_queries
    from sentiment_analysis_data_pipeline_spark.session import get_spark

    spark = get_spark("bench")
    qs = spark_queries()

    # JVM/codegen/scan/shuffle warmup outside the timed region (constant
    # session-init costs, not engine scaling properties): run the heaviest
    # plans once at the smallest scale factor -- Spark's codegen cache is
    # keyed by generated code, which is identical across sf dirs, so the
    # timed sf0.1 runs measure execution, not Janino compilation.
    spark.range(1000).selectExpr("sum(id)").collect()
    warm_dir = "/root/testdata/sf0.001"
    for name in ("sentiment_terms_agg", "minhash_pairs", "simhash_fingerprints", "pricing_summary"):
        try:
            qs[name](spark, warm_dir).collect()
        except Exception:
            pass

    # median-of-3: machine timing noise here is +/-50% per single run; the
    # median is robust to one outlier in either direction, which makes
    # round-over-round regressions detectable (best-of-N hides slowdowns
    # whenever one lucky run sneaks in)
    from statistics import median

    runs = max(3, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in BENCH_QUERIES:
        samples, n = [], 0
        for _ in range(runs):
            t0 = time.perf_counter()
            out = qs[name](spark, SF_DIR)
            n = len(out.collect())
            samples.append(time.perf_counter() - t0)
        timings[name] = round(median(samples), 4)
        rows[name] = n

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    result = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "rows": rows,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
