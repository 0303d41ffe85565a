"""Same-session A/B of the tokenizer-family queries: r5 code vs HEAD, and
fresh-JVM vs post-sentiment-kernel JVM.

Round-6 bench showed chi2_keywords/bm25_search/tfidf_topk/more_like_this/
url_normalize/pmi_collocations +44..55% vs round 5 with IDENTICAL query
bodies (ast-verified) and tight within-run spreads. Two candidate mechanisms:

  H1 (code drift): some shared helper changed r5->r6 and slowed these paths.
      Test: import the r5 package from a worktree and the HEAD package in the
      SAME SparkSession, interleaving sample batches per query (ABAB), so any
      environment drift hits both arms equally.
  H2 (JVM-state pollution): the round-6 sentiment kernel emits much larger
      codegen methods; the bench runs the two sentiment queries FIRST, so
      code-cache / JIT-profile pressure could tax every later query.
      Test: measure the six queries in a fresh session, then run the two
      sentiment queries 5x, then re-measure the six -- same code both times.
      CodeHeap pool usage is recorded before/after via the JVM MXBeans.

Emits one JSON line with per-query medians for each arm.
"""

from __future__ import annotations

import importlib
import json
import os
import sys
import time
from statistics import median

HEAD_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R5_ROOT = os.environ.get("SPARK_GRAFT_R5_ROOT", "/tmp/r5worktree")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))

QUERIES = [
    "chi2_keywords",
    "bm25_search",
    "tfidf_topk",
    "more_like_this",
    "url_normalize",
    "pmi_collocations",
]

PKG = "sentiment_analysis_data_pipeline_spark"


def _load_queries(root: str):
    """Import the package rooted at `root`, purging any prior import."""
    for mod in [m for m in sys.modules if m == PKG or m.startswith(PKG + ".")]:
        del sys.modules[mod]
    sys.path.insert(0, root)
    try:
        q = importlib.import_module(PKG + ".queries")
        return q.spark_queries()
    finally:
        sys.path.remove(root)


def _code_cache(spark) -> dict[str, int]:
    jvm = spark._jvm
    out = {}
    for pool in jvm.java.lang.management.ManagementFactory.getMemoryPoolMXBeans():
        name = pool.getName()
        if "CodeHeap" in name or "Metaspace" in name:
            out[name] = pool.getUsage().getUsed()
    return out


def _sweep(spark) -> None:
    spark.catalog.clearCache()
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in list(jmap.keySet().toArray()):
        rdd = jmap.get(rid)
        if rdd is not None:
            rdd.unpersist(False)


def _sample(spark, fn, runs: int) -> list[float]:
    fn(spark, SF_DIR).collect()  # warm
    out = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).collect()
        out.append(time.perf_counter() - t0)
    return out


def main() -> None:
    sys.path.insert(0, HEAD_ROOT)
    from sentiment_analysis_data_pipeline_spark.session import get_spark

    spark = get_spark("ab_bench")
    spark.range(1000).selectExpr("sum(id)").collect()

    head_qs = _load_queries(HEAD_ROOT)
    r5_qs = _load_queries(R5_ROOT)

    result: dict = {"sf_dir": SF_DIR, "runs": RUNS}

    # ---- Phase 1: fresh-JVM interleaved A/B (H1) -------------------------
    cc0 = _code_cache(spark)
    fresh_head: dict[str, float] = {}
    fresh_r5: dict[str, float] = {}
    for name in QUERIES:
        h: list[float] = []
        r: list[float] = []
        # interleave batches so drift-in-time hits both arms
        for _ in range(RUNS):
            h.extend(_sample(spark, head_qs[name], 1))
            r.extend(_sample(spark, r5_qs[name], 1))
        fresh_head[name] = round(median(h), 3)
        fresh_r5[name] = round(median(r), 3)
        _sweep(spark)
    result["fresh_head"] = fresh_head
    result["fresh_r5"] = fresh_r5
    cc1 = _code_cache(spark)

    # ---- Phase 2: pollute with the sentiment kernel, re-measure (H2) -----
    for _ in range(5):
        head_qs["sentiment_scores"](spark, SF_DIR).collect()
        head_qs["sentiment_terms_agg"](spark, SF_DIR).collect()
    _sweep(spark)
    cc2 = _code_cache(spark)
    polluted_head: dict[str, float] = {}
    for name in QUERIES:
        polluted_head[name] = round(median(_sample(spark, head_qs[name], RUNS)), 3)
        _sweep(spark)
    result["polluted_head"] = polluted_head
    cc3 = _code_cache(spark)
    result["code_cache"] = {
        "fresh_start": cc0,
        "after_phase1": cc1,
        "after_sentiment": cc2,
        "end": cc3,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
