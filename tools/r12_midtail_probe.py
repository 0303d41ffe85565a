"""Round-12 mid-tail fixed-cost decomposition (r11 verdict item 9).

~150 bench queries sit at 0.3-1.0 s -- about half the bench total. Guide
§1.2: before touching per-task work, find out where that second goes. For
each representative query this probe splits one bench-methodology sample
into:

  - build_s: fn(spark, sf_dir) -- the Python query constructor. Covers the
    _view() calls (spark.read.parquet schema/footer read + temp-view
    registration, py4j round trips) and spark.sql() parse+ANALYSIS of the
    statement (both eager).
  - plan_s: forcing queryExecution().executedPlan on the returned frame --
    optimizer + physical planning (codegen compiles lazily at execution and
    is JIT-cached across samples, like the bench's warm runs guarantee).
  - exec_s: .collect() on the planned frame -- execution + result pull.

Every sample REBUILDS the frame (matching bench._sample; reusing a frame
would let AQE reuse materialized shuffle stages = result caching). Also
microbenches spark.read.parquet(path) per base table, since _view pays it
on every call.

Usage: python tools/r12_midtail_probe.py [--runs 5] [name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Spread of the 0.3-1.0 s mid-tail: single-scan aggregates, window queries,
# sketchers, stats, multimodal byte walks, plus two heavies for contrast.
DEFAULT_NAMES = [
    "pricing_summary",
    "revenue_rollup",
    "zscore_days",
    "sessionize",
    "stratified_sample",
    "url_normalize",
    "sentence_split",
    "table_checksum",
    "shard_manifest",
    "simhash_fingerprints",
    "welch_ttest",
    "image_dimensions",
    "hdr_quantiles",
    "minhash_pairs",
    "top_customer_revenue",
    "corpus_prep",
    "sentiment_scores",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=None)
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()
    names = args.names or DEFAULT_NAMES

    from sentiment_analysis_data_pipeline_spark.queries import spark_queries
    from sentiment_analysis_data_pipeline_spark.session import get_spark

    spark = get_spark("r12-midtail-probe")
    qs = spark_queries()
    spark.range(1000).selectExpr("sum(id)").collect()

    # read.parquet microbench: what one _view() table registration costs
    tables = {}
    for t in sorted(os.listdir(SF_DIR)):
        if not t.endswith(".parquet"):
            continue
        path = os.path.join(SF_DIR, t)
        spark.read.parquet(path)  # warm (FS cache, first listing)
        t0 = time.perf_counter()
        for _ in range(10):
            spark.read.parquet(path)
        tables[t] = round((time.perf_counter() - t0) / 10, 4)
    print(json.dumps({"read_parquet_per_call_s": tables}), flush=True)

    for name in names:
        if name not in qs:
            print(json.dumps({"name": name, "error": "unknown"}), flush=True)
            continue
        fn = qs[name]
        fn(spark, SF_DIR).collect()  # bench-style untimed warm run
        build, plan, execu = [], [], []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.collect()
            t3 = time.perf_counter()
            build.append(t1 - t0)
            plan.append(t2 - t1)
            execu.append(t3 - t2)
        tot = min(b + p + e for b, p, e in zip(build, plan, execu))
        print(
            json.dumps(
                {
                    "name": name,
                    "build_s": round(min(build), 4),
                    "plan_s": round(min(plan), 4),
                    "exec_s": round(min(execu), 4),
                    "total_min_s": round(tot, 4),
                    "fixed_frac": round(
                        (min(build) + min(plan)) / max(tot, 1e-9), 3
                    ),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
