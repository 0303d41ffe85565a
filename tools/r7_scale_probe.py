"""Targeted 10x probe of the round-7 operators, one at a time with a
per-op wall budget -- identifies which op (if any) breaks the near-linear
envelope on the marker-inflated corpus before it costs a full smoke run.

Usage: python tools/r7_scale_probe.py [multiplier=10] [budget_sec=300] [name ...]
"""
from __future__ import annotations

import json
import sys
import tempfile
import threading
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from sentiment_analysis_data_pipeline_spark.session import get_spark

OPS = [
    "countmin_heavy_hitters",
    "cdc_chunks",
    "heldout_bigram_nll",
    "pagerank_step",
    "bloom_dedup_probe",
    "image_dimensions",
    "duplicate_spans",
    "dup_span_pairs",
    "triangle_count",
    "source_ngram_overlap",
]


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    budget = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    names = sys.argv[3:] or OPS
    spark = get_spark("r7-scale-probe")
    sc = spark.sparkContext
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    inflated = (
        base.select(
            "doc_id", F.explode(F.expr(f"sequence(0, {mult - 1})")).alias("copy"), "text"
        )
        .select(
            (F.col("doc_id") * mult + F.col("copy")).alias("doc_id"),
            F.expr(
                "replace(coalesce(text, ''), ' ', concat(' c', cast(copy as string), ' '))"
            ).alias("text"),
        )
        .withColumn("lang", F.lit("en"))
        .withColumn("source", F.concat(F.lit("src"), (F.col("doc_id") % 20).cast("string")))
        .withColumn("n_chars", F.length("text"))
    )
    out = tempfile.mkdtemp(prefix="r7-probe-")
    inflated.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    n = spark.read.parquet(f"{out}/documents.parquet").count()

    from sentiment_analysis_data_pipeline_spark.queries import spark_queries

    qs = spark_queries()
    timings: dict[str, object] = {}
    for name in names:
        done: list[object] = []

        def run(nm=name) -> None:
            # job group is thread-local: set it HERE so cancelJobGroup from
            # the main thread can actually find the jobs on timeout
            sc.setJobGroup(nm, nm, interruptOnCancel=True)
            try:
                done.append(qs[nm](spark, out).count())
            except Exception as e:  # cancelled or failed
                done.append(f"err: {type(e).__name__}")

        t0 = time.perf_counter()
        th = threading.Thread(target=run, daemon=True)
        th.start()
        th.join(budget)
        if th.is_alive():
            sc.cancelJobGroup(name)
            th.join(30)
            timings[name] = f"TIMEOUT>{budget}s"
        else:
            timings[name] = round(time.perf_counter() - t0, 1)
        print(json.dumps({name: timings[name], "rows": done[0] if done else None}), flush=True)
    print(json.dumps({"multiplier": mult, "rows": n, "timings": timings}), flush=True)


if __name__ == "__main__":
    main()
