"""Measure the in-session vs persisted-index minhash crossover
(VERDICT r5 "What's wrong" item 3).

At sf0.1 the indexed path is 4x SLOWER than the in-session twin (2.2 s vs
0.53 s): fixed per-bucket SMJ costs dominate a corpus whose signature
stage takes 0.3 s. SCALE.md asserts the indexed path wins once
signaturing dominates -- this tool MEASURES that claim on the same
interleaved inflation the other smoke families use (disjoint shingle
sets, so both paths pay signature/probe throughput, not pair explosion).

Per multiplier it times:
  - in_session: the full minhash_pairs registry query (signature +
    banded self-join + verify);
  - index_build: one-time bucketed band-key table write (the at-ingest
    cost a deployment amortizes over every later run);
  - indexed_probe: minhash_pairs_indexed with the index already present
    (bucketed self-join + verify only -- the steady-state cost).

Usage: python tools/indexed_crossover_bench.py [mult ...]   (default 10 20)
Prints one JSON line per multiplier; results recorded in SCALE.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from sentiment_analysis_data_pipeline_spark import queries as Q
from sentiment_analysis_data_pipeline_spark.session import get_spark


def inflate_documents(spark, mult: int) -> str:
    """sf0.1 documents x mult with per-copy token interleaving (same
    construction as tools/scale_smoke.py: copies' shingle sets are
    disjoint, so this measures throughput scaling, not pair explosion)."""
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    out = tempfile.mkdtemp(prefix=f"crossover-{mult}x-")
    (
        base.select(
            "doc_id",
            F.explode(F.expr(f"sequence(0, {mult - 1})")).alias("copy"),
            "text",
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
        .write.mode("overwrite")
        .parquet(f"{out}/documents.parquet")
    )
    return out


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [10, 20]
    spark = get_spark("indexed-crossover")
    qs = Q.spark_queries()
    for mult in mults:
        out = inflate_documents(spark, mult)
        try:
            t0 = time.perf_counter()
            n_mem = qs["minhash_pairs"](spark, out).count()
            t_mem = round(time.perf_counter() - t0, 2)

            t0 = time.perf_counter()
            table = Q._ensure_minhash_full_index(spark, out)
            t_build = round(time.perf_counter() - t0, 2)

            t0 = time.perf_counter()
            n_idx = qs["minhash_pairs_indexed"](spark, out).count()
            t_probe = round(time.perf_counter() - t0, 2)

            assert n_mem == n_idx, f"paths diverged: {n_mem} vs {n_idx}"
            print(
                json.dumps(
                    {
                        "multiplier": mult,
                        "pairs": n_mem,
                        "in_session_sec": t_mem,
                        "index_build_sec": t_build,
                        "indexed_probe_sec": t_probe,
                    }
                ),
                flush=True,
            )
            spark.sql(f"DROP TABLE IF EXISTS {table}")
        finally:
            shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
