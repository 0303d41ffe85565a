"""10x/40x probes for the round-9 WAVE-3 operators.

Inflation model differs from r9_scale_probe on purpose: the wave-3 graph /
basket operators (kcore_step, association_rules) join lineitem on
l_orderkey, so naive row duplication would grow per-order baskets by the
multiplier and the pair fan-out QUADRATICALLY -- not how a corpus grows.
Here each copy remaps l_orderkey and l_partkey into its own key space
(new orders over new parts), so baskets stay bounded and the expected
shape is linear. customer and part -- dims elsewhere, FACTS for
sorted_neighborhood_pairs / pareto_frontier -- inflate with remapped keys
and copy-jittered balance/price cents (identical values across copies
would manufacture pathological tie runs).

Expected shapes: classifier_auc/calibration and audio_loudness are one
doc-linear scan (+ a bounded histogram window for auc); zonemap_audit is
one lineitem scan into a file-count-sized agg; ewma_revenue collapses to
a constant month relation after one scan; kcore/rules are basket-bounded
joins; SN pairs is a partitioned sort with fixed fan-out; pareto is a
partitioned window over 6 type groups.

Usage: python tools/r9w3_scale_probe.py [multiplier=10] [name ...]
"""
from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from sentiment_analysis_data_pipeline_spark.session import get_spark

NAMES = [
    "classifier_auc",
    "classifier_calibration",
    "audio_loudness",
    "zonemap_audit",
    "ewma_revenue",
    "kcore_step",
    "association_rules",
    "sorted_neighborhood_pairs",
    "pareto_frontier",
]


def _inflate(df, mult: int):
    return df.select(
        *df.columns, F.explode(F.expr(f"sequence(0, {mult - 1})")).alias("copy")
    )


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("r9w3-scale-probe")
    out = tempfile.mkdtemp(prefix="r9w3-probe-")
    src = "/root/testdata/sf0.1"

    docs = spark.read.parquet(f"{src}/documents.parquet")
    (
        _inflate(docs.select("doc_id", "text", "lang", "source", "n_chars"), mult)
        .select(
            (F.col("doc_id") * mult + F.col("copy")).alias("doc_id"),
            "text", "lang", "source", "n_chars",
        )
        .write.mode("overwrite").parquet(f"{out}/documents.parquet")
    )

    li = spark.read.parquet(f"{src}/lineitem.parquet")
    max_ok = li.agg(F.max("l_orderkey")).collect()[0][0] + 1
    max_pk = li.agg(F.max("l_partkey")).collect()[0][0] + 1
    (
        _inflate(li, mult)
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("copy") * F.lit(max_ok))
        .withColumn("l_partkey", F.col("l_partkey") + F.col("copy") * F.lit(max_pk))
        .drop("copy")
        .write.mode("overwrite").parquet(f"{out}/lineitem.parquet")
    )

    od = spark.read.parquet(f"{src}/orders.parquet")
    max_okey = od.agg(F.max("o_orderkey")).collect()[0][0] + 1
    (
        _inflate(od, mult)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("copy") * F.lit(max_okey))
        .drop("copy")
        .write.mode("overwrite").parquet(f"{out}/orders.parquet")
    )

    cu = spark.read.parquet(f"{src}/customer.parquet")
    max_ck = cu.agg(F.max("c_custkey")).collect()[0][0] + 1
    (
        _inflate(cu, mult)
        .withColumn("c_custkey", F.col("c_custkey") + F.col("copy") * F.lit(max_ck))
        .withColumn("c_acctbal", F.col("c_acctbal") + F.col("copy") * F.lit(0.01))
        .drop("copy")
        .write.mode("overwrite").parquet(f"{out}/customer.parquet")
    )

    pt = spark.read.parquet(f"{src}/part.parquet")
    max_p = pt.agg(F.max("p_partkey")).collect()[0][0] + 1
    (
        _inflate(pt, mult)
        .withColumn("p_partkey", F.col("p_partkey") + F.col("copy") * F.lit(max_p))
        .withColumn(
            "p_retailprice", F.col("p_retailprice") + F.col("copy") * F.lit(0.01)
        )
        .drop("copy")
        .write.mode("overwrite").parquet(f"{out}/part.parquet")
    )

    from sentiment_analysis_data_pipeline_spark.queries import spark_queries

    qs = spark_queries()
    names = sys.argv[2:] or NAMES
    for name in names:
        res = {}
        for tag, sf_dir in (("1x", src), (f"{mult}x", out)):
            qs[name](spark, sf_dir).count()  # warm
            t0 = time.perf_counter()
            rows = qs[name](spark, sf_dir).count()
            res[tag] = {"sec": round(time.perf_counter() - t0, 1), "rows": rows}
        res["ratio"] = round(res[f"{mult}x"]["sec"] / max(res["1x"]["sec"], 1e-9), 1)
        print(json.dumps({name: res}), flush=True)


if __name__ == "__main__":
    main()
