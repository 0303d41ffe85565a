"""Salted-join integration probe at REAL skew (round-8 verdict item 5).

Composes the two halves that already exist separately -- key_gini (the
distribution-shape audit that tells you a key needs mitigation) and
operators/skew.salted_join (the mitigation) -- under an actually skewed
key, and records the evidence SCALE.md needs: wall-clock and the hot
partition's row concentration (the local[32] proxy for max task time --
the UI is disabled in this rig, and a join task's time is proportional to
its partition's rows), plain vs salted.

Three arms:
  aqe_skew   -- plain join, AQE skew-join ON (the first line of defense)
  plain      -- plain join, AQE skew-join OFF (the raw problem: every row
                of the hot key lands in ONE SortMergeJoin partition)
  salted     -- salted_join(n_salts), AQE skew-join OFF (the explicit
                fallback for shapes AQE cannot split)

The decision to salt is DRIVEN BY key_gini's output, exactly as the
operator docs promise: the probe computes the gini block over the
synthetic fact and salts only when max_rows/p50_rows exceeds SKEW_RATIO.

Usage: python tools/skew_salt_probe.py [n_rows] [hot_share] [n_salts]
Emits one JSON line; run alone (bench-isolation rule).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from sentiment_analysis_data_pipeline_spark.functions import dialect as D  # noqa: E402
from sentiment_analysis_data_pipeline_spark.operators.skew import salted_join  # noqa: E402
from sentiment_analysis_data_pipeline_spark.queries import _gini_block  # noqa: E402
from sentiment_analysis_data_pipeline_spark.session import get_spark  # noqa: E402

SKEW_RATIO = 100  # salt when max_rows / p50_rows exceeds this


def synth(spark, n_rows: int, hot_share: float, n_keys: int = 2000):
    """Fact skewed on `k` (one hot key = hot_share of all rows, remainder
    uniform over n_keys cold keys) + a dimension too wide per-key to trust
    to broadcast semantics in the probe (broadcast is force-disabled so
    the join exercises the shuffle path salting exists for)."""
    n_hot = int(n_rows * hot_share)
    hot = spark.range(n_hot).select(
        F.lit("hot").alias("k"), F.col("id").alias("v")
    )
    cold = spark.range(n_rows - n_hot).select(
        F.concat(F.lit("c"), (F.col("id") % n_keys).cast("string")).alias("k"),
        F.col("id").alias("v"),
    )
    fact = hot.unionByName(cold).repartition(32)
    dim = (
        spark.range(n_keys)
        .select(F.concat(F.lit("c"), F.col("id").cast("string")).alias("k"))
        .union(spark.range(1).select(F.lit("hot").alias("k")))
        .withColumn("w", F.xxhash64("k").cast("double"))
    )
    return fact, dim


def measure(df: DataFrame) -> dict:
    # The timed pass does REAL per-row work inside the join task (a hash
    # fold over the joined columns, all JVM codegen): with a bare count()
    # the probe-side cost of even a 20M-row hot partition is dwarfed by
    # the balanced shuffle write, and wall-clock shows nothing -- but at
    # production scale the hot task's sort/spill and the downstream
    # operators ARE the cost, and this models them honestly.
    t0 = time.perf_counter()
    folded = df.agg(
        F.sum(F.length(F.sha2(F.concat_ws(",", "k", "v", "w"), 256))).alias("h"),
        F.count("*").alias("n"),
    ).collect()[0]
    n = folded["n"]
    wall = time.perf_counter() - t0
    # hot-partition concentration: rows per output partition of the SAME
    # plan -- the join task processing the hot key's partition does
    # proportionally that much of the stage's work
    parts = (
        df.groupBy(F.spark_partition_id().alias("p"))
        .count()
        .agg(
            F.max("count").alias("mx"),
            F.expr("percentile(count, 0.5)").alias("md"),
            F.count("*").alias("np"),
        )
        .collect()[0]
    )
    return {
        "rows": n,
        "wall_sec": round(wall, 2),
        "max_part_rows": int(parts["mx"]),
        "median_part_rows": int(parts["md"]),
        "n_parts": int(parts["np"]),
    }


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    hot_share = float(sys.argv[2]) if len(sys.argv) > 2 else 0.25
    n_salts = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    spark = get_spark("skew-salt-probe")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    fact, dim = synth(spark, n_rows, hot_share)
    fact.localCheckpoint(eager=True).createOrReplaceTempView("skew_fact")
    dim.localCheckpoint(eager=True).createOrReplaceTempView("skew_dim")
    fact_v = spark.table("skew_fact")
    dim_v = spark.table("skew_dim")

    # 1. the decision input: key_gini's shape audit over the fact
    g = spark.sql(_gini_block(D.SPARK, "fact.k", "skew_fact", "k")).collect()[0]
    gini_row = {
        "gini": round(g["gini"], 4),
        "p50_rows": g["p50_rows"],
        "p99_rows": g["p99_rows"],
        "max_rows": g["max_rows"],
    }
    should_salt = g["max_rows"] / max(g["p50_rows"], 1) > SKEW_RATIO

    out = {"n_rows": n_rows, "hot_share": hot_share, "n_salts": n_salts,
           "key_gini": gini_row, "should_salt": bool(should_salt)}

    # 2. plain join, AQE skew handling ON (defense line 1)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    out["aqe_skew"] = measure(fact_v.join(dim_v, "k", "inner"))

    # 3. plain join, skew handling OFF (the raw problem)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    out["plain"] = measure(fact_v.join(dim_v, "k", "inner"))

    # 4. salted join (the explicit mitigation), same conf
    if should_salt:
        out["salted"] = measure(salted_join(fact_v, dim_v, "k", n_salts=n_salts))
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    assert out["plain"]["rows"] == out["aqe_skew"]["rows"]
    if "salted" in out:
        assert out["salted"]["rows"] == out["plain"]["rows"], "salting changed rows!"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
