"""10x/40x probes for the round-9 WAVE-5 statistical operators.

Inflation model (r9w3 lineage): each copy remaps its entity keys into a
fresh key space -- documents get new doc_ids, orders new o_orderkeys,
events new event_ids AND new user_ids. Remapping user_id is the honest
corpus-growth model for the events stream: growth adds USERS on the same
calendar, so the daily relations (acf_daily, runs_test) stay
calendar-BOUNDED and per-user activity stays constant; naive duplication
would instead multiply per-user event counts. The calendar does not
inflate -- that is the point: these operators' post-scan relations
(monthly pairs, daily series, n_chars histogram, 2xB moment grids) are
all domain-bounded, so the expected shape is one linear scan + constant
tails.

Expected shapes: theil_sen_trend -- fact scan linear, pair self-join on
the constant monthly relation; welch_ttest / permutation_test -- one
doc scan into 2- / 2xB-group moment aggs; decision_stump -- doc scan
into the bounded n_chars histogram + one window; acf_daily / runs_test
-- event scan into the bounded daily relation.

Usage: python tools/r9w5_scale_probe.py [multiplier=10] [name ...]
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
    "theil_sen_trend",
    "welch_ttest",
    "acf_daily",
    "decision_stump",
    "permutation_test",
    "runs_test",
    # wave 6 (same inflation model: docs/events remapped-key growth)
    "log_odds_terms",
    "jackknife_ratio",
    "kendall_tau",
    "binseg_changepoint",
    "mcnemar_test",
    "dow_seasonality",
    # wave 7 (lineitem inflates with remapped orderkeys; suppliers stay the
    # dim -- supply GROWTH per supplier, shares unchanged, the honest HHI
    # scale model)
    "hhi_concentration",
    "sprt_ab",
    "seasonal_backtest",
    "winsorized_mean",
    "cuped_adjustment",
    # wave 8 (events-driven experimentation/attribution ops)
    "srm_check",
    "mde_power",
    "shapley_attribution",
    "mad_anomalies",
    "retention_decay_fit",
]


def _inflate(df, mult: int):
    # repartition BEFORE write: the explode collapses into few tasks and a
    # single output file otherwise, and a 1-file table single-threads every
    # downstream scan -- a fidelity bug, not a finding (a 100 TB table is
    # never one file). 64 files ~ the local session's 2x core count.
    return df.select(
        *df.columns, F.explode(F.expr(f"sequence(0, {mult - 1})")).alias("copy")
    ).repartition(64)


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("r9w5-scale-probe")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out = tempfile.mkdtemp(prefix="r9w5-probe-")
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

    od = spark.read.parquet(f"{src}/orders.parquet")
    max_okey = od.agg(F.max("o_orderkey")).collect()[0][0] + 1
    (
        _inflate(od, mult)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("copy") * F.lit(max_okey))
        .drop("copy")
        .write.mode("overwrite").parquet(f"{out}/orders.parquet")
    )

    ev = spark.read.parquet(f"{src}/events.parquet")
    max_ek = ev.agg(F.max("event_id")).collect()[0][0] + 1
    max_uk = ev.agg(F.max("user_id")).collect()[0][0] + 1
    (
        _inflate(ev, mult)
        .withColumn("event_id", F.col("event_id") + F.col("copy") * F.lit(max_ek))
        .withColumn("user_id", F.col("user_id") + F.col("copy") * F.lit(max_uk))
        .drop("copy")
        .write.mode("overwrite").parquet(f"{out}/events.parquet")
    )

    li = spark.read.parquet(f"{src}/lineitem.parquet")
    max_lok = li.agg(F.max("l_orderkey")).collect()[0][0] + 1
    (
        _inflate(li, mult)
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("copy") * F.lit(max_lok))
        .drop("copy")
        .write.mode("overwrite").parquet(f"{out}/lineitem.parquet")
    )

    # dims ride along un-inflated (customer joins orders on the original
    # custkey range in every copy -- fan-out stays 1:1 per order; supplier
    # and part stay fixed so lineitem growth means MORE VOLUME PER
    # SUPPLIER/PART -- the honest demand-growth model trending_terms needs)
    for dim in ("customer", "nation", "supplier", "part", "region"):
        spark.read.parquet(f"{src}/{dim}.parquet").write.mode("overwrite").parquet(
            f"{out}/{dim}.parquet"
        )

    from sentiment_analysis_data_pipeline_spark.queries import spark_queries

    qs = spark_queries()
    names = sys.argv[2:] or NAMES
    for name in names:
        res = {}
        for tag, sf_dir in (("1x", src), (f"{mult}x", out)):
            # collect(), NOT count(): on a 1-row aggregate, count() lets
            # Catalyst prune every output column and with them the whole
            # expensive scan (mcnemar measured 1.0 s at 40x under count()
            # vs ~9 s for the real computation -- a fake pass). Every
            # wave-5/6 output is <= 25 rows, so collect() is free.
            len(qs[name](spark, sf_dir).collect())  # warm
            t0 = time.perf_counter()
            rows = len(qs[name](spark, sf_dir).collect())
            res[tag] = {"sec": round(time.perf_counter() - t0, 1), "rows": rows}
        res["ratio"] = round(res[f"{mult}x"]["sec"] / max(res["1x"]["sec"], 1e-9), 1)
        print(json.dumps({name: res}), flush=True)


if __name__ == "__main__":
    main()
