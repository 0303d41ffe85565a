"""10x probes for the round-11 wave-15/16 operators.

Inflation model (r9w5 lineage): each copy remaps its entity keys into a
fresh key space -- documents get new doc_ids (texts UNCHANGED, so the
near-dup graph inflates with realistic duplicate clusters), events new
event_ids AND user_ids (growth adds users on the same calendar), orders
new o_orderkeys (customer/nation dims ride along un-inflated -- volume
growth per market), embeddings new vec_ids (same vectors -- population
growth at fixed geometry).

Expected shapes:
- chao1 / sttr / wasserstein / loo / term_dispersion / burrows /
  vocab_coverage: one linear token-explode scan into bounded aggregates
  (vocab-, source-, bin-, or grid-sized tails) -> ~linear sec/10x.
- cem_att / fano_burstiness: events collapse to users/(type,hour) map-side
  -> linear scan, constant tail.
- rbo_rank_stability: orders collapse to (year, nation); rank windows on a
  25-row relation -> linear scan only.
- embedding_isotropy: one explode pass into 64 rows -> linear.
- graph_assortativity: candidate generation is the banded simhash
  equi-join; with IDENTICAL copy texts the duplicate clusters are 10x
  deeper, so the EDGE RELATION grows ~quadratically inside clusters
  (the documented wminhash_pairs output-driven class) -- report edge
  count with the timing so ratio >> 10 is attributable to output, not
  plan regression.

Usage: python tools/r11_scale_probe.py [multiplier=10] [name ...]
Writes nothing to the repo; uses /tmp for the inflated tables.
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
    "chao1_richness",
    "sttr_segments",
    "wasserstein_sources",
    "loo_source_influence",
    "cem_att",
    "rbo_rank_stability",
    "term_dispersion",
    "burrows_delta",
    "embedding_isotropy",
    "fano_burstiness",
    "vocab_coverage",
    "graph_assortativity",
    # wave 17 (events-driven monitors + doc-gate panels)
    "group_sequential",
    "positivity_check",
    "blocklist_rate",
    "quality_signal_corr",
    "tail_trend",
]


def _inflate(df, mult: int):
    # repartition BEFORE write (r9w5): a 1-file inflated table would
    # single-thread every downstream scan -- a fidelity bug, not a finding.
    return df.select(
        *df.columns, F.explode(F.expr(f"sequence(0, {mult - 1})")).alias("copy")
    ).repartition(64)


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("r11-scale-probe")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out = tempfile.mkdtemp(prefix="r11-probe-")
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

    od = spark.read.parquet(f"{src}/orders.parquet")
    max_okey = od.agg(F.max("o_orderkey")).collect()[0][0] + 1
    (
        _inflate(od, mult)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("copy") * F.lit(max_okey))
        .drop("copy")
        .write.mode("overwrite").parquet(f"{out}/orders.parquet")
    )

    # lineitem rides orders' key remap (r11: the basket-pair family --
    # copurchase/association_rules/kcore -- joins on l_orderkey): each copy
    # is a fresh set of orders with the SAME basket compositions, so pair
    # counts inflate linearly, never quadratically (parts stay un-remapped).
    li = spark.read.parquet(f"{src}/lineitem.parquet")
    (
        _inflate(li, mult)
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("copy") * F.lit(max_okey))
        .drop("copy")
        .write.mode("overwrite").parquet(f"{out}/lineitem.parquet")
    )

    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    max_vk = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    (
        _inflate(emb, mult)
        .withColumn("vec_id", F.col("vec_id") + F.col("copy") * F.lit(max_vk))
        .drop("copy")
        .write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    )

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
            # collect(), NOT count() (r9w5: count() lets Catalyst prune the
            # whole expensive scan on 1-row aggregates -- a fake pass).
            len(qs[name](spark, sf_dir).collect())  # warm
            t0 = time.perf_counter()
            rows = qs[name](spark, sf_dir).collect()
            res[tag] = {"sec": round(time.perf_counter() - t0, 1), "rows": len(rows)}
            if name == "graph_assortativity":
                res[tag]["edges"] = rows[0]["n_edges"]
        res["ratio"] = round(res[f"{mult}x"]["sec"] / max(res["1x"]["sec"], 1e-9), 1)
        print(json.dumps({name: res}), flush=True)


if __name__ == "__main__":
    main()
