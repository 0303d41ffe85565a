"""10x/40x probes for the round-9 operators: inflate documents/events/
lineitem and time each new query at 1x vs Nx. Expected shapes: LPA step and
dataset card are doc/edge-linear; attribution is events-linear (per-user
join fan-out bounded by per-user activity -- user ids are remapped per copy
so activity per user is constant); packing curve is one tokenize pass;
range bounds is three scans + a 1-row combine.

Usage: python tools/r9_scale_probe.py [multiplier=10]
"""
from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from sentiment_analysis_data_pipeline_spark.session import get_spark


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("r9-scale-probe")
    out = tempfile.mkdtemp(prefix="r9-probe-")

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    (
        docs.select(
            "doc_id", F.explode(F.expr(f"sequence(0, {mult - 1})")).alias("copy"),
            "text", "lang", "source",
        )
        .select(
            (F.col("doc_id") * mult + F.col("copy")).alias("doc_id"),
            "text", "lang", "source",
            F.length(F.coalesce("text", F.lit(""))).alias("n_chars"),
        )
        .write.mode("overwrite").parquet(f"{out}/documents.parquet")
    )
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    n_users = 1500
    from pyspark.sql.types import LongType

    if isinstance(ev.schema["ts"].dataType, LongType):  # ns-as-long encoding
        shifted = (F.col("ts") + F.col("copy") * F.lit(61_000_000_000_000)).alias("ts")
    else:  # TIMESTAMP/_NTZ encoding: shift each copy ~17h so event times differ
        shifted = F.expr("timestampadd(SECOND, copy * 61000, ts)").alias("ts")
    (
        ev.select(
            "event_id", F.explode(F.expr(f"sequence(0, {mult - 1})")).alias("copy"),
            "ts", "user_id", "event_type", "value", "props",
        )
        .select(
            (F.col("event_id") * mult + F.col("copy")).alias("event_id"),
            shifted,
            (F.col("user_id") + F.col("copy") * F.lit(n_users)).alias("user_id"),
            "event_type", "value", "props",
        )
        .write.mode("overwrite").parquet(f"{out}/events.parquet")
    )
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    n_base = emb.count()
    (
        emb.select(
            "vec_id", F.explode(F.expr(f"sequence(0, {mult - 1})")).alias("copy"),
            "label", "embedding",
        )
        .select(
            (F.col("vec_id") + F.col("copy") * F.lit(n_base)).alias("vec_id"),
            "label",
            F.expr(
                "transform(embedding, (x, i) -> cast(x + copy * 0.001 * (i + 1) as float))"
            ).alias("embedding"),
        )
        .write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    )
    li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    li_cols = li.columns
    (
        li.select(*li_cols, F.explode(F.expr(f"sequence(0, {mult - 1})")).alias("copy"))
        .drop("copy")
        .write.mode("overwrite").parquet(f"{out}/lineitem.parquet")
    )
    # orders inflates (fact side of revenue_rollup); dims copy unchanged
    od = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
    (
        od.select(*od.columns, F.explode(F.expr(f"sequence(0, {mult - 1})")).alias("copy"))
        .drop("copy")
        .write.mode("overwrite").parquet(f"{out}/orders.parquet")
    )
    for dim in ("customer", "nation", "region"):
        spark.read.parquet(f"/root/testdata/sf0.1/{dim}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{dim}.parquet")

    from sentiment_analysis_data_pipeline_spark.queries import spark_queries

    qs = spark_queries()
    names = sys.argv[2:] or [
        "label_propagation_step", "attribution_touch",
        "packing_efficiency_curve", "range_partition_bounds", "dataset_card",
        "ngram_novelty", "cosine_threshold_sweep", "graph_modularity",
    ]
    for name in names:
        res = {}
        for tag, sf_dir in (("1x", "/root/testdata/sf0.1"), (f"{mult}x", out)):
            qs[name](spark, sf_dir).count()  # warm
            t0 = time.perf_counter()
            rows = qs[name](spark, sf_dir).count()
            res[tag] = {"sec": round(time.perf_counter() - t0, 1), "rows": rows}
        res["ratio"] = round(res[f"{mult}x"]["sec"] / max(res["1x"]["sec"], 1e-9), 1)
        print(json.dumps({name: res}), flush=True)

    # drop the snapshot-stamped index tables built for the throwaway
    # inflated corpus (keyed to the tmp dir's basename) -- same hygiene as
    # degenerate_probe
    from sentiment_analysis_data_pipeline_spark.sources.tables import (
        drop_table_with_files,
    )

    tag = "".join(c if c.isalnum() else "_" for c in out.rstrip("/").rsplit("/", 1)[-1])
    for t in spark.catalog.listTables():
        if t.name.endswith(tag.lower()):
            drop_table_with_files(spark, t.name)


if __name__ == "__main__":
    main()
