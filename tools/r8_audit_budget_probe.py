"""Round-8 probe: the exact-audit family (knn_batch, dim_truncation_recall)
at 10x embeddings volume UNDER the enforced KNN_QUERY_BUDGET.

Round 7 measured dim_truncation_recall at 62.9 s on 10x embeddings because
the modulo-sampled query set grew with the corpus (pair volume 100x). With
the budget the query panel is fixed at KNN_QUERY_BUDGET, so pair volume --
and wall time -- must scale ~linearly with the corpus. The probe prints 1x
and 10x wall times; done-criterion is 10x/1x within ~2x of the corpus ratio
per unit (i.e. 10x time <= ~20x of 1x, comfortably; in practice ~10x).

Usage: python tools/r8_audit_budget_probe.py [multiplier=10]
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
    spark = get_spark("r8-audit-probe")
    base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    n_base = base.count()
    # inflate: copies get fresh vec_ids ABOVE the original range so the
    # budget-selected query panel (vec_id < MOD*BUDGET) stays the SAME
    # 40-query panel -- exactly the production shape: corpus grows, the
    # calibration panel doesn't
    inflated = base.select(
        "vec_id",
        F.explode(F.expr(f"sequence(0, {mult - 1})")).alias("copy"),
        "label",
        "embedding",
    ).select(
        (F.col("vec_id") + F.col("copy") * F.lit(n_base)).alias("vec_id"),
        "label",
        F.expr(
            "transform(embedding, (x, i) -> cast(x + copy * 0.001 * (i + 1) as float))"
        ).alias("embedding"),
    )
    out = tempfile.mkdtemp(prefix="r8-audit-probe-")
    inflated.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")

    from sentiment_analysis_data_pipeline_spark.queries import spark_queries

    qs = spark_queries()
    for name in ("knn_batch", "dim_truncation_recall"):
        res = {}
        for tag, sf_dir in (("1x", "/root/testdata/sf0.1"), (f"{mult}x", out)):
            qs[name](spark, sf_dir).count()  # warm (codegen, listing)
            t0 = time.perf_counter()
            rows = qs[name](spark, sf_dir).count()
            res[tag] = {"sec": round(time.perf_counter() - t0, 1), "rows": rows}
        res["ratio"] = round(res[f"{mult}x"]["sec"] / max(res["1x"]["sec"], 1e-9), 1)
        print(json.dumps({name: res}), flush=True)


if __name__ == "__main__":
    main()
