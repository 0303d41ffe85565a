"""Measured z-order pruning: write sf0.1 lineitem under the z-order and
linear layouts, then time identical selective scans against both. The
zorder_stats advisor SIMULATES file envelopes; this measures the real
parquet min/max pruning those envelopes drive.

Usage: python tools/zorder_bench.py [sf_dir] [n_files]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from statistics import median

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from sentiment_analysis_data_pipeline_spark.operators import zorder
from sentiment_analysis_data_pipeline_spark.session import get_spark


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark("zorder-bench")
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"
    )
    ext = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).collect()[0]
    px = (ext[0], ext[1])
    py = (ext[2], ext[3])
    # the middle-1/8 band of each dimension, in VALUE units
    xlo = px[0] + (px[1] - px[0]) * 7 // 16
    xhi = px[0] + (px[1] - px[0]) * 9 // 16
    ylo = py[0] + (py[1] - py[0]) * 7 // 16
    yhi = py[0] + (py[1] - py[0]) * 9 // 16

    base = tempfile.mkdtemp(prefix="zorder-bench-")
    zpath, lpath = f"{base}/zordered", f"{base}/linear"
    zorder.write_zorder(li, "l_partkey", "l_suppkey", zpath, n_files=n_files)
    (
        li.repartitionByRange(n_files, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite").parquet(lpath)
    )

    preds = {
        "x_band": (F.col("l_partkey") >= xlo) & (F.col("l_partkey") <= xhi),
        "y_band": (F.col("l_suppkey") >= ylo) & (F.col("l_suppkey") <= yhi),
        "xy_box": (F.col("l_partkey") >= xlo) & (F.col("l_partkey") <= xhi)
        & (F.col("l_suppkey") >= ylo) & (F.col("l_suppkey") <= yhi),
    }

    out: dict[str, dict] = {}
    for layout, path in (("zorder", zpath), ("linear", lpath)):
        env = zorder.file_envelopes(spark, path, "l_partkey", "l_suppkey").collect()
        for pname, pred in preds.items():
            if pname == "x_band":
                touched = sum(1 for r in env if not (r["x_max"] < xlo or r["x_min"] > xhi))
            elif pname == "y_band":
                touched = sum(1 for r in env if not (r["y_max"] < ylo or r["y_min"] > yhi))
            else:
                touched = sum(
                    1 for r in env
                    if not (r["x_max"] < xlo or r["x_min"] > xhi
                            or r["y_max"] < ylo or r["y_min"] > yhi)
                )
            df = spark.read.parquet(path).filter(pred)
            n = df.count()  # warm
            samples = []
            for _ in range(5):
                t0 = time.perf_counter()
                df.count()
                samples.append(time.perf_counter() - t0)
            out[f"{layout}.{pname}"] = {
                "sec": round(median(samples), 4),
                "rows": n,
                "files_touched": touched,
                "files_total": len(env),
            }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
