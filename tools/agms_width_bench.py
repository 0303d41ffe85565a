"""AGMS join-size estimator: relative error vs sketch width, measured.

The registry query (join_size_sketch) runs width=512 at depth 4; this tool
answers 'which width should a deployment budget' by rebuilding the
lineitem x orders sketches at several widths and reporting each width's
per-depth estimates, served (lower-median) estimate, and relative error
against the exact join size. Theory says stddev ~ ||a||_2 ||b||_2 /
sqrt(width) -- i.e. halving error costs 4x cells -- and the measurement
pins where the curve flattens for this corpus class.

Usage: python tools/agms_width_bench.py [sf_dir] [width ...]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from sentiment_analysis_data_pipeline_spark.session import get_spark  # noqa: E402
from sentiment_analysis_data_pipeline_spark import queries as Q  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    widths = [int(w) for w in sys.argv[2:]] or [64, 128, 512, 2048, 8192]
    spark = get_spark("agms-width-bench")
    Q._view(spark, sf, "lineitem", "orders")
    out = []
    orig = Q.CM_WIDTH
    try:
        for w in widths:
            Q.CM_WIDTH = w  # the SQL builder reads the module constant
            rows = spark.sql(Q._join_size_sketch_sql(Q.D.SPARK)).collect()
            exact = rows[0]["exact_join_size"]
            served = rows[0]["agms_estimate"]
            out.append(
                {
                    "width": w,
                    "depth_estimates": [r["depth_estimate"] for r in rows],
                    "served": served,
                    "exact": exact,
                    "rel_error": (served - exact) / exact,
                }
            )
            print(json.dumps(out[-1]))
    finally:
        Q.CM_WIDTH = orig
    print(json.dumps({"sf": sf, "sweep": out}))


if __name__ == "__main__":
    main()
