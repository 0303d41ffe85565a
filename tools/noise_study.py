"""Contention study for the recurring sub-second `unstable` flags.

unigram_surprisal, classifier_score, and zonemap_audit have carried
sub-second spread flags across several rounds' benches with UNCHANGED
code. Hypothesis (the r4 minhash_pairs precedent): shared-session
interference -- accumulated checkpoint blocks, JIT/codegen pressure, and
page-cache churn from the ~160 queries that precede them -- not anything
in their plans. This tool measures each query two ways in one process:

  arm ISOLATED: a fresh SparkSession, one warm run, N timed samples;
  arm POLLUTED: the same fresh-session protocol, but after a heavy
      preamble (the three most allocation-heavy registry queries run
      back-to-back, checkpoints left in place) -- a compressed replica of
      the bench's session state at the point these queries run.

If ISOLATED spreads sit inside SPREAD_RATIO_BOUND and POLLUTED spreads
blow out, the flags are environmental and the bench annotation (not a
code change) is the close-out. Emits one JSON line.

Usage: python tools/noise_study.py [runs=12] [name ...]
"""

from __future__ import annotations

import json
import sys
import time
from statistics import median

sys.path.insert(0, "/root/repo")

from sentiment_analysis_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
TARGETS = ["unigram_surprisal", "classifier_score", "zonemap_audit"]
PREAMBLE = ["semantic_clusters", "curation_pipeline", "fleet_checksum"]
SPREAD_RATIO_BOUND = 1.5  # bench.py's stability guard


def _samples(spark, fn, runs: int) -> list[float]:
    fn(spark, SF_DIR).collect()  # warm: first-touch costs out of band
    out = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).collect()
        out.append(time.perf_counter() - t0)
    return out


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    names = sys.argv[2:] or TARGETS
    report: dict[str, dict] = {}

    from sentiment_analysis_data_pipeline_spark.queries import spark_queries

    for arm in ("isolated", "polluted"):
        spark = get_spark(f"noise-{arm}")
        qs = spark_queries()
        if arm == "polluted":
            for p in PREAMBLE:
                qs[p](spark, SF_DIR).collect()
        for name in names:
            s = _samples(spark, qs[name], runs)
            report.setdefault(name, {})[arm] = {
                "median": round(median(s), 3),
                "min": round(min(s), 3),
                "max": round(max(s), 3),
                "ratio": round(max(s) / max(min(s), 1e-9), 2),
                "flagged": max(s) / max(min(s), 1e-9) > SPREAD_RATIO_BOUND,
            }
        spark.stop()

    print(json.dumps({"runs": runs, "queries": report}))


if __name__ == "__main__":
    main()
