"""Small-file compaction: row-exact rewrite into ~target-sized files with an
atomic directory swap."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

from sentiment_analysis_data_pipeline_spark.sources.maintenance import (
    compact_parquet,
    dir_stats,
)


def test_compaction_preserves_rows_and_cuts_files(spark):
    root = Path(tempfile.mkdtemp(prefix="compact-"))
    tbl = str(root / "t")
    try:
        # 32 tiny files (one per partition)
        spark.range(0, 10_000).repartition(32).write.parquet(tbl)
        n0, _ = dir_stats(tbl)
        assert n0 == 32
        before = sorted(r["id"] for r in spark.read.parquet(tbl).collect())

        n_before, n_after = compact_parquet(spark, tbl, target_bytes=1 << 30)
        assert (n_before, n_after) == (32, 1)
        after = sorted(r["id"] for r in spark.read.parquet(tbl).collect())
        assert after == before

        # already compact -> no-op
        assert compact_parquet(spark, tbl, target_bytes=1 << 30) == (1, 1)
    finally:
        shutil.rmtree(root, ignore_errors=True)
