"""Table maintenance: small-file compaction.

The reference never needs this (MongoDB manages its own storage;
consumers/mongodb_consumer.py writes row-at-a-time), but any streaming
parquet sink accumulates one file per epoch per partition -- at a 5-minute
trigger (dags/sentiment_analysis_dag.py schedule analog) that is ~300
files/day/partition, and at 100 TB the NameNode/listing and scan-task
overhead of millions of tiny files dominates before a single byte is read.
Compaction is the standard maintenance pass: rewrite a table directory into
~target-sized files, preserving rows exactly.

Design:
- The file census is driver-side os.walk: this is a MAINTENANCE utility
  runner, listing is O(files) metadata work the planner does anyway, and no
  row data ever reaches the driver.
- The rewrite is one distributed job: scan -> coalesce(ceil(bytes/target))
  -> write to a staging dir, then an atomic-as-the-FS-allows directory
  swap. coalesce (not repartition): compaction must not pay a shuffle --
  partition-local concatenation is the point. The tradeoff (coalesce can
  skew output file sizes when input files skew) is acceptable for
  maintenance; pass `shuffle=True` for balanced output when it isn't.
- Readers racing the swap see either the old file set or the new one, not a
  mix, provided the FS renames directories atomically (true for POSIX/HDFS;
  object stores need a manifest/table format instead -- documented limit).
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession


def dir_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a parquet directory or single file."""
    if os.path.isfile(path):
        return 1, os.path.getsize(path)
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    shuffle: bool = False,
) -> tuple[int, int]:
    """Rewrite the parquet directory at `path` into ~target_bytes files.

    Returns (files_before, files_after). No-op (returns equal counts)
    when the directory already has <= the target file count.
    """
    staging = path.rstrip("/") + "._compact_staging"
    old = path.rstrip("/") + "._compact_old"
    # A leftover staging/old dir means a prior run crashed mid-swap; refuse
    # to proceed until it is inspected (the old dir may hold the only copy
    # of the table if the crash landed between the two renames).
    for leftover in (staging, old):
        if os.path.exists(leftover):
            raise RuntimeError(
                f"compact_parquet: leftover {leftover!r} from an interrupted "
                "run; inspect/restore it before compacting again"
            )
    n_before, total = dir_stats(path)
    n_target = max(1, math.ceil(total / target_bytes))
    if n_before <= n_target:
        return n_before, n_before
    df = spark.read.parquet(path)
    df = df.repartition(n_target) if shuffle else df.coalesce(n_target)
    df.write.mode("overwrite").parquet(staging)
    # Note: the table path is briefly absent between these two renames;
    # acceptable for a maintenance window, not for live readers on POSIX.
    os.rename(path, old)
    try:
        os.rename(staging, path)
    except OSError:
        os.rename(old, path)  # roll back; staging left for inspection
        raise
    shutil.rmtree(old, ignore_errors=True)
    n_after, _ = dir_stats(path)
    return n_before, n_after
