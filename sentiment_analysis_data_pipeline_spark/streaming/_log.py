"""Shared epoch-log plumbing for the streaming accumulators
(sketch/hll/hdr/reservoir): the replay-idempotence check and the
crash-safe compaction swap.

Round-8 ADVICE fixes:

- `log_has_epoch` replaces the accumulators' `try: read / except
  Exception: first-epoch` guard. That guard treated ANY read error as
  "log does not exist yet": a transient read failure (object-store
  flake) during a foreachBatch retry made the idempotence check silently
  pass and the partial was appended TWICE, double-counting the batch.
  The helper distinguishes path-absent (an FS existence check -- no
  exception at all) from real read errors, which now propagate so the
  epoch fails loudly and the retry re-checks.

- `compact_log` replaces the read-tmp-then-overwrite-live sequence. That
  rewrite deleted the live log before repopulating it: a crash in
  between lost the whole accumulator log (the tmp survived but recovery
  was manual). The helper stages the merged partial in a tmp dir and
  swaps it into place with two atomic renames (sources.tables
  .swap_directory -- the compact_bucketed protocol), so the live log is
  old-complete or new-complete at every instant.

Concurrency contract (unchanged, now stated once): compaction folds every
stamp to COMPACTED_STAMP, which defeats an IN-FLIGHT epoch's replay check,
and an append landing between the read and the swap is dropped by the
swap. Run compaction only in an ingest pause -- the same precondition
compact_bucketed documents for the band indexes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import _fs_for, swap_directory

# Stamp for compacted (merged) partials: never a real epoch id.
COMPACTED_STAMP = -1


def log_has_epoch(
    spark: SparkSession, log_path: str, schema: str, batch_id: int
) -> bool:
    """True iff `batch_id`'s partial is already in the epoch log. Absent
    log (first epoch) is an FS existence check, not a swallowed exception;
    any actual read error propagates so a foreachBatch retry cannot
    silently double-append."""
    fs, hpath = _fs_for(spark, log_path)
    if not fs.exists(hpath):
        return False
    return bool(
        spark.read.schema(schema)
        .parquet(log_path)
        .filter(F.col("batch_id") == batch_id)
        .take(1)
    )


def compact_log(spark: SparkSession, log_path: str, merged: DataFrame) -> None:
    """Fold the epoch log to the single merged partial `merged` (already
    stamped COMPACTED_STAMP by the caller), crash-safely: stage to a tmp
    dir, then atomic-rename swap into the live path."""
    tmp = log_path.rstrip("/") + "__compact_tmp"
    # writing to tmp fully materializes the merged read of the live log
    # BEFORE the live path changes; the swap then needs no second copy
    merged.write.mode("overwrite").parquet(tmp)
    swap_directory(spark, tmp, log_path.rstrip("/"))
