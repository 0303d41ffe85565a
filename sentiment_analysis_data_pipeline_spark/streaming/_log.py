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

Concurrency contract (round 9 -- now ENFORCED, not just documented):
compaction folds every stamp to COMPACTED_STAMP, which defeats an
IN-FLIGHT epoch's replay check, and an append landing between the read
and the swap is dropped by the swap. The "run compaction only in an
ingest pause" precondition is made mechanical by a pair of filesystem
flags (Dekker-style -- each side sets its own flag, then checks the
other's):

- an appender first checks `<log>__compacting` (raise if present), then
  creates `<log>__appending_<epoch>`, then RE-checks the compaction flag
  (raise + clean up if it appeared -- the compactor may not have seen our
  marker), then appends and removes its marker;
- `compact_log` creates `<log>__compacting` atomically (raise if one
  already exists), then refuses loudly if ANY `__appending_*` marker
  exists, so a mid-append epoch can never be silently dropped by the
  swap nor double-counted after the stamp fold.

Either interleaving therefore ends in a LOUD error on one side (the
foreachBatch retry re-runs the epoch later; compaction is a maintenance
call the operator re-issues), never a dropped or double-counted partial.
tests/test_streaming_accumulators.py interleaves the two paths and
asserts exactly that. Markers left by a crashed process are expired
after STALE_FLAG_SEC (appends and compactions are seconds-long).
"""

from __future__ import annotations

import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import _fs_for, swap_directory

# Stamp for compacted (merged) partials: never a real epoch id.
COMPACTED_STAMP = -1

# A __compacting / __appending_* flag older than this is a crash leftover
# (both operations complete in seconds), reclaimed instead of honored.
STALE_FLAG_SEC = 600.0


def _flag_path(log_path: str, suffix: str) -> str:
    return log_path.rstrip("/") + suffix


def _flag_exists(spark: SparkSession, flag: str) -> bool:
    """True iff the flag file exists AND is fresh; a stale flag is deleted
    (crash leftover) and reported absent."""
    fs, hpath = _fs_for(spark, flag)
    if not fs.exists(hpath):
        return False
    try:
        age = time.time() - fs.getFileStatus(hpath).getModificationTime() / 1000.0
    except Exception:
        return True  # raced with the owner's delete: treat as live
    if age > STALE_FLAG_SEC:
        fs.delete(hpath, False)
        return False
    return True


def _create_flag(spark: SparkSession, flag: str) -> bool:
    """Atomically create the flag file; False if it already exists (fresh).
    A stale leftover is reclaimed first."""
    _flag_exists(spark, flag)  # expire a stale flag so createNewFile can win
    fs, hpath = _fs_for(spark, flag)
    return bool(fs.createNewFile(hpath))


def _remove_flag(spark: SparkSession, flag: str) -> None:
    fs, hpath = _fs_for(spark, flag)
    if fs.exists(hpath):
        fs.delete(hpath, False)


def _appending_markers(spark: SparkSession, log_path: str) -> list[str]:
    """Fresh `__appending_*` markers beside the log (stale ones expired)."""
    parent = log_path.rstrip("/")
    prefix = parent.rsplit("/", 1)[-1] + "__appending_"
    fs, hdir = _fs_for(spark, parent.rsplit("/", 1)[0] or "/")
    if not fs.exists(hdir):
        return []
    out = []
    for st in fs.listStatus(hdir):
        name = st.getPath().getName()
        if name.startswith(prefix):
            full = parent.rsplit("/", 1)[0] + "/" + name
            if _flag_exists(spark, full):
                out.append(full)
    return out


class CompactionInProgress(RuntimeError):
    """An epoch append refused because a compaction holds the log."""


class IngestInFlight(RuntimeError):
    """A compaction refused because an epoch append is mid-write."""


def guarded_append(
    spark: SparkSession,
    log_path: str,
    schema: str,
    batch_id: int,
    partial: DataFrame,
) -> bool:
    """Append one epoch partial replay-idempotently UNDER the append/compact
    mutual-exclusion protocol (module docstring). Returns False when the
    epoch was already logged (idempotent replay), True when appended.
    Raises CompactionInProgress (loudly -- the foreachBatch retry re-runs
    the epoch) instead of ever racing a compaction swap."""
    compacting = _flag_path(log_path, "__compacting")
    if _flag_exists(spark, compacting):
        raise CompactionInProgress(
            f"epoch {batch_id}: compaction holds {log_path}; retry the batch"
        )
    marker = _flag_path(log_path, f"__appending_{batch_id}")
    if not _create_flag(spark, marker):
        # a concurrent retry of the SAME epoch is mid-append; the replay
        # check below would miss its in-flight rows -- fail to the retry
        raise CompactionInProgress(
            f"epoch {batch_id}: another append of this epoch is in flight"
        )
    try:
        # re-check AFTER our marker is visible: the compactor either sees
        # the marker and aborts, or we see its flag here and abort
        if _flag_exists(spark, compacting):
            raise CompactionInProgress(
                f"epoch {batch_id}: compaction started under us on {log_path}"
            )
        if log_has_epoch(spark, log_path, schema, batch_id):
            return False
        partial.write.mode("append").parquet(log_path)
        return True
    finally:
        _remove_flag(spark, marker)


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


def compact_log(
    spark: SparkSession,
    log_path: str,
    merged_builder: "Callable[[], DataFrame]",
) -> None:
    """Fold the epoch log to the single merged partial built by
    `merged_builder` (already stamped COMPACTED_STAMP by the caller),
    crash-safely: stage to a tmp dir, then atomic-rename swap into the
    live path.

    Mutual exclusion (round 9, module docstring): takes the
    `__compacting` flag first and refuses with IngestInFlight if any
    fresh `__appending_*` marker exists -- the documented ingest-pause
    precondition is now a mechanical check, not a comment.

    `merged_builder` is a THUNK, not a DataFrame (round 10 -- the
    processingTime soak caught silent data loss with the DataFrame form):
    `spark.read.parquet(log)` pins its FILE LISTING when the DataFrame is
    constructed, so a merged relation built before this function takes
    the `__compacting` flag reads a stale snapshot -- an epoch that lands
    COMPLETELY between that listing and the flag (all its guarded_append
    checks legitimately pass: no flag existed yet) is then erased by the
    swap with no error on either side. Building the read inside the
    critical section closes the window: any append after the flag exists
    raises CompactionInProgress on the appender side, and everything
    before it is in the listing."""
    compacting = _flag_path(log_path, "__compacting")
    if not _create_flag(spark, compacting):
        raise IngestInFlight(f"another compaction already holds {log_path}")
    try:
        markers = _appending_markers(spark, log_path)
        if markers:
            raise IngestInFlight(
                f"compaction refused: epoch append(s) in flight on {log_path}:"
                f" {[m.rsplit('/', 1)[-1] for m in markers]}"
            )
        tmp = log_path.rstrip("/") + "__compact_tmp"
        # the listing AND the materialization both happen inside the
        # critical section: writing to tmp fully materializes the merged
        # read of the live log BEFORE the live path changes; the swap then
        # needs no second copy
        merged_builder().write.mode("overwrite").parquet(tmp)
        swap_directory(spark, tmp, log_path.rstrip("/"))
    finally:
        _remove_flag(spark, compacting)
