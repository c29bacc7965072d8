"""Small-file compaction for parquet landing zones.

Streaming sinks and incremental landings (foreachBatch partial stores,
the MinHash index's per-delta partitions, the K1 append path —
reference parallel: the row-at-a-time inserts of
dag_collection_data_from_bp.py:61-78 are the ancestor of exactly this
sprawl) produce files sized by ARRIVAL, not by what a scan wants. At
100 TB the cost is concrete: a scan schedules one task per small file
(driver listing + task-launch overhead dominate), and the
open-footer-read-close cycle per file swamps sequential I/O. Compaction
rewrites a directory's data into ~target-sized files and swaps the
result in place.

Design:

- **Rewrite, verify, THEN swap.** The compacted copy lands in a staging
  dir; its row count must equal the source's before any metadata
  changes. The swap is the repo's standard fenced rename pair (target
  -> trash, staging -> target, delete trash) — the same
  shrink-the-window protocol as the foreachBatch MERGE sink
  (streaming/events.py), with rollback if the publish rename fails.
- **WriterLease fence** (operators/lease.py): compaction is a
  read-rewrite-publish, i.e. the lost-update shape — an appender
  landing a file between our read and our swap would be erased by the
  swap. Cooperating writers take the lease; the receipt records what
  was compacted so an auditor can reconcile.
- **Sizing from the store, not a guess**: output file count =
  ceil(total_bytes / target_bytes), clamped to >= 1. A directory
  already at or below that count is a NO-OP (receipt says so) — the
  operator is safe to run on a schedule.
- **Scope: one leaf directory.** For a hive-partitioned table, run
  per-partition (the partition dir IS the compaction unit — compacting
  across partitions would destroy the layout and the pruning it buys).

All FS access goes through the Hadoop FileSystem API so the path may be
hdfs:// or s3a://; nothing here assumes a local filesystem.
"""

from __future__ import annotations

import math
import uuid

from pyspark.sql import SparkSession

from .lease import WriterLease

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def _list_parquet_files(fs, HPath, path: str):
    """Non-recursive (leaf-dir) parquet data files: (names, total_bytes)."""
    files = []
    total = 0
    for st in fs.listStatus(HPath(path)):
        name = st.getPath().getName()
        if st.isFile() and name.endswith(".parquet"):
            files.append(name)
            total += st.getLen()
    return files, total


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
) -> dict:
    """Compact one parquet leaf directory to ~target-sized files.

    Returns a receipt dict: {compacted, files_before, files_after,
    bytes_before, rows}. Raises if the rewritten copy's row count
    differs from the source (the staging dir is removed, the target
    untouched).
    """
    jvm = spark._jvm
    HPath = jvm.org.apache.hadoop.fs.Path
    tgt = HPath(path)
    fs = tgt.getFileSystem(spark._jsc.hadoopConfiguration())

    with WriterLease(spark, path):
        files, total = _list_parquet_files(fs, HPath, path)
        n_out = max(1, math.ceil(total / float(target_bytes)))
        if len(files) <= n_out:
            return {
                "compacted": False,
                "files_before": len(files),
                "files_after": len(files),
                "bytes_before": total,
                "rows": None,
            }
        src = spark.read.parquet(path)
        rows_before = src.count()
        staging = f"{path.rstrip('/')}__compact_{uuid.uuid4().hex[:8]}"
        src.repartition(n_out).write.mode("overwrite").parquet(staging)
        rows_after = spark.read.parquet(staging).count()
        if rows_after != rows_before:
            fs.delete(HPath(staging), True)
            raise IOError(
                f"compaction row mismatch on {path}: "
                f"{rows_before} -> {rows_after}; target untouched"
            )
        trash = HPath(f"{path.rstrip('/')}__old_{uuid.uuid4().hex[:8]}")
        if not fs.rename(tgt, trash):
            fs.delete(HPath(staging), True)
            raise IOError(f"could not move aside {path}")
        if not fs.rename(HPath(staging), tgt):
            fs.rename(trash, tgt)  # roll back: target never left absent
            raise IOError(f"could not publish compacted dir to {path}")
        fs.delete(trash, True)
        files_after, _ = _list_parquet_files(fs, HPath, path)
        return {
            "compacted": True,
            "files_before": len(files),
            "files_after": len(files_after),
            "bytes_before": total,
            "rows": rows_before,
        }
