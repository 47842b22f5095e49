"""Sink maintenance: compaction for append-mode parquet directories.

Every micro-batch of the streaming loops (`incremental.py`'s corpus +
index appends, `pipeline.idempotent_append` targets) adds a small file
set; at production cadence a day of 1-minute batches is ~1,440 file
groups, and scan planning degrades long before the data does
(file-listing cost, per-file footer reads, undersized scan splits).

``compact_parquet`` rewrites a directory into size-targeted files and
swaps it in place. The swap is two renames (old -> .bak, new -> live)
— atomic per rename on a POSIX filesystem and HDFS, NOT atomic as a
pair, so run it from the maintenance window between stream triggers
(availableNow loops) or while the stream is stopped; a reader that
races the swap can see the path briefly absent. On object stores
(S3 & friends) rename is copy+delete — there, compact to a NEW path
and flip whatever pointer the deployment uses (table location, view)
instead. The content itself is safe at every step: the rewrite reads a
snapshot of the input files, and the original survives at ``.bak``
until the caller removes it.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession

DEFAULT_TARGET_MB = 128


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_mb: int = DEFAULT_TARGET_MB,
    keep_backup: bool = False,
) -> int:
    """Rewrite the parquet dir at ``path`` into ~``target_mb`` files.

    Returns the resulting file count. Row-level content is preserved
    exactly (a pure read -> repartition -> write); file count becomes
    ceil(bytes / target) instead of one-per-append."""
    n_files = math.ceil(max(_dir_bytes(path), 1) / (target_mb * 1024 * 1024))
    tmp, bak = f"{path}.compact_tmp", f"{path}.bak"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(bak, ignore_errors=True)
    spark.read.parquet(path).repartition(n_files).write.parquet(tmp)
    os.rename(path, bak)
    os.rename(tmp, path)
    if not keep_backup:
        shutil.rmtree(bak, ignore_errors=True)
    return n_files
