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
instead; paths that are not local directories are rejected up front.
The content itself is safe at every step: the rewrite reads a snapshot
of the input files, and the original survives at ``.bak`` until the
new tree is live. Crash recovery: if a previous run died between the
two renames (``.bak`` present, live path missing) the entry check
restores the backup before doing anything else — the stale-artifact
cleanup never deletes the only surviving copy.

``distinct_compact_parquet`` is the content-aware variant for
append-mode key stores (the incremental-dedup LSH index): a replayed
foreachBatch re-appends the same ``(band, sig)`` keys, which are
probe-insensitive but grow the index without bound. It rewrites the
directory as ``SELECT DISTINCT`` over the key columns using the same
safe swap.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

DEFAULT_TARGET_MB = 128


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def _prepare_swap_site(path: str) -> tuple[str, str]:
    """Validate ``path`` and return (tmp, bak) staging paths.

    Recovers from a crash between the two swap renames: a leftover
    ``.bak`` with no live directory is the previous run's only copy —
    restore it instead of deleting it. Only then is it safe to clear
    stale staging artifacts from runs that died before the swap."""
    tmp, bak = f"{path}.compact_tmp", f"{path}.bak"
    if not os.path.exists(path) and os.path.isdir(bak):
        os.rename(bak, path)  # crash between rename(path,bak) and rename(tmp,path)
    if not os.path.isdir(path):
        raise ValueError(
            f"compact target must be a local directory (got {path!r}); "
            "on object stores compact to a new path and flip the pointer"
        )
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(bak, ignore_errors=True)
    return tmp, bak


def _swap_in(
    df: DataFrame, path: str, tmp: str, bak: str, n_files: int, keep_backup: bool
) -> None:
    df.repartition(n_files).write.parquet(tmp)
    os.rename(path, bak)
    os.rename(tmp, path)
    if not keep_backup:
        shutil.rmtree(bak, ignore_errors=True)


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
    tmp, bak = _prepare_swap_site(path)
    n_files = math.ceil(max(_dir_bytes(path), 1) / (target_mb * 1024 * 1024))
    _swap_in(spark.read.parquet(path), path, tmp, bak, n_files, keep_backup)
    return n_files


def distinct_compact_parquet(
    spark: SparkSession,
    path: str,
    key_columns: list[str] | None = None,
    target_mb: int = DEFAULT_TARGET_MB,
    keep_backup: bool = False,
) -> int:
    """Rewrite the parquet dir at ``path`` as DISTINCT rows (optionally
    projected to ``key_columns``), merging files like
    :func:`compact_parquet`. For replay-tolerant key stores
    (idempotent-append LSH indexes): duplicates from foreachBatch
    replays are removed, probe semantics are unchanged (set-membership
    stores are insensitive to key multiplicity). Returns the resulting
    file count."""
    tmp, bak = _prepare_swap_site(path)
    df = spark.read.parquet(path)
    if key_columns:
        df = df.select(*key_columns)
    df = df.distinct()
    # size the output from the pre-distinct bytes: an upper bound, so
    # files err small rather than oversized after heavy dedup
    n_files = math.ceil(max(_dir_bytes(path), 1) / (target_mb * 1024 * 1024))
    _swap_in(df, path, tmp, bak, n_files, keep_backup)
    return n_files
