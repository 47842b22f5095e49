"""Partitioning utilities shared by compute-heavy operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, factor: int = 1) -> DataFrame:
    """Round-robin repartition ONLY when the upstream scan produced fewer
    partitions than the cluster can use (e.g. a single small parquet
    row-group read as one split). Compute-heavy per-row operators (minhash,
    simhash, text featurization) call this so a small file doesn't serialize
    onto one core.

    At scale this is a no-op: a 100 TB table scans into thousands of
    splits, so the gate fails and no shuffle is added.
    """
    target = df.sparkSession.sparkContext.defaultParallelism * factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
