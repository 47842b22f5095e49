"""Ordered-analytics operators that refuse the single-partition window.

A globally-ordered cumulative sum is the textbook case where the naive
Spark form — ``Window.orderBy(...)`` with no partitionBy — funnels the
whole relation through ONE task (the q15 anti-pattern this repo
removed). ``running_total`` is the scale form: a two-pass distributed
prefix sum.

  1. range-partition the rows on the total order (ties broken by the
     caller-supplied unique key, so every row has one defined prefix),
  2. cumulative-sum WITHIN each partition (a keyed window — parallel),
  3. add each partition's prefix offset, computed from the tiny
     per-partition totals relation (bounded by the shuffle partition
     COUNT, a config constant, never by data) via a triangular
     self-join — no unpartitioned window, no driver collect.

Every shuffle is either the range exchange the total order requires
anyway or bounded-by-config small; the plan carries zero
single-partition stages over data-sized input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def global_rank(
    df: DataFrame,
    order_cols: list[Column],
    num_partitions: int | None = None,
    out_col: str = "rank",
) -> DataFrame:
    """``row_number()`` over a TOTAL order (``order_cols`` must include a
    unique tiebreaker) without the single-partition window the naive
    ``Window.orderBy(...)`` form plans. A rank is just the running total
    of a constant 1, so this reuses the two-pass distributed prefix sum:
    range exchange on the order, per-partition ``row_number``, offsets
    from the config-bounded per-partition counts."""
    marked = df.withColumn("_gr_one", F.lit(1).cast("bigint"))
    return running_total(
        marked, "_gr_one", order_cols, num_partitions, out_col
    ).drop("_gr_one")


def running_total(
    df: DataFrame,
    value_col: str,
    order_cols: list[Column],
    num_partitions: int | None = None,
    out_col: str = "running_total",
) -> DataFrame:
    """Cumulative sum of ``value_col`` over the TOTAL order given by
    ``order_cols`` (must be a total order — include a unique tiebreaker,
    or tied rows would have no defined prefix). Returns ``df`` plus
    ``out_col``; sums keep the input column's type (pass a decimal for
    cross-engine exactness)."""
    if num_partitions is None:
        num_partitions = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    ranged = df.repartitionByRange(num_partitions, *order_cols).withColumn(
        "_rt_pid", F.spark_partition_id()
    )
    w = (
        Window.partitionBy("_rt_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("_rt_local", F.sum(value_col).over(w))
    totals = local.groupBy("_rt_pid").agg(F.sum(value_col).alias("_rt_total"))
    a, b = totals.alias("rt_a"), totals.alias("rt_b")
    offsets = (
        a.join(b, F.col("rt_b._rt_pid") < F.col("rt_a._rt_pid"), "left")
        .groupBy(F.col("rt_a._rt_pid").alias("_rt_pid"))
        .agg(F.sum(F.col("rt_b._rt_total")).alias("_rt_offset"))
    )
    zero = F.lit(0).cast(dict(df.dtypes)[value_col])
    return (
        local.join(F.broadcast(offsets), "_rt_pid")
        .withColumn(
            out_col, F.col("_rt_local") + F.coalesce(F.col("_rt_offset"), zero)
        )
        .drop("_rt_pid", "_rt_local", "_rt_offset")
    )
