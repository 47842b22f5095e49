"""Bucketed (pre-shuffled) tables for co-located joins — the 100 TB path.

The reference's joins are all tiny-dimension lookups (SURVEY §2.5), so
broadcast is always right there. The training-data extensions are not:
fact-to-fact joins (documents ⋈ dedup clusters, embeddings ⋈ ANN
assignments, datafile lists ⋈ datasets) shuffle BOTH sides on every run.
At 100 TB the winning layout is to pay that shuffle once at write time:
bucket both tables by the join key into the same number of buckets, and
every subsequent join is map-side — zero Exchange on either side
(`tests/test_bucketing.py` asserts exactly that on the physical plan).

Spark specifics encoded here:
- bucketing requires `saveAsTable` (bucket metadata lives in the
  catalog, not in parquet footers);
- both sides must agree on bucket count (or be integer multiples with
  `spark.sql.bucketing.coalesceBucketsInJoin.enabled`);
- `sortBy` within buckets keeps files clustered for min/max row-group
  skipping; Spark 3+ no longer propagates it as scan output ordering
  (only behind `spark.sql.legacy.bucketedTableScan.outputOrdering`), so
  the join still has a per-bucket in-memory Sort — cheap and spillable;
  the Exchange removal is the scale win;
- a broadcast hint would bypass bucketing, so `colocated_join` pins the
  MERGE strategy — at real scale both sides are far above any broadcast
  threshold and the hint is a no-op safeguard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: str | list[str],
    num_buckets: int,
    sorted_buckets: bool = True,
) -> None:
    """Persist df bucketed (and in-bucket sorted) by the join key(s)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    # one file per bucket: repartition uses the same Murmur3 key hash as
    # bucketBy, so each write task holds exactly one bucket — required
    # for the reader to trust the in-bucket sort (multi-file buckets
    # force a re-Sort under sort-merge join)
    df = df.repartition(num_buckets, *[df[k] for k in keys])
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, keys[0], *keys[1:])
    )
    if sorted_buckets:
        writer = writer.sortBy(keys[0], *keys[1:])
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    keys: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables with no shuffle on either side."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    left = spark.table(left_table).hint("merge")
    return left.join(spark.table(right_table), on=keys, how=how)
