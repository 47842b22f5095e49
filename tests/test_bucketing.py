"""Co-located bucketed join: correctness AND the physical-plan proof
that neither side shuffles (the point of bucketing at 100 TB)."""

import shutil

import pytest

from pyspark.sql import functions as F

from scicat_ingestor_spark.operators.bucketing import colocated_join, write_bucketed


@pytest.fixture()
def bucketed_pair(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    left = docs.select("doc_id", "source", "lang")
    right = docs.select("doc_id", F.length("text").alias("text_len"))
    write_bucketed(left, "b_docs_meta", "doc_id", 8)
    write_bucketed(right, "b_docs_len", "doc_id", 8)
    yield "b_docs_meta", "b_docs_len"
    for t in ("b_docs_meta", "b_docs_len"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    shutil.rmtree("spark-warehouse", ignore_errors=True)


def test_colocated_join_has_no_shuffle(spark, bucketed_pair):
    left_t, right_t = bucketed_pair
    joined = colocated_join(spark, left_t, right_t, "doc_id")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan, plan


def test_colocated_join_matches_plain_join(spark, sf_dir, bucketed_pair):
    left_t, right_t = bucketed_pair
    joined = colocated_join(spark, left_t, right_t, "doc_id")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    expected = docs.select(
        "doc_id", "source", "lang", F.length("text").alias("text_len")
    )
    got = {tuple(r) for r in joined.collect()}
    want = {tuple(r) for r in expected.collect()}
    assert got == want


def test_bucketed_scan_selected(spark, bucketed_pair):
    left_t, _ = bucketed_pair
    # an equality filter on the bucket key prunes to a single bucket:
    # at 100 TB a point lookup reads 1/num_buckets of the table
    # autoBucketedScan turns bucketed reading off when no join/agg needs
    # the distribution, which also forfeits bucket pruning — pin it on
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        one = spark.table(left_t).filter(F.col("doc_id") == 7)
        plan = one._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
    finally:
        spark.conf.set(key, old)


def test_write_compacted_sizes_output_files(spark, sf_dir, tmp_path):
    """Output file count tracks the plan-size estimate, not
    shuffle.partitions — no KB-sized file tail."""
    import glob

    from scicat_ingestor_spark.operators.util import write_compacted

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = str(tmp_path / "compact")
    n = write_compacted(li, out, target_mb=256)
    files = glob.glob(f"{out}/part-*.parquet")
    assert len(files) == n
    # sf0.001 lineitem is far under 256 MB -> exactly one output file,
    # where a naive write after a shuffle would emit 32
    assert n == 1


def test_write_compacted_ceiling_and_clamp(spark, sf_dir, tmp_path, monkeypatch):
    """Partition count is ceiling(est/target) so no file exceeds the
    target, and clamps when Catalyst's post-join sizeInBytes estimate
    explodes (no CBO stats -> multiplied child sizes)."""
    from scicat_ingestor_spark.operators import util

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(100)

    # 1.5x target -> 2 files under ceiling division (floor would give 1,
    # letting a file reach ~1.5x target)
    monkeypatch.setattr(util, "estimated_bytes", lambda df: 384 * 1024 * 1024)
    n = util.write_compacted(li, str(tmp_path / "ceil"), target_mb=256)
    assert n == 2

    # absurd estimate (1 EiB) -> clamped to 8x shuffle.partitions, not a
    # 4-billion-partition repartition
    monkeypatch.setattr(util, "estimated_bytes", lambda df: 1 << 60)
    n = util.write_compacted(li, str(tmp_path / "clamp"), target_mb=256)
    cap = 8 * int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert n == cap


def test_write_sorted_enables_range_pruning(spark, sf_dir, tmp_path):
    """Range-partitioned + sorted output: each file covers a disjoint
    key range, so a point/range predicate touches a subset of files."""
    import glob

    import pyarrow.parquet as pq
    from scicat_ingestor_spark.operators.util import write_sorted

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    out = str(tmp_path / "sorted")
    write_sorted(li, out, "l_orderkey", num_files=4)
    files = sorted(glob.glob(f"{out}/part-*.parquet"))
    assert len(files) == 4
    ranges = []
    for f in files:
        t = pq.read_table(f, columns=["l_orderkey"])
        col = t.column("l_orderkey").to_pylist()
        ranges.append((min(col), max(col)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint key ranges across files
    # and the data inside each file is sorted (tight row-group stats)
    assert all(
        pq.read_table(f, columns=["l_orderkey"]).column("l_orderkey").to_pylist()
        == sorted(pq.read_table(f, columns=["l_orderkey"]).column("l_orderkey").to_pylist())
        for f in files
    )


def test_write_partitioned_prunes_partitions(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from scicat_ingestor_spark.operators.util import write_partitioned
    from scicat_ingestor_spark.queries import _t

    ev = _t(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    out = str(tmp_path / "events_by_day")
    write_partitioned(ev, out, "event_date")

    back = spark.read.parquet(out)
    one_day = back.filter(F.col("event_date") == "2024-01-03")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    # pruning happens at PLANNING time: the partition filter is on the
    # scan, and the data filter list stays empty (nothing row-level)
    assert "PartitionFilters: [isnotnull(event_date" in plan
    # correctness: partition-pruned read equals a full-scan filter
    full = ev.filter(F.to_date("ts") == "2024-01-03").count()
    assert one_day.count() == full
    # layout: one directory per day, each holding whole-partition files
    days = [p.name for p in (tmp_path / "events_by_day").iterdir()
            if p.name.startswith("event_date=")]
    assert len(days) >= 5


def test_materialized_supply_catalog_is_exchange_free(spark, sf_dir):
    """The 100 TB shape for the partsupp-derived queries (q2/q16): the
    supply catalog is materialized ONCE, bucketed by ps_partkey. Then
    BOTH halves of the q2 decorrelation run with zero Exchange:

    - groupBy(ps_partkey) min — bucketed scan already hash-partitions
      on the grouping key;
    - the join-back on (ps_partkey, cost) — HashPartitioning on a
      SUBSET of the join keys satisfies ClusteredDistribution, so
      neither side shuffles.

    This is why `_supply` recomputing from lineitem per query is a
    test-scale convenience, not the scale design (SCALE.md r5)."""
    from scicat_ingestor_spark.queries import _supply

    try:
        supply = _supply(spark, sf_dir)
        write_bucketed(supply, "b_supply", "ps_partkey", 8)
        t = spark.table("b_supply")
        min_cost = t.groupBy("ps_partkey").agg(
            F.min("ps_supplycost").alias("_min_cost")
        )
        # join on the BUCKET key only; the min-cost match must stay a
        # residual. Two Catalyst traps, both observed here: (a) a double
        # in the join key gets wrapped in normalizenanandzero(...) — no
        # longer the raw bucket column, so the planner disables bucketed
        # co-partitioning and shuffles BOTH sides; (b) an == filter
        # after the join gets pushed back INTO the join as an equi-key,
        # same outcome. `cost <= min` is equivalent (min guarantees >=)
        # and, being an inequality, stays a residual.
        joined = (
            t.hint("merge")
            .join(min_cost, "ps_partkey")
            .filter(F.col("ps_supplycost") <= F.col("_min_cost"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and it computes the same per-part minimum membership as the
        # unbucketed form
        n_direct = (
            supply.groupBy("ps_partkey")
            .agg(F.min("ps_supplycost").alias("m"))
            .count()
        )
        assert joined.select("ps_partkey").distinct().count() == n_direct
    finally:
        spark.sql("DROP TABLE IF EXISTS b_supply")
        shutil.rmtree("spark-warehouse", ignore_errors=True)


def test_incremental_probe_bucketed_index_is_exchange_free(spark, sf_dir):
    """The incremental-dedup 100 TB claim, pinned: a stored LSH index
    bucketed on (band, sig) joins the probe WITHOUT an index-side
    exchange — only increment-sized data shuffles per probe. The merge
    hint forces the sort-merge shape the planner picks at real scale
    (here the tiny index would otherwise broadcast, which also doesn't
    shuffle it but wouldn't demonstrate the bucketed path)."""
    from scicat_ingestor_spark.operators import dedup

    spark.sql("DROP TABLE IF EXISTS lsh_index_bucketed_t")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = docs.filter(F.col("doc_id") % 5 != 0)
    inc = docs.filter(F.col("doc_id") % 5 == 0)
    try:
        (
            dedup.build_lsh_index(base, "text", "doc_id")
            .write.bucketBy(16, "band", "sig")
            .sortBy("band", "sig")
            .format("parquet")
            .saveAsTable("lsh_index_bucketed_t")
        )
        stored = spark.table("lsh_index_bucketed_t")
        out = dedup.incremental_dedup(inc, stored.hint("merge"), "text", "doc_id")
        plan = out._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "SortMergeJoin" in plan and "LeftSemi" in plan
        assert "Bucketed: true" in plan
        assert "SelectedBucketsCount: 16 out of 16" in plan
        # the only (band, sig) exchanges are increment-side: the intra-
        # increment window and the probe side of the semi-join; the
        # index never re-partitions
        assert plan.count("hashpartitioning(band") == 2
        # semantics unchanged vs an in-memory index
        inline = dedup.incremental_dedup(
            inc, dedup.build_lsh_index(base, "text", "doc_id"), "text", "doc_id"
        )
        assert sorted(r.doc_id for r in out.collect()) == sorted(
            r.doc_id for r in inline.collect()
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS lsh_index_bucketed_t")
