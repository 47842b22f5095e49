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
