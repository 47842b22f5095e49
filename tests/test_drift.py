"""Streaming drift monitor: frozen-baseline PSI per micro-batch.

The strongest check is the twin identity: one availableNow batch over
the doc_id%5 split must reproduce the batch query source_drift_psi
row-for-row (same binning, same smoothing, same math)."""

import shutil
import tempfile

from pyspark.sql import functions as F

import scicat_ingestor_spark.queries as Q
from scicat_ingestor_spark.streaming.drift import (
    run_drift_monitor,
    write_baseline,
)


def _setup(spark, sf_dir, base):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    write_baseline(docs.filter(F.col("doc_id") % 5 == 0), f"{base}/baseline")
    rest = docs.filter(F.col("doc_id") % 5 != 0)
    rest.coalesce(1).write.mode("overwrite").parquet(f"{base}/src")
    return spark.read.parquet(f"{base}/src").schema


def test_drift_monitor_matches_batch_query(spark, sf_dir):
    base = tempfile.mkdtemp(prefix="drift_", dir=".")
    try:
        schema = _setup(spark, sf_dir, base)
        stream = spark.readStream.schema(schema).parquet(f"{base}/src")
        q = run_drift_monitor(
            stream, f"{base}/baseline", f"{base}/out", f"{base}/ck"
        )
        q.awaitTermination()
        got = {
            r.source: (r.n_base, r.n_batch, r.psi)
            for r in spark.read.parquet(f"{base}/out").collect()
        }
        want = {
            r.source: (r.n_prev, r.n_curr, r.psi)
            for r in Q.q_source_drift_psi(spark, sf_dir).collect()
        }
        assert got == want
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_drift_monitor_replay_inserts_nothing(spark, sf_dir):
    base = tempfile.mkdtemp(prefix="drift_", dir=".")
    try:
        schema = _setup(spark, sf_dir, base)
        for ck in ("ck1", "ck2"):  # second run = full replay, new checkpoint
            stream = spark.readStream.schema(schema).parquet(f"{base}/src")
            q = run_drift_monitor(
                stream, f"{base}/baseline", f"{base}/out", f"{base}/{ck}"
            )
            q.awaitTermination()
        out = spark.read.parquet(f"{base}/out")
        assert out.count() == out.select("_key").distinct().count()
        assert (
            out.count()
            == spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("source")
            .distinct()
            .count()
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
