"""Streaming drift monitor: per-micro-batch PSI against a frozen
baseline histogram — the deployment shape of the batch
``source_drift_psi`` query (queries.py), following the same
frozen-constants discipline as the ANN index loop (streaming/
ann_index.py): the baseline is trained/written ONCE and never mutated
under a live monitor (a drifting baseline hides exactly the drift the
monitor exists to catch); re-baselining means writing a NEW baseline
path and restarting the monitor with a new checkpoint.

Each micro-batch: bin the incoming documents' lengths (scan-local
integer division), count per (source, bin) — a bounded-cardinality
aggregate (sources x 10) with map-side combine — join the broadcast
baseline, and append one (batch_id, source, n_base, n_batch, psi) row
per source to the monitoring sink. Replay-safe: the append is keyed on
(batch_id, source), so a re-delivered batch inserts nothing.

Scale shape: the per-batch state is the 10-bin histogram, not rows;
the baseline relation is sources x 10 rows and broadcasts; the corpus
stream is read once per batch and never reshuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scicat_ingestor_spark.streaming.pipeline import idempotent_append

NBINS = 10


def length_histogram(docs: DataFrame) -> DataFrame:
    """(source, bin, c) over the fixed 10-bin document-length grid —
    the same binning as the batch query (n_chars div 100, capped)."""
    return (
        docs.select(
            "source",
            F.least(F.expr("n_chars div 100"), F.lit(NBINS - 1)).alias("bin"),
        )
        .groupBy("source", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def write_baseline(docs: DataFrame, baseline_path: str) -> None:
    """Freeze the reference histogram. One parquet write of a
    sources x 10 relation — tiny by construction."""
    length_histogram(docs).write.mode("overwrite").parquet(baseline_path)


def psi_against_baseline(batch: DataFrame, baseline: DataFrame) -> DataFrame:
    """One PSI row per source present in EITHER side, Laplace-smoothed
    over the full fixed grid (same math as queries.q_source_drift_psi,
    so the batch query is this function's oracle twin)."""
    cur = length_histogram(batch)
    sources = (
        baseline.select("source").union(cur.select("source")).distinct()
    )
    grid = sources.select(
        "source", F.explode(F.sequence(F.lit(0), F.lit(NBINS - 1))).alias("bin")
    )
    full = (
        grid.join(baseline.withColumnRenamed("c", "ca"), ["source", "bin"], "left")
        .join(cur.withColumnRenamed("c", "cb"), ["source", "bin"], "left")
        .fillna(0, ["ca", "cb"])
    )
    tot = full.groupBy("source").agg(
        F.sum("ca").alias("ta"), F.sum("cb").alias("tb")
    )
    p = (F.col("ca") + 1) / (F.col("ta") + NBINS)
    q = (F.col("cb") + 1) / (F.col("tb") + NBINS)
    return (
        full.join(F.broadcast(tot), "source")
        .select("source", "ta", "tb", ((p - q) * F.log(p / q)).alias("term"))
        .groupBy("source")
        .agg(
            F.max("ta").alias("n_base"),
            F.max("tb").alias("n_batch"),
            F.round(F.sum("term"), 6).alias("psi"),
        )
    )


def run_drift_monitor(
    stream_df: DataFrame,
    baseline_path: str,
    out_path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Wire a documents-shaped stream through the PSI monitor. The
    baseline is loaded once at stream start (frozen-for-lifetime)."""
    spark = stream_df.sparkSession
    baseline = spark.read.parquet(baseline_path)

    def _body(batch: DataFrame, batch_id: int) -> None:
        rows = psi_against_baseline(batch, baseline).withColumn(
            "batch_id", F.lit(batch_id).cast("bigint")
        )
        keyed = rows.withColumn(
            "_key", F.concat_ws(":", F.col("batch_id"), F.col("source"))
        )
        idempotent_append(keyed, out_path, "_key")

    writer = stream_df.writeStream.foreachBatch(_body).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
