"""Sample-ingestor daemon: pl72 run-start stream -> per-instrument sample
upserts.

The reference serializes upserts per instrument with an mp.Lock and
forks a child per message
(/root/reference/src/scicat_sample_ingestor.py:118-215). Spark-first:
within each micro-batch the first occurrence per (description,
proposalId) wins (window), the anti-join against the samples table is
the exists-check (J6), and per-instrument ordering holds because the
batch is repartitioned by instrument before the ordered apply (T5).

Usage:
    python -m scicat_ingestor_spark.apps.samples \
        --out ./samples_parquet --checkpoint ./ck --source-dir ./replay \
        [--once]
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from scicat_ingestor_spark.config import build_config
from scicat_ingestor_spark.sources.messages import parse_pl72_json
from scicat_ingestor_spark.streaming.pipeline import idempotent_append, run_ingest_stream


def upsert_rows(batch: DataFrame, sample_name: F.Column, proposal_id: F.Column) -> DataFrame:
    """pl72 batch -> one upsert row per new (description, proposalId)."""
    keyed = batch.select(
        "job_id",
        "instrument_name",
        sample_name.alias("description"),
        proposal_id.alias("proposal_id"),
    )
    w = Window.partitionBy("description", "proposal_id").orderBy("job_id")
    return (
        keyed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .select(
            "description",
            "proposal_id",
            F.col("instrument_name").alias("owner_group"),
            F.concat_ws("|", "description", "proposal_id").alias("sample_key"),
        )
    )


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--source-dir", required=True, help="replay dir of pl72 JSON rows")
    ap.add_argument("--config", default=None)
    ap.add_argument("--once", action="store_true")
    args = ap.parse_args(argv)
    cfg, unused = build_config(args.config, {})
    for key in unused:
        print(f"warning: unused config key {key}")

    from scicat_ingestor_spark.logging_setup import build_logger

    logger = build_logger(cfg.logging, name="scicat.sample_ingestor")
    logger.info("starting scicat.sample_ingestor (config ok, %d unused keys)", len(unused))

    from scicat_ingestor_spark.session import get_session

    spark = get_session("sample_ingestor")
    schema = spark.read.parquet(args.source_dir).schema
    stream = spark.readStream.schema(schema).parquet(args.source_dir)

    def transform(batch):
        msgs = parse_pl72_json(batch) if "value" in batch.columns else batch
        run = F.regexp_extract("filename", r"run_(\d+)", 1)
        return upsert_rows(
            msgs,
            F.concat(F.lit("sample-"), run),
            F.regexp_extract("filename", r"/(\w+)/run_", 1),
        )

    def sink(batch, batch_id):
        # anti-join on the sample key = the reference's exists-check (J6)
        idempotent_append(batch, args.out, "sample_key")

    from scicat_ingestor_spark.streaming.resilience import await_with_restarts

    return await_with_restarts(
        lambda: run_ingest_stream(
            stream, transform, sink, args.checkpoint, trigger_once=args.once
        ),
        logger,
        max_restarts=cfg.ingestion.max_stream_restarts,
        restart_window_s=cfg.ingestion.stream_restart_window_s,
        backoff_s=cfg.ingestion.stream_restart_backoff_s,
    )


if __name__ == "__main__":
    raise SystemExit(main())
