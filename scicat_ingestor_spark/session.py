"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what we would set on a real cluster: AQE on
(runtime re-plan, skew-join splitting), shuffle partitions sized to the
parallelism, Arrow enabled for the few pandas-UDF paths, UTC session TZ
(the reference always emits UTC timestamps —
/root/reference/src/scicat_dataset.py:76,340-342).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(
    app_name: str = "scicat_ingestor_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalescing is byte-targeted; text pipelines are CPU-heavy
        # per byte, and the default 1 MB floor can collapse a
        # small-bytes shuffle feeding expensive per-row work onto ONE
        # task (controlled sweep at sf0.1: corpus_prep_full_e2e 4.0 s
        # at 1m / 2.5 s at 256k / 2.1 s at 64k; iterative
        # connected-components unchanged within noise). A no-op at
        # scale, where real partitions dwarf the floor.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # driver testdata stores TIMESTAMP(NANOS) which Spark has no native
        # type for: read as long (ns since epoch), converted at load
        # (queries._t) via timestamp_micros(ns div 1000)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # plan-build speed: the Column API captures a Python stack trace
        # per call for error enrichment; with compiled schemas issuing
        # thousands of Column calls this is pure driver overhead
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...]) -> dict:
    """Load the driver-generated parquet tables as DataFrames."""
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}
