#!/usr/bin/env python3
"""Corpus export pipeline end-to-end: hygiene -> token-budget shards ->
drift monitoring of the next dump — the last mile of a training-data
pipeline, composed from the same operators the registry queries gate.

1. Run the hygiene stages (quality gate, decontamination, exact dedup)
   over the current dump and export the survivors as one parquet
   directory per ~4096-token shard (operators/sharding.export_shards —
   seeded deterministic shuffle, so a re-run or task retry produces the
   IDENTICAL shard layout).
2. Freeze the dump's per-source length histogram as the drift baseline.
3. Replay the NEXT dump as a stream through the PSI drift monitor
   (streaming/drift.py): one (batch_id, source, psi) row per source per
   micro-batch, replay-safe. PSI > 0.2 on a source = investigate its
   extraction before training on it.

Usage:
    python examples/corpus_export.py [sf_dir] [work_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scicat_ingestor_spark.apps.corpus import prep_corpus  # noqa: E402
from scicat_ingestor_spark.operators.sharding import export_shards  # noqa: E402
from scicat_ingestor_spark.session import get_session  # noqa: E402
from scicat_ingestor_spark.streaming import drift  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/corpus_export"
    shutil.rmtree(work, ignore_errors=True)
    spark = get_session("corpus_export")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # block split, NOT doc_id % k: the synthetic source column is a
    # doc_id modulus, so a modulus split would put whole sources on one
    # side and the monitor would only ever see absence, not drift
    this_dump = docs.filter((F.col("doc_id") / 20).cast("bigint") % 2 == 0)
    next_dump = docs.filter((F.col("doc_id") / 20).cast("bigint") % 2 == 1)

    # ---- 1. hygiene + sharded export of the current dump
    kept = prep_corpus(
        this_dump, stages=("quality", "decontaminate", "dedup"), eval_mod=97
    )
    export_shards(kept, f"{work}/shards", budget=4096)
    back = spark.read.parquet(f"{work}/shards")
    per_shard = back.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("docs"), F.sum("n_tokens").alias("tokens")
    )
    print("shards written:")
    for r in per_shard.orderBy("shard_id").collect():
        print(f"  shard {r.shard_id}: {r.docs} docs, {r.tokens} tokens")

    # ---- 2. freeze the drift baseline from the exported dump
    drift.write_baseline(this_dump, f"{work}/baseline")

    # ---- 3. stream the next dump through the PSI monitor
    next_dump.coalesce(4).write.mode("overwrite").parquet(f"{work}/next_src")
    schema = spark.read.parquet(f"{work}/next_src").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(f"{work}/next_src")
    )
    q = drift.run_drift_monitor(
        stream, f"{work}/baseline", f"{work}/psi", f"{work}/ck"
    )
    q.awaitTermination()
    # Reading the monitor: a source ABSENT from one micro-batch (n=0)
    # scores high PSI from absence alone — that is batch-granularity
    # noise, not extraction drift. Act on sources that are PRESENT in
    # the batch and still drifted; investigate absence at dump
    # granularity (sum n_batch over the dump's batches).
    rows = spark.read.parquet(f"{work}/psi").collect()
    present = sorted(
        (r for r in rows if r.n_batch > 0), key=lambda r: -r.psi
    )
    print("drift monitor — highest-PSI sources present in their batch "
          "(> 0.2 = act):")
    for r in present[:8]:
        print(
            f"  batch {r.batch_id} source {r.source}: "
            f"psi={r.psi} (n={r.n_batch} vs base {r.n_base})"
        )
    absent = sum(1 for r in rows if r.n_batch == 0)
    print(f"... {len(rows)} rows total ({absent} absence rows); "
          f"artifacts under {work}")
    spark.stop()


if __name__ == "__main__":
    main()
