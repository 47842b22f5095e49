#!/usr/bin/env python3
"""Incremental dedup serving example: build the corpus LSH index once,
then dedup each incoming crawl against it — batch probe first, then the
streaming probe-admit-index loop that keeps the index current
(streaming/incremental.py). The corpus itself is never rescanned.

Usage:
    python examples/incremental_dedup.py [sf_dir] [work_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scicat_ingestor_spark.operators import dedup  # noqa: E402
from scicat_ingestor_spark.session import get_session  # noqa: E402
from scicat_ingestor_spark.streaming import incremental  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/incremental_dedup"
    shutil.rmtree(work, ignore_errors=True)
    spark = get_session("incremental_dedup")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    crawl = docs.filter(F.col("doc_id") % 5 == 0)

    # ---- index build (once; at scale: write bucketed on (band, sig))
    index_dir = f"{work}/lsh_index"
    dedup.build_lsh_index(corpus, "text", "doc_id").write.parquet(index_dir)
    print(f"index written to {index_dir}")

    # ---- one-shot batch probe of a crawl
    admitted = dedup.incremental_dedup(
        crawl, spark.read.parquet(index_dir), "text", "doc_id"
    )
    print(f"batch probe: {admitted.count()} of {crawl.count()} docs admitted")

    # ---- streaming loop: micro-batches probe AND update the index
    src = f"{work}/crawl_src"
    crawl.repartition(3).write.parquet(src)
    # compact_index_every_n_batches: the content-aware maintenance pass
    # (DISTINCT (band, sig) rewrite) runs between micro-batches — bounds
    # index bytes against replay-duplicated keys without touching probes
    q = incremental.run_incremental_dedup_stream(
        spark.readStream.schema(crawl.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        index_dir,
        f"{work}/admitted",
        f"{work}/ck",
        compact_index_every_n_batches=3,
    )
    q.awaitTermination(180)
    n = spark.read.parquet(f"{work}/admitted").count()
    print(f"streaming loop: {n} docs admitted across 3 micro-batches")

    # ---- maintenance window: the corpus sink appended one file set per
    # batch; compact it before the next drain (safe here: stream done).
    # The index was already DISTINCT-compacted by the loop's cadence.
    from scicat_ingestor_spark.streaming import maintenance  # noqa: E402

    files = maintenance.compact_parquet(spark, f"{work}/admitted")
    print(f"compacted {work}/admitted -> {files} file(s)")


if __name__ == "__main__":
    main()
