#!/usr/bin/env python3
"""IVFADC serving example: train constants once, persist them, keep the
stored index current with the streaming encode-append loop
(streaming/ann_index.py), and probe it — the ANN analogue of
examples/incremental_dedup.py.

Usage:
    python examples/ann_serving.py [sf_dir] [work_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scicat_ingestor_spark.operators import similarity  # noqa: E402
from scicat_ingestor_spark.session import get_session  # noqa: E402
from scicat_ingestor_spark.streaming import ann_index  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ann_serving"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    spark = get_session("ann_serving")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )

    # ---- offline: train once, FREEZE the constants next to the index
    cents = similarity.train_centroids(emb, 64, k=8, iterations=3, quantize_bits=24)
    books = similarity.train_pq_codebooks(
        emb, dim=64, m=8, ksub=16, iterations=3, quantize_bits=24
    )
    consts = f"{work}/ann_constants.json"
    ann_index.save_ann_constants(
        consts, dim=64, m=8, ksub=16, cells=8, centroids=cents, books=books
    )
    print(f"constants frozen at {consts}")

    # ---- streaming: new vectors encode + append as they arrive
    src = f"{work}/vec_src"
    emb.repartition(3).write.parquet(src)
    q = ann_index.run_ann_index_stream(
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        f"{work}/pq_index",
        consts,
        f"{work}/ck",
    )
    q.awaitTermination(180)
    n = spark.read.parquet(f"{work}/pq_index").count()
    print(f"index holds {n} coded vectors after the drain")

    # ---- serving: probe the stored relation with the same constants
    loaded = ann_index.load_ann_constants(consts)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = similarity.ivf_pq_probe(
        spark.read.parquet(f"{work}/pq_index"),
        queries,
        loaded["dim"],
        m=loaded["m"],
        ksub=loaded["ksub"],
        cells=loaded["cells"],
        centroids=loaded["centroids"],
        books=loaded["books"],
        nprobe=2,
    )
    top.show(15, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
