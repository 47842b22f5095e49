#!/usr/bin/env python3
"""IVFADC serving example: build the PQ index once, probe it per query
batch — the amortized regime the composition exists for (SCALE.md
"where IVF-PQ actually wins": probe 0.83 s vs full-scan 1.48 s per
50-query batch at x100).

Usage:
    python examples/ann_serving.py [sf_dir] [index_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scicat_ingestor_spark.operators import similarity  # noqa: E402
from scicat_ingestor_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    index_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ann_pq_index"
    spark = get_session("ann_serving")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim, m, ksub, cells = 64, 8, 16, 8

    # ---- index build (once; at scale: partitionBy("_cell") and append)
    similarity.build_pq_index(
        emb, dim, m=m, ksub=ksub, cells=cells
    ).write.mode("overwrite").parquet(index_dir)
    print(f"index written to {index_dir}")

    # ---- serving (per query batch; the corpus embeddings never reload)
    index = spark.read.parquet(index_dir)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    topk = similarity.ivf_pq_probe(
        index, queries, dim, k=5, m=m, ksub=ksub, cells=cells, nprobe=2
    )
    topk.show(25, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
