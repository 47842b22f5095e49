#!/usr/bin/env python3
"""Multimodal real-content pipeline example: binary payloads ->
thumbnail resize -> REAL pixel decode -> content embeddings -> exact
cosine neighbors -> near-dup survivors.

Every stage runs on actual bytes (no codec libraries needed for
uncompressed BMP): the resize resamples real pixels and re-encodes a
real BMP, the decode walks the pixel array, and the embeddings are the
decoded content statistics — the same chain the oracle-gated registry
queries (multimodal_pixels_real / multimodal_resize_real /
multimodal_ann_real) verify against DuckDB.

Usage:
    python examples/multimodal_pipeline.py [sf_dir] [work_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scicat_ingestor_spark.operators import multimodal, similarity  # noqa: E402
from scicat_ingestor_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/multimodal_pipeline"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    spark = get_session("multimodal_pipeline")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # ---- ingest: one real BMP per document (stands in for a payload
    # column read from parquet/blob storage; docs in the same doc_id%97
    # group share identical dims -> near-identical content)
    def synth(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": [
                        multimodal.make_bmp(
                            (int(i) % 97 % 16) + 1, ((int(i) % 97 // 16) % 16) + 1
                        )
                        for i in pdf["doc_id"]
                    ],
                }
            )

    media = docs.select("doc_id").mapInPandas(
        synth, schema="media_id long, payload binary"
    )

    # ---- normalize: thumbnail every image to 4x3 (REAL resample +
    # re-encode), then decode the REAL pixels of the thumbnails
    thumbs = multimodal.resize_pixels(media, 4, 3)
    stats = multimodal.decode_pixels(thumbs)
    stats.write.mode("overwrite").parquet(f"{work}/thumb_stats")
    print("thumbnail stats rows:", spark.read.parquet(f"{work}/thumb_stats").count())

    # ---- embed: decoded content statistics as a 5-dim vector
    emb = stats.select(
        F.col("media_id").alias("vec_id"),
        F.array(
            "mean_b", "mean_g", "mean_r",
            F.col("width").cast("double"), F.col("height").cast("double"),
        ).alias("embedding"),
    )

    # ---- search: exact cosine top-5 for the first three media ids
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    neighbors = similarity.brute_force_topk(emb, queries, k=5)
    print("--- neighbors of media 0..2 (by decoded thumbnail content)")
    for r in neighbors.orderBy("query_id", "rank").collect():
        print(f"  q{r['query_id']} #{r['rank']}: media {r['neighbor_id']}"
              f" cosine={r['cosine']}")

    # ---- dedup: content-identical groups collapse to one survivor
    dups = similarity.cosine_pairs_lsh(
        emb, dim=5, threshold=0.999999, bits=4
    )
    losers = dups.select(F.col("id_b").alias("vec_id")).distinct()
    survivors = emb.join(losers, "vec_id", "left_anti")
    n_in, n_out = emb.count(), survivors.count()
    print(f"near-dup survivors: {n_out} of {n_in} "
          f"({n_in - n_out} content duplicates removed)")
    spark.stop()


if __name__ == "__main__":
    main()
