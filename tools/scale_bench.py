#!/usr/bin/env python3
"""Reproduce SCALE.md's ×10/×100 measurements: time queries (warm, best
of 2, noop sink) against the replicated fact dirs produced by
tools/make_scaled.py.

Usage:
    python tools/make_scaled.py 10
    python tools/make_scaled.py 100
    SPARK_GRAFT_DRIVER_MEM=64g python tools/scale_bench.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "ingest_e2e",
    "q1_pricing_summary",
    "dedup_exact",
    "t8_hourly_rollup",
    "ann_cosine_topk",
    "pack_sequences",
    "chunk_documents",
    "source_quota_sample",
    "text_quantile_filter",
    "corpus_prep_e2e",
    "text_unigram_logprob",
    "source_mix_rebalance",
    "asof_last_click",
    "range_join_click_purchase",
    "retention_cohorts",
    "dedup_clusters",
    "corpus_shuffle",
    "shard_by_token_budget",
    "source_drift_psi",
]

DIRS = {
    "x1": "/root/testdata/sf0.1",
    "x10": "/tmp/spark_graft_scale/x10",
    "x100": "/tmp/spark_graft_scale/x100",
}


def main() -> None:
    from scicat_ingestor_spark.queries import QUERIES
    from scicat_ingestor_spark.session import get_session

    names = sys.argv[1:] or DEFAULT_QUERIES
    spark = get_session("scale_bench")
    for name in names:
        for label, d in DIRS.items():
            if not os.path.isdir(d):
                print(f"{name} {label} SKIP (run tools/make_scaled.py first)")
                continue

            def run() -> float:
                t0 = time.perf_counter()
                QUERIES[name](spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                return time.perf_counter() - t0

            try:
                run()  # warm
                print(name, label, round(min(run(), run()), 2), flush=True)
            except Exception as e:  # noqa: BLE001 - report and continue
                print(name, label, "ERR", type(e).__name__, flush=True)


if __name__ == "__main__":
    main()
