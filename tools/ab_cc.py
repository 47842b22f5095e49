#!/usr/bin/env python3
"""A/B the connected-components regression suspects at sf0.1.

Axes: star-pair strategy (join / window / hint) x AQE coalesce floor
(64k current / 1m spark default). Fresh session per config, warm-up run
then best-of-N, configs interleaved across repeats to decorrelate
co-tenant noise. Prints a JSON summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERY_NAMES = sys.argv[1].split(",") if len(sys.argv) > 1 else [
    "dedup_clusters", "dedup_survivors"
]
REPEATS = int(os.environ.get("AB_REPEATS", "3"))

CONFIGS = [
    ("window_64k", "window", "64k"),
    ("window_1m", "window", "1m"),
    ("join_64k", "join", "64k"),
    ("join_1m", "join", "1m"),
]


def run_config(impl: str, floor: str) -> dict[str, float]:
    import scicat_ingestor_spark.operators.dedup as dedup
    from scicat_ingestor_spark.queries import QUERIES
    from scicat_ingestor_spark.session import get_session

    orig = dedup.minhash_lsh_pairs.__wrapped__ if hasattr(
        dedup.minhash_lsh_pairs, "__wrapped__"
    ) else dedup.minhash_lsh_pairs

    def patched(*a, **k):
        if k.get("star"):
            k["star_strategy"] = impl
        return orig(*a, **k)

    patched.__wrapped__ = orig
    dedup.minhash_lsh_pairs = patched

    spark = get_session(
        f"ab_{impl}_{floor}",
        extra_conf={
            "spark.sql.adaptive.coalescePartitions.minPartitionSize": floor,
            "spark.ui.showConsoleProgress": "false",
        },
    )
    out: dict[str, float] = {}
    try:
        for name in QUERY_NAMES:
            QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()  # warm-up
            best = float("inf")
            for _ in range(REPEATS):
                t0 = time.perf_counter()
                QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            out[name] = round(best, 3)
    finally:
        spark.stop()
    return out


def main() -> None:
    results: dict[str, dict[str, float]] = {}
    for label, impl, floor in CONFIGS:
        results[label] = run_config(impl, floor)
        print(f"## {label}: {results[label]}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
