#!/usr/bin/env python3
"""Settle the round-4 dedup_clusters/dedup_survivors bench wobble
(VERDICT r4 "What's wrong #2"): same-session interleaved sweep of the
two configs that could differ —

- ``bare``:          fresh session, time the dedup queries directly
                     (how the driver bench times them: in bench.py the
                     headline dedup timings are recorded BEFORE any
                     trained-ANN query runs, so the r4 memo could not
                     have touched them by construction);
- ``after_trained``: fresh session, populate the round-4 trained-ANN
                     memo first (ann_recall_trained_report), then time
                     the same dedup queries — the suspected
                     contamination path, made maximal.

Configs alternate A,B,A,B,... across ``AB_ROUNDS`` fresh-session rounds
so co-tenant noise decorrelates from config. If the two distributions
overlap, the wobble was noise; if ``after_trained`` is consistently
slower, the memo shares session state it shouldn't.

Usage: AB_ROUNDS=3 python tools/ab_wobble.py
Prints one JSON line with per-round numbers and per-config best/median.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(os.environ.get("AB_ROUNDS", "3"))
REPEATS = int(os.environ.get("AB_REPEATS", "3"))
NAMES = ["dedup_clusters", "dedup_survivors"]


def run_round(populate_trained: bool) -> dict[str, float]:
    from scicat_ingestor_spark.queries import QUERIES
    from scicat_ingestor_spark.session import get_session

    spark = get_session(
        "ab_wobble",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    out: dict[str, float] = {}
    try:
        if populate_trained:
            QUERIES["ann_recall_trained_report"](spark, SF_DIR).write.format(
                "noop"
            ).mode("overwrite").save()
        for name in NAMES:
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
    samples: dict[str, dict[str, list[float]]] = {
        "bare": {n: [] for n in NAMES},
        "after_trained": {n: [] for n in NAMES},
    }
    for i in range(ROUNDS):
        for label, populate in (("bare", False), ("after_trained", True)):
            r = run_round(populate)
            for n, v in r.items():
                samples[label][n].append(v)
            print(f"## round {i} {label}: {r}", flush=True)
    summary = {
        label: {
            n: {
                "best": min(v),
                "median": round(statistics.median(v), 3),
                "samples": v,
            }
            for n, v in per.items()
        }
        for label, per in samples.items()
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
