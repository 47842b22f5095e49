#!/usr/bin/env python3
"""Interleaved A/B of the shared-fanout (ReusedExchange) optimization.

One session; per round, each named query is built+run twice — once with
SIS_DISABLE_FANOUT=1 (old plan) and once without (new plan) — in
alternating order so hypervisor steal bursts decorrelate from variant.
Prints per-query medians and the full samples.

Usage: AB_ROUNDS=4 python tools/ab_fanout.py q1 [q2 ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(os.environ.get("AB_ROUNDS", "4"))


def main() -> None:
    names = sys.argv[1:]
    from scicat_ingestor_spark.queries import QUERIES
    from scicat_ingestor_spark.session import get_session

    spark = get_session(
        "ab_fanout", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )

    def run(name: str, disable: bool) -> float:
        os.environ["SIS_DISABLE_FANOUT"] = "1" if disable else "0"
        t0 = time.perf_counter()
        df = QUERIES[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    out: dict = {}
    for name in names:
        run(name, True)   # warm both variants
        run(name, False)
        old: list[float] = []
        new: list[float] = []
        for r in range(ROUNDS):
            order = [(True, old), (False, new)]
            if r % 2:
                order.reverse()
            for disable, acc in order:
                acc.append(round(run(name, disable), 3))
        out[name] = {
            "old_median": round(statistics.median(old), 3),
            "new_median": round(statistics.median(new), 3),
            "old": old,
            "new": new,
        }
        print(json.dumps({name: out[name]}), flush=True)
    os.environ.pop("SIS_DISABLE_FANOUT", None)
    spark.stop()


if __name__ == "__main__":
    main()
