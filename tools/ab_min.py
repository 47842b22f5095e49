#!/usr/bin/env python3
"""min-of-N A/B of the shared-fanout optimization (SIS_DISABLE_FANOUT).

Hypervisor steal on this box only ever ADDS time, so min-of-N within
one session is the noise-robust comparison statistic (medians smeared
2x in earlier captures). Variants alternate per repeat so steal bursts
decorrelate from variant.

Usage: AB_N=5 python tools/ab_min.py q1 [q2 ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("AB_N", "5"))


def main() -> None:
    names = sys.argv[1:]
    from scicat_ingestor_spark.queries import QUERIES
    from scicat_ingestor_spark.session import get_session

    spark = get_session(
        "ab_min", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )

    def run(name: str, disable: bool) -> float:
        os.environ["SIS_DISABLE_FANOUT"] = "1" if disable else "0"
        t0 = time.perf_counter()
        df = QUERIES[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for name in names:
        run(name, True)
        run(name, False)
        old, new = [], []
        for r in range(N):
            order = [(True, old), (False, new)]
            if r % 2:
                order.reverse()
            for disable, acc in order:
                acc.append(round(run(name, disable), 3))
        print(
            json.dumps(
                {
                    name: {
                        "old_min": min(old),
                        "new_min": min(new),
                        "old": old,
                        "new": new,
                    }
                }
            ),
            flush=True,
        )
    os.environ.pop("SIS_DISABLE_FANOUT", None)
    spark.stop()


if __name__ == "__main__":
    main()
