#!/usr/bin/env python3
"""Scan every registered query's formatted plan for duplicated Python
subtrees (MapInPandas/ArrowEvalPython instances) and missing exchange
reuse. Build-only (no noop execution), so eager builders (census
collects, localCheckpoints) still run their build-time jobs.

Usage: python tools/scan_dup.py [out.tsv]
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from scicat_ingestor_spark.queries import QUERIES
    from scicat_ingestor_spark.session import get_session

    spark = get_session(
        "scan_dup", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    out = open(sys.argv[1], "w") if len(sys.argv) > 1 else sys.stdout
    print("query\tbuild_s\tpy_nodes\tscans\treused\texchanges", file=out)
    for name in QUERIES:
        t0 = time.perf_counter()
        try:
            df = QUERIES[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # builder needs services the scan lacks
            print(f"{name}\tERROR\t{e}", file=out)
            continue
        dt = time.perf_counter() - t0
        # node-ids in the details section: "(12) MapInPandas"
        py = len(re.findall(r"^\(\d+\) (?:MapInPandas|ArrowEvalPython|BatchEvalPython|MapInArrow|FlatMapGroupsInPandas)", plan, re.M))
        scans = len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M))
        reused = len(re.findall(r"^\(\d+\) ReusedExchange", plan, re.M))
        exch = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
        print(f"{name}\t{dt:.2f}\t{py}\t{scans}\t{reused}\t{exch}", file=out, flush=True)
    if out is not sys.stdout:
        out.close()
    spark.stop()


if __name__ == "__main__":
    main()
