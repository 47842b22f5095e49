#!/usr/bin/env python3
"""Save .explain("formatted") output for named queries to plans/r11/.

Usage: python tools/save_plans.py before q1 q2 ...
       python tools/save_plans.py after q1 q2 ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    from scicat_ingestor_spark.queries import QUERIES
    from scicat_ingestor_spark.session import get_session

    # SAVE_PLANS_AQE=off: capture the statically-planned tree, where
    # cross-branch exchange reuse prints as ReusedExchange. With AQE on
    # (the production default) the same reuse happens in the runtime
    # stage cache, but explain-before-execution prints the expanded
    # initial plan — useless as evidence of the collapse.
    extra = {"spark.ui.showConsoleProgress": "false"}
    if os.environ.get("SAVE_PLANS_AQE") == "off":
        extra["spark.sql.adaptive.enabled"] = "false"
    spark = get_session("save_plans", extra_conf=extra)
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("PLANS_DIR", "r12"),
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_exch = plan.count("Exchange")
        n_py = (
            plan.count("ArrowEvalPython")
            + plan.count("BatchEvalPython")
            + plan.count("MapInPandas")
            + plan.count("MapInArrow")
        )
        print(f"{name}: exchanges={n_exch} python_nodes={n_py} -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
