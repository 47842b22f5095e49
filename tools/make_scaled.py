#!/usr/bin/env python3
"""Materialize an N-times-scaled copy of a testdata dir for scale
measurements (SCALE.md "Measured scaling"). Fact tables are replicated
with id offsets so key cardinality scales with the data (duplicated ids
would collapse groupBys/anti-joins and understate shuffle cost);
document text gets a per-replica token so replicas are near- but not
exact duplicates (keeps LSH bucket sizes realistic instead of
manufacturing 100-way identical-text pathologies). Dimension tables are
copied as-is.

Usage: python tools/make_scaled.py N [src_sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scicat_ingestor_spark.session import get_session  # noqa: E402

DIMS = ["region", "nation", "customer", "supplier", "part"]
FACTS = {
    # table -> columns to offset per replica (id-spaces stay disjoint)
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> None:
    n = int(sys.argv[1])
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/spark_graft_scale/x{n}"
    os.makedirs(out, exist_ok=True)
    spark = get_session("make_scaled")

    for t in DIMS:
        shutil.copy(f"{src}/{t}.parquet", f"{out}/{t}.parquet")

    for t, id_cols in FACTS.items():
        df = spark.read.parquet(f"{src}/{t}.parquet")
        offsets = {c: df.agg(F.max(c)).first()[0] + 1 for c in id_cols}
        rep = df.crossJoin(spark.range(n).withColumnRenamed("id", "_rep"))
        for c, off in offsets.items():
            rep = rep.withColumn(c, F.col(c) + F.col("_rep") * F.lit(off))
        if t == "documents":
            rep = rep.withColumn(
                "text", F.concat("text", F.lit(" r"), F.col("_rep"))
            )
        rep.drop("_rep").repartition(32).write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
        print(f"{t}: x{n} -> {out}/{t}.parquet")


if __name__ == "__main__":
    main()
