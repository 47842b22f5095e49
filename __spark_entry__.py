"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship compiled-ingest-pipeline query on sf0.001.
queries(): one entry per implemented operator from SURVEY.md §2 (plus
training-data-pipeline extensions); see scicat_ingestor_spark.queries.
oracle_sql(): DuckDB twins; see scicat_ingestor_spark.oracles.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scicat_ingestor_spark.oracles import ORACLES  # noqa: E402
from scicat_ingestor_spark.queries import QUERIES, q_ingest_e2e  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_ingest_e2e(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
