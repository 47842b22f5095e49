"""Join operators (SURVEY §2.5 J1-J7).

The reference does per-record REST lookups (proposals, instruments,
samples, dataset-exists probes). Spark-first re-expression: the catalog
resources become *dimension DataFrames* joined with explicit
``broadcast()`` hints (they are tiny next to the fact stream — at 100 TB
fact scale these joins must never shuffle the fact side), and the two
exists-probes become LEFT ANTI joins, which is also the engine's
idempotency/dedup mechanism under at-least-once streaming delivery
(reference commits offsets only after success,
/root/reference/src/scicat_online_ingestor.py:84-91).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def enrich(
    facts: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | "F.Column",
    how: str = "left",
) -> DataFrame:
    """J1-style dimension enrichment: broadcast equi-join
    (reference: per-file GET proposals/<id>,
    /root/reference/src/fallback_metadata_schema/dump.py:33-50)."""
    return facts.join(F.broadcast(dim), on, how)


def lookup_first_ci(
    facts: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    order_col: str,
) -> DataFrame:
    """J2: case-insensitive key lookup returning the FIRST dim row per key
    (reference: instruments ilike filter + getitem 0,
    /root/reference/resources/small-ymir.imsc.yml.example:54-70).

    row_number over the dim (small side) BEFORE the join: the window runs
    on the dimension only, so the fact table is never shuffled.
    """
    w = Window.partitionBy(F.lower(F.col(dim_key))).orderBy(order_col)
    first_per_key = (
        dim.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .withColumn("_join_key", F.lower(F.col(dim_key)))
    )
    out = facts.withColumn("_join_key", F.lower(F.col(fact_key))).join(
        F.broadcast(first_per_key), "_join_key", "left"
    )
    return out.drop("_join_key")


def anti_by_key(new_rows: DataFrame, existing: DataFrame, key: str) -> DataFrame:
    """J4: exists-by-pid dedup as LEFT ANTI JOIN
    (/root/reference/src/scicat_offline_ingestor.py:67-85).

    No distinct on the probe side: anti-join semantics ignore duplicate
    build keys and the join's hash relation dedups them anyway — a
    distinct here would only add a full extra shuffle + aggregate."""
    return new_rows.join(existing.select(key), key, "left_anti")


def anti_by_metadata(
    new_rows: DataFrame,
    existing: DataFrame,
    meta_col: str,
    meta_key: str,
    new_col: str,
) -> DataFrame:
    """J5: exists-by-metadata dedup — anti join on an extracted map value
    (/root/reference/src/scicat_offline_ingestor.py:88-125; default key
    job_id, src/scicat_configuration.py:328)."""
    probe = existing.select(
        F.element_at(F.col(meta_col), meta_key).getField("value").alias("_probe")
    ).filter(F.col("_probe").isNotNull())
    return new_rows.join(
        probe, new_rows[new_col].cast("string") == probe["_probe"], "left_anti"
    )


def merge_id_lists(a: "F.Column", b: "F.Column") -> "F.Column":
    """J7: sampleId merge — set union of schema-provided and queried ids
    (/root/reference/src/scicat_dataset.py:980-991)."""
    return F.array_distinct(
        F.concat(
            F.coalesce(a, F.array().cast("array<string>")),
            F.coalesce(b, F.array().cast("array<string>")),
        )
    )
