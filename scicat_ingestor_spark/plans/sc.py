"""SC-source variables: catalog lookups as dimension joins (SURVEY §2.1
S10-S13, §2.5 J1-J3, design stance §7).

The reference evaluates SC variables by issuing an HTTP GET per record
mid-evaluation (url template like ``proposals/<proposal_id>``, optional
single-field projection — /root/reference/src/scicat_dataset.py:389-414,
/root/reference/src/scicat_communication.py:14-24). That's per-row
network I/O inside the interpreter.

Spark-first: each catalog resource is a **dimension snapshot DataFrame**
broadcast-joined once per plan; the SC resolver then reads the joined
columns. The url's key template renders through the same V2 machinery,
so ``proposals/<proposal_id>`` keys the join on the rendered variable.
A live REST mode would swap the snapshot for a foreachBatch fetch — the
plan shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PREFIX = "_sc"


def _col_name(resource: str, field: str) -> str:
    return f"{_PREFIX}_{resource}_{field}"


def attach_dimension(
    df: DataFrame,
    dim: DataFrame,
    resource: str,
    key: Column,
    dim_key: str,
) -> DataFrame:
    """Broadcast-join one catalog resource snapshot.

    ``key`` is the fact-side join key (typically a rendered variable,
    e.g. the <proposal_id> from the url template); ``dim_key`` the
    dimension's key column. Dimension columns land under
    ``_sc_<resource>_<col>`` for the resolver. LEFT join: a missing
    catalog row yields NULLs -> V3 failure channel, like the
    reference's 404 tolerance (/root/reference/src/scicat_communication.py:161-193).
    """
    renamed = dim.select(
        [F.col(c).alias(_col_name(resource, c)) for c in dim.columns]
    )
    return df.join(
        F.broadcast(renamed),
        key == F.col(_col_name(resource, dim_key)),
        "left",
    )


def make_sc_resolver():
    """SourceResolver for SC variables: url ``<resource>/...`` + field
    projection -> the broadcast-joined column. ``field`` '' or None
    follows the reference's whole-object mode — here the resource's
    row struct is not materialized, so it resolves to the resource key
    column set; we require an explicit field for clarity and raise
    otherwise."""
    from scicat_ingestor_spark.functions.scalar import with_unit

    def resolve(var) -> Column:
        if not var.url:
            raise ValueError(f"SC variable {var.name!r} needs a url")
        resource = var.url.strip("/").split("/")[0]
        if not var.field:
            raise ValueError(
                f"SC variable {var.name!r}: field projection required "
                "(whole-object mode is not supported on the snapshot plan)"
            )
        return with_unit(F.col(_col_name(resource, var.field)))

    return resolve
