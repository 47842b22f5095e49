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


def make_sc_resolver(resource_fields: dict[str, tuple[str, ...]] | None = None):
    """SourceResolver for SC variables: url ``<resource>/...`` + field
    projection -> the broadcast-joined column.

    ``field: ''`` is the reference's whole-object mode
    (/root/reference/src/scicat_communication.py:14-24, used by real
    schemas: resources/small-ymir.imsc.yml.example `proposal_data`): the
    row comes back as one value and later ``getitem`` variables project
    it. Supported here when the resource's columns were registered via
    ``resource_fields`` — the joined columns fold into a
    MAP<string,string> (value_type ``dict``) or a single-element array of
    that map (value_type ``list``, matching the filtered-query-returns-a-
    list shape that ``getitem 0`` then unwraps).

    Leading ``:`` on a field name is stripped (a recurring typo in the
    reference's shipped examples, e.g. ``field: :pi_lastname`` in
    resources/coda.imsc.yml.example — the reference would fail the
    variable at runtime and continue; we resolve the intended field).
    """
    from scicat_ingestor_spark.functions.scalar import with_unit

    resource_fields = resource_fields or {}

    def resolve(var) -> Column:
        if not var.url:
            raise ValueError(f"SC variable {var.name!r} needs a url")
        resource = var.url.strip("/").split("/")[0].split("?")[0]
        field = (var.field or "").lstrip(":") if var.field is not None else None
        if not field:
            cols = resource_fields.get(resource)
            if not cols:
                raise ValueError(
                    f"SC variable {var.name!r}: whole-object mode needs "
                    f"resource_fields[{resource!r}] registered"
                )
            as_map = F.map_from_arrays(
                F.array(*[F.lit(c) for c in cols]),
                F.array(
                    *[F.col(_col_name(resource, c)).cast("string") for c in cols]
                ),
            )
            # absent catalog row (LEFT-join NULLs) -> NULL object, not a
            # map of NULLs: same signal as the reference's 404
            any_hit = F.greatest(
                *[F.col(_col_name(resource, c)).isNotNull() for c in cols]
            ) if len(cols) > 1 else F.col(_col_name(resource, cols[0])).isNotNull()
            obj = F.when(any_hit, as_map)
            if var.value_type == "list":
                obj = F.when(any_hit, F.array(as_map))
            return with_unit(obj)
        return with_unit(F.col(_col_name(resource, field)))

    return resolve
