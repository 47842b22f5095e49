"""Schema -> DataFrame-transform compiler.

The reference interprets a schema per record
(``extract_variables_values``, /root/reference/src/scicat_dataset.py:375-427:
seed default variables -> evaluate each variable in YAML order
(NXS | SC | VALUE dispatch -> operator -> cast) -> project schema fields).
Here the SAME semantics compile ONCE into a chain of Column expressions —
Catalyst collapses the chained projections, so per-record interpretation
cost disappears and everything stays in whole-stage codegen.

Semantics preserved:
- V2 template interpolation (/root/reference/src/scicat_metadata.py:279-325):
  a template that is exactly ``<var>`` substitutes the whole value AND
  keeps the unit; embedded placeholders render to string and drop units.
- V3 per-variable error tolerance
  (/root/reference/src/scicat_dataset.py:348-372): a failed variable never
  fails the row — we use try-semantics casts; NULL-with-error lands in a
  ``_failures`` array column instead of an exception.
- V4 default variables (/root/reference/src/scicat_dataset.py:327-345),
  with nondeterminism pinned: ``ingestor_run_id`` is a deterministic
  hash of the file path + batch id (retry-safe under Spark task retries,
  unlike ``uuid4`` — SURVEY §7 Hard parts), ``now`` is the batch
  timestamp, not per-row wall clock.
- V5 sequential let-binding: later variables may reference earlier ones;
  compiled by threading a name->Column environment through the loop.
- V6 final cast per declared value_type (§1.2 registry).
"""

from __future__ import annotations

import re
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scicat_ingestor_spark.functions.casts import cast_array_elements, cast_to_type
from scicat_ingestor_spark.functions.scalar import apply_operator, with_unit
from scicat_ingestor_spark.plans.schema_model import (
    HIGH_LEVEL,
    SCIENTIFIC_METADATA,
    MetadataSchema,
    VariableDef,
)

_PLACEHOLDER = re.compile(r"<([^<>]+)>")


def default_variables(
    file_path_col: str,
    batch_ts: Column | None = None,
    schema_id: str = "",
    files_directory: str = "",
) -> dict[str, Column]:
    """V4 system variables (/root/reference/src/scicat_dataset.py:327-345),
    all unit ''. ingestor_run_id deterministic (md5 of path) so task
    retries produce identical rows."""
    path = F.col(file_path_col).cast("string")
    now = batch_ts if batch_ts is not None else F.current_timestamp()
    return {
        "ingestor_run_id": with_unit(F.md5(path)),
        "data_file_path": with_unit(path),
        "data_file_name": with_unit(F.substring_index(path, "/", -1)),
        "now": with_unit(F.date_format(now, "yyyy-MM-dd'T'HH:mm:ssXXX")),
        "ingestor_files_directory": with_unit(F.lit(files_directory)),
        "ingestor_metadata_schema_id": with_unit(F.lit(schema_id)),
    }


def _unit_consensus(units: list[Column]) -> Column:
    """A5: one distinct unit -> keep it; disagreement -> ''
    (/root/reference/src/scicat_metadata.py:314-323)."""
    if not units:
        return F.lit("")
    distinct = F.array_distinct(F.array(*units))
    return F.when(F.size(distinct) == 1, F.element_at(distinct, 1)).otherwise(F.lit(""))


def render_template(template, env: dict[str, Column]) -> Column:
    """V2 (/root/reference/src/scicat_metadata.py:279-325).

    Exactly ``<var>`` -> the variable struct itself (value + unit kept).
    Mixed text -> concat of literals and stringified values, unit ''.
    dict -> rendered keys+values as MAP<STRING,STRING>; list -> rendered
    items as ARRAY<STRING>; both take the unit consensus of their items.
    Unresolved ``<...>`` yields a NULL value so the variable lands in the
    ``_failures`` channel — the reference raises at eval time and the
    per-variable tolerance catches it, skipping just that variable
    (/root/reference/src/scicat_metadata.py:300-304,
    src/scicat_dataset.py:388-426; its own shipped base.imsc.yml.example
    ships such a dangling reference). Other non-string templates become
    literals.
    """
    if isinstance(template, dict):
        items = [
            (render_template(k, env), render_template(v, env))
            for k, v in template.items()
        ]
        value = F.map_from_arrays(
            F.array(*[rk.getField("value").cast("string") for rk, _ in items]),
            F.array(*[rv.getField("value").cast("string") for _, rv in items]),
        )
        return with_unit(value, _unit_consensus([rv.getField("unit") for _, rv in items]))
    if isinstance(template, (list, tuple)):
        items = [render_template(v, env) for v in template]
        value = F.array(*[r.getField("value").cast("string") for r in items])
        return with_unit(value, _unit_consensus([r.getField("unit") for r in items]))
    if not isinstance(template, str):
        return with_unit(F.lit(template))
    _null = with_unit(F.lit(None).cast("string"))
    exact = _PLACEHOLDER.fullmatch(template.strip())
    if exact:
        name = exact.group(1)
        if name not in env:
            return _null
        return env[name]
    parts: list[Column] = []
    pos = 0
    for m in _PLACEHOLDER.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos : m.start()]))
        name = m.group(1)
        if name not in env:
            return _null
        parts.append(env[name].getField("value").cast("string"))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    if not parts:
        return with_unit(F.lit(""))
    value = parts[0] if len(parts) == 1 else F.concat(*parts)
    return with_unit(value.cast("string"))


SourceResolver = Callable[[VariableDef], Column]
"""Maps a variable definition to its raw (value,unit) struct Column.

The engine wires these per deployment:
- NXS -> ``sources.hdf5`` long-table lookup (map column on the row)
- SC  -> columns produced by broadcast dimension joins (operators.joins)
"""


def compile_variable(
    var: VariableDef,
    env: dict[str, Column],
    resolvers: dict[str, SourceResolver],
) -> Column:
    """One variable: dispatch source -> operator -> unit override -> cast
    (/root/reference/src/scicat_dataset.py:389-420)."""
    if var.source == "VALUE":
        raw = render_template(var.value, env)
    else:
        resolver = resolvers.get(var.source)
        if resolver is None:
            raise ValueError(f"Unknown variable source: {var.source}")
        raw = resolver(var)
    out = apply_operator(var.operator, raw, **var.operator_args)
    if var.source == "NXS":
        # attr unit wins; config unit fills the gap
        # (/root/reference/src/scicat_dataset.py:311-314)
        unit = F.coalesce(
            F.nullif(out.getField("unit"), F.lit("")), F.lit(var.unit or "")
        )
    elif var.unit is not None:
        unit = F.lit(var.unit).cast("string")
    else:
        unit = out.getField("unit")
    wildcard_array = (
        var.source == "NXS"
        and var.path is not None
        and "*" in var.path
        and var.value_type.endswith("[]")
    )
    template_array = (
        var.source == "VALUE"
        and isinstance(var.value, (list, tuple))
        and (var.value_type.endswith("[]") or var.value_type == "list")
    )
    template_dict = (
        var.source == "VALUE"
        and isinstance(var.value, dict)
        and var.value_type == "dict"
    )
    # SC whole-object mode and getitem over complex values already carry
    # their final type (map / array of map) — re-casting through the
    # string-literal parsers would destroy them
    sc_object = var.source == "SC" and not (var.field or "").lstrip(":")
    getitem_complex = var.operator == "getitem" and var.value_type in (
        "dict",
        "list",
    )
    if wildcard_array or template_array:  # already a real array column
        value = cast_array_elements(out.getField("value"), var.value_type)
    elif template_dict or sc_object or getitem_complex:  # already typed
        value = out.getField("value")
    else:
        value = cast_to_type(out.getField("value"), var.value_type)
    return with_unit(value, unit)


def compile_schema(
    schema: MetadataSchema,
    file_path_col: str = "data_file_path",
    resolvers: dict[str, SourceResolver] | None = None,
    batch_ts: Column | None = None,
    extra_env: dict[str, Column] | None = None,
) -> Callable[[DataFrame], DataFrame]:
    """Compile a MetadataSchema into a DataFrame transform.

    Output columns: one STRUCT<value,unit> per high-level field (under its
    machine_name), plus ``scientificMetadata`` as
    MAP<STRING, STRUCT<value,unit,human_name,type>> matching the
    reference's output shape (/root/reference/src/scicat_dataset.py:763-774),
    plus ``_failures`` ARRAY<STRING> of variable names whose evaluation
    produced NULL from a non-NULL source (V3 reporting channel).
    """
    resolvers = resolvers or {}

    def transform(df: DataFrame) -> DataFrame:
        env = default_variables(
            file_path_col, batch_ts=batch_ts, schema_id=schema.id
        )
        env.update(extra_env or {})
        # Materialize every variable as a real column in ONE projection
        # (lateral column aliases give the let-binding): each variable is
        # computed once per row and downstream references are attribute
        # refs, not re-inlined copies of the whole upstream tree. Without
        # this, a chain of N variables each referencing the previous one
        # builds an O(2^N)-node expression — slow to construct over py4j
        # and re-evaluated per reference at runtime.
        proj: list[Column] = [F.col("*")]
        var_cols: list[str] = []
        for i, (name, expr) in enumerate(list(env.items())):
            alias = f"_v{i}_{name}"
            proj.append(expr.alias(alias))
            var_cols.append(alias)
            env[name] = F.col(alias)
        for i, var in enumerate(schema.variables):  # V5: ordered let-binding
            alias = f"_w{i}_{var.name}"
            proj.append(compile_variable(var, env, resolvers).alias(alias))
            var_cols.append(alias)
            env[var.name] = F.col(alias)
        df = df.select(*proj)

        failure_flags = [
            F.when(env[v.name].getField("value").isNull(), F.lit(v.name))
            for v in schema.variables
        ]
        out = df
        field_cols: dict[str, Column] = {}
        sci_entries: list[Column] = []
        array_vars = {
            v.name
            for v in schema.variables
            if v.value_type.endswith("[]") or v.value_type == "list"
        }
        dict_vars = {v.name for v in schema.variables if v.value_type == "dict"}
        for fld in schema.fields:
            rendered = render_template(fld.value, env)
            exact = (
                _PLACEHOLDER.fullmatch(fld.value.strip())
                if isinstance(fld.value, str)
                else None
            )
            if (
                exact
                and exact.group(1) in array_vars
                and (fld.value_type.endswith("[]") or fld.value_type == "list")
            ):
                # whole-value substitution of an array variable: the
                # rendered value IS an array column already
                value = cast_array_elements(rendered.getField("value"), fld.value_type)
            elif exact and exact.group(1) in dict_vars and fld.value_type == "dict":
                value = rendered.getField("value")  # already MAP<STRING,STRING>
            else:
                value = cast_to_type(rendered.getField("value"), fld.value_type)
            if fld.field_type == HIGH_LEVEL:
                field_cols[fld.machine_name] = with_unit(
                    value, rendered.getField("unit")
                )
            elif fld.field_type == SCIENTIFIC_METADATA:
                sci_entries.append(F.lit(fld.machine_name))
                sci_entries.append(
                    F.struct(
                        value.cast("string").alias("value"),
                        rendered.getField("unit").alias("unit"),
                        F.lit(fld.human_name).alias("human_name"),
                        F.lit(fld.value_type).alias("type"),
                    )
                )
            # invalid field_type: warned + ignored in the reference (P7)
        if sci_entries:
            field_cols["scientificMetadata"] = F.create_map(*sci_entries)
        if failure_flags:
            field_cols["_failures"] = F.filter(
                F.array(*failure_flags), lambda x: x.isNotNull()
            )
        if field_cols:
            out = out.withColumns(field_cols)
        return out.drop(*var_cols)

    return transform
