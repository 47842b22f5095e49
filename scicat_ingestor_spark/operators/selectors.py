"""Selector predicate compiler — which schema applies to which record.

Mirrors the reference's imsc selector language
(/root/reference/src/scicat_metadata.py:352-413): atoms
``starts_with``/``contains`` on a target field (only ``filename`` in the
reference), the ``*`` match-all, and recursive ``and``/``or`` dict
combinators; plus first-match-wins schema selection over schemas sorted by
``(order, name.capitalize())`` (:328-346, scan :420-447).

Spark-first: each selector compiles to a boolean Column; schema selection
compiles to ONE short-circuiting ``CASE WHEN sel1 THEN id1 ...`` chain in
sorted order — the reference's early-exit loop becomes a single codegen'd
expression (SURVEY §2.2 P6, §4).
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ATOMS = {
    "starts_with": lambda col, arg: col.startswith(arg),
    "contains": lambda col, arg: col.contains(arg),
}


def compile_condensed(selector: str, field_resolver=None) -> Column:
    """Compile the condensed "target:function:arg" form
    (/root/reference/src/scicat_metadata.py:365-392). ``*`` matches all
    (:360-362). Invalid selectors match nothing (reference warns + no
    match)."""
    resolver = field_resolver or (lambda name: F.col(name))
    if selector == "*":
        return F.lit(True)
    parts = selector.split(":", 2)
    if len(parts) != 3:
        return F.lit(False)
    target, func, arg = parts
    atom = _ATOMS.get(func)
    if atom is None:
        return F.lit(False)
    return atom(resolver(target).cast("string"), arg)


def compile_selector(selector: Any, field_resolver=None) -> Column:
    """Compile a full selector: condensed string, or dict combinators
    {"or": [...]}/{"and": [...]} recursing over atoms
    (/root/reference/src/scicat_metadata.py:394-413)."""
    if isinstance(selector, str):
        return compile_condensed(selector, field_resolver)
    if isinstance(selector, dict):
        result: Column | None = None
        for key, clauses in selector.items():
            if key not in ("and", "or"):
                # unknown combinator: reference warns and contributes no match
                continue
            compiled = [compile_selector(c, field_resolver) for c in clauses]
            folded = compiled[0]
            for c in compiled[1:]:
                folded = (folded & c) if key == "and" else (folded | c)
            result = folded if result is None else (result & folded)
        return result if result is not None else F.lit(False)
    return F.lit(False)


def _get(schema: Any, key: str, default: Any = None) -> Any:
    """Field access for both dict-shaped schemas and MetadataSchema
    dataclass instances (plans.schema_model)."""
    if isinstance(schema, dict):
        return schema.get(key, default)
    return getattr(schema, key, default)


def schema_sort_key(schema: Any) -> tuple:
    """Sort key ``(order, name.capitalize())``
    (/root/reference/src/scicat_metadata.py:334-342)."""
    return (_get(schema, "order", 0), str(_get(schema, "name", "")).capitalize())


def select_schema_column(
    schemas: Sequence[dict],
    field_resolver=None,
    fallback_id: str | None = None,
) -> Column:
    """First-match-wins over sorted schemas as a single CASE WHEN chain
    (/root/reference/src/scicat_metadata.py:420-447). Returns the winning
    schema id per row; unmatched rows get ``fallback_id`` (the reference's
    fallback schema) or NULL."""
    ordered = sorted(schemas, key=schema_sort_key)
    expr: Column | None = None
    chain = None
    for schema in ordered:
        pred = compile_selector(_get(schema, "selector", "*"), field_resolver)
        sid = F.lit(_get(schema, "id"))
        chain = F.when(pred, sid) if chain is None else chain.when(pred, sid)
    if chain is None:
        return F.lit(fallback_id)
    expr = chain.otherwise(F.lit(fallback_id))
    return expr


def with_selected_schema(
    df: DataFrame,
    schemas: Sequence[dict],
    out_col: str = "schema_id",
    field_resolver=None,
    fallback_id: str | None = None,
) -> DataFrame:
    return df.withColumn(
        out_col, select_schema_column(schemas, field_resolver, fallback_id)
    )
