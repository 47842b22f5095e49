"""Scalar operator registry — the schema language's function library.

Mirrors the reference's ``_OPERATOR_REGISTRY``
(/root/reference/src/scicat_dataset.py:245-282; doc table
documentation/docs/user-guide/metadata-schemas.md:296-308): a closed,
named registry, default ``DO_NOTHING`` = identity; an eval-arbitrary-code
operator is deliberately excluded (reference :249-256).

Spark-first: every operator is a built-in Column expression (JVM-side,
inside whole-stage codegen) — no Python UDFs anywhere in this registry.
Operators receive and return the engine's unit-carrying variable struct
``STRUCT<value, unit: STRING>`` so unit-propagation rules survive
composition (reference passes ``(value_spec, recipe)`` for the same
reason, :268-274). ``sum`` forwards the unit unchanged (:237-242);
everything else that manufactures a new string drops it to ''.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def with_unit(value: Column, unit: Column | str = "") -> Column:
    """Build the engine's variable struct STRUCT<value, unit>."""
    unit_col = F.lit(unit) if isinstance(unit, str) else unit
    return F.struct(value.alias("value"), unit_col.cast("string").alias("unit"))


def _value(var: Column) -> Column:
    return var.getField("value")


def _unit(var: Column) -> Column:
    return var.getField("unit")


def _rewrap(var: Column, new_value: Column, keep_unit: bool = False) -> Column:
    unit = _unit(var) if keep_unit else F.lit("")
    return with_unit(new_value, unit)


# --- F1..F11 (SURVEY §2.4) -------------------------------------------------

def do_nothing(var: Column) -> Column:
    """F1 identity (/root/reference/src/scicat_dataset.py:148-153)."""
    return var


def join_with_space(var: Column) -> Column:
    """F2: join array elements with ", " — comma+space despite the name
    (/root/reference/src/scicat_dataset.py:156-163). NULL input stays
    NULL (concat_ws alone would yield '' and hide an upstream variable
    failure from the V3 channel)."""
    v = _value(var)
    return _rewrap(var, F.when(v.isNotNull(), F.concat_ws(", ", v)))


def filename(var: Column) -> Column:
    """F3 basename (/root/reference/src/scicat_dataset.py:166-171)."""
    return _rewrap(var, F.substring_index(_value(var).cast("string"), "/", -1))


def _dirname_expr(path: Column) -> Column:
    # os.path.dirname semantics for absolute-ish paths: strip last segment;
    # no '/' present -> '' (Python returns '' for bare names).
    return F.when(
        path.contains("/"),
        F.regexp_replace(path, r"/[^/]*$", ""),
    ).otherwise(F.lit(""))


def dirname(var: Column) -> Column:
    """F4 (/root/reference/src/scicat_dataset.py:174-179)."""
    return _rewrap(var, _dirname_expr(_value(var).cast("string")))


def dirname_2(var: Column) -> Column:
    """F5 grandparent dir (/root/reference/src/scicat_dataset.py:182-189)."""
    return _rewrap(var, _dirname_expr(_dirname_expr(_value(var).cast("string"))))


def getitem(var: Column, key: str | int) -> Column:
    """F6 index into list/dict (/root/reference/src/scicat_dataset.py:192-197).

    For array values pass an int (0-based, as Python); for map values a
    string key.
    """
    value = _value(var)
    if isinstance(key, int):
        picked = F.get(value, key)  # 0-based, null when out of range
    else:
        picked = F.element_at(value, key)
    return _rewrap(var, picked, keep_unit=True)


def str_replace(var: Column, pattern: str | None = None, replacement: str | None = None) -> Column:
    """F7 literal (non-regex) replace; missing params => identity
    (/root/reference/src/scicat_dataset.py:200-210)."""
    if pattern is None or replacement is None:
        return var
    return _rewrap(
        var,
        F.replace(_value(var).cast("string"), F.lit(pattern), F.lit(replacement)),
        keep_unit=True,
    )


def urlsafe(var: Column) -> Column:
    """F8 quote_plus (/root/reference/src/scicat_dataset.py:213-218).
    Spark's url_encode is application/x-www-form-urlencoded (space -> '+'),
    matching urllib.parse.quote_plus."""
    return _rewrap(var, F.url_encode(_value(var).cast("string")))


def to_lower(var: Column) -> Column:
    """F9 (/root/reference/src/scicat_dataset.py:221-226)."""
    return _rewrap(var, F.lower(_value(var).cast("string")))


def to_upper(var: Column) -> Column:
    """F10 (/root/reference/src/scicat_dataset.py:229-234)."""
    return _rewrap(var, F.upper(_value(var).cast("string")))


def array_sum(var: Column) -> Column:
    """F11 `sum` over an array value; forwards the unit unchanged
    (/root/reference/src/scicat_dataset.py:237-242; unit passthrough
    tested at tests/test_scicat_dataset.py:120)."""
    total = F.aggregate(
        _value(var),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double"),
    )
    return _rewrap(var, total, keep_unit=True)


OPERATOR_REGISTRY: dict[str, Callable[..., Column]] = {
    "DO_NOTHING": do_nothing,
    "join_with_space": join_with_space,
    "filename": filename,
    "dirname": dirname,
    "dirname-2": dirname_2,
    "getitem": getitem,
    "str-replace": str_replace,
    "urlsafe": urlsafe,
    "to-lower": to_lower,
    "to-upper": to_upper,
    "sum": array_sum,
}


def apply_operator(name: str | None, var: Column, **kwargs) -> Column:
    """Default-dispatch like the reference (:277-282): missing/unknown
    operator name falls back to DO_NOTHING (identity)."""
    fn = OPERATOR_REGISTRY.get(name or "DO_NOTHING", do_nothing)
    return fn(var, **kwargs) if kwargs else fn(var)
