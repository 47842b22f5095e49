"""Type-cast library — the engine's closed `value_type` vocabulary.

Mirrors the reference's ``_DtypeConvertingMap``
(/root/reference/src/scicat_dataset.py:119-135, converters :42-116,
dispatch ``convert_to_type`` :138-145): a closed map from type-name to a
conversion; unknown names raise ``ValueError``.

Spark-first re-expression: every converter is a Column -> Column builder
using built-in (JVM-side, codegen'd) expressions — never a Python UDF.
Error semantics differ deliberately where Python raises and SQL nulls
(e.g. ``int("1.2")`` raises in the reference,
/root/reference/tests/test_scicat_dataset.py:58): we use ``try_cast``
semantics plus a side error channel (see plans.compiler `_failures`),
which preserves the reference's per-variable error tolerance
(/root/reference/src/scicat_dataset.py:348-372) without failing rows.

Array types accept either a real array column or a string holding a
Python/JSON literal (the reference uses ``ast.literal_eval``,
/root/reference/src/scicat_dataset.py:46-61): strings are parsed with
``from_json`` after normalizing single quotes, matching the
JSON-compatible-literal contract called out in SURVEY.md §7 Risks.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def _literal_array(col: Column, element_type: str) -> Column:
    """Parse a string literal like "[1, 2]" / "['a','b']" into an array.

    If the input is already an array (non-string), callers should cast
    directly; this helper is the string branch.
    """
    normalized = F.regexp_replace(col.cast("string"), r"'", '"')
    # Parse as strings first, then per-element cast — matches the
    # reference's literal_eval + per-element converter (so "['1','2']"
    # becomes [1, 2] for integer[], not [null, null]).
    parsed = F.from_json(normalized, "array<string>")
    if element_type == "string":
        return parsed
    return F.transform(parsed, lambda x: x.try_cast(element_type))


def _to_array(col: Column, element_type: str) -> Column:
    # Works for both array inputs (cast) and string-literal inputs
    # (from_json); chosen at plan-compile time by the caller when the
    # input type is known, else the string branch applies via cast.
    return F.when(
        col.cast("string").rlike(r"^\s*\["),
        _literal_array(col, element_type),
    ).otherwise(F.array(col.cast(element_type)))


def to_string(col: Column) -> Column:
    return col.cast("string")


def to_string_array(col: Column) -> Column:
    return _to_array(col, "string")


def to_integer(col: Column) -> Column:
    return col.try_cast("long")


def to_integer_array(col: Column) -> Column:
    return _to_array(col, "long")


def to_float(col: Column) -> Column:
    return col.try_cast("double")


def to_float_array(col: Column) -> Column:
    return _to_array(col, "double")


def to_date(col: Column) -> Column:
    """ISO-8601 output. String input -> parsed timestamp; numeric input ->
    UTC epoch seconds (reference /root/reference/src/scicat_dataset.py:72-79);
    anything else -> NULL. Output is the ISO string the reference emits.
    """
    # numeric test FIRST: try_to_timestamp("1000") would otherwise parse
    # a bare number as a year, while the reference treats every numeric
    # value as epoch seconds (:75-77)
    as_ts = F.when(
        col.cast("string").rlike(r"^-?[0-9]+(\.[0-9]+)?$"),
        F.timestamp_seconds(col.try_cast("double")),
    ).otherwise(F.try_to_timestamp(col.cast("string")))
    return F.date_format(as_ts, "yyyy-MM-dd'T'HH:mm:ssXXX")


def to_dict(col: Column) -> Column:
    normalized = F.regexp_replace(col.cast("string"), r"'", '"')
    return F.from_json(normalized, "map<string,string>")


def to_list(col: Column) -> Column:
    return to_string_array(col)


def return_none(col: Column) -> Column:  # noqa: ARG001 - signature parity
    return F.lit(None).cast("string")


CAST_REGISTRY: dict[str, Callable[[Column], Column]] = {
    "string": to_string,
    "string[]": to_string_array,
    "integer": to_integer,
    "integer[]": to_integer_array,
    "float": to_float,
    "float[]": to_float_array,
    "date": to_date,
    "dict": to_dict,
    "list": to_list,
    "email": to_string,  # no validation, as in the reference (TODO :133)
    "link": to_string,
    "none": return_none,
}


_ARRAY_ELEMENT_TYPES = {
    "string[]": "string",
    "integer[]": "long",
    "float[]": "double",
    "list": "string",
}


def cast_array_elements(col: Column, value_type: str) -> Column:
    """Per-element cast for inputs that are ALREADY arrays (e.g. wildcard
    NXS selectors) — mirrors the reference's list branch that maps the
    element converter without literal_eval
    (/root/reference/src/scicat_dataset.py:46-61)."""
    try:
        elem = _ARRAY_ELEMENT_TYPES[value_type]
    except KeyError:
        raise ValueError(f"Invalid array value type: {value_type}") from None
    if elem == "string":
        return F.transform(col, lambda x: x.cast("string"))
    return F.transform(col, lambda x: x.try_cast(elem))


def cast_to_type(col: Column, value_type: str) -> Column:
    """Dispatch like the reference's ``convert_to_type``: unknown type name
    raises ValueError (/root/reference/src/scicat_dataset.py:138-145)."""
    try:
        fn = CAST_REGISTRY[value_type]
    except KeyError:
        raise ValueError(f"Invalid value type: {value_type}") from None
    return fn(col)
