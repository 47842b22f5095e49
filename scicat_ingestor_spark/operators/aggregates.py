"""Aggregate operators (SURVEY §2.6 A1-A7).

All are built-in Column aggregates except the common-path aggregate,
which is re-expressed with a scale-friendly trick: the longest common
'/'-segment prefix of a SET of paths equals the common segment prefix of
just its lexicographic MIN and MAX elements. So instead of
``collect_list`` (unbounded per-group state — would not survive 100 TB),
we aggregate two scalars (min, max) and compute the prefix with array
expressions. Mirrors ``os.path.commonpath`` used for the dataset
sourceFolder (/root/reference/src/scicat_dataset.py:1013-1029).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def common_segment_prefix(a: Column, b: Column, sep: str = "/") -> Column:
    """Longest common `sep`-segment prefix of two path strings, as a path.

    transform marks per-segment equality; the first mismatch index bounds
    the slice. All built-in array expressions — stays in codegen.
    """
    sa = F.split(a, sep)
    sb = F.split(b, sep)
    n = F.least(F.size(sa), F.size(sb))
    # 1-based index of first mismatching segment within the overlap; 0 if none
    mismatch = F.array_position(
        F.zip_with(F.slice(sa, 1, n), F.slice(sb, 1, n), lambda x, y: x != y),
        F.lit(True),
    )
    prefix_len = F.when(mismatch > 0, mismatch - 1).otherwise(n)
    return F.concat_ws(sep, F.slice(sa, 1, prefix_len))


def commonpath_agg(path: Column, sep: str = "/") -> Column:
    """Aggregate expression: os.path.commonpath over a group, via the
    min/max trick (constant per-group state; shuffle carries 2 strings)."""
    return common_segment_prefix(F.min(path), F.max(path), sep)


def unit_consensus(unit: Column) -> Column:
    """A5: keep the unit if every combined value agrees, else ''
    (/root/reference/src/scicat_metadata.py:314-316,321-323; tested
    tests/test_scicat_dataset.py:112-120)."""
    distinct_units = F.collect_set(unit)
    return F.when(F.size(distinct_units) == 1, distinct_units[0]).otherwise(F.lit(""))


def unit_consensus_over_array(units: Column) -> Column:
    """Row-local variant for an array of units (template rendering of
    lists/dicts, /root/reference/src/scicat_metadata.py:304-325)."""
    distinct_units = F.array_distinct(units)
    return F.when(F.size(distinct_units) == 1, distinct_units[0]).otherwise(F.lit(""))


def dataset_size(size: Column) -> Column:
    """A1: sum of file sizes, None-filtered
    (/root/reference/src/scicat_dataset.py:907-909)."""
    return F.sum(F.when(size.isNotNull(), size))


def number_of_files(size: Column) -> Column:
    """A2: len(data_file_list) (/root/reference/src/scicat_dataset.py:910)."""
    return F.count(F.lit(1))
