"""Plugin extractor registry (SURVEY §2.10 / A7).

The reference ships entry-point metadata extractors — a name->callable
registry defaulting to numpy max/min/mean
(/root/reference/pyproject.toml:94-97, loaded at
/root/reference/src/scicat_metadata.py:21-26, used as per-variable
aggregations over HDF5 array values).

Spark-first: the same plugin surface, but a registered extractor is a
Column -> Column builder over ARRAY values — built-in expressions first
(JVM-side, codegen'd), an Arrow-batched pandas UDF only as the escape
hatch for genuinely non-expressible callables. ``register`` is the
plugin hook (the entry-point loader would call it per installed plugin).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def _mean(col: Column) -> Column:
    total = F.aggregate(col, F.lit(0.0), lambda a, x: a + x.cast("double"))
    return F.when(F.size(col) > 0, total / F.size(col))


EXTRACTOR_REGISTRY: dict[str, Callable[[Column], Column]] = {
    "max": F.array_max,
    "min": F.array_min,
    "mean": _mean,
}


def register(name: str, fn: Callable[[Column], Column]) -> None:
    """Plugin hook: add/override an extractor. Mirrors the entry-point
    group `scicat_ingestor.metadata_extractor` (name -> callable)."""
    EXTRACTOR_REGISTRY[name] = fn


def register_pandas(name: str, fn, return_type: str = "double") -> None:
    """Escape hatch for plugins that need Python: wraps the callable in an
    Arrow-batched pandas UDF over the array column (never row-at-a-time).
    """
    import pandas as pd  # noqa: F401 - documents the batch contract
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(return_type)
    def _udf(s):
        return s.map(lambda arr: fn(arr) if arr is not None else None)

    EXTRACTOR_REGISTRY[name] = _udf


def apply_extractor(name: str, col: Column) -> Column:
    """Dispatch by name; unknown extractor raises (the reference would
    fail at entry-point resolution time)."""
    try:
        fn = EXTRACTOR_REGISTRY[name]
    except KeyError:
        raise ValueError(f"Unknown metadata extractor: {name}") from None
    return fn(col)
