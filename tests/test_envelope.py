"""ScicatDataset envelope semantics (P9-P11, A1-A2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scicat_ingestor_spark.plans.envelope import (
    DATASET_FIELDS,
    MANDATORY_FIELDS,
    dataset_fields,
    size_and_count,
)


def test_canonical_field_count():
    # the 25 dataclass fields (/root/reference/src/scicat_dataset.py:469-496)
    assert len(DATASET_FIELDS) == 25
    assert set(MANDATORY_FIELDS) <= set(DATASET_FIELDS)


def test_unexpected_field_pruned_with_warning(spark):
    with pytest.warns(UserWarning, match="bogus"):
        fields, _ = dataset_fields({"pid": F.lit("x"), "bogus": F.lit(1)})
    assert "bogus" not in fields and "pid" in fields


def test_defaults_and_missing_channel(spark):
    fields, missing = dataset_fields(
        {"pid": F.lit("p"), "ownerGroup": F.lit(None).cast("string")},
        defaults={"ownerGroup": "ess", "accessGroups": "open"},
    )
    row = (
        spark.range(1)
        .select(
            fields["ownerGroup"].alias("og"),
            fields["accessGroups"].alias("ag"),
            missing.alias("missing"),
        )
        .first()
    )
    assert row["og"] == "ess" and row["ag"] == "open"
    # pid provided; every other mandatory field absent
    assert "pid" not in row["missing"]
    assert set(row["missing"]) == set(MANDATORY_FIELDS) - {"pid"}


def test_size_and_count_none_filtered(spark):
    sizes = F.array(F.lit(10), F.lit(None).cast("long"), F.lit(5))
    total, n = size_and_count(sizes)
    row = spark.range(1).select(total.alias("t"), n.alias("n")).first()
    # sum skips NULLs; count includes every listed file (reference
    # filters None for the sum at :907-909 but len() counts all :910)
    assert row["t"] == 15 and row["n"] == 3
