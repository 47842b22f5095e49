"""ScicatDataset envelope assembly (SURVEY §2.2 P8-P12, §2.6 A1-A2).

The reference's output row is the 24-field ``ScicatDataset`` dataclass
(/root/reference/src/scicat_dataset.py:469-506) with:
- mandatory-field introspection (fields without defaults) and raise on
  absence (:497-506, :912-928) — here a data-quality channel instead of
  an exception, so one bad record never kills the batch (T4);
- unexpected-field pruning with a warning (:930-945);
- config-default coalesce for instrumentId/proposalId/ownerGroup/
  accessGroups (:954-978);
- size/numberOfFiles aggregates over the datafile list (:907-910).
"""

from __future__ import annotations

import warnings

from pyspark.sql import Column
from pyspark.sql import functions as F

# Canonical field order of the ScicatDataset dataclass
# (/root/reference/src/scicat_dataset.py:469-496).
DATASET_FIELDS: tuple[str, ...] = (
    "pid",
    "size",
    "numberOfFiles",
    "isPublished",
    "datasetName",
    "description",
    "principalInvestigator",
    "creationLocation",
    "scientificMetadata",
    "owner",
    "ownerEmail",
    "sourceFolder",
    "contactEmail",
    "creationTime",
    "type",
    "sampleId",
    "techniques",
    "instrumentId",
    "proposalId",
    "ownerGroup",
    "accessGroups",
    "startTime",
    "endTime",
    "runNumber",
    "keywords",
)

# Fields with no dataclass default => mandatory
# (mirrors ScicatDataset.mandatory_fields(), :497-506).
MANDATORY_FIELDS: tuple[str, ...] = (
    "pid",
    "size",
    "numberOfFiles",
    "datasetName",
    "principalInvestigator",
    "creationLocation",
    "scientificMetadata",
    "owner",
    "ownerEmail",
    "sourceFolder",
    "contactEmail",
    "creationTime",
)

# P11 default-coalesce targets (/root/reference/src/scicat_dataset.py:954-978)
DEFAULTABLE_FIELDS: tuple[str, ...] = (
    "instrumentId",
    "proposalId",
    "ownerGroup",
    "accessGroups",
)


def dataset_fields(
    mapping: dict[str, Column],
    defaults: dict[str, object] | None = None,
) -> tuple[dict[str, Column], Column]:
    """Assemble the envelope columns.

    Returns (fields, missing): ``fields`` maps every provided (and
    defaulted) canonical field name to its Column, unexpected names
    pruned with a warning (P9); ``missing`` is an ARRAY<STRING> of
    mandatory fields that are NULL for the row (P10 — the reference
    raises; we report, keeping the stream alive per T4).
    """
    defaults = defaults or {}
    unexpected = sorted(set(mapping) - set(DATASET_FIELDS))
    if unexpected:
        warnings.warn(
            f"Unexpected ScicatDataset fields dropped: {unexpected}",
            stacklevel=2,
        )

    fields: dict[str, Column] = {
        name: col for name, col in mapping.items() if name in DATASET_FIELDS
    }
    for name in DEFAULTABLE_FIELDS:
        if name in defaults:
            base = fields.get(name, F.lit(None))
            fields[name] = F.coalesce(base, F.lit(defaults[name]))

    missing_flags = [
        F.when(
            fields[name].isNull() if name in fields else F.lit(True),
            F.lit(name),
        )
        for name in MANDATORY_FIELDS
    ]
    missing = F.filter(F.array(*missing_flags), lambda x: x.isNotNull())
    return fields, missing


def size_and_count(file_sizes: Column) -> tuple[Column, Column]:
    """A1/A2 over an ARRAY of file sizes: None-filtered sum + length
    (/root/reference/src/scicat_dataset.py:907-910)."""
    present = F.filter(file_sizes, lambda x: x.isNotNull())
    total = F.aggregate(present, F.lit(0).cast("long"), lambda a, x: a + x.cast("long"))
    return total, F.size(file_sizes)
