"""imsc metadata-schema model — the engine's query language.

Mirrors the reference's schema classes
(/root/reference/src/scicat_metadata.py:111-276): a schema is
(id, name, order, selector, variables, schema-projection). Variables are
an ORDERED let-binding list over three sources
(NXS | SC | VALUE — /root/reference/src/scicat_metadata.py:111-171);
the ``schema`` section projects variables into output fields split into
``high_level`` vs ``scientific_metadata``
(/root/reference/src/scicat_dataset.py:695-698).

Loading accepts the reference's YAML/JSON imsc layout
(documentation/docs/user-guide/metadata-schemas.md) via ``from_dict``.
"""

from __future__ import annotations

from dataclasses import dataclass
from dataclasses import field as dc_field
from typing import Any

HIGH_LEVEL = "high_level"
SCIENTIFIC_METADATA = "scientific_metadata"
VALID_FIELD_TYPES = (HIGH_LEVEL, SCIENTIFIC_METADATA)


@dataclass(frozen=True)
class VariableDef:
    name: str
    source: str  # "NXS" | "SC" | "VALUE"
    value_type: str = "string"
    # NXS: HDF5 dataset path, may contain wildcards/regex segments (S7)
    path: str | None = None
    # SC: catalog resource + field projection ('' => whole object)
    url: str | None = None
    field: str | None = None
    # VALUE: template over earlier variables
    value: Any = None
    operator: str | None = None
    operator_args: dict = dc_field(default_factory=dict)
    unit: str | None = None  # config override (/root/reference/src/scicat_dataset.py:312-314)

    @classmethod
    def from_dict(cls, name: str, d: dict) -> "VariableDef":
        return cls(
            name=name,
            source=d.get("source", "VALUE"),
            value_type=d.get("value_type", "string"),
            path=d.get("path"),
            url=d.get("url"),
            field=d.get("field"),
            value=d.get("value"),
            operator=d.get("operator"),
            operator_args={
                k: v
                for k, v in d.items()
                if k in ("pattern", "replacement", "key", "index")
            }
            # the reference's getitem reads its key from the recipe's
            # `field` (/root/reference/src/scicat_dataset.py:192-197;
            # usage resources/small-ymir.imsc.yml.example:59-70)
            | (
                {"key": d["field"]}
                if d.get("operator") == "getitem" and "field" in d and "key" not in d
                else {}
            ),
            unit=d.get("unit"),
        )


@dataclass(frozen=True)
class SchemaField:
    machine_name: str
    value: Any  # template string over variables
    field_type: str = HIGH_LEVEL
    human_name: str | None = None
    value_type: str = "string"

    @classmethod
    def from_dict(cls, key: str, d: dict) -> "SchemaField":
        return cls(
            machine_name=d.get("machine_name", key),
            value=d.get("value"),
            field_type=d.get("field_type", HIGH_LEVEL),
            human_name=d.get("human_name", d.get("machine_name", key)),
            # the reference's schema items name this key "type"
            # (resources/*.imsc.yml.example); accept both spellings
            value_type=d.get("value_type", d.get("type", "string")),
        )


@dataclass(frozen=True)
class MetadataSchema:
    id: str
    name: str
    order: int
    selector: Any
    variables: tuple[VariableDef, ...]
    fields: tuple[SchemaField, ...]

    @classmethod
    def from_dict(cls, d: dict) -> "MetadataSchema":
        return cls(
            id=d["id"],
            name=d.get("name", d["id"]),
            order=int(d.get("order", 0)),
            selector=d.get("selector", "*"),
            variables=tuple(
                VariableDef.from_dict(k, v)
                for k, v in (d.get("variables") or {}).items()
            ),
            fields=tuple(
                SchemaField.from_dict(k, v) for k, v in (d.get("schema") or {}).items()
            ),
        )


SCHEMA_FILE_SUFFIXES = (".imsc.yml", ".imsc.yaml", ".imsc.json")


def list_schema_files(directory: str) -> list:
    """S19: non-hidden ``*.imsc.yml|yaml|json`` files in a directory
    (/root/reference/src/scicat_metadata.py:29-55)."""
    import pathlib

    root = pathlib.Path(directory)
    return sorted(
        p
        for p in root.iterdir()
        if p.is_file()
        and not p.name.startswith(".")
        and any(p.name.endswith(s) for s in SCHEMA_FILE_SUFFIXES)
    )


def load_schema_file(path) -> MetadataSchema:
    """One schema file (YAML or JSON) -> MetadataSchema
    (/root/reference/src/scicat_metadata.py:58-88). Files without an
    explicit id get a deterministic one derived from the file name."""
    import hashlib
    import json
    import pathlib

    p = pathlib.Path(path)
    text = p.read_text()
    if p.name.endswith(".json"):
        data = json.loads(text)
    else:
        import yaml

        data = yaml.safe_load(text)
    data.setdefault("id", hashlib.md5(p.name.encode()).hexdigest())
    data.setdefault("name", p.name.split(".imsc")[0])
    return MetadataSchema.from_dict(data)


def collect_schemas(directory: str) -> list[MetadataSchema]:
    """S19 + O1: load every schema in a directory, ordered by
    (order, name.capitalize()) — the first-match scan order
    (/root/reference/src/scicat_metadata.py:328-346). Config-plane:
    runs once on the driver at plan-compile time."""
    schemas = [load_schema_file(p) for p in list_schema_files(directory)]
    return sorted(schemas, key=lambda s: (s.order, s.name.capitalize()))
