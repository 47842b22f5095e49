"""The fallback metadata schema: dump-everything ingestion when no
configured schema matches a file.

Mirrors the reference's shipped fallback pipeline
(/root/reference/src/fallback_metadata_schema/dump.py:13-117 and its
dumped ess-fallback.imsc.yml): selector ``*``, an order so large it
always loses to any configured schema, NXS-sourced identity fields,
SC proposal enrichment keyed by the file's experiment identifier, and a
handful of VALUE templates (handle-prefixed pid, dirname-2 source
folder, pinned ``<now>`` creation time).

Spark-first: the fallback is just another compiled schema — the same
``plans.compiler`` output, selected by ``fallback_id`` in
``operators.selectors.with_selected_schema`` for rows no CASE WHEN arm
claimed. No separate code path, no per-file branching.
"""

from __future__ import annotations

from scicat_ingestor_spark.plans.schema_model import MetadataSchema

FALLBACK_SCHEMA_ID = "scicat-ingestor-fallback-schema"

# Field-for-field mirror of the reference's _FallBackSchema
# (/root/reference/src/fallback_metadata_schema/dump.py:14-117).
FALLBACK_SCHEMA_DICT: dict = {
    "id": FALLBACK_SCHEMA_ID,
    "name": "Fall Back Metadata Schema",
    "instrument": "*",
    "selector": "*",
    # "No reason. Just a big number" — same stance as the reference:
    # sorts after every configured schema, so first-match never picks it
    # unless nothing else matched.
    "order": 9999999999,
    "variables": {
        "job_id": {
            "source": "NXS",
            "value_type": "string",
            "path": "/entry/entry_identifier_uuid",
        },
        "pid": {
            "source": "VALUE",
            "value_type": "string",
            "value": "20.500.12269/<job_id>",
        },
        "proposal_id": {
            "source": "NXS",
            "value_type": "string",
            "path": "/entry/experiment_identifier",
        },
        "pi_firstname": {
            "source": "SC",
            "url": "proposals/<proposal_id>",
            "field": "pi_firstname",
            "value_type": "string",
        },
        "pi_lastname": {
            "source": "SC",
            "url": "proposals/<proposal_id>",
            "field": "pi_lastname",
            "value_type": "string",
        },
        "pi_email": {
            "source": "SC",
            "url": "proposals/<proposal_id>",
            "field": "pi_email",
            "value_type": "string",
        },
        "dataset_name": {
            "source": "NXS",
            "path": "entry/title",
            "value_type": "string",
        },
        "source_folder": {
            "source": "VALUE",
            "operator": "dirname-2",
            "value": "<data_file_path>",
            "value_type": "string",
        },
    },
    "schema": {
        "pid": {
            "machine_name": "pid",
            "field_type": "high_level",
            "value": "<pid>",
            "type": "string",
        },
        "dataset_name": {
            "machine_name": "datasetName",
            "field_type": "high_level",
            "value": "<dataset_name>",
            "type": "string",
        },
        "principal_investigator": {
            "machine_name": "principalInvestigator",
            "field_type": "high_level",
            "value": "<pi_firstname> <pi_lastname>",
            "type": "string",
        },
        "creation_location": {
            "machine_name": "creationLocation",
            "field_type": "high_level",
            "value": "ESS",
            "type": "string",
        },
        "owner": {
            "machine_name": "owner",
            "field_type": "high_level",
            "value": "<pi_firstname> <pi_lastname>",
            "type": "string",
        },
        "owner_email": {
            "machine_name": "ownerEmail",
            "field_type": "high_level",
            "value": "<pi_email>",
            "type": "string",
        },
        "source_folder": {
            "machine_name": "sourceFolder",
            "field_type": "high_level",
            "value": "<source_folder>",
            "type": "string",
        },
        "contact_email": {
            "machine_name": "contactEmail",
            "field_type": "high_level",
            "value": "<pi_email>",
            "type": "string",
        },
        "creation_time": {
            "machine_name": "creationTime",
            "field_type": "high_level",
            "value": "<now>",
            "type": "date",
        },
    },
}


def fallback_schema() -> MetadataSchema:
    return MetadataSchema.from_dict(FALLBACK_SCHEMA_DICT)


def dump_fallback_schema(path: str) -> None:
    """Write the fallback schema as imsc YAML — the equivalent of running
    the reference's ``fallback_metadata_schema.dump`` module
    (/root/reference/src/fallback_metadata_schema/dump.py:119-125,
    including the provenance header line)."""
    import yaml

    body = yaml.safe_dump(FALLBACK_SCHEMA_DICT, sort_keys=False)
    with open(path, "w") as fh:
        fh.write(f"# Written by: {__name__}\n" + body)
