"""Schema-lint devtool: validate imsc schema files before deployment.

Parity with the reference's devtool entry point
(/root/reference/src/scicat_devtools.py:17-30, wired as
``scicat_validate_ingestor_schema``): given a schema file or directory,
load each file, build the schema model, and report per-file errors /
warnings. The reference's checks are mirrored —

- structural load (MetadataSchema builds) —
  /root/reference/src/scicat_devtools.py:126-139
- JSON-format warning (YAML recommended) — :119-125
- mandatory machine names — :49-75
- selector format (``field:filter_type:value`` or nested dict) — :77-91
- valid field types — :94-113

— plus two engine-side lints the reference cannot do (it evaluates
variables imperatively; this engine compiles them, so dangling
references are statically visible):

- every ``<placeholder>`` in a schema field's template must name a
  defined variable or a system default (V4);
- a VALUE variable's template may only reference variables defined
  BEFORE it (the sequential let-binding contract, V5 —
  /root/reference/src/scicat_dataset.py:668-689 evaluates in dict
  order, so a forward reference silently yields an empty value there;
  here it is a lint error).

Config-plane only: no SparkSession needed, so the CLI starts in
milliseconds — schema authors run it in a pre-commit hook. The full
compile-against-the-engine check stays in pytest
(tests/test_reference_schemas.py), which does need a session.

Usage:  python -m scicat_ingestor_spark.apps.schema_lint <file-or-dir>
Exit code 0 when every file is valid, 1 otherwise.
"""

from __future__ import annotations

import json
import pathlib
import re
import sys
from dataclasses import dataclass

from scicat_ingestor_spark.plans.schema_model import (
    SCHEMA_FILE_SUFFIXES,
    VALID_FIELD_TYPES,
    MetadataSchema,
    load_schema_file,
)

# /root/reference/src/scicat_devtools.py:53-62
MANDATORY_MACHINE_NAMES = {
    "datasetName",
    "principalInvestigator",
    "creationLocation",
    "owner",
    "ownerEmail",
    "sourceFolder",
    "contactEmail",
    "creationTime",
}

# system defaults available to every template without declaration (V4,
# /root/reference/src/scicat_dataset.py:61-108)
SYSTEM_VARIABLES = {"ingestor_run_id", "data_file_path", "now", "checksum"}

_PLACEHOLDER = re.compile(r"<([^<>]+)>")


@dataclass
class Finding:
    level: str  # "error" | "warning"
    message: str


def _is_json_text(text: str) -> bool:
    """The reference treats any text that json.loads accepts as JSON
    (/root/reference/src/scicat_metadata.py ``_is_json_file``)."""
    try:
        json.loads(text)
        return True
    except (ValueError, TypeError):
        return False


def _placeholders(value) -> set[str]:
    """Every <placeholder> name in a template value (str/list/dict)."""
    if isinstance(value, str):
        return set(_PLACEHOLDER.findall(value))
    if isinstance(value, list):
        return set().union(*(_placeholders(v) for v in value)) if value else set()
    if isinstance(value, dict):
        names: set[str] = set()
        for k, v in value.items():
            names |= _placeholders(k) | _placeholders(v)
        return names
    return set()


def _check_selector(selector, findings: list[Finding]) -> None:
    """Selector string must be ``field:filter_type:value``; dict
    combinators recurse (/root/reference/src/scicat_devtools.py:77-91)."""
    if isinstance(selector, str):
        if selector != "*" and len(selector.split(":")) != 3:
            findings.append(
                Finding(
                    "error",
                    f"invalid selector {selector!r}: expected "
                    "'field:filter_type:value'",
                )
            )
    elif isinstance(selector, dict):
        for conditions in selector.values():
            for item in conditions:
                _check_selector(item, findings)
    elif selector is not None:
        findings.append(
            Finding("error", f"selector must be string or dict, got "
                             f"{type(selector).__name__}")
        )


def lint_schema(schema: MetadataSchema) -> list[Finding]:
    """Model-level lints on an already-loaded schema."""
    findings: list[Finding] = []

    # WARNING, not error: the reference's devtool logs this as an error
    # (/root/reference/src/scicat_devtools.py:49-75), yet the reference's
    # own shipped examples (base/coda/dream/loki.imsc.yml.example) omit
    # creationLocation/creationTime/sourceFolder — ingest still works
    # (the envelope fills PID policy / defaults), so this is deployment
    # policy, not a structural break.
    machine_names = {f.machine_name for f in schema.fields}
    missing = MANDATORY_MACHINE_NAMES - machine_names
    if missing:
        findings.append(
            Finding(
                "warning",
                "missing mandatory fields: " + ", ".join(sorted(missing)),
            )
        )

    _check_selector(schema.selector, findings)

    for f in schema.fields:
        if f.field_type not in VALID_FIELD_TYPES:
            findings.append(
                Finding(
                    "error",
                    f"field {f.machine_name!r}: invalid field_type "
                    f"{f.field_type!r} (valid: {', '.join(VALID_FIELD_TYPES)})",
                )
            )

    # engine lints: dangling / forward template references
    defined: set[str] = set()
    for v in schema.variables:
        if v.source == "VALUE":
            for name in _placeholders(v.value):
                if name in defined or name in SYSTEM_VARIABLES:
                    continue
                if any(v2.name == name for v2 in schema.variables):
                    # WARNING: the reference evaluates in dict order, so
                    # a forward/self reference silently yields an empty
                    # value there (and lands in this engine's V3 failure
                    # channel) — the reference's own coda example ships
                    # a self-reference (coda.imsc.yml.example:59-62), so
                    # tolerated-but-flagged, not fatal
                    findings.append(
                        Finding(
                            "warning",
                            f"variable {v.name!r} references {name!r} "
                            "before it is defined (variables bind "
                            "sequentially; this evaluates empty)",
                        )
                    )
                else:
                    findings.append(
                        Finding(
                            "error",
                            f"variable {v.name!r} references undefined "
                            f"variable {name!r}",
                        )
                    )
        defined.add(v.name)

    for f in schema.fields:
        for name in _placeholders(f.value):
            if name not in defined and name not in SYSTEM_VARIABLES:
                findings.append(
                    Finding(
                        "error",
                        f"field {f.machine_name!r} references undefined "
                        f"variable {name!r}",
                    )
                )
    return findings


def lint_file(path) -> list[Finding]:
    """Load + lint one schema file; a failed load is a single error."""
    p = pathlib.Path(path)
    findings: list[Finding] = []
    try:
        text = p.read_text()
    except OSError as e:
        return [Finding("error", f"cannot read: {e}")]
    if not p.name.endswith(".json") and _is_json_text(text):
        # reference warns (and fails) YAML-named files with JSON bodies
        # (/root/reference/src/scicat_devtools.py:119-125); here it is a
        # warning — the loader accepts both
        findings.append(
            Finding("warning", "JSON body in a YAML-suffixed file; "
                               "YAML is recommended for new schemas")
        )
    try:
        schema = load_schema_file(p)
    except Exception as e:  # malformed YAML/JSON or model build failure
        findings.append(Finding("error", f"invalid structure: {e}"))
        return findings
    return findings + lint_schema(schema)


def collect_target_files(target) -> list[pathlib.Path]:
    """File -> itself; directory -> every *.imsc.{yml,yaml,json} inside
    (/root/reference/src/scicat_devtools.py:17-34). ``.example``-suffixed
    schema files (as shipped in the reference's resources/) are picked
    up too."""
    p = pathlib.Path(target)
    if not p.exists():
        raise FileNotFoundError(f"schema path {p} does not exist")
    if p.is_file():
        return [p]
    files = sorted(
        f
        for f in p.iterdir()
        if f.is_file()
        and not f.name.startswith(".")
        and any(
            f.name.endswith(s) or f.name.endswith(s + ".example")
            for s in SCHEMA_FILE_SUFFIXES
        )
    )
    if not files:
        raise FileNotFoundError(f"no schema files found in {p}")
    return files


def main(argv: list[str] | None = None) -> int:
    import argparse

    parser = argparse.ArgumentParser(
        prog="schema_lint",
        description="Validate imsc metadata schema files "
        "(reference parity: scicat_validate_ingestor_schema).",
    )
    parser.add_argument(
        "schema_file",
        help="schema file or directory; a directory is scanned for "
        "*.imsc.{yml,yaml,json}[.example]",
    )
    args = parser.parse_args(argv)

    files = collect_target_files(args.schema_file)
    n_errors = 0
    for f in files:
        findings = lint_file(f)
        errors = [x for x in findings if x.level == "error"]
        warnings = [x for x in findings if x.level == "warning"]
        status = "INVALID" if errors else "VALID"
        print(f"{status}: {f}")
        for x in errors + warnings:
            print(f"  [{x.level}] {x.message}")
        n_errors += len(errors)
    print(f"{len(files)} file(s) checked, {n_errors} error(s)")
    return 0 if n_errors == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
