"""Schema-lint devtool (reference parity:
/root/reference/src/scicat_devtools.py) — the reference's shipped
schemas lint clean; deliberately broken fixtures report each break."""

from __future__ import annotations

import os

import pytest

from scicat_ingestor_spark.apps import schema_lint

REF_RESOURCES = "/root/reference/resources"

GOOD = """\
id: "test-good"
name: good
order: 1
selector: "filename:starts_with:/data"
variables:
  run_title:
    source: NXS
    path: /entry/title
  owner:
    source: VALUE
    value: "user-<run_title>"
schema:
  datasetName:
    machine_name: datasetName
    value: "<run_title>"
  owner:
    machine_name: owner
    value: "<owner>"
  principalInvestigator: {machine_name: principalInvestigator, value: "x"}
  creationLocation: {machine_name: creationLocation, value: "x"}
  ownerEmail: {machine_name: ownerEmail, value: "x"}
  sourceFolder: {machine_name: sourceFolder, value: "x"}
  contactEmail: {machine_name: contactEmail, value: "x"}
  creationTime: {machine_name: creationTime, value: "<now>"}
"""


@pytest.mark.skipif(
    not os.path.isdir(REF_RESOURCES), reason="reference resources absent"
)
def test_reference_resources_all_valid(capsys):
    """Every shipped reference schema passes (exit 0). The reference's
    own examples violate two of its documented policies (mandatory
    machine names; a self-referencing variable) — those surface as
    warnings, not errors."""
    rc = schema_lint.main([REF_RESOURCES])
    out = capsys.readouterr().out
    assert rc == 0
    assert "INVALID" not in out
    assert out.count("VALID") == 6
    assert "[warning] missing mandatory fields" in out
    assert "references 'acquisition_team_members'" in out


def test_good_schema_is_clean(tmp_path):
    p = tmp_path / "good.imsc.yml"
    p.write_text(GOOD)
    findings = schema_lint.lint_file(p)
    assert findings == []


def test_broken_selector_and_field_type(tmp_path):
    p = tmp_path / "broken.imsc.yml"
    p.write_text(
        GOOD.replace(
            'selector: "filename:starts_with:/data"', 'selector: "justonepart"'
        ).replace(
            'owner:\n    machine_name: owner\n    value: "<owner>"',
            'owner:\n    machine_name: owner\n    value: "<owner>"\n'
            "    field_type: not_a_type",
        )
    )
    findings = schema_lint.lint_file(p)
    msgs = [f.message for f in findings if f.level == "error"]
    assert any("invalid selector" in m for m in msgs)
    assert any("invalid field_type" in m for m in msgs)


def test_undefined_variable_is_error(tmp_path):
    p = tmp_path / "dangling.imsc.yml"
    p.write_text(GOOD.replace("<run_title>", "<no_such_var>"))
    findings = schema_lint.lint_file(p)
    errors = [f.message for f in findings if f.level == "error"]
    assert any("undefined variable 'no_such_var'" in m for m in errors)


def test_forward_reference_is_warning(tmp_path):
    p = tmp_path / "forward.imsc.yml"
    p.write_text(
        GOOD.replace(
            'value: "user-<run_title>"', 'value: "user-<late_var>"'
        ).replace(
            "schema:\n",
            '  late_var:\n    source: VALUE\n    value: "z"\nschema:\n',
        )
    )
    findings = schema_lint.lint_file(p)
    warns = [f.message for f in findings if f.level == "warning"]
    assert any("before it is defined" in m for m in warns)
    assert not [f for f in findings if f.level == "error"]


def test_unparseable_file_is_invalid(tmp_path):
    p = tmp_path / "junk.imsc.yml"
    p.write_text("{{{{ not yaml: [")
    findings = schema_lint.lint_file(p)
    assert any(
        f.level == "error" and "invalid structure" in f.message for f in findings
    )


def test_cli_exit_codes(tmp_path, capsys):
    good = tmp_path / "good.imsc.yml"
    good.write_text(GOOD)
    assert schema_lint.main([str(tmp_path)]) == 0
    bad = tmp_path / "bad.imsc.yml"
    bad.write_text(GOOD.replace("<run_title>", "<missing>"))
    assert schema_lint.main([str(tmp_path)]) == 1
    capsys.readouterr()
