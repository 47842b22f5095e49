"""Selector compiler tests mirroring the reference's schema-selection
cases (/root/reference/tests/test_scicat_metadata_schema.py:59-268)."""

from pyspark.sql import functions as F

from scicat_ingestor_spark.operators.selectors import (
    compile_selector,
    schema_sort_key,
    with_selected_schema,
)


def _df(spark):
    return spark.createDataFrame(
        [("/data/coda_123.nxs",), ("/data/ymir_7.nxs",), ("/other/x.nxs",)],
        ["filename"],
    )


class TestSelectors:
    def test_starts_with(self, spark):
        df = _df(spark).filter(compile_selector("filename:starts_with:/data"))
        assert df.count() == 2

    def test_contains(self, spark):
        df = _df(spark).filter(compile_selector("filename:contains:coda"))
        assert df.count() == 1

    def test_match_all(self, spark):
        assert _df(spark).filter(compile_selector("*")).count() == 3

    def test_invalid_selector_matches_nothing(self, spark):
        assert _df(spark).filter(compile_selector("bogus")).count() == 0
        assert _df(spark).filter(compile_selector("filename:nope:a")).count() == 0

    def test_or_and_combinators(self, spark):
        sel = {"or": ["filename:contains:coda", "filename:contains:ymir"]}
        assert _df(spark).filter(compile_selector(sel)).count() == 2
        sel = {"and": ["filename:starts_with:/data", "filename:contains:ymir"]}
        assert _df(spark).filter(compile_selector(sel)).count() == 1

    def test_sort_key_capitalize_tiebreak(self):
        # (order, name.capitalize()) — reference :334-342
        schemas = [
            {"id": "b", "name": "beta", "order": 1},
            {"id": "a", "name": "Alpha", "order": 1},
            {"id": "z", "name": "zeta", "order": 0},
        ]
        assert [s["id"] for s in sorted(schemas, key=schema_sort_key)] == ["z", "a", "b"]

    def test_first_match_wins_with_fallback(self, spark):
        schemas = [
            {"id": "coda", "order": 0, "selector": "filename:contains:coda"},
            {"id": "any_data", "order": 1, "selector": "filename:starts_with:/data"},
        ]
        out = {
            r["filename"]: r["schema_id"]
            for r in with_selected_schema(
                _df(spark), schemas, fallback_id="fallback"
            ).collect()
        }
        assert out == {
            "/data/coda_123.nxs": "coda",  # first match, not any_data
            "/data/ymir_7.nxs": "any_data",
            "/other/x.nxs": "fallback",
        }


class TestSchemaFileCollection:
    """S19: directory scan + YAML/JSON load + first-match ordering
    (/root/reference/src/scicat_metadata.py:29-88,328-346)."""

    def _write_dir(self, tmp_path):
        (tmp_path / "b.imsc.yml").write_text(
            "id: coda\nname: coda\norder: 0\n"
            "selector: 'filename:contains:coda'\n"
            "variables:\n  t:\n    source: VALUE\n    value: x\n"
        )
        (tmp_path / "a.imsc.json").write_text(
            '{"id": "ymir", "name": "ymir", "order": 1,'
            ' "selector": "filename:starts_with:/data"}'
        )
        (tmp_path / ".hidden.imsc.yml").write_text("id: nope")
        (tmp_path / "readme.txt").write_text("not a schema")
        return tmp_path

    def test_collect_schemas_filters_and_orders(self, tmp_path):
        from scicat_ingestor_spark.plans.schema_model import collect_schemas

        schemas = collect_schemas(self._write_dir(tmp_path))
        assert [s.id for s in schemas] == ["coda", "ymir"]  # order asc
        assert schemas[0].variables[0].name == "t"

    def test_collected_schemas_drive_selection(self, spark, tmp_path):
        from scicat_ingestor_spark.plans.schema_model import collect_schemas

        schemas = collect_schemas(self._write_dir(tmp_path))
        out = {
            r["filename"]: r["schema_id"]
            for r in with_selected_schema(
                _df(spark), schemas, fallback_id="fallback"
            ).collect()
        }
        assert out == {
            "/data/coda_123.nxs": "coda",
            "/data/ymir_7.nxs": "ymir",
            "/other/x.nxs": "fallback",
        }

    def test_defaults_from_filename(self, tmp_path):
        from scicat_ingestor_spark.plans.schema_model import load_schema_file

        p = tmp_path / "site.imsc.yaml"
        p.write_text("selector: '*'\norder: 3\n")
        s = load_schema_file(p)
        assert s.name == "site" and s.order == 3 and len(s.id) == 32
