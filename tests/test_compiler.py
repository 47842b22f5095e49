"""Schema-compiler tests mirroring the reference's variable-extraction and
dataset-assembly cases (/root/reference/tests/test_scicat_dataset.py:82-284,
tests/test_scicat_metadata_schema.py:271-357)."""

from pyspark.sql import functions as F

from scicat_ingestor_spark.functions.scalar import with_unit
from scicat_ingestor_spark.plans.compiler import compile_schema, render_template
from scicat_ingestor_spark.plans.schema_model import MetadataSchema

SCHEMA = MetadataSchema.from_dict(
    {
        "id": "test-schema",
        "name": "test",
        "order": 0,
        "selector": "*",
        "variables": {
            "job_id": {"source": "VALUE", "value": "<raw_job_id>", "value_type": "string"},
            "title": {
                "source": "VALUE",
                "value": "Run <job_id>",
                "value_type": "string",
            },
            "temp_sum": {
                "source": "NXS",
                "path": "/entry/sensor/temps",
                "operator": "sum",
                "value_type": "float",
            },
            "bad_int": {
                "source": "VALUE",
                "value": "not-a-number",
                "value_type": "integer",
            },
        },
        "schema": {
            "jobId": {
                "machine_name": "jobId",
                "value": "<job_id>",
                "field_type": "high_level",
            },
            "datasetName": {
                "machine_name": "datasetName",
                "value": "<title>",
                "field_type": "high_level",
            },
            "temperature": {
                "machine_name": "temperature",
                "human_name": "Temperature sum",
                "value": "<temp_sum>",
                "field_type": "scientific_metadata",
                "value_type": "float",
            },
        },
    }
)


def _input(spark):
    return spark.createDataFrame(
        [("/data/f1.nxs", "job-1", [1.0, 2.0]), ("/data/f2.nxs", "job-2", [5.0, 7.5])],
        ["data_file_path", "raw_job_id", "temps"],
    )


def _resolvers():
    # NXS resolver for tests: read from the `temps` array column with unit K
    return {"NXS": lambda var: with_unit(F.col("temps"), "K")}


def _extra_env():
    # seed the template environment with an input column
    return {"raw_job_id": with_unit(F.col("raw_job_id"))}


class TestCompiler:
    def test_end_to_end(self, spark):
        transform = compile_schema(SCHEMA, resolvers=_resolvers(), extra_env=_extra_env())
        # raw_job_id must be visible to templates via a seed variable:
        out = transform(_input(spark))
        rows = {r["jobId"]["value"]: r for r in out.collect()}
        assert rows["job-1"]["datasetName"]["value"] == "Run job-1"
        sci = rows["job-2"]["scientificMetadata"]["temperature"]
        assert sci["value"] == "12.5"
        assert sci["unit"] == "K"
        assert sci["human_name"] == "Temperature sum"

    def test_failures_reported_not_raised(self, spark):
        transform = compile_schema(SCHEMA, resolvers=_resolvers(), extra_env=_extra_env())
        out = transform(_input(spark))
        # bad_int nulls out but the row survives (V3)
        assert out.count() == 2
        assert all(r["_failures"] == ["bad_int"] for r in out.collect())

    def test_exact_placeholder_keeps_unit(self, spark):
        env = {"v": with_unit(F.lit(3.5), "mm")}
        out = spark.range(1).select(render_template("<v>", env).alias("o")).collect()[0]["o"]
        assert out["value"] == 3.5 and out["unit"] == "mm"

    def test_embedded_placeholder_drops_unit(self, spark):
        env = {"v": with_unit(F.lit(3.5), "mm")}
        out = spark.range(1).select(render_template("x=<v>!", env).alias("o")).collect()[0]["o"]
        assert out["value"] == "x=3.5!" and out["unit"] == ""

    def test_unresolved_placeholder_fails_variable_not_plan(self, spark):
        # V3 parity: the reference raises per-variable at eval time and
        # tolerates it; here the render yields NULL so only the variable
        # fails (the reference's own base.imsc.yml.example ships a
        # dangling reference that must not kill the schema)
        out = spark.range(1).select(render_template("<missing>", {}).alias("r")).first()
        assert out["r"]["value"] is None
        mixed = spark.range(1).select(
            render_template("a <missing> b", {}).alias("r")
        ).first()
        assert mixed["r"]["value"] is None

    def test_default_variables_deterministic(self, spark):
        transform = compile_schema(SCHEMA, resolvers=_resolvers(), extra_env=_extra_env())
        a = transform(_input(spark)).select("data_file_path").count()
        b = transform(_input(spark)).select("data_file_path").count()
        assert a == b == 2


def test_fallback_schema_dump_roundtrip(tmp_path):
    """The dump-everything fallback pipeline (S19 +
    /root/reference/src/fallback_metadata_schema/dump.py): the shipped
    dict compiles, dumps to imsc YAML with the provenance header, loads
    back via the normal schema collector, and sorts after any configured
    schema."""
    from scicat_ingestor_spark.plans.fallback import (
        FALLBACK_SCHEMA_ID,
        dump_fallback_schema,
        fallback_schema,
    )
    from scicat_ingestor_spark.plans.schema_model import collect_schemas

    s = fallback_schema()
    assert s.id == FALLBACK_SCHEMA_ID
    assert s.selector == "*"
    assert s.order == 9999999999

    out = tmp_path / "fallback.imsc.yml"
    dump_fallback_schema(str(out))
    text = out.read_text()
    assert text.startswith("# Written by: scicat_ingestor_spark.plans.fallback\n")

    loaded = collect_schemas(str(tmp_path))
    assert [x.id for x in loaded] == [FALLBACK_SCHEMA_ID]
    back = loaded[0]
    assert {v.name for v in back.variables} == {v.name for v in s.variables}
    assert [f.machine_name for f in back.fields] == [f.machine_name for f in s.fields]
