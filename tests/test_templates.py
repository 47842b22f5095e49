"""V2 template-rendering semantics, mirroring the reference's tests
(/root/reference/tests/test_scicat_dataset.py:82-143 and
tests/test_scicat_metadata_schema.py:271-357): exact-match keeps unit,
mixed-string drops it, dict/list render with unit consensus, sum
forwards its unit, failures never kill the row.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from scicat_ingestor_spark.functions.scalar import apply_operator, with_unit
from scicat_ingestor_spark.plans.compiler import compile_schema, render_template
from scicat_ingestor_spark.plans.schema_model import MetadataSchema


def _one_row(spark, **cols):
    df = spark.range(1)
    for name, col in cols.items():
        df = df.withColumn(name, col)
    return df


def _eval(spark, col):
    return _one_row(spark).select(col.alias("out")).first()["out"]


def test_exact_match_keeps_unit(spark):
    env = {"temp": with_unit(F.lit(3.5), "K")}
    out = _eval(spark, render_template("<temp>", env))
    assert out["value"] == 3.5 and out["unit"] == "K"


def test_mixed_template_drops_unit(spark):
    env = {"temp": with_unit(F.lit(3.5), "K")}
    out = _eval(spark, render_template("T=<temp>", env))
    assert out["value"] == "T=3.5" and out["unit"] == ""


def test_list_template_unit_consensus_kept(spark):
    env = {"a": with_unit(F.lit(1), "m"), "b": with_unit(F.lit(2), "m")}
    out = _eval(spark, render_template(["<a>", "<b>"], env))
    assert out["value"] == ["1", "2"] and out["unit"] == "m"


def test_list_template_unit_consensus_dropped(spark):
    env = {"a": with_unit(F.lit(1), "m"), "b": with_unit(F.lit(2), "s")}
    out = _eval(spark, render_template(["<a>", "<b>"], env))
    assert out["value"] == ["1", "2"] and out["unit"] == ""


def test_dict_template_renders_keys_and_values(spark):
    env = {"k": with_unit(F.lit("width")), "v": with_unit(F.lit(7), "mm")}
    out = _eval(spark, render_template({"<k>": "<v>", "fixed": "x<v>y"}, env))
    assert dict(out["value"]) == {"width": "7", "fixed": "x7y"}
    assert out["unit"] == ""  # 'mm' vs '' (mixed item) disagree


def test_sum_operator_forwards_unit(spark):
    var = with_unit(F.array(F.lit(1.0), F.lit(2.5)), "counts")
    out = _eval(spark, apply_operator("sum", var))
    assert out["value"] == 3.5 and out["unit"] == "counts"


def test_failure_never_kills_row_and_is_reported(spark):
    schema = MetadataSchema.from_dict(
        {
            "id": "t",
            "variables": {
                "good": {"source": "VALUE", "value": "42", "value_type": "integer"},
                "bad": {"source": "VALUE", "value": "1.2", "value_type": "integer"},
            },
            "schema": {
                "g": {
                    "machine_name": "g",
                    "value": "<good>",
                    "field_type": "high_level",
                    "value_type": "integer",
                }
            },
        }
    )
    df = _one_row(spark, data_file_path=F.lit("/data/f.nxs"))
    row = compile_schema(schema)(df).first()
    # int("1.2") raises in the reference; here it nulls + reports (V3)
    assert row["g"]["value"] == 42
    assert row["_failures"] == ["bad"]


def test_dict_variable_through_schema(spark):
    schema = MetadataSchema.from_dict(
        {
            "id": "t",
            "variables": {
                "w": {"source": "VALUE", "value": "11", "value_type": "integer"},
                "geom": {
                    "source": "VALUE",
                    "value": {"width": "<w>", "shape": "box-<w>"},
                    "value_type": "dict",
                },
            },
            "schema": {
                "geometry": {
                    "machine_name": "geometry",
                    "value": "<geom>",
                    "field_type": "high_level",
                    "value_type": "dict",
                }
            },
        }
    )
    df = _one_row(spark, data_file_path=F.lit("/data/f.nxs"))
    row = compile_schema(schema)(df).first()
    assert dict(row["geometry"]["value"]) == {"width": "11", "shape": "box-11"}
