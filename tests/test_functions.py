"""Unit tests for the cast library and scalar operator registry,
mirroring the reference's converter/operator cases
(/root/reference/tests/test_scicat_dataset.py:21-143)."""

import pytest
from pyspark.sql import functions as F

from scicat_ingestor_spark.functions.casts import cast_to_type
from scicat_ingestor_spark.functions.scalar import apply_operator, with_unit


def _one(spark, col):
    return spark.range(1).select(col.alias("out")).collect()[0]["out"]


class TestCasts:
    def test_string(self, spark):
        assert _one(spark, cast_to_type(F.lit(42), "string")) == "42"

    def test_integer_truncates_float(self, spark):
        # reference: int(1.9) == 1 (tests/test_scicat_dataset.py:58)
        assert _one(spark, cast_to_type(F.lit(1.9), "integer")) == 1

    def test_integer_from_bad_string_is_null(self, spark):
        # reference raises on int("1.2"); we null + report (SURVEY §1.2)
        assert _one(spark, cast_to_type(F.lit("1.2"), "integer")) is None

    def test_float(self, spark):
        assert _one(spark, cast_to_type(F.lit("3.5"), "float")) == 3.5

    def test_string_array_from_literal(self, spark):
        assert _one(spark, cast_to_type(F.lit("[1, 2]"), "string[]")) == ["1", "2"]

    def test_integer_array_from_pythonish_literal(self, spark):
        assert _one(spark, cast_to_type(F.lit("['1', '2']"), "integer[]")) == [1, 2]

    def test_date_from_iso(self, spark):
        out = _one(spark, cast_to_type(F.lit("2024-01-02T03:04:05"), "date"))
        assert out == "2024-01-02T03:04:05Z"

    def test_date_from_epoch(self, spark):
        out = _one(spark, cast_to_type(F.lit(0), "date"))
        assert out == "1970-01-01T00:00:00Z"

    def test_dict(self, spark):
        out = _one(spark, cast_to_type(F.lit("{'a': 'b'}"), "dict"))
        assert out == {"a": "b"}

    def test_unknown_type_raises(self):
        with pytest.raises(ValueError):
            cast_to_type(F.lit(1), "nope")


class TestScalarOps:
    def test_default_is_identity(self, spark):
        v = with_unit(F.lit("x"), "mm")
        out = _one(spark, apply_operator(None, v))
        assert out["value"] == "x" and out["unit"] == "mm"

    def test_join_with_space_is_comma_space(self, spark):
        # despite the name: ", " (reference tests/test_scicat_metadata_schema.py:352-354)
        v = with_unit(F.array(F.lit("a"), F.lit("b")))
        assert _one(spark, apply_operator("join_with_space", v))["value"] == "a, b"

    def test_filename_dirname(self, spark):
        v = with_unit(F.lit("/a/b/c.txt"))
        assert _one(spark, apply_operator("filename", v))["value"] == "c.txt"
        assert _one(spark, apply_operator("dirname", v))["value"] == "/a/b"
        assert _one(spark, apply_operator("dirname-2", v))["value"] == "/a"

    def test_getitem_list_and_unit_kept(self, spark):
        v = with_unit(F.array(F.lit(10), F.lit(20)), "m")
        out = _one(spark, apply_operator("getitem", v, key=1))
        assert out["value"] == 20 and out["unit"] == "m"

    def test_str_replace_literal_not_regex(self, spark):
        v = with_unit(F.lit("a.b.c"))
        out = _one(
            spark, apply_operator("str-replace", v, pattern=".", replacement="-")
        )
        assert out["value"] == "a-b-c"

    def test_urlsafe_matches_quote_plus(self, spark):
        import urllib.parse

        raw = "a b/c&d"
        v = with_unit(F.lit(raw))
        assert _one(spark, apply_operator("urlsafe", v))["value"] == urllib.parse.quote_plus(raw)

    def test_case_ops(self, spark):
        v = with_unit(F.lit("MiXeD"))
        assert _one(spark, apply_operator("to-lower", v))["value"] == "mixed"
        assert _one(spark, apply_operator("to-upper", v))["value"] == "MIXED"

    def test_sum_forwards_unit(self, spark):
        # reference tests/test_scicat_dataset.py:120
        v = with_unit(F.array(F.lit(1.0), F.lit(2.5)), "counts")
        out = _one(spark, apply_operator("sum", v))
        assert out["value"] == 3.5 and out["unit"] == "counts"
