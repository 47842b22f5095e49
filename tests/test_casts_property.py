"""Property-based parity tests for the cast library.

The oracle inside each property is the reference's *documented* Python
semantics (/root/reference/src/scicat_dataset.py:42-116 — str()/int()/
float()/fromisoformat/literal arrays), re-stated here independently; the
engine must agree wherever both sides define a value. Known deliberate
divergence (`int("1.2")` raises in Python, nulls + error-channel here)
is covered in tests/test_functions.py, not re-tested.
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from scicat_ingestor_spark.functions.casts import cast_to_type

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _run_cast(spark, values, in_type, value_type):
    df = spark.createDataFrame([(v,) for v in values], f"v {in_type}")
    return [
        r["out"] for r in df.select(cast_to_type(F.col("v"), value_type).alias("out")).collect()
    ]


@settings(**_SETTINGS)
@given(st.lists(st.integers(-(2**53), 2**53), min_size=1, max_size=50))
def test_integer_from_long_is_identity(spark, xs):
    assert _run_cast(spark, xs, "long", "integer") == [int(x) for x in xs]


@settings(**_SETTINGS)
@given(
    st.lists(
        st.floats(-1e12, 1e12, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=50,
    )
)
def test_integer_from_double_truncates_like_python_int(spark, xs):
    # reference: int(value) truncates toward zero
    # (/root/reference/tests/test_scicat_dataset.py:58)
    assert _run_cast(spark, xs, "double", "integer") == [int(x) for x in xs]


@settings(**_SETTINGS)
@given(
    st.lists(
        st.floats(-1e12, 1e12, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=50,
    )
)
def test_float_roundtrip_exact(spark, xs):
    got = _run_cast(spark, xs, "double", "float")
    assert got == [float(x) for x in xs]


@settings(**_SETTINGS)
@given(
    st.lists(
        st.lists(st.integers(-(2**31), 2**31), min_size=0, max_size=8),
        min_size=1,
        max_size=30,
    )
)
def test_integer_array_from_literal_string(spark, arrays):
    # reference parses the string with ast.literal_eval then int() per
    # element (/root/reference/src/scicat_dataset.py:52-55)
    literals = [repr(a) for a in arrays]
    got = _run_cast(spark, literals, "string", "integer[]")
    assert got == arrays


@settings(**_SETTINGS)
@given(
    st.lists(
        st.lists(
            st.text(
                alphabet=st.characters(
                    whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=0x7F
                ),
                min_size=0,
                max_size=6,
            ),
            min_size=0,
            max_size=6,
        ),
        min_size=1,
        max_size=30,
    )
)
def test_string_array_from_literal_string(spark, arrays):
    literals = [repr(a) for a in arrays]
    got = _run_cast(spark, literals, "string", "string[]")
    assert got == arrays


@settings(**_SETTINGS)
@given(
    st.lists(
        st.datetimes(
            min_value=datetime.datetime(1971, 1, 1),
            max_value=datetime.datetime(2199, 12, 31),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_date_from_iso_string_parses(spark, dts):
    # reference: datetime.fromisoformat(...).isoformat()
    # (/root/reference/src/scicat_dataset.py:72-79); engine emits ISO
    # with explicit offset in session TZ (UTC)
    iso = [d.isoformat() for d in dts]
    got = _run_cast(spark, iso, "string", "date")
    want = [
        d.replace(tzinfo=datetime.timezone.utc).isoformat().replace("+00:00", "Z")
        for d in dts
    ]
    # normalize: engine format is yyyy-MM-dd'T'HH:mm:ssXXX (second
    # precision); hypothesis datetimes include microseconds
    want = [w.split(".")[0] + "Z" if "." in w else w for w in want]
    assert got == want


@settings(**_SETTINGS)
@given(st.lists(st.integers(0, 2**31), min_size=1, max_size=30))
def test_date_from_epoch_seconds(spark, secs):
    # reference: numbers are UTC epoch seconds
    # (/root/reference/src/scicat_dataset.py:75-77)
    got = _run_cast(spark, secs, "long", "date")
    want = [
        datetime.datetime.fromtimestamp(s, tz=datetime.timezone.utc)
        .isoformat()
        .replace("+00:00", "Z")
        for s in secs
    ]
    assert got == want
