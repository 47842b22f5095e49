"""Property test for V2 template rendering: the compiled Column agrees
with a direct Python model of the reference's rules
(/root/reference/src/scicat_metadata.py:279-325) on randomly composed
templates over a fixed variable environment."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from scicat_ingestor_spark.functions.scalar import with_unit
from scicat_ingestor_spark.plans.compiler import render_template

ENV_VALUES = {"a": ("va", "K"), "b": ("7", ""), "c": ("x y", "m")}
_PLACEHOLDER = re.compile(r"<([^<>]+)>")

TOKENS = st.lists(
    st.sampled_from(["t", " ", "-", "<a>", "<b>", "<c>", "<missing>", "<"]),
    min_size=1,
    max_size=6,
)


def model_render(template: str):
    """The reference's semantics, restated directly in Python:
    exactly one placeholder and nothing else -> whole value + unit kept;
    otherwise string interpolation with units dropped; any unresolved
    placeholder -> failure (None)."""
    exact = _PLACEHOLDER.fullmatch(template.strip())
    if exact:
        name = exact.group(1)
        if name not in ENV_VALUES:
            return None, None
        v, u = ENV_VALUES[name]
        return v, u
    out, pos = [], 0
    for m in _PLACEHOLDER.finditer(template):
        out.append(template[pos : m.start()])
        if m.group(1) not in ENV_VALUES:
            return None, None
        out.append(ENV_VALUES[m.group(1)][0])
        pos = m.end()
    out.append(template[pos:])
    return "".join(out), ""


@given(TOKENS)
@settings(max_examples=25, deadline=None)
def test_render_matches_python_model(spark, tokens):
    template = "".join(tokens)
    env = {
        name: with_unit(F.lit(v), F.lit(u)) for name, (v, u) in ENV_VALUES.items()
    }
    rendered = render_template(template, env)
    row = (
        spark.range(1)
        .select(
            rendered.getField("value").alias("value"),
            rendered.getField("unit").alias("unit"),
        )
        .first()
    )
    want_value, want_unit = model_render(template)
    assert row["value"] == want_value, template
    if want_value is not None:
        assert row["unit"] == want_unit, template
