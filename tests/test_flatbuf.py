"""FlatBuffers codec tests (S3/S5): golden-bytes fixtures pin the wire
layout, round-trips cover field presence/absence, and the [4:8] file
identifier stays compatible with the relational message-type filter
(S2, /root/reference/src/scicat_kafka.py:89-96)."""

from __future__ import annotations

import os

import pytest

from scicat_ingestor_spark.sources.flatbuf import (
    deserialise_pl72,
    deserialise_wrdn,
    file_identifier,
    serialise_pl72,
    serialise_wrdn,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def test_golden_wrdn_bytes():
    buf = open(os.path.join(FIXTURES, "golden_wrdn.bin"), "rb").read()
    assert file_identifier(buf) == b"wrdn"
    assert deserialise_wrdn(buf) == {
        "service_id": "filewriter-01",
        "job_id": "golden-job",
        "error_encountered": False,
        "file_name": "/ess/data/2024/run_0042.nxs",
        "metadata": '{"run": 42, "proposal": "p-7"}',
        "message": "File writing finished",
    }


def test_golden_pl72_bytes():
    buf = open(os.path.join(FIXTURES, "golden_pl72.bin"), "rb").read()
    assert file_identifier(buf) == b"pl72"
    assert deserialise_pl72(buf) == {
        "job_id": "golden-job",
        "filename": "/ess/data/2024/run_0042.nxs",
        "instrument_name": "coda",
    }


def test_wrdn_roundtrip_with_absent_fields():
    buf = serialise_wrdn(
        job_id="j", file_name="/f.nxs", metadata=None, message=None, service_id=None
    )
    d = deserialise_wrdn(buf)
    assert d["job_id"] == "j" and d["file_name"] == "/f.nxs"
    assert d["metadata"] is None and d["message"] is None and d["service_id"] is None
    assert d["error_encountered"] is False  # default when slot present/absent


def test_wrdn_roundtrip_unicode_and_flags():
    buf = serialise_wrdn(
        job_id="üñî-→", file_name="/päth/ファイル.nxs", error_encountered=True
    )
    d = deserialise_wrdn(buf)
    assert d["job_id"] == "üñî-→"
    assert d["file_name"] == "/päth/ファイル.nxs"
    assert d["error_encountered"] is True


def test_pl72_u64_alignment():
    # u64 fields force 8-byte alignment padding inside the table;
    # string slots after them must still resolve
    buf = serialise_pl72(
        job_id="j2",
        filename="/r.nxs",
        instrument_name="ymir",
        run_name="r-1",
        start_time=1,
        stop_time=2**63,
    )
    d = deserialise_pl72(buf)
    assert d == {"job_id": "j2", "filename": "/r.nxs", "instrument_name": "ymir"}


def test_wrong_identifier_raises():
    buf = serialise_wrdn(job_id="j", file_name="/f")
    with pytest.raises(ValueError, match="not a pl72"):
        deserialise_pl72(buf)


def test_identifier_matches_relational_filter(spark):
    """The binary filter S2 applies (substring(value, 5, 4)) selects
    exactly the buffers this codec accepts — filter-then-decode
    composes."""
    from pyspark.sql import functions as F

    from scicat_ingestor_spark.sources.messages import (
        message_type_filter,
        parse_wrdn_flatbuffer,
    )

    rows = [
        (serialise_wrdn(job_id="a", file_name="/a"),),
        (serialise_pl72(job_id="b", filename="/b"),),
        (b"garbage-bytes",),
    ]
    df = spark.createDataFrame(rows, "value binary")
    kept = df.filter(message_type_filter(F.col("value"), b"wrdn"))
    out = parse_wrdn_flatbuffer(kept).collect()
    assert [r.job_id for r in out] == ["a"]
