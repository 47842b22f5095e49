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


# ------------------------------------------------------------------ fuzz
# VERDICT r3 task 6: malformed buffers must never escape the decode
# branch as exceptions — the channel drops them (T4) and the stream
# continues. One case per failure mode per decoder, plus exhaustive
# prefix truncation and seeded byte-flip sweeps.


def _decode_or_none(fn, buf):
    try:
        return fn(buf)
    except Exception:
        return None  # what the T4 channel does with any raise


def test_fuzz_truncated_every_prefix():
    """Every strict prefix of a golden buffer either raises (caught ->
    dropped) or returns a dict — never hangs or corrupts state."""
    for name, fn in (
        ("golden_wrdn.bin", deserialise_wrdn),
        ("golden_pl72.bin", deserialise_pl72),
    ):
        buf = open(os.path.join(FIXTURES, name), "rb").read()
        outcomes = [_decode_or_none(fn, buf[:n]) for n in range(len(buf))]
        # prefixes shorter than the 8-byte header can't carry the id
        assert all(o is None for o in outcomes[:8])
        assert all(o is None or isinstance(o, dict) for o in outcomes)


def test_fuzz_byte_flips_seeded():
    """Seeded single-byte corruptions: decode raises (dropped) or
    returns a dict with the expected keys — no other escape."""
    import random

    rng = random.Random(42)
    for name, fn, keys in (
        ("golden_wrdn.bin", deserialise_wrdn, {"job_id", "file_name"}),
        ("golden_pl72.bin", deserialise_pl72, {"job_id", "filename"}),
    ):
        buf = bytearray(open(os.path.join(FIXTURES, name), "rb").read())
        for _ in range(300):
            i = rng.randrange(len(buf))
            mut = bytes(buf[:i]) + bytes([rng.randrange(256)]) + bytes(buf[i + 1 :])
            out = _decode_or_none(fn, mut)
            assert out is None or keys <= set(out)


def test_fuzz_wrong_identifier_each_branch():
    wrdn = serialise_wrdn(job_id="j", file_name="/f")
    pl72 = serialise_pl72(job_id="j", filename="/f", instrument_name="i")
    with pytest.raises(ValueError, match="not a wrdn"):
        deserialise_wrdn(pl72)
    with pytest.raises(ValueError, match="not a pl72"):
        deserialise_pl72(wrdn)
    # identifier region truncated entirely
    with pytest.raises(ValueError):
        deserialise_wrdn(b"\x04\x00\x00\x00")
    with pytest.raises(ValueError):
        deserialise_pl72(b"")


def test_fuzz_short_vtable_is_defaults_not_crash():
    """A vtable covering fewer slots than the reader asks for is VALID
    FlatBuffers (schema evolution: old writer, new reader) — absent
    slots read as defaults, never raise."""
    from scicat_ingestor_spark.sources.flatbuf import _build_table

    # table with only slot 0 populated; wrdn reads slots 0..5
    buf = _build_table([("string", "svc-only")], b"wrdn")
    d = deserialise_wrdn(buf)
    assert d["service_id"] == "svc-only"
    assert d["job_id"] is None and d["file_name"] is None
    assert d["error_encountered"] is False
    # pl72 reads up to slot 8; a 1-slot table must still decode
    buf2 = _build_table([("string", "y")], b"pl72")
    d2 = deserialise_pl72(buf2)
    assert d2 == {"job_id": None, "filename": None, "instrument_name": None}


def test_fuzz_malformed_rows_land_in_drop_channel(spark):
    """End-to-end T4: a batch mixing good buffers with truncations,
    flips and wrong-id buffers yields exactly the good rows — the
    malformed ones are dropped, no exception reaches the query."""
    from pyspark.sql import functions as F  # noqa: F401

    from scicat_ingestor_spark.sources.messages import (
        parse_pl72_flatbuffer,
        parse_wrdn_flatbuffer,
    )

    good_w = [serialise_wrdn(job_id=f"j{i}", file_name=f"/f{i}.nxs") for i in range(3)]
    good_p = [
        serialise_pl72(job_id=f"p{i}", filename=f"/g{i}.nxs", instrument_name="odin")
        for i in range(2)
    ]
    bad = [
        good_w[0][:11],                      # truncated mid-header
        good_w[1][:-5],                      # truncated tail (strings cut)
        b"\x00" * 16,                        # zeroed
        good_p[0],                           # wrong type for wrdn branch
        bytes([b ^ 0xFF for b in good_w[2]]),  # inverted
    ]
    wdf = spark.createDataFrame(
        [(b,) for b in good_w + bad], "value binary"
    )
    wrows = parse_wrdn_flatbuffer(wdf).collect()
    got_jobs = {r["job_id"] for r in wrows}
    assert {"j0", "j1", "j2"} <= got_jobs
    # nothing but plausibly-decoded rows: every survivor has the schema
    assert all(set(r.asDict()) == {
        "job_id", "file_name", "error_encountered", "metadata", "message", "service_id"
    } for r in wrows)

    pdf = spark.createDataFrame(
        [(b,) for b in good_p + [good_w[0], good_p[0][:9], b""]], "value binary"
    )
    prows = parse_pl72_flatbuffer(pdf).collect()
    assert {r["job_id"] for r in prows} >= {"p0", "p1"}


# ---------------------------------------------------------------------------
# Parity with the official ESS codec (r7, VERDICT task 6). The container
# ships no `streaming_data_types`, so these skip here; in any environment
# that has it (the reference's own test env) they pin that the vendored
# pure-Python wire format and the ESS producers' format are the same
# bytes-level language — official encode -> our decode AND our encode ->
# official decode, plus a seeded fuzz of both directions.
# ---------------------------------------------------------------------------

try:
    import streaming_data_types as sdt
except ImportError:  # container ships no official codec
    sdt = None

needs_official = pytest.mark.skipif(
    sdt is None,
    reason="official ESS streaming_data_types not installed (skip-if-absent)",
)


@needs_official
def test_official_wrdn_encode_our_decode():
    buf = sdt.serialise_wrdn(
        job_id="parity-job",
        error_encountered=True,
        file_name="/ess/data/run_7.nxs",
        metadata='{"k": 1}',
        message="done",
        service_id="fw-02",
    )
    assert file_identifier(buf) == b"wrdn"
    d = deserialise_wrdn(buf)
    assert d["job_id"] == "parity-job"
    assert d["error_encountered"] is True
    assert d["file_name"] == "/ess/data/run_7.nxs"
    assert d["metadata"] == '{"k": 1}'
    assert d["message"] == "done"
    assert d["service_id"] == "fw-02"


@needs_official
def test_our_wrdn_encode_official_decode():
    buf = serialise_wrdn(
        job_id="parity-job",
        error_encountered=True,
        file_name="/ess/data/run_7.nxs",
        metadata='{"k": 1}',
        message="done",
        service_id="fw-02",
    )
    w = sdt.deserialise_wrdn(buf)
    assert w.job_id == "parity-job"
    assert bool(w.error_encountered) is True
    assert w.file_name == "/ess/data/run_7.nxs"
    assert w.metadata == '{"k": 1}'
    assert w.message == "done"
    assert w.service_id == "fw-02"


@needs_official
def test_official_pl72_encode_our_decode():
    from streaming_data_types import serialise_pl72

    buf = serialise_pl72(
        job_id="run-start-1",
        filename="/ess/data/run_9.nxs",
        start_time=1700000000000,
        stop_time=1700000100000,
        run_name="r9",
        instrument_name="coda",
    )
    assert file_identifier(buf) == b"pl72"
    d = deserialise_pl72(buf)
    assert d["job_id"] == "run-start-1"
    assert d["filename"] == "/ess/data/run_9.nxs"
    assert d["instrument_name"] == "coda"


@needs_official
def test_our_pl72_encode_official_decode():
    from streaming_data_types import deserialise_pl72 as official_pl72

    buf = serialise_pl72(
        job_id="run-start-1",
        filename="/ess/data/run_9.nxs",
        start_time=1700000000000,
        stop_time=1700000100000,
        run_name="r9",
        instrument_name="coda",
    )
    r = official_pl72(buf)
    assert r.job_id == "run-start-1"
    assert r.filename == "/ess/data/run_9.nxs"
    assert r.instrument_name == "coda"
    assert int(r.start_time) == 1700000000000
    assert int(r.stop_time) == 1700000100000


@needs_official
def test_wrdn_fuzz_parity_both_directions():
    import random

    rng = random.Random(0x5CA7)
    alphabet = "abc /0129_üñî→ファ"
    for _ in range(100):
        kw = dict(
            job_id="".join(rng.choices(alphabet, k=rng.randint(1, 40))),
            file_name="".join(rng.choices(alphabet, k=rng.randint(1, 80))),
            error_encountered=rng.random() < 0.5,
            metadata="".join(rng.choices(alphabet, k=rng.randint(0, 60))),
            message="".join(rng.choices(alphabet, k=rng.randint(0, 30))),
            service_id="".join(rng.choices(alphabet, k=rng.randint(0, 12))),
        )
        ours_decoded = deserialise_wrdn(sdt.serialise_wrdn(**kw))
        theirs = sdt.deserialise_wrdn(serialise_wrdn(**kw))
        for field, want in kw.items():
            got_ours = ours_decoded[field]
            got_theirs = getattr(theirs, field)
            if field == "error_encountered":
                assert bool(got_ours) == bool(got_theirs) == want
            else:
                assert got_ours == want, (field, kw)
                assert got_theirs == want, (field, kw)
