"""WARC capture framing + HTML extraction (r9).

Covers: record framing roundtrips through both container layouts,
folded headers, the HTTP message parse, the failure-channel contract
under structural damage, one-pass entity semantics, Python/Column
extraction parity, and the binaryFile source end to end over real
files on disk."""

from __future__ import annotations

import struct
import zlib

import pytest

from scicat_ingestor_spark.operators import warc


def _capture(doc_id=42, source="src3", text="alpha beta gamma"):
    url = f"https://{source}.example.org/{doc_id}"
    html = (
        f"<html><head><title>doc {doc_id}</title>"
        f"<style>body {{ color: #333; }}</style></head>"
        f"<body><h1>Doc {doc_id} &amp; friends</h1>"
        f'<script>if (1 < 2) {{ var s = "<p>ignored</p>"; }}</script>'
        f"<p>{text}</p><!-- comment <p>never</p> -->"
        f"<div>tail &lt;{doc_id}&gt; &nbsp;end</div></body></html>"
    )
    recs = [
        warc.make_warc_record(
            "warcinfo", b"software: sis-test\r\n",
            content_type="application/warc-fields",
        ),
        warc.make_warc_record(
            "request",
            f"GET /{doc_id} HTTP/1.1\r\nHost: {source}.example.org"
            "\r\n\r\n".encode(),
            target_uri=url,
            content_type="application/http;msgtype=request",
        ),
        warc.make_warc_record(
            "response",
            warc.make_http_response(
                html.encode(), "text/html; charset=utf-8"
            ),
            target_uri=url,
            content_type="application/http;msgtype=response",
        ),
    ]
    expected = (
        f"doc {doc_id}\nDoc {doc_id} & friends\n{text}\n"
        f"tail <{doc_id}> end"
    )
    return recs, url, expected


def test_framing_roundtrip_plain_and_gz():
    recs, url, expected = _capture()
    for gz in (False, True):
        buf = warc.make_warc(recs, gzip_members=gz)
        parsed = warc.warc_records(buf)
        assert [r["warc_type"] for r in parsed] == [
            "warcinfo", "request", "response",
        ]
        assert parsed[2]["target_uri"] == url
        status, hh, body = warc.http_response(parsed[2]["block"])
        assert status == 200
        assert hh["content-type"].startswith("text/html")
        assert warc.html_to_text(body.decode()) == expected


def test_gzip_member_boundaries_are_per_record():
    recs, _, _ = _capture()
    buf = warc.make_warc(recs, gzip_members=True)
    # three independent members: each starts with the gzip magic
    members = 0
    data = buf
    while data:
        assert data[:2] == b"\x1f\x8b"
        o = zlib.decompressobj(wbits=31)
        o.decompress(data)
        members += 1
        data = o.unused_data
    assert members == 3


def test_folded_header_continuation():
    rec = warc.make_warc_record(
        "metadata", b"x", target_uri="https://a.example/1"
    )
    # fold the Target-URI header across two lines
    folded = rec.replace(
        b"WARC-Target-URI: https://a.example/1\r\n",
        b"WARC-Target-URI: https://a.example\r\n\t/1\r\n",
    )
    (r,) = warc.warc_records(folded)
    assert r["target_uri"] == "https://a.example /1"


def test_failure_channel_contract():
    recs, _, _ = _capture()
    buf = warc.make_warc(recs)
    with pytest.raises(ValueError, match="bad version line"):
        warc.warc_records(b"WARC/9.9\r\nContent-Length: 0\r\n\r\n\r\n\r\n")
    with pytest.raises(ValueError, match="truncated"):
        # mid-file cut lands in a header block or a record block
        # depending on layout; both are the truncation contract
        warc.warc_records(buf[: len(buf) // 2])
    # cut precisely inside the LAST record's Content-Length span
    with pytest.raises(ValueError, match="truncated record block"):
        warc.warc_records(buf[:-10])
    with pytest.raises(ValueError, match="missing record separator"):
        warc.warc_records(buf[:-2])
    with pytest.raises(ValueError, match="Content-Length"):
        warc.warc_records(
            b"WARC/1.0\r\nWARC-Type: metadata\r\n\r\n\r\n\r\n"
        )
    with pytest.raises(ValueError, match="malformed header"):
        warc.warc_records(
            b"WARC/1.0\r\nnocolonhere\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
        )
    # gzip damage: flipped byte inside the member
    gz = bytearray(warc.make_warc(recs, gzip_members=True))
    gz[20] ^= 0xFF
    with pytest.raises(ValueError, match="not a WARC"):
        warc.warc_records(bytes(gz))
    # truncated member
    with pytest.raises(ValueError, match="truncated gzip member"):
        warc.warc_records(warc.make_warc(recs, gzip_members=True)[:30])
    # response block that is not HTTP
    bad = warc.make_warc_record("response", b"NOPE", target_uri="u")
    with pytest.raises(ValueError, match="not HTTP"):
        warc.http_response(warc.warc_records(bad)[0]["block"])


def test_framing_roundtrip_property():
    """Property fuzz: arbitrary record sets (types, bodies with CRLFs
    and gzip-magic bytes inside, empty blocks, unicode URLs) survive
    make_warc -> warc_records byte-exactly through both containers."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    rec_st = st.tuples(
        st.sampled_from(["warcinfo", "request", "response", "metadata",
                         "revisit"]),
        st.binary(max_size=200),
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs", "Cc"), max_codepoint=0x2FF
            ),
            max_size=40,
        ),
    )

    @settings(max_examples=120, deadline=None)
    @given(st.lists(rec_st, min_size=1, max_size=6), st.booleans())
    def roundtrip(recs, gz):
        built = [
            warc.make_warc_record(
                t, block, target_uri=uri.replace("\r", "").replace("\n", "")
            )
            for t, block, uri in recs
        ]
        parsed = warc.warc_records(warc.make_warc(built, gzip_members=gz))
        assert [r["warc_type"] for r in parsed] == [t for t, _, _ in recs]
        assert [r["block"] for r in parsed] == [b for _, b, _ in recs]

    roundtrip()


def test_html_to_text_convention():
    # one-pass entities: &amp;lt; is the literal string "&lt;"
    assert warc.html_to_text("<p>&amp;lt; x</p>") == "&lt; x"
    # markup line-wrapping inside a paragraph does not split lines
    assert (
        warc.html_to_text("<p>one\n  two\n three</p>") == "one two three"
    )
    # block tags split lines; inline tags do not
    assert (
        warc.html_to_text("<p>a <b>bold</b> word</p><p>next</p>")
        == "a bold word\nnext"
    )
    # script content with embedded tags vanishes entirely
    assert (
        warc.html_to_text('<script>var s = "<p>no</p>";</script><p>yes</p>')
        == "yes"
    )
    # comments vanish, nbsp becomes a normal (collapsed) space
    assert warc.html_to_text("a<!-- <b>x</b> -->&nbsp; b") == "a b"
    # empty extraction is the empty string
    assert warc.html_to_text("<html><body></body></html>") == ""


def test_column_chain_matches_python_twin(spark):
    """The JVM html_text chain and the Python twin must agree on every
    convention edge (Java vs Python regex differences would silently
    fork the oracle from the data plane)."""
    cases = [
        "<p>plain</p>",
        "<P CLASS='x'>case <B>insensitive</B></P>",
        "<p>&amp;lt; &gt; &quot;q&quot; &#39;a&#39; &nbsp;</p>",
        "<script>a<b>c</script>kept<style>x{}</style>",
        "<div>a</div><div></div><div>b</div>",
        "text with no markup at all",
        "<br/>line<br />breaks",
        "<p>wrapped\n  source\n lines</p>",
        "<!-- only a comment -->",
        "<h3>Header</h3>tail",
        "<td>cell</td><td>cell2</td>",
        "<noscript><p>hidden</p></noscript>shown",
    ]
    df = spark.createDataFrame([(c,) for c in cases], ["html"])
    got = [
        r["t"]
        for r in df.select(warc.html_text("html").alias("t"))
        .collect()
    ]
    assert got == [warc.html_to_text(c) for c in cases]


def test_extraction_parity_fuzz(spark):
    """Property fuzz of the JVM/Python extraction twins: random
    ASCII-printable markup soups (fragments of tags, entities,
    comments, script blocks, whitespace runs) must extract
    identically through html_text (Java regex) and html_to_text
    (Python re) — a quiet divergence here would fork the oracles from
    the data plane."""
    import random

    rng = random.Random(20260816)
    frags = [
        "<p>", "</p>", "<P class='x'>", "<div>", "</div>", "<br/>",
        "<b>", "</b>", "<h2>", "</h2>", "<td>", "</td>",
        "<script>", "</script>", "<style>", "</style>",
        "<!--", "-->", "&amp;", "&lt;", "&gt;", "&nbsp;", "&#39;",
        "plain", "words", "x<y", "a>b", "&unknown;", "  ", "\n", "\t",
        "<notatag", ">", "<p", "attr='v'>",
        # non-ASCII whitespace: both engines must treat these as TEXT
        # (ASCII-only \s on both sides — the r9 ADVICE parity pin)
        "\xa0", "\u2028", "caf\xe9",
        # r11 entity alphabet: numeric refs (dec/hex, valid/invalid/
        # windows-1252 override), named long tail, one-pass traps
        "&#233;", "&#x2019;", "&#146;", "&#65;", "&#x41;",
        "&#0;", "&#xD800;", "&#x110000;", "&#1114112;",
        "&eacute;", "&mdash;", "&hellip;", "&uuml;", "&euro;",
        "&copy;", "&frac12;", "&unknown;", "&amp;#65;", "&#x26;#65;",
        "&amp;eacute;", "&#", "&#;", "&#x;", "&#xG1;", "#65;",
    ]
    cases = [
        "".join(rng.choice(frags) for _ in range(rng.randint(1, 24)))
        for _ in range(300)
    ]
    df = spark.createDataFrame([(c,) for c in cases], ["html"])
    got = [
        r["t"]
        for r in df.select(warc.html_text("html").alias("t")).collect()
    ]
    exp = [warc.html_to_text(c) for c in cases]
    mismatches = [
        (c, g, e) for c, g, e in zip(cases, got, exp) if g != e
    ]
    assert not mismatches, mismatches[:3]


def test_warc_scan_end_to_end(spark, tmp_path):
    """Real files on disk through the binaryFile source: three .warc.gz
    + two plain .warc, one task per file, exact texts out."""
    docs = [
        (i, f"src{i % 4}", f"text number {i} body words") for i in range(5)
    ]
    for i, source, text in docs:
        recs, _, _ = _capture(i, source, text)
        buf = warc.make_warc(recs, gzip_members=i < 3)
        ext = "warc.gz" if i < 3 else "warc"
        (tmp_path / f"capture-{i}.{ext}").write_bytes(buf)
    from pyspark.sql import functions as F

    files = warc.warc_scan(spark, str(tmp_path))
    assert files.count() == 5
    rows = (
        warc.warc_response_rows(files)
        .filter(
            (F.col("http_status") == 200)
            & F.col("content_type").startswith("text/html")
        )
        .select("url", warc.html_text("text").alias("text"))
        .collect()
    )
    got = {r["url"]: r["text"] for r in rows}
    assert len(got) == 5
    for i, source, text in docs:
        _, url, expected = _capture(i, source, text)
        assert got[url] == expected


def test_review_fix_regressions(spark):
    """r9 post-review fixes: multi-member gzip bodies decode fully,
    obs-fold HTTP headers parse, inflate bombs hit the cap, and
    null-URL responses are excluded from latest_capture instead of
    collapsing into one arbitrary row."""
    body = b"part one " * 10 + b"| part two " * 10
    # multi-member gzip body: two concatenated members must BOTH decode
    half = len(body) // 2
    members = b""
    for piece in (body[:half], body[half:]):
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        members += co.compress(piece) + co.flush()
    blk = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
        b"Content-Encoding: gzip\r\n"
        + f"Content-Length: {len(members)}\r\n\r\n".encode()
        + members
    )
    assert warc.http_response(blk)[2] == body
    # obs-fold continuation in HTTP headers
    blk = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
        b"X-Thing: a\r\n b\r\nContent-Length: 2\r\n\r\nok"
    )
    status, hh, got = warc.http_response(blk)
    assert hh["x-thing"] == "a b" and got == b"ok"
    # inflate cap: a high-ratio bomb member raises, never materializes
    bomb = zlib.compressobj(9, zlib.DEFLATED, 31)
    bomb_bytes = bomb.compress(b"\x00" * (warc.MAX_INFLATED_BYTES + 4096))
    bomb_bytes += bomb.flush()
    with pytest.raises(ValueError, match="inflate cap"):
        warc.gunzip_members(bomb_bytes)
    # null-URL responses: excluded from the page store, not collapsed
    rows = spark.createDataFrame(
        [
            (1, 0, "response", None, "2026-01-01T00:00:00Z", 200, "text/html", "a"),
            (1, 1, "response", None, "2026-01-02T00:00:00Z", 200, "text/html", "b"),
            (1, 2, "response", "https://x.example/p", "2026-01-01T00:00:00Z", 200, "text/html", "c"),
        ],
        "media_id long, seq int, warc_type string, url string, "
        "warc_date string, http_status int, content_type string, text string",
    )
    kept = warc.latest_capture(rows).collect()
    assert len(kept) == 1 and kept[0]["url"] == "https://x.example/p"


def test_http_wire_layers_decode():
    """Content-Encoding (gzip / zlib-deflate / raw-deflate) and chunked
    transfer framing — alone and stacked in wire order — must undo to
    the identical body; damage raises the shared ValueError contract."""
    body = ("word " * 40).strip().encode()
    for enc in ("", "gzip", "deflate"):
        for chunked in (False, True):
            blk = warc.make_http_response(
                body, "text/plain", content_encoding=enc, chunked=chunked
            )
            status, hh, got = warc.http_response(blk)
            assert (status, got) == (200, body), (enc, chunked)
    # raw-deflate under the "deflate" label (the HTTP wart)
    raw = zlib.compressobj(6, zlib.DEFLATED, -15)
    raw_body = raw.compress(body) + raw.flush()
    blk = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
        b"Content-Encoding: deflate\r\n"
        + f"Content-Length: {len(raw_body)}\r\n\r\n".encode()
        + raw_body
    )
    assert warc.http_response(blk)[2] == body
    # truncated gzip body
    blk = warc.make_http_response(body, "text/plain", content_encoding="gzip")
    with pytest.raises(ValueError, match="gzip body"):
        warc.http_response(blk[:-4])
    # bad chunk framing
    blk = warc.make_http_response(body, "text/plain", chunked=True)
    with pytest.raises(ValueError, match="chunk"):
        warc.http_response(blk[:-7])  # rips the 0\r\n\r\n terminator
    with pytest.raises(ValueError, match="bad chunk size"):
        warc.http_response(
            b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
            b"zz\r\nabc\r\n0\r\n\r\n"
        )
    # unknown encoding is an explicit error, not a silent passthrough
    with pytest.raises(ValueError, match="unknown Content-Encoding"):
        warc.http_response(
            b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\nx"
        )


def test_meta_noindex_detection(spark):
    """Robots-meta directive detection on raw HTML: either attribute
    order, either quote style, googlebot alias; 'nofollow'-only and
    non-robots metas must NOT match."""
    cases = [
        ('<meta name="robots" content="noindex">', True),
        ("<meta name=robots content=noindex>", True),  # HTML5 unquoted
        ("<META NAME='ROBOTS' CONTENT='NOFOLLOW, NOINDEX'>", True),
        ('<meta content="noindex" name="robots">', True),
        ('<meta name="googlebot" content="noindex">', True),
        ('<meta name=robots content="noindex">', True),
        ('<meta name="robots" content="nofollow">', False),
        ('<meta name="description" content="noindex mentioned">', False),
        ("<p>the word noindex in prose</p>", False),
        ("", False),
    ]
    df = spark.createDataFrame(
        [(f"<html><head>{c}</head><body>x</body></html>",) for c, _ in cases],
        ["html"],
    )
    got = [
        r["m"]
        for r in df.select(warc.meta_noindex("html").alias("m")).collect()
    ]
    assert got == [e for _, e in cases]


def test_canonical_url_and_latest_capture(spark):
    """Canonicalization convention + keep-newest semantics, including
    the no-scheme passthrough and the deterministic tie-break."""
    from pyspark.sql import functions as F

    cases = [
        ("HTTPS://WWW.Example.ORG/Path/To#frag", "https://www.example.org/Path/To"),
        ("http://a.example/x///", "http://a.example/x"),
        ("https://a.example", "https://a.example"),
        ("relative/path#x", "relative/path"),  # no scheme: untouched head
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["u"])
    got = [r["c"] for r in df.select(warc.canonical_url("u").alias("c")).collect()]
    assert got == [e for _, e in cases]

    rows = spark.createDataFrame(
        [
            # same canonical page, three captures; newest date wins
            (1, 0, "response", "https://a.example/p", "2026-01-01T00:00:00Z", 200, "text/html", "old"),
            (1, 1, "response", "HTTPS://A.EXAMPLE/p/", "2026-03-01T00:00:00Z", 200, "text/html", "new"),
            (2, 0, "response", "https://a.example/p#f", "2026-02-01T00:00:00Z", 200, "text/html", "mid"),
            # equal dates: higher (media_id, seq) wins deterministically
            (3, 0, "response", "https://b.example/q", "2026-01-01T00:00:00Z", 200, "text/html", "t0"),
            (3, 1, "response", "https://b.example/q", "2026-01-01T00:00:00Z", 200, "text/html", "t1"),
        ],
        "media_id long, seq int, warc_type string, url string, "
        "warc_date string, http_status int, content_type string, text string",
    )
    kept = {
        r["url"]: (r["text"], r["n_captures"])
        for r in warc.latest_capture(rows).collect()
    }
    assert kept["https://a.example/p"] == ("new", 3)
    assert kept["https://b.example/q"] == ("t1", 2)
    # plan shape: ONE shuffle key (the canonical url) for all three
    # window functions — no self-join, no extra exchange. Two Window
    # operators max (rn's ordered spec; count+text-backfill share the
    # unordered spec); WindowGroupLimit is the rank-pushdown, not a
    # third window.
    plan = warc.latest_capture(rows)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Window [") <= 2


def test_main_text_and_url_host(spark):
    """Main-content heuristic: only p/h* content survives; inline tags
    inside kept elements clean up; script content inside the page does
    not leak in. url_host lowercases and strips ports."""
    from pyspark.sql import functions as F

    cases = [
        (
            "<html><head><title>T</title></head><body><nav>menu</nav>"
            "<h1>Head</h1><p>body <b>bold</b> &amp; more</p>"
            "<div>boilerplate</div><p></p></body></html>",
            "Head\nbody bold & more",
        ),
        ("<p>only</p>", "only"),
        ("<div>nothing kept</div>", ""),
        ("<script><p>fake</p></script><h2>kept</h2>", "kept"),
    ]
    df = spark.createDataFrame([(c,) for c, _ in cases], ["html"])
    got = [
        r["t"]
        for r in df.select(warc.html_main_text("html").alias("t")).collect()
    ]
    assert got == [e for _, e in cases]

    urls = [
        ("HTTPS://Www.Example.ORG:8443/Path", "www.example.org"),
        ("http://a.b.example/x", "a.b.example"),
        ("no-scheme/path", ""),
    ]
    df2 = spark.createDataFrame([(u,) for u, _ in urls], ["u"])
    got2 = [r["h"] for r in df2.select(warc.url_host("u").alias("h")).collect()]
    assert got2 == [e for _, e in urls]


def test_robots_parse_and_filter(spark):
    """robots.txt fold conventions: group tracking, stacked User-agent
    lines, comments, empty Disallow, agent selection; the filter
    drops exactly the disallowed-prefix pages via broadcast
    anti-join."""
    from pyspark.sql import functions as F

    body = (
        "# policy\n"
        "User-agent: googlebot\n"
        "Disallow: /\n"
        "\n"
        "User-agent: badbot\n"
        "User-agent: *\n"
        "Disallow: /private/  # inline comment\n"
        "Disallow:\n"
        "Disallow: /tmp/\n"
    )
    df = spark.createDataFrame([(body,)], ["text"])
    star = df.select(
        warc.robots_disallow_prefixes("text").alias("r")
    ).collect()[0]["r"]
    assert star == ["/private/", "/tmp/"]
    goog = df.select(
        warc.robots_disallow_prefixes("text", agent="googlebot").alias("r")
    ).collect()[0]["r"]
    assert goog == ["/"]

    pages = spark.createDataFrame(
        [
            ("https://a.example/private/x", 1),
            ("https://a.example/public/x", 2),
            ("https://b.example/private/x", 3),  # no rules for b.example
            ("https://a.example/tmp/y", 4),
        ],
        ["url", "pid"],
    )
    robots_bodies = spark.createDataFrame(
        [("a.example", body)], ["domain", "text"]
    )
    kept = sorted(
        r["pid"]
        for r in warc.robots_filter(pages, robots_bodies).collect()
    )
    assert kept == [2, 3]
    # plan: the rule table rides a broadcast, pages do not shuffle
    plan = (
        warc.robots_filter(pages, robots_bodies)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Broadcast" in plan


def test_wet_conversion_records(spark):
    """WET layout: conversion blocks are the text verbatim — no HTTP
    parse, record-level content type governs the decode."""
    recs = [
        warc.make_warc_record(
            "warcinfo", b"k: v\r\n", content_type="application/warc-fields"
        ),
        warc.make_warc_record(
            "conversion", "extracted text body".encode(),
            target_uri="https://x.example/a", content_type="text/plain",
        ),
        warc.make_warc_record(
            "conversion", b"\x00binary-ish", target_uri="https://x.example/b",
            content_type="application/octet-stream",
        ),
    ]
    df = spark.createDataFrame(
        [(1, bytearray(warc.make_warc(recs, gzip_members=True)))],
        ["media_id", "payload"],
    )
    rows = warc.warc_response_rows(df).orderBy("seq").collect()
    assert rows[1]["text"] == "extracted text body"
    assert rows[1]["http_status"] is None
    assert rows[2]["text"] is None  # non-text conversion: no decode


def test_streaming_capture_ingest_matches_batch(spark, tmp_path):
    """Continuous crawl ingestion: .warc.gz files arriving as a file
    stream (binaryFile source, bounded files-per-trigger) through
    foreachBatch(extract -> append) must reproduce the batch
    extraction row-for-row after an availableNow drain — the
    streaming shell pattern every other family here follows."""
    import os

    from pyspark.sql import functions as F

    crawl = str(tmp_path / "crawl")
    os.makedirs(crawl)
    docs = [(i, f"src{i % 3}", f"stream page {i} body text") for i in range(9)]
    for i, source, text in docs:
        recs, _, _ = _capture(i, source, text)
        with open(os.path.join(crawl, f"c-{i}.warc.gz"), "wb") as fh:
            fh.write(warc.make_warc(recs, gzip_members=True))

    def extract(files_df):
        rows = warc.warc_response_rows(
            files_df.select("media_id", "payload")
        )
        return rows.filter(
            (F.col("http_status") == 200)
            & F.col("content_type").startswith("text/html")
        ).select("url", warc.html_text("text").alias("text"))

    batch = sorted(map(tuple, extract(warc.warc_scan(spark, crawl)).collect()))
    assert len(batch) == 9

    out_dir, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    stream_files = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("maxFilesPerTrigger", 3)
        .load(crawl)
        .select(
            F.xxhash64("path").alias("media_id"),
            F.col("content").alias("payload"),
        )
    )

    def sink(b, _id):
        extract(b).write.mode("append").parquet(out_dir)

    q = (
        stream_files.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(map(tuple, spark.read.parquet(out_dir).collect()))
    assert got == batch


def test_crawl_ingest_loop_two_waves(spark, tmp_path):
    """Continuous-crawl loop: two arrival waves through the streaming
    shell (restart between waves exercises checkpoint recovery); the
    current view must equal the batch latest_capture over ALL files,
    re-captures must replace stale content, compaction must shrink
    the log without changing the view, and a replayed append must
    leave the view unchanged."""
    import os

    from pyspark.sql import functions as F

    from scicat_ingestor_spark.streaming import crawl

    crawl_dir = str(tmp_path / "crawl")
    pages, ck = str(tmp_path / "pages"), str(tmp_path / "ck")
    os.makedirs(crawl_dir)

    def capture_file(name, pid, body_text, date):
        rec = warc.make_warc_record(
            "response",
            warc.make_http_response(
                f"<p>{body_text}</p>".encode(), "text/html"
            ),
            target_uri=f"https://s.example/page/{pid}",
            content_type="application/http;msgtype=response",
            date=date,
        )
        with open(os.path.join(crawl_dir, name), "wb") as fh:
            fh.write(warc.make_warc([rec], gzip_members=True))

    def stream_once():
        files = (
            spark.readStream.format("binaryFile")
            .schema(
                "path string, modificationTime timestamp, "
                "length long, content binary"
            )
            .option("maxFilesPerTrigger", 2)
            .load(crawl_dir)
        )
        q = crawl.run_crawl_ingest_stream(files, pages, ck)
        q.awaitTermination()

    # wave 1: pages 0-3
    for p in range(4):
        capture_file(f"w1-{p}.warc.gz", p, f"v1 of {p}", "2026-01-01T00:00:00Z")
    stream_once()
    # wave 2: re-capture 0 and 1 (newer), plus new pages 4-5
    capture_file("w2-0.warc.gz", 0, "v2 of 0", "2026-02-01T00:00:00Z")
    capture_file("w2-1.warc.gz", 1, "v2 of 1", "2026-02-01T00:00:00Z")
    for p in (4, 5):
        capture_file(f"w2-{p}.warc.gz", p, f"v1 of {p}", "2026-02-01T00:00:00Z")
    stream_once()

    def view():
        return {
            r["url"]: (warc.html_to_text(r["text"]), r["n_captures"])
            for r in crawl.current_pages(spark, pages).collect()
        }

    got = view()
    assert len(got) == 6
    assert got["https://s.example/page/0"] == ("v2 of 0", 2)
    assert got["https://s.example/page/1"] == ("v2 of 1", 2)
    assert got["https://s.example/page/2"] == ("v1 of 2", 1)
    assert got["https://s.example/page/5"] == ("v1 of 5", 1)
    # batch equivalence over all files at once
    batch_view = {
        r["url"]: r["n_captures"]
        for r in warc.latest_capture(
            crawl.extract_pages(warc.warc_scan(spark, crawl_dir))
        ).collect()
    }
    assert {u: n for u, (_, n) in got.items()} == batch_view
    # replayed append: view text unchanged (counts inflate, winner not)
    some = warc.warc_scan(spark, crawl_dir).limit(2)
    crawl.append_captures(
        some.select("media_id", "payload"), pages
    )
    assert {u: t for u, (t, _) in view().items()} == {
        u: t for u, (t, _) in got.items()
    }
    # compaction: log shrinks to |urls| rows, view text identical
    before = spark.read.parquet(pages).count()
    crawl.compact_pages(spark, pages)
    after = spark.read.parquet(pages).count()
    assert after == 6 < before
    assert {u: t for u, (t, _) in view().items()} == {
        u: t for u, (t, _) in got.items()
    }


def test_response_rows_content_type_dispatch(spark):
    """text/plain bodies decode; non-text responses carry no text;
    non-response records carry the WARC-level content type."""
    recs = [
        warc.make_warc_record(
            "warcinfo", b"k: v\r\n", content_type="application/warc-fields"
        ),
        warc.make_warc_record(
            "response",
            warc.make_http_response(b"plain body", "text/plain"),
            target_uri="https://x.example/p",
        ),
        warc.make_warc_record(
            "response",
            warc.make_http_response(
                struct.pack("<I", 7) * 3, "application/octet-stream"
            ),
            target_uri="https://x.example/bin",
        ),
    ]
    df = spark.createDataFrame(
        [(1, bytearray(warc.make_warc(recs)))], ["media_id", "payload"]
    )
    rows = warc.warc_response_rows(df).orderBy("seq").collect()
    assert rows[0]["content_type"] == "application/warc-fields"
    assert rows[0]["text"] is None and rows[0]["http_status"] is None
    assert rows[1]["text"] == "plain body"
    assert rows[2]["text"] is None
    assert rows[2]["content_type"] == "application/octet-stream"


# ---------------------------------------------------------------------------
# round 10: fault tolerance, charset, revisit, canonicalization edges
# ---------------------------------------------------------------------------

def _good_response(doc_id, path, text):
    return warc.make_warc_record(
        "response",
        warc.make_http_response(
            f"<p>{text}</p>".encode(), "text/html; charset=utf-8"
        ),
        target_uri=f"https://x.example/{path}",
        content_type="application/http;msgtype=response",
    )


def test_tolerant_walk_dead_letters_one_record_per_damage():
    """The V3/T4 dead-letter contract on capture framing: each
    corruption mode yields exactly ONE error record while the good
    records before AND after survive with their content intact."""
    a = _good_response(1, "a", "alpha")
    b = _good_response(1, "b", "beta")

    def good_urls(records):
        return [
            r["target_uri"] for r in records if r.get("error") is None
        ]

    def errors(records):
        return [r["error"] for r in records if r.get("error") is not None]

    # 1. truncated gzip member in the middle: member error, a+b survive
    mid = _good_response(1, "m", "middle")
    buf = warc.make_warc([a], gzip_members=True)
    mid_gz = warc.make_warc([mid], gzip_members=True)
    buf += mid_gz[:-5] + warc.make_warc([b], gzip_members=True)
    recs = warc.warc_records_tolerant(buf)
    assert good_urls(recs) == ["https://x.example/a", "https://x.example/b"]
    assert len(errors(recs)) == 1 and "gzip" in errors(recs)[0]

    # 2. garbage between gzip members
    buf = (
        warc.make_warc([a], gzip_members=True)
        + b"JUNKJUNKJUNK"
        + warc.make_warc([b], gzip_members=True)
    )
    recs = warc.warc_records_tolerant(buf)
    assert good_urls(recs) == ["https://x.example/a", "https://x.example/b"]
    assert errors(recs) == ["not a WARC: garbage between gzip members"]

    # 3. bad Content-Length in a plain-file record, resync at next
    # version line
    bad = _good_response(1, "bad", "x").replace(
        b"Content-Length: ", b"Content-Length: NaN", 1
    )
    recs = warc.warc_records_tolerant(a + bad + b)
    assert good_urls(recs) == ["https://x.example/a", "https://x.example/b"]
    assert len(errors(recs)) == 1 and "Content-Length" in errors(recs)[0]

    # 4. garbage between plain records
    recs = warc.warc_records_tolerant(a + b"GARBAGE NO CRLF" + b)
    assert good_urls(recs) == ["https://x.example/a", "https://x.example/b"]
    assert len(errors(recs)) == 1

    # 5. trailing truncation: a survives, one error, nothing after
    recs = warc.warc_records_tolerant((a + b)[: len(a) + 30])
    assert good_urls(recs) == ["https://x.example/a"]
    assert len(errors(recs)) == 1

    # well-formed input: tolerant walk == strict walk, all error=None
    buf = warc.make_warc([a, b], gzip_members=True)
    tol = warc.warc_records_tolerant(buf)
    strict = warc.warc_records(buf)
    assert [dict(r, error=None) for r in tol] == [
        dict(r, error=None) for r in strict
    ]
    assert all(r["error"] is None for r in tol)


def test_tolerant_rows_http_level_dead_letter(spark):
    """HTTP-level damage (non-HTTP response block, broken chunking)
    dead-letters that record ROW with its url, never the file; strict
    mode still raises."""
    not_http = warc.make_warc_record(
        "response", b"NOT AN HTTP MESSAGE",
        target_uri="https://x.example/nh",
        content_type="application/http;msgtype=response",
    )
    bad_chunk_body = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Transfer-Encoding: chunked\r\n\r\nZZZ\r\nnope"
    )
    bad_chunk = warc.make_warc_record(
        "response", bad_chunk_body,
        target_uri="https://x.example/bc",
        content_type="application/http;msgtype=response",
    )
    good = _good_response(1, "ok", "fine")
    buf = warc.make_warc([not_http, bad_chunk, good])
    df = spark.createDataFrame(
        [(1, bytearray(buf))], ["media_id", "payload"]
    )
    rows = warc.warc_response_rows(df).orderBy("seq").collect()
    assert rows[0]["error"] is not None and rows[0]["url"] == (
        "https://x.example/nh"
    )
    assert rows[1]["error"] is not None and "chunk" in rows[1]["error"]
    assert rows[2]["error"] is None and rows[2]["text"] == "<p>fine</p>"
    import pytest as _pytest

    with _pytest.raises(Exception):
        warc.warc_response_rows(df, tolerant=False).collect()


def test_charset_decode_precedence():
    """Header charset beats meta sniff beats utf-8 beats latin-1."""
    # 1. header param
    t, c = warc.decode_body_text(
        "caf\xe9".encode("iso-8859-1"), "text/html; charset=ISO-8859-1",
        sniff_html=True,
    )
    assert (t, c) == ("caf\xe9", "iso8859-1")
    # 2. windows-1252 header (euro at 0x80)
    t, c = warc.decode_body_text(
        b"price \x80 5", "text/plain; charset=windows-1252", False
    )
    assert (t, c) == ("price € 5", "cp1252")
    # 3. meta charset sniff (html only), both quoting styles
    body = b'<html><head><meta charset="windows-1252"></head>caf\xe9'
    t, c = warc.decode_body_text(body, "text/html", sniff_html=True)
    assert c == "cp1252" and t.endswith("caf\xe9")
    body = (
        b"<html><head><meta http-equiv=Content-Type "
        b"content='text/html; charset=iso-8859-1'></head>caf\xe9"
    )
    t, c = warc.decode_body_text(body, "text/html", sniff_html=True)
    assert c == "iso8859-1" and t.endswith("caf\xe9")
    # no sniff for non-html
    t, c = warc.decode_body_text(body, "text/plain", sniff_html=False)
    assert c == "utf-8" or c == "iso8859-1"  # falls through the ladder
    # 4. strict utf-8 default
    t, c = warc.decode_body_text("caf\xe9".encode(), "text/html", True)
    assert (t, c) == ("caf\xe9", "utf-8")
    # 5. latin-1 last resort: invalid utf-8, no declaration
    t, c = warc.decode_body_text(b"caf\xe9 raw", "text/html", True)
    assert (t, c) == ("caf\xe9 raw", "iso8859-1")
    # declared-but-bogus charset falls through the ladder
    t, c = warc.decode_body_text(
        "ok".encode(), "text/html; charset=bogus-enc", True
    )
    assert (t, c) == ("ok", "utf-8")
    # alias tricks that aren't bytes->str codecs are rejected
    t, c = warc.decode_body_text(b"ok", "text/html; charset=rot13", True)
    assert (t, c) == ("ok", "utf-8")


def test_mixed_case_content_type_normalizes(spark):
    """'Text/HTML' captures must flow through text/html filters — the
    media type lowercases at the source; parameters stay verbatim."""
    rec = warc.make_warc_record(
        "response",
        warc.make_http_response(b"<p>hi</p>", "Text/HTML; charset=UTF-8"),
        target_uri="https://x.example/cc",
        content_type="application/http;msgtype=response",
    )
    df = spark.createDataFrame(
        [(1, bytearray(warc.make_warc([rec])))], ["media_id", "payload"]
    )
    from pyspark.sql import functions as F

    rows = (
        warc.warc_response_rows(df)
        .filter(F.col("content_type").startswith("text/html"))
        .collect()
    )
    assert len(rows) == 1
    assert rows[0]["content_type"] == "text/html; charset=UTF-8"
    assert rows[0]["charset"] == "utf-8"


def test_canonical_url_query_strings(spark):
    """ADVICE r9: trailing-slash stripping is PATH-scoped — query
    values keep their slashes; distinct pages stay distinct keys."""
    from pyspark.sql import functions as F

    cases = [
        ("https://a.com/p?next=/", "https://a.com/p?next=/"),
        (
            "https://a.com/login?redirect=//x//",
            "https://a.com/login?redirect=//x//",
        ),
        ("https://a.com/p/?q=1", "https://a.com/p?q=1"),
        ("https://a.com/p///?q=/", "https://a.com/p?q=/"),
        ("HTTPS://A.com/p/#f", "https://a.com/p"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["u"])
    got = [
        r["c"]
        for r in df.select(warc.canonical_url("u").alias("c")).collect()
    ]
    assert got == [e for _, e in cases]


def test_truncated_zlib_deflate_raises_not_corrupts():
    """ADVICE r9: a TRUNCATED zlib-wrapped deflate body must raise the
    truncation contract — never fall through to the raw-deflate retry
    and return silently corrupt bytes."""
    full = zlib.compress(b"hello deflate world " * 20)
    with pytest.raises(ValueError, match="truncated deflate body"):
        warc._decode_content(full[:-8], "deflate")
    # raw deflate still decodes through the fallback
    raw = zlib.compressobj(6, zlib.DEFLATED, -15)
    body = raw.compress(b"raw bytes here") + raw.flush()
    assert warc._decode_content(body, "deflate") == b"raw bytes here"


def test_revisit_resolution(spark):
    """A page whose NEWEST capture is a revisit keeps the revisit date
    but the referred (older response) content — VERDICT r9 task 4."""
    page = warc.make_warc_record(
        "response",
        warc.make_http_response(
            b"<p>the real body</p>", "text/html; charset=utf-8"
        ),
        target_uri="https://x.example/rv",
        content_type="application/http;msgtype=response",
        date="2026-01-01T00:00:00Z",
    )
    revisit = warc.make_warc_record(
        "revisit",
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n",
        target_uri="https://x.example/rv",
        content_type=(
            'application/http;msgtype=response'
        ),
        date="2026-02-02T00:00:00Z",
    )
    df = spark.createDataFrame(
        [(1, bytearray(warc.make_warc([page, revisit])))],
        ["media_id", "payload"],
    )
    rows = warc.warc_response_rows(df)
    got = rows.orderBy("seq").collect()
    assert got[1]["warc_type"] == "revisit"
    assert got[1]["http_status"] == 200 and got[1]["text"] is None
    kept = warc.latest_capture(rows).collect()
    assert len(kept) == 1
    assert kept[0]["warc_date"] == "2026-02-02T00:00:00Z"
    assert kept[0]["text"] == "<p>the real body</p>"
    assert kept[0]["n_captures"] == 2


def test_robots_rfc9309_semantics(spark):
    """RFC 9309 completeness (VERDICT r9 task 3 + ADVICE medium):
    Allow overrides Disallow by longest-match, equal-length ties go to
    Allow, '*'/'$' wildcard rules compile to real matches, rules see
    the query string, and group selection picks the longest agent
    token (named beats '*', longer named beats shorter)."""
    body = (
        "User-agent: googlebot\n"
        "Disallow: /\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /private/\n"
        "Allow: /private/public/\n"
        "Disallow: /*.bak$\n"
        "Disallow: /cgi/*?\n"
        "Allow: /tie/\n"
        "Disallow: /tie/\n"
    )
    robots_bodies = spark.createDataFrame(
        [("a.example", body)], ["domain", "text"]
    )
    pages = spark.createDataFrame(
        [
            ("https://a.example/private/x", 1),        # blocked: prefix
            ("https://a.example/private/public/x", 2), # allowed: longer Allow
            ("https://a.example/f/x.bak", 3),          # blocked: /*.bak$
            ("https://a.example/f/x.bakx", 4),         # allowed: $ anchor
            ("https://a.example/cgi/run?q=1", 5),      # blocked: query seen
            ("https://a.example/cgi/run", 6),          # allowed: no '?'
            ("https://a.example/tie/x", 7),            # allowed: tie -> Allow
            ("https://a.example/open/x", 8),           # allowed: no match
        ],
        ["url", "pid"],
    )
    kept = sorted(
        r["pid"] for r in warc.robots_filter(pages, robots_bodies).collect()
    )
    assert kept == [2, 4, 6, 7, 8]

    # agent-token group selection: longest prefix of the product token
    body2 = (
        "User-agent: *\nDisallow: /a/\n\n"
        "User-agent: sis\nDisallow: /b/\n\n"
        "User-agent: sis-crawler\nDisallow: /c/\n"
    )
    rb = spark.createDataFrame([("x.example", body2)], ["domain", "text"])
    pages2 = spark.createDataFrame(
        [(f"https://x.example/{p}/1", i) for i, p in enumerate("abc")],
        ["url", "pid"],
    )

    def kept_for(agent):
        return sorted(
            r["pid"]
            for r in warc.robots_filter(pages2, rb, agent=agent).collect()
        )

    assert kept_for("sis-crawler") == [0, 1]   # only /c/ blocked
    assert kept_for("sisbot") == [0, 2]        # 'sis' group: /b/ blocked
    assert kept_for("otherbot") == [1, 2]      # '*' group: /a/ blocked
    # googlebot-style disallow-all via the first fixture
    kept_g = sorted(
        r["pid"]
        for r in warc.robots_filter(
            pages, robots_bodies, agent="googlebot"
        ).collect()
    )
    assert kept_g == []


def test_html_article_text(spark):
    """Article scoping + link-density gate: body text in a <div>
    survives (the p/h-only gap), the link-list div dies, content
    outside <article> dies when an article exists, whole page is in
    scope when none does, and a half-anchor tie is kept."""
    from pyspark.sql import functions as F

    nav = '<div><a href="/x">home</a> <a href="/y">about me</a></div>'
    art = (
        "<html><body><div>outside</div><article><h1>T</h1>"
        f"<div>real body text here</div>{nav}</article>"
        "<div>footer</div></body></html>"
    )
    noart = f"<html><body><h1>T</h1><div>plain body</div>{nav}</body></html>"
    tie = "<div><a href='/x'>abcde</a> abcd</div>"  # 5 anchor vs 10 total
    cases = [
        (art, "T\nreal body text here"),
        (noart, "T\nplain body"),
        (tie, "abcde abcd"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], ["html"])
    got = [
        r["t"]
        for r in df.select(
            warc.html_article_text("html").alias("t")
        ).collect()
    ]
    assert got == [e for _, e in cases]


def test_streaming_decontamination_matches_batch(spark, tmp_path):
    """Crawl-admission eval-leak gate: pages sharing an eval 4-gram
    never reach the stored pages log; the streamed (Bloom-prefiltered)
    result equals the batch decontaminate_pages result row-for-row,
    and a full replay into the same log leaves the current view
    unchanged (at-least-once safety)."""
    import os

    from pyspark.sql import functions as F

    from scicat_ingestor_spark.operators import bloom, dedup
    from scicat_ingestor_spark.streaming import crawl

    crawl_dir = str(tmp_path / "crawl")
    os.makedirs(crawl_dir)
    leak = "leak mark eval gram"
    docs = [
        (
            i,
            f"src{i % 3}",
            f"stream page {i} body " + (leak if i % 4 == 0 else "clean"),
        )
        for i in range(12)
    ]
    for i, source, text in docs:
        recs, _, _ = _capture(i, source, text)
        with open(os.path.join(crawl_dir, f"c-{i}.warc.gz"), "wb") as fh:
            fh.write(warc.make_warc(recs, gzip_members=True))

    eval_grams = (
        spark.createDataFrame([(f"the {leak} secret",)], ["text"])
        .select(
            F.explode(dedup.word_shingles(F.col("text"), n=4)).alias(
                "gram"
            )
        )
        .distinct()
    )
    pack = bloom.build(eval_grams, "gram")

    files = warc.warc_scan(spark, crawl_dir)
    batch = sorted(
        (r["url"], r["text"])
        for r in crawl.decontaminate_pages(
            crawl.extract_pages(files), eval_grams, pack
        ).collect()
    )
    assert len(batch) == 9  # 12 pages, 3 contaminated (0, 4, 8)

    pages, ck = str(tmp_path / "pages"), str(tmp_path / "ck")
    stream_files = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("maxFilesPerTrigger", 4)
        .load(crawl_dir)
    )
    q = crawl.run_crawl_ingest_stream(
        stream_files, pages, ck,
        eval_grams=eval_grams, bloom_pack=pack,
    )
    q.awaitTermination()
    got = sorted(
        (r["url"], r["text"])
        for r in spark.read.parquet(pages).collect()
    )
    assert got == batch

    # replay: drain the same files again under a FRESH checkpoint (the
    # worst-case duplicate admission); the current view is unchanged
    view_before = sorted(
        (r["url"], r["text"])
        for r in crawl.current_pages(spark, pages).collect()
    )
    q2 = crawl.run_crawl_ingest_stream(
        stream_files, pages, str(tmp_path / "ck2"),
        eval_grams=eval_grams, bloom_pack=pack,
    )
    q2.awaitTermination()
    view_after = sorted(
        (r["url"], r["text"])
        for r in crawl.current_pages(spark, pages).collect()
    )
    assert view_after == view_before and len(view_after) == 9


def test_tolerant_walk_corruption_fuzz():
    """Fuzz the dead-letter walk: random single-byte mutations and
    truncations anywhere in a multi-record capture (both containers)
    must NEVER raise, and records that framed BEFORE the damage point
    must survive byte-identically. Damage strictly after record j's
    bytes can't affect records 0..j."""
    import random

    rng = random.Random(20260816)
    recs = [
        _good_response(1, p, f"text {p} " + "w" * (rng.randint(0, 40)))
        for p in "abcdef"
    ]
    strict = [
        dict(r, error=None) for r in warc.warc_records(b"".join(recs))
    ]
    offsets = [0]
    for r in recs:
        offsets.append(offsets[-1] + len(r))

    for trial in range(300):
        gz = trial % 2 == 1
        buf = bytearray(warc.make_warc(recs, gzip_members=gz))
        mode = trial % 3
        if mode == 0:
            pos = rng.randrange(len(buf))
            buf[pos] ^= 1 << rng.randrange(8)
        elif mode == 1:
            buf = buf[: rng.randrange(len(buf))]
            pos = len(buf)
        else:
            pos = rng.randrange(len(buf))
            buf = buf[:pos] + b"\x00\xff" * 3 + buf[pos:]
        got = warc.warc_records_tolerant(bytes(buf))
        assert all(isinstance(r.get("error"), (str, type(None))) for r in got)
        if not gz:
            # plain container: records fully before the damage offset
            # must parse identically to the strict walk's prefix
            intact = 0
            while intact < 6 and offsets[intact + 1] <= pos:
                intact += 1
            good = [r for r in got if r["error"] is None]
            assert [g["block"] for g in good[:intact]] == [
                s["block"] for s in strict[:intact]
            ]


def test_robots_filter_plan_is_equi_broadcast(spark):
    """r10 plan shape: the rule table joins as an EQUI broadcast-hash
    join on domain (the longest-match fold is scan-local) — no
    BroadcastNestedLoopJoin, no shuffle of the page side."""
    pages = spark.createDataFrame(
        [("https://a.example/p", 1)], ["url", "pid"]
    )
    robots_bodies = spark.createDataFrame(
        [("a.example", "User-agent: *\nDisallow: /x/")],
        ["domain", "text"],
    )
    plan = (
        warc.robots_filter(pages, robots_bodies)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoop" not in plan


def test_url_resolve_and_outlinks(spark):
    """RFC 3986-subset resolution conventions and the outlink filter
    (http(s) only, fragments/empties/dot-segments dropped)."""
    from pyspark.sql import functions as F

    base = "https://a.example/d/sub/page.html"
    cases = [
        ("https://other.example/x", "https://other.example/x"),
        ("//cdn.example/y", "https://cdn.example/y"),
        ("/root/z", "https://a.example/root/z"),
        ("rel.html", "https://a.example/d/sub/rel.html"),
        ("rel.html#frag", "https://a.example/d/sub/rel.html"),
        ("#top", None),
        ("", None),
        ("../up.html", None),      # dot-segment: documented drop
        ("./here.html", None),
        ("mailto:x@y.z", "mailto:x@y.z"),  # resolves; filtered later
    ]
    df = spark.createDataFrame([(base, h) for h, _ in cases], ["u", "h"])
    got = [
        r["r"]
        for r in df.select(
            warc.url_resolve("u", "h").alias("r")
        ).collect()
    ]
    assert got == [e for _, e in cases]

    html = (
        '<p><a href="https://b.example/1">x</a>'
        "<a href='/two'>y</a><a href=\"#f\">z</a>"
        '<a class="q" href="mailto:m@e.x">m</a></p>'
    )
    pages = spark.createDataFrame(
        [("https://a.example/d/p", html)], ["url", "text"]
    )
    links = sorted(
        r["link"] for r in warc.page_outlinks(pages).collect()
    )
    assert links == ["https://a.example/two", "https://b.example/1"]


def test_pagerank_matches_reference_implementation(spark):
    """The DataFrame power iteration equals a serial reference PR on a
    small graph with a dangling node and asymmetric degrees."""
    from scicat_ingestor_spark.operators import graph

    edge_list = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"),
        ("b", "e"),  # e is dangling
    ]
    edges = spark.createDataFrame(edge_list, ["src", "dst"])
    got = {
        r["node"]: r["rank"]
        for r in graph.pagerank(edges, 0.85, iterations=5).collect()
    }

    nodes = sorted({n for e in edge_list for n in e})
    out = {}
    for s, d in edge_list:
        out.setdefault(s, []).append(d)
    n = len(nodes)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(5):
        contrib = {v: 0.0 for v in nodes}
        for s, ds in out.items():
            for d in ds:
                contrib[d] += r[s] * (1.0 / len(ds))
        dm = sum(r[v] for v in nodes if v not in out)
        r = {
            v: 0.15 / n + 0.85 * (contrib[v] + dm / n) for v in nodes
        }
    for v in nodes:
        assert abs(got[v] - r[v]) < 1e-12, (v, got[v], r[v])
    # ranks stay a distribution (mass conservation under damping)
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_resolve_redirects_chains_and_cycles(spark):
    """Chains resolve with exact hop counts; relative Locations
    resolve against their page; cycles stop at the hop bound instead
    of looping."""
    rows = spark.createDataFrame(
        [
            # chain: r2 -> r1 -> p (content)
            (1, 0, "response", "https://a.example/p", None, 200,
             "text/html", None, "body", None, None),
            (1, 1, "response", "https://a.example/r1", None, 301,
             "text/html", None, None, None, "/p"),
            (1, 2, "response", "https://a.example/r2", None, 302,
             "text/html", None, None, None, "r1"),
            # 2-cycle: x <-> y, must stop at max_hops
            (1, 3, "response", "https://a.example/x", None, 301,
             "text/html", None, None, None, "/y"),
            (1, 4, "response", "https://a.example/y", None, 301,
             "text/html", None, None, None, "/x"),
        ],
        "media_id long, seq int, warc_type string, url string, "
        "warc_date string, http_status int, content_type string, "
        "charset string, text string, error string, redirect_to string",
    )
    got = {
        r["url"]: (r["final_url"], r["n_hops"])
        for r in warc.resolve_redirects(rows, max_hops=3).collect()
    }
    assert got["https://a.example/p"] == ("https://a.example/p", 0)
    assert got["https://a.example/r1"] == ("https://a.example/p", 1)
    assert got["https://a.example/r2"] == ("https://a.example/p", 2)
    # cycle: 3 hops of x->y->x->y ends at y with hops = max_hops
    assert got["https://a.example/x"] == ("https://a.example/y", 3)
    assert got["https://a.example/y"] == ("https://a.example/x", 3)


def test_wet_writer_to_disk_and_scan_back(spark, tmp_path):
    """write_wet_dir lands real .warc.gz files that the binaryFile
    scan path re-reads verbatim — the interchange contract."""
    from pyspark.sql import functions as F

    pages = spark.createDataFrame(
        [
            (f"https://s{i % 3}.example/p{i}", f"text body {i}",
             "2026-01-05T00:00:00Z")
            for i in range(10)
        ],
        ["url", "text", "warc_date"],
    )
    out = str(tmp_path / "wet")
    shards = warc.wet_shard_bytes(pages, shards=4)
    n = warc.write_wet_dir(shards, out)
    assert 1 <= n <= 4
    back = (
        warc.warc_response_rows(warc.warc_scan(spark, out))
        .filter(F.col("warc_type") == "conversion")
        .select("url", "text")
        .collect()
    )
    got = sorted((r["url"], r["text"]) for r in back)
    exp = sorted(
        (f"https://s{i % 3}.example/p{i}", f"text body {i}")
        for i in range(10)
    )
    assert got == exp


def test_cdx_surt_and_roundtrip(spark):
    """SURT key conventions + CDXJ generate/parse symmetry + the
    index-only latest lookup."""
    from pyspark.sql import functions as F

    from scicat_ingestor_spark.sources import cdx

    cases = [
        ("https://www.Example.ORG/A/b?Q=1", "org,example,www)/a/b?q=1"),
        ("http://a.b.c.example/x/", "example,c,b,a)/x"),
        ("https://host.net/p#frag", "net,host)/p"),
        ("https://host.net/", "net,host)"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["u"])
    got = [
        r["k"] for r in df.select(cdx.surt_key("u").alias("k")).collect()
    ]
    assert got == [e for _, e in cases]

    rows = spark.createDataFrame(
        [
            (1, 0, "response", "https://a.example/p", "2026-01-02T03:04:05Z",
             200, "text/html; charset=utf-8", "utf-8", "<p>new</p>", None, None),
            (1, 1, "response", "HTTPS://A.EXAMPLE/p/#f", "2025-01-01T00:00:00Z",
             200, "text/html", "utf-8", "<p>old</p>", None, None),
            (1, 2, "warcinfo", None, "2026-01-01T00:00:00Z",
             None, "application/warc-fields", None, None, None, None),
            (1, 3, "response", "https://a.example/err", "2026-01-01T00:00:00Z",
             None, None, None, None, "boom", None),
        ],
        "media_id long, seq int, warc_type string, url string, "
        "warc_date string, http_status int, content_type string, "
        "charset string, text string, error string, redirect_to string",
    )
    lines = cdx.cdxj_lines(rows)
    raw = [r["line"] for r in lines.collect()]
    assert len(raw) == 2  # warcinfo + dead-letter rows excluded
    assert all(l.startswith("example,a)/p ") for l in raw)
    latest = cdx.cdx_latest(cdx.cdx_parse(lines)).collect()
    assert len(latest) == 1
    r = latest[0]
    assert r["timestamp"] == "20260102030405"
    assert r["url"] == "https://a.example/p"
    assert r["n_captures"] == 2 and r["mime"] == "text/html"


def test_robots_crawl_delay_and_sitemaps(spark):
    """Crawl-delay honors the longest-agent-token group; Sitemap lines
    are group-independent; absent directives yield null."""
    from pyspark.sql import functions as F

    body = (
        "User-agent: *\nCrawl-delay: 2\nDisallow: /x/\n\n"
        "User-agent: sis\nCrawl-delay: 1\n\n"
        "User-agent: sis-crawler\nCrawl-delay: 0.5\n"
        "Sitemap: https://a.example/s1.xml\n"
        "# comment\nSitemap: https://a.example/s2.xml  # trailing\n"
    )
    df = spark.createDataFrame([(body,), ("User-agent: *\nDisallow: /\n",)], ["text"])
    rows = df.select(
        warc.robots_crawl_delay("text", "sis-crawler").alias("d_sc"),
        warc.robots_crawl_delay("text", "sisbot").alias("d_sb"),
        warc.robots_crawl_delay("text", "otherbot").alias("d_o"),
        warc.robots_sitemaps("text").alias("maps"),
    ).collect()
    assert rows[0]["d_sc"] == 0.5   # longest token wins
    assert rows[0]["d_sb"] == 1.0   # 'sis' prefix group
    assert rows[0]["d_o"] == 2.0    # falls to '*'
    assert rows[0]["maps"] == [
        "https://a.example/s1.xml", "https://a.example/s2.xml",
    ]
    assert rows[1]["d_sc"] is None and rows[1]["maps"] == []


def test_streaming_crawl_feeds_link_graph(spark, tmp_path):
    """Composition: the streamed pages log's current view feeds
    out-link extraction and PageRank identically to the batch path —
    the crawl-frontier loop (ingest -> current web -> rank domains)
    closes over the streaming shell."""
    import os

    from pyspark.sql import functions as F

    from scicat_ingestor_spark.operators import graph
    from scicat_ingestor_spark.streaming import crawl

    crawl_dir = str(tmp_path / "crawl")
    os.makedirs(crawl_dir)
    for i in range(9):
        html = (
            f"<html><body><p>page {i}</p>"
            f'<a href="https://hub{i % 3}.example.net/x">h</a>'
            "</body></html>"
        )
        rec = warc.make_warc_record(
            "response",
            warc.make_http_response(
                html.encode(), "text/html; charset=utf-8"
            ),
            target_uri=f"https://src{i % 4}.example.org/{i}",
            content_type="application/http;msgtype=response",
        )
        with open(os.path.join(crawl_dir, f"c-{i}.warc.gz"), "wb") as fh:
            fh.write(warc.make_warc([rec], gzip_members=True))

    def ranks_of(pages_df):
        edges = graph.domain_edges(
            warc.page_outlinks(pages_df.select("url", "text"))
        )
        return {
            r["node"]: round(r["rank"], 9)
            for r in graph.pagerank(edges, iterations=3).collect()
        }

    batch = ranks_of(crawl.extract_pages(warc.warc_scan(spark, crawl_dir)))

    pages, ck = str(tmp_path / "pages"), str(tmp_path / "ck")
    stream_files = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("maxFilesPerTrigger", 3)
        .load(crawl_dir)
    )
    crawl.run_crawl_ingest_stream(
        stream_files, pages, ck
    ).awaitTermination()
    streamed = ranks_of(crawl.current_pages(spark, pages))
    assert streamed == batch and len(batch) == 7  # 4 srcs + 3 hubs


def test_resolve_redirects_conflicting_targets_no_fanout(spark):
    """A URL whose captures redirected to different targets across
    time maps to exactly ONE deterministic target — never duplicating
    the capture rows through the resolve join."""
    rows = spark.createDataFrame(
        [
            (1, 0, "response", "https://a.example/r", None, 301,
             "text/html", None, None, None, "/new"),
            (1, 1, "response", "https://a.example/r", None, 301,
             "text/html", None, None, None, "/old"),
        ],
        "media_id long, seq int, warc_type string, url string, "
        "warc_date string, http_status int, content_type string, "
        "charset string, text string, error string, redirect_to string",
    )
    got = warc.resolve_redirects(rows, max_hops=2).collect()
    assert len(got) == 2  # both capture rows survive, no fan-out
    assert {r["final_url"] for r in got} == {"https://a.example/old"}


def test_robots_blank_line_group_stacking(spark):
    """RFC 9309 grammar: blank / comment-only lines between stacked
    User-agent lines do NOT close the header run — in
    'User-agent: a\\n\\nUser-agent: b\\nDisallow: /x' BOTH agents get
    the rule (the r10 ADVICE under-block)."""
    from pyspark.sql import functions as F

    body = (
        "User-agent: aaa-bot\n\n"
        "# still the same header run\n"
        "User-agent: bbb-bot\n"
        "Disallow: /x\n"
        "Crawl-delay: 3\n"
    )
    df = spark.createDataFrame([(body,)], ["text"])
    rules = df.select(warc.robots_rules("text").alias("r")).collect()[0]["r"]
    assert {(r["agent"], r["allow"], r["value"]) for r in rules} == {
        ("aaa-bot", 0, "/x"),
        ("bbb-bot", 0, "/x"),
    }
    got = df.select(
        warc.robots_crawl_delay("text", "aaa-bot").alias("da"),
        warc.robots_crawl_delay("text", "bbb-bot").alias("db"),
        warc.robots_crawl_delay("text", "other").alias("dn"),
    ).collect()[0]
    assert got["da"] == 3.0 and got["db"] == 3.0 and got["dn"] is None


def test_robots_crawl_delay_group_exclusive(spark):
    """Directives never mix across groups (r10 ADVICE): when the
    RFC-selected group declares no Crawl-delay the answer is NULL —
    it does not inherit the '*' group's delay. First-wins on a
    duplicated delay inside one group; delay outside any group is
    ignored."""
    body = (
        "Crawl-delay: 9\n"  # outside any group: ignored
        "User-agent: *\nCrawl-delay: 2\nDisallow: /x/\n\n"
        "User-agent: sis-crawler\nDisallow: /y/\n\n"
        "User-agent: twice\nCrawl-delay: 4\nCrawl-delay: 7\n"
    )
    df = spark.createDataFrame([(body,)], ["text"])
    got = df.select(
        warc.robots_crawl_delay("text", "sis-crawler").alias("d_sel"),
        warc.robots_crawl_delay("text", "other").alias("d_star"),
        warc.robots_crawl_delay("text", "twice").alias("d_first"),
    ).collect()[0]
    assert got["d_sel"] is None       # selected group has no delay
    assert got["d_star"] == 2.0       # '*' group still serves others
    assert got["d_first"] == 4.0      # first delay in a group wins


def test_decontaminate_drops_revisit_siblings(spark):
    """A contaminated page's revisit sibling (null text, same
    canonical URL) must ALSO drop (r10 ADVICE): otherwise the pages
    log records the contaminated URL via a null-text revisit row that
    latest_capture can surface as the newest observation."""
    from pyspark.sql import functions as F

    from scicat_ingestor_spark.operators import dedup
    from scicat_ingestor_spark.streaming import crawl

    leak = "leak mark eval gram"
    pages = spark.createDataFrame(
        [
            # contaminated response + its revisit (null text)
            ("https://a.example/1", "2026-02-02T00:00:00Z", 1, 0,
             f"<p>page {leak} body</p>"),
            ("https://a.example/1", "2026-03-03T00:00:00Z", 2, 0, None),
            # clean response + its revisit: both survive
            ("https://a.example/2", "2026-02-02T00:00:00Z", 1, 1,
             "<p>clean body</p>"),
            ("https://a.example/2", "2026-03-03T00:00:00Z", 2, 1, None),
        ],
        "url string, warc_date string, media_id long, seq int, "
        "text string",
    )
    eval_grams = (
        spark.createDataFrame([(f"the {leak} secret",)], ["text"])
        .select(F.explode(dedup.word_shingles("text", n=4)).alias("gram"))
        .distinct()
    )
    got = sorted(
        (
            (r["url"], r["text"])
            for r in crawl.decontaminate_pages(pages, eval_grams).collect()
        ),
        key=lambda t: (t[0], t[1] or ""),
    )
    assert got == [
        ("https://a.example/2", None),
        ("https://a.example/2", "<p>clean body</p>"),
    ]


def test_wet_shard_parts_cap_and_roundtrip(spark, tmp_path):
    """wet_shard_bytes flushes a payload row every max_mb_per_row MiB
    of raw record bytes (r10 ADVICE: bounded task memory, no ~2 GB
    Arrow cell) — an 'under-sharded' corpus degrades into more part
    rows, every page still roundtrips through the scan path, and
    write_wet_dir lands one file per (shard, part)."""
    import os

    from pyspark.sql import functions as F

    body = "wet " * 80_000  # ~320 KiB per page
    pages = spark.createDataFrame(
        [(f"https://w.example/{i}", body + str(i),
          "2026-02-02T00:00:00Z") for i in range(8)],
        "url string, text string, warc_date string",
    )
    shards = warc.wet_shard_bytes(pages, shards=1, max_mb_per_row=1)
    rows = shards.collect()
    assert len(rows) >= 2                       # the cap split the shard
    assert sum(r["n_pages"] for r in rows) == 8
    assert len({(r["shard_id"], r["part"]) for r in rows}) == len(rows)
    assert all(len(r["payload"]) < 2 * 1024 * 1024 for r in rows)

    out = str(tmp_path / "wet")
    n = warc.write_wet_dir(shards, out)
    files = sorted(os.listdir(out))
    assert len(files) == len(rows) and n == len(rows)

    reread = warc.warc_response_rows(warc.warc_scan(spark, out))
    got = sorted(
        r["url"]
        for r in reread.filter(F.col("warc_type") == "conversion")
        .select("url").collect()
    )
    assert got == sorted(f"https://w.example/{i}" for i in range(8))


def test_payload_digest_carried_into_cdx(spark):
    """WARC-Payload-Digest rides through warc_response_rows into the
    CDXJ digest verbatim (r10 ADVICE), so a revisit row indexes the
    SAME digest as the identical response it re-captured — the
    payload-equivalence dedup an index owes its consumers; rows
    without the header fall back to md5(text) (text-hash-only)."""
    from pyspark.sql import functions as F

    from scicat_ingestor_spark.sources import cdx

    digest = "sha1:AAAABBBBCCCCDDDDEEEEFFFFGGGGHHHHIIIIJJJJ"
    url = "https://d.example/page"
    recs = [
        warc.make_warc_record(
            "response",
            warc.make_http_response(b"<p>same body</p>", "text/html"),
            target_uri=url,
            content_type="application/http;msgtype=response",
            date="2026-01-01T00:00:00Z",
            payload_digest=digest,
        ),
        warc.make_warc_record(
            "revisit",
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n",
            target_uri=url,
            content_type=(
                'application/http;msgtype=response'
            ),
            date="2026-02-02T00:00:00Z",
            payload_digest=digest,
        ),
        warc.make_warc_record(  # no digest header: md5-of-text fallback
            "response",
            warc.make_http_response(b"<p>other</p>", "text/html"),
            target_uri="https://d.example/other",
            content_type="application/http;msgtype=response",
            date="2026-01-01T00:00:00Z",
        ),
    ]
    df = spark.createDataFrame(
        [(1, warc.make_warc(recs))], "media_id long, payload binary"
    )
    rows = warc.warc_response_rows(df)
    assert [r["payload_digest"] for r in rows.orderBy("seq").collect()] == [
        digest, digest, None,
    ]
    parsed = cdx.cdx_parse(cdx.cdxj_lines(rows)).collect()
    by_url = {}
    for r in parsed:
        by_url.setdefault(r["url"], []).append(r["digest"])
    assert by_url[url] == [digest, digest]  # revisit matches response
    [md5d] = by_url["https://d.example/other"]
    import hashlib

    assert md5d == hashlib.md5("<p>other</p>".encode()).hexdigest()


def test_warc_in_warc_resync_reemit():
    """Pin the DOCUMENTED resync trade (warc.py walker): a damaged
    record whose block embeds a complete WARC record (warc-in-warc
    payload) dead-letters the outer record and RE-EMITS the embedded
    record plus the true tail — never raises, never loses a
    well-formed record that follows the damage. Fuzzed over damage
    kinds and container layouts."""
    import random

    rng = random.Random(20260817)
    inner = _good_response(7, "inner", "embedded payload")
    tail = _good_response(8, "tail", "after the damage")
    head = _good_response(6, "head", "before the damage")

    for trial in range(60):
        # outer record whose block IS a warc (warc-in-warc)
        outer = warc.make_warc_record(
            "resource", inner, target_uri="https://x.example/nested",
            content_type="application/warc",
        )
        buf = bytearray(head + outer + tail)
        # damage inside the OUTER record's framing/bytes, before the
        # embedded version line, so the walk must resync
        damage_at = len(head) + rng.randrange(12)
        if trial % 2 == 0:
            buf[damage_at] ^= 1 << rng.randrange(8)
        else:
            del buf[damage_at]
        got = warc.warc_records_tolerant(bytes(buf))
        urls = [r["target_uri"] for r in got if r.get("error") is None]
        # head may or may not survive depending on damage position;
        # the tail record and (documented re-emit) the embedded
        # record must both be present when the outer framing broke
        assert "https://x.example/tail" in urls
        if any(r.get("error") for r in got):
            assert "https://x.example/inner" in urls or (
                "https://x.example/nested" in urls
            )
        assert all(isinstance(r.get("error"), (str, type(None))) for r in got)


def test_sitemap_parse_and_frontier(spark):
    """urlset/sitemapindex parsing (entity-decoded locs, nullable
    lastmod) and the one-hop frontier composition: discovered minus
    captured."""
    from pyspark.sql import functions as F

    urlset = (
        "<urlset>"
        "<url><loc> https://a.example/p1 </loc>"
        "<lastmod>2026-01-02</lastmod></url>"
        "<url><loc>https://a.example/q?x=1&amp;y=2</loc></url>"
        "<url><lastmod>2026-01-01</lastmod></url>"  # no loc: dropped
        "</urlset>"
    )
    index = (
        "<sitemapindex><sitemap>"
        "<loc>https://a.example/sitemap.xml</loc>"
        "</sitemap></sitemapindex>"
    )
    df = spark.createDataFrame([(urlset, index)], ["u", "x"])
    got = df.select(
        warc.sitemap_entries("u").alias("e"),
        warc.sitemap_index_locs("x").alias("l"),
        warc.is_sitemap_index("u").alias("iu"),
        warc.is_sitemap_index("x").alias("ix"),
    ).collect()[0]
    assert [(e["loc"], e["lastmod"]) for e in got["e"]] == [
        ("https://a.example/p1", "2026-01-02"),
        ("https://a.example/q?x=1&y=2", None),
    ]
    assert got["l"] == ["https://a.example/sitemap.xml"]
    assert (got["iu"], got["ix"]) == (False, True)

    recs = [
        warc.make_warc_record(
            "response",
            warc.make_http_response(
                b"Sitemap: https://a.example/sitemap.xml\r\n",
                "text/plain",
            ),
            target_uri="https://a.example/robots.txt",
            content_type="application/http;msgtype=response",
        ),
        warc.make_warc_record(
            "response",
            warc.make_http_response(
                urlset.encode(), "text/xml; charset=utf-8"
            ),
            target_uri="https://a.example/sitemap.xml",
            content_type="application/http;msgtype=response",
        ),
        warc.make_warc_record(  # p1 already captured
            "response",
            warc.make_http_response(b"<p>have it</p>", "text/html"),
            target_uri="https://a.example/p1",
            content_type="application/http;msgtype=response",
        ),
    ]
    rows = warc.warc_response_rows(
        spark.createDataFrame(
            [(1, warc.make_warc(recs))], "media_id long, payload binary"
        )
    )
    frontier = warc.sitemap_frontier(rows).collect()
    assert [(r["domain"], r["url"], r["lastmod"]) for r in frontier] == [
        ("a.example", "https://a.example/q?x=1&y=2", None)
    ]


def test_extract_links_and_anchor_agg(spark):
    """extract_links pairs hrefs with CLEANED visible anchor text
    (inner tags stripped, entities decoded, whitespace collapsed);
    anchor_text_agg groups by canonical target with the sorted
    distinct anchor cap."""
    from pyspark.sql import functions as F

    html = (
        '<a href="https://t.example/page">R&amp;D <b>note</b>  1</a>'
        "<a href='/go'>local</a>"
        '<a href="https://t.example/page#frag">R&amp;D <b>note</b>  1'
        "</a>"
        '<a href="">empty href skipped</a>'
        '<a href="https://t.example/page">zzz</a>'
    )
    pages = spark.createDataFrame(
        [("https://s.example/p", html)], ["url", "text"]
    )
    links = warc.page_anchor_links(pages).collect()
    assert sorted((r["link"], r["anchor"]) for r in links) == [
        ("https://s.example/go", "local"),
        ("https://t.example/page", "R&D note 1"),
        ("https://t.example/page", "R&D note 1"),
        ("https://t.example/page", "zzz"),
    ]
    agg = {
        r["url"]: r
        for r in warc.anchor_text_agg(
            warc.page_anchor_links(pages), max_anchors=1
        ).collect()
    }
    t = agg["https://t.example/page"]
    assert t["n_refs"] == 3
    assert t["anchors"] == ["R&D note 1"]  # capped after sort


def test_harmonic_centrality_matches_reference(spark):
    """Exact truncated-BFS harmonic centrality against a serial
    Floyd-style reference on a graph with 1/2/3-hop paths and an
    unreachable node."""
    from scicat_ingestor_spark.operators import graph

    edge_list = [
        ("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("e", "a"),
    ]
    edges = spark.createDataFrame(edge_list, ["src", "dst"])
    got = {
        r["node"]: round(r["harmonic"], 9)
        for r in graph.harmonic_centrality(edges, max_hops=3).collect()
    }
    nodes = sorted({x for e in edge_list for x in e})
    INF = 99
    dist = {(u, v): INF for u in nodes for v in nodes}
    for u, v in edge_list:
        dist[(u, v)] = 1
    for _ in range(3):
        for u in nodes:
            for w in nodes:
                for v in nodes:
                    d = dist[(u, w)] + dist[(w, v)]
                    if d < dist[(u, v)]:
                        dist[(u, v)] = d
    exp = {
        v: round(
            sum(
                1.0 / dist[(u, v)]
                for u in nodes
                if u != v and dist[(u, v)] <= 3
            ),
            9,
        )
        for v in nodes
    }
    assert got == exp
    assert got["a"] == 1.0        # only e -> a
    assert got["e"] == 0.0        # nothing reaches e


def test_hyperball_tracks_exact_harmonic(spark):
    """On a 60-node random graph the HLL estimate stays within the
    sketch's error envelope of the exact truncated-BFS value (4096
    registers -> ~1.6% rsd; small counts hit the exact
    linear-counting branch, so the envelope is tight)."""
    import random

    from scicat_ingestor_spark.operators import graph

    rng = random.Random(20260816)
    nodes = [f"h{i}.example" for i in range(60)]
    edge_set = set()
    while len(edge_set) < 180:
        a, b = rng.sample(range(60), 2)
        edge_set.add((nodes[a], nodes[b]))
    edges = spark.createDataFrame(sorted(edge_set), ["src", "dst"])
    exact = {
        r["node"]: r["harmonic"]
        for r in graph.harmonic_centrality(edges, max_hops=3).collect()
    }
    est = {
        r["node"]: r["harmonic_est"]
        for r in graph.harmonic_centrality_hll(
            edges, max_hops=3
        ).collect()
    }
    assert set(exact) == set(est)
    for n in exact:
        assert abs(est[n] - exact[n]) <= max(0.05 * exact[n], 0.2), (
            n, exact[n], est[n],
        )


def test_normalize_url_policy(spark):
    """Query-param sorting, tracking strip (case-insensitive names,
    values preserved), empty-query collapse with slash strip, and
    value-bearing '?next=/' safety."""
    cases = [
        ("https://a.example/p?b=2&a=1", "https://a.example/p?a=1&b=2"),
        ("https://a.example/p?a=1&UTM_Source=x&FBCLID=z",
         "https://a.example/p?a=1"),
        ("https://a.example/p/?utm_campaign=x#f", "https://a.example/p"),
        ("https://a.example/p?sessionid=42", "https://a.example/p"),
        ("https://a.example/p?next=/&a=1",
         "https://a.example/p?a=1&next=/"),
        ("https://a.example/p", "https://a.example/p"),
        ("https://a.example/p?", "https://a.example/p"),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], ["u"])
    got = [
        r["n"]
        for r in df.select(
            warc.normalize_url_policy("u").alias("n")
        ).collect()
    ]
    assert got == [c[1] for c in cases]


def test_extract_links_nofollow_semantics(spark):
    """rel=nofollow flag (r11): token-boundary matching, either quote
    style, any attribute order; 'nofollower' and rel-less anchors are
    followed."""
    html = (
        '<a href="https://a.example/1">plain</a>'
        '<a rel="nofollow" href="https://a.example/2">nf dq first</a>'
        "<a href='https://a.example/3' rel='ugc nofollow'>nf sq multi</a>"
        '<a rel="nofollower" href="https://a.example/4">boundary</a>'
        '<a rel="NOFOLLOW" href="https://a.example/5">case</a>'
        '<a rel="sponsored" href="https://a.example/6">other rel</a>'
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(html,)], "t string")
    rows = df.select(
        F.explode(warc.extract_links(F.col("t"))).alias("l")
    ).select("l.href", "l.nofollow").collect()
    got = {r["href"]: r["nofollow"] for r in rows}
    assert got == {
        "https://a.example/1": False,
        "https://a.example/2": True,
        "https://a.example/3": True,
        "https://a.example/4": False,
        "https://a.example/5": True,
        "https://a.example/6": False,
    }


def test_page_anchor_links_follow_only(spark):
    html = (
        '<a href="https://x.example/k">keep</a>'
        '<a rel="nofollow" href="https://x.example/d">drop</a>'
    )
    pages = spark.createDataFrame(
        [("https://s.example/p", html)], "url string, text string"
    )
    all_links = warc.page_anchor_links(pages).collect()
    assert {(r["link"], r["nofollow"]) for r in all_links} == {
        ("https://x.example/k", False),
        ("https://x.example/d", True),
    }
    kept = warc.page_anchor_links(pages, follow_only=True).collect()
    assert [r["link"] for r in kept] == ["https://x.example/k"]
