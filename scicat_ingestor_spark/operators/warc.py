"""WARC web-capture framing + HTML -> text extraction (r9).

Where real training data starts: every pretraining pipeline begins at
WARC records (ISO 28500 — the Common Crawl container) holding HTTP
responses whose bodies are HTML. This module is the capture-side front
end of the corpus-prep family (the driver's training-data north star;
the reference ingestor itself is HDF5-only, so there is no reference
twin to cite — the byte-walk style follows operators/mp4.py).

Division of labor, Spark-first:

- **Record framing, gzip members, HTTP parsing are bytes work** —
  Arrow-batched ``mapInPandas`` (:func:`warc_response_rows`), exactly
  like the media decoders. Never row-at-a-time Python UDFs.
- **Everything after the bytes is JVM Column expressions** —
  :func:`html_text` is a ``regexp_replace``/``replace``/higher-order
  chain that runs inside whole-stage codegen; URL parsing and
  content-type filtering are plain Column ops. No Python in the
  string plane.

Scale: ``.warc.gz`` is a concatenation of PER-RECORD gzip members and
is not splittable mid-file, so parallelism is per FILE — which is the
real layout anyway (Common-Crawl ships ~1 GB files, tens of thousands
per snapshot; file-level parallelism with ``binaryFile`` IS the scale
path, :func:`warc_scan`). A 100 TB crawl is ~100k files >> cluster
cores; no repartition needed, decode stays scan-local.

Failure channel: malformed framing raises ``ValueError("not a WARC:
...")`` — the shared ingest contract (never a leaked struct/zlib
error, never a silently short parse).

HTML -> text convention (documented, deterministic — both the Column
chain and the Python twin :func:`html_to_text` implement exactly
this):

1. strip comments ``<!-- ... -->`` and the full content of
   ``script``/``style``/``noscript``/``template`` elements;
2. collapse ALL source whitespace runs to one space (so markup
   line-wrapping inside a paragraph never splits a line);
3. block-level tags (open or close: p, div, h1-h6, br, li, tr, td,
   th, table, ul, ol, dl, dt, dd, blockquote, pre, hr, title,
   section, article, aside, header, footer, nav, form) become one
   newline;
4. every remaining tag becomes one space;
5. entities decode ONE pass (named subset lt/gt/quot/apos/nbsp +
   numeric #34/#39, with ``&amp;`` LAST so ``&amp;lt;`` yields the
   literal ``&lt;`` — html.unescape's one-pass semantics);
6. per line: trim + collapse internal spaces; empty lines drop;
   surviving lines join with ``\\n``.
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_WARC_VERSIONS = (b"WARC/1.0", b"WARC/1.1", b"WARC/0.18")

_BLOCK_TAGS = (
    "p|div|h[1-6]|br|li|tr|td|th|table|ul|ol|dl|dt|dd|blockquote|pre|"
    "hr|title|section|article|aside|header|footer|nav|form"
)
_RE_COMMENT = r"(?s)<!--.*?-->"
_RE_DROPPED = r"(?is)<(script|style|noscript|template)\b[^>]*>.*?</\1\s*>"
_RE_BLOCK = rf"(?i)</?({_BLOCK_TAGS})\b[^>]*>"
_RE_ANY_TAG = r"<[^>]*>"
# one-pass entity subset; amp LAST is what makes it one-pass
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&#34;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


# ---------------------------------------------------------------------------
# bytes plane: gzip members, record framing, HTTP messages
# ---------------------------------------------------------------------------

# Hard ceiling on inflated bytes per payload/body (the decompression-
# bomb bound — the WARC analogue of jpegc.MAX_DECODE_PIXELS). 1 GiB
# comfortably covers real capture files (CC ships ~1 GB COMPRESSED
# files but parses them record-by-record; single records/bodies are
# orders of magnitude smaller) while capping a hostile 1000:1 bomb.
MAX_INFLATED_BYTES = 1 << 30


def _bounded_inflate(
    o: "zlib._Decompress", data: bytes, budget: int, what: str
) -> bytes:
    """Inflate with an output ceiling: decompressobj.max_length chunks,
    raising ValueError the moment the budget is exceeded — never
    materializing an unbounded bytes object from untrusted input."""
    out = []
    try:
        chunk = o.decompress(data, budget + 1)
    except zlib.error as e:
        raise ValueError(f"not a WARC: bad {what} ({e})")
    while chunk:
        out.append(chunk)
        budget -= len(chunk)
        if budget < 0:
            raise ValueError(
                f"not a WARC: {what} exceeds inflate cap "
                f"of {MAX_INFLATED_BYTES} bytes"
            )
        if o.eof or not o.unconsumed_tail:
            break
        try:
            chunk = o.decompress(o.unconsumed_tail, budget + 1)
        except zlib.error as e:
            raise ValueError(f"not a WARC: bad {what} ({e})")
    return b"".join(out)


def gunzip_members(payload: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the .warc.gz layout:
    one member per record) to the plain byte stream, bounded by
    MAX_INFLATED_BYTES total. The framing's explicit Content-Lengths
    mean records need not align with member boundaries after
    concatenation, so one joined stream is correct."""
    out = []
    data = payload
    budget = MAX_INFLATED_BYTES
    while data:
        if data[:2] != b"\x1f\x8b":
            raise ValueError("not a WARC: garbage between gzip members")
        o = zlib.decompressobj(wbits=31)
        member = _bounded_inflate(o, data, budget, "gzip member")
        if not o.eof:
            raise ValueError("not a WARC: truncated gzip member")
        out.append(member)
        budget -= len(member)
        data = o.unused_data
    return b"".join(out)


def warc_records(payload: bytes) -> list[dict]:
    """Walk WARC record framing: version line, CRLF header lines (with
    RFC-style folded continuations), blank line, exactly Content-Length
    block bytes, then the mandatory CRLFCRLF separator. Transparent
    for .warc.gz input (gzip magic sniff). Returns one dict per record:
    ``warc_type, record_id, target_uri, warc_date, content_type,
    block`` — header names case-insensitive per spec."""
    if payload[:2] == b"\x1f\x8b":
        payload = gunzip_members(payload)
    records = []
    pos = 0
    while pos < len(payload):
        eol = payload.find(b"\r\n", pos)
        if eol < 0:
            raise ValueError("not a WARC: unterminated version line")
        version = payload[pos:eol]
        if version not in _WARC_VERSIONS:
            raise ValueError(f"not a WARC: bad version line {version[:24]!r}")
        pos = eol + 2
        headers: dict[str, str] = {}
        last_key = None
        while True:
            eol = payload.find(b"\r\n", pos)
            if eol < 0:
                raise ValueError("not a WARC: truncated header block")
            line = payload[pos:eol]
            pos = eol + 2
            if not line:
                break
            if line[:1] in (b" ", b"\t"):
                if last_key is None:
                    raise ValueError("not a WARC: header continuation first")
                headers[last_key] += " " + line.strip().decode(
                    "utf-8", "replace"
                )
                continue
            name, sep, value = line.partition(b":")
            if not sep:
                raise ValueError(
                    f"not a WARC: malformed header line {line[:40]!r}"
                )
            last_key = name.strip().lower().decode("ascii", "replace")
            headers[last_key] = value.strip().decode("utf-8", "replace")
        cl = headers.get("content-length")
        if cl is None or not cl.isdigit():
            raise ValueError("not a WARC: missing/bad Content-Length")
        n = int(cl)
        block = payload[pos : pos + n]
        if len(block) < n:
            raise ValueError("not a WARC: truncated record block")
        pos += n
        if payload[pos : pos + 4] != b"\r\n\r\n":
            raise ValueError("not a WARC: missing record separator")
        pos += 4
        records.append(
            {
                "warc_type": headers.get("warc-type", ""),
                "record_id": headers.get("warc-record-id", ""),
                "target_uri": headers.get("warc-target-uri", ""),
                "warc_date": headers.get("warc-date", ""),
                "content_type": headers.get("content-type", ""),
                "block": block,
            }
        )
    return records


def _dechunk(body: bytes) -> bytes:
    """Decode HTTP/1.1 chunked transfer framing: hex size line (with
    optional ;extension), chunk bytes, CRLF, ... , 0-size terminator
    (trailers after it are ignored). Raw captures keep the wire
    framing, so real WARC bodies are chunked constantly."""
    out = []
    pos = 0
    while True:
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            raise ValueError("not a WARC: unterminated chunk size line")
        size_tok = body[pos:eol].split(b";", 1)[0].strip()
        try:
            n = int(size_tok, 16)
        except ValueError:
            raise ValueError(
                f"not a WARC: bad chunk size {size_tok[:16]!r}"
            )
        pos = eol + 2
        if n == 0:
            return b"".join(out)
        chunk = body[pos : pos + n]
        if len(chunk) < n:
            raise ValueError("not a WARC: truncated chunk")
        out.append(chunk)
        pos += n
        if body[pos : pos + 2] != b"\r\n":
            raise ValueError("not a WARC: missing chunk terminator")
        pos += 2


def _decode_content(body: bytes, encoding: str) -> bytes:
    """Undo HTTP Content-Encoding: gzip / x-gzip (INCLUDING
    multi-member concatenations — middleboxes produce them, and a
    first-member-only decode would be a silently short parse) /
    deflate (zlib OR raw-deflate — servers ship both under the same
    name, the classic HTTP wart) / identity. All paths bounded by
    MAX_INFLATED_BYTES."""
    enc = encoding.strip().lower()
    if enc in ("", "identity"):
        return body
    if enc in ("gzip", "x-gzip"):
        out = []
        data = body
        budget = MAX_INFLATED_BYTES
        while data:
            if data[:2] != b"\x1f\x8b":
                raise ValueError("not a WARC: bad gzip body (bad magic)")
            o = zlib.decompressobj(wbits=31)
            member = _bounded_inflate(o, data, budget, "gzip body")
            if not o.eof:
                raise ValueError("not a WARC: truncated gzip body")
            out.append(member)
            budget -= len(member)
            data = o.unused_data
        return b"".join(out)
    if enc == "deflate":
        for wbits in (15, -15):  # zlib-wrapped first, then raw
            o = zlib.decompressobj(wbits=wbits)
            try:
                out_b = _bounded_inflate(
                    o, body, MAX_INFLATED_BYTES, "deflate body"
                )
            except ValueError as e:
                if "inflate cap" in str(e):
                    raise
                continue
            if o.eof:
                return out_b
        raise ValueError("not a WARC: bad deflate body")
    raise ValueError(f"not a WARC: unknown Content-Encoding {enc!r}")


def http_response(block: bytes) -> tuple[int, dict[str, str], bytes]:
    """Parse the HTTP response message inside a WARC response record's
    block: status line, case-insensitive headers, body after the first
    CRLFCRLF — then undo the WIRE layers raw captures preserve, in
    wire order: chunked transfer framing first, Content-Encoding
    (gzip/deflate) second. Returns (status, headers, decoded_body)."""
    if not block.startswith(b"HTTP/"):
        raise ValueError("not a WARC: response block is not HTTP")
    head, sep, body = block.partition(b"\r\n\r\n")
    if not sep:
        raise ValueError("not a WARC: HTTP head missing terminator")
    lines = head.split(b"\r\n")
    parts = lines[0].split(None, 2)
    if len(parts) < 2 or not parts[1].isdigit():
        raise ValueError("not a WARC: bad HTTP status line")
    status = int(parts[1])
    headers: dict[str, str] = {}
    last_key = None
    for line in lines[1:]:
        if line[:1] in (b" ", b"\t"):
            # obs-fold continuation (deprecated but legal HTTP/1.1;
            # raw captures preserve them) — same handling as the
            # WARC-level header fold
            if last_key is None:
                raise ValueError("not a WARC: HTTP continuation first")
            headers[last_key] += " " + line.strip().decode(
                "utf-8", "replace"
            )
            continue
        name, s, value = line.partition(b":")
        if not s:
            raise ValueError("not a WARC: malformed HTTP header")
        last_key = name.strip().lower().decode("ascii", "replace")
        headers[last_key] = value.strip().decode("utf-8", "replace")
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    body = _decode_content(body, headers.get("content-encoding", ""))
    return status, headers, body


# ---------------------------------------------------------------------------
# fixture builders (deterministic, spec-determined bytes)
# ---------------------------------------------------------------------------

def make_warc_record(
    warc_type: str,
    block: bytes,
    target_uri: str = "",
    content_type: str = "",
    record_id: str = "",
    date: str = "2026-01-01T00:00:00Z",
) -> bytes:
    """One fully-formed WARC/1.0 record with the mandatory headers and
    trailing CRLFCRLF separator."""
    heads = [
        ("WARC-Type", warc_type),
        ("WARC-Date", date),
        ("WARC-Record-ID", record_id or f"<urn:uuid:{warc_type}-0>"),
    ]
    if target_uri:
        heads.append(("WARC-Target-URI", target_uri))
    if content_type:
        heads.append(("Content-Type", content_type))
    heads.append(("Content-Length", str(len(block))))
    head = b"WARC/1.0\r\n" + b"".join(
        f"{k}: {v}\r\n".encode() for k, v in heads
    )
    return head + b"\r\n" + block + b"\r\n\r\n"


def make_http_response(
    body: bytes,
    content_type: str,
    status: int = 200,
    content_encoding: str = "",
    chunked: bool = False,
    chunk_size: int = 50,
) -> bytes:
    """Fixture HTTP response; ``content_encoding`` ("gzip"/"deflate")
    and ``chunked`` apply the real wire layers in wire order
    (compress, then chunk) so the parser must undo both."""
    reason = {200: "OK", 404: "Not Found", 301: "Moved Permanently"}.get(
        status, "X"
    )
    heads = [f"HTTP/1.1 {status} {reason}", f"Content-Type: {content_type}"]
    if content_encoding == "gzip":
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        body = co.compress(body) + co.flush()
        heads.append("Content-Encoding: gzip")
    elif content_encoding == "deflate":
        body = zlib.compress(body)
        heads.append("Content-Encoding: deflate")
    elif content_encoding:
        raise ValueError(f"fixture encoding {content_encoding!r}")
    if chunked:
        chunks = [
            body[i : i + chunk_size]
            for i in range(0, len(body), chunk_size)
        ] or [b""]
        body = b"".join(
            f"{len(c):x}".encode() + b"\r\n" + c + b"\r\n"
            for c in chunks if c
        ) + b"0\r\n\r\n"
        heads.append("Transfer-Encoding: chunked")
    else:
        heads.append(f"Content-Length: {len(body)}")
    return ("\r\n".join(heads) + "\r\n\r\n").encode() + body


def make_warc(records: list[bytes], gzip_members: bool = False) -> bytes:
    """Concatenate records into a .warc (plain) or .warc.gz (one gzip
    member per record — the Common-Crawl layout) byte stream."""
    if not gzip_members:
        return b"".join(records)
    out = []
    for r in records:
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        out.append(co.compress(r) + co.flush())
    return b"".join(out)


# ---------------------------------------------------------------------------
# Spark plane
# ---------------------------------------------------------------------------

_RESPONSE_ROWS_SCHEMA = (
    "media_id long, seq int, warc_type string, url string, "
    "warc_date string, http_status int, content_type string, text string"
)


def warc_response_rows(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched record explode over (media_id, payload) WARC
    files (plain or .gz): one output row per record, in file order
    (``seq``). Response records carry their HTTP status, the HTTP
    Content-Type, and the utf-8-decoded body for ``text/*`` types;
    non-response records carry the WARC-level Content-Type with null
    status/text. Partition-preserving — the decode stays scan-local at
    any scale; filter/extract downstream in JVM expressions."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "seq", "warc_type", "url", "warc_date",
                "http_status", "content_type", "text",
            )}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                for seq, rec in enumerate(warc_records(bytes(payload))):
                    status = body_text = None
                    ctype = rec["content_type"]
                    if rec["warc_type"] == "response":
                        status, hh, body = http_response(rec["block"])
                        ctype = hh.get("content-type", ctype)
                        if ctype.split(";")[0].strip().startswith("text/"):
                            body_text = body.decode("utf-8", "replace")
                    elif rec["warc_type"] == "conversion":
                        # WET layout (Common Crawl's pre-extracted text):
                        # the block IS the text, no HTTP wrapper
                        if ctype.split(";")[0].strip().startswith("text/"):
                            body_text = rec["block"].decode(
                                "utf-8", "replace"
                            )
                    rows["media_id"].append(int(mid))
                    rows["seq"].append(seq)
                    rows["warc_type"].append(rec["warc_type"])
                    rows["url"].append(rec["target_uri"] or None)
                    rows["warc_date"].append(rec["warc_date"] or None)
                    rows["http_status"].append(status)
                    rows["content_type"].append(ctype or None)
                    rows["text"].append(body_text)
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=_RESPONSE_ROWS_SCHEMA)


def warc_scan(spark: SparkSession, path: str) -> DataFrame:
    """WARC file source: binaryFile scan (one task per file — the
    correct parallelism unit for non-splittable .warc.gz; see module
    docstring) to (media_id, path, payload). ``media_id`` is a stable
    hash of the file path so downstream joins/dedup have a long key."""
    files = spark.read.format("binaryFile").load(path)
    return files.select(
        F.xxhash64("path").alias("media_id"),
        "path",
        F.col("content").alias("payload"),
    )


def meta_noindex(col: Column | str) -> Column:
    """True when the RAW HTML carries a robots/googlebot meta directive
    containing ``noindex`` — pages that asked to stay out of indexes
    should stay out of training corpora too (the polite-crawl norm).
    Runs on the raw HTML (before extraction strips tags), pure JVM
    regexp: name= and content= in either order, either quote style."""
    c = F.col(col) if isinstance(col, str) else col
    # content value matches quoted ("noindex, nofollow") OR unquoted
    # HTML5 token syntax (content=noindex) — symmetric with name=
    content_val = r"(['\"][^'\"]*noindex|[^'\"\s>]*noindex)"
    return c.rlike(
        r"(?is)<meta\b[^>]*name\s*=\s*['\"]?(robots|googlebot)['\"]?"
        r"[^>]*content\s*=\s*" + content_val
    ) | c.rlike(
        r"(?is)<meta\b[^>]*content\s*=\s*"
        + content_val
        + r"[^>]*name\s*=\s*['\"]?(robots|googlebot)"
    )


def robots_disallow_prefixes(col: Column | str, agent: str = "*") -> Column:
    """Parse a robots.txt body into the Disallow path prefixes that
    apply to ``agent`` — as ONE JVM ``aggregate`` fold over the lines
    (no Python, no UDF): the accumulator tracks whether the current
    group header matches the agent, consecutive ``User-agent`` lines
    stack (a group may name several agents), comments strip at ``#``,
    empty Disallow values (allow-all) are ignored. Documented
    simplification vs RFC 9309: rules are taken from every group
    whose agent token EQUALS ``agent`` (no longest-match precedence
    between ``*`` and named groups)."""
    c = F.col(col) if isinstance(col, str) else col
    lines = F.split(c, r"\r?\n")  # robots.txt ships both line endings
    init = F.struct(
        F.lit(False).alias("active"),
        F.lit(True).alias("header"),
        F.array().cast("array<string>").alias("rules"),
    )

    def step(acc, line):
        stripped = F.trim(F.substring_index(line, "#", 1))
        low = F.lower(stripped)
        is_ua = low.startswith("user-agent:")
        is_dis = low.startswith("disallow:")
        ua = F.trim(F.substring(stripped, 12, 1 << 20))
        dis = F.trim(F.substring(stripped, 10, 1 << 20))
        active = (
            F.when(
                is_ua,
                (F.lower(ua) == agent.lower())
                | (acc["header"] & acc["active"]),
            )
            .otherwise(acc["active"])
        )
        header = F.when(is_ua, F.lit(True)).otherwise(F.lit(False))
        rules = F.when(
            is_dis & acc["active"] & (F.length(dis) > 0),
            F.array_append(acc["rules"], dis),
        ).otherwise(acc["rules"])
        return F.struct(
            active.alias("active"), header.alias("header"),
            rules.alias("rules"),
        )

    return F.aggregate(lines, init, step)["rules"]


def url_path(col: Column | str) -> Column:
    """The path component of a URL ('/' when absent)."""
    c = F.col(col) if isinstance(col, str) else col
    p = F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)?", 1)
    return F.when(F.length(p) > 0, p).otherwise(F.lit("/"))


def robots_filter(
    pages: DataFrame, robots_bodies: DataFrame, agent: str = "*"
) -> DataFrame:
    """Drop pages a domain's robots.txt disallows for ``agent`` — the
    crawl-politeness gate. ``pages`` needs a ``url`` column;
    ``robots_bodies`` is (domain, text) robots.txt bodies (e.g. the
    ``/robots.txt`` responses of the same capture set — a crawl
    re-captures each domain's robots.txt constantly, so duplicates
    are the NORM). Bodies are DISTINCT'd before parsing and the
    (domain, prefix) rule table DISTINCT'd again before the join:
    the startswith predicate forces a broadcast nested-loop, which
    is effectively a scan-local filter against a |domains|-sized rule
    table but quadratic against an un-deduped per-capture one
    (measured 74 s -> 4 s at the ×100 replica)."""
    rules = (
        robots_bodies.select("domain", "text")
        .distinct()
        .select(
            "domain",
            F.explode(
                robots_disallow_prefixes("text", agent)
            ).alias("prefix"),
        )
        .distinct()
    )
    keyed = pages.withColumn("_domain", url_host("url")).withColumn(
        "_path", url_path("url")
    )
    cond = (F.col("_domain") == rules["domain"]) & F.col(
        "_path"
    ).startswith(rules["prefix"])
    return (
        keyed.join(F.broadcast(rules), cond, "left_anti")
        .drop("_domain", "_path")
    )


def canonical_url(col: Column | str) -> Column:
    """URL canonicalization as a JVM expression — the documented
    convention (lowercase scheme+host, drop the fragment, strip
    trailing slashes); path/query case is preserved (case-sensitive
    per RFC 3986). The key for capture-level dedup."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"#.*$", "")
    c = F.regexp_replace(c, r"/+$", "")
    head = F.lower(F.regexp_extract(c, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)", 1))
    rest = F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*(.*)$", 1)
    return F.when(head == "", c).otherwise(F.concat(head, rest))


def latest_capture(rows: DataFrame) -> DataFrame:
    """URL-level latest-capture dedup — the standard pre-content-dedup
    step of every crawl pipeline (Common Crawl re-captures pages
    across snapshots; content dedup must see ONE capture per page,
    the newest). Input: :func:`warc_response_rows` output. One window
    shuffle on the canonical URL (WARC-Date ISO-8601 strings order
    lexicographically; (media_id, seq) breaks exact ties
    deterministically); emits the surviving capture per canonical URL
    with its capture count. Records WITHOUT a WARC-Target-URI are
    EXCLUDED up front — they are not pages and cannot be keyed; left
    in, they would all share the null window partition and silently
    collapse to one arbitrary row. Scales like every keep-one window
    here: shuffle linear in captures, no self-join."""
    keyed = rows.filter(
        F.col("url").isNotNull() & (F.length("url") > 0)
    )
    canon = keyed.withColumn("url", canonical_url("url"))
    w = Window.partitionBy("url").orderBy(
        F.col("warc_date").desc(), F.col("media_id").desc(),
        F.col("seq").desc(),
    )
    return (
        canon.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n_captures",
            F.count(F.lit(1)).over(Window.partitionBy("url")).cast("int"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def html_text(col: Column | str) -> Column:
    """HTML -> visible text as ONE JVM Column expression (the module
    docstring's 6-step convention) — regexp_replace / replace /
    split / transform / filter / array_join, all inside whole-stage
    codegen. No Python anywhere: at 100 TB this is the hot string
    path and it never leaves Tungsten."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, _RE_COMMENT, " ")
    c = F.regexp_replace(c, _RE_DROPPED, " ")
    c = F.regexp_replace(c, r"\s+", " ")
    c = F.regexp_replace(c, _RE_BLOCK, "\n")
    c = F.regexp_replace(c, _RE_ANY_TAG, " ")
    for ent, rep in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    lines = F.split(c, "\n")
    norm = F.transform(
        lines, lambda x: F.trim(F.regexp_replace(x, " +", " "))
    )
    return F.array_join(F.filter(norm, lambda x: F.length(x) > 0), "\n")


def html_main_text(col: Column | str) -> Column:
    """Main-content extraction — the readability-class boilerplate
    heuristic: after comment/script/style removal, keep ONLY the
    content of paragraph and heading elements (<p>, <h1>-<h6>); nav,
    title, divs, tables, list chrome are treated as boilerplate and
    dropped. Each kept element becomes one line, cleaned with the
    same inline-tag/entity/whitespace steps as :func:`html_text`.
    Pure JVM: regexp_extract_all + transform/filter/array_join —
    whole-stage codegen, no Python."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, _RE_COMMENT, " ")
    c = F.regexp_replace(c, _RE_DROPPED, " ")
    c = F.regexp_replace(c, r"\s+", " ")
    parts = F.regexp_extract_all(
        c, F.lit(r"(?is)<(?:p|h[1-6])\b[^>]*>(.*?)</(?:p|h[1-6])\s*>"), 1
    )

    def clean(x):
        y = F.regexp_replace(x, _RE_ANY_TAG, " ")
        for ent, rep in _ENTITIES:
            y = F.replace(y, F.lit(ent), F.lit(rep))
        return F.trim(F.regexp_replace(y, " +", " "))

    cleaned = F.transform(parts, clean)
    return F.array_join(
        F.filter(cleaned, lambda x: F.length(x) > 0), "\n"
    )


def url_host(col: Column | str) -> Column:
    """Lowercased hostname of a URL (port stripped) — the grouping key
    for per-domain crawl analytics and politeness accounting."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(
        F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1)
    )


def html_to_text(html: str) -> str:
    """Python twin of :func:`html_text` — same 6 steps, used by tests
    (parity property) and by non-Spark callers. NOT the data-plane
    path (the Column chain is)."""
    s = re.sub(_RE_COMMENT, " ", html)
    # Python re has no inline-flag-mid-pattern restriction issues here;
    # translate the (?is)/(?i) prefixes directly
    s = re.sub(_RE_DROPPED, " ", s)
    s = re.sub(r"\s+", " ", s)
    s = re.sub(_RE_BLOCK, "\n", s)
    s = re.sub(_RE_ANY_TAG, " ", s)
    for ent, rep in _ENTITIES:
        s = s.replace(ent, rep)
    out = []
    for line in s.split("\n"):
        line = re.sub(r" +", " ", line).strip()
        if line:
            out.append(line)
    return "\n".join(out)
