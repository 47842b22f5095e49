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

Failure channel (r10): the data plane is per-record fault-TOLERANT —
structural damage yields a dead-letter row (``error`` set) and the
walk resyncs at the next version line / gzip member, so one corrupt
record never loses a ~1 GB capture file (the engine's V3/T4
contract applied to bytes). The strict mode
(:func:`warc_records`, ``tolerant=False``) raises
``ValueError("not a WARC: ...")`` for the whole payload — the
fixture/contract surface. Either way: never a leaked struct/zlib
error, never a silently short parse.

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
5. entities decode ONE pass (r11: ALL numeric character references —
   decimal ``&#233;`` and hex ``&#x2019;``, with the WHATWG
   windows-1252 override for 0x80-0x9F and U+FFFD for invalid
   codepoints — plus the common-web named table, ``&amp;`` LAST so
   ``&amp;lt;`` yields the literal ``&lt;`` — html.unescape's
   one-pass semantics; ``&nbsp;`` normalizes to ASCII space, the
   module's pre-existing hygiene convention);
6. per line: trim + collapse internal spaces; empty lines drop;
   surviving lines join with ``\\n``.
"""

from __future__ import annotations

import codecs
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
# one-pass NAMED entity table (r11: full common-web subset of the
# WHATWG named-references list — the long tail a training corpus
# actually hits; numeric character references decode separately in
# _entity_numeric_* BEFORE this table runs). amp LAST is what makes
# the pass one-pass: '&amp;mdash;' must yield literal '&mdash;', never
# an em-dash, exactly as a browser renders it.
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&nbsp;", "\x20"),
    # punctuation / typography
    ("&mdash;", "—"),
    ("&ndash;", "–"),
    ("&hellip;", "…"),
    ("&lsquo;", "‘"),
    ("&rsquo;", "’"),
    ("&ldquo;", "“"),
    ("&rdquo;", "”"),
    ("&sbquo;", "‚"),
    ("&bdquo;", "„"),
    ("&laquo;", "«"),
    ("&raquo;", "»"),
    ("&middot;", "·"),
    ("&bull;", "•"),
    ("&dagger;", "†"),
    ("&Dagger;", "‡"),
    ("&permil;", "‰"),
    ("&prime;", "′"),
    ("&Prime;", "″"),
    ("&minus;", "−"),
    ("&shy;", "­"),
    ("&ensp;", " "),
    ("&emsp;", " "),
    ("&thinsp;", " "),
    # signs / currency
    ("&copy;", "©"),
    ("&reg;", "®"),
    ("&trade;", "™"),
    ("&deg;", "°"),
    ("&plusmn;", "±"),
    ("&times;", "×"),
    ("&divide;", "÷"),
    ("&frac12;", "½"),
    ("&frac14;", "¼"),
    ("&frac34;", "¾"),
    ("&sup1;", "¹"),
    ("&sup2;", "²"),
    ("&sup3;", "³"),
    ("&micro;", "µ"),
    ("&para;", "¶"),
    ("&sect;", "§"),
    ("&euro;", "€"),
    ("&pound;", "£"),
    ("&yen;", "¥"),
    ("&cent;", "¢"),
    ("&curren;", "¤"),
    ("&iexcl;", "¡"),
    ("&iquest;", "¿"),
    ("&ordf;", "ª"),
    ("&ordm;", "º"),
    ("&not;", "¬"),
    ("&macr;", "¯"),
    ("&acute;", "´"),
    ("&cedil;", "¸"),
    ("&uml;", "¨"),
    ("&larr;", "←"),
    ("&uarr;", "↑"),
    ("&rarr;", "→"),
    ("&darr;", "↓"),
    ("&harr;", "↔"),
    # latin-1 letters (the big accented block, both cases)
    ("&Agrave;", "À"), ("&Aacute;", "Á"),
    ("&Acirc;", "Â"), ("&Atilde;", "Ã"),
    ("&Auml;", "Ä"), ("&Aring;", "Å"),
    ("&AElig;", "Æ"), ("&Ccedil;", "Ç"),
    ("&Egrave;", "È"), ("&Eacute;", "É"),
    ("&Ecirc;", "Ê"), ("&Euml;", "Ë"),
    ("&Igrave;", "Ì"), ("&Iacute;", "Í"),
    ("&Icirc;", "Î"), ("&Iuml;", "Ï"),
    ("&ETH;", "Ð"), ("&Ntilde;", "Ñ"),
    ("&Ograve;", "Ò"), ("&Oacute;", "Ó"),
    ("&Ocirc;", "Ô"), ("&Otilde;", "Õ"),
    ("&Ouml;", "Ö"), ("&Oslash;", "Ø"),
    ("&Ugrave;", "Ù"), ("&Uacute;", "Ú"),
    ("&Ucirc;", "Û"), ("&Uuml;", "Ü"),
    ("&Yacute;", "Ý"), ("&THORN;", "Þ"),
    ("&szlig;", "ß"),
    ("&agrave;", "à"), ("&aacute;", "á"),
    ("&acirc;", "â"), ("&atilde;", "ã"),
    ("&auml;", "ä"), ("&aring;", "å"),
    ("&aelig;", "æ"), ("&ccedil;", "ç"),
    ("&egrave;", "è"), ("&eacute;", "é"),
    ("&ecirc;", "ê"), ("&euml;", "ë"),
    ("&igrave;", "ì"), ("&iacute;", "í"),
    ("&icirc;", "î"), ("&iuml;", "ï"),
    ("&eth;", "ð"), ("&ntilde;", "ñ"),
    ("&ograve;", "ò"), ("&oacute;", "ó"),
    ("&ocirc;", "ô"), ("&otilde;", "õ"),
    ("&ouml;", "ö"), ("&oslash;", "ø"),
    ("&ugrave;", "ù"), ("&uacute;", "ú"),
    ("&ucirc;", "û"), ("&uuml;", "ü"),
    ("&yacute;", "ý"), ("&thorn;", "þ"),
    ("&yuml;", "ÿ"),
    ("&OElig;", "Œ"), ("&oelig;", "œ"),
    ("&Scaron;", "Š"), ("&scaron;", "š"),
    ("&Yuml;", "Ÿ"), ("&fnof;", "ƒ"),
    # greek the web actually uses
    ("&alpha;", "α"), ("&beta;", "β"),
    ("&gamma;", "γ"), ("&delta;", "δ"),
    ("&pi;", "π"), ("&mu;", "μ"),
    ("&Omega;", "Ω"), ("&lambda;", "λ"),
    ("&sigma;", "σ"), ("&omega;", "ω"),
    ("&amp;", "&"),
)

# WHATWG numeric-character-reference override table: codepoints
# 0x80-0x9F decode as their WINDOWS-1252 characters (the '&#146;'
# apostrophe real legacy pages ship constantly), not as C1 controls.
# Codepoints absent here (0x81, 0x8D, 0x8F, 0x90, 0x9D) pass through
# as the raw codepoint, per the spec's table.
_NUMREF_C1 = {
    0x80: "€", 0x82: "‚", 0x83: "ƒ", 0x84: "„",
    0x85: "…", 0x86: "†", 0x87: "‡", 0x88: "ˆ",
    0x89: "‰", 0x8A: "Š", 0x8B: "‹", 0x8C: "Œ",
    0x8E: "Ž", 0x91: "‘", 0x92: "’", 0x93: "“",
    0x94: "”", 0x95: "•", 0x96: "–", 0x97: "—",
    0x98: "˜", 0x99: "™", 0x9A: "š", 0x9B: "›",
    0x9C: "œ", 0x9E: "ž", 0x9F: "Ÿ",
}

# sentinel-rewrite markers for the numeric-reference split pass; NUL /
# SOH cannot appear in legal HTML text, and a raw occurrence in a
# hostile page only costs that page a mis-split, never an error
_NR_OPEN = "\x00"
_NR_CLOSE = "\x01"
_RE_NUMREF_HEX = r"&#[xX]([0-9a-fA-F]{1,6});"
_RE_NUMREF_DEC = r"&#([0-9]{1,7});"


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


def _parse_record_at(payload: bytes, pos: int) -> tuple[dict, int]:
    """Parse ONE record's framing at ``pos``: version line, CRLF header
    lines (with RFC-style folded continuations), blank line, exactly
    Content-Length block bytes, then the mandatory CRLFCRLF separator.
    Returns (record, next_pos); raises ValueError on structural damage
    (the strict contract both walk modes build on)."""
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
    record = {
        "warc_type": headers.get("warc-type", ""),
        "record_id": headers.get("warc-record-id", ""),
        "target_uri": headers.get("warc-target-uri", ""),
        "warc_date": headers.get("warc-date", ""),
        "content_type": headers.get("content-type", ""),
        "payload_digest": headers.get("warc-payload-digest", ""),
        "block": block,
    }
    return record, pos


def warc_records(payload: bytes) -> list[dict]:
    """STRICT walk of WARC record framing (see :func:`_parse_record_at`
    for the grammar). Transparent for .warc.gz input (gzip magic
    sniff). Returns one dict per record: ``warc_type, record_id,
    target_uri, warc_date, content_type, block`` — header names
    case-insensitive per spec. Any structural damage raises ValueError
    for the whole payload — the fixture/contract mode; the data plane
    uses :func:`warc_records_tolerant` (per-record dead-letter)."""
    if payload[:2] == b"\x1f\x8b":
        payload = gunzip_members(payload)
    records = []
    pos = 0
    while pos < len(payload):
        rec, pos = _parse_record_at(payload, pos)
        records.append(rec)
    return records


_ERROR_RECORD = {
    "warc_type": "",
    "record_id": "",
    "target_uri": "",
    "warc_date": "",
    "content_type": "",
    "payload_digest": "",
    "block": b"",
}

# resync anchor: the next record's version line (preceded by nothing we
# can rely on — the damaged span may have eaten the separator)
_RESYNC = re.compile(rb"WARC/(?:1\.0|1\.1|0\.18)\r\n")


def _gunzip_members_tolerant(payload: bytes, errors: list[str]) -> bytes:
    """Member-at-a-time variant of :func:`gunzip_members`: a bad member
    (bad magic, zlib damage, truncation, cap breach) records ONE error
    and skips to the next gzip magic instead of raising — in the CC
    layout (one member per record) one corrupt member then costs one
    record, not the ~1 GB file."""
    out = []
    data = payload
    budget = MAX_INFLATED_BYTES
    while data:
        if data[:2] != b"\x1f\x8b":
            errors.append("not a WARC: garbage between gzip members")
            i = data.find(b"\x1f\x8b\x08")
            if i < 0:
                break
            data = data[i:]
            continue
        o = zlib.decompressobj(wbits=31)
        try:
            member = _bounded_inflate(o, data, budget, "gzip member")
            if not o.eof:
                raise ValueError("not a WARC: truncated gzip member")
        except ValueError as e:
            errors.append(str(e))
            i = data.find(b"\x1f\x8b\x08", 2)
            if i < 0:
                break
            data = data[i:]
            continue
        out.append(member)
        budget -= len(member)
        data = o.unused_data
    return b"".join(out)


def warc_records_tolerant(payload: bytes) -> list[dict]:
    """Fault-isolating walk (VERDICT r9 task 1 — the V3/T4 dead-letter
    contract applied to capture framing): structural damage yields ONE
    error record (``error`` set, empty fields) and the walk resyncs at
    the next version line / gzip member instead of losing the file.
    Good records carry ``error=None``. Resync heuristic: a damaged
    record whose BLOCK bytes contain a version line (warc-in-warc) can
    resync early and re-emit tail records — acceptable for a
    dead-letter channel, impossible for well-formed input."""
    errors: list[str] = []
    if payload[:2] == b"\x1f\x8b":
        payload = _gunzip_members_tolerant(payload, errors)
    records: list[dict] = [
        dict(_ERROR_RECORD, error=e) for e in errors
    ]
    pos = 0
    while pos < len(payload):
        try:
            rec, pos = _parse_record_at(payload, pos)
            rec["error"] = None
            records.append(rec)
        except ValueError as e:
            records.append(dict(_ERROR_RECORD, error=str(e)))
            m = _RESYNC.search(payload, pos + 1)
            if not m:
                break
            pos = m.start()
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
        # zlib-wrapped first, raw-deflate as the fallback. The retry
        # fires ONLY when the zlib attempt errored (wrong header /
        # checksum): a zlib attempt that consumed input cleanly but
        # never reached eof is a TRUNCATED zlib body, and retrying it
        # as raw deflate would misread the 0x78 header as deflate data
        # and could return corrupt bytes — the silently-short-parse
        # failure the module contract forbids.
        o = zlib.decompressobj(wbits=15)
        try:
            out_b = _bounded_inflate(
                o, body, MAX_INFLATED_BYTES, "deflate body"
            )
        except ValueError as e:
            if "inflate cap" in str(e):
                raise
        else:
            if o.eof:
                return out_b
            raise ValueError("not a WARC: truncated deflate body")
        o = zlib.decompressobj(wbits=-15)
        try:
            out_b = _bounded_inflate(
                o, body, MAX_INFLATED_BYTES, "deflate body"
            )
        except ValueError as e:
            if "inflate cap" in str(e):
                raise
            raise ValueError("not a WARC: bad deflate body")
        if o.eof:
            return out_b
        raise ValueError("not a WARC: truncated deflate body")
    raise ValueError(f"not a WARC: unknown Content-Encoding {enc!r}")


def _parse_http_head(head: bytes) -> tuple[int, dict[str, str]]:
    """Status line + case-insensitive headers (with obs-fold
    continuations) from the head bytes of an HTTP response message."""
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
    return status, headers


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
    status, headers = _parse_http_head(head)
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    body = _decode_content(body, headers.get("content-encoding", ""))
    return status, headers, body


def http_head(block: bytes) -> tuple[int, dict[str, str]]:
    """Head-only HTTP parse for records that legally carry NO body —
    WARC ``revisit`` records store the new response's status line and
    headers only (the identical-payload-digest profile), with or
    without the trailing CRLFCRLF."""
    if not block.startswith(b"HTTP/"):
        raise ValueError("not a WARC: response block is not HTTP")
    head = block.split(b"\r\n\r\n", 1)[0]
    return _parse_http_head(head)


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
    payload_digest: str = "",
) -> bytes:
    """One fully-formed WARC/1.0 record with the mandatory headers and
    trailing CRLFCRLF separator. ``payload_digest`` emits a
    WARC-Payload-Digest header (the ``sha1:BASE32`` labelled-digest
    form real crawlers stamp; revisit records carry the ORIGINAL
    response's digest — how archives match a revisit to the capture
    it re-observed)."""
    heads = [
        ("WARC-Type", warc_type),
        ("WARC-Date", date),
        ("WARC-Record-ID", record_id or f"<urn:uuid:{warc_type}-0>"),
    ]
    if target_uri:
        heads.append(("WARC-Target-URI", target_uri))
    if payload_digest:
        heads.append(("WARC-Payload-Digest", payload_digest))
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
    location: str = "",
) -> bytes:
    """Fixture HTTP response; ``content_encoding`` ("gzip"/"deflate")
    and ``chunked`` apply the real wire layers in wire order
    (compress, then chunk) so the parser must undo both; ``location``
    adds the redirect header 3xx fixtures need."""
    reason = {
        200: "OK", 404: "Not Found", 301: "Moved Permanently",
        302: "Found",
    }.get(status, "X")
    heads = [f"HTTP/1.1 {status} {reason}", f"Content-Type: {content_type}"]
    if location:
        heads.append(f"Location: {location}")
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
    "warc_date string, http_status int, content_type string, "
    "charset string, text string, error string, redirect_to string, "
    "payload_digest string"
)


def _norm_content_type(ct: str) -> str:
    """Lowercase the media-type token of a Content-Type value, keeping
    parameters verbatim — real captures ship 'Text/HTML' / 'TEXT/html'
    constantly, and a case-sensitive downstream filter would silently
    drop those pages. Charset parameter VALUES are matched
    case-insensitively where they are consumed (_body_charset)."""
    if not ct:
        return ct
    head, sep, rest = ct.partition(";")
    return head.strip().lower() + (sep + rest if sep else "")


_CT_CHARSET = re.compile(r"""(?i)charset\s*=\s*["']?([A-Za-z0-9_.:+-]+)""")
_META_CHARSET = re.compile(
    rb"""(?is)<meta\b[^>]*charset\s*=\s*["']?\s*([A-Za-z0-9_.:+-]+)"""
)


def _lookup_codec(label: str) -> str | None:
    """Canonical Python codec name for a charset label, or None when
    the label is unknown or not a real text encoding (guards against
    alias tricks like rot13/base64, which are not bytes->str)."""
    try:
        info = codecs.lookup(label.strip().strip("\"'"))
    except (LookupError, ValueError):
        return None
    if not getattr(info, "_is_text_encoding", True):
        return None
    return info.name


def decode_body_text(
    body: bytes, content_type: str, sniff_html: bool
) -> tuple[str, str]:
    """Charset-aware body decode (VERDICT r9 task 2) — the WHATWG-ish
    precedence real crawls need, since UTF-8-replace alone turns every
    legacy-charset page into silent mojibake:

    1. the Content-Type ``charset=`` parameter (header wins);
    2. for HTML, a ``<meta charset=..>`` / http-equiv sniff in the
       first 1024 bytes (covers both quoting styles and the
       ``content="text/html; charset=.."`` form via the same regex);
    3. strict UTF-8 (the modern-web default);
    4. ISO-8859-1 last resort — total (never fails), so a page always
       decodes to SOMETHING rather than erroring out of the corpus.

    Returns (text, canonical_codec_name). A declared codec decodes
    with errors='replace' (the declaration may still lie about a few
    bytes); the fallback ladder only reaches latin-1 when strict UTF-8
    refuses."""
    m = _CT_CHARSET.search(content_type or "")
    enc = _lookup_codec(m.group(1)) if m else None
    if enc is None and sniff_html:
        mm = _META_CHARSET.search(body[:1024])
        if mm:
            enc = _lookup_codec(mm.group(1).decode("ascii", "replace"))
    if enc is None:
        try:
            return body.decode("utf-8"), "utf-8"
        except UnicodeDecodeError:
            return body.decode("iso8859-1"), "iso8859-1"
    return body.decode(enc, "replace"), enc


def _record_to_row(rec: dict, tolerant: bool = True) -> dict:
    """One parsed record -> the row dict of _RESPONSE_ROWS_SCHEMA
    (minus media_id/seq). HTTP-level damage inside a record is caught
    HERE so it dead-letters that record alone, not the file (re-raised
    in strict mode)."""
    status = body_text = charset = redirect = None
    err = rec.get("error")
    ctype = _norm_content_type(rec["content_type"])
    if err is None:
        try:
            if rec["warc_type"] == "response":
                status, hh, body = http_response(rec["block"])
                ctype = _norm_content_type(hh.get("content-type", ctype))
                if 300 <= status < 400:
                    # Location may be relative per RFC 7231 — resolve
                    # downstream (url_resolve) where the page URL is
                    redirect = hh.get("location") or None
                media = ctype.partition(";")[0]
                if media.startswith("text/"):
                    body_text, charset = decode_body_text(
                        body, ctype, sniff_html=media == "text/html"
                    )
                elif media == "application/pdf":
                    # r11: PDF text extraction (operators/pdf.py) —
                    # ValueError gates (encrypted, exotic filters,
                    # damage) dead-letter THIS record via the shared
                    # fault channel below
                    from scicat_ingestor_spark.operators import pdf

                    body_text, _ = pdf.pdf_text(body)
                    charset = "pdf"
            elif rec["warc_type"] == "revisit" and rec["block"].startswith(
                b"HTTP/"
            ):
                # identical-payload re-capture: the block is the NEW
                # response's head only — a capture of the target URI
                # at the revisit date, with no body of its own
                # (latest_capture backfills content from the newest
                # response row of the same canonical URL); an empty
                # block (also legal) keeps the WARC-level fields
                status, hh = http_head(rec["block"])
                ctype = _norm_content_type(hh.get("content-type", ctype))
            elif rec["warc_type"] == "conversion":
                # WET layout (Common Crawl's pre-extracted text):
                # the block IS the text, no HTTP wrapper
                if ctype.partition(";")[0].startswith("text/"):
                    body_text, charset = decode_body_text(
                        rec["block"], ctype, sniff_html=False
                    )
            elif rec["warc_type"] == "metadata" and ctype.partition(
                ";"
            )[0] == "application/json":
                # WAT layout (Common Crawl's metadata sidecar): the
                # block is the JSON envelope — surfaced as text so
                # consumers parse it with from_json/get_json_object
                body_text, charset = decode_body_text(
                    rec["block"], ctype, sniff_html=False
                )
        except ValueError as e:
            if not tolerant:
                raise
            status = body_text = charset = None
            err = str(e)
    return {
        "warc_type": rec["warc_type"],
        "url": rec["target_uri"] or None,
        "warc_date": rec["warc_date"] or None,
        "http_status": status,
        "content_type": ctype or None,
        "charset": charset,
        "text": body_text,
        "error": err,
        "redirect_to": redirect,
        "payload_digest": rec.get("payload_digest") or None,
    }


def warc_response_rows(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    tolerant: bool = True,
) -> DataFrame:
    """Arrow-batched record explode over (media_id, payload) WARC
    files (plain or .gz): one output row per record, in file order
    (``seq``). Response records carry their HTTP status, the HTTP
    Content-Type (media type lowercased), the charset the body decode
    actually used, and the decoded body for ``text/*`` types;
    ``revisit`` records carry the new response's status/content-type
    with null text (content resolves in :func:`latest_capture`); other
    records carry the WARC-level Content-Type with null status/text.

    Fault channel: by default (``tolerant=True``) structural damage —
    a corrupt gzip member, broken framing, a bad HTTP message — yields
    a DEAD-LETTER row (``error`` set, other fields null) for the
    damaged record while every other record in the file survives (the
    engine's V3/T4 per-record tolerance contract; at 100k-file crawls
    a file-fatal parse would lose ~1 GB per corrupt record).
    ``tolerant=False`` restores the strict whole-file ValueError.

    Partition-preserving — the decode stays scan-local at any scale;
    filter/extract downstream in JVM expressions."""
    walk = warc_records_tolerant if tolerant else (
        lambda b: [dict(r, error=None) for r in warc_records(b)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "seq", "warc_type", "url", "warc_date",
                "http_status", "content_type", "charset", "text",
                "error", "redirect_to", "payload_digest",
            )}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                for seq, rec in enumerate(walk(bytes(payload))):
                    row = _record_to_row(rec, tolerant)
                    rows["media_id"].append(int(mid))
                    rows["seq"].append(seq)
                    for k, v in row.items():
                        rows[k].append(v)
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


def wet_shard_bytes(
    pages: DataFrame,
    shards: int = 8,
    url_col: str = "url",
    text_col: str = "text",
    date_col: str | None = "warc_date",
    max_mb_per_row: int = 512,
    record_type: str = "conversion",
    content_type: str = "text/plain",
) -> DataFrame:
    """The SINK side of the capture plane (r10): serialize extracted
    pages back to standard WET shards — (shard_id, payload) rows where
    each payload is a spec-complete .warc.gz byte stream (warcinfo +
    one ``conversion`` record per page, per-record gzip members — the
    exact layout Common Crawl publishes), readable by ANY WARC
    consumer including this module's own scan.

    Plan: one hash repartition on the URL (the only exchange), then
    each partition serializes ITSELF — mapInPandas gzip-compresses
    record-at-a-time and yields a finished payload row every
    ``max_mb_per_row`` MiB of RAW record bytes, so a 100 TB corpus
    writes as `shards` independent scan-local serializations with no
    driver involvement. Use :func:`write_wet_dir` to land the
    payloads as .warc.gz files (one file per (shard, part) row).

    Memory contract (r11, per r10 ADVICE): a task's peak is ~one raw
    record + the current part's COMPRESSED members — never the whole
    shard raw+gzipped at once — and the flush cap keeps every binary
    cell far under Arrow's ~2 GB limit, so an under-sharded corpus
    degrades into more part rows instead of failing at write. An
    oversized SINGLE page still emits (its own part) rather than
    erroring.

    SIZE ``shards`` TO THE CORPUS (~1 GB/shard, like real crawl
    files): shards are non-splittable on read, so an under-sharded
    corpus serializes every downstream re-read — measured 61 s ->
    5.5 s at the ×100 replica going 8 -> 64 shards (SCALE.md r10)."""
    cols = [url_col, text_col] + ([date_col] if date_col else [])
    rows = pages.select(*cols).repartition(shards, F.col(url_col))
    cap = max_mb_per_row * 1024 * 1024

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        info = make_warc(
            [
                make_warc_record(
                    "warcinfo",
                    b"software: scicat-ingestor-spark wet writer\r\n",
                    content_type="application/warc-fields",
                )
            ],
            gzip_members=True,
        )
        members = [info]
        raw = n = part = 0

        def flush():
            nonlocal members, raw, n, part
            out = pd.DataFrame(
                {
                    "shard_id": [pid],
                    "part": [part],
                    "n_pages": [n],
                    "payload": [b"".join(members)],
                }
            )
            members = [info]
            raw = n = 0
            part += 1
            return out

        for pdf in batches:
            for row in pdf.itertuples(index=False):
                url = getattr(row, url_col)
                text = getattr(row, text_col) or ""
                date = (
                    getattr(row, date_col)
                    if date_col and hasattr(row, date_col)
                    else None
                )
                rec = make_warc_record(
                    record_type,
                    str(text).encode("utf-8"),
                    target_uri=str(url),
                    content_type=content_type,
                    date=str(date or "2026-01-01T00:00:00Z"),
                )
                members.append(make_warc([rec], gzip_members=True))
                raw += len(rec)
                n += 1
                if raw >= cap:
                    yield flush()
        if n:
            yield flush()

    return rows.mapInPandas(
        run, schema="shard_id int, part int, n_pages int, payload binary"
    )


def write_wet_dir(shards: DataFrame, path: str) -> int:
    """Land WET shard payloads as files
    ``wet-<shard>-<part>.warc.gz`` under ``path`` (local/posix).
    Returns the file count. Each task writes its own shard files — no
    driver byte traffic; on object stores point this at a fuse mount
    or swap in a put-object call."""
    import os

    os.makedirs(path, exist_ok=True)

    def write_one(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        wrote = []
        for pdf in pdf_iter:
            for row in pdf.itertuples(index=False):
                fn = os.path.join(
                    path,
                    f"wet-{row.shard_id:05d}-{row.part:05d}.warc.gz",
                )
                with open(fn, "wb") as fh:
                    fh.write(bytes(row.payload))
                wrote.append(row.shard_id)
        yield pd.DataFrame({"shard_id": wrote})

    return shards.mapInPandas(
        write_one, schema="shard_id int"
    ).count()


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
    """LEGACY subset parser (r9): Disallow-only literal prefixes for
    groups whose agent token EQUALS ``agent``. Kept as the simple
    fold's contract test target; the politeness gate itself uses the
    RFC 9309-complete :func:`robots_rules` / :func:`robots_filter`
    (Allow, wildcards, longest-match, agent precedence) as of r10."""
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


def url_path_query(col: Column | str) -> Column:
    """Path + '?query' of a URL ('/' when the path is absent) — the
    string robots.txt rules match against (RFC 9309 matches the
    path-with-query, so 'Disallow: /cgi/*?' style rules see the '?')."""
    c = F.col(col) if isinstance(col, str) else col
    p = F.regexp_extract(
        c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^#]*|\?[^#]*)?", 1
    )
    return F.when(
        F.length(p) == 0, F.lit("/")
    ).otherwise(
        F.when(p.startswith("?"), F.concat(F.lit("/"), p)).otherwise(p)
    )


def robots_rules(col: Column | str) -> Column:
    """Parse a robots.txt body into its full rule list — an
    ``array<struct<agent, allow, value>>`` — as ONE JVM ``aggregate``
    fold over the lines (no Python, no UDF). RFC 9309 grammar:
    consecutive ``User-agent`` lines stack into one group (a group may
    name several agents; RFC 9309's grammar allows BLANK / comment-only
    lines between the startgrouplines, so only a rule line closes the
    header run — the r10 ADVICE gap); ``Allow`` and ``Disallow`` lines
    attach to every agent of the current group; comments strip at
    ``#``; empty-value rules (allow-all ``Disallow:``) are ignored;
    agent tokens lowercase (matching is case-insensitive). Group selection
    and path matching live in :func:`robots_rule_table` /
    :func:`robots_filter` — they are relational, over the tiny parsed
    rule table."""
    c = F.col(col) if isinstance(col, str) else col
    lines = F.split(c, r"\r?\n")  # robots.txt ships both line endings
    rule_t = "array<struct<agent:string,allow:int,value:string>>"
    init = F.struct(
        F.array().cast("array<string>").alias("agents"),
        F.lit(True).alias("header"),
        F.array().cast(rule_t).alias("rules"),
    )

    def step(acc, line):
        stripped = F.trim(F.substring_index(line, "#", 1))
        low = F.lower(stripped)
        is_blank = F.length(stripped) == 0
        is_ua = low.startswith("user-agent:")
        is_dis = low.startswith("disallow:")
        is_alw = low.startswith("allow:")
        ua = F.lower(F.trim(F.substring(stripped, 12, 1 << 20)))
        val = F.when(
            is_dis, F.trim(F.substring(stripped, 10, 1 << 20))
        ).otherwise(F.trim(F.substring(stripped, 7, 1 << 20)))
        agents = F.when(
            is_ua & acc["header"], F.array_append(acc["agents"], ua)
        ).when(is_ua, F.array(ua)).otherwise(acc["agents"])
        rules = F.when(
            (is_dis | is_alw) & (F.length(val) > 0),
            F.concat(
                acc["rules"],
                F.transform(
                    acc["agents"],
                    lambda ag: F.struct(
                        ag.alias("agent"),
                        F.when(is_alw, F.lit(1))
                        .otherwise(F.lit(0))
                        .alias("allow"),
                        val.alias("value"),
                    ),
                ),
            ),
        ).otherwise(acc["rules"])
        # blank/comment-only lines do NOT close a User-agent header
        # run (RFC 9309 grammar: startgrouplines may be separated by
        # empty lines) — only a rule/other directive line does
        return F.struct(
            agents.alias("agents"),
            (is_ua | (acc["header"] & is_blank)).alias("header"),
            rules.alias("rules"),
        )

    return F.aggregate(lines, init, step)["rules"]


def robots_sitemaps(col: Column | str) -> Column:
    """Sitemap URLs of a robots.txt body — ``Sitemap:`` lines are
    group-INDEPENDENT per the sitemaps.org protocol, so this is a
    plain line filter (comment-stripped), no group tracking. JVM
    transform/filter."""
    c = F.col(col) if isinstance(col, str) else col
    lines = F.transform(
        F.split(c, r"\r?\n"),
        lambda x: F.trim(F.substring_index(x, "#", 1)),
    )
    hits = F.filter(
        lines, lambda x: F.lower(x).startswith("sitemap:")
    )
    return F.transform(
        hits, lambda x: F.trim(F.substring(x, 9, 1 << 20))
    )


def sitemap_entries(col: Column | str) -> Column:
    """Parse a sitemaps.org ``<urlset>`` body into
    ``array<struct<loc:string,lastmod:string>>`` — pure JVM
    (regexp_extract_all over ``<url>`` blocks, then loc/lastmod per
    block, XML entity refs decoded through the shared
    :func:`decode_entities` so ``&amp;`` query URLs come out right).
    ``lastmod`` is null when the block omits it (r11, VERDICT r10
    task 4: sitemap discovery is how real crawlers find most of a
    site — outlink-only frontiers miss unlinked pages)."""
    c = F.col(col) if isinstance(col, str) else col
    blocks = F.regexp_extract_all(
        c, F.lit(r"(?is)<url\b[^>]*>(.*?)</url\s*>"), 1
    )

    def entry(b):
        loc = decode_entities(
            F.trim(
                F.regexp_extract(b, r"(?is)<loc[^>]*>(.*?)</loc\s*>", 1)
            )
        )
        lastmod = F.trim(
            F.regexp_extract(
                b, r"(?is)<lastmod[^>]*>(.*?)</lastmod\s*>", 1
            )
        )
        return F.struct(
            loc.alias("loc"),
            F.when(F.length(lastmod) > 0, lastmod).alias("lastmod"),
        )

    return F.filter(
        F.transform(blocks, entry), lambda e: F.length(e["loc"]) > 0
    )


def sitemap_index_locs(col: Column | str) -> Column:
    """Child sitemap URLs of a ``<sitemapindex>`` body,
    ``array<string>`` — same JVM regexp + entity-decode path."""
    c = F.col(col) if isinstance(col, str) else col
    blocks = F.regexp_extract_all(
        c, F.lit(r"(?is)<sitemap\b[^>]*>(.*?)</sitemap\s*>"), 1
    )
    locs = F.transform(
        blocks,
        lambda b: decode_entities(
            F.trim(
                F.regexp_extract(b, r"(?is)<loc[^>]*>(.*?)</loc\s*>", 1)
            )
        ),
    )
    return F.filter(locs, lambda x: F.length(x) > 0)


def is_sitemap_index(col: Column | str) -> Column:
    """True when the XML body is a ``<sitemapindex>`` (vs urlset)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(r"(?is)<sitemapindex\b")


def sitemap_frontier(rows: DataFrame) -> DataFrame:
    """The sitemap-fed fetch frontier over ONE capture set
    (robots.txt + sitemap XML + page captures all in ``rows``, the
    :func:`warc_response_rows` output): robots ``Sitemap:`` lines
    seed discovery; seeds that are ``<sitemapindex>`` expand ONE hop
    to their child sitemaps (the sitemaps.org nesting limit for index
    files pointing at urlsets); every ``<urlset>`` entry joins
    anti against the already-captured pages (canonical URL on both
    sides) — what's left is (domain, url, lastmod): the fetch list.

    Plan shape: the sitemap plane is domain-sized (robots and XML
    bodies DISTINCT'd), so every join here is a broadcast of that
    small side; the only scan of the big capture set is the one
    page-URL projection the anti-join consumes.

    r11 optimization: ``rows`` fans out to THREE consuming branches
    (robots, xml, captured) and the xml/seed branches are themselves
    multiply consumed — without a pinned exchange the upstream
    (typically a Python WARC parse) re-executed once per plan instance
    (11x measured in the sitemap_frontier query). shared_fanout seals
    one exchange every branch reuses.

    Input contract (r12, per r11 ADVICE): ``rows`` must carry the
    :func:`warc_response_rows` columns this operator reads — media_id,
    seq (the fanout key), url, text, error, content_type, http_status.
    A caller projecting those away fails analysis loudly at the seal."""
    from scicat_ingestor_spark.operators.util import shared_fanout

    # r12: the three branches read only url/text/error/content_type/
    # http_status — keep= narrows the sealed exchange to that union
    # (guide §2.3 "project before the exchange").
    rows = shared_fanout(
        rows,
        "media_id",
        "seq",
        keep=["url", "text", "error", "content_type", "http_status"],
    )
    robots = (
        rows.filter(
            F.col("url").endswith("/robots.txt")
            & F.col("error").isNull()
        )
        .select(url_host("url").alias("domain"), "text")
        .distinct()
    )
    seeds = robots.select(
        "domain",
        F.explode(robots_sitemaps("text")).alias("map_url"),
    )
    xml = (
        rows.filter(
            F.col("content_type").startswith("text/xml")
            & F.col("error").isNull()
        )
        .select(canonical_url("url").alias("map_url"), "text")
        .distinct()
    )
    seeded = seeds.join(F.broadcast(xml), "map_url")
    # one index hop: sitemapindex seeds expand to their children
    children = (
        seeded.filter(is_sitemap_index("text"))
        .select(
            "domain",
            F.explode(sitemap_index_locs("text")).alias("map_url"),
        )
        .join(F.broadcast(xml), "map_url")
    )
    urlsets = seeded.filter(~is_sitemap_index("text")).unionByName(
        children.filter(~is_sitemap_index("text"))
    )
    entries = urlsets.select(
        "domain",
        F.explode(sitemap_entries("text")).alias("e"),
    ).select(
        "domain",
        canonical_url(F.col("e.loc")).alias("url"),
        F.col("e.lastmod").alias("lastmod"),
    ).distinct()
    captured = rows.filter(
        (F.col("http_status") == 200)
        & F.col("content_type").startswith("text/html")
        & F.col("error").isNull()
    ).select(canonical_url("url").alias("url"))
    # scalable anti: scan the big capture side ONCE under a broadcast
    # semi filter (frontier candidates are domain-sized), then a
    # broadcast anti against the tiny hit set — the fact side never
    # shuffles
    hits = captured.join(
        F.broadcast(entries.select("url").distinct()), "url"
    ).distinct()
    return entries.join(F.broadcast(hits), "url", "left_anti")


def robots_crawl_delay(col: Column | str, agent: str = "*") -> Column:
    """Crawl-delay (seconds, double; null when absent) for ``agent``
    under the same GROUP-EXCLUSIVE model as the rule engine
    (:func:`robots_rule_table`): the winning group is selected by
    longest applicable agent token over ALL groups — delay-bearing or
    not — and then THAT group's delay (or null when it declares none)
    is the answer. A named group without a Crawl-delay therefore does
    NOT inherit the ``*`` group's delay (the r10 ADVICE gap:
    directives never mix across groups). Blank/comment-only lines keep
    a User-agent header run open, matching :func:`robots_rules`. Ties
    between equally-specific groups resolve to the FIRST group in file
    order (Crawl-delay is a de-facto extension; RFC 9309 merges rule
    sets of identical tokens, but a scalar can't merge, so first-wins
    is the deterministic choice). Pure JVM folds — no Python, no
    extra relation."""
    c = F.col(col) if isinstance(col, str) else col
    lines = F.split(c, r"\r?\n")
    grp_t = "array<struct<agents:array<string>,delay:double>>"
    init = F.struct(
        F.array().cast("array<string>").alias("agents"),
        F.lit(True).alias("header"),
        F.lit(None).cast("double").alias("delay"),
        F.array().cast(grp_t).alias("groups"),
    )

    def close_group(acc):
        return F.when(
            F.size(acc["agents"]) > 0,
            F.array_append(
                acc["groups"],
                F.struct(
                    acc["agents"].alias("agents"),
                    acc["delay"].alias("delay"),
                ),
            ),
        ).otherwise(acc["groups"])

    def step(acc, line):
        stripped = F.trim(F.substring_index(line, "#", 1))
        low = F.lower(stripped)
        is_blank = F.length(stripped) == 0
        is_ua = low.startswith("user-agent:")
        is_cd = low.startswith("crawl-delay:")
        ua = F.lower(F.trim(F.substring(stripped, 12, 1 << 20)))
        delay_v = F.trim(
            F.substring(stripped, 13, 1 << 20)
        ).cast("double")
        new_group = is_ua & ~acc["header"]
        groups = F.when(new_group, close_group(acc)).otherwise(
            acc["groups"]
        )
        agents = F.when(
            is_ua & acc["header"], F.array_append(acc["agents"], ua)
        ).when(is_ua, F.array(ua)).otherwise(acc["agents"])
        delay = (
            F.when(new_group, F.lit(None).cast("double"))
            .when(
                is_cd & delay_v.isNotNull(),
                F.coalesce(acc["delay"], delay_v),
            )
            .otherwise(acc["delay"])
        )
        return F.struct(
            agents.alias("agents"),
            (is_ua | (acc["header"] & is_blank)).alias("header"),
            delay.alias("delay"),
            groups.alias("groups"),
        )

    groups = F.aggregate(lines, init, step, close_group)
    agent_l = agent.lower()

    def tok_len(ag):
        return F.when(ag == "*", F.lit(0)).otherwise(F.length(ag))

    # per-group specificity: longest applicable token, -1 when the
    # group names no applicable agent at all
    scored = F.transform(
        groups,
        lambda g: F.struct(
            F.aggregate(
                g["agents"],
                F.lit(-1),
                lambda best, ag: F.when(
                    ((ag == "*") | F.lit(agent_l).startswith(ag))
                    & (tok_len(ag) > best),
                    tok_len(ag),
                ).otherwise(best),
            ).alias("len"),
            g["delay"].alias("delay"),
        ),
    )
    best_init = F.struct(
        F.lit(-1).alias("len"),
        F.lit(None).cast("double").alias("delay"),
    )
    return F.aggregate(
        scored,
        best_init,
        lambda b, g: F.when(g["len"] > b["len"], g).otherwise(b),
    )["delay"]


def robots_rule_table(
    robots_bodies: DataFrame, agent: str = "*"
) -> DataFrame:
    """(domain, rules) — ONE row per domain, ``rules`` the compiled
    rule array of the group RFC 9309 selects for ``agent``:

    - **group selection**: among groups whose token is ``*`` or a
      case-insensitive PREFIX of the crawler's product token, the
      longest token wins (``*`` counts as length 0 — a named match
      always beats the catch-all); no applicable group -> no rules
      (allow everything).
    - **wildcard compilation**: rule values translate to anchored Java
      regexes — ``*`` -> ``.*``, a TRAILING ``$`` -> end anchor, every
      other regex metachar escaped — so real-world rules like
      ``/*.php$`` match the way the RFC says instead of being taken as
      literal prefixes (the r9 ADVICE gap).
    - precedence data: each compiled rule keeps ``len`` (octets of the
      original value — the RFC's most-specific-match measure) and
      ``allow``.

    All relational work happens on the |domains|-sized parsed table;
    bodies are DISTINCT'd first because a crawl re-captures robots.txt
    constantly."""
    agent_l = agent.lower()
    parsed = (
        robots_bodies.select("domain", "text")
        .distinct()
        .select("domain", F.explode(robots_rules("text")).alias("r"))
    )
    applicable = parsed.filter(
        (F.col("r.agent") == "*")
        | F.lit(agent_l).startswith(F.col("r.agent"))
    ).select(
        "domain",
        "r",
        F.when(F.col("r.agent") == "*", F.lit(0))
        .otherwise(F.length("r.agent"))
        .alias("tok_len"),
    )
    w = Window.partitionBy("domain")
    selected = (
        applicable.withColumn("max_len", F.max("tok_len").over(w))
        .filter(F.col("tok_len") == F.col("max_len"))
        .select("domain", "r.allow", "r.value")
        .distinct()
    )
    anchored = F.col("value").endswith("$")
    core = F.when(
        anchored, F.expr("substring(value, 1, length(value) - 1)")
    ).otherwise(F.col("value"))
    esc = F.regexp_replace(core, r"([\\\.\[\]\{\}\(\)\+\?\^\$\|])", "\\\\$1")
    pattern = F.concat(
        F.lit("^"),
        F.regexp_replace(esc, r"\*", ".*"),
        F.when(anchored, F.lit("$")).otherwise(F.lit("")),
    )
    return selected.groupBy("domain").agg(
        F.collect_list(
            F.struct(
                pattern.alias("pattern"),
                F.length("value").alias("len"),
                F.col("allow").alias("allow"),
            )
        ).alias("rules")
    )


def robots_filter(
    pages: DataFrame, robots_bodies: DataFrame, agent: str = "*"
) -> DataFrame:
    """Drop pages a domain's robots.txt disallows for ``agent`` — the
    crawl-politeness gate, RFC 9309-complete as of r10: ``Allow``
    directives, longest-match precedence (most octets wins; equal
    octets -> Allow wins), ``*``/``$`` wildcard rules, and
    longest-agent-token group selection (see
    :func:`robots_rule_table`). ``pages`` needs a ``url`` column;
    ``robots_bodies`` is (domain, text) robots.txt bodies (e.g. the
    ``/robots.txt`` responses of the same capture set — a crawl
    re-captures each domain's robots.txt constantly, so duplicates
    are the NORM; bodies are DISTINCT'd before parsing).

    Plan shape (better than r9's): the per-domain rule ARRAY makes
    this an **equi broadcast-hash join on domain** + a scan-local JVM
    ``aggregate`` fold evaluating longest-match over the (small)
    per-domain rule list — no non-equi nested-loop, no per-page
    groupBy, no shuffle of the fact side at all. Pages of a domain
    with no applicable rules pass through (rules null -> allowed)."""
    table = robots_rule_table(robots_bodies, agent)
    keyed = pages.withColumn("_domain", url_host("url")).withColumn(
        "_path", url_path_query("url")
    )
    joined = keyed.join(F.broadcast(table),
                        F.col("_domain") == table["domain"], "left")
    init = F.struct(
        F.lit(-1).alias("len"), F.lit(1).alias("allow")
    )

    def step(acc, r):
        m = F.regexp_like(F.col("_path"), r["pattern"])
        better = m & (
            (r["len"] > acc["len"])
            | ((r["len"] == acc["len"]) & (r["allow"] > acc["allow"]))
        )
        return F.when(
            better,
            F.struct(r["len"].alias("len"), r["allow"].alias("allow")),
        ).otherwise(acc)

    verdict = F.aggregate(
        F.coalesce(
            F.col("rules"),
            F.array().cast(
                "array<struct<pattern:string,len:int,allow:int>>"
            ),
        ),
        init,
        step,
    )
    return (
        joined.filter(verdict["allow"] == 1)
        .drop("_domain", "_path", "domain", "rules")
    )


def canonical_url(col: Column | str) -> Column:
    """URL canonicalization as a JVM expression — the documented
    convention (lowercase scheme+host, drop the fragment, strip
    trailing slashes from the PATH only); path/query case is preserved
    (case-sensitive per RFC 3986). The key for capture-level dedup.
    The slash strip is scoped to the pre-query position: stripping on
    the whole URL would rewrite query VALUES ('?next=/' -> '?next=')
    and conflate distinct pages under one dedup key."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"#.*$", "")
    pre = F.regexp_extract(c, r"^([^?]*)", 1)
    qry = F.regexp_extract(c, r"(\?.*)$", 1)
    c = F.concat(F.regexp_replace(pre, r"/+$", ""), qry)
    head = F.lower(F.regexp_extract(c, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)", 1))
    rest = F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*(.*)$", 1)
    return F.when(head == "", c).otherwise(F.concat(head, rest))


# tracking parameters the policy normalizer strips: the de-facto list
# every wayback/SEO canonicalizer ships (Google Analytics utm_*,
# click ids, session ids) — parameters that never change page CONTENT
_TRACKING_PARAM_PREFIXES = ("utm_",)
_TRACKING_PARAMS = (
    "fbclid", "gclid", "msclkid", "dclid", "mc_cid", "mc_eid",
    "sessionid", "phpsessid", "jsessionid", "sid", "ref_src",
)


def normalize_url_policy(
    col: Column | str,
    sort_query: bool = True,
    strip_tracking: bool = True,
) -> Column:
    """POLICY-level URL normalization on top of :func:`canonical_url`
    (r11 — the half the SURT subset documented as 'policy, not
    format'): sort query parameters (the same page under ``?a=1&b=2``
    and ``?b=2&a=1`` folds to one dedup key) and strip the tracking
    parameters (utm_*, click ids, session ids) that never change page
    content. Empty surviving query drops the ``?`` entirely. Pure JVM
    (split / filter / sort_array / array_join); parameter-name match
    is case-insensitive, values preserved verbatim."""
    c = canonical_url(col)
    pre = F.regexp_extract(c, r"^([^?]*)", 1)
    q = F.regexp_extract(c, r"^[^?]*\?(.*)$", 1)
    parts = F.filter(F.split(q, "&"), lambda p: F.length(p) > 0)
    if strip_tracking:
        def keep(p):
            name = F.lower(F.substring_index(p, "=", 1))
            cond = ~name.isin(*_TRACKING_PARAMS)
            for pref in _TRACKING_PARAM_PREFIXES:
                cond = cond & ~name.startswith(pref)
            return cond

        parts = F.filter(parts, keep)
    if sort_query:
        parts = F.sort_array(parts)
    rebuilt = F.when(
        F.size(parts) > 0,
        F.concat(pre, F.lit("?"), F.array_join(parts, "&")),
    ).otherwise(
        # the pre-query slash strip re-applies when the query vanished
        F.regexp_replace(pre, r"/+$", "")
    )
    return F.when(c.contains("?"), rebuilt).otherwise(c)


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
    collapse to one arbitrary row. Dead-letter rows (``error`` set)
    are excluded too when the column is present.

    Revisit resolution (VERDICT r9 task 4): a ``revisit`` row is a
    capture of its target URI at the revisit date whose CONTENT is an
    earlier identical capture — so the winner supplies the page's true
    newest date while ``text`` backfills from the newest non-null text
    in the partition (revisit and request rows carry null text; both
    window functions share the ONE shuffle). Scales like every
    keep-one window here: shuffle linear in captures, no self-join."""
    keyed = rows.filter(
        F.col("url").isNotNull() & (F.length("url") > 0)
    )
    if "error" in rows.columns:
        keyed = keyed.filter(F.col("error").isNull())
    canon = keyed.withColumn("url", canonical_url("url"))
    w = Window.partitionBy("url").orderBy(
        F.col("warc_date").desc(), F.col("media_id").desc(),
        F.col("seq").desc(),
    )
    w_part = Window.partitionBy("url")
    # newest non-null text as a struct-max over the UNORDERED partition
    # spec — shares the count's Window node (no third sort pass); the
    # struct's field order replays the window's (date, media_id, seq)
    # precedence
    newest_text = F.max(
        F.when(
            F.col("text").isNotNull(),
            F.struct("warc_date", "media_id", "seq", "text"),
        )
    ).over(w_part)["text"]
    other = [
        c for c in canon.columns if c not in ("text", "rn", "n_captures")
    ]
    # one select so the two same-spec expressions share a Window node
    return (
        canon.select(
            *other,
            newest_text.alias("text"),
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(w_part).cast("int").alias(
                "n_captures"
            ),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def resolve_redirects(rows: DataFrame, max_hops: int = 3) -> DataFrame:
    """Follow HTTP redirect chains (r10): every capture row gains
    ``final_url`` (the canonical URL its chain terminates at, within
    ``max_hops``) and ``n_hops``. 3xx captures are how a crawl records
    half the web's moves; a pipeline that keeps only 200s silently
    loses the alias structure dedup and link analysis need.

    Plan shape: the redirect EDGE relation (3xx rows only — a small
    fraction of captures) is built once, then ``max_hops`` left joins
    fold chains onto it; the fact side joins the folded map ONCE. The
    edge relation is usually broadcastable (|3xx| << |captures|); AQE
    decides. Cycles and over-length chains stop at ``max_hops`` with
    the last URL reached (documented: no cycle detection beyond the
    hop bound — the standard crawler behavior). Location values
    resolve against their page URL (RFC 7231 allows relative).

    Input contract (r12, per r11 ADVICE): ``rows`` needs media_id and
    seq (the sealed exchange's fanout key) alongside url /
    http_status / redirect_to; every input column is passed through to
    the output."""
    # r11 optimization: the edge relation and the fact join both
    # consume the canonicalized rows (the edge fold references it
    # max_hops times) — one sealed exchange makes every instance past
    # the first a ReusedExchange read instead of a re-run of the
    # upstream parse (see operators.util.shared_fanout).
    # r12 NOTE: NOT narrowed with keep= — the fact branch passes every
    # input column through to the output (`*rows.columns` below), so
    # the branch-consumed union is already the full schema.
    from scicat_ingestor_spark.operators.util import shared_fanout

    canon = shared_fanout(
        rows.withColumn("_u", canonical_url("url")), "media_id", "seq"
    )
    edges = (
        canon.filter(
            F.col("http_status").between(300, 399)
            & F.col("redirect_to").isNotNull()
            & (F.length("redirect_to") > 0)
        )
        .select(
            F.col("_u").alias("src"),
            canonical_url(
                url_resolve(F.col("url"), F.col("redirect_to"))
            ).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        # a URL whose captures redirected to DIFFERENT targets over
        # time must still map to ONE target, or the fact join would
        # duplicate capture rows: keep the lexicographically-largest
        # (deterministic; carry dates through here for a
        # newest-capture-wins policy instead)
        .groupBy("src")
        .agg(F.max("dst").alias("dst"))
    )
    # fold chains one edge per round: after max_hops-1 extension
    # rounds the map covers chains up to max_hops hops with exact
    # hop counts
    mapping = edges.select(
        "src", "dst", F.lit(1).alias("hops")
    )
    for _ in range(max_hops - 1):
        nxt = edges.select(
            F.col("src").alias("m_src"), F.col("dst").alias("m_dst")
        )
        mapping = mapping.join(
            nxt, mapping["dst"] == nxt["m_src"], "left"
        ).select(
            "src",
            F.coalesce(F.col("m_dst"), F.col("dst")).alias("dst"),
            (
                F.col("hops")
                + F.when(F.col("m_dst").isNotNull(), 1).otherwise(0)
            ).alias("hops"),
        )
    return (
        canon.join(
            mapping, canon["_u"] == mapping["src"], "left"
        )
        .select(
            *[c for c in rows.columns],
            F.coalesce(F.col("dst"), F.col("_u")).alias("final_url"),
            F.coalesce(F.col("hops"), F.lit(0)).alias("n_hops"),
        )
    )


def _numref_char(cp: Column) -> Column:
    """One Unicode character from a numeric-reference codepoint:
    the WHATWG windows-1252 override for 0x80-0x9F (legacy pages ship
    '&#146;' apostrophes constantly), U+FFFD for out-of-range /
    surrogate codepoints, else the codepoint itself — decoded JVM-side
    as UTF-32BE bytes (Spark's chr() is latin-1-only and useless past
    0xFF)."""
    c1 = F.create_map(
        *[
            x
            for k, v in _NUMREF_C1.items()
            for x in (F.lit(k).cast("long"), F.lit(v))
        ]
    )
    valid = (
        (cp >= 1)
        & (cp <= 0x10FFFF)
        & ~((cp >= 0xD800) & (cp <= 0xDFFF))
    )
    general = F.when(
        valid, F.decode(F.unhex(F.lpad(F.hex(cp), 8, "0")), "UTF-32")
    ).otherwise(F.lit("�"))
    return F.coalesce(F.element_at(c1, cp), general)


def decode_numeric_refs(col: Column | str) -> Column:
    """Decode HTML numeric character references — decimal ``&#233;``
    and hex ``&#x2019;`` — as pure Column expressions (r11, VERDICT
    r10 task 2). Strategy: regexp-rewrite every reference to a
    sentinel-framed token, split on the sentinel, decode each token
    scan-locally, rejoin. The sentinel pass (not direct substitution)
    is what keeps the semantics one-pass: a decoded '&' can never
    combine with following text to form a second reference, matching
    how a browser tokenizes. Guarded by a contains() prefilter so
    pages without '&#' skip the machinery entirely."""
    c = F.col(col) if isinstance(col, str) else col
    r = F.regexp_replace(
        c, _RE_NUMREF_HEX, _NR_OPEN + "x$1" + _NR_CLOSE
    )
    r = F.regexp_replace(
        r, _RE_NUMREF_DEC, _NR_OPEN + "d$1" + _NR_CLOSE
    )
    parts = F.split(r, _NR_OPEN, -1)

    def decode_part(p, i):
        tok = F.substring_index(p, _NR_CLOSE, 1)
        tail = F.substr(p, F.length(tok) + 2)
        cp = F.when(
            F.substr(tok, F.lit(1), F.lit(1)) == "x",
            F.conv(F.substr(tok, F.lit(2)), 16, 10),
        ).otherwise(F.substr(tok, F.lit(2))).cast("long")
        decoded = F.concat(_numref_char(cp), F.coalesce(tail, F.lit("")))
        return F.when(
            (i > 0) & F.contains(p, F.lit(_NR_CLOSE)), decoded
        ).otherwise(p)

    decoded = F.array_join(F.transform(parts, decode_part), "")
    return F.when(F.contains(c, F.lit("&#")), decoded).otherwise(c)


def decode_entities(col: Column | str) -> Column:
    """Full entity decode — numeric references first (sentinel pass),
    then the one-pass named table with ``&amp;`` last. The shared
    entity step of every extraction variant."""
    c = decode_numeric_refs(col)
    for ent, rep in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return c


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
    c = decode_entities(c)
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
        y = decode_entities(y)
        return F.trim(F.regexp_replace(y, " +", " "))

    cleaned = F.transform(parts, clean)
    return F.array_join(
        F.filter(cleaned, lambda x: F.length(x) > 0), "\n"
    )


def html_article_text(col: Column | str) -> Column:
    """Main-content extraction, the OTHER half of the readability
    heuristic (r10, VERDICT r9 task 6): :func:`html_main_text` keeps
    only <p>/<h1-6> and so loses body text that sits in <div>s on
    nav-heavy pages. This variant keeps ALL visible block lines but

    1. scopes to the first ``<article>`` element when one exists (the
       HTML5 semantic main-content marker), and
    2. drops LINK-DENSE lines — lines where more than half the visible
       characters sit inside ``<a>`` elements (nav bars, footers,
       related-links lists), the classic boilerplate signal.

    Pure JVM: the per-line score is a transform to (visible_text,
    anchor_chars) structs, the gate a filter over it — regexp chains
    inside whole-stage codegen, no Python. Ties (exactly half anchor
    chars) are kept."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, _RE_COMMENT, " ")
    c = F.regexp_replace(c, _RE_DROPPED, " ")
    c = F.regexp_replace(c, r"\s+", " ")
    art = F.regexp_extract(c, r"(?is)<article\b[^>]*>(.*?)</article\s*>", 1)
    c = F.when(F.length(art) > 0, art).otherwise(c)
    c = F.regexp_replace(c, _RE_BLOCK, "\n")

    def vis(x):
        y = F.regexp_replace(x, _RE_ANY_TAG, " ")
        y = decode_entities(y)
        return F.trim(F.regexp_replace(y, " +", " "))

    def anchor_chars(x):
        anchors = F.regexp_extract_all(
            x, F.lit(r"(?is)<a\b[^>]*>(.*?)</a\s*>"), 1
        )
        return F.aggregate(
            anchors, F.lit(0), lambda acc, a: acc + F.length(vis(a))
        )

    scored = F.transform(
        F.split(c, "\n"),
        lambda x: F.struct(
            vis(x).alias("v"), anchor_chars(x).alias("a")
        ),
    )
    kept = F.filter(
        scored,
        lambda s: (F.length(s["v"]) > 0)
        & (2 * s["a"] <= F.length(s["v"])),
    )
    return F.array_join(F.transform(kept, lambda s: s["v"]), "\n")


def extract_hrefs(col: Column | str) -> Column:
    """All ``<a href>`` values of a RAW html column, as an
    array<string> — quoted attributes only (both quote styles), the
    documented convention (unquoted hrefs are vanishingly rare in real
    markup and ambiguous to delimit). Two regexp_extract_all passes,
    pure JVM."""
    c = F.col(col) if isinstance(col, str) else col
    dq = F.regexp_extract_all(
        c, F.lit(r'(?is)<a\b[^>]*?\bhref\s*=\s*"([^"]*)"'), 1
    )
    sq = F.regexp_extract_all(
        c, F.lit(r"(?is)<a\b[^>]*?\bhref\s*=\s*'([^']*)'"), 1
    )
    return F.concat(dq, sq)


def extract_links(col: Column | str) -> Column:
    """``<a>`` elements of a RAW html column as
    ``array<struct<href:string,anchor:string,nofollow:boolean>>`` —
    href (both quote styles), the VISIBLE anchor text (inner tags
    stripped, entities decoded, whitespace collapsed), and the
    ``rel`` nofollow flag (token match inside the rel value, either
    quote style, any attribute order — ``rel="nofollower"`` does NOT
    match) — the page-quality signal real pipelines aggregate per
    link target, with the link-hygiene bit Common Crawl's ranking
    pipelines read before building the graph (r11). Pure JVM; nested
    ``<a>`` is illegal HTML so the non-greedy span match is exact on
    real markup."""
    c = F.col(col) if isinstance(col, str) else col
    blocks = F.regexp_extract_all(
        c, F.lit(r"(?is)(<a\b[^>]*>.*?</a\s*>)"), 1
    )

    def link(b):
        dq = F.regexp_extract(
            b, r'(?is)<a\b[^>]*?\bhref\s*=\s*"([^"]*)"', 1
        )
        sq = F.regexp_extract(
            b, r"(?is)<a\b[^>]*?\bhref\s*=\s*'([^']*)'", 1
        )
        href = F.when(F.length(dq) > 0, dq).otherwise(sq)
        inner = F.regexp_extract(b, r"(?is)<a\b[^>]*>(.*?)</a\s*>", 1)
        anchor = F.trim(
            F.regexp_replace(
                decode_entities(
                    F.regexp_replace(inner, _RE_ANY_TAG, " ")
                ),
                r"\s+",
                " ",
            )
        )
        rel_dq = F.regexp_extract(
            b, r'(?is)<a\b[^>]*?\brel\s*=\s*"([^"]*)"', 1
        )
        rel_sq = F.regexp_extract(
            b, r"(?is)<a\b[^>]*?\brel\s*=\s*'([^']*)'", 1
        )
        rel = F.when(F.length(rel_dq) > 0, rel_dq).otherwise(rel_sq)
        nofollow = rel.rlike(r"(?i)(^|\s)nofollow(\s|$)")
        return F.struct(
            href.alias("href"),
            anchor.alias("anchor"),
            nofollow.alias("nofollow"),
        )

    return F.filter(
        F.transform(blocks, link), lambda s: F.length(s["href"]) > 0
    )


def page_anchor_links(
    pages: DataFrame, html_col: str = "text", follow_only: bool = False
) -> DataFrame:
    """One row per resolved http(s) out-link WITH its anchor text and
    nofollow flag — the WAT layout extended by the anchor span.
    ``follow_only=True`` drops rel=nofollow links, the hygiene real
    ranking pipelines apply before the link graph (feed
    ``operators.graph`` from this instead of page_outlinks when
    nofollow must not vote). Scan-local like :func:`page_outlinks`."""
    out = pages.withColumn(
        "l", F.explode(extract_links(F.col(html_col)))
    ).withColumn("link", url_resolve(F.col("url"), F.col("l.href")))
    out = out.filter(
        F.col("link").isNotNull()
        & F.col("link").rlike("^https?://")
    )
    if follow_only:
        out = out.filter(~F.col("l.nofollow"))
    return (
        out.withColumn("anchor", F.col("l.anchor"))
        .withColumn("nofollow", F.col("l.nofollow"))
        .drop("l", html_col)
    )


def anchor_text_agg(
    links: DataFrame, max_anchors: int = 64
) -> DataFrame:
    """Aggregate anchor text per link TARGET (canonical URL):
    (url, n_refs, anchors) where ``anchors`` is the sorted distinct
    non-empty anchor set CAPPED at ``max_anchors`` (mega-targets like
    front pages collect millions of anchors; the cap keeps the row
    bounded, the way CC's WAT consumers sample). One shuffle keyed by
    target."""
    return (
        links.groupBy(canonical_url(F.col("link")).alias("url"))
        .agg(
            F.count(F.lit(1)).alias("n_refs"),
            F.slice(
                F.sort_array(
                    F.collect_set(
                        F.when(
                            F.length("anchor") > 0, F.col("anchor")
                        )
                    )
                ),
                1,
                max_anchors,
            ).alias("anchors"),
        )
    )


def url_resolve(base: Column | str, href: Column | str) -> Column:
    """Resolve an href against its page URL — the RFC 3986 subset a
    link-graph extractor needs, as pure Column expressions:

    - absolute URLs (any scheme) pass through;
    - scheme-relative ``//host/path`` takes the base scheme;
    - root-relative ``/path`` takes the base origin;
    - path-relative resolves against the base directory — EXCEPT
      links carrying dot-segments (``../``/``./``), which return null
      (normalizing them needs an iterative pass; real extractors drop
      them at far below 1% of links — documented subset);
    - empty and pure-fragment hrefs return null (same page);
    - the fragment strips from every resolved URL.
    """
    b = F.col(base) if isinstance(base, str) else base
    h = F.trim(F.col(href) if isinstance(href, str) else href)
    scheme = F.regexp_extract(b, r"^([a-zA-Z][a-zA-Z0-9+.-]*):", 1)
    origin = F.regexp_extract(b, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    base_dir = F.regexp_extract(url_path(b), r"^(.*/)", 1)
    has_scheme = h.rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*:")
    dotted = h.rlike(r"(^|/)\.\.?(/|$)")
    resolved = (
        F.when((F.length(h) == 0) | h.startswith("#"), F.lit(None))
        .when(has_scheme, h)
        .when(h.startswith("//"), F.concat(scheme, F.lit(":"), h))
        .when(h.startswith("/"), F.concat(origin, h))
        .when(dotted, F.lit(None))
        .otherwise(F.concat(origin, base_dir, h))
    )
    return F.regexp_replace(resolved, r"#.*$", "")


def page_outlinks(pages: DataFrame, html_col: str = "text") -> DataFrame:
    """One row per resolved http(s) out-link of every page — the WAT
    side of a crawl (link-graph extraction). Input rows need ``url``
    (the capture URI) and raw html; output adds ``link``. Scan-local:
    extraction + resolution are codegen'd expressions ahead of an
    explode, no shuffle."""
    out = pages.withColumn(
        "link",
        F.explode(extract_hrefs(F.col(html_col))),
    ).withColumn("link", url_resolve(F.col("url"), F.col("link")))
    return out.filter(
        F.col("link").isNotNull()
        & F.col("link").rlike("^https?://")
    ).drop(html_col)


def url_host(col: Column | str) -> Column:
    """Lowercased hostname of a URL (port stripped) — the grouping key
    for per-domain crawl analytics and politeness accounting."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(
        F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1)
    )


def decode_entities_py(s: str) -> str:
    """Python twin of :func:`decode_entities` — the SAME sentinel
    pass for numeric references (a direct re.sub would let a decoded
    '&' combine with following text into a second reference, forking
    the engines on inputs like '&#x26;#65;'), then the one-pass named
    table."""
    s = re.sub(_RE_NUMREF_HEX, _NR_OPEN + r"x\1" + _NR_CLOSE, s,
               flags=re.ASCII)
    s = re.sub(_RE_NUMREF_DEC, _NR_OPEN + r"d\1" + _NR_CLOSE, s,
               flags=re.ASCII)
    if _NR_OPEN in s:
        parts = s.split(_NR_OPEN)
        out = [parts[0]]
        for p in parts[1:]:
            if _NR_CLOSE not in p:
                out.append(p)
                continue
            tok, tail = p.split(_NR_CLOSE, 1)
            cp = int(tok[1:], 16 if tok[0] == "x" else 10)
            if cp in _NUMREF_C1:
                ch = _NUMREF_C1[cp]
            elif cp < 1 or cp > 0x10FFFF or 0xD800 <= cp <= 0xDFFF:
                ch = "�"
            else:
                ch = chr(cp)
            out.append(ch + tail)
        s = "".join(out)
    for ent, rep in _ENTITIES:
        s = s.replace(ent, rep)
    return s


def html_to_text(html: str) -> str:
    """Python twin of :func:`html_text` — same 6 steps, used by tests
    (parity property) and by non-Spark callers. NOT the data-plane
    path (the Column chain is). Compiled with ``re.ASCII`` so
    ``\\s``/``\\b`` mean exactly what Java's ASCII-only classes mean in
    the Column chain (Python's Unicode ``\\s`` would also collapse
    U+00A0/U+2028 and fork the two engines on non-ASCII whitespace);
    line trim is space-only for the same reason (Spark ``trim`` strips
    0x20 only, Python's bare ``.strip()`` strips Unicode whitespace)."""
    s = re.sub(_RE_COMMENT, " ", html, flags=re.ASCII)
    # Python re has no inline-flag-mid-pattern restriction issues here;
    # translate the (?is)/(?i) prefixes directly
    s = re.sub(_RE_DROPPED, " ", s, flags=re.ASCII)
    s = re.sub(r"\s+", " ", s, flags=re.ASCII)
    s = re.sub(_RE_BLOCK, "\n", s, flags=re.ASCII)
    s = re.sub(_RE_ANY_TAG, " ", s, flags=re.ASCII)
    s = decode_entities_py(s)
    out = []
    for line in s.split("\n"):
        line = re.sub(r" +", " ", line).strip(" ")
        if line:
            out.append(line)
    return "\n".join(out)
