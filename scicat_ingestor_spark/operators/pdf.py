"""PDF text extraction — the honest subset (r11, VERDICT r10 task 3).

Real crawls carry a large token mass in ``application/pdf``; until now
the capture plane kept only ``text/*`` bodies (operators/warc.py). This
module extracts text from the PDF layouts that dominate that mass,
pure-stdlib (zlib only), in the repo's codec discipline (jpegc/mp4):
a real parser for the documented subset, loud ``ValueError`` gates at
the boundaries, never a silent wrong answer.

Supported (the subset that covers machine-generated text PDFs):

- object scan: ``N G obj .. endobj`` walked in FILE ORDER (no xref
  chase — robust to linearized/appended files; the xref is only a
  byte index over the same objects);
- streams: raw or ``/FlateDecode`` (zlib), inflate-capped;
- page discovery: ``/Type /Page`` objects in file order, content via
  ``/Contents N 0 R`` (single ref or array);
- content-stream text operators: ``BT``/``ET`` text objects, ``Tj``
  (show), ``TJ`` (array show — kerning numbers ignored), ``'`` and
  ``"`` (next-line show), ``Td``/``TD``/``T*`` (line breaks);
- string syntax: ``(..)`` literals with the full escape table
  (``\\n \\r \\t \\b \\f \\( \\) \\\\``, octal ``\\ddd``,
  line continuations) and ``<..>`` hex strings;
- bytes -> str via latin-1 (the PDFDocEncoding-compatible total
  decode) for simple fonts, and through the font's **/ToUnicode
  CMap** (bfchar + bfrange, both forms; ``Tf`` tracks the current
  font) for composite/CID fonts — the Type0 / Identity-H layout
  every non-latin and most modern latin PDFs ship;
- object streams (``/Type /ObjStm``) and xref streams (ignored
  structurally, expanded for members) — the PDF 1.5+ layout.

Explicitly GATED (ValueError — dead-letters the record in the WARC
plane, never a corrupt extraction):

- encrypted documents (``/Encrypt`` in the trailer);
- filters other than FlateDecode (DCT/LZW/ASCII85/CCITT...);
- no text recovered AND no pages found (not a text PDF / not a PDF).

Known boundary (documented, not gated): CID fonts WITHOUT a
/ToUnicode CMap show as latin-1 of the raw 2-byte codes, and codes a
CMap omits emit U+FFFD — visibly garbled, never silently wrong
(resolving those needs the font program's internal cmap table, the
next honest increment).

Every layout rule cites ISO 32000-1 (public spec). Spark-side use:
:func:`pdf_text` is called inside ``warc.warc_response_rows``'s
Arrow-batched record decode — scan-local per capture file, no extra
plan node, dead-letter channel shared with the HTTP/gzip faults.
"""

from __future__ import annotations

import re
import zlib

MAX_INFLATED_BYTES = 1 << 30  # same bomb cap as the WARC plane

_RE_OBJ = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_RE_PAGE = re.compile(rb"/Type\s*/Page\b(?!s)")
_RE_CONTENTS_REF = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
_RE_CONTENTS_ARR = re.compile(rb"/Contents\s*\[((?:\s*\d+\s+\d+\s+R)+)\s*\]")
_RE_REF = re.compile(rb"(\d+)\s+\d+\s+R")
_RE_FILTER = re.compile(rb"/Filter\s*(/\w+|\[[^\]]*\])")
_RE_FLATE = re.compile(rb"/FlateDecode\b")


def _inflate(data: bytes) -> bytes:
    o = zlib.decompressobj(wbits=15)
    try:
        out = o.decompress(data, MAX_INFLATED_BYTES + 1)
    except zlib.error as e:
        raise ValueError(f"not a PDF: bad FlateDecode stream ({e})")
    if len(out) > MAX_INFLATED_BYTES:
        raise ValueError("not a PDF: stream exceeds inflate cap")
    return out


_RE_OBJSTM = re.compile(rb"/Type\s*/ObjStm\b")
_RE_N = re.compile(rb"/N\s+(\d+)")
_RE_FIRST = re.compile(rb"/First\s+(\d+)")


def _objstm_members(head: bytes, data: bytes) -> dict[int, bytes]:
    """Expand a /Type /ObjStm stream (PDF 1.5+, ISO 32000-1 §7.5.7 —
    where modern writers put most non-stream objects, page dicts
    included): ``/N`` pairs of ``objnum offset`` before ``/First``,
    then the headerless object bodies."""
    nm, fm = _RE_N.search(head), _RE_FIRST.search(head)
    if not nm or not fm:
        raise ValueError("not a PDF: object stream missing /N or /First")
    n, first = int(nm.group(1)), int(fm.group(1))
    toks = data[:first].split()
    if len(toks) < 2 * n:
        raise ValueError("not a PDF: short object-stream index")
    try:
        ints = [int(t) for t in toks[: 2 * n]]
    except ValueError:
        raise ValueError("not a PDF: bad object-stream index")
    pairs = list(zip(ints[0::2], ints[1::2]))
    out: dict[int, bytes] = {}
    for i, (num, off) in enumerate(pairs):
        end = (
            first + pairs[i + 1][1] if i + 1 < len(pairs) else len(data)
        )
        if first + off > len(data) or end > len(data) or off < 0:
            raise ValueError("not a PDF: object-stream offset out of range")
        out[num] = data[first + off : end]
    return out


def pdf_objects(data: bytes) -> dict[int, tuple[bytes, bytes | None]]:
    """Scan ``N G obj .. endobj`` spans in file order -> {num: (head,
    decoded_stream_or_None)}. The head is everything before the
    ``stream`` keyword (the object's dictionary); streams decode
    through the /Filter gate; ``/Type /ObjStm`` streams expand to
    their member objects in place (so page dicts inside compressed
    object streams — the PDF 1.5+ default layout — are found). Later
    definitions of the same object number win (incremental-update
    semantics, ISO 32000-1 §7.5.6)."""
    out: dict[int, tuple[bytes, bytes | None]] = {}
    for m in _RE_OBJ.finditer(data):
        num = int(m.group(1))
        end = data.find(b"endobj", m.end())
        if end < 0:
            raise ValueError("not a PDF: unterminated object")
        body = data[m.end():end]
        sm = re.search(rb"stream(\r\n|\n|\r)", body)
        if sm is None:
            out[num] = (body, None)
            continue
        head = body[: sm.start()]
        se = body.find(b"endstream", sm.end())
        if se < 0:
            raise ValueError("not a PDF: unterminated stream")
        raw = body[sm.end():se]
        # trailing EOL before endstream is part of the framing, not
        # the stream (ISO 32000-1 §7.3.8.1)
        if raw.endswith(b"\r\n"):
            raw = raw[:-2]
        elif raw.endswith((b"\n", b"\r")):
            raw = raw[:-1]
        fm = _RE_FILTER.search(head)
        if fm:
            if _RE_FLATE.search(fm.group(1)) and not re.search(
                rb"/(DCTDecode|LZWDecode|ASCII85Decode|ASCIIHexDecode|"
                rb"RunLengthDecode|CCITTFaxDecode|JBIG2Decode|"
                rb"JPXDecode|Crypt)\b",
                fm.group(1),
            ):
                raw = _inflate(raw)
            elif _RE_FLATE.search(fm.group(1)):
                raise ValueError(
                    "not a PDF: unsupported filter chain "
                    f"{fm.group(1)[:40]!r}"
                )
            else:
                raise ValueError(
                    f"not a PDF: unsupported filter {fm.group(1)[:40]!r}"
                )
        out[num] = (head, raw)
        if raw is not None and _RE_OBJSTM.search(head):
            for mnum, body in _objstm_members(head, raw).items():
                out[mnum] = (body, None)
    return out


def _parse_literal(data: bytes, i: int) -> tuple[bytes, int]:
    """One ``(..)`` literal string starting at ``data[i] == '('`` ->
    (decoded bytes, next index). Full escape table + balanced nested
    parens (ISO 32000-1 §7.3.4.2)."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(data)
    esc = {
        ord("n"): 10, ord("r"): 13, ord("t"): 9,
        ord("b"): 8, ord("f"): 12,
        ord("("): 40, ord(")"): 41, ord("\\"): 92,
    }
    while i < n:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in esc:
                out.append(esc[e])
                i += 1
            elif 0x30 <= e <= 0x37:  # up to 3 octal digits
                val = 0
                k = 0
                while k < 3 and i < n and 0x30 <= data[i] <= 0x37:
                    val = val * 8 + (data[i] - 0x30)
                    i += 1
                    k += 1
                out.append(val & 0xFF)
            elif e in (0x0D, 0x0A):  # line continuation
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:  # lone backslash drops (spec: ignore)
                out.append(e)
                i += 1
        elif c == 0x28:
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
            out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    raise ValueError("not a PDF: unterminated literal string")


def _parse_hex(data: bytes, i: int) -> tuple[bytes, int]:
    """One ``<..>`` hex string starting at ``data[i] == '<'`` (odd
    digit count pads a trailing 0, §7.3.4.3)."""
    j = data.find(b">", i + 1)
    if j < 0:
        raise ValueError("not a PDF: unterminated hex string")
    digits = re.sub(rb"\s+", b"", data[i + 1 : j])
    if len(digits) % 2:
        digits += b"0"
    try:
        return bytes.fromhex(digits.decode("ascii")), j + 1
    except ValueError:
        raise ValueError("not a PDF: bad hex string")


_RE_KEYWORD = re.compile(rb"[A-Za-z'\"*]+")
_RE_NAME = re.compile(rb"/([A-Za-z0-9_.+-]+)")
_RE_HEXTOK = re.compile(rb"<([0-9a-fA-F\s]*)>")


def parse_tounicode(stream: bytes) -> tuple[int, dict[int, str]]:
    """(code_bytes, {code: unicode}) from a /ToUnicode CMap stream
    (ISO 32000-1 §9.10.3 / Adobe CMap spec): ``bfchar`` pairs,
    ``bfrange`` runs (consecutive and array form), destination values
    UTF-16BE. Code width comes from the codespacerange token (2 bytes
    for Identity-H, the overwhelming real-world case)."""
    code_len = 2
    m = re.search(
        rb"begincodespacerange\s*<([0-9a-fA-F]+)>", stream
    )
    if m:
        code_len = max(1, len(m.group(1)) // 2)

    def hx(tok: bytes) -> bytes:
        digits = re.sub(rb"\s+", b"", tok)
        if len(digits) % 2:
            digits += b"0"
        return bytes.fromhex(digits.decode("ascii"))

    out: dict[int, str] = {}
    for sec in re.finditer(
        rb"beginbfchar(.*?)endbfchar", stream, re.S
    ):
        toks = _RE_HEXTOK.findall(sec.group(1))
        for src, dst in zip(toks[0::2], toks[1::2]):
            out[int.from_bytes(hx(src), "big")] = hx(dst).decode(
                "utf-16-be", "replace"
            )
    for sec in re.finditer(
        rb"beginbfrange(.*?)endbfrange", stream, re.S
    ):
        body = sec.group(1)
        pos = 0
        while True:
            mm = re.compile(
                rb"<([0-9a-fA-F\s]*)>\s*<([0-9a-fA-F\s]*)>\s*"
                rb"(\[|<[0-9a-fA-F\s]*>)"
            ).search(body, pos)
            if not mm:
                break
            lo = int.from_bytes(hx(mm.group(1)), "big")
            hi = int.from_bytes(hx(mm.group(2)), "big")
            if hi - lo > 1 << 16:
                raise ValueError("not a PDF: oversized bfrange")
            if mm.group(3) == b"[":
                end = body.find(b"]", mm.end())
                if end < 0:
                    raise ValueError("not a PDF: unterminated bfrange")
                dsts = _RE_HEXTOK.findall(body[mm.end():end])
                for k, d in zip(range(lo, hi + 1), dsts):
                    out[k] = hx(d).decode("utf-16-be", "replace")
                pos = end + 1
            else:
                base = int.from_bytes(hx(mm.group(3)[1:-1]), "big")
                width = len(re.sub(rb"\s+", b"", mm.group(3)[1:-1]))
                width = max(2, width // 2 * 2) // 2  # dst byte count
                for k in range(lo, hi + 1):
                    out[k] = (base + (k - lo)).to_bytes(
                        max(width, 2), "big"
                    ).decode("utf-16-be", "replace")
                pos = mm.end()
    return code_len, out


def _decode_shown(
    s: bytes, font: str | None, font_maps: dict | None
) -> str:
    """Shown-string bytes -> text: through the current font's
    ToUnicode map when one exists (unmapped codes -> U+FFFD, loud
    not silent), latin-1 otherwise (the simple-font subset)."""
    if font_maps and font in font_maps:
        code_len, cmap = font_maps[font]
        out = []
        for i in range(0, len(s) - code_len + 1, code_len):
            code = int.from_bytes(s[i : i + code_len], "big")
            out.append(cmap.get(code, "�"))
        return "".join(out)
    return s.decode("latin-1")


def content_text(
    stream: bytes, font_maps: dict | None = None
) -> list[str]:
    """Text lines of ONE page content stream: walk the operator
    stream, show-op strings append to the current line, line-break
    ops (Td/TD/T*/'/\"/BT) flush it. ``font_maps`` maps resource font
    names ('F1') to (code_bytes, ToUnicode dict); the ``Tf`` operator
    tracks the current font so CID strings decode through their CMap.
    Kerning numbers inside TJ arrays are ignored (pure
    concatenation — documented simplification)."""
    lines: list[str] = []
    buf: list[str] = []
    strings: list[bytes] = []
    in_text = False
    font: str | None = None
    last_name: str | None = None

    def newline():
        if buf:
            lines.append("".join(buf))
            buf.clear()

    def shown(b: bytes) -> str:
        return _decode_shown(b, font, font_maps)

    i = 0
    n = len(stream)
    while i < n:
        c = stream[i]
        if c == 0x28:  # (
            s, i = _parse_literal(stream, i)
            strings.append(s)
        elif c == 0x3C and not stream.startswith(b"<<", i):  # <
            s, i = _parse_hex(stream, i)
            strings.append(s)
        elif c == 0x2F:  # /Name
            m = _RE_NAME.match(stream, i)
            if m:
                last_name = m.group(1).decode("latin-1")
                i = m.end()
            else:
                i += 1
        elif c == 0x25:  # % comment to EOL
            j = stream.find(b"\n", i)
            i = n if j < 0 else j + 1
        else:
            m = _RE_KEYWORD.match(stream, i)
            if not m:
                i += 1
                continue
            kw = m.group(0)
            i = m.end()
            if kw == b"BT":
                in_text = True
                newline()
                strings.clear()
            elif kw == b"ET":
                in_text = False
                strings.clear()
            elif kw == b"Tf":
                font = last_name
                strings.clear()
            elif not in_text:
                strings.clear()
            elif kw == b"Tj" and strings:
                buf.append(shown(strings[-1]))
                strings.clear()
            elif kw == b"TJ" and strings:
                # every string since the last op belongs to the array
                buf.append("".join(shown(s) for s in strings))
                strings.clear()
            elif kw in (b"'", b'"') and strings:
                newline()
                buf.append(shown(strings[-1]))
                strings.clear()
            elif kw in (b"Td", b"TD", b"T*"):
                newline()
                strings.clear()
            elif kw in (b"Tc", b"Tw", b"Tz", b"TL", b"Ts",
                        b"Tr", b"Tm"):
                strings.clear()  # operands consumed, none were shown
    newline()
    return lines


def pdf_text(data: bytes) -> tuple[str, int]:
    """(text, n_pages) of a PDF byte stream — pages in file order,
    lines joined with newlines, pages with page breaks folded to the
    same newline. Raises ValueError on the documented gates."""
    if not data.startswith(b"%PDF-"):
        raise ValueError("not a PDF: missing %PDF- header")
    if re.search(rb"/Encrypt\s+\d+\s+\d+\s+R", data) or re.search(
        rb"/Encrypt\s*<<", data
    ):
        raise ValueError("not a PDF: encrypted (unsupported)")
    objs = pdf_objects(data)
    page_lines: list[str] = []
    n_pages = 0
    for num in objs:  # dict preserves file order (later defs win)
        head, _ = objs[num]
        if not _RE_PAGE.search(head):
            continue
        n_pages += 1
        refs: list[int] = []
        am = _RE_CONTENTS_ARR.search(head)
        if am:
            refs = [int(r.group(1)) for r in _RE_REF.finditer(am.group(1))]
        else:
            rm = _RE_CONTENTS_REF.search(head)
            if rm:
                refs = [int(rm.group(1))]
        fm = _page_font_maps(head, objs)
        for r in refs:
            if r not in objs or objs[r][1] is None:
                raise ValueError("not a PDF: missing content stream")
            page_lines.extend(content_text(objs[r][1], fm))
    if n_pages == 0:
        raise ValueError("not a PDF: no pages")
    return "\n".join(page_lines), n_pages


_RE_FONT_DICT = re.compile(rb"/Font\s*<<(.*?)>>", re.S)
_RE_FONT_REF = re.compile(rb"/Font\s+(\d+)\s+\d+\s+R")
_RE_FONT_ENTRY = re.compile(rb"/([A-Za-z0-9_.+-]+)\s+(\d+)\s+\d+\s+R")
_RE_TOUNI = re.compile(rb"/ToUnicode\s+(\d+)\s+\d+\s+R")


def _page_font_maps(head: bytes, objs: dict) -> dict | None:
    """{font resource name: (code_bytes, ToUnicode dict)} of one
    page's /Resources /Font dictionary (inline or by reference) —
    only fonts that CARRY a /ToUnicode CMap appear; simple fonts keep
    the latin-1 default path (r11: the CID-font boundary from the
    first PDF increment, now real for the CMap-bearing majority of
    composite-font PDFs — CID fonts WITHOUT ToUnicode still emit
    U+FFFD-free latin-1 of the raw codes, visibly garbled, never
    silently wrong)."""
    body = b""
    dm = _RE_FONT_DICT.search(head)
    if dm:
        body = dm.group(1)
    else:
        rm = _RE_FONT_REF.search(head)
        if rm and int(rm.group(1)) in objs:
            body = objs[int(rm.group(1))][0]
    fm: dict = {}
    for name, fnum in _RE_FONT_ENTRY.findall(body):
        fobj = objs.get(int(fnum))
        if fobj is None:
            continue
        tu = _RE_TOUNI.search(fobj[0])
        if tu:
            tnum = int(tu.group(1))
            if tnum in objs and objs[tnum][1] is not None:
                fm[name.decode("latin-1")] = parse_tounicode(
                    objs[tnum][1]
                )
    return fm or None


# ---------------------------------------------------------------------------
# fixture builder (deterministic, spec-complete: real xref + trailer)
# ---------------------------------------------------------------------------

def _content_stream(lines: list[str], flate: bool) -> tuple[bytes, bytes]:
    """(dict_head, stream_bytes) for one page's content."""
    ops = [b"BT /F1 12 Tf 72 720 Td"]
    for li, line in enumerate(lines):
        esc = (
            line.encode("latin-1", "replace")
            .replace(b"\\", rb"\\")
            .replace(b"(", rb"\(")
            .replace(b")", rb"\)")
        )
        if li:
            ops.append(b"T*")
        ops.append(b"(" + esc + b") Tj")
    ops.append(b"ET")
    content = b" ".join(ops)
    if flate:
        content = zlib.compress(content, 6)
        head = (
            f"<< /Length {len(content)} /Filter /FlateDecode >>"
        ).encode()
    else:
        head = f"<< /Length {len(content)} >>".encode()
    return head, content


def make_pdf_objstm(pages: list[list[str]], flate: bool = True) -> bytes:
    """The MODERN (PDF 1.5+) layout of :func:`make_pdf`: every
    non-stream object (catalog, page tree, font, page dicts) lives
    inside one ``/Type /ObjStm`` compressed object stream, indexed by
    a cross-reference STREAM (``/Type /XRef``, W [1 3 2], type-2
    entries for the members) — the default output of today's PDF
    writers, and the layout a file-order ``obj..endobj`` scan alone
    would miss pages in."""
    n_pages = len(pages)
    first_page = 4
    # member (non-stream) objects
    kids = " ".join(f"{first_page + 2 * p} 0 R" for p in range(n_pages))
    members: list[tuple[int, bytes]] = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (
            2,
            f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode(),
        ),
        (3, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
    ]
    for p in range(n_pages):
        num = first_page + 2 * p
        members.append(
            (
                num,
                (
                    f"<< /Type /Page /Parent 2 0 R "
                    f"/MediaBox [0 0 612 792] "
                    f"/Resources << /Font << /F1 3 0 R >> >> "
                    f"/Contents {num + 1} 0 R >>"
                ).encode(),
            )
        )
    objstm_num = first_page + 2 * n_pages
    xref_num = objstm_num + 1
    size = xref_num + 1
    # serialize the object stream: index pairs, then bodies
    bodies = [b for _, b in members]
    offs = []
    pos = 0
    for b in bodies:
        offs.append(pos)
        pos += len(b) + 1
    index = " ".join(
        f"{num} {off}" for (num, _), off in zip(members, offs)
    ).encode()
    payload = index + b"\n" + b" ".join(bodies) + b" "
    first = len(index) + 1
    stm = zlib.compress(payload, 6) if flate else payload
    filt = " /Filter /FlateDecode" if flate else ""
    objstm_head = (
        f"<< /Type /ObjStm /N {len(members)} /First {first} "
        f"/Length {len(stm)}{filt} >>"
    ).encode()

    out = bytearray(b"%PDF-1.5\n")
    top_offsets: dict[int, int] = {}
    for p in range(n_pages):
        num = first_page + 2 * p + 1
        head, content = _content_stream(pages[p], flate)
        top_offsets[num] = len(out)
        out += (
            f"{num} 0 obj\n".encode() + head
            + b"\nstream\n" + content + b"\nendstream\nendobj\n"
        )
    top_offsets[objstm_num] = len(out)
    out += (
        f"{objstm_num} 0 obj\n".encode() + objstm_head
        + b"\nstream\n" + stm + b"\nendstream\nendobj\n"
    )
    # xref stream: W [1 3 2]
    xref_at = len(out)
    rows = bytearray()
    for num in range(size):
        if num == 0:
            t, f2, f3 = 0, 0, 65535
        elif num in top_offsets or num == xref_num:
            t = 1
            f2 = top_offsets.get(num, xref_at)
            f3 = 0
        else:
            t = 2
            f2 = objstm_num
            f3 = next(
                i for i, (n, _) in enumerate(members) if n == num
            )
        rows += bytes([t]) + f2.to_bytes(3, "big") + f3.to_bytes(2, "big")
    xrows = zlib.compress(bytes(rows), 6) if flate else bytes(rows)
    xfilt = " /Filter /FlateDecode" if flate else ""
    out += (
        f"{xref_num} 0 obj\n<< /Type /XRef /Size {size} /W [1 3 2] "
        f"/Root 1 0 R /Length {len(xrows)}{xfilt} >>\nstream\n"
    ).encode() + xrows + b"\nendstream\nendobj\n"
    out += f"startxref\n{xref_at}\n%%EOF\n".encode()
    return bytes(out)


def make_pdf(pages: list[list[str]], flate: bool = True) -> bytes:
    """A deterministic single-font PDF: one content stream per page
    (``BT /F1 12 Tf 72 720 Td (line) Tj T* ... ET``), FlateDecode
    optional, correct xref byte offsets + trailer — readable by any
    conforming viewer, not just this module's parser."""
    objs: list[bytes] = []
    kids = []
    first_page = 4  # 1 catalog, 2 pages, 3 font
    for p in range(len(pages)):
        kids.append(f"{first_page + 2 * p} 0 R")
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        (
            f"<< /Type /Pages /Kids [{' '.join(kids)}] "
            f"/Count {len(pages)} >>"
        ).encode()
    )
    objs.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    streams: list[bytes | None] = [None, None, None]
    for p, lines in enumerate(pages):
        page_num = first_page + 2 * p
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 3 0 R >> >> "
                f"/Contents {page_num + 1} 0 R >>"
            ).encode()
        )
        streams.append(None)
        head, content = _content_stream(lines, flate)
        objs.append(head)
        streams.append(content)
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, obj in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + obj
        s = streams[i - 1] if i - 1 < len(streams) else None
        if s is not None:
            out += b"\nstream\n" + s + b"\nendstream"
        out += b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def make_pdf_cid(pages: list[list[str]], flate: bool = True) -> bytes:
    """A composite-font (Type0 / Identity-H) PDF whose text shows as
    2-byte CIDs through a /ToUnicode CMap — the layout every
    non-latin and most modern latin PDFs use. The CMap maps CID
    0x1000+ord(ch) back to ASCII via one bfrange, plus bfchar entries
    for 'é' (0x0001) and the right single quote (0x0002), so
    extraction must actually WALK the CMap to recover the text."""

    def enc(line: str) -> bytes:
        codes = []
        for ch in line:
            if ch == "é":
                codes.append(1)
            elif ch == "’":
                codes.append(2)
            else:
                codes.append(0x1000 + ord(ch))
        return "".join(f"{c:04X}" for c in codes).encode()

    cmap = (
        b"/CIDInit /ProcSet findresource begin\n"
        b"12 dict begin\nbegincmap\n"
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        b"2 beginbfchar\n<0001> <00E9>\n<0002> <2019>\nendbfchar\n"
        b"1 beginbfrange\n<1020> <107E> <0020>\nendbfrange\n"
        b"endcmap\nend\nend\n"
    )
    cstm = zlib.compress(cmap, 6) if flate else cmap
    cfilt = " /Filter /FlateDecode" if flate else ""
    objs: list[bytes] = []
    streams: list[bytes | None] = []
    first_page = 5
    kids = " ".join(
        f"{first_page + 2 * p} 0 R" for p in range(len(pages))
    )
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    streams.append(None)
    objs.append(
        (
            f"<< /Type /Pages /Kids [{kids}] /Count {len(pages)} >>"
        ).encode()
    )
    streams.append(None)
    objs.append(
        b"<< /Type /Font /Subtype /Type0 /BaseFont /SISFake "
        b"/Encoding /Identity-H /ToUnicode 4 0 R >>"
    )
    streams.append(None)
    objs.append(f"<< /Length {len(cstm)}{cfilt} >>".encode())
    streams.append(cstm)
    for p, lines in enumerate(pages):
        num = first_page + 2 * p
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 3 0 R >> >> "
                f"/Contents {num + 1} 0 R >>"
            ).encode()
        )
        streams.append(None)
        ops = [b"BT /F1 12 Tf 72 720 Td"]
        for li, line in enumerate(lines):
            if li:
                ops.append(b"T*")
            ops.append(b"<" + enc(line) + b"> Tj")
        ops.append(b"ET")
        content = b" ".join(ops)
        if flate:
            content = zlib.compress(content, 6)
            objs.append(
                (
                    f"<< /Length {len(content)} /Filter /FlateDecode >>"
                ).encode()
            )
        else:
            objs.append(f"<< /Length {len(content)} >>".encode())
        streams.append(content)
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, obj in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + obj
        s = streams[i - 1]
        if s is not None:
            out += b"\nstream\n" + s + b"\nendstream"
        out += b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)
