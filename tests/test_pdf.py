"""PDF text extraction (r11): parser subset, escape/hex/TJ string
syntax, documented gates, fixture roundtrip, and the WARC dead-letter
integration."""

from __future__ import annotations

import zlib

import pytest

from scicat_ingestor_spark.operators import pdf, warc


def test_make_pdf_roundtrip_flate_and_plain():
    pages = [["hello world", "line (two) with \\ specials"],
             ["page two"]]
    for flate in (True, False):
        buf = pdf.make_pdf(pages, flate=flate)
        assert buf.startswith(b"%PDF-") and buf.rstrip().endswith(b"%%EOF")
        text, n = pdf.pdf_text(buf)
        assert n == 2
        assert text == (
            "hello world\nline (two) with \\ specials\npage two"
        )


def test_content_text_operators():
    """Tj, TJ arrays (kerning ignored), ' and \" next-line shows,
    Td/TD/T* line breaks, hex strings, comments."""
    content = (
        b"BT /F1 12 Tf 72 720 Td "
        b"[(ker) -120 (ned)] TJ T* "
        b"<48656C6C6F> Tj "
        b"(quoted)' "
        b"% a comment (not text) Tj\n"
        b"0 -14 TD (after td) Tj ET"
    )
    assert pdf.content_text(content) == [
        "kerned", "Hello", "quoted", "after td",
    ]


def test_literal_string_escapes():
    content = b"BT ( \\110i\\t\\(x\\)\\\\ \\n) Tj ET"
    assert pdf.content_text(content) == [" Hi\t(x)\\ \n"]
    # line continuation: backslash-newline vanishes
    assert pdf.content_text(b"BT (ab\\\ncd) Tj ET") == ["abcd"]
    # nested balanced parens need no escape
    assert pdf.content_text(b"BT (a(b)c) Tj ET") == ["a(b)c"]


def test_strings_outside_bt_et_ignored():
    assert pdf.content_text(b"(not shown) Tj BT (shown) Tj ET") == [
        "shown"
    ]


def test_gates_raise_value_error():
    with pytest.raises(ValueError, match="%PDF- header"):
        pdf.pdf_text(b"GIF89a not a pdf")
    with pytest.raises(ValueError, match="encrypted"):
        pdf.pdf_text(b"%PDF-1.4\ntrailer << /Encrypt 9 0 R >>")
    with pytest.raises(ValueError, match="unsupported filter"):
        pdf.pdf_objects(
            b"%PDF-1.4\n1 0 obj\n<< /Length 3 /Filter /LZWDecode >>\n"
            b"stream\nabc\nendstream\nendobj\n"
        )
    with pytest.raises(ValueError, match="no pages"):
        pdf.pdf_text(b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog >>\nendobj\n")
    with pytest.raises(ValueError, match="missing content stream"):
        pdf.pdf_text(
            b"%PDF-1.4\n1 0 obj\n"
            b"<< /Type /Page /Contents 7 0 R >>\nendobj\n"
        )
    with pytest.raises(ValueError, match="bad FlateDecode"):
        pdf.pdf_objects(
            b"%PDF-1.4\n1 0 obj\n"
            b"<< /Length 4 /Filter /FlateDecode >>\n"
            b"stream\n\xff\xff\xff\xff\nendstream\nendobj\n"
        )


def test_contents_array_multiple_streams():
    raw1 = b"BT (part one) Tj ET"
    raw2 = b"BT (part two) Tj ET"
    buf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Page /Contents [2 0 R 3 0 R] >>\nendobj\n"
        + b"2 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        % (len(raw1), raw1)
        + b"3 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        % (len(raw2), raw2)
    )
    assert pdf.pdf_text(buf) == ("part one\npart two", 1)


def test_incremental_update_later_object_wins():
    raw_old = b"BT (old) Tj ET"
    raw_new = b"BT (new) Tj ET"
    buf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Page /Contents 2 0 R >>\nendobj\n"
        + b"2 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        % (len(raw_old), raw_old)
        + b"2 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        % (len(raw_new), raw_new)
    )
    assert pdf.pdf_text(buf)[0] == "new"


def test_mutation_fuzz_never_raises_foreign():
    """Random single-byte mutations / truncations: pdf_text either
    returns or raises ValueError — never another exception (the WARC
    dead-letter channel catches exactly ValueError)."""
    import random

    rng = random.Random(20260816)
    base = pdf.make_pdf([["fuzz target text", "second line"]])
    for trial in range(300):
        buf = bytearray(base)
        if trial % 3 == 0:
            buf = buf[: rng.randrange(1, len(buf))]
        elif trial % 3 == 1:
            buf[rng.randrange(len(buf))] ^= 1 << rng.randrange(8)
        else:
            pos = rng.randrange(len(buf))
            buf = buf[:pos] + bytes([rng.randrange(256)]) * 3 + buf[pos:]
        try:
            pdf.pdf_text(bytes(buf))
        except ValueError:
            pass


def test_warc_pdf_dead_letter_integration(spark):
    """A good PDF response extracts through warc_response_rows; an
    encrypted one dead-letters THAT record only."""
    good = pdf.make_pdf([["good body"]])
    bad = pdf.make_pdf([["secret"]]) + b"trailer\n<< /Encrypt 9 0 R >>\n"
    recs = [
        warc.make_warc_record(
            "response",
            warc.make_http_response(good, "application/pdf"),
            target_uri="https://p.example/good.pdf",
            content_type="application/http;msgtype=response",
        ),
        warc.make_warc_record(
            "response",
            warc.make_http_response(bad, "application/pdf"),
            target_uri="https://p.example/bad.pdf",
            content_type="application/http;msgtype=response",
        ),
    ]
    df = spark.createDataFrame(
        [(1, warc.make_warc(recs))], "media_id long, payload binary"
    )
    rows = {r["url"]: r for r in warc.warc_response_rows(df).collect()}
    g = rows["https://p.example/good.pdf"]
    assert g["text"] == "good body" and g["error"] is None
    assert g["charset"] == "pdf"
    b = rows["https://p.example/bad.pdf"]
    assert b["text"] is None
    assert "encrypted" in b["error"]


def test_objstm_modern_layout_roundtrip():
    """PDF 1.5 object-stream layout: page dicts inside /Type /ObjStm,
    xref STREAM with type-2 entries — extraction must find the pages
    through the expanded members."""
    pages = [["modern one", "line two"], ["page 2"]]
    for flate in (True, False):
        buf = pdf.make_pdf_objstm(pages, flate=flate)
        assert b"/ObjStm" in buf and b"/XRef" in buf
        assert pdf.pdf_text(buf) == ("modern one\nline two\npage 2", 2)


def test_objstm_gates():
    import zlib as _z

    bad = (
        b"%PDF-1.5\n1 0 obj\n"
        b"<< /Type /ObjStm /N 2 /First 4 /Length 6 >>\n"
        b"stream\nxx yy\nendstream\nendobj\n"
    )
    with pytest.raises(ValueError, match="object-stream index"):
        pdf.pdf_objects(bad)
    missing = (
        b"%PDF-1.5\n1 0 obj\n"
        b"<< /Type /ObjStm /Length 3 >>\nstream\nabc\nendstream\nendobj\n"
    )
    with pytest.raises(ValueError, match="/N or /First"):
        pdf.pdf_objects(missing)


def test_objstm_mutation_fuzz_value_error_only():
    import random

    rng = random.Random(20260817)
    base = pdf.make_pdf_objstm([["fuzz modern", "row"]])
    for trial in range(200):
        buf = bytearray(base)
        if trial % 2 == 0:
            buf = buf[: rng.randrange(1, len(buf))]
        else:
            buf[rng.randrange(len(buf))] ^= 1 << rng.randrange(8)
        try:
            pdf.pdf_text(bytes(buf))
        except ValueError:
            pass


def test_tounicode_cmap_parsing():
    cl, cm = pdf.parse_tounicode(
        b"begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"2 beginbfchar <0041> <00E9> <0042> <2019> endbfchar\n"
        b"1 beginbfrange <0100> <0102> <0061> endbfrange\n"
        b"1 beginbfrange <0200> <0201> [<0058> <0059>] endbfrange\n"
    )
    assert cl == 2
    assert cm == {
        0x41: "é", 0x42: "’",
        0x100: "a", 0x101: "b", 0x102: "c",
        0x200: "X", 0x201: "Y",
    }
    # 1-byte codespace
    cl1, _ = pdf.parse_tounicode(
        b"begincodespacerange <00> <FF> endcodespacerange"
    )
    assert cl1 == 1
    with pytest.raises(ValueError, match="oversized bfrange"):
        pdf.parse_tounicode(
            b"1 beginbfrange <0000> <FFFF0000> <0000> endbfrange"
        )


def test_cid_pdf_roundtrip_and_unmapped_codes():
    for flate in (True, False):
        buf = pdf.make_pdf_cid(
            [["doc é’ quote", "second line"], ["page 2"]], flate=flate
        )
        assert pdf.pdf_text(buf) == (
            "doc é’ quote\nsecond line\npage 2", 2
        )
    # unmapped code -> U+FFFD, never a silent wrong char
    cl, cm = pdf.parse_tounicode(
        b"1 beginbfchar <0041> <0058> endbfchar"
    )
    got = pdf.content_text(
        b"BT /F1 1 Tf <00410099> Tj ET", {"F1": (cl, cm)}
    )
    assert got == ["X�"]
    # font without a map keeps the latin-1 simple path
    assert pdf.content_text(b"BT /F9 1 Tf (abc) Tj ET", {"F1": (cl, cm)}) == [
        "abc"
    ]


def test_tf_switches_fonts_mid_stream():
    cl, cm = pdf.parse_tounicode(
        b"1 beginbfchar <0041> <005A> endbfchar"
    )
    content = (
        b"BT /F1 1 Tf <0041> Tj /F2 1 Tf (A) Tj /F1 1 Tf <0041> Tj ET"
    )
    assert pdf.content_text(content, {"F1": (cl, cm)}) == ["ZAZ"]


def test_cid_mutation_fuzz_value_error_only():
    import random

    rng = random.Random(20260818)
    base = pdf.make_pdf_cid([["cid fuzz é", "line"]])
    for trial in range(200):
        buf = bytearray(base)
        if trial % 2 == 0:
            buf = buf[: rng.randrange(1, len(buf))]
        else:
            buf[rng.randrange(len(buf))] ^= 1 << rng.randrange(8)
        try:
            pdf.pdf_text(bytes(buf))
        except ValueError:
            pass
