"""PDF text-layer extraction (`operators/pdf_text.py`): writer/parser
round trips over the escape set and both stream encodings, operator
syntax coverage (TJ arrays with kerning word-spaces, quote operators,
hex strings), quarantine paths (encryption, CID fonts, unsupported
filters), and the Spark operator's error channel."""

from __future__ import annotations

import zlib

import pytest

from soda_spark_spark.operators.pdf_text import (
    pdf_text,
    pdf_to_text,
    write_simple_pdf,
)


def test_roundtrip_escapes_and_pages():
    pages = [
        "Hello, PDF world!\nSecond line (with parens) and \\ backslash.",
        "Page two: naïve café, high bytes ÿ and (deep (nesting)).",
    ]
    for compress in (True, False):
        p = write_simple_pdf(pages, compress=compress)
        assert pdf_to_text(p) == "\n".join(pages)


def test_roundtrip_trailing_spaces_rstripped():
    p = write_simple_pdf(["line one   \nline two\t x"])
    # \t is not Latin-1-problematic but IS below 0x20: the decoder
    # maps it to U+FFFD (visible mojibake, not silent loss)
    t = pdf_to_text(p)
    assert t.split("\n")[0] == "line one"
    assert "�" in t.split("\n")[1]


def test_tj_array_kerning_word_space():
    content = b"BT /F1 11 Tf [ (Hel) -50 (lo) -250 (world) ] TJ ET"
    z = zlib.compress(content)
    pdf = b"%PDF-1.4\n" + (
        b"1 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n"
        % len(z)
    ) + z + b"\nendstream\nendobj\n%%EOF"
    assert pdf_to_text(pdf) == "Hel" + "lo" + " " + "world"


def test_quote_operators_and_hex_strings():
    content = (
        b"BT /F1 11 Tf (first) Tj (second) ' "
        b"<48 65 78> Tj 0 -14 Td (moved) Tj ET"
    )
    pdf = b"%PDF-1.4\n" + (
        b"1 0 obj\n<< /Length %d >>\nstream\n" % len(content)
    ) + content + b"\nendstream\nendobj\n%%EOF"
    t = pdf_to_text(pdf)
    assert t == "first\nsecondHex\nmoved"


def test_no_text_layer_is_empty_not_error():
    pdf = b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog >>\nendobj\n%%EOF"
    assert pdf_to_text(pdf) == ""


def test_encrypted_quarantines():
    p = bytearray(write_simple_pdf(["secret"]))
    i = p.find(b"trailer\n<<")
    p[i:i + 10] = b"trailer\n<< /Encrypt 9 0 R >>"[:10]
    p = p[:i] + b"trailer\n<< /Encrypt 9 0 R >>" + p[i + 10:]
    with pytest.raises(NotImplementedError, match="encrypted"):
        pdf_to_text(bytes(p))


def test_cid_font_quarantines():
    font = b"<< /Type /Font /Subtype /Type0 /BaseFont /X-Identity-H >>"
    content = b"BT /F1 11 Tf (\x00H\x00i) Tj ET"
    pdf = (
        b"%PDF-1.4\n"
        b"3 0 obj\n" + font + b"\nendobj\n"
        b"4 0 obj\n<< /Type /Page /Resources << /Font << /F1 3 0 R >> "
        b">> >>\nendobj\n"
        + (b"5 0 obj\n<< /Length %d >>\nstream\n" % len(content))
        + content + b"\nendstream\nendobj\n%%EOF"
    )
    with pytest.raises(NotImplementedError, match="CID"):
        pdf_to_text(pdf)


def test_unsupported_text_filter_skipped_image_ok():
    """A DCTDecode IMAGE stream must not fail the document; only text
    content streams matter."""
    jpeg_like = b"\xff\xd8\xff\xe0 fake BT not really ET"
    content = b"BT /F1 9 Tf (visible) Tj ET"
    pdf = (
        b"%PDF-1.4\n"
        + (b"7 0 obj\n<< /Length %d /Filter /DCTDecode >>\nstream\n"
           % len(jpeg_like))
        + jpeg_like + b"\nendstream\nendobj\n"
        + (b"8 0 obj\n<< /Length %d >>\nstream\n" % len(content))
        + content + b"\nendstream\nendobj\n%%EOF"
    )
    assert pdf_to_text(pdf) == "visible"


def test_not_a_pdf_raises():
    with pytest.raises(ValueError, match="header"):
        pdf_to_text(b"GARBAGE")


def test_writer_rejects_non_latin1():
    with pytest.raises(ValueError, match="Latin-1"):
        write_simple_pdf(["em dash — here"])


def test_pdf_text_operator_quarantine_channel(spark):
    good = write_simple_pdf(["alpha\nbeta"])
    enc = good.replace(b"trailer\n<<", b"trailer\n<< /Encrypt 9 0 R")
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(enc)), (3, None),
         (4, bytearray(b"not a pdf"))],
        "id long, payload binary",
    )
    out = {r.id: r for r in pdf_text(df, "id", "payload").collect()}
    assert out[1].text == "alpha\nbeta" and out[1].n_chars == 10
    assert out[1].error is None
    assert out[2].text is None and "encrypted" in out[2].error
    assert out[3].error is not None
    assert out[4].error is not None


def test_objstm_unpacked_cid_font_still_quarantines():
    """PDF 1.5 compressed object streams: a Type0 font dictionary
    hidden inside an /ObjStm must still trigger the CID quarantine."""
    inner = (
        b"<< /Type /Font /Subtype /Type0 /BaseFont /Hidden >>"
        b"<< /Type /Page /Resources << /Font << /F1 3 0 R >> >> >>"
    )
    off2 = len(b"<< /Type /Font /Subtype /Type0 /BaseFont /Hidden >>")
    header = b"3 0 4 %d " % off2
    data = header + inner
    z = zlib.compress(data)
    content = b"BT /F1 11 Tf (\x00H\x00i) Tj ET"
    pdf = (
        b"%PDF-1.5\n"
        + (b"2 0 obj\n<< /Type /ObjStm /N 2 /First %d /Length %d "
           b"/Filter /FlateDecode >>\nstream\n" % (len(header), len(z)))
        + z + b"\nendstream\nendobj\n"
        + (b"5 0 obj\n<< /Length %d >>\nstream\n" % len(content))
        + content + b"\nendstream\nendobj\n%%EOF"
    )
    with pytest.raises(NotImplementedError, match="CID"):
        pdf_to_text(pdf)


def test_objstm_text_objects_extracted():
    """Simple-font resources inside an ObjStm keep working."""
    inner = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    header = b"3 0 "
    data = header + inner
    z = zlib.compress(data)
    content = b"BT /F1 11 Tf (from objstm doc) Tj ET"
    pdf = (
        b"%PDF-1.5\n"
        + (b"2 0 obj\n<< /Type /ObjStm /N 1 /First %d /Length %d "
           b"/Filter /FlateDecode >>\nstream\n" % (len(header), len(z)))
        + z + b"\nendstream\nendobj\n"
        + (b"5 0 obj\n<< /Length %d >>\nstream\n" % len(content))
        + content + b"\nendstream\nendobj\n%%EOF"
    )
    assert pdf_to_text(pdf) == "from objstm doc"


def test_real_world_pdf_extracts():
    """A real TeX-produced manual shipped with the OS — external
    validity beyond the fixture writer's own output."""
    import os

    path = "/usr/share/doc/libtasn1-doc/libtasn1.pdf"
    if not os.path.exists(path):
        pytest.skip("sample PDF not present")
    t = pdf_to_text(open(path, "rb").read())
    assert len(t) > 10_000
    assert "Abstract Syntax Notation" in t
