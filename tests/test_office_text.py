"""Office/ebook text extraction (`operators/office_text.py`):
writer/parser round trips for DOCX (WordprocessingML), EPUB
(OCF/OPF/spine), and RTF (groups, escapes, destinations), the
quarantine contract (OLE/CFB, DRM, bad zip, malformed XML), and the
Spark operators' error channel."""

from __future__ import annotations

import io
import zipfile

import pytest

from soda_spark_spark.operators.office_text import (
    docx_text,
    docx_to_text,
    epub_to_text,
    rtf_to_text,
    write_simple_docx,
    write_simple_epub,
    write_simple_rtf,
)

_OLE = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 24


# ------------------------------------------------------------------- DOCX


def test_docx_roundtrip_escapes_tabs_breaks():
    paras = [
        "Hello world & <tags> \"quoted\"",
        "Tab\there and\tthere",
        "Break\nwithin a paragraph",
        "",
    ]
    assert docx_to_text(write_simple_docx(paras)) == "\n".join(paras)


def test_docx_writer_is_deterministic():
    assert write_simple_docx(["a", "b"]) == write_simple_docx(["a", "b"])


def test_docx_table_cells_linearize():
    ns = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    doc = (
        f'<w:document xmlns:w="{ns}"><w:body>'
        "<w:tbl><w:tr>"
        "<w:tc><w:p><w:r><w:t>cell one</w:t></w:r></w:p></w:tc>"
        "<w:tc><w:p><w:r><w:t>cell two</w:t></w:r></w:p></w:tc>"
        "</w:tr></w:tbl>"
        "<w:p><w:r><w:t>after table</w:t></w:r></w:p>"
        "</w:body></w:document>"
    ).encode()
    base = write_simple_docx(["x"])
    buf = io.BytesIO()
    with zipfile.ZipFile(io.BytesIO(base)) as zin, \
            zipfile.ZipFile(buf, "w") as zout:
        for name in zin.namelist():
            data = doc if name == "word/document.xml" else zin.read(name)
            zout.writestr(name, data)
    assert docx_to_text(buf.getvalue()) == "cell one\ncell two\nafter table"


def test_docx_quarantines():
    with pytest.raises(NotImplementedError, match="OLE"):
        docx_to_text(_OLE)
    with pytest.raises(ValueError, match="ZIP"):
        docx_to_text(b"not a zip at all")
    # a valid zip that is not a DOCX
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("other.txt", "hi")
    with pytest.raises(ValueError, match="document.xml"):
        docx_to_text(buf.getvalue())
    # malformed XML inside
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", "<w:document><unclosed")
    with pytest.raises(ValueError, match="malformed"):
        docx_to_text(buf.getvalue())
    # truncated zip (valid magic, bad central directory)
    with pytest.raises(ValueError, match="ZIP"):
        docx_to_text(write_simple_docx(["x"])[:40])


# ------------------------------------------------------------------- EPUB


def test_epub_roundtrip_and_chapter_order():
    e = write_simple_epub(
        [("Chapter One", "First para\nSecond para"), ("Two", "Body")]
    )
    assert epub_to_text(e) == (
        "Chapter One\nFirst para\nSecond para\n\nTwo\nBody"
    )


def test_epub_spine_order_overrides_manifest_order():
    # build an epub, then swap the spine to reverse reading order
    e = write_simple_epub([("A", "first"), ("B", "second")])
    buf = io.BytesIO()
    with zipfile.ZipFile(io.BytesIO(e)) as zin, \
            zipfile.ZipFile(buf, "w") as zout:
        for name in zin.namelist():
            data = zin.read(name)
            if name == "OEBPS/content.opf":
                data = data.replace(
                    b'<itemref idref="c0"/><itemref idref="c1"/>',
                    b'<itemref idref="c1"/><itemref idref="c0"/>',
                )
            zout.writestr(name, data)
    assert epub_to_text(buf.getvalue()) == "B\nsecond\n\nA\nfirst"


def test_epub_drm_quarantines():
    e = write_simple_epub([("A", "x")])
    buf = io.BytesIO()
    with zipfile.ZipFile(io.BytesIO(e)) as zin, \
            zipfile.ZipFile(buf, "w") as zout:
        for name in zin.namelist():
            zout.writestr(name, zin.read(name))
        zout.writestr("META-INF/encryption.xml", "<encryption/>")
    with pytest.raises(NotImplementedError, match="DRM"):
        epub_to_text(buf.getvalue())


def test_epub_missing_parts_quarantine():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/epub+zip")
    with pytest.raises(ValueError, match="container.xml"):
        epub_to_text(buf.getvalue())
    # spine item names a file the zip doesn't carry
    e = write_simple_epub([("A", "x")])
    buf = io.BytesIO()
    with zipfile.ZipFile(io.BytesIO(e)) as zin, \
            zipfile.ZipFile(buf, "w") as zout:
        for name in zin.namelist():
            if name.endswith(".xhtml"):
                continue
            zout.writestr(name, zin.read(name))
    with pytest.raises(ValueError, match="missing"):
        epub_to_text(buf.getvalue())


# -------------------------------------------------------------------- RTF


def test_rtf_roundtrip_escape_families():
    paras = [
        "Hello {braced} \\ back",
        "naïve café — em– dash",  # cp1252 \'xx escapes
        "Ünïcode € and ©",
        "Tab\tand\nline",
    ]
    assert rtf_to_text(write_simple_rtf(paras)) == "\n".join(paras)


def test_rtf_unicode_beyond_cp1252_uses_u_escape():
    s = "Greek: αβγ"
    assert rtf_to_text(write_simple_rtf([s])) == s


def test_rtf_destinations_skipped():
    rtf = (
        b"{\\rtf1\\ansi"
        b"{\\fonttbl{\\f0 Times New Roman;}}"
        b"{\\colortbl;\\red0\\green0\\blue0;}"
        b"{\\info{\\author Secret Name}}"
        b"{\\*\\generator Acme Writer 9.1;}"
        b"visible text"
        b"{\\pict 0011223344}"
        b" tail}"
    )
    assert rtf_to_text(rtf) == "visible text tail"


def test_rtf_field_instruction_skipped_result_kept():
    rtf = (
        b"{\\rtf1 before {\\field{\\*\\fldinst HYPERLINK \"x\"}"
        b"{\\fldrslt shown link}} after}"
    )
    assert rtf_to_text(rtf) == "before shown link after"


def test_rtf_uc0_and_bin():
    # uc0: \uN with NO fallback char to swallow
    assert rtf_to_text(b"{\\rtf1\\uc0 a\\u8364 b}") == "a€b"
    # \binN swallows N raw bytes — INCLUDING brace bytes that would
    # otherwise close the group
    assert rtf_to_text(b"{\\rtf1 x{\\pict\\bin4 }}AB}y}") == "xy"


def test_rtf_negative_unicode_and_nbsp():
    assert rtf_to_text(b"{\\rtf1 \\u-3825?z}") == "z"
    assert rtf_to_text(b"{\\rtf1 a\\~b}") == "a b"


def test_rtf_not_rtf_raises():
    with pytest.raises(ValueError, match="RTF"):
        rtf_to_text(b"plain text")


def test_rtf_raw_crlf_ignored():
    assert rtf_to_text(b"{\\rtf1 one\r\ntwo}") == "onetwo"


# ------------------------------------------------------------------ Router


def test_sniff_and_route_all_formats():
    from soda_spark_spark.operators.office_text import (
        any_document_to_text,
        sniff_document_format,
    )
    from soda_spark_spark.operators.pdf_text import write_simple_pdf

    cases = {
        "pdf": write_simple_pdf(["routed pdf"]),
        "docx": write_simple_docx(["routed docx"]),
        "epub": write_simple_epub([("T", "routed epub")]),
        "rtf": write_simple_rtf(["routed rtf"]),
        "html": b"<html><body><p>routed html</p></body></html>",
        "txt": "routed txt é".encode(),
    }
    for fmt, payload in cases.items():
        assert sniff_document_format(payload) == fmt, fmt
        got_fmt, text = any_document_to_text(payload)
        assert got_fmt == fmt
        assert "routed" in text, (fmt, text)
    # epub routing keeps the chapter structure
    assert any_document_to_text(cases["epub"])[1] == "T\nrouted epub"
    # BOM'd text and markup still route
    assert sniff_document_format(b"\xef\xbb\xbfplain") == "txt"
    assert sniff_document_format(b"\xef\xbb\xbf  <p>x</p>") == "html"


def test_sniff_and_route_session2_formats():
    """Round-16 session-2 sniff arms: notebooks, SRT, WebVTT — and
    the rule that plain JSON without notebook keys stays txt."""
    import json

    from soda_spark_spark.operators.office_text import (
        any_document_to_text,
        sniff_document_format,
    )

    nb = json.dumps(dict(
        cells=[dict(cell_type="code", source=["routed = 1"]),
               dict(cell_type="markdown", source="routed md")],
        nbformat=4,
    )).encode()
    assert sniff_document_format(nb) == "ipynb"
    fmt, text = any_document_to_text(nb)
    assert fmt == "ipynb" and text == "routed = 1\n\nrouted md"

    srt = b"1\n00:00:01,000 --> 00:00:02,000\nrouted cue\n"
    assert sniff_document_format(srt) == "srt"
    assert any_document_to_text(srt) == ("srt", "routed cue")

    vtt = b"WEBVTT\n\n00:01.000 --> 00:02.000\nrouted vtt\n"
    assert sniff_document_format(vtt) == "vtt"
    assert any_document_to_text(vtt) == ("vtt", "routed vtt")

    # plain JSON is NOT a notebook
    assert sniff_document_format(b'{"key": "value"}') == "txt"


def test_router_quarantines():
    from soda_spark_spark.operators.office_text import (
        any_document_to_text,
        sniff_document_format,
    )

    with pytest.raises(NotImplementedError, match="OLE"):
        any_document_to_text(_OLE)
    with pytest.raises(NotImplementedError, match="unknown"):
        any_document_to_text(b"\x00\x01\x02\xff binary noise")
    # a zip that is neither docx nor epub is unknown, not misrouted
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("data.bin", b"\x00")
    assert sniff_document_format(buf.getvalue()) is None


def test_document_text_any_operator(spark):
    from soda_spark_spark.operators.office_text import document_text_any
    from soda_spark_spark.operators.pdf_text import write_simple_pdf

    rows = [
        (1, bytearray(write_simple_pdf(["pdf body"]))),
        (2, bytearray(write_simple_docx(["docx body"]))),
        (3, bytearray(write_simple_rtf(["rtf body"]))),
        (4, bytearray(b"<p>html body</p>")),
        (5, bytearray(_OLE)),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    out = {r.id: r for r in document_text_any(df, "id", "payload").collect()}
    assert [out[i].format for i in (1, 2, 3, 4)] == [
        "pdf", "docx", "rtf", "html",
    ]
    assert out[1].text == "pdf body"
    assert out[4].text == "html body"
    assert out[5].format == "ole" and out[5].error is not None


def test_router_transparent_compression_and_bomb_guard():
    import bz2
    import gzip
    import lzma

    from soda_spark_spark.operators.office_text import (
        any_document_to_text,
        decompress_payload,
    )

    rtf = write_simple_rtf(["compressed doc"])
    for wrap in (gzip.compress, bz2.compress, lzma.compress):
        assert any_document_to_text(wrap(rtf)) == ("rtf", "compressed doc")
    # non-compressed payloads pass through unchanged
    assert decompress_payload(rtf) == rtf
    # the bomb guard quarantines before materializing the overflow
    bomb = gzip.compress(b"\x00" * 1_000_000)
    with pytest.raises(ValueError, match="bomb"):
        decompress_payload(bomb, limit=100_000)
    # truncated and corrupt streams quarantine with honest errors
    with pytest.raises(ValueError, match="truncated"):
        decompress_payload(gzip.compress(rtf)[:-4])
    with pytest.raises(ValueError, match="bad gzip"):
        decompress_payload(b"\x1f\x8b" + b"\xff" * 16)


# ---------------------------------------------------------- Spark operator


def test_docx_text_operator_quarantine_channel(spark):
    rows = [
        (1, bytearray(write_simple_docx(["alpha", "beta"]))),
        (2, bytearray(_OLE)),
        (3, bytearray(b"junk bytes")),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    out = {r.id: r for r in docx_text(df, "id", "payload").collect()}
    assert out[1].text == "alpha\nbeta"
    assert out[1].n_chars == 10 and out[1].error is None
    assert out[2].text is None and "OLE" in out[2].error
    assert out[3].text is None and out[3].error is not None
    assert out[4].text is None and out[4].error is not None


def test_xlsx_cells_and_text():
    from soda_spark_spark.operators.office_text import (
        any_document_to_text,
        sniff_document_format,
        write_simple_xlsx,
        xlsx_to_cells,
        xlsx_to_text,
    )

    x = write_simple_xlsx([
        ("Data", [["name", "qty"], ["apple", "3"], ["pear & co", "12"]]),
        ("Meta", [["note only"]]),
    ])
    assert sniff_document_format(x) == "xlsx"
    cells = xlsx_to_cells(x)
    # shared-string and number paths both resolve; refs/rows tracked
    assert cells[0] == dict(sheet="Data", row=1, cell_ref="A1",
                            value="name")
    assert cells[3] == dict(sheet="Data", row=2, cell_ref="B2",
                            value="3")
    txt = xlsx_to_text(x)
    assert txt == (
        "Data\nname\tqty\napple\t3\npear & co\t12\nMeta\nnote only"
    )
    assert any_document_to_text(x) == ("xlsx", txt)


def test_xlsx_inline_bool_and_bad_shared_index():
    import io
    import zipfile

    import pytest as _pytest

    from soda_spark_spark.operators.office_text import (
        write_simple_xlsx,
        xlsx_to_cells,
    )

    # hand-build a sheet with inlineStr and boolean cells
    base = write_simple_xlsx([("S", [["seed"]])])
    buf = io.BytesIO()
    with zipfile.ZipFile(io.BytesIO(base)) as zin, \
            zipfile.ZipFile(buf, "w") as zout:
        for item in zin.infolist():
            data = zin.read(item.filename)
            if item.filename == "xl/worksheets/sheet1.xml":
                data = data.replace(
                    b"</sheetData>",
                    b'<row r="2"><c r="A2" t="inlineStr"><is><t>inl'
                    b"</t></is></c>"
                    b'<c r="B2" t="b"><v>1</v></c></row></sheetData>',
                )
            zout.writestr(item, data)
    cells = xlsx_to_cells(buf.getvalue())
    vals = {c["cell_ref"]: c["value"] for c in cells}
    assert vals["A2"] == "inl" and vals["B2"] == "TRUE"
    # corrupt shared index quarantines (rebuild the member — the
    # sheet XML is deflated, raw byte replace can't reach it)
    buf2 = io.BytesIO()
    with zipfile.ZipFile(io.BytesIO(base)) as zin, \
            zipfile.ZipFile(buf2, "w") as zout:
        for item in zin.infolist():
            data = zin.read(item.filename)
            if item.filename == "xl/worksheets/sheet1.xml":
                data = data.replace(b"<v>0</v>", b"<v>99</v>")
            zout.writestr(item, data)
    with _pytest.raises(ValueError, match="shared-string"):
        xlsx_to_cells(buf2.getvalue())


def test_pptx_text_and_slide_order():
    from soda_spark_spark.operators.office_text import (
        any_document_to_text,
        pptx_to_text,
        sniff_document_format,
        write_simple_pptx,
    )

    p = write_simple_pptx([["Title one", "bullet a"], ["Second"]])
    assert sniff_document_format(p) == "pptx"
    assert pptx_to_text(p) == "Title one\nbullet a\nSecond"
    assert any_document_to_text(p)[0] == "pptx"
    # empty paragraphs drop
    p2 = write_simple_pptx([["", "  ", "kept"]])
    assert pptx_to_text(p2) == "kept"


def test_xlsx_absolute_rel_target_resolves():
    """Some producers emit package-rooted rel targets
    ('/xl/worksheets/sheet1.xml'); they must not double the xl/
    prefix."""
    import io
    import zipfile

    from soda_spark_spark.operators.office_text import (
        write_simple_xlsx,
        xlsx_to_cells,
    )

    base = write_simple_xlsx([("S", [["val"]])])
    buf = io.BytesIO()
    with zipfile.ZipFile(io.BytesIO(base)) as zin, \
            zipfile.ZipFile(buf, "w") as zout:
        for item in zin.infolist():
            data = zin.read(item.filename)
            if item.filename == "xl/_rels/workbook.xml.rels":
                data = data.replace(
                    b'Target="worksheets/sheet1.xml"',
                    b'Target="/xl/worksheets/sheet1.xml"',
                )
            zout.writestr(item, data)
    cells = xlsx_to_cells(buf.getvalue())
    assert cells == [dict(sheet="S", row=1, cell_ref="A1",
                          value="val")]
