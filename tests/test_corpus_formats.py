"""Notebook extraction (`operators/notebook_text.py`), email cleanup
(`operators/email_text.py`), and attribute-row XML ingestion
(`sources/xml_rows.py`): per-rule contract coverage, quarantine
channels, and the JVM-only plan contract for the email family."""

from __future__ import annotations

import json

import pytest

from soda_spark_spark.operators.email_text import (
    email_features,
    email_strip_quotes,
)
from soda_spark_spark.operators.notebook_text import (
    ipynb_cells,
    notebook_cells,
)
from soda_spark_spark.sources.xml_rows import (
    read_xml_rows,
    write_xml_rows,
)


def _nb4(cells):
    return json.dumps(dict(nbformat=4, cells=cells)).encode()


def test_ipynb_v4_source_shapes_and_outputs_excluded():
    nb = _nb4([
        dict(cell_type="code", source=["x = 1\n", "y = 2\n"],
             outputs=[dict(text="IGNORED")]),
        dict(cell_type="markdown", source="# Title"),
        dict(cell_type="raw", source=[]),
    ])
    cells = ipynb_cells(nb)
    assert [c["cell_type"] for c in cells] == ["code", "markdown", "raw"]
    assert cells[0]["text"] == "x = 1\ny = 2\n"
    assert cells[1]["text"] == "# Title"
    assert cells[2]["text"] == ""
    assert [c["cell_index"] for c in cells] == [0, 1, 2]


def test_ipynb_v3_worksheets_and_heading():
    nb = json.dumps(dict(
        nbformat=3,
        worksheets=[dict(cells=[
            dict(cell_type="code", input=["print(1)"]),
            dict(cell_type="heading", level=2, source=["Sec"]),
        ])],
    )).encode()
    cells = ipynb_cells(nb)
    assert cells[0] == dict(cell_index=0, cell_type="code",
                            text="print(1)")
    assert cells[1]["cell_type"] == "markdown"
    assert cells[1]["text"] == "## Sec"


@pytest.mark.parametrize("bad", [
    b"not json", b"[1,2]", b"{}",
    json.dumps(dict(cells=[dict(no_type=1)])).encode(),
    json.dumps(dict(cells=[dict(cell_type="code", source=123)])).encode(),
    b"\xff\xfe junk",
])
def test_ipynb_malformed_raises(bad):
    with pytest.raises(ValueError):
        ipynb_cells(bad)


def test_notebook_cells_dataframe_and_quarantine(spark):
    rows = [
        (1, bytearray(_nb4([
            dict(cell_type="code", source="a=1"),
            dict(cell_type="markdown", source="t"),
        ]))),
        (2, bytearray(b"broken")),
    ]
    df = spark.createDataFrame(rows, "doc long, payload binary")
    out = notebook_cells(df, "doc", "payload").collect()
    got = sorted(
        (r.id, r.cell_index, r.cell_type, r.text, r.error is None)
        for r in out
    )
    assert got[0] == (1, 0, "code", "a=1", True)
    assert got[1] == (1, 1, "markdown", "t", True)
    assert got[2][0] == 2 and got[2][4] is False


EMAIL = (
    "Thanks for the patch!\n"
    "\n"
    "On Mon, Jan 4 2021, Sam wrote:\n"
    "> the old body\n"
    ">> even older\n"
    "  > indented quote\n"
    "New content here.\n"
    "-- \n"
    "Sam Example\n"
    "sam@example.com"
)


def test_email_strip_quotes_rules(spark):
    df = spark.createDataFrame([(1, EMAIL), (2, None)],
                               "id long, text string")
    out = {r.id: r.text
           for r in email_strip_quotes(df, "text").collect()}
    assert out[1] == "Thanks for the patch!\n\nNew content here."
    assert out[2] is None


def test_email_sent_from_and_no_signature(spark):
    msg = "Body line\nSent from my iPhone"
    df = spark.createDataFrame([(1, msg)], "id long, text string")
    assert email_strip_quotes(df, "text").collect()[0].text == (
        "Body line"
    )
    # a '--' line WITHOUT the trailing space is not a delimiter
    msg2 = "a\n--\nb"
    df2 = spark.createDataFrame([(1, msg2)], "id long, text string")
    assert email_strip_quotes(df2, "text").collect()[0].text == msg2


def test_email_features(spark):
    df = spark.createDataFrame([(1, EMAIL)], "id long, text string")
    r = email_features(df, "text").collect()[0]
    assert r.n_lines == 10
    assert r.has_signature
    assert r.n_attributions == 1
    assert abs(r.quoted_frac - 3 / 10) < 1e-12


def test_email_ops_stay_jvm_side(spark):
    df = spark.createDataFrame([(1, EMAIL)], "id long, text string")
    out = email_features(email_strip_quotes(df, "text", "clean"),
                         "text")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_read_xml_rows_roundtrip(spark, tmp_path):
    rows = [
        dict(Id=1, PostTypeId=1, Body="<p>hello</p>", Score=5),
        dict(Id=2, PostTypeId=2, Body="<p>answer &amp; more</p>"),
    ]
    for comp, name in ((None, "a.xml"), ("bz2", "b.xml.bz2"),
                       ("gzip", "c.xml.gz")):
        write_xml_rows(rows, str(tmp_path / name), compress=comp)
    df = read_xml_rows(spark, str(tmp_path / "*"))
    got = df.collect()
    assert len(got) == 6
    by_key = {(r.file.rsplit("/", 1)[-1], r.row_index): r.attrs
              for r in got}
    a = by_key[("b.xml.bz2", 0)]
    assert a["Id"] == "1" and a["Score"] == "5"
    # quoteattr escapes on write, iterparse unescapes on read — the
    # attribute value round-trips byte-identically
    assert by_key[("c.xml.gz", 1)]["Body"] == "<p>answer &amp; more</p>"
    assert by_key[("a.xml", 0)]["Body"] == "<p>hello</p>"


def test_read_xml_rows_quarantine(spark, tmp_path):
    (tmp_path / "bad.xml").write_bytes(b"<posts><row Id='1'")
    rows = read_xml_rows(spark, str(tmp_path / "bad.xml")).collect()
    assert len(rows) == 1 and rows[0].error is not None
    assert rows[0].attrs is None


def test_curate_projection_steps(spark):
    """The three session-2 projection steps run inside curate() as
    in-place text rewrites, chainable with gates."""
    from soda_spark_spark.pipeline import curate

    rows = [
        (1, "# Title\n**bold** body"),
        (2, "'''wiki''' [[a|b]] {{tpl}}"),
        (3, "keep\n> quoted\n-- \nsig"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    md, _ = curate(df.filter("doc_id = 1"), [{"kind": "markdown_strip"}])
    assert md.collect()[0].text == "Title\nbold body"
    wt, _ = curate(df.filter("doc_id = 2"), [{"kind": "wikitext_strip"}])
    assert wt.collect()[0].text == "wiki b"
    em, _ = curate(df.filter("doc_id = 3"), [{"kind": "email_strip"}])
    assert em.collect()[0].text == "keep"
    # chains with a gate: strip first, then the length gate sees the
    # stripped text
    both, _ = curate(
        df.filter("doc_id = 3"),
        [{"kind": "email_strip"}, {"kind": "length_filter",
                                   "min_chars": 1}],
    )
    assert both.count() == 1
