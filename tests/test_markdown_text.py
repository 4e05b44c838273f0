"""Markdown -> plain text (`operators/markdown_text.py`): per-rule
coverage of the line-oriented projection contract, the fence-content
preservation, and the Spark column surface."""

from __future__ import annotations

from soda_spark_spark.operators.markdown_text import (
    markdown_strip,
    markdown_to_text,
)


def test_headers_and_setext():
    assert markdown_to_text("# H1\n## H2 ##\ntext") == "H1\nH2\ntext"
    assert markdown_to_text("Title\n=====\nBody\n-----") == "Title\nBody"
    # a --- after a BLANK line is a horizontal rule, not setext
    assert markdown_to_text("para\n\n---\ntail") == "para\ntail"


def test_emphasis_nested_and_code_spans():
    assert markdown_to_text("**b** *i* __b__ _i_") == "b i b i"
    assert markdown_to_text("***both***") == "both"
    assert markdown_to_text("a `code` and ``tick ` inside``") == (
        "a code and tick ` inside"
    )
    # underscores inside words stay (emphasis needs flanking)
    assert markdown_to_text("snake_case_name stays") == (
        "snake_case_name stays"
    )


def test_lists_and_quotes():
    md = "- one\n* two\n+ three\n1. four\n2) five\n> quote\n>> deep"
    assert markdown_to_text(md) == (
        "one\ntwo\nthree\nfour\nfive\nquote\ndeep"
    )


def test_links_images_autolinks_html():
    md = (
        "[text](http://u) ![alt](i.png) [ref][1] "
        "<https://auto.example/x> <b>bold</b>\n"
        "[1]: http://u"
    )
    assert markdown_to_text(md) == (
        "text alt ref https://auto.example/x bold"
    )


def test_fenced_code_content_kept_verbatim():
    md = "before\n```python\n# not a header\n- not a list\n```\nafter"
    assert markdown_to_text(md) == (
        "before\n# not a header\n- not a list\nafter"
    )
    # ~~~ fences, and an unclosed fence runs to EOF
    assert markdown_to_text("~~~\n**raw**\n~~~") == "**raw**"
    assert markdown_to_text("```\ntail code") == "tail code"


def test_tables_to_tabs():
    md = "| a | b |\n|---|---|\n| 1 | 2 |"
    assert markdown_to_text(md) == "a\tb\n1\t2"
    # a lone pipe mid-sentence still splits cells, but no delim match
    assert markdown_to_text("x | y") == "x\ty"


def test_blank_lines_drop_and_none_passthrough():
    assert markdown_to_text("a\n\n\n\nb") == "a\nb"
    assert markdown_to_text(None) is None
    assert markdown_to_text("") == ""


def test_markdown_strip_dataframe(spark):
    df = spark.createDataFrame(
        [(1, "# T\n**x**"), (2, None)], "id long, md string"
    )
    out = {r.id: r.text for r in markdown_strip(df, "md").collect()}
    assert out[1] == "T\nx"
    assert out[2] is None
