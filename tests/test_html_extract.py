"""HTML -> text extraction (operators/html_text.py): pure-kernel
contract tests, the Spark column/DataFrame wrappers, the curate() step,
and the read_warc(html_to_text=True) post-pass."""
from __future__ import annotations

from pyspark.sql import functions as F

from soda_spark_spark.operators.html_text import (
    extract_html_text,
    html_to_text,
)

PAGE = (
    "<html><head><title>T</title><style>p { color: red; }</style></head>"
    "<body>"
    "<nav>Home | <a href='/x'>About</a></nav>"
    "<h1>Heading</h1>"
    "<p>Hello   <b>bold</b>\n world</p>"
    "<script>if (1 < 2) { alert('x & y'); }</script>"
    "<footer>&copy; 2026</footer>"
    "</body></html>"
)


def test_kernel_blocks_drops_and_inline():
    assert html_to_text(PAGE) == "Heading\nHello bold world\n© 2026"


def test_kernel_entities_round_trip():
    # escaped text comes back byte-exact (incl. &nbsp; kept as content)
    assert html_to_text("<p>a &amp; b &lt;c&gt; &nbsp;!</p>") == (
        "a & b <c>  !"
    )


def test_kernel_whitespace_ascii_only():
    # ASCII runs collapse; U+00A0 and other unicode spaces are content
    assert html_to_text("<p> a\t\r\n b </p>") == "a b"
    assert html_to_text("<p> a b</p>") == " a b"


def test_kernel_nested_and_stray_drop_tags():
    assert html_to_text(
        "<nav>x<nav>y</nav>z</nav><p>keep</p></nav><p>more</p>"
    ) == "keep\nmore"
    # unclosed script swallows the rest (browser recovery semantics)
    assert html_to_text("<p>a</p><script>var x;<p>gone</p>") == "a"


def test_kernel_br_breaks_and_none():
    assert html_to_text("<p>a<br/>b<br>c</p>") == "a\nb\nc"
    assert html_to_text(None) is None
    assert html_to_text("") == ""
    assert html_to_text("plain text, no tags") == "plain text, no tags"


def test_kernel_comments_dropped():
    assert html_to_text("<p>a<!-- hidden -->b</p>") == "ab"


def test_extract_html_text_dataframe(spark):
    df = spark.createDataFrame(
        [(1, PAGE), (2, None), (3, "<p>x</p>")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.text for r in extract_html_text(df).collect()}
    assert got[1] == "Heading\nHello bold world\n© 2026"
    assert got[2] is None
    assert got[3] == "x"
    # out_col keeps the original column
    out2 = extract_html_text(df, out_col="extracted")
    row = out2.filter(F.col("doc_id") == 3).collect()[0]
    assert row.text == "<p>x</p>" and row.extracted == "x"


def test_curate_html_extract_step(spark):
    from soda_spark_spark.pipeline import curate

    docs = spark.createDataFrame(
        [(1, "<body><nav>junk</nav><p>The quick brown fox jumps over "
             "the lazy dog and keeps going.</p></body>"),
         (2, "<body><script>only script</script></body>")],
        "doc_id long, text string",
    )
    out, _ = curate(docs, [
        {"kind": "html_extract"},
        {"kind": "length_filter", "min_chars": 10},
    ])
    rows = out.collect()
    assert [r.doc_id for r in rows] == [1]
    assert rows[0].text.startswith("The quick brown fox")
    assert "<" not in rows[0].text


def test_read_warc_html_to_text(spark, tmp_path):
    from soda_spark_spark.sources.warc import read_warc, write_warc_records

    path = str(tmp_path / "t.warc")
    write_warc_records(
        [dict(record_id="<urn:a>", warc_type="response",
              target_uri="http://example.com/a",
              content_type="text/html; charset=utf-8",
              payload=b"<html><body><h1>A</h1><p>one two</p></body></html>"),
         dict(record_id="<urn:b>", warc_type="response",
              target_uri="http://example.com/b",
              content_type="text/plain",
              payload=b"raw   text\nuntouched")],
        path,
    )
    out = read_warc(spark, path, record_types=["response"],
                    html_to_text=True)
    got = {r.target_uri: r.text for r in out.collect()}
    assert got["http://example.com/a"] == "A\none two"
    # non-HTML payloads decode verbatim (no collapsing)
    assert got["http://example.com/b"] == "raw   text\nuntouched"


def test_kernel_matches_duckdb_whitespace_replay():
    """The collapse class is pinned to what DuckDB's RE2 replays:
    regexp_replace(s, '[ \\t\\r\\n\\f\\v]+', ' ', 'g') + trim(s, ' ').
    The trim charset must be the EXPLICIT single space: DuckDB's
    default trim strips Unicode whitespace (U+00A0 included), the
    kernel deliberately does not."""
    import duckdb

    samples = ["a  b", " x\ty ", "m\r\nn", "p\x0bq\x0cr", "", "  ",
               "no-ws", "\xa0lead", "mid\xa0dle", " pad "]
    con = duckdb.connect()
    for s in samples:
        want = con.execute(
            "SELECT trim(regexp_replace(?, '[ \t\r\n\f\v]+', ' ', 'g'),"
            " ' ')",
            [s],
        ).fetchone()[0]
        got = html_to_text(f"<p>{s}</p>")
        assert got == want, (s, got, want)


# ---------------------------------------------------------------------------
# link extraction (the crawl-graph source)
# ---------------------------------------------------------------------------


def test_html_links_kernel():
    from soda_spark_spark.operators.html_text import html_links

    page = ('<body><nav><a href="/about">About</a></nav>'
            '<p><a href="https://other.example/x">x</a>'
            '<a href="#frag">skip</a>'
            '<a href="mailto:a@example.com">skip</a>'
            '<a href="JavaScript:void(0)">skip</a>'
            '<a href="../up">rel</a>'
            '<area href="/map"/>'
            '<a href="/about">About again</a></p></body>')
    base = "http://example.com/dir/page.html"
    assert html_links(page, base) == [
        "http://example.com/about",
        "https://other.example/x",
        "http://example.com/up",
        "http://example.com/map",
        "http://example.com/about",  # duplicates kept: edge multiplicity
    ]
    # without a base, relative hrefs stay as written
    assert html_links(page)[0] == "/about"
    assert html_links(None) is None
    assert html_links("<p>no links</p>") == []


def test_extract_html_links_dataframe(spark):
    from soda_spark_spark.operators.html_text import extract_html_links

    df = spark.createDataFrame(
        [(1, '<a href="/a">a</a>', "http://h1.example/p"),
         (2, '<a href="https://abs.example/b">b</a>', "http://h2.example/p"),
         (3, None, "http://h3.example/p")],
        "doc_id long, text string, url string",
    )
    got = {r.doc_id: r.links
           for r in extract_html_links(df, base_col="url").collect()}
    assert got[1] == ["http://h1.example/a"]
    assert got[2] == ["https://abs.example/b"]
    assert got[3] is None
    # no base column: raw hrefs
    got2 = {r.doc_id: r.links for r in extract_html_links(df).collect()}
    assert got2[1] == ["/a"]


# ---------------------------------------------------------------------------
# rel=nofollow / meta-robots crawl-politeness semantics (round 15)
# ---------------------------------------------------------------------------


def test_html_links_honor_nofollow_opt_in():
    from soda_spark_spark.operators.html_text import html_links

    h = (
        '<body><a href="/a">x</a><a rel="nofollow" href="/b">y</a>'
        '<a href="/c" rel="me NOFOLLOW">z</a>'
        '<a href="/d" rel="noopener">w</a></body>'
    )
    # default: unchanged (edge multiplicity is link-graph signal)
    assert html_links(h, "http://e.com/p") == [
        "http://e.com/a", "http://e.com/b", "http://e.com/c",
        "http://e.com/d",
    ]
    # opt-in: token-aware (rel is a space-separated list, any case)
    assert html_links(h, "http://e.com/p", honor_nofollow=True) == [
        "http://e.com/a", "http://e.com/d",
    ]
    # rel token must match whole-word: "nofollowish" does not count
    h2 = '<a rel="nofollowish" href="/k">k</a>'
    assert html_links(h2, honor_nofollow=True) == ["/k"]


def test_meta_robots_directives():
    from soda_spark_spark.operators.html_text import html_links, meta_robots

    page = (
        '<head><meta name="robots" content="{c}"></head>'
        '<body><a href="/a">x</a></body>'
    )
    assert meta_robots(page.format(c="noindex")) == {
        "noindex": True, "nofollow": False,
    }
    assert meta_robots(page.format(c="noindex, nofollow")) == {
        "noindex": True, "nofollow": True,
    }
    assert meta_robots(page.format(c="NONE")) == {
        "noindex": True, "nofollow": True,
    }
    assert meta_robots("<p>plain</p>") == {
        "noindex": False, "nofollow": False,
    }
    assert meta_robots(None) is None
    # page-level nofollow suppresses every link under the opt-in
    assert html_links(page.format(c="nofollow"), honor_nofollow=True) == []
    assert html_links(page.format(c="nofollow")) == ["/a"]


def test_extract_meta_robots_operator(spark):
    from pyspark.sql import functions as F

    from soda_spark_spark.operators.html_text import (
        extract_html_links, extract_meta_robots,
    )

    rows = [
        (1, '<meta name="robots" content="noindex">'
            '<a href="/a">a</a><a rel="nofollow" href="/b">b</a>'),
        (2, '<a href="/a">a</a><a rel="nofollow" href="/b">b</a>'),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = extract_meta_robots(df, "text")
    got = {r.id: r.robots_meta for r in out.collect()}
    assert got[1].noindex and not got[1].nofollow
    assert not got[2].noindex
    assert got[3] is None or got[3].noindex is None
    links = extract_html_links(df, "text", honor_nofollow=True)
    lg = {r.id: r.links for r in links.collect()}
    assert lg[1] == ["/a"] and lg[2] == ["/a"] and lg[3] is None
