"""HTML -> text extraction for crawl payloads — the boilerplate-strip
stage every production pretraining pipeline runs between WARC fetch and
curation (the trafilatura/jusText slot, reduced to its deterministic,
dependency-free core).

Real Common Crawl `response` records are HTML, not plain text; feeding
raw markup to the curation gates poisons every downstream signal
(langid sees attribute soup, quality scoring counts punctuation in
JavaScript, dedup fingerprints template chrome). This module extracts
the readable text with ONLY the stdlib `html.parser` state machine —
no lxml/bs4 (not in the environment) — inside an Arrow-batched pandas
UDF, so the rest of the curation plan stays whole-stage-codegen'd
around one vectorized extraction stage.

Extraction contract (deterministic, oracle-replayable):

- Content inside `script`, `style`, `head`, `template`, `noscript`,
  `nav`, `svg`, and `iframe` elements is DROPPED (nesting-counted, so
  a nav inside a nav closes correctly). `html.parser` treats
  script/style bodies as CDATA natively, so `if (1 < 2)` in inline
  JavaScript never parses as markup.
- Block-level elements (`p`, `div`, `li`, `h1`-`h6`, `tr`, `td`,
  `blockquote`, `pre`, `section`, `article`, ... — see `_BREAK_TAGS`)
  and `br`/`hr` end the current output line on BOTH open and close;
  inline elements (`a`, `b`, `em`, `span`, ...) do not break lines.
- Character/entity references decode to their characters
  (`convert_charrefs=True`), so `&amp;` -> `&`, `&copy;` -> the
  copyright sign, and escaped text round-trips byte-exactly.
- Within each line, runs of ASCII whitespace (space, tab, CR, LF, FF,
  VT) collapse to a single space and leading/trailing whitespace is
  stripped — HTML's insignificant-whitespace rule. ONLY ASCII
  whitespace collapses: U+00A0 (the `&nbsp;` character) and other
  Unicode spaces are content, kept verbatim. This exact class makes
  the transform replayable in any engine as
  ``regexp_replace(s, '[ \\t\\r\\n\\f\\v]+', ' ', 'g')`` + trim.
- Empty lines are dropped; surviving lines join with a single `\n`.
- Comments, processing instructions, and declarations are dropped
  (the `html.parser` default). An unclosed `<script>` swallows the
  rest of the document — the same recovery a browser applies to an
  unterminated CDATA element. But an unclosed `<head>` does NOT: the
  moment `<body>` (or any block-level content tag) opens, every open
  `head` is implicitly closed — mirroring the browser's implied
  `</head>` — so a page missing its `</head>` (ubiquitous in wild
  crawls) still extracts its body text instead of silently emptying.
  A stray drop-element close tag closes through to its nearest
  matching open (the spec's end-tag recovery), never underflows.

Scale: pure row-local string work — no shuffle, no state; the UDF
vectorizes over Arrow batches and the surrounding plan keeps its
pushdowns (extraction commutes with any filter that reads other
columns). Certified by the `html_extract` registry row (hash-exact vs
a DuckDB replay of the whitespace arithmetic) and exercised end-to-end
by the upgraded `crawl_to_shards` composition (HTML WARC payloads ->
extraction -> gates -> shards).

The reference (src/sodaspark/scan.py:424-474) scans already-tabular
frames and has no ingestion story; this extends the repo's crawl
ingestion surface (sources/warc.py) the way its scan surface extends
the reference's metrics.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# elements whose entire subtree is boilerplate/invisible
_DROP_TAGS = frozenset(
    "script style head template noscript nav svg iframe".split()
)

# elements that terminate the current text line on open AND close
_BREAK_TAGS = frozenset(
    "address article aside blockquote br caption dd details dialog div "
    "dl dt fieldset figcaption figure footer form h1 h2 h3 h4 h5 h6 "
    "header hr legend li main menu ol optgroup option p pre section "
    "select summary table tbody td tfoot th thead tr ul".split()
)

# ASCII-only whitespace run — deliberately NOT \s (Python's \s matches
# U+00A0 etc. under re.UNICODE, DuckDB/RE2's does not; pinning the
# ASCII class keeps the transform identical across engines and keeps
# &nbsp; as content)
_WS_RUN = re.compile(r"[ \t\r\n\f\v]+")


class _TextExtractor(HTMLParser):
    """One-pass line-building extractor over the stdlib tokenizer."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._drop: list[str] = []  # stack of open drop-element tags
        self._lines: list[str] = []
        self._buf: list[str] = []

    def _flush(self) -> None:
        if self._buf:
            self._lines.append("".join(self._buf))
            self._buf = []

    def handle_starttag(self, tag, attrs):  # noqa: D102
        if tag in _DROP_TAGS:
            self._drop.append(tag)
            self._flush()
        elif tag == "body" or tag in _BREAK_TAGS:
            # the browser's implied </head>: body (or any block-level
            # content tag — none of head's legal children are block
            # tags, so this never mis-fires inside a real head) closes
            # every open head; an unclosed <head> must not swallow the
            # document (ADVICE r13 — crawl-recall hazard)
            if "head" in self._drop:
                self._drop = [t for t in self._drop if t != "head"]
            self._flush()

    # handle_startendtag's default (starttag then endtag) is correct:
    # a self-closing <br/> breaks once, a (nonsensical) <script/> nets
    # the drop stack back to where it was

    def handle_endtag(self, tag):  # noqa: D102
        if tag in _DROP_TAGS:
            # close through to the nearest matching open drop element
            # (the spec's end-tag recovery: </nav> also closes an
            # unclosed <svg> inside it); stray closes are tolerated
            for i in range(len(self._drop) - 1, -1, -1):
                if self._drop[i] == tag:
                    del self._drop[i:]
                    break
            self._flush()
        elif tag in _BREAK_TAGS:
            self._flush()

    def handle_data(self, data):  # noqa: D102
        if data and not self._drop:
            self._buf.append(data)

    def result(self) -> str:
        self._flush()
        out = []
        for ln in self._lines:
            collapsed = _WS_RUN.sub(" ", ln).strip(" ")
            if collapsed:
                out.append(collapsed)
        return "\n".join(out)


def html_to_text(html_str: str | None) -> str | None:
    """Extract readable text from one HTML string (module contract
    above). None -> None; an input the tokenizer cannot process at all
    -> None (quarantine-style: surface, don't mis-extract — stdlib
    `html.parser` recovers from essentially all malformed markup, so
    this path is defensive)."""
    if html_str is None:
        return None
    p = _TextExtractor()
    try:
        p.feed(html_str)
        p.close()
    except Exception:
        return None
    return p.result()


def _extract_udf():
    """Arrow-batched string->string extraction UDF (built lazily so the
    module imports without pandas)."""
    import pandas as pd

    def _extract(s):
        return s.map(html_to_text, na_action="ignore")

    # real annotation objects, not strings: this module's
    # `from __future__ import annotations` would otherwise hand
    # pyspark's typehint inspector unresolvable 'pd.Series' literals
    _extract.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return F.pandas_udf(_extract, "string")


def extract_html_col(col: Column) -> Column:
    """Column-level extraction: readable text of the HTML in `col`."""
    return _extract_udf()(col)


class _LinkCollector(HTMLParser):
    """Collects <a>/<area> (href, rel) pairs in document order —
    including inside nav/footer chrome: for the LINK GRAPH every edge
    matters, unlike for text extraction — plus the page's
    <meta name="robots"> directives (noindex/nofollow/none)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.links: list[tuple[str, str | None]] = []
        self.meta_noindex = False
        self.meta_nofollow = False

    def handle_starttag(self, tag, attrs):  # noqa: D102
        if tag in ("a", "area"):
            href = rel = None
            for k, v in attrs:
                if k == "href" and v and href is None:
                    href = v
                elif k == "rel" and rel is None:
                    rel = v
            if href:
                self.links.append((href, rel))
        elif tag == "meta":
            d = {k: v for k, v in attrs}
            if (d.get("name") or "").lower() == "robots":
                toks = {
                    t.strip()
                    for t in (d.get("content") or "").lower().split(",")
                }
                if "noindex" in toks or "none" in toks:
                    self.meta_noindex = True
                if "nofollow" in toks or "none" in toks:
                    self.meta_nofollow = True


_SKIP_SCHEMES = ("javascript:", "mailto:", "tel:", "data:", "about:")


def html_links(
    html_str: str | None,
    base: str | None = None,
    *,
    honor_nofollow: bool = False,
) -> list[str] | None:
    """All <a>/<area> href targets of one HTML document, in document
    order (duplicates kept — edge multiplicity is signal for the link
    graph). Fragment-only hrefs ('#...') and non-navigational schemes
    (javascript:/mailto:/tel:/data:/about:) are skipped; relative
    hrefs resolve against `base` (stdlib urljoin) when given, else
    stay as written. None -> None.

    `honor_nofollow=True` (opt-in; default output is unchanged)
    applies the crawl-politeness semantics a frontier should respect:
    links whose rel attribute carries the `nofollow` token are
    skipped, and a page-level <meta name="robots"> nofollow (or
    `none`) directive suppresses EVERY outbound link of the page.

    Feeds the crawl-graph operators: explode the list into
    (src_page, dst_url) edges, canonicalize with `text.canonical_url`,
    and the edge table drives `graph.pagerank` / the `link_prior`
    curate gate."""
    if html_str is None:
        return None
    from urllib.parse import urljoin

    p = _LinkCollector()
    try:
        p.feed(html_str)
        p.close()
    except Exception:
        return None
    if honor_nofollow and p.meta_nofollow:
        return []
    out = []
    for href, rel in p.links:
        if honor_nofollow and rel and "nofollow" in rel.lower().split():
            continue
        h = href.strip()
        if not h or h.startswith("#"):
            continue
        if h.lower().startswith(_SKIP_SCHEMES):
            continue
        out.append(urljoin(base, h) if base else h)
    return out


def meta_robots(html_str: str | None) -> dict | None:
    """The page's <meta name="robots"> directives as
    {"noindex": bool, "nofollow": bool} (the `none` token implies
    both; absent meta -> both False; unparseable/None -> None). The
    page-level companion of `crawl.parse_robots`: robots.txt governs
    FETCHING, the meta tag governs INDEXING and link FOLLOWING of an
    already-fetched page — a curation pipeline that keeps noindex
    pages republishes content its site asked search engines to hide."""
    if html_str is None:
        return None
    p = _LinkCollector()
    try:
        p.feed(html_str)
        p.close()
    except Exception:
        return None
    return {"noindex": p.meta_noindex, "nofollow": p.meta_nofollow}


def extract_meta_robots(
    df: DataFrame,
    text_col: str = "text",
    *,
    out_col: str = "robots_meta",
) -> DataFrame:
    """Append `out_col` (struct<noindex:boolean, nofollow:boolean>) of
    every page's <meta name="robots"> directives (`meta_robots`).
    Row-local Arrow UDF — no shuffle; gate with
    `filter(~col out_col.noindex)` before indexing/curation."""
    import pandas as pd

    def _extract(s):
        out = []
        for h in s:
            m = meta_robots(h)
            # NULL html -> (null, null) fields: pandas cannot carry a
            # null STRUCT through the Arrow struct-UDF path
            out.append(
                (None, None) if m is None
                else (m["noindex"], m["nofollow"])
            )
        return pd.DataFrame(
            out, columns=["noindex", "nofollow"]
        )

    _extract.__annotations__ = {"s": pd.Series, "return": pd.DataFrame}
    udf = F.pandas_udf(
        _extract, "noindex boolean, nofollow boolean"
    )
    return df.withColumn(out_col, udf(F.col(text_col)))


def extract_html_links(
    df: DataFrame,
    text_col: str = "text",
    *,
    base_col: str | None = None,
    out_col: str = "links",
    honor_nofollow: bool = False,
) -> DataFrame:
    """Append `out_col` (array<string>) of every page's outbound link
    targets (`html_links`), resolving relative hrefs against `base_col`
    (the page's own URL) when given; `honor_nofollow=True` applies the
    rel/meta nofollow crawl-politeness semantics. Row-local Arrow
    UDF — no shuffle; the downstream edge build is one explode."""
    import pandas as pd

    if base_col is not None:
        def _extract2(s, b):
            return pd.Series(
                [
                    html_links(h, u, honor_nofollow=honor_nofollow)
                    for h, u in zip(s, b)
                ],
                dtype=object,
            )

        _extract2.__annotations__ = {
            "s": pd.Series, "b": pd.Series, "return": pd.Series,
        }
        udf = F.pandas_udf(_extract2, "array<string>")
        return df.withColumn(out_col, udf(F.col(text_col), F.col(base_col)))

    def _extract(s):
        return pd.Series(
            [html_links(h, honor_nofollow=honor_nofollow) for h in s],
            dtype=object,
        )

    _extract.__annotations__ = {"s": pd.Series, "return": pd.Series}
    udf = F.pandas_udf(_extract, "array<string>")
    return df.withColumn(out_col, udf(F.col(text_col)))


def extract_html_text(
    df: DataFrame,
    text_col: str = "text",
    *,
    out_col: str | None = None,
) -> DataFrame:
    """Rewrite `text_col` (HTML markup) to its extracted readable text
    (into `out_col` when given, in place otherwise). Row-local — no
    shuffle; one Arrow UDF stage, every other column untouched. Also
    available as the `{"kind": "html_extract"}` curate() step and as
    `read_warc(..., html_to_text=True)`."""
    return df.withColumn(out_col or text_col, extract_html_col(F.col(text_col)))
