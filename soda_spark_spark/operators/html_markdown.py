"""HTML -> Markdown projection — structure-preserving rendering for
training corpora. `operators/html_text.py` flattens a page to plain
text (the curation/gating view); THIS module keeps the structure the
model should learn — headings, lists, links, emphasis, code fences,
tables — as deterministic Markdown (the dominant pretraining
rendering for web/docs corpora: structure survives as cheap tokens
instead of lost formatting).

The projection law (pinned; every rule is closed-form so an oracle
can replay it):

- `<h1>`..`<h6>` -> `#`..`######` blocks; `<p>`/`<div>` ->
  paragraphs; blocks are separated by ONE blank line.
- `<strong>`/`<b>` -> `**..**`, `<em>`/`<i>` -> `*..*`, inline
  `<code>` -> backticks; `<a href>` -> `[text](href)` (an `<a>`
  without href renders as bare text); `<img>` -> `![alt](src)`;
  `<br>` -> line break inside the block; `<hr>` -> `---`.
- `<ul>`/`<ol>` -> `- ` / `1. ` items, nested lists indented two
  spaces per level, one item per line (a single block).
- `<blockquote>` -> `> ` per nesting level, prefixing every line of
  the enclosed blocks.
- `<pre>` -> a fenced code block, content VERBATIM (no whitespace
  collapse, no inline markup — code is data).
- `<table>` -> pipe rows (`| a | b |`); a leading `<th>` row gets
  the `| --- |` separator line.
- `script/style/head/template/noscript/nav/svg/iframe` subtrees
  drop (same boilerplate set as the text extractor); entity
  references decode; whitespace runs collapse (ASCII class, same
  rationale as `html_text._WS_RUN`).

Malformed HTML never raises: the stdlib tokenizer is recovery-based
and every stack here tolerates stray closes (same stance as
`_TextExtractor`). Inline recovery law (round 18): a close tag with
no matching open emits NOTHING ('<p>a</b>' is 'a', not 'a**'); a
close tag implicitly closes inner formatting still open above its
match; formatting left open at a block boundary closes there
('<p><b>x</p>' -> '**x**', an unclosed '<a href=u>' renders
'[text](u)' — the URL is never silently dropped).

Scale shape: `html_markdown` is Arrow-batched `mapInPandas` over a
two-column pruned select, the same channel as `extract_html_text`;
the parser is one pass, O(bytes).

Derived from the public Markdown conventions (CommonMark) and the
stdlib html.parser; the reference (src/sodaspark/scan.py:441) scans
already-loaded frames — rendering is additive surface.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from soda_spark_spark.operators.html_text import _DROP_TAGS, _WS_RUN

__all__ = ["html_to_markdown", "markdown_col", "html_markdown"]

_HEADING = re.compile(r"^h([1-6])$")

_PARA_TAGS = frozenset(
    "p div section article header footer main aside figure "
    "figcaption dd dt address".split()
)


class _MarkdownExtractor(HTMLParser):
    """One-pass block builder over the stdlib tokenizer."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._drop: list[str] = []
        self._blocks: list[str] = []
        self._inline: list[str] = []
        self._heading = 0            # pending heading level
        self._bq = 0                 # blockquote depth
        self._pre = 0
        self._pre_buf: list[str] = []
        self._lists: list[dict] = []  # {kind: 'ul'|'ol', n: int}
        self._list_lines: list[str] = []
        # open inline formatting: ('b','**') / ('i','*') /
        # ('code','`') / ('a', href-or-None). Closers emit only for
        # matching opens (stray closes are noise), and whatever is
        # still open at a block boundary closes THERE — '<p><b>x</p>'
        # renders '**x**', an unclosed <a href> keeps its URL
        self._open: list[tuple[str, str | None]] = []
        self._table = 0
        self._rows: list[str] = []
        self._cells: list[str] = []
        self._in_cell = False
        self._row_is_header = False
        self._header_cols = 0

    # ------------------------------------------------------ blocks

    def _emit_closer(self, entry: tuple[str, str | None]) -> None:
        kind, val = entry
        if kind == "a":
            if val:
                self._inline.append(f"]({val})")
        else:
            self._inline.append(val or "")

    def _close_inline(self, kind: str) -> None:
        for i in range(len(self._open) - 1, -1, -1):
            if self._open[i][0] == kind:
                # HTML recovery: a close tag implicitly closes any
                # inner formatting still open above it
                while len(self._open) > i:
                    self._emit_closer(self._open.pop())
                return
        # no matching open: a stray close emits nothing

    def _collapse(self) -> str:
        # dangling inline state closes at the block boundary — HTML
        # inline elements cannot legally span blocks, so recovery is
        # to terminate them here rather than half-render markers
        while self._open:
            self._emit_closer(self._open.pop())
        # <br> survives whitespace collapse via a sentinel byte the
        # run regex can't eat, restored as a real line break after
        text = _WS_RUN.sub(" ", "".join(self._inline))
        self._inline = []
        text = re.sub(r" ?\x00 ?", "\n", text)
        return text.strip(" \n")

    def _flush(self) -> None:
        text = self._collapse()
        if not text:
            return
        if self._lists:
            self._emit_item(text)
            return
        if self._heading:
            text = "#" * self._heading + " " + text
        if self._bq:
            text = "\n".join(
                "> " * self._bq + ln for ln in text.split("\n")
            )
        self._blocks.append(text)

    def _emit_item(self, text: str) -> None:
        ctx = self._lists[-1]
        indent = "  " * (len(self._lists) - 1)
        if ctx["kind"] == "ol":
            ctx["n"] += 1
            marker = f"{ctx['n']}. "
        else:
            marker = "- "
        self._list_lines.append(indent + marker + text)

    def _close_list_block(self) -> None:
        if self._list_lines:
            block = "\n".join(self._list_lines)
            if self._bq:
                block = "\n".join(
                    "> " * self._bq + ln for ln in block.split("\n")
                )
            self._blocks.append(block)
            self._list_lines = []

    def _flush_cell(self) -> None:
        text = self._collapse()
        self._cells.append(text)

    def _flush_row(self) -> None:
        if self._in_cell:
            self._flush_cell()
            self._in_cell = False
        if self._cells:
            self._rows.append("| " + " | ".join(self._cells) + " |")
            if self._row_is_header and len(self._rows) == 1:
                self._header_cols = len(self._cells)
            self._cells = []
        self._row_is_header = False

    # ------------------------------------------------------- events

    def handle_starttag(self, tag, attrs):  # noqa: D102
        if tag in _DROP_TAGS:
            self._drop.append(tag)
            return
        if self._drop:
            # the browser's implied </head>: body or any block-level
            # content tag closes an unclosed <head> (none of head's
            # legal children are block tags) — an unclosed head must
            # not swallow the document (same recovery as html_text;
            # this check must run BEFORE the drop-stack early return
            # or it is dead code)
            if "head" in self._drop and (
                tag == "body" or tag in _PARA_TAGS
                or _HEADING.match(tag)
                or tag in ("ul", "ol", "li", "pre", "table", "tr",
                           "td", "th", "blockquote", "hr", "br")
            ):
                self._drop = [t for t in self._drop if t != "head"]
            if self._drop:
                return
            if tag == "body":
                return
        if tag == "pre":
            self._flush()
            self._pre += 1
        elif self._pre:
            return  # code is data: no markup inside fences
        elif _HEADING.match(tag):
            self._flush()
            self._heading = int(tag[1])
        elif tag in _PARA_TAGS:
            self._flush()
        elif tag in ("ul", "ol"):
            if self._lists:
                # nested list opens mid-item: the item text so far is
                # its own line, children indent under it
                text = self._collapse()
                if text:
                    self._emit_item(text)
            else:
                self._flush()
            self._lists.append(dict(kind=tag, n=0))
        elif tag == "li":
            text = self._collapse()
            if text and self._lists:
                self._emit_item(text)
        elif tag == "blockquote":
            self._flush()
            self._close_list_block()
            self._bq += 1
        elif tag == "br":
            self._inline.append("\x00")
        elif tag == "hr":
            self._flush()
            self._blocks.append("---")
        elif tag in ("strong", "b"):
            self._open.append(("b", "**"))
            self._inline.append("**")
        elif tag in ("em", "i"):
            self._open.append(("i", "*"))
            self._inline.append("*")
        elif tag == "code":
            self._open.append(("code", "`"))
            self._inline.append("`")
        elif tag == "a":
            href = dict(attrs).get("href")
            self._open.append(("a", href))
            if href:
                self._inline.append("[")
        elif tag == "img":
            d = dict(attrs)
            self._inline.append(
                f"![{d.get('alt', '')}]({d.get('src', '')})"
            )
        elif tag == "table":
            self._flush()
            self._table += 1
        elif tag == "tr" and self._table:
            self._flush_row()
            self._inline = []
        elif tag in ("td", "th") and self._table:
            if self._in_cell:
                self._flush_cell()  # unclosed <td>1<td>2 recovery
            else:
                self._inline = []
            self._in_cell = True
            if tag == "th":
                self._row_is_header = True

    def handle_endtag(self, tag):  # noqa: D102
        if tag in _DROP_TAGS:
            for i in range(len(self._drop) - 1, -1, -1):
                if self._drop[i] == tag:
                    del self._drop[i:]
                    break
            return
        if self._drop:
            return
        if tag == "pre":
            if self._pre:
                self._pre -= 1
                if not self._pre:
                    content = "".join(self._pre_buf).strip("\n")
                    self._pre_buf = []
                    self._blocks.append(f"```\n{content}\n```")
            return
        if self._pre:
            return
        if _HEADING.match(tag):
            self._flush()
            self._heading = 0
        elif tag in _PARA_TAGS:
            self._flush()
        elif tag in ("ul", "ol"):
            text = self._collapse()
            if text and self._lists:
                self._emit_item(text)
            if self._lists:
                self._lists.pop()
            if not self._lists:
                self._close_list_block()
        elif tag == "li":
            text = self._collapse()
            if text and self._lists:
                self._emit_item(text)
        elif tag == "blockquote":
            self._flush()
            if self._bq:
                self._bq -= 1
        elif tag in ("strong", "b"):
            self._close_inline("b")
        elif tag in ("em", "i"):
            self._close_inline("i")
        elif tag == "code":
            self._close_inline("code")
        elif tag == "a":
            self._close_inline("a")
        elif tag == "td" or tag == "th":
            if self._table and self._in_cell:
                self._flush_cell()
                self._in_cell = False
        elif tag == "tr" and self._table:
            self._flush_row()
        elif tag == "table":
            if self._table:
                self._flush_row()
                self._table -= 1
                if not self._table and self._rows:
                    rows = self._rows
                    if self._header_cols:
                        sep = "|" + " --- |" * self._header_cols
                        rows = [rows[0], sep] + rows[1:]
                    self._blocks.append("\n".join(rows))
                    self._rows = []
                    self._header_cols = 0

    def handle_data(self, data):  # noqa: D102
        if self._drop or not data:
            return
        if self._pre:
            self._pre_buf.append(data)
        else:
            self._inline.append(data)

    def result(self) -> str:
        self._flush()
        self._close_list_block()
        return "\n\n".join(b for b in self._blocks if b)


def html_to_markdown(html_str: str | None) -> str | None:
    """Render one HTML string as Markdown (module contract).
    NULL -> NULL; never raises on malformed markup."""
    if html_str is None:
        return None
    p = _MarkdownExtractor()
    try:
        p.feed(html_str)
        p.close()
    except Exception:
        # stdlib recovery almost never raises; if it does, degrade to
        # whatever blocks were built — parity with html_to_text
        pass
    return p.result()


def markdown_col(col: Column) -> Column:
    """Column wrapper (Arrow-batched pandas UDF; real annotation
    objects, same rationale as `html_text._extract_udf`)."""
    import pandas as pd

    def _md(s):
        return s.map(html_to_markdown, na_action="ignore")

    _md.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return F.pandas_udf(_md, "string")(col)


def html_markdown(
    df: DataFrame, id_col: str, html_col: str, *, out_col: str = "markdown"
) -> DataFrame:
    """One Markdown document per page; two-column pruned projection."""
    return df.select(
        F.col(id_col).alias("id"), F.col(html_col)
    ).withColumn(out_col, markdown_col(F.col(html_col))).select(
        "id", out_col
    )
