"""Markdown -> plain text, stdlib-only — the most common lightweight
markup in code and documentation corpora (READMEs, wikis, forum and
issue text). Quality scoring, dedup shingling, and LM training all
want the CONTENT without the markup: `**bold**` and `bold` are the
same text, a `#` header prefix is not a token, and a pipe-table row
is tab-separated fields.

Contract (`markdown_to_text`) — line-oriented, deterministic:

- fenced code blocks (``` / ~~~): fence lines (and their info string)
  drop, the code INSIDE is kept verbatim (content, not markup);
- ATX headers: leading `#`s + space strip (trailing closing `#`s
  too); setext underlines (`===`/`---` under a text line) drop;
- horizontal rules (3+ of `-*_` alone on a line) drop;
- blockquote markers (`>` runs, nestable) strip;
- list markers (`-`/`*`/`+`/`N.`/`N)` + space) strip, indentation
  collapses;
- images `![alt](url)` -> alt, links `[text](url)` / `[text][ref]`
  -> text, autolinks `<scheme://url>` -> url;
- emphasis `**x**`/`__x__`/`*x*`/`_x_` and inline code
  `` `x` ``/``` ``x`` ``` unwrap;
- inline HTML tags drop (markdown legally embeds them);
- pipe-table rows: delimiter rows (`|---|---|`) drop, cell pipes
  become single tabs;
- reference-definition lines (`[ref]: url`) drop;
- every emitted line is whitespace-trimmed; blank lines drop (one
  text line per markdown line — the block structure stays visible
  line-wise, which is what shingles/quality features consume).

This is a CommonMark-shaped text projection, not a renderer: the
goal is a stable, SQL-replayable transform (the registry row's
oracle replays it closed-form on fixture-built markdown), same as
`html_text`'s extractor contract.

Spark surface: `strip_markdown_col` (a column expression built from
a Pandas UDF — Arrow-batched, usable inside any select) and
`markdown_strip(df, text_col, out_col)`.

Derived from the public CommonMark 0.31 spec's syntax inventory; the
reference (src/sodaspark/scan.py:441) scans already-loaded frames —
text-format normalization is additive surface.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["markdown_to_text", "strip_markdown_col", "markdown_strip"]

_FENCE = re.compile(r"^ {0,3}(`{3,}|~{3,})")
_SETEXT = re.compile(r"^ {0,3}(=+|-+) *$")
_HR = re.compile(r"^ {0,3}([-*_])( *\1){2,} *$")
_BLOCKQUOTE = re.compile(r"^( {0,3}> ?)+")
_ATX = re.compile(r"^ {0,3}#{1,6} +")
_ATX_TAIL = re.compile(r" +#+ *$")
_LIST = re.compile(r"^ *(?:[-*+]|\d{1,9}[.)]) +")
_TABLE_DELIM = re.compile(r"^ {0,3}\|?[ :\-|]+\|[ :\-|]*$")
_REF_DEF = re.compile(r"^ {0,3}\[[^\]]+\]: +\S+")
_IMAGE = re.compile(r"!\[([^\]]*)\]\([^)]*\)")
_LINK_INLINE = re.compile(r"\[([^\]]*)\]\([^)]*\)")
_LINK_REF = re.compile(r"\[([^\]]*)\]\[[^\]]*\]")
_AUTOLINK = re.compile(r"<([a-zA-Z][a-zA-Z0-9+.-]*://[^ >]*)>")
_HTML_TAG = re.compile(r"</?[a-zA-Z][^>]*>")
_CODE_SPAN = re.compile(r"(`+)(.+?)\1")
# `*` emphasis may be intraword; `_` emphasis may NOT (CommonMark
# 6.2: underscore runs flanked by word characters are literal)
_EMPH_AST = re.compile(r"(\*\*|\*)(?=\S)(.+?)(?<=\S)\1")
_EMPH_UND = re.compile(
    r"(?<![A-Za-z0-9])(__|_)(?=\S)(.+?)(?<=\S)\1(?![A-Za-z0-9])"
)
_PIPE_CELL = re.compile(r" *\| *")


def markdown_to_text(md: str | None) -> str | None:
    """Project a markdown string to its plain text (module contract).
    None -> None."""
    if md is None:
        return None
    out: list[str] = []
    in_fence = False
    fence_mark = ""
    prev_kept_nonempty = False
    for line in md.split("\n"):
        if in_fence:
            if _FENCE.match(line) and line.lstrip().startswith(fence_mark):
                in_fence = False
                continue
            out.append(line.rstrip())
            prev_kept_nonempty = bool(line.strip())
            continue
        fm = _FENCE.match(line)
        if fm:
            in_fence = True
            fence_mark = fm.group(1)[0] * 3
            continue
        if prev_kept_nonempty and _SETEXT.match(line):
            prev_kept_nonempty = False
            continue
        if _HR.match(line) or _TABLE_DELIM.match(line) \
                or _REF_DEF.match(line):
            prev_kept_nonempty = False
            continue
        # each unanchored pattern requires its guard character
        # literally, so a failed `in` check skips an identity sub —
        # most corpus lines carry no markup and pay only the guards
        s = _BLOCKQUOTE.sub("", line)
        s = _ATX.sub("", s)
        if "#" in s:
            s = _ATX_TAIL.sub("", s)
        s = _LIST.sub("", s)
        if "[" in s:
            s = _IMAGE.sub(r"\1", s)
            s = _LINK_INLINE.sub(r"\1", s)
            s = _LINK_REF.sub(r"\1", s)
        if "<" in s:
            s = _AUTOLINK.sub(r"\1", s)
            s = _HTML_TAG.sub("", s)
        if "`" in s:
            s = _CODE_SPAN.sub(r"\2", s)
        # two passes unwrap nested emphasis (***x*** = bold+italic)
        for _ in range(2):
            if "*" in s:
                s = _EMPH_AST.sub(r"\2", s)
            if "_" in s:
                s = _EMPH_UND.sub(r"\2", s)
        # pipe-table cells -> single tabs; strip the edge pipes
        if "|" in s:
            t = s.strip()
            if t.startswith("|"):
                t = t[1:]
            if t.endswith("|"):
                t = t[:-1]
            s = _PIPE_CELL.sub("\t", t)
        s = s.strip()
        prev_kept_nonempty = bool(s)
        if s:
            out.append(s)
    return "\n".join(out)


def strip_markdown_col(col: Column) -> Column:
    """Column expression: markdown -> plain text via an Arrow-batched
    Pandas UDF (the extract_html_col pattern — per-string Python is
    inherent to the transform; Arrow keeps the transfer vectorized)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _udf(s):  # type: ignore[no-untyped-def]
        return s.map(markdown_to_text, na_action="ignore")

    return _udf(col)


def markdown_strip(
    df: DataFrame, text_col: str, out_col: str = "text"
) -> DataFrame:
    """Replace/attach `out_col` with the markdown-stripped text."""
    return df.withColumn(out_col, strip_markdown_col(F.col(text_col)))
