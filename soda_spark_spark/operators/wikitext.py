"""MediaWiki wikitext -> plain text, stdlib-only — Wikipedia dumps
are the single most common curated pretraining corpus, and their text
layer is wikitext, not HTML: templates (`{{cite ...}}`), wikilinks
(`[[target|label]]`), file/category links, `<ref>` footnotes, and
table markup all have to come OUT before dedup shingles, quality
features, or LM training see the text.

Contract (`wikitext_to_text`) — deterministic, document-level first,
then line-oriented (same shape as `markdown_text.markdown_to_text`):

document-level (these span lines):
- HTML comments `<!-- ... -->` drop (an unterminated comment drops to
  end-of-document, which is MediaWiki behavior);
- drop-content tag spans: `<ref>...</ref>` (attributes and nesting of
  other tags inside tolerated), self-closing `<ref ... />`,
  `<gallery>`, `<timeline>`, `<math>`, `<score>` — footnote citations
  and non-text media blocks are not corpus text;
- keep-content tag spans: `<nowiki>`, `<pre>`, `<code>`,
  `<syntaxhighlight>`, `<source>` — the tags drop, the content stays
  verbatim (the fenced-code rule from markdown);
- templates `{{...}}` drop, innermost-first to a fixpoint so nesting
  (`{{infobox|a={{convert|1|km}}}}`) unwinds; unbalanced braces stay
  as literal text (honest residue, never data loss);
- tables `{| ... |}` drop entirely, innermost-first (nested tables);
- wikilinks, innermost-first: `[[File:...]]`/`[[Image:...]]`/
  `[[Category:...]]` (case-insensitive, optional leading colon) drop
  whole; `[[target|label]]` -> label (last pipe field, the rendered
  text); `[[target]]` -> target; interlanguage links (`[[fr:Titre]]`)
  drop;
- external links `[url label]` -> label, bare `[url]` drops (rendered
  as a numbered marker, not text); naked autolink URLs stay (they are
  literal text in the source);
- bold/italic apostrophe runs `'''''`/`'''`/`''` drop;
- magic words `__TOC__`-style (`__[A-Z]+__`) drop;
- HTML entities decode: named `&amp; &lt; &gt; &quot; &apos; &nbsp;`
  (nbsp -> plain space) and numeric `&#NN;`/`&#xHH;`;
- remaining inline HTML tags (`<br/>`, `<div>`, `<span>`, ...) drop,
  their content stays.

line-level:
- headers `== X ==` -> X (2-6 `=`s, symmetric);
- list/indent markers (`*`/`#`/`:`/`;` runs at line start) strip;
- horizontal rules (`----`+) drop;
- every emitted line is whitespace-trimmed and internal whitespace
  runs collapse to one space; blank lines drop.

This is a text projection for corpus curation, not a renderer:
templates are DROPPED (a renderer would expand them — expansion
requires the template corpus, which a text pipeline does not have).
The registry row's oracle replays the projection closed-form on
fixture-built wikitext.

Spark surface: `strip_wikitext_col` (Arrow-batched Pandas UDF column
expression) and `wikitext_strip(df, text_col, out_col)`.

Derived from the public MediaWiki markup spec
(mediawiki.org/wiki/Help:Wikitext); the reference
(src/sodaspark/scan.py:441) scans already-loaded frames — dump-format
normalization is additive surface.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["wikitext_to_text", "strip_wikitext_col", "wikitext_strip"]

_COMMENT = re.compile(r"<!--.*?(?:-->|\Z)", re.S)
_DROP_SPAN = re.compile(
    r"<(ref|gallery|timeline|math|score)\b[^>/]*(?<!/)>.*?</\1\s*>",
    re.S | re.I,
)
_DROP_SELF = re.compile(r"<(?:ref|gallery|timeline|math|score)\b[^>]*/>", re.I)
_KEEP_SPAN = re.compile(
    r"<(nowiki|pre|code|syntaxhighlight|source)\b[^>]*>(.*?)</\1\s*>",
    re.S | re.I,
)
_TEMPLATE = re.compile(r"\{\{[^{}]*\}\}", re.S)
_TABLE = re.compile(r"\{\|(?:(?!\{\|).)*?\|\}", re.S)
_LINK_DROP_NS = re.compile(
    r"\[\[\s*:?\s*(?:file|image|category)\s*:[^\[\]]*\]\]", re.I
)
# interlanguage prefixes are lowercase by convention; matching
# case-SENSITIVELY keeps [[ISO: ...]]-style article links alive
_LINK_DROP_LANG = re.compile(r"\[\[[a-z]{2,3}(?:-[a-z]+)?:[^\[\]|]*\]\]")
_LINK = re.compile(r"\[\[([^\[\]]*)\]\]")
_EXT_LINK = re.compile(r"\[([a-z][a-z0-9+.-]*://[^ \]]*)( ([^\]]*))?\]", re.I)
_MAGIC = re.compile(r"__[A-Z]+__")
_HTML_TAG = re.compile(r"</?[a-zA-Z][^>]*>")
_ENT_NUM = re.compile(r"&#(?:[0-9]{1,7}|x[0-9a-fA-F]{1,6});")
_HEADER = re.compile(r"^(={2,6}) *(.*?) *\1 *$")
_LIST = re.compile(r"^[*#:;]+ *")
_HR = re.compile(r"^-{4,} *$")
_WS = re.compile(r"[ \t\f\v]+")

_NAMED_ENTITIES = {
    "&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"',
    "&apos;": "'", "&nbsp;": " ",
}


def _decode_entity(m: re.Match) -> str:
    body = m.group(0)[2:-1]
    try:
        cp = int(body[1:], 16) if body[:1] in ("x", "X") else int(body)
        return chr(cp) if 0 < cp <= 0x10FFFF else m.group(0)
    except (ValueError, OverflowError):
        return m.group(0)


def _link_text(m: re.Match) -> str:
    # rendered text is the LAST pipe field ([[a|b|c]] renders "c");
    # the empty pipe trick ([[target|]]) falls back to the target
    parts = m.group(1).split("|")
    label = parts[-1].strip()
    return label if label else parts[0].strip()


def wikitext_to_text(wt: str | None) -> str | None:
    """Project a wikitext string to its plain text (module contract).
    None -> None."""
    if wt is None:
        return None
    s = _COMMENT.sub("", wt)
    # keep-content spans first: their bodies must survive the later
    # template/table/tag passes untouched, so stash them behind
    # sentinels that no other rule matches
    stash: list[str] = []

    def _keep(m: re.Match) -> str:
        stash.append(m.group(2))
        return f"\x00{len(stash) - 1}\x00"

    s = _KEEP_SPAN.sub(_keep, s)
    s = _DROP_SPAN.sub("", s)
    s = _DROP_SELF.sub("", s)
    # innermost-first fixpoints; iteration bound is generous (the
    # deepest real templates nest ~10) and leftover braces are kept
    # as literal text, so the bound never silently eats content
    for pat in (_TEMPLATE, _TABLE):
        for _ in range(50):
            s, n = pat.subn("", s)
            if not n:
                break
    for _ in range(50):
        s2 = _LINK_DROP_NS.sub("", s)
        s2 = _LINK_DROP_LANG.sub("", s2)
        s2, n = _LINK.subn(_link_text, s2)
        if s2 == s:
            break
        s = s2
    s = _EXT_LINK.sub(lambda m: m.group(3) or "", s)
    s = s.replace("'''''", "").replace("'''", "").replace("''", "")
    s = _MAGIC.sub("", s)
    s = _HTML_TAG.sub("", s)
    for ent, ch in _NAMED_ENTITIES.items():
        s = s.replace(ent, ch)
    s = _ENT_NUM.sub(_decode_entity, s)
    for i, body in enumerate(stash):
        s = s.replace(f"\x00{i}\x00", body)
    out: list[str] = []
    for line in s.split("\n"):
        if _HR.match(line):
            continue
        h = _HEADER.match(line)
        if h:
            line = h.group(2)
        else:
            line = _LIST.sub("", line)
        line = _WS.sub(" ", line).strip()
        if line:
            out.append(line)
    return "\n".join(out)


def strip_wikitext_col(col: Column | str) -> Column:
    """Column expression: wikitext -> plain text (Arrow-batched
    Pandas UDF over `wikitext_to_text`)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _strip(s):  # type: ignore[no-untyped-def]
        return s.map(wikitext_to_text, na_action="ignore")

    return _strip(F.col(col) if isinstance(col, str) else col)


def wikitext_strip(
    df: DataFrame, text_col: str, out_col: str = "text"
) -> DataFrame:
    """Replace/add `out_col` with the plain-text projection of
    `text_col`. Scale: one Arrow-batched projection, no shuffle; the
    scan prunes to the input columns (binary parsing stays JVM-free —
    wikitext is small text, the regex passes are linear)."""
    return df.withColumn(out_col, strip_wikitext_col(text_col))
