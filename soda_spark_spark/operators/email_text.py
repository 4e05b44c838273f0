"""Email / mailing-list / forum-post cleanup — quoted-reply and
signature stripping, pure Spark built-in expressions. List archives
and forum dumps are classic corpus sources (news, support, technical
Q&A), but each message drags the previous message along as `>` quoted
lines plus an attribution header and a signature block: dedup sees
the same paragraph hundreds of times and LM training over-weights
boilerplate unless the reply scaffolding comes out.

Contract (`email_strip_quotes`) — line-oriented, deterministic, all
JVM-side (split / array_position / filter-with-index / array_join
inside whole-stage codegen, no UDF):

- everything from the first RFC 3676 signature delimiter line
  (exactly `-- `, dash dash space) onward drops — the signature
  block is boilerplate by definition;
- quoted lines (leading `>` after optional indentation, any quote
  depth) drop;
- attribution lines (`On <anything> wrote:` on one line — the form
  every major client emits) drop;
- `Sent from my <device>` one-liners drop;
- surviving lines keep their text EXACTLY (no trim, no collapse —
  email bodies are often format=flowed and the caller's normalizer
  owns whitespace policy); blank lines survive so paragraph
  structure stays visible to downstream segmentation.

The quote REMOVAL is deliberately lossy for nested conversations —
that is the point: the quoted text exists verbatim in the parent
message, which the corpus already has; `dedup_*` operators handle
the remainder.

`email_features` adds the census columns a gate wants BEFORE
stripping: quoted-line fraction, has_signature, attribution count.

Derived from RFC 3676 (signature delimiter) and the public
reply-quoting conventions; the reference (src/sodaspark/scan.py:441)
scans already-loaded frames — message cleanup is additive surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["strip_email_col", "email_strip_quotes", "email_features"]

_QUOTE_RE = r"^[ \t]*>"
_ATTRIB_RE = r"^On .* wrote:[ \t]*$"
_SENT_FROM_RE = r"^Sent from my .*$"
_SIG_LINE = "-- "


def _lines(col: Column) -> Column:
    return F.split(col, "\n")


def _body_lines(col: Column) -> Column:
    """Lines before the first signature delimiter, with quote /
    attribution / sent-from lines removed."""
    lines = _lines(col)
    # array_position is 1-based, 0 when absent -> keep everything
    sig = F.array_position(lines, F.lit(_SIG_LINE))
    cut = F.when(sig == 0, F.size(lines)).otherwise(sig - 1)
    kept = F.slice(lines, 1, cut)
    return F.filter(
        kept,
        lambda x: ~x.rlike(_QUOTE_RE)
        & ~x.rlike(_ATTRIB_RE)
        & ~x.rlike(_SENT_FROM_RE),
    )


def strip_email_col(col: Column | str) -> Column:
    """Column expression: message body with reply scaffolding
    removed (module contract). NULL -> NULL."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        c.isNotNull(), F.array_join(_body_lines(c), "\n")
    )


def email_strip_quotes(
    df: DataFrame, text_col: str, out_col: str = "text"
) -> DataFrame:
    """Replace/add `out_col` with the stripped body. One projection,
    no shuffle, no Python."""
    return df.withColumn(out_col, strip_email_col(text_col))


def email_features(
    df: DataFrame, text_col: str, *, prefix: str = ""
) -> DataFrame:
    """Pre-strip census columns: `n_lines`, `quoted_frac` (fraction
    of lines that are quotes), `has_signature`, `n_attributions`.
    Pure JVM array folds."""
    c = F.col(text_col)
    lines = _lines(c)
    n = F.size(lines)
    quoted = F.size(F.filter(lines, lambda x: x.rlike(_QUOTE_RE)))
    attrib = F.size(F.filter(lines, lambda x: x.rlike(_ATTRIB_RE)))
    return (
        df.withColumn(prefix + "n_lines", n.cast("long"))
        .withColumn(
            prefix + "quoted_frac",
            quoted.cast("double") / F.greatest(n, F.lit(1)),
        )
        .withColumn(
            prefix + "has_signature",
            F.array_position(lines, F.lit(_SIG_LINE)) > 0,
        )
        .withColumn(prefix + "n_attributions", attrib.cast("long"))
    )
