"""Comment-stripping + code near-dup support — the code-corpus dedup
story. Two files that differ only in comments, license headers, or
whitespace are the same training example; The-Stack-style pipelines
dedup on COMMENT-STRIPPED, whitespace-normalized content. Comment
removal must be string-aware (a `//` inside a string literal is not
a comment), which takes a small state machine, not a regex.

`strip_code_comments(text, family)` — deterministic lexer:

- family 'c' (C/C++/Java/JS/TS/Go/Rust/C#/Swift/Kotlin/Scala/PHP):
  `//` line comments and `/* ... */` block comments drop; `"..."`
  and `'...'` literals (backslash escapes honored) pass through
  untouched, including comment-lookalikes inside them; an
  unterminated block comment drops to end-of-input (honest — that
  is what the compiler would reject, and the content is not code);
- family 'hash' (Python/Shell/Ruby/Perl/R/YAML/TOML): `#` line
  comments drop; `"`/`'` literals pass through; Python triple-quoted
  strings (''' / \"\"\") pass through whole — a docstring is a
  STRING, not a comment, and stays (dropping docstrings is a
  separate policy decision this operator does not take). Known
  limitation, accepted: single-line string semantics (the Python
  rule — a quote ends at the newline). Shell's MULTI-LINE
  single-quoted strings can therefore have a '#' line inside them
  stripped; because the transform applies uniformly to every copy,
  dedup-key EQUIVALENCE is unaffected — only the stripped text of
  such files is lossy, and per-language string grammars are not a
  price this operator pays;
- newlines are PRESERVED where a line comment dropped (line numbers
  survive for diagnostics); a block comment is replaced by one space
  (`a/*x*/b` must not fuse tokens).

`normalize_code` folds the result for dedup keys: strip trailing
whitespace per line, drop blank lines. `code_dedup_key` composes
both into one column expression; feeding it to the exact/MinHash
dedup operators gives comment-insensitive code dedup with zero new
join machinery.

`LANG_COMMENT_FAMILY` maps `code_langid` names to families; unknown
languages pass through UNCHANGED (never guess a grammar).

Spark surface: `strip_comments_col(col, family_col)` (Arrow-batched
Pandas UDF — per-string lexing is inherent) and
`code_comment_strip(df, text_col, lang_col, out_col)`.

Derived from the public grammars of the named languages and the
published Stack dedup recipe (arXiv:2211.15533); the reference
(src/sodaspark/scan.py:441) scans already-loaded frames — code
normalization is additive surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "LANG_COMMENT_FAMILY",
    "strip_code_comments",
    "normalize_code",
    "strip_comments_col",
    "code_comment_strip",
]

LANG_COMMENT_FAMILY: dict[str, str] = {
    "c": "c", "cpp": "c", "java": "c", "javascript": "c",
    "typescript": "c", "go": "c", "rust": "c", "csharp": "c",
    "swift": "c", "kotlin": "c", "scala": "c", "php": "c",
    "dart": "c", "groovy": "c", "zig": "c",
    "python": "hash", "shell": "hash", "ruby": "hash",
    "perl": "hash", "r": "hash", "yaml": "hash", "toml": "hash",
    "julia": "hash", "nim": "hash", "elixir": "hash",
}


def _char_literal_end(s: str, i: int) -> int:
    """`s[i] == \"'\"`: return the index just past the closing quote
    if a well-formed C-family char literal starts here ('a', '\\n',
    '\\x41', '\\u0041', Rust '\\u{1F600}'), else -1. A bare
    apostrophe that is NOT a char literal — a Rust lifetime (&'a
    str), a C# generic tick, an apostrophe in prose — must not open
    a phantom string that swallows a later // or /* */ comment
    (round-17 ADVICE fix)."""
    n = len(s)
    j = i + 1
    if j >= n or s[j] in "'\n":
        return -1
    if s[j] == "\\":
        j += 1
        if j >= n:
            return -1
        if s[j] == "x":
            j += 3
        elif s[j] == "u":
            j += 1
            if j < n and s[j] == "{":
                k = s.find("}", j)
                if k == -1 or k - j > 8:
                    return -1
                j = k + 1
            else:
                j += 4
        else:
            j += 1
    else:
        j += 1
    if j < n and s[j] == "'":
        return j + 1
    return -1


def _strip_c(s: str) -> str:
    out = []
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch == "'":
            end = _char_literal_end(s, i)
            if end == -1:
                # lifetime / generic tick / stray apostrophe: emit it
                # alone and keep scanning — it delimits nothing
                out.append(ch)
                i += 1
            else:
                out.append(s[i:end])
                i = end
        elif ch == '"':
            q = ch
            out.append(ch)
            i += 1
            while i < n:
                out.append(s[i])
                if s[i] == "\\" and i + 1 < n:
                    out.append(s[i + 1])
                    i += 2
                    continue
                if s[i] == q:
                    i += 1
                    break
                i += 1
        elif ch == "/" and i + 1 < n and s[i + 1] == "/":
            while i < n and s[i] != "\n":
                i += 1
        elif ch == "/" and i + 1 < n and s[i + 1] == "*":
            i += 2
            while i + 1 < n and not (s[i] == "*" and s[i + 1] == "/"):
                if s[i] == "\n":
                    out.append("\n")
                i += 1
            i = i + 2 if i + 1 < n else n
            out.append(" ")
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def _strip_hash(s: str) -> str:
    out = []
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch in "\"'":
            q = ch
            if s[i : i + 3] == q * 3:  # triple-quoted: string, stays
                out.append(q * 3)
                i += 3
                end = s.find(q * 3, i)
                if end == -1:
                    out.append(s[i:])
                    return "".join(out)
                out.append(s[i : end + 3])
                i = end + 3
                continue
            out.append(ch)
            i += 1
            while i < n:
                out.append(s[i])
                if s[i] == "\\" and i + 1 < n:
                    out.append(s[i + 1])
                    i += 2
                    continue
                if s[i] == q or s[i] == "\n":
                    i += 1
                    break
                i += 1
        elif ch == "#":
            while i < n and s[i] != "\n":
                i += 1
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def strip_code_comments(s: str | None, family: str | None) -> str | None:
    """Module contract: comment-free source; unknown/None family
    passes through unchanged. None -> None."""
    if s is None:
        return None
    if family == "c":
        return _strip_c(s)
    if family == "hash":
        return _strip_hash(s)
    return s


def normalize_code(s: str | None) -> str | None:
    """Dedup-key fold: rstrip each line, drop blank lines."""
    if s is None:
        return None
    return "\n".join(
        ln.rstrip() for ln in s.split("\n") if ln.strip()
    )


def strip_comments_col(col: Column | str, family: Column | str) -> Column:
    """Column expression: comment-stripped source (Arrow-batched)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _strip(s, fam):  # type: ignore[no-untyped-def]
        return pd.Series(
            [strip_code_comments(a, b) for a, b in zip(s, fam)],
            index=s.index, dtype="object",
        )

    c = F.col(col) if isinstance(col, str) else col
    f = F.col(family) if isinstance(family, str) else family
    return _strip(c, f)


def code_comment_strip(
    df: DataFrame,
    text_col: str,
    lang_col: str,
    out_col: str = "text_stripped",
    *,
    normalize: bool = True,
) -> DataFrame:
    """Add `out_col` = comment-stripped (and, by default,
    whitespace-normalized) source, with the comment family resolved
    from `lang_col` JVM-side (a literal map; unknown -> NULL family
    -> pass-through). One Arrow projection, no shuffle; feed
    `out_col` to the dedup operators for comment-insensitive keys."""
    fam_map = F.create_map(
        *[F.lit(x) for kv in LANG_COMMENT_FAMILY.items() for x in kv]
    )
    stripped = strip_comments_col(
        F.col(text_col), fam_map[F.col(lang_col)]
    )
    if normalize:
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("string")
        def _norm(s):  # type: ignore[no-untyped-def]
            return s.map(normalize_code, na_action="ignore")

        stripped = _norm(stripped)
    return df.withColumn(out_col, stripped)
