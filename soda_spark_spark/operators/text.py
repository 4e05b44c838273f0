"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language identification, document fingerprinting.

Everything is pure Catalyst (split/regexp/length/md5) so the operators run
inside whole-stage codegen at full scan speed — no Python UDFs. Formulas are
fixed-order double arithmetic so scores are reproducible across partitionings
and comparable against an external SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ._util import ensure_parallelism as _ensure_parallelism

# stopword markers per language for the n-gram/stopword language heuristic;
# deliberately tiny and deterministic (not a model)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"],
    "fr": ["le", "la", "les", "et", "est", "une", "pour", "dans", "que", "des"],
    "es": ["el", "la", "los", "las", "es", "una", "para", "que", "por", "con"],
}

EN_STOPWORDS = LANG_MARKERS["en"]


def _word_regex(words: list[str]) -> str:
    return r"\b(" + "|".join(words) + r")\b"


def token_count(text: Column) -> Column:
    """Whitespace token count; empty/blank text counts 0."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: splits on whitespace AND word/punct
    boundaries (a cheap BPE stand-in: runs of letters, runs of digits, and
    single punctuation marks each count as one token)."""
    return F.size(
        F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0))
    )


def _text_stat_exprs(t: Column) -> dict[str, Column]:
    """The per-document stat signals as COLUMN EXPRESSIONS over a text
    column — the single source of truth shared by the frame-shaped
    operators (`text_stats`, `quality_score`) and the inline pipeline
    gates (`quality_score_col`), so a gate filters the running frame
    in place with the exact expression tree the operator certifies."""
    chars = F.length(t)
    toks = token_count(t)
    stop_hits = F.size(
        F.regexp_extract_all(F.lower(t), F.lit(_word_regex(EN_STOPWORDS)), F.lit(0))
    )
    punct = chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    digits = chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    spaces = chars - F.length(F.regexp_replace(t, r"\s", ""))
    return {
        "char_count": chars,
        "token_count": toks,
        "avg_token_len": F.when(toks > 0, (chars - spaces).cast("double") / toks),
        "punct_ratio": F.when(chars > 0, punct.cast("double") / chars).otherwise(F.lit(0.0)),
        "digit_ratio": F.when(chars > 0, digits.cast("double") / chars).otherwise(F.lit(0.0)),
        "stopword_ratio": F.when(toks > 0, stop_hits.cast("double") / toks).otherwise(F.lit(0.0)),
    }


def text_stats(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-document stats: char/token counts, average token length,
    punctuation/digit/space ratios, stopword ratio. One narrow projection."""
    e = _text_stat_exprs(F.col(text_col))
    return df.select(
        F.col(id_col),
        *[e[k].alias(k) for k in (
            "char_count", "token_count", "avg_token_len",
            "punct_ratio", "digit_ratio", "stopword_ratio",
        )],
    )


def quality_score_col(t: Column) -> Column:
    """`quality_score`'s composite as one column expression (see that
    operator's docstring for the formula) — lets a pipeline gate run
    as a plain codegen `filter()` on the frame it is curating, with no
    keep-set join. Same expression tree as the operator, so values are
    bit-identical (pytest-pinned parity)."""
    e = _text_stat_exprs(t)
    len_ok = F.least(e["token_count"].cast("double") / 20.0, F.lit(1.0))
    tok_len_ok = (
        F.when((e["avg_token_len"] >= 3.0) & (e["avg_token_len"] <= 10.0), 1.0)
        .otherwise(0.0)
    )
    punct_excess = F.least(e["punct_ratio"] * 5.0, F.lit(1.0))
    stop_ok = F.least(e["stopword_ratio"] * 4.0, F.lit(1.0))
    return (
        0.25 * len_ok + 0.25 * tok_len_ok + 0.25 * (1.0 - punct_excess)
        + 0.25 * stop_ok
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic [0,1] quality score from length / punctuation / stopword
    signals (Gopher/C4-style rule scoring, simplified and deterministic):

        score = 0.25*len_ok + 0.25*tok_len_ok + 0.25*(1-punct_excess)
                + 0.25*min(stopword_ratio*4, 1)

    where len_ok = min(token_count/20, 1), tok_len_ok = 1 if mean token
    length in [3, 10] else 0, punct_excess = min(punct_ratio*5, 1).
    """
    t = F.col(text_col)
    e = _text_stat_exprs(t)
    return df.select(
        F.col(id_col),
        e["char_count"].alias("char_count"),
        e["token_count"].alias("token_count"),
        quality_score_col(t).alias("quality_score"),
    )


def clean_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    require_terminal_punct: bool = True,
    min_words: int = 5,
    blocklist: tuple[str, ...] = ("javascript",),
    keep_blank: bool = True,
) -> DataFrame:
    """C4-style line-correction pass (Raffel et al. 2020, "Exploring the
    Limits of Transfer Learning with a Unified Text-to-Text
    Transformer", public arXiv:1910.10683 §2.2): rewrite each document
    keeping only lines that (a) end in a terminal punctuation mark
    (. ! ? or a closing quote), (b) contain at least `min_words` words,
    and (c) contain no blocklisted word (case-insensitive substring;
    C4 drops any line with the word 'javascript'). The page-level C4
    rules (lorem ipsum / '{' pages) belong to a document filter —
    compose with `gopher_filter` or a plain `.filter`.

    Complements `dedup_lines` (cross-corpus boilerplate): these rules
    are per-line local, so every verdict runs as a plain codegen filter
    over the exploded lines — no counting shuffle; the only shuffle is
    the per-doc reassembly groupBy (same rebuild idiom as
    `dedup_lines`). Blank lines survive under `keep_blank` (they carry
    paragraph structure); docs whose every line is removed come back
    with empty text; null text passes through as null."""
    if min_words < 0:
        raise ValueError("min_words must be >= 0")
    lines = _ensure_parallelism(df).select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("__pos", "__line"),
    )
    ln = F.col("__line")
    ok = F.lit(True)
    if require_terminal_punct:
        # \s*$ rather than rtrim: rtrim strips only spaces, which would
        # hide the terminal mark behind a trailing tab
        ok = ok & ln.rlike("[.!?][\"'”’]?\\s*$")
    if min_words > 0:
        ok = ok & (
            F.size(F.array_remove(F.split(F.trim(ln), r"\s+"), ""))
            >= min_words
        )
    for word in blocklist:
        ok = ok & ~F.lower(ln).contains(word.lower())
    if keep_blank:
        # rlike, not trim: Spark's trim strips only spaces (0x20), so a
        # tab-only line would be mis-read as non-blank (hypothesis-caught)
        ok = ok | ln.rlike(r"^\s*$")
    kept = lines.filter(ok)
    rebuilt = (
        kept.groupBy("__id")
        .agg(F.array_sort(F.collect_list(F.struct("__pos", "__line"))).alias("__s"))
        .select(
            "__id",
            F.concat_ws("\n", F.col("__s").getField("__line")).alias("__new"),
        )
    )
    other_cols = [c for c in df.columns if c != text_col]
    return (
        df.join(rebuilt, df[id_col] == rebuilt["__id"], "left")
        .select(
            *other_cols,
            F.when(F.col(text_col).isNull(), F.lit(None).cast("string"))
            .otherwise(F.coalesce(F.col("__new"), F.lit("")))
            .alias(text_col),
        )
    )


GOPHER_REQUIRED_WORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

# published Gopher thresholds (arXiv:2112.11446 Table A1) — single source
# of truth for gopher_quality_flags and gopher_filter
GOPHER_DEFAULTS: dict[str, float | int] = dict(
    min_words=50, max_words=100_000,
    min_mean_word_len=3.0, max_mean_word_len=10.0,
    max_symbol_word_ratio=0.1, max_bullet_line_frac=0.9,
    max_ellipsis_line_frac=0.3, min_alpha_word_frac=0.8,
    min_required_word_hits=2,
)


def gopher_quality_flags(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_required_word_hits: int = 2,
) -> DataFrame:
    """Gopher quality rules as per-document per-rule booleans plus the
    overall `keep` verdict (Rae et al. 2021, "Scaling Language Models:
    Methods, Analysis & Insights from Training Gopher", public
    arXiv:2112.11446, Table A1 — the defaults are the published
    thresholds). Extends the reference's table/column test verdicts
    (reference/src/sodaspark/scan.py:394-421) from scan metrics to
    document-level curation rules.

    Rules (a doc is kept iff ALL pass):
      word_count_ok        min_words <= #words <= max_words
      mean_word_len_ok     mean word length in [3, 10]
      symbol_ratio_ok      (#'#' + #'...') / #words <= 0.1
      bullet_lines_ok      fraction of lines starting with a bullet <= 0.9
      ellipsis_lines_ok    fraction of lines ending with '...' <= 0.3
      alpha_words_ok       fraction of words containing a letter >= 0.8
      required_words_ok    >= 2 hits from {the,be,to,of,and,that,have,with}

    Pure Catalyst — every line/word count is a multiline-anchored
    `regexp_extract_all` size over the raw text (no per-element lambda
    HOFs — the interpreted-filter hazard of PLANS §14 — and the same
    patterns replay in DuckDB's RE2 for the oracle); one narrow
    projection, no shuffle, no UDF. Empty docs fail word_count_ok and
    line-free docs pass the line rules vacuously (0/0 counts as 0
    fraction — pinned in tests)."""
    n_words, flags = _gopher_flag_exprs(
        text_col,
        min_words=min_words, max_words=max_words,
        min_mean_word_len=min_mean_word_len,
        max_mean_word_len=max_mean_word_len,
        max_symbol_word_ratio=max_symbol_word_ratio,
        max_bullet_line_frac=max_bullet_line_frac,
        max_ellipsis_line_frac=max_ellipsis_line_frac,
        min_alpha_word_frac=min_alpha_word_frac,
        min_required_word_hits=min_required_word_hits,
    )
    keep = F.lit(True)
    for c in flags.values():
        keep = keep & c
    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        *[c.alias(name) for name, c in flags.items()],
        keep.alias("keep"),
    )


def _gopher_flag_exprs(
    text_col: str,
    *,
    min_words: int,
    max_words: int,
    min_mean_word_len: float,
    max_mean_word_len: float,
    max_symbol_word_ratio: float,
    max_bullet_line_frac: float,
    max_ellipsis_line_frac: float,
    min_alpha_word_frac: float,
    min_required_word_hits: int,
) -> tuple[Column, dict[str, Column]]:
    """(n_words, {rule: boolean Column}) — row-local expressions shared by
    `gopher_quality_flags` (verdict table) and `gopher_filter` (direct
    predicate, no join)."""

    def _count(pattern: str) -> Column:
        return F.size(F.regexp_extract_all(F.col(text_col), F.lit(pattern), F.lit(0)))

    t = F.col(text_col)
    n_words = F.size(F.array_remove(F.split(F.trim(t), r"\s+"), ""))
    word_chars = F.length(F.regexp_replace(t, r"\s", ""))
    mean_wlen = F.when(n_words > 0, word_chars.cast("double") / n_words)
    sym_ratio = F.when(
        n_words > 0,
        (_count(r"#") + _count(r"\.\.\.|…")).cast("double") / n_words,
    )
    # (?m): ^/$ anchor at line boundaries — one match per qualifying line
    n_lines = _count(r"(?m)^.*\S.*$")
    bullet_lines = _count(r"(?m)^[ \t]*(•|\*|-|[0-9]+[.)])[ \t]")
    ellipsis_lines = _count(r"(?m)(\.\.\.|…)[ \t]*$")
    bullet_frac = F.when(
        n_lines > 0, bullet_lines.cast("double") / n_lines
    ).otherwise(F.lit(0.0))
    ellipsis_frac = F.when(
        n_lines > 0, ellipsis_lines.cast("double") / n_lines
    ).otherwise(F.lit(0.0))
    # a word-with-letter is a maximal \S run containing [A-Za-z]
    alpha_words = _count(r"\S*[A-Za-z]\S*")
    alpha_frac = F.when(n_words > 0, alpha_words.cast("double") / n_words)
    req_hits = F.size(
        F.regexp_extract_all(
            F.lower(t), F.lit(_word_regex(GOPHER_REQUIRED_WORDS)), F.lit(0)
        )
    )
    flags = {
        "word_count_ok": (n_words >= min_words) & (n_words <= max_words),
        "mean_word_len_ok": F.coalesce(
            (mean_wlen >= min_mean_word_len) & (mean_wlen <= max_mean_word_len),
            F.lit(False),
        ),
        "symbol_ratio_ok": F.coalesce(
            sym_ratio <= max_symbol_word_ratio, F.lit(False)
        ),
        "bullet_lines_ok": bullet_frac <= max_bullet_line_frac,
        "ellipsis_lines_ok": ellipsis_frac <= max_ellipsis_line_frac,
        "alpha_words_ok": F.coalesce(
            alpha_frac >= min_alpha_word_frac, F.lit(False)
        ),
        "required_words_ok": req_hits >= min_required_word_hits,
    }
    return n_words, flags


def gopher_filter(
    df: DataFrame, id_col: str, text_col: str, **thresholds
) -> DataFrame:
    """Keep only documents passing every Gopher rule — the filter form of
    `gopher_quality_flags` (same thresholds kwargs). The rules are
    row-local, so this is a DIRECT predicate on the input — no flags
    join, no second execution of the input lineage (matters when
    composing after an expensive upstream like `clean_lines`); the
    document rows pass through untouched."""
    defaults = dict(GOPHER_DEFAULTS)
    unknown = set(thresholds) - set(defaults)
    if unknown:
        raise TypeError(f"unknown threshold(s): {sorted(unknown)}")
    defaults.update(thresholds)
    _, flags = _gopher_flag_exprs(text_col, **defaults)
    keep = F.lit(True)
    for c in flags.values():
        keep = keep & c
    return df.filter(keep)


def _lang_hit_exprs(t_lower: Column) -> dict[str, Column]:
    return {
        lang: F.size(
            F.regexp_extract_all(t_lower, F.lit(_word_regex(words)), F.lit(0))
        )
        for lang, words in LANG_MARKERS.items()
    }


def _predicted_lang_from_hits(hits: dict[str, Column]) -> Column:
    langs = list(LANG_MARKERS)
    best = F.greatest(*[hits[lang] for lang in langs])
    pred = F.lit("und")
    # reverse order so earlier languages win ties via later override
    for lang in reversed(langs):
        pred = F.when(hits[lang] == best, F.lit(lang)).otherwise(pred)
    return F.when(best > 0, pred).otherwise(F.lit("und"))


def predicted_lang_col(t: Column) -> Column:
    """`language_id`'s argmax verdict as one column expression — lets a
    pipeline language gate run as a plain codegen `filter()` with no
    keep-set join. Identical marker counting and tie order to the
    operator (shared helpers; parity pytest-pinned). Codegen's common-
    subexpression elimination computes each marker count once despite
    its multiple appearances in the argmax chain."""
    return _predicted_lang_from_hits(_lang_hit_exprs(F.lower(t)))


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Language ID by stopword-marker voting: count marker-word hits per
    language, pick the argmax (ties broken by language code order,
    'und' = undetermined when nothing hits). A deterministic heuristic, not a
    model — suitable as a cheap first-pass filter at scale."""
    hits = _lang_hit_exprs(F.lower(F.col(text_col)))
    scored = df.select(
        F.col(id_col),
        F.col(text_col),
        *[hits[lang].alias(f"__{lang}") for lang in LANG_MARKERS],
    )
    pred = _predicted_lang_from_hits(
        {lang: F.col(f"__{lang}") for lang in LANG_MARKERS}
    )
    return scored.select(
        id_col,
        pred.alias("predicted_lang"),
        *[F.col(f"__{lang}").alias(f"hits_{lang}") for lang in LANG_MARKERS],
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Canonical content fingerprint: md5 of whitespace-normalized lowercase
    text. Identical content (module whitespace/case) -> identical fingerprint;
    usable as an exact-dedup key that survives reformatting."""
    normalized = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.select(
        F.col(id_col),
        F.md5(normalized).alias("fingerprint"),
    )


def _winnowing_fingerprints_arrow(
    df: DataFrame, id_col: str, text_col: str, k: int, window: int,
    hash_fn: str, seed: int,
) -> DataFrame:
    """Arrow-batched winnowing sketches (`mapInPandas`), md5 or xxhash64.

    The Catalyst formulation below is pure built-ins but its two nested
    array lambdas are INTERPRETED per gram — measured ~25s for 500 docs at
    local[32], which extrapolates to never finishing at corpus scale. This
    path computes the identical values at Arrow batch granularity:

    - md5: hashlib md5 == Spark md5 == DuckDB md5 (first 15 hex chars as a
      60-bit int) — the DuckDB-oracle certification configuration.
    - xxhash64: `functions/xxhash.spark_xxhash64_strings`, a numpy-
      vectorized XXH64 bit-exact against `F.xxhash64(gram, F.lit(seed))`
      (parity pinned by tests), hashed once per BATCH across all grams.

    Token splitting replicates `split(trim(text), '\\s+')` exactly: trim
    strips ASCII spaces only; `re.ASCII` makes Python's \\s match Java
    regex / RE2 ([ \\t\\n\\r\\f\\x0b] — no Unicode whitespace like NBSP);
    split keeps leading/trailing empty tokens. The per-window min and the
    first-occurrence distinct are vectorized numpy (sliding_window_view +
    unique-by-first-index).
    """
    import numpy as np
    import pandas as pd  # noqa: F401  (mapInPandas contract)

    from ..functions.xxhash import spark_xxhash64_strings

    id_type = dict(zip(df.schema.names, df.schema))[id_col].dataType.simpleString()
    out_schema = f"`{id_col}` {id_type}, fingerprints array<bigint>"

    def _select(mins: "np.ndarray") -> list[int]:
        # distinct, first-occurrence order — matches array_distinct
        _, first = np.unique(mins, return_index=True)
        return mins[np.sort(first)].tolist()

    def sketch(batches):
        import hashlib
        import re

        for pdf in batches:
            ids, gram_counts, all_grams = [], [], []
            for ident, t in zip(pdf[id_col], pdf[text_col]):
                toks = (
                    []
                    if t is None
                    else re.split(r"\s+", t.strip(" "), flags=re.ASCII)
                )
                n = len(toks)
                if n >= k + window - 1:
                    all_grams.extend(
                        " ".join(toks[j : j + k]) for j in range(n - k + 1)
                    )
                    gram_counts.append(n - k + 1)
                else:
                    gram_counts.append(0)
                ids.append(ident)
            if hash_fn == "xxhash64":
                hs = spark_xxhash64_strings(all_grams, seed)
            else:
                hs = np.fromiter(
                    (
                        int(hashlib.md5(g.encode("utf-8")).hexdigest()[:15], 16)
                        for g in all_grams
                    ),
                    dtype=np.int64,
                    count=len(all_grams),
                )
            fps, pos = [], 0
            for g in gram_counts:
                if g == 0:
                    fps.append([])
                    continue
                mins = np.lib.stride_tricks.sliding_window_view(
                    hs[pos : pos + g], window
                ).min(axis=1)
                fps.append(_select(mins))
                pos += g
            yield pd.DataFrame({id_col: ids, "fingerprints": fps})

    import pandas as pd

    return df.select(id_col, text_col).mapInPandas(sketch, out_schema)


def winnowing_fingerprints(
    df: DataFrame, id_col: str, text_col: str, *, k: int = 5, window: int = 4,
    seed: int = 42, hash_fn: str = "xxhash64", impl: str = "auto",
) -> DataFrame:
    """Winnowing (MOSS-style) document sketches: hash every word k-gram, keep
    the minimum hash of each sliding window of `window` consecutive k-grams.
    Output is the distinct set of selected hashes per document — a compact,
    position-robust sketch for plagiarism-style overlap detection.

    `hash_fn`: 'xxhash64' (default; seeded) or 'md5' — 60-bit hash from the
    first 15 hex chars of md5(gram), replayable by any engine with a
    standard md5 (the DuckDB-oracle certification configuration).

    `impl`: 'auto' (default) routes BOTH hash functions to an Arrow-batched
    `mapInPandas` kernel (~10x the interpreted-HOF throughput; identical
    values — the xxhash64 kernel is a numpy XXH64 bit-exact against
    `F.xxhash64`, parity pinned by tests); 'catalyst' forces the pure
    built-ins formulation (no Python workers — e.g. a JVM-only cluster);
    'arrow' forces the kernel."""
    if impl not in ("auto", "arrow", "catalyst"):
        raise ValueError(f"unknown impl {impl!r}")
    if hash_fn not in ("md5", "xxhash64"):
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    if impl in ("auto", "arrow"):
        df = _ensure_parallelism(df)
        return _winnowing_fingerprints_arrow(
            df, id_col, text_col, k, window, hash_fn, seed
        )
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_grams = F.greatest(F.size(toks) - F.lit(k - 1), F.lit(0))
    if hash_fn == "md5":
        hash_one = lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")  # noqa: E731
    elif hash_fn == "xxhash64":
        hash_one = lambda s: F.xxhash64(s, F.lit(seed))  # noqa: E731
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    gram_hashes = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: hash_one(F.concat_ws(" ", F.slice(toks, i, k))),
    )
    n_windows = F.greatest(F.size(gram_hashes) - F.lit(window - 1), F.lit(0))
    mins = F.transform(
        F.sequence(F.lit(1), n_windows),
        lambda i: F.array_min(F.slice(gram_hashes, i, window)),
    )
    df = _ensure_parallelism(df)  # interpreted HOFs: avoid one-core inputs
    return df.select(
        F.col(id_col),
        F.array_distinct(
            F.when(F.size(toks) >= k + window - 1, mins).otherwise(F.array())
        ).alias("fingerprints"),
    )


def winnowing_overlap_pairs(
    df: DataFrame | None,
    id_col: str,
    text_col: str,
    *,
    k: int = 5,
    window: int = 4,
    min_shared: int = 2,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    max_fp_freq: int | None = None,
    sketches: DataFrame | None = None,
) -> DataFrame:
    """Document pairs sharing winnowing fingerprints — the MOSS-style
    plagiarism/overlap JOIN over the compressed sketches, instead of raw
    n-grams: sketch size is ~2/(window+1) of the gram count, so the
    pair-generating equi-join moves a fraction of the data the exact
    n-gram join would.

    Plan: fingerprints explode to (id, fp) rows, self-join on fp with
    id_a < id_b, count shared fingerprints per pair, derive
    `overlap = shared / min(|fp_a|, |fp_b|)`. `max_fp_freq` drops
    fingerprints appearing in more than that many documents (the stop-gram
    guard against join blowup on boilerplate). Returns
    (id_a, id_b, shared, overlap) with shared >= min_shared.

    `sketches`: a persisted `winnowing_fingerprints` table (id_col +
    `fingerprints`, typically read back from parquet). When given, `df`
    is ignored (pass None) and raw text is never touched — sketch each
    snapshot once, store the sketches, and run overlap audits against
    the stored tables (same persisted-artifact contract as
    `minhash_band_tags`/`ivf_index`/`benchmark_ngrams`). The (k, window,
    seed, hash_fn) geometry must match the build; the caller owns that
    contract.
    """
    if sketches is not None:
        missing = {id_col, "fingerprints"} - set(sketches.columns)
        if missing:
            raise ValueError(
                f"sketches is missing column(s) {sorted(missing)}; expected "
                "a winnowing_fingerprints table"
            )
        fps = sketches
    elif df is None:
        raise ValueError("df is required unless sketches is given")
    else:
        fps = winnowing_fingerprints(
            df, id_col, text_col, k=k, window=window, seed=seed, hash_fn=hash_fn
        )
        # The sketch projection is an interpreted-HOF chain (hash per gram,
        # min per window) — by far the dominant cost. Without a persist the
        # self-join (both sides), the size pass, and the freq guard would
        # each recompute it from the raw text; materializing the compressed
        # sketches once is the MOSS design (sketches are ~2/(window+1) of
        # gram volume, tiny next to the corpus, and spill to disk if not).
        # (A parquet-backed `sketches` table is already materialized, so
        # that path skips the persist.)
        fps = fps.persist()
    # Per-doc sketch sizes RIDE THE MELT (round 20): one extra int per
    # (id, fp) row through the join exchange, collapsed by min() in the
    # pair aggregate (constant within the group), instead of two
    # post-aggregate joins attaching a sizes table to the PAIR-grain
    # result. At sketch scale the sizes side stops being broadcastable
    # and those joins become pair-grain shuffles; carrying the int is
    # strictly cheaper (guide §8: attach the plan without a join that
    # sneaks the shuffle back in). Docs with empty sketches produce no
    # melted rows, so the old `__n > 0` sizes filter is subsumed.
    melted = fps.select(
        F.col(id_col).alias("__id"),
        F.explode("fingerprints").alias("__fp"),
        F.size("fingerprints").alias("__n"),
    )
    if max_fp_freq is not None:
        freq = melted.groupBy("__fp").agg(F.count(F.lit(1)).alias("__df"))
        melted = melted.join(
            freq.filter(F.col("__df") <= max_fp_freq), "__fp"
        ).drop("__df")
        # surviving-fp count per doc over the (__id) window — the join
        # above already shuffled on __fp, this is the only extra exchange
        melted = melted.withColumn(
            "__n", F.count(F.lit(1)).over(Window.partitionBy("__id"))
        )
    a, b = melted.alias("a"), melted.alias("b")
    return (
        a.join(
            b,
            (F.col("a.__fp") == F.col("b.__fp"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .groupBy(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .agg(
            F.count(F.lit(1)).alias("shared"),
            F.min(F.col("a.__n")).alias("__na"),
            F.min(F.col("b.__n")).alias("__nb"),
        )
        .select(
            "id_a",
            "id_b",
            "shared",
            (
                F.col("shared").cast("double")
                / F.least(F.col("__na"), F.col("__nb"))
            ).alias("overlap"),
        )
        .filter(F.col("shared") >= min_shared)
    )


def repetition_fraction_exprs(t: Column) -> dict[str, Column]:
    """`repetition_stats`' three PER-ROW fractions (dup_line /
    dup_line_char / dup_token) as column expressions — the signals that
    need no cross-row aggregation, shared with the inline pipeline
    gate. top_bigram_fraction is NOT here: its per-document max needs
    the explode+groupBy channel, so a gate on it keeps the keep-set
    join (see `repetition_stats`)."""
    lines = F.filter(F.split(t, "\n"), lambda x: F.length(F.trim(x)) > 0)
    n_lines = F.size(lines)
    d_lines = F.size(F.array_distinct(lines))
    line_chars = F.aggregate(
        lines, F.lit(0), lambda acc, x: acc + F.length(x)
    )
    distinct_line_chars = F.aggregate(
        F.array_distinct(lines), F.lit(0), lambda acc, x: acc + F.length(x)
    )
    toks = F.split(F.trim(t), r"\s+")
    toks = F.when(
        F.length(F.trim(t)) == 0, F.array().cast("array<string>")
    ).otherwise(toks)
    n_toks = F.size(toks)
    d_toks = F.size(F.array_distinct(toks))
    return {
        "dup_line_fraction": F.when(
            n_lines > 0, (n_lines - d_lines).cast("double") / n_lines
        ).otherwise(F.lit(0.0)),
        "dup_line_char_fraction": F.when(
            line_chars > 0,
            (line_chars - distinct_line_chars).cast("double") / line_chars,
        ).otherwise(F.lit(0.0)),
        "dup_token_fraction": F.when(
            n_toks > 0, (n_toks - d_toks).cast("double") / n_toks
        ).otherwise(F.lit(0.0)),
    }


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Within-document repetition signals (Gopher/RefinedWeb-style quality
    rules, public heuristics): duplicate-line fraction, duplicate-line
    character fraction, duplicate-token fraction, and the fraction of word
    bigrams taken by the single most frequent bigram.

    The line/token fractions are per-row Catalyst array arithmetic (O(n)
    per document, no shuffle). The top-bigram count is LINEAR too: bigrams
    explode to rows, a (id, bigram) groupBy counts occurrences (map-side
    partial aggregation collapses repeats before the shuffle), a per-id max
    takes the winner, and the scalar joins back onto the per-row stats.
    The previous formulation — array_max over transform(distinct, d ->
    size(filter(bigrams, = d))) — was O(distinct x n) interpreted-HOF work
    per document: invisible on 500-char rows, a scale-killer on 100k-token
    web documents. The explode path trades two uniform-key shuffles (bigram
    counts, per-id join) for per-row linearity; the bigram-explode branch
    scans only (id, text), so the second scan is column-pruned.
    """
    t = F.col(text_col)
    lines = F.filter(F.split(t, "\n"), lambda x: F.length(F.trim(x)) > 0)
    n_lines = F.size(lines)
    d_lines = F.size(F.array_distinct(lines))
    line_chars = F.aggregate(
        lines, F.lit(0), lambda acc, x: acc + F.length(x)
    )
    # characters inside lines that appear more than once: total minus one
    # occurrence's worth of each distinct line
    distinct_line_chars = F.aggregate(
        F.array_distinct(lines), F.lit(0), lambda acc, x: acc + F.length(x)
    )
    toks = F.split(F.trim(t), r"\s+")
    toks = F.when(F.length(F.trim(t)) == 0, F.array().cast("array<string>")).otherwise(toks)
    n_toks = F.size(toks)
    d_toks = F.size(F.array_distinct(toks))
    # arrays_zip of two shifted slices instead of an interpreted
    # transform(sequence, lambda element_at) HOF — same ~9x interpreted-
    # vs-codegen gap as word_shingles
    bigrams = F.transform(
        F.arrays_zip(
            F.slice(toks, 1, n_toks - 1), F.slice(toks, 2, n_toks - 1)
        ),
        lambda s: F.concat_ws(" ", s.getField("0"), s.getField("1")),
    )
    bigrams = F.when(n_toks >= 2, bigrams).otherwise(F.array().cast("array<string>"))
    src = _ensure_parallelism(df)
    stats = src.select(
        F.col(id_col),
        n_lines.alias("__nl"),
        d_lines.alias("__dl"),
        line_chars.alias("__lc"),
        distinct_line_chars.alias("__dlc"),
        n_toks.alias("__nt"),
        d_toks.alias("__dt"),
        F.size(bigrams).alias("__nbg"),
    )
    # top bigram per document: explode -> count per (id, bigram) -> max per
    # id; partial aggregation keeps the shuffle at distinct-bigrams volume
    top = (
        src.select(F.col(id_col), F.explode(bigrams).alias("__b"))
        .groupBy(id_col, "__b")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy(id_col)
        .agg(F.max("__c").alias("__top"))
    )
    return (
        stats.join(top, id_col, "left")
        .select(
            id_col,
            F.when(
                F.col("__nl") > 0,
                (F.col("__nl") - F.col("__dl")).cast("double") / F.col("__nl"),
            ).otherwise(F.lit(0.0)).alias("dup_line_fraction"),
            F.when(
                F.col("__lc") > 0,
                (F.col("__lc") - F.col("__dlc")).cast("double") / F.col("__lc"),
            ).otherwise(F.lit(0.0)).alias("dup_line_char_fraction"),
            F.when(
                F.col("__nt") > 0,
                (F.col("__nt") - F.col("__dt")).cast("double") / F.col("__nt"),
            ).otherwise(F.lit(0.0)).alias("dup_token_fraction"),
            F.when(
                F.col("__nbg") > 0,
                F.col("__top").cast("double") / F.col("__nbg"),
            ).otherwise(F.lit(0.0)).alias("top_bigram_fraction"),
        )
    )


# conservative patterns valid in BOTH Java regex (Spark) and RE2 (DuckDB):
# no lookaround, no backreferences
URL_RE = r"https?://[^\s]+"
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"
PHONE_RE = r"\+[0-9][0-9() -]{6,}[0-9]"


def pii_count_exprs(t: Column) -> dict[str, Column]:
    """`pii_counts`' four pattern counts as column expressions over a
    text column (shared with the inline pipeline gate)."""

    def n(pattern: str) -> Column:
        return F.size(F.regexp_extract_all(t, F.lit(pattern), F.lit(0)))

    return {
        "url_count": n(URL_RE),
        "email_count": n(EMAIL_RE),
        "ipv4_count": n(IPV4_RE),
        "phone_count": n(PHONE_RE),
    }


def pii_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document counts of PII-ish surface patterns (URLs, emails, IPv4
    addresses, international-format phone numbers) — the redaction /
    filtering pre-pass of a training-data pipeline. Pure regexp_extract_all
    counts; patterns are deliberately lookaround-free so they behave
    identically under Java regex and RE2."""
    e = pii_count_exprs(F.col(text_col))
    return df.select(
        F.col(id_col),
        *[e[k].alias(k) for k in
          ("url_count", "email_count", "ipv4_count", "phone_count")],
    )


NBSP_CLASS = "[\u00a0\u2007\u202f]"


def normalize_text(
    df: DataFrame,
    text_col: str,
    *,
    lowercase: bool = True,
    collapse_whitespace: bool = True,
    strip_control: bool = True,
    normalize_nbsp: bool = False,
    out_col: str | None = None,
) -> DataFrame:
    """Canonical text normalization — the first step of every dedup /
    fingerprint / tokenize pipeline, exposed as its own operator so the
    same canonical form is shared across them: strip C0/C1 control
    characters, collapse whitespace runs to single spaces, trim, lower.

    `normalize_nbsp=True` (opt-in) first maps the non-breaking space
    family (U+00A0 NBSP, U+2007 figure space, U+202F narrow NBSP) to
    plain spaces — ONE extra regexp_replace. `html_to_text`
    deliberately keeps U+00A0 as content (engine-replayability) and
    `script_share_condition` counts it as non-whitespace evidence, so
    an NBSP-padded spam page slightly deflates its script share and
    inflates every length signal; this step re-bases those signals
    without touching the extractor's contract. Applied FIRST, so with
    `collapse_whitespace` the mapped spaces fold into runs (Java/RE2
    `\\s` is ASCII-only and would never collapse the raw codepoints).

    Pure Catalyst regexp_replace chain inside whole-stage codegen (no
    UDF); the patterns are lookaround-free and escape-only, so Java regex
    and RE2 agree — the DuckDB oracle replays the normalization
    bit-for-bit. Writes `out_col` (default: replaces `text_col`)."""
    t: Column = F.col(text_col)
    if normalize_nbsp:
        t = F.regexp_replace(t, NBSP_CLASS, " ")
    if strip_control:
        t = F.regexp_replace(t, r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", "")
    if collapse_whitespace:
        t = F.trim(F.regexp_replace(t, r"\s+", " "))
    if lowercase:
        t = F.lower(t)
    return df.withColumn(out_col or text_col, t)


# redaction replacement tokens, applied in this order (URL first so an
# email-like userinfo inside a URL is consumed by the URL rule)
REDACTION_RULES: list[tuple[str, str, str]] = [
    ("url", URL_RE, "<URL>"),
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ipv4", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
]


def redact_pii(
    df: DataFrame,
    text_col: str,
    *,
    kinds: list[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Masked-output PII redaction: replace every URL / email / IPv4 /
    phone occurrence with a typed placeholder token — the action step
    behind `pii_counts` (which only measures). Same lookaround-free
    patterns as `pii_counts`, so count-then-redact pipelines see
    consistent hits, and the regexes behave identically under Java regex
    and RE2 (DuckDB-replayable).

    Rules apply in REDACTION_RULES order (URL before email so userinfo
    inside URLs is consumed by the URL rule). `kinds` selects a subset,
    e.g. ['email', 'ipv4']. Pure Catalyst regexp_replace chain — stays
    in whole-stage codegen at full scan speed. Writes `out_col`
    (default: replaces `text_col`)."""
    active = {k for k in (kinds or [r[0] for r in REDACTION_RULES])}
    unknown = active - {r[0] for r in REDACTION_RULES}
    if unknown:
        raise ValueError(f"unknown redaction kinds: {sorted(unknown)}")
    t: Column = F.col(text_col)
    for name, pattern, token in REDACTION_RULES:
        if name in active:
            t = F.regexp_replace(t, pattern, token)
    return df.withColumn(out_col or text_col, t)


URL_HOST_RE = r"https?://([^/\s:?#]+)"


def url_domains(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, domain) for every URL occurrence in each document — the
    exploded base of domain-level curation (per-domain filtering, URL-based
    dedup, licensing audits). Hosts are lowercased; the pattern is
    lookaround-free (identical under Java regex and RE2)."""
    return df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(URL_HOST_RE), F.lit(1))
        ).alias("domain"),
    ).withColumn("domain", F.lower(F.col("domain")))


def domain_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-domain corpus rollup: URL occurrence count and distinct-document
    count per host — the table behind web-pipeline domain blocklists and
    per-domain caps. One shuffle on the domain (uniformly hashable; a
    mega-domain is one hot KEY but the aggregate is a count, so map-side
    partial aggregation absorbs the skew)."""
    d = url_domains(df, id_col, text_col)
    return d.groupBy("domain").agg(
        F.count(F.lit(1)).alias("url_count"),
        F.count_distinct(F.col(id_col)).alias("doc_count"),
    )


def token_corpus_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    rare_max_count: int = 1,
    lowercase: bool = True,
) -> DataFrame:
    """Per-document corpus-frequency quality signals: for each document,
    how common its tokens are in the WHOLE corpus — the distribution-aware
    complement to the per-document heuristics in `text_stats`. A high
    rare-token fraction flags OCR noise, codes/hashes, boilerplate-free
    gibberish; a very high average corpus frequency flags templated
    boilerplate. (The corpus-fit idea behind CCNet-style LM filtering,
    reduced to exact counting so two engines agree bit-for-bit: no
    transcendental logprob whose last-ulp could differ between libm
    implementations.)

    Returns (id, n_tokens, n_distinct_tokens, avg_token_corpus_freq,
    rare_token_fraction) where rare means corpus count <= `rare_max_count`.

    Plan shape (round 20): ONE explode -> per-(doc, token) tf groupBy ->
    corpus frequency aggregated FROM the per-doc tf table (sum of tf by
    token — its input is the distinct (doc, token) pair set, far smaller
    than the occurrence stream) -> pair-grain join back -> per-doc
    aggregate with tf-weighted sums. Versus the previous shape this
    scans/explodes the corpus once instead of twice, joins at the pair
    grain instead of the occurrence grain (the Zipf-head token skew hits
    a deduplicated, much smaller build side), and needs no
    count_distinct (distinct tokens = the pair rows themselves). The
    weighted frequency sum tf * DECIMAL(38,6) ctf equals the old
    per-occurrence decimal sum exactly (integer-valued decimal products,
    no rounding), so the average stays order-independent and
    engine-exact; the two fractions are single double divisions of
    exact integers."""
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    if lowercase:
        toks = toks.withColumn("tok", F.lower(F.col("tok")))
    tf_doc = toks.groupBy("__id", "tok").agg(F.count(F.lit(1)).alias("__tf"))
    cf = tf_doc.groupBy("tok").agg(F.sum("__tf").alias("__ctf"))
    joined = tf_doc.join(cf, "tok")
    n = F.sum("__tf")
    return (
        joined.groupBy("__id")
        .agg(
            n.alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct_tokens"),
            (
                F.sum(
                    F.col("__tf") * F.col("__ctf").cast(T.DecimalType(38, 6))
                ).cast("double")
                / n
            ).alias("avg_token_corpus_freq"),
            (
                F.sum(
                    F.when(
                        F.col("__ctf") <= rare_max_count, F.col("__tf")
                    ).otherwise(F.lit(0))
                ).cast("double")
                / n
            ).alias("rare_token_fraction"),
        )
        .withColumnRenamed("__id", id_col)
    )


def ngram_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 2,
    k: int = 50,
    min_count: int = 2,
    lowercase: bool = True,
) -> DataFrame:
    """Corpus-wide most-frequent word n-grams — the boilerplate/template
    detection table (a phrase appearing in thousands of documents is a
    nav bar, a cookie banner, or a license header, and feeds stop-gram
    lists for the dedup/LSH pipeline). Counts ALL occurrences (unlike
    `word_shingles`, which distincts per doc for Jaccard).

    Returns the top `k` rows (ngram, occurrences, doc_count) ranked by
    (occurrences desc, ngram asc) — total-order deterministic, so the
    k-boundary is tie-stable. `min_count` prunes the long singleton tail
    BEFORE the ordering (at web scale the singleton grams dwarf
    everything; cutting them first keeps the top-k heap input small).

    Plan: per-doc gram construction via slice + arrays_zip — NON-lambda
    builtins that stay inside whole-stage codegen (the equivalent
    transform(sequence, lambda) HOF is INTERPRETED per gram: measured 8x
    slower on a 100k-doc corpus, the same hazard class as the winnowing
    HOF) -> explode -> groupBy gram (map-side partials absorb the Zipf
    head) -> distributed partial top-k (TakeOrderedAndProject), so only
    k rows ever reach the driver side of the sort."""
    if n < 1 or k < 1:
        raise ValueError("n and k must be >= 1")
    t = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    toks = F.split(F.trim(t), r"\s+")
    m = F.size(toks) - F.lit(n - 1)
    # arrays_zip of the n shifted slices: row i of the zip is the gram
    # starting at token i (slice lengths all m, so the zip never pads)
    zipped = F.arrays_zip(*[F.slice(toks, i + 1, m) for i in range(n)])
    g = df.select(
        F.col(id_col).alias("__id"),
        F.explode(F.when(m > 0, zipped).otherwise(F.array())).alias("__z"),
    ).select(
        "__id",
        F.concat_ws(
            " ", *[F.col("__z").getField(str(i)) for i in range(n)]
        ).alias("ngram"),
    )
    counts = (
        g.groupBy("ngram")
        .agg(
            F.count(F.lit(1)).alias("occurrences"),
            F.count_distinct(F.col("__id")).alias("doc_count"),
        )
        .filter(F.col("occurrences") >= min_count)
    )
    return counts.orderBy(F.desc("occurrences"), F.asc("ngram")).limit(k)


def distinctive_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 5,
    lowercase: bool = True,
    broadcast_vocab_limit: int | None = None,
) -> DataFrame:
    """Top-k most distinctive terms per document, ranked by (corpus
    frequency ASC, in-doc tf DESC, term ASC) — the exact-integer analogue
    of tf-idf ranking (idf is monotone decreasing in corpus frequency, so
    rarity-first ordering selects the same 'what makes this doc special'
    terms without a transcendental log whose last ulp could differ across
    engines). Feeds keyword labeling, routing, and cluster naming.

    Returns (id, term, tf, corpus_freq, rank); total-order-deterministic
    tiebreaks make the k-boundary stable. Plan: explode -> per-(doc,term)
    tf groupBy -> corpus-frequency groupBy -> term-keyed join -> per-doc
    ranked window. Shuffles key on term/doc hashes (uniform for the
    groupBys) — but the tf-cf JOIN key is the raw term, and Zipf-head
    terms ('the' is in ~every doc) make that a skewed shuffle.

    `broadcast_vocab_limit`: skew hardening for the join. When set, the
    distinct vocabulary is counted with an early-exit probe
    (limit(n+1).count(), one bounded extra job); if it fits, the
    corpus-frequency side is BROADCAST — the tf side then never
    shuffles on the term at all (plan asserts BroadcastHashJoin in
    tests) and the Zipf head is irrelevant. Above the limit (or at the
    default None) the shuffle join stands and AQE's skew-join splitting
    handles hot keys at runtime. Values are identical either way —
    pinned by tests."""
    if k < 1:
        raise ValueError("k must be >= 1")
    t = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    occ = df.select(
        F.col(id_col).alias("__id"),
        F.explode(F.split(F.trim(t), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    tf_doc = occ.groupBy("__id", "term").agg(F.count(F.lit(1)).alias("tf"))
    cf = occ.groupBy("term").agg(F.count(F.lit(1)).alias("corpus_freq"))
    if (
        broadcast_vocab_limit is not None
        and cf.limit(broadcast_vocab_limit + 1).count() <= broadcast_vocab_limit
    ):
        cf = F.broadcast(cf)
    w = Window.partitionBy("__id").orderBy(
        F.asc("corpus_freq"), F.desc("tf"), F.asc("term")
    )
    return (
        tf_doc.join(cf, "term")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__id").alias(id_col),
            "term",
            F.col("tf"),
            F.col("corpus_freq"),
            F.col("rank"),
        )
    )


def vocab_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str,
    *,
    lowercase: bool = True,
    top_k: int = 0,
) -> DataFrame:
    """Cross-snapshot vocabulary drift report — the corpus-monitoring
    analogue of the reference's scan-over-time checks (metric history,
    reference/src/sodaspark/scan.py:430) applied to text content: did
    this week's crawl shift vocabulary against last week's?

    One summary row of exact integers finished with fixed-order double
    divisions (engine-exact, DuckDB-replayable):
      n_tokens_a/b          total token occurrences per snapshot
      vocab_a/b             distinct tokens per snapshot
      shared_vocab          distinct tokens present in BOTH
      gained_vocab          in B only (new vocabulary)
      lost_vocab            in A only (vanished vocabulary)
      vocab_jaccard         shared / (vocab_a + vocab_b - shared)
      l1_freq_drift         sum over the union vocabulary of
                            |freq_a(t) - freq_b(t)| where freq is the
                            per-snapshot relative token frequency — the
                            total-variation-style distance in [0, 2],
                            computed as one double sum of per-token
                            exact-count ratios (order-independent up to
                            float addition; certified via the integer
                            columns, pytest-pinned for the float).

    With `top_k > 0`, returns instead the top-k tokens by absolute
    count-share change (the "what moved" drill-down), columns
    (token, c_a, c_b, share_a, share_b). Plan: one token explode +
    count per side, one full-outer join on token (uniform key),
    one-row aggregate — no driver collections."""
    def counts(df: DataFrame, suffix: str) -> DataFrame:
        t = F.col(text_col)
        if lowercase:
            t = F.lower(t)
        return (
            _ensure_parallelism(df)
            .select(F.explode(F.array_remove(F.split(F.trim(t), r"\s+"), "")).alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias(f"c_{suffix}"))
        )

    joined = counts(df_a, "a").join(counts(df_b, "b"), "token", "full_outer")
    ca = F.coalesce(F.col("c_a"), F.lit(0))
    cb = F.coalesce(F.col("c_b"), F.lit(0))
    if top_k > 0:
        tot = joined.agg(
            F.sum(ca).alias("__na"), F.sum(cb).alias("__nb")
        )
        share_a = ca.cast("double") / F.col("__na").cast("double")
        share_b = cb.cast("double") / F.col("__nb").cast("double")
        return (
            joined.crossJoin(F.broadcast(tot))
            .select(
                "token",
                ca.alias("c_a"),
                cb.alias("c_b"),
                share_a.alias("share_a"),
                share_b.alias("share_b"),
            )
            .orderBy(
                F.abs(F.col("share_a") - F.col("share_b")).desc(),
                F.col("token"),
            )
            .limit(top_k)
        )
    na = F.sum(ca)
    nb = F.sum(cb)
    va = F.sum((ca > 0).cast("long"))
    vb = F.sum((cb > 0).cast("long"))
    shared = F.sum(((ca > 0) & (cb > 0)).cast("long"))
    agg = joined.agg(
        na.alias("n_tokens_a"),
        nb.alias("n_tokens_b"),
        va.alias("vocab_a"),
        vb.alias("vocab_b"),
        shared.alias("shared_vocab"),
    )
    # l1 drift needs the totals first -> second pass over the joined
    # counts with the one-row totals broadcast (counts are computed in
    # the same plan; Spark reuses the exchange for both aggregates)
    tot = joined.agg(na.alias("__na"), nb.alias("__nb"))
    l1 = (
        joined.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.abs(
                    ca.cast("double") / F.col("__na").cast("double")
                    - cb.cast("double") / F.col("__nb").cast("double")
                )
            ).alias("l1_freq_drift")
        )
    )
    return agg.crossJoin(l1).select(
        "n_tokens_a",
        "n_tokens_b",
        "vocab_a",
        "vocab_b",
        "shared_vocab",
        (F.col("vocab_b") - F.col("shared_vocab")).alias("gained_vocab"),
        (F.col("vocab_a") - F.col("shared_vocab")).alias("lost_vocab"),
        (
            F.col("shared_vocab").cast("double")
            / (F.col("vocab_a") + F.col("vocab_b") - F.col("shared_vocab")).cast("double")
        ).alias("vocab_jaccard"),
        "l1_freq_drift",
    )


def corpus_health(
    df: DataFrame, id_col: str, text_col: str, group_cols: list[str]
) -> DataFrame:
    """Per-group corpus health dashboard: the rollup a multi-source
    training pipeline watches per ingestion source — doc counts, size
    totals/averages, and corpus-level punctuation/digit/stopword ratios
    plus the fraction of URL-bearing docs. The grouped counterpart of the
    per-document `text_stats`.

    Every aggregate is a SUM of per-row INTEGER counts (exact, order-
    independent) finished with one double division — bit-identical under
    any partitioning and engine-exact against a SQL replay; ratios here
    are corpus-level (sum of hits / sum of tokens), not means of per-doc
    ratios. One shuffle on the group key; map-side partials absorb any
    source skew since every aggregate is a sum."""
    t = F.col(text_col)
    chars = F.length(t)
    toks = token_count(t)
    stop_hits = F.size(
        F.regexp_extract_all(F.lower(t), F.lit(_word_regex(EN_STOPWORDS)), F.lit(0))
    )
    punct = chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    digits = chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    has_url = (F.size(F.regexp_extract_all(t, F.lit(URL_RE), F.lit(0))) > 0).cast(
        "long"
    )
    per = df.select(
        *[F.col(c) for c in group_cols],
        chars.cast("long").alias("__c"),
        toks.cast("long").alias("__t"),
        stop_hits.cast("long").alias("__s"),
        punct.cast("long").alias("__p"),
        digits.cast("long").alias("__d"),
        has_url.alias("__u"),
    )
    n = F.count(F.lit(1))
    return per.groupBy(*group_cols).agg(
        n.alias("n_docs"),
        F.sum("__c").alias("total_chars"),
        F.sum("__t").alias("total_tokens"),
        (F.sum("__c").cast("double") / n).alias("avg_chars"),
        (F.sum("__t").cast("double") / n).alias("avg_tokens"),
        F.when(F.sum("__c") > 0, F.sum("__p").cast("double") / F.sum("__c")).alias(
            "punct_ratio"
        ),
        F.when(F.sum("__c") > 0, F.sum("__d").cast("double") / F.sum("__c")).alias(
            "digit_ratio"
        ),
        F.when(F.sum("__t") > 0, F.sum("__s").cast("double") / F.sum("__t")).alias(
            "stopword_ratio"
        ),
        (F.sum("__u").cast("double") / n).alias("url_doc_fraction"),
    )


def compression_ratio(
    df: DataFrame, id_col: str, text_col: str, *, level: int = 6
) -> DataFrame:
    """Per-document zlib compression ratio (compressed/raw bytes) — the
    Gopher-style repetitiveness signal that n-gram statistics miss:
    templated or highly self-similar text compresses far below ~0.4 while
    natural prose sits around 0.5-0.7. Deterministic for a fixed `level`
    (the DEFLATE stream for given input+settings is reproducible), so
    thresholds are portable across runs and engines.

    No SQL engine exposes DEFLATE, so this operator is pytest-certified
    (not DuckDB-oracled). The kernel is an Arrow-batched `mapInPandas` —
    one Python invocation per record batch, zlib in C per document —
    never a per-row Python UDF. Returns (id, raw_bytes, compressed_bytes,
    compression_ratio); empty/NULL text yields ratio NULL."""
    import zlib

    from pyspark.sql import types as _T

    id_field = df.schema[id_col]
    out_schema = _T.StructType(
        [
            _T.StructField(id_col, id_field.dataType),
            _T.StructField("raw_bytes", _T.LongType()),
            _T.StructField("compressed_bytes", _T.LongType()),
            _T.StructField("compression_ratio", _T.DoubleType()),
        ]
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            raws, comps, ratios = [], [], []
            for text in pdf[text_col]:
                if text is None:
                    raws.append(0); comps.append(0); ratios.append(None)
                    continue
                raw = text.encode("utf-8")
                comp = len(zlib.compress(raw, level))
                raws.append(len(raw))
                comps.append(comp)
                ratios.append(comp / len(raw) if raw else None)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "raw_bytes": raws,
                    "compressed_bytes": comps,
                    "compression_ratio": ratios,
                }
            )

    return df.select(id_col, text_col).mapInPandas(kernel, out_schema)


def benchmark_ngrams(
    benchmark: DataFrame, text_col: str, *, n: int = 8
) -> DataFrame:
    """Persistable benchmark gram set for `contamination_overlap`: the
    distinct word n-grams of a benchmark corpus as one `gram` column.
    Benchmarks are static — build each one's gram table ONCE, write it
    to parquet, and decontaminate every corpus snapshot against the
    stored tables (`contamination_overlap(..., bench_grams=)`) without
    re-shingling benchmark text per run. Same persisted-artifact
    contract as `minhash_band_tags` and `ivf_index`."""
    from .dedup import word_shingles

    return (
        _ensure_parallelism(benchmark)
        .select(F.explode(word_shingles(F.col(text_col), n)).alias("gram"))
        .distinct()
    )


def contamination_overlap(
    docs: DataFrame,
    benchmark: DataFrame | None,
    *,
    id_col: str,
    text_col: str,
    bench_text_col: str | None = None,
    n: int = 8,
    bench_grams: DataFrame | None = None,
) -> DataFrame:
    """Benchmark-contamination check: per document, the fraction of its word
    n-grams that appear anywhere in the benchmark corpus (n-gram overlap is
    the standard public decontamination heuristic; n=8..13 typical).

    Plan shape: benchmark n-grams -> distinct (shuffle on gram hash, small);
    document n-grams explode -> left-semi-ish join against the benchmark set
    (broadcast when small) -> per-doc overlap ratio. Returns
    (id, ngram_count, contaminated_count, contamination_fraction).

    `bench_grams`: a persisted `benchmark_ngrams` table (column `gram`);
    when given, `benchmark` is ignored (pass None) and the stored gram
    set is used directly — `n` must match the one the table was built
    with (the caller owns that contract; gram width is not recorded in
    the table).
    """
    from .dedup import word_shingles

    if bench_grams is not None:
        if "gram" not in bench_grams.columns:
            raise ValueError(
                "bench_grams must be a benchmark_ngrams table with a "
                "`gram` column"
            )
        bench_grams_df = bench_grams.select(F.col("gram").alias("__gram"))
    elif benchmark is None:
        raise ValueError("benchmark is required unless bench_grams is given")
    else:
        bench_text = bench_text_col or text_col
        # ensure_parallelism before the interpreted shingle transform — a
        # single-file source would otherwise run it one-core
        bench_grams_df = (
            _ensure_parallelism(benchmark).select(
                F.explode(word_shingles(F.col(bench_text), n)).alias("__gram")
            ).distinct()
        )
    bench_grams = bench_grams_df
    doc_grams = _ensure_parallelism(docs).select(
        F.col(id_col).alias("__id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("__gram"),
    )
    marked = doc_grams.join(
        bench_grams.withColumn("__hit", F.lit(1)), "__gram", "left"
    )
    per_doc = marked.groupBy("__id").agg(
        F.count(F.lit(1)).alias("ngram_count"),
        F.count("__hit").alias("contaminated_count"),
    )
    return per_doc.select(
        F.col("__id").alias(id_col),
        F.col("ngram_count"),
        F.col("contaminated_count"),
        (
            F.col("contaminated_count").cast("double") / F.col("ngram_count")
        ).alias("contamination_fraction"),
    )


# ---------------------------------------------------------------------------
# URL canonicalization + URL-level dedup
# ---------------------------------------------------------------------------

# query parameters that never change page content (tracking junk) — the
# standard strip list of web-crawl canonicalizers
_TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|mc_eid|ref|ref_src)="


def canonical_url(url: Column) -> Column:
    """Canonical form of a URL — the key web pipelines dedup fetches on
    BEFORE content dedup (the same page arrives under thousands of
    tracking-param/fragment/case variants; CommonCrawl-style pipelines
    collapse them at the URL level for ~free). Steps, all
    Java/RE2-agreeing regexp builtins:

    1. strip the #fragment;
    2. lowercase scheme://host (path/query case is significant, host
       case is not);
    3. drop default ports (:80 for http, :443 for https) and a leading
       'www.';
    4. drop tracking query params (utm_*, fbclid, gclid, msclkid,
       mc_eid, ref, ref_src), SORT the survivors for order-invariance,
       drop the '?' when none survive;
    5. strip trailing '/' from the path.

    The per-parameter filter is an interpreted HOF over the split query
    string — bounded by the URL's own param count (single digits), not
    corpus size (PLANS §17's measured-cheap class). NULL in, NULL out."""
    u = F.regexp_replace(url, r"#.*$", "")
    prefix = F.lower(F.regexp_extract(u, r"^([^/?#]+://[^/?#]+)", 1))
    prefix = F.regexp_replace(prefix, r"^(http://[^/:]+):80$", r"$1")
    prefix = F.regexp_replace(prefix, r"^(https://[^/:]+):443$", r"$1")
    prefix = F.regexp_replace(prefix, r"^(https?://)www\.", r"$1")
    rest = F.regexp_replace(u, r"^[^/?#]+://[^/?#]+", "")
    path = F.regexp_replace(F.regexp_extract(rest, r"^([^?]*)", 1), r"/+$", "")
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING_PARAM_RE),
        )
    )
    qpart = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    return F.when(url.isNull(), F.lit(None).cast("string")).otherwise(
        F.concat(prefix, path, qpart)
    )


def url_dedup(
    df: DataFrame, id_col: str, url_col: str, *, keep: str = "first"
) -> DataFrame:
    """Drop rows whose CANONICAL URL (see `canonical_url`) duplicates
    another row's: keep='first' keeps the lowest id per canonical key
    (deterministic), keep='any' keeps an arbitrary member. Returns the
    input columns plus `canonical_url`. One hash shuffle on the
    canonical key in either mode, and BOTH modes aggregate with
    map-side partial combine (`min_by` for 'first') — a hyper-duplicated
    URL is a hot KEY but its rows collapse to one per input partition
    before the shuffle, so the skew never lands on a single task (a
    per-key window would sort the whole hot group in one partition;
    `id_col` is assumed unique, which makes the min_by tie-free and the
    choice deterministic).

    Rows whose `url_col` is NULL have no canonical key and pass through
    UNTOUCHED (canonical_url = NULL): a missing URL is "unknown", not
    "identical to every other missing URL", so collapsing the NULL
    group would silently drop every un-URL'd document but one. The
    null slice is split off BEFORE the aggregate and unioned back —
    zero extra shuffles (the filter rides the same scan)."""
    canon = df.withColumn("canonical_url", canonical_url(F.col(url_col)))
    if keep not in ("any", "first"):
        raise ValueError(f"unknown keep: {keep!r}")
    nulls = canon.filter(F.col(url_col).isNull())
    keyed = canon.filter(F.col(url_col).isNotNull())
    if keep == "any":
        return keyed.dropDuplicates(["canonical_url"]).unionByName(nulls)
    cols = canon.columns
    picked = keyed.groupBy("canonical_url").agg(
        F.min_by(F.struct(*[c for c in cols if c != "canonical_url"]),
                 F.col(id_col)).alias("__row")
    )
    return picked.select(
        *[F.col(f"__row.{c}").alias(c) for c in cols if c != "canonical_url"],
        "canonical_url",
    ).unionByName(nulls.select(*cols))


def _canonical_host(host: Column) -> Column:
    """Canonical host form shared by doc side and blocklist side:
    lowercase, strip a leading 'www.', strip a trailing dot (the DNS
    root-label form). Port is already excluded by URL_HOST_RE."""
    return F.regexp_replace(
        F.regexp_replace(F.lower(host), r"^www\.", ""), r"\.$", ""
    )


def domain_blocklist(
    df: DataFrame,
    hosts: DataFrame,
    id_col: str,
    *,
    url_col: str | None = None,
    text_col: str = "text",
    host_col: str | None = None,
    include_subdomains: bool = True,
    keep_missing: bool = True,
) -> DataFrame:
    """Drop documents whose host appears on a blocklist — the FIRST
    gate production crawl curation runs (porn/spam/malware domain lists
    are cheap, content gates are not; filtering by host before content
    gates skips decoding and scoring the worst of the crawl).

    The doc host comes from `url_col` when given (a URL-typed column),
    else from the FIRST URL found in `text_col` (the `domain_cap`
    convention). Both sides canonicalize identically (lowercase, strip
    'www.' and the DNS trailing dot). With `include_subdomains=True`
    (the production default), a blocklisted host blocks every
    subdomain: 'tracker.example' blocks 'cdn.tracker.example' — each
    doc host expands to its dotted suffixes (full host plus every
    >= 2-label suffix, a handful of values) and a doc is blocked when
    ANY suffix matches. Docs with no discoverable host survive under
    `keep_missing=True` (missing is "unknown", not "blocked"); set
    False for an allowlist-strict pipeline.

    Scale: the blocklist is the classic broadcast dimension — the
    suffix join broadcasts it, so the corpus side never shuffles for
    the match; the only wide stage is the distinct-blocked-ids
    aggregation (bounded by blocked rows, not corpus rows) feeding a
    left_anti on `id_col`. NULL-id rows are never blocked (anti-join
    NULL semantics) — identify rows upstream if NULL ids can occur.

    Also available as the curate() step
    `{"kind": "domain_blocklist", "hosts": <DataFrame>, ...}`."""
    if host_col is None:
        if "host" in hosts.columns:
            host_col = "host"
        elif len(hosts.columns) == 1:
            host_col = hosts.columns[0]
        else:
            raise ValueError(
                "hosts has no 'host' column and more than one column; "
                "pass host_col="
            )
    bl = hosts.select(
        _canonical_host(F.col(host_col)).alias("__bl_host")
    ).filter(F.col("__bl_host") != "").distinct()
    # extract from the LOWERCASED source so 'HTTPS://Spam.Example/x'
    # cannot slip past a case-sensitive scheme match (the host side is
    # lowercased anyway, so this changes nothing else)
    if url_col is not None:
        raw_host = F.regexp_extract(F.lower(F.col(url_col)), URL_HOST_RE, 1)
        # regexp_extract returns '' on no match / NULL input
        raw_host = F.when(raw_host != "", raw_host)
    else:
        raw_host = F.get(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(URL_HOST_RE), F.lit(1)
            ),
            0,
        )
    keyed = df.select(
        F.col(id_col), _canonical_host(raw_host).alias("__host")
    )
    if include_subdomains:
        labels = F.split(F.col("__host"), r"\.")
        cand = F.filter(
            F.transform(
                F.sequence(F.lit(1), F.size(labels)),
                lambda i: F.array_join(
                    F.slice(labels, i, F.size(labels)), "."
                ),
            ),
            # full host always; proper suffixes only with >= 2 labels
            # (nobody blocks a bare TLD, and 'com' matching everything
            # would be a foot-gun)
            lambda s: (s == F.col("__host")) | s.contains("."),
        )
        probe = keyed.filter(F.col("__host").isNotNull()).select(
            id_col, F.explode(cand).alias("__suffix")
        )
        blocked = probe.join(
            F.broadcast(bl), probe["__suffix"] == bl["__bl_host"]
        ).select(id_col).distinct()
    else:
        blocked = keyed.join(
            F.broadcast(bl), keyed["__host"] == bl["__bl_host"]
        ).select(id_col).distinct()
    out = df.join(blocked, id_col, "left_anti")
    if not keep_missing:
        present = keyed.filter(F.col("__host").isNotNull()).select(id_col)
        out = out.join(present, id_col, "left_semi")
    return out


# ---------------------------------------------------------------------------
# encoding / mojibake quality
# ---------------------------------------------------------------------------

# UTF-8 bytes decoded as Latin-1/cp1252 leave characteristic artifacts:
# 'A-tilde'/'A-circumflex' (U+00C3/U+00C2) followed by a char in the
# U+0080-U+00BF block, and the cp1252 'a-circumflex + euro' (U+00E2
# U+20AC) curly-quote/dash triples
_MOJIBAKE_RE = "(\u00c3[\u0080-\u00bf]|\u00c2[\u0080-\u00bf]|\u00e2\u20ac.)"
# C0 controls other than tab/newline/CR
_CONTROL_RE = "[\u0000-\u0008\u000b\u000c\u000e-\u001f]"


def encoding_quality(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document encoding-health report — the cheap pre-filter every
    web-text pipeline runs before spending tokens on broken decodes:

    - `replacement_chars`: U+FFFD count (upstream decoder already gave up);
    - `control_chars`: C0 controls other than tab/newline/CR (binary
      junk in a text column);
    - `mojibake_markers`: UTF-8-decoded-as-Latin-1/cp1252 artifact count
      (the U+00C3/U+00C2/U+00E2-U+20AC two- and three-char patterns);
    - `encoding_ok`: all three are zero.

    One narrow projection — regexp counts in whole-stage codegen, no
    shuffle, no UDF; NULL text yields NULL counts and NULL verdict."""
    t = F.col(text_col)

    def n(pat: str) -> Column:
        return F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0))).cast("long")

    repl = n("\ufffd")
    ctrl = n(_CONTROL_RE)
    moji = n(_MOJIBAKE_RE)
    return df.select(
        F.col(id_col),
        F.when(t.isNull(), F.lit(None).cast("long")).otherwise(repl).alias(
            "replacement_chars"
        ),
        F.when(t.isNull(), F.lit(None).cast("long")).otherwise(ctrl).alias(
            "control_chars"
        ),
        F.when(t.isNull(), F.lit(None).cast("long")).otherwise(moji).alias(
            "mojibake_markers"
        ),
        F.when(t.isNull(), F.lit(None).cast("boolean")).otherwise(
            (repl == 0) & (ctrl == 0) & (moji == 0)
        ).alias("encoding_ok"),
    )


# ---------------------------------------------------------------------------
# span-level benchmark decontamination
# ---------------------------------------------------------------------------


def decontaminate_spans(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    *,
    bench_text_col: str = "text",
    n: int = 8,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """REMOVE benchmark-overlapping token spans from training documents
    instead of merely flagging them (`contamination_overlap` is the
    report; this is the surgical fix — dropping a whole 10k-token page
    because one test question leaked into a footer throws away the
    page): every length-`n` token window of a document that appears
    verbatim anywhere in the benchmark corpus is cut, with overlapping
    hits merged into maximal spans (the `dedup_spans` island machinery,
    same whitespace-normalized rebuild contract — null text stays null,
    unaffected docs come back token-joined).

    Both sides tokenize and window IDENTICALLY (the `dedup_spans` gram
    construction), so a benchmark n-gram always matches its doc-side
    counterpart byte-for-byte before hashing. The benchmark side
    reduces to a distinct hash set (persist it per benchmark — static
    artifacts, same reuse contract as `benchmark_ngrams`); the join is
    a broadcast/semi join on the uniformly-hashed key. hash_fn:
    'xxhash64' (default, 8-byte keys) | 'md5' | 'text' (certification
    configuration)."""
    from .dedup import _merged_spans, _strip_spans, _window_grams

    doc_grams = _window_grams(docs, id_col, text_col, n, hash_fn)
    bench = benchmark.select(
        F.lit(0).alias("__bid"), F.col(bench_text_col).alias("__btext")
    )
    bench_keys = (
        _window_grams(bench, "__bid", "__btext", n, hash_fn)
        .select("__h")
        .distinct()
    )
    dpos = doc_grams.join(bench_keys, "__h", "left_semi")
    spans = _merged_spans(dpos, n)
    return _strip_spans(docs, spans, id_col, text_col)


# ---------------------------------------------------------------------------
# host-scoped boilerplate stripping
# ---------------------------------------------------------------------------


def host_boilerplate_strip(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    url_col: str | None = None,
    host_col: str | None = None,
    min_doc_count: int = 2,
    min_doc_ppm: int = 500_000,
    min_line_chars: int = 1,
) -> DataFrame:
    """HOST-scoped boilerplate removal — the per-domain counterpart of
    `dedup_lines` and the pass CCNet-class crawl pipelines run before
    corpus-wide dedup: a line is boilerplate for host H when it appears
    in >= `min_doc_count` distinct documents of H AND in >=
    `min_doc_ppm` parts-per-million of H's documents (both integer
    predicates, so verdicts are exact across engines). Nav menus,
    cookie banners, and footers repeat across MOST pages of one site;
    the same sentence quoted once on an unrelated site is NOT
    boilerplate there — corpus-wide line dedup (`dedup_lines`) can't
    express that distinction, host scoping is the point.

    The host comes from `host_col` when given, else from `url_col`
    (a URL-typed column), else from the FIRST URL found in `text_col`
    (the `domain_cap`/`domain_blocklist` convention), canonicalized on
    both the counting and stripping side (lowercase, strip 'www.' and
    the trailing DNS dot). Docs with NO discoverable host pass through
    byte-identical: no host, no site, no boilerplate evidence.

    Lines shorter than `min_line_chars` are never counted nor removed
    (blank separators survive). Counting is distinct-docs-per-host, so
    in-document repetition stays `repetition_stats`' business. Docs
    whose every line is stripped come back with empty text; NULL text
    passes through as NULL.

    Plan shape (100-TB audit): one posexplode over lines keyed
    (host, line) -> groupBy with map-side partial combine (the
    boilerplate head absorbs there) -> join of per-host doc counts
    (bounded by distinct hosts — a dimension next to the line table)
    -> LEFT ANTI of lines against the boilerplate set on (host, line)
    (AQE broadcasts it while small; at worst it shuffles on a
    host+content key, uniformly distributed across sites) -> per-doc
    array_sort(collect_list) re-assembly, the `dedup_lines` rebuild.
    Non-lambda builtins only, no Python, no skew magnet: a mega-host
    contributes many GROUPS, not one hot key, because the count key is
    (host, line).

    Returns the input columns with `text_col` rewritten.
    """
    if min_doc_count < 1:
        raise ValueError("min_doc_count must be >= 1")
    if not (0 <= min_doc_ppm <= 1_000_000):
        raise ValueError("min_doc_ppm must be in [0, 1000000]")
    if host_col is not None:
        raw_host = F.col(host_col)
    elif url_col is not None:
        h = F.regexp_extract(F.lower(F.col(url_col)), URL_HOST_RE, 1)
        raw_host = F.when(h != "", h)
    else:
        raw_host = F.get(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(URL_HOST_RE), F.lit(1)
            ),
            0,
        )
    host = _canonical_host(raw_host)
    host = F.when(host != "", host)
    keyed = _ensure_parallelism(df).select(
        F.col(id_col).alias("__id"),
        host.alias("__host"),
        F.col(text_col).alias("__text"),
    )
    lines = keyed.filter(F.col("__host").isNotNull()).select(
        "__id",
        "__host",
        F.posexplode(F.split(F.col("__text"), "\n")).alias("__pos", "__line"),
    )
    host_docs = (
        keyed.filter(F.col("__host").isNotNull())
        .groupBy("__host")
        .agg(F.count_distinct("__id").alias("__hn"))
    )
    eligible = lines.filter(F.length("__line") >= min_line_chars)
    boiler = (
        eligible.groupBy("__host", "__line")
        .agg(F.count_distinct("__id").alias("__dc"))
        .join(host_docs, "__host")
        .filter(
            (F.col("__dc") >= min_doc_count)
            & (F.col("__dc") * F.lit(1_000_000) >= F.lit(min_doc_ppm) * F.col("__hn"))
        )
        .select("__host", "__line")
    )
    # plain (host, line) semi-join suffices: boiler lines satisfy the
    # length floor, and equal strings have equal lengths, so a
    # below-floor line can never match (the dedup_lines argument).
    # Only the boilerplate OCCURRENCES shuffle — per-doc removal
    # positions collapse to one bounded array and the rewrite is an
    # indexed array filter (round-20: the old shape anti-joined and
    # collect_list-rebuilt every line of every hosted doc, plus a
    # second hosted-id join, to strip the boilerplate few). Docs
    # without hits keep split("\n") + "\n"-rejoin — byte-exact — so
    # the hosted/unhosted distinction needs no separate join.
    hits = (
        eligible.join(boiler, ["__host", "__line"], "left_semi")
        .groupBy("__id")
        .agg(F.collect_list("__pos").alias("__rm"))
    )
    units = F.split(F.col(text_col), "\n")
    kept = F.when(
        F.col("__rm").isNotNull(),
        F.filter(units, lambda x, i: ~F.array_contains(F.col("__rm"), i)),
    ).otherwise(units)
    other_cols = [c for c in df.columns if c != text_col]
    return (
        df.join(hits, df[id_col] == hits["__id"], "left")
        .select(
            *other_cols,
            F.when(F.col(text_col).isNull(), F.lit(None).cast("string"))
            .otherwise(F.concat_ws("\n", kept))
            .alias(text_col),
        )
    )


# ---------------------------------------------------------------------------
# token blocklist gate
# ---------------------------------------------------------------------------


def term_blocklist(
    df: DataFrame,
    terms: DataFrame,
    id_col: str,
    *,
    text_col: str = "text",
    term_col: str | None = None,
    mode: str = "drop",
    flag_col: str = "blocked",
) -> DataFrame:
    """C4-style content blocklist gate: drop (or flag) every document
    containing ANY blocklisted term as a whole word. C4 removed pages
    containing any entry of a public badwords list; the same machinery
    serves ad/spam-phrase lists and compliance term screens. Matching
    is case-insensitive on alphanumeric word boundaries: both the
    document and the terms tokenize by lowercasing and splitting on
    non-alphanumeric runs, so 'Word.' matches term 'word' but
    'password' never matches 'word' (substring false-positives are the
    classic naive-LIKE bug this avoids). Multi-word terms match when
    their token sequence appears consecutively (tokens joined by a
    single space against the doc's space-joined token stream — bounded
    by the longest term's token count, computed once per doc).

    `mode='drop'` (default) anti-joins matched ids out; `mode='flag'`
    returns the input with a boolean `flag_col` instead — the
    observability shape (count flags by source before committing to a
    cut). NULL/empty text never matches; NULL-id rows are never
    dropped in 'drop' mode (anti-join NULL semantics).

    Scale: terms are the classic broadcast dimension. Single-token
    terms match via explode(distinct tokens) -> broadcast semi-join
    (corpus side never shuffles to match). Multi-token terms each
    become one LIKE probe against the doc's normalized token stream —
    bounded by the term list, which a blocklist keeps small. The only
    wide stage is the distinct matched-id set feeding the anti-join.
    """
    if mode not in ("drop", "flag"):
        raise ValueError(f"mode must be 'drop' or 'flag', got {mode!r}")
    if term_col is None:
        if "term" in terms.columns:
            term_col = "term"
        elif len(terms.columns) == 1:
            term_col = terms.columns[0]
        else:
            raise ValueError(
                "terms has no 'term' column and more than one column; "
                "pass term_col="
            )
    norm_terms = terms.select(
        F.array_join(
            F.filter(
                F.split(F.lower(F.col(term_col)), "[^0-9a-z]+"),
                lambda t: t != "",
            ),
            " ",
        ).alias("__term")
    ).filter(F.col("__term") != "").distinct()
    single = norm_terms.filter(~F.col("__term").contains(" "))
    multi = norm_terms.filter(F.col("__term").contains(" "))
    doc_tokens = _ensure_parallelism(df).select(
        F.col(id_col).alias("__id"),
        F.filter(
            F.split(F.lower(F.col(text_col)), "[^0-9a-z]+"),
            lambda t: t != "",
        ).alias("__toks"),
    )
    tok_hits = (
        doc_tokens.select(
            "__id", F.explode(F.array_distinct("__toks")).alias("__tok")
        )
        .join(F.broadcast(single), F.col("__tok") == F.col("__term"), "left_semi")
        .select("__id")
    )
    # multi-token probes: one bounded LIKE per term against the doc's
    # space-joined token stream, padded so every match is token-aligned
    stream = doc_tokens.select(
        "__id",
        F.concat(F.lit(" "), F.array_join("__toks", " "), F.lit(" ")).alias(
            "__stream"
        ),
    )
    phrase_hits = (
        stream.join(F.broadcast(multi))
        .filter(
            F.col("__stream").contains(
                F.concat(F.lit(" "), F.col("__term"), F.lit(" "))
            )
        )
        .select("__id")
    )
    hit_ids = tok_hits.unionByName(phrase_hits).distinct()
    if mode == "drop":
        return df.join(
            hit_ids.withColumnRenamed("__id", id_col), id_col, "left_anti"
        )
    return df.join(
        hit_ids.withColumn(flag_col, F.lit(True)).withColumnRenamed(
            "__id", id_col
        ),
        id_col,
        "left",
    ).withColumn(flag_col, F.coalesce(F.col(flag_col), F.lit(False)))


# ---------------------------------------------------------------------------
# Unicode script profiling
# ---------------------------------------------------------------------------

# codepoint classes, ordered — the order is the deterministic tie-break
# for `dominant_script` and part of the operator contract
SCRIPT_CLASSES: list[tuple[str, str]] = [
    ("latin", "A-Za-z"),
    ("digit", "0-9"),
    ("cyrillic", "Ѐ-ӿ"),
    ("greek", "Ͱ-Ͽ"),
    ("arabic", "؀-ۿ"),
    ("cjk", "一-鿿"),
    ("hangul", "가-힯"),
    ("kana", "぀-ヿ"),
]


def script_share_condition(
    t: Column, script: str, min_share_ppm: int
) -> Column:
    """Pure-projection predicate: TRUE iff `script`'s codepoints make up
    at least `min_share_ppm` of the text's NON-WHITESPACE length (the
    `script_profile` share semantics as one boolean — two regexp
    evaluations, no staging, no join; the inline-gate channel).
    Empty/whitespace-only/NULL text carries no script evidence and
    FAILS the gate."""
    classes = dict(SCRIPT_CLASSES)
    if script not in classes:
        raise ValueError(
            f"unknown script {script!r}; one of {sorted(classes)}"
        )
    if not (0 <= min_share_ppm <= 1_000_000):
        raise ValueError("min_share_ppm must be in [0, 1000000]")
    n = F.length(t)
    count = n - F.length(F.regexp_replace(t, f"[{classes[script]}]", ""))
    # the whitespace-STRIPPED length (not n minus it — that is the
    # whitespace COUNT; the unit suite caught this after the oracle
    # missed it because both engines carried the same mistake)
    nonspace = F.length(F.regexp_replace(t, "[ \t\r\n]", ""))
    return (
        t.isNotNull()
        & (nonspace > 0)
        & (
            count.cast("long") * F.lit(1_000_000)
            >= F.lit(int(min_share_ppm)) * nonspace.cast("long")
        )
    )


def script_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document Unicode-script composition — the signal production
    language-ID runs BEFORE any model: a page that is 90% CJK
    codepoints needs no stopword vote (`language_id`'s markers are
    Latin-alphabet languages only), and mixed-script documents
    (Latin boilerplate around a Cyrillic body, spam injecting CJK into
    English pages) are exactly what share-thresholds catch.

    For each class in `SCRIPT_CLASSES` (Latin letters, digits,
    Cyrillic, Greek, Arabic, CJK unified, Hangul, Kana) the count is
    the number of codepoints in the class, computed as
    length(text) - length(regexp_replace(text, '[class]', '')) — a
    pure projection that any SQL engine replays identically.
    `other_count` covers everything else EXCEPT ASCII whitespace
    (space/tab/CR/LF, counted separately as `space_count`: whitespace
    is structure, not script evidence). `dominant_script` is the
    argmax over the script classes (digits excluded — digits vote for
    no language) with ties broken by class order, NULL text -> NULL,
    and 'none' when no script codepoint occurs. `latin_share_ppm` and
    `dominant_share_ppm` are integer shares of the NON-WHITESPACE
    length — count * 1e6 div (length - space_count) — NULL when the
    text is empty or all whitespace. Gate on dominant_share_ppm to
    drop mixed-script spam; gate on a named script's share for
    corpus-language routing.

    Pure Catalyst projection: no shuffle, no UDF, whole-stage codegen
    at scan speed."""
    t = F.col(text_col)
    n = F.length(t)
    # stage every class count as a NAMED column first: the argmax and
    # share expressions below reference the names, so each
    # regexp_replace is computed ONCE (Catalyst's CollapseProject
    # declines to inline non-cheap expressions used more than once) —
    # building the when-chain from raw Column objects instead inlines
    # each count dozens of times and bloats plan/codegen size
    staged = df
    for name, cls in SCRIPT_CLASSES:
        staged = staged.withColumn(
            f"__sc_{name}",
            (n - F.length(F.regexp_replace(t, f"[{cls}]", ""))).cast("long"),
        )
    staged = staged.withColumn(
        "__sc_space",
        (n - F.length(F.regexp_replace(t, "[ \t\r\n]", ""))).cast("long"),
    ).withColumn("__sc_len", n.cast("long"))
    counts = {name: F.col(f"__sc_{name}") for name, _ in SCRIPT_CLASSES}
    space = F.col("__sc_space")
    script_total = counts[SCRIPT_CLASSES[0][0]]
    for name, _ in SCRIPT_CLASSES[1:]:
        script_total = script_total + counts[name]
    other = F.col("__sc_len") - script_total - space
    nonspace = F.col("__sc_len") - space
    # argmax with class-order tie-break: fold over the named counts
    dom = F.lit("none")
    best = F.lit(0).cast("long")
    for name, _ in SCRIPT_CLASSES:
        if name == "digit":
            continue
        c = counts[name]
        take = c > best  # strict: earlier classes win ties
        dom = F.when(take, F.lit(name)).otherwise(dom)
        best = F.when(take, c).otherwise(best)
    staged = staged.withColumn("__sc_best", best).withColumn(
        "__sc_nonspace", nonspace
    )
    out_cols = [F.col(id_col)]
    for name, _ in SCRIPT_CLASSES:
        out_cols.append(counts[name].alias(f"{name}_count"))
    out_cols.extend(
        [
            space.alias("space_count"),
            other.cast("long").alias("other_count"),
            F.when(t.isNotNull(), dom).alias("dominant_script"),
            F.when(
                F.col("__sc_nonspace") > 0,
                F.expr("__sc_latin * 1000000 div __sc_nonspace"),
            ).alias("latin_share_ppm"),
            F.when(
                F.col("__sc_nonspace") > 0,
                F.expr("__sc_best * 1000000 div __sc_nonspace"),
            ).alias("dominant_share_ppm"),
        ]
    )
    return staged.select(*out_cols)


# ---------------------------------------------------------------------------
# sentence segmentation
# ---------------------------------------------------------------------------

# one sentence = the shortest run ending in terminator punctuation, or a
# trailing un-terminated fragment; deliberately lookaround-free so RE2
# engines (the oracle) compile the identical pattern
_SENTENCE_RE = r"[^.!?]*[.!?]+|[^.!?]+$"
_EDGE_WS_RE = r"^[ \t\r\n]+|[ \t\r\n]+$"


def split_sentences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_chars: int = 1,
) -> DataFrame:
    """Deterministic sentence segmentation — the granularity between
    `dedup_lines`' lines and whole documents that sentence-level dedup,
    bitext alignment, and per-sentence quality scoring want. A
    sentence is a maximal run of non-terminator characters plus its
    run of terminators ('.', '!', '?'), or the trailing un-terminated
    fragment; matches then shed edge whitespace (explicit
    space/tab/CR/LF class — the cross-engine-pinned set) and empties
    (or sub-`min_chars` fragments) are dropped. Abbreviation handling
    ("Dr. Smith" splits) is explicitly OUT of spec: this is the
    deterministic replayable segmenter, not a learned one — the
    trade every rule-based splitter in a data pipeline makes.

    The regex is alternation of character classes only (no
    lookarounds), so Java regex and RE2 engines tokenize identically.
    One posexplode, no shuffle: `sent_idx` is dense from 0 AFTER
    filtering. NULL/empty text yields no rows (a corpus-level join
    back to `df` recovers sentence-free docs when needed).

    Returns (id_col, sent_idx int, sentence string, n_chars long).
    """
    if min_chars < 1:
        raise ValueError(f"min_chars must be >= 1, got {min_chars}")
    raw = F.regexp_extract_all(
        F.col(text_col), F.lit(_SENTENCE_RE), F.lit(0)
    )
    cleaned = F.filter(
        F.transform(
            raw, lambda x: F.regexp_replace(x, _EDGE_WS_RE, "")
        ),
        lambda x: F.length(x) >= min_chars,
    )
    return _ensure_parallelism(df).select(
        F.col(id_col),
        F.posexplode(cleaned).alias("sent_idx", "sentence"),
    ).select(
        id_col,
        F.col("sent_idx").cast("int").alias("sent_idx"),
        "sentence",
        F.length("sentence").cast("long").alias("n_chars"),
    )


# ---------------------------------------------------------------------------
# readability
# ---------------------------------------------------------------------------


def readability(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic readability profiling — the Flesch reading-ease
    family as corpus-quality signals (web-text curation uses
    readability bands to split reference prose from keyword stuffing
    and OCR noise). All three inputs are replayable counts:

    - n_sentences: `split_sentences`' terminator regex (matches with
      >= 1 non-whitespace character)
    - n_words: runs of non-whitespace
    - n_syllables: vowel GROUPS ('[aeiouy]+' matches, case-insensitive)
      — the standard cheap syllable proxy; a word with no vowel counts
      one syllable via the per-word floor max(1, groups), computed as
      groups + words_without_vowels

    flesch = 206.835 - 1.015*(words/sentences) - 84.6*(syllables/words)
    evaluates in that pinned order on doubles, so any engine replays it
    bit-exactly. Zero-sentence or zero-word docs (and NULL text) report
    NULL flesch; counts are 0 (NULL text: NULL counts).

    Pure projection (regexp_extract_all + size), no shuffle, no UDF.
    Returns (id_col, n_sentences, n_words, n_syllables, flesch).
    """
    t = F.col(text_col)
    sents = F.size(
        F.filter(
            F.transform(
                F.regexp_extract_all(t, F.lit(_SENTENCE_RE), F.lit(0)),
                lambda x: F.regexp_replace(x, _EDGE_WS_RE, ""),
            ),
            lambda x: F.length(x) >= 1,
        )
    )
    words_arr = F.filter(
        F.split(t, r"[ \t\r\n]+"), lambda x: F.length(x) >= 1
    )
    words = F.size(words_arr)
    vowel_groups = F.size(
        F.regexp_extract_all(F.lower(t), F.lit("[aeiouy]+"), F.lit(0))
    )
    no_vowel_words = F.size(
        F.filter(
            words_arr,
            lambda x: F.size(
                F.regexp_extract_all(F.lower(x), F.lit("[aeiouy]+"), F.lit(0))
            )
            == 0,
        )
    )
    sylls = vowel_groups + no_vowel_words
    staged = (
        df.withColumn("__rd_s", F.when(t.isNotNull(), sents.cast("long")))
        .withColumn("__rd_w", F.when(t.isNotNull(), words.cast("long")))
        .withColumn("__rd_y", F.when(t.isNotNull(), sylls.cast("long")))
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015)
        * (F.col("__rd_w").cast("double") / F.col("__rd_s").cast("double"))
        - F.lit(84.6)
        * (F.col("__rd_y").cast("double") / F.col("__rd_w").cast("double"))
    )
    return staged.select(
        F.col(id_col),
        F.col("__rd_s").alias("n_sentences"),
        F.col("__rd_w").alias("n_words"),
        F.col("__rd_y").alias("n_syllables"),
        F.when(
            (F.col("__rd_s") > 0) & (F.col("__rd_w") > 0), flesch
        ).alias("flesch"),
    )
