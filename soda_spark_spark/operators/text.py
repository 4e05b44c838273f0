"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language identification, document fingerprinting.

Everything is pure Catalyst (split/regexp/length/md5) so the operators run
inside whole-stage codegen at full scan speed — no Python UDFs. Formulas are
fixed-order double arithmetic so scores are reproducible across partitionings
and comparable against an external SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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


def text_stats(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-document stats: char/token counts, average token length,
    punctuation/digit/space ratios, stopword ratio. One narrow projection."""
    t = F.col(text_col)
    chars = F.length(t)
    toks = token_count(t)
    stop_hits = F.size(
        F.regexp_extract_all(F.lower(t), F.lit(_word_regex(EN_STOPWORDS)), F.lit(0))
    )
    punct = chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    digits = chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    spaces = chars - F.length(F.regexp_replace(t, r"\s", ""))
    return df.select(
        F.col(id_col),
        chars.alias("char_count"),
        toks.alias("token_count"),
        F.when(toks > 0, (chars - spaces).cast("double") / toks).alias("avg_token_len"),
        F.when(chars > 0, punct.cast("double") / chars).otherwise(F.lit(0.0)).alias("punct_ratio"),
        F.when(chars > 0, digits.cast("double") / chars).otherwise(F.lit(0.0)).alias("digit_ratio"),
        F.when(toks > 0, stop_hits.cast("double") / toks).otherwise(F.lit(0.0)).alias("stopword_ratio"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic [0,1] quality score from length / punctuation / stopword
    signals (Gopher/C4-style rule scoring, simplified and deterministic):

        score = 0.25*len_ok + 0.25*tok_len_ok + 0.25*(1-punct_excess)
                + 0.25*min(stopword_ratio*4, 1)

    where len_ok = min(token_count/20, 1), tok_len_ok = 1 if mean token
    length in [3, 10] else 0, punct_excess = min(punct_ratio*5, 1).
    """
    stats = text_stats(df, id_col, text_col)
    len_ok = F.least(F.col("token_count").cast("double") / 20.0, F.lit(1.0))
    tok_len_ok = (
        F.when((F.col("avg_token_len") >= 3.0) & (F.col("avg_token_len") <= 10.0), 1.0)
        .otherwise(0.0)
    )
    punct_excess = F.least(F.col("punct_ratio") * 5.0, F.lit(1.0))
    stop_ok = F.least(F.col("stopword_ratio") * 4.0, F.lit(1.0))
    return stats.select(
        id_col,
        "char_count",
        "token_count",
        (
            0.25 * len_ok + 0.25 * tok_len_ok + 0.25 * (1.0 - punct_excess) + 0.25 * stop_ok
        ).alias("quality_score"),
    )


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Language ID by stopword-marker voting: count marker-word hits per
    language, pick the argmax (ties broken by language code order,
    'und' = undetermined when nothing hits). A deterministic heuristic, not a
    model — suitable as a cheap first-pass filter at scale."""
    t = F.lower(F.col(text_col))
    hit_cols = [
        F.size(F.regexp_extract_all(t, F.lit(_word_regex(words)), F.lit(0))).alias(f"__{lang}")
        for lang, words in LANG_MARKERS.items()
    ]
    scored = df.select(F.col(id_col), F.col(text_col), *hit_cols)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"__{lang}") for lang in langs])
    pred = F.lit("und")
    # reverse order so earlier languages win ties via later override
    for lang in reversed(langs):
        pred = F.when(F.col(f"__{lang}") == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best > 0, pred).otherwise(F.lit("und"))
    return scored.select(
        id_col,
        pred.alias("predicted_lang"),
        *[F.col(f"__{lang}").alias(f"hits_{lang}") for lang in langs],
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


def winnowing_fingerprints(
    df: DataFrame, id_col: str, text_col: str, *, k: int = 5, window: int = 4, seed: int = 42
) -> DataFrame:
    """Winnowing (MOSS-style) document sketches: hash every word k-gram, keep
    the minimum hash of each sliding window of `window` consecutive k-grams.
    Output is the distinct set of selected hashes per document — a compact,
    position-robust sketch for plagiarism-style overlap detection."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_grams = F.greatest(F.size(toks) - F.lit(k - 1), F.lit(0))
    gram_hashes = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, k)), F.lit(seed)),
    )
    n_windows = F.greatest(F.size(gram_hashes) - F.lit(window - 1), F.lit(0))
    mins = F.transform(
        F.sequence(F.lit(1), n_windows),
        lambda i: F.array_min(F.slice(gram_hashes, i, window)),
    )
    return df.select(
        F.col(id_col),
        F.array_distinct(
            F.when(F.size(toks) >= k + window - 1, mins).otherwise(F.array())
        ).alias("fingerprints"),
    )
