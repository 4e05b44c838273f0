"""Property tests for the round-8 curation operators: clean_lines,
gopher rules and temperature mixture must agree with straightforward
Python references on arbitrary inputs (hypothesis-driven, batched —
one Spark job per example)."""

from __future__ import annotations

import math
import re

import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)


line_alpha = "abcXY019.!?#-* \t…"
line_text = st.text(alphabet=line_alpha, min_size=0, max_size=30)
docs_strategy = st.lists(
    st.lists(line_text, min_size=0, max_size=6).map("\n".join),
    min_size=1,
    max_size=10,
)


def _py_clean(text: str, min_words: int = 5) -> str:
    out = []
    for ln in text.split("\n"):
        keep = (
            re.search("[.!?][\"'”’]?$", ln.rstrip()) is not None
            and len(ln.split()) >= min_words
            and "javascript" not in ln.lower()
        ) or len(ln.strip()) == 0
        if keep:
            out.append(ln)
    return "\n".join(out)


@settings(max_examples=5, deadline=None)
@given(docs_strategy, st.integers(0, 4))
def test_clean_lines_matches_python_and_idempotent(spark, texts, min_words):
    from soda_spark_spark.operators.text import clean_lines

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    once = {
        r["doc_id"]: r["text"]
        for r in clean_lines(df, "doc_id", "text", min_words=min_words).collect()
    }
    for i, text in enumerate(texts):
        assert once[i] == _py_clean(text, min_words), (i, text)
    # idempotence: a kept line still passes every rule
    df2 = spark.createDataFrame(
        sorted(once.items()), "doc_id long, text string"
    )
    twice = {
        r["doc_id"]: r["text"]
        for r in clean_lines(df2, "doc_id", "text", min_words=min_words).collect()
    }
    assert twice == once


@settings(max_examples=5, deadline=None)
@given(docs_strategy)
def test_gopher_flags_match_python(spark, texts):
    from soda_spark_spark.operators.text import gopher_quality_flags

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r
        for r in gopher_quality_flags(
            df, "doc_id", "text",
            min_words=1, max_words=50, min_required_word_hits=0,
        ).collect()
    }
    for i, text in enumerate(texts):
        words = text.split()
        n_words = len(words)
        lines = [ln for ln in text.split("\n") if ln.strip()]
        r = got[i]
        assert r["n_words"] == n_words
        assert r["word_count_ok"] == (1 <= n_words <= 50)
        if n_words:
            word_chars = len(re.sub(r"\s", "", text))
            mean = word_chars / n_words
            assert r["mean_word_len_ok"] == (3.0 <= mean <= 10.0)
            syms = text.count("#") + len(re.findall(r"\.\.\.|…", text))
            assert r["symbol_ratio_ok"] == (syms / n_words <= 0.1)
            alpha = sum(1 for w in words if re.search("[A-Za-z]", w))
            assert r["alpha_words_ok"] == (alpha / n_words >= 0.8)
        else:
            assert not r["mean_word_len_ok"]
            assert not r["symbol_ratio_ok"]
            assert not r["alpha_words_ok"]
        if lines:
            bullets = sum(
                1 for ln in lines
                if re.match(r"^[ \t]*(•|\*|-|[0-9]+[.)])[ \t]", ln)
            )
            ell = sum(
                1 for ln in lines if re.search(r"(\.\.\.|…)[ \t]*$", ln)
            )
            assert r["bullet_lines_ok"] == (bullets / len(lines) <= 0.9)
            assert r["ellipsis_lines_ok"] == (ell / len(lines) <= 0.3)
        else:
            assert r["bullet_lines_ok"] and r["ellipsis_lines_ok"]


@settings(max_examples=5, deadline=None)
@given(
    st.lists(st.integers(1, 200), min_size=1, max_size=8),
    st.integers(0, 500),
)
def test_temperature_rates_ppm_match_python(spark, sizes, target):
    from pyspark.sql import functions as F

    from soda_spark_spark.operators.packing import temperature_mixture_rates

    rows = [
        (g * 10_000 + i, f"g{g}") for g, n in enumerate(sizes) for i in range(n)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = {
        r["source"]: r
        for r in temperature_mixture_rates(
            df, "source", alpha=0.5, target_rows=target, ppm=True
        ).collect()
    }
    N = sum(sizes)
    pa = {f"g{g}": math.floor(1e6 * math.sqrt(n / N))
          for g, n in enumerate(sizes)}
    Z = sum(pa.values())
    for g, n in enumerate(sizes):
        key = f"g{g}"
        q = float(pa[key]) / float(Z)
        assert got[key]["q"] == q
        assert got[key]["rate"] == min(1.0, (float(target) * q) / float(n))
