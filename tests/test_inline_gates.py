"""Round-12 inline pipeline gates: the pure-projection curation gates
(quality / langid / pii / repetition-without-top-bigram) now filter the
running frame in place instead of semi-joining a keep set. These tests
pin (a) bit-parity of the column builders against the frame-shaped
operators, (b) gate-survivor parity against the old keep-set
formulation, and (c) the plan property the change buys: a gate chain
with NO join and NO exchange."""
from __future__ import annotations

import pyspark.sql.functions as F

from soda_spark_spark.operators.text import (
    language_id,
    pii_count_exprs,
    pii_counts,
    predicted_lang_col,
    quality_score,
    quality_score_col,
    repetition_fraction_exprs,
    repetition_stats,
)
from soda_spark_spark.pipeline import curate

TEXTS = [
    (1, "The quick brown fox jumps over the lazy dog. " * 4),
    (2, "der die und das ist ein nicht mit sich auf. " * 3),
    (3, "!!! ??? ... ;;; ::: --- " * 10),
    (4, "repeat line\nrepeat line\nrepeat line\nunique one"),
    (5, "visit https://example.com and mail a@b.co 1.2.3.4"),
    (6, ""),
    (7, None),
    (8, "word " * 50),
]


def _docs(spark):
    return spark.createDataFrame(TEXTS, "doc_id long, text string")


def test_quality_score_col_parity(spark):
    docs = _docs(spark)
    op = {r.doc_id: r.quality_score
          for r in quality_score(docs, "doc_id", "text").collect()}
    inline = {r.doc_id: r.s for r in docs.select(
        "doc_id", quality_score_col(F.col("text")).alias("s")).collect()}
    assert op == inline  # bit-exact, including the NULL-text row


def test_predicted_lang_col_parity(spark):
    docs = _docs(spark)
    op = {r.doc_id: r.predicted_lang
          for r in language_id(docs, "doc_id", "text").collect()}
    inline = {r.doc_id: r.p for r in docs.select(
        "doc_id", predicted_lang_col(F.col("text")).alias("p")).collect()}
    assert op == inline


def test_pii_and_repetition_expr_parity(spark):
    docs = _docs(spark)
    pe = pii_count_exprs(F.col("text"))
    inline = {r.doc_id: (r.u, r.e, r.i, r.p) for r in docs.select(
        "doc_id", pe["url_count"].alias("u"), pe["email_count"].alias("e"),
        pe["ipv4_count"].alias("i"), pe["phone_count"].alias("p"),
    ).collect()}
    op = {r.doc_id: (r.url_count, r.email_count, r.ipv4_count,
                     r.phone_count)
          for r in pii_counts(docs, "doc_id", "text").collect()}
    assert op == inline
    fr = repetition_fraction_exprs(F.col("text"))
    inline_r = {r.doc_id: (r.a, r.b, r.c) for r in docs.select(
        "doc_id", fr["dup_line_fraction"].alias("a"),
        fr["dup_line_char_fraction"].alias("b"),
        fr["dup_token_fraction"].alias("c"),
    ).collect()}
    op_r = {r.doc_id: (r.dup_line_fraction, r.dup_line_char_fraction,
                       r.dup_token_fraction)
            for r in repetition_stats(docs, "doc_id", "text").collect()}
    assert op_r == inline_r


def test_inline_gates_survivors_match_keep_set_reference(spark):
    """Same survivors as the old operator-then-semijoin formulation."""
    docs = _docs(spark)
    steps = [
        {"kind": "quality_filter", "min_score": 0.4},
        {"kind": "langid_filter", "allowed": ["en"]},
        {"kind": "pii_filter", "max_url_count": 0},
        {"kind": "repetition_filter", "max_dup_line_fraction": 0.5},
    ]
    out, _ = curate(docs, [dict(s) for s in steps])
    got = sorted(r.doc_id for r in out.collect())

    # reference: the pre-round-12 keep-set formulation, operator frames
    ref = docs
    scored = quality_score(ref, "doc_id", "text")
    keep = scored.filter(F.col("quality_score") >= 0.4)
    ref = ref.join(keep.select("doc_id"), "doc_id", "left_semi")
    lid = language_id(ref, "doc_id", "text")
    keep = lid.filter(F.col("predicted_lang").isin(["en"]))
    ref = ref.join(keep.select("doc_id"), "doc_id", "left_semi")
    pii = pii_counts(ref, "doc_id", "text")
    keep = pii.filter(F.col("url_count") <= 0)
    ref = ref.join(keep.select("doc_id"), "doc_id", "left_semi")
    rep = repetition_stats(ref, "doc_id", "text")
    keep = rep.filter(F.col("dup_line_fraction") <= 0.5)
    ref = ref.join(keep.select("doc_id"), "doc_id", "left_semi")
    expect = sorted(r.doc_id for r in ref.collect())
    assert got == expect


def test_inline_gate_chain_has_no_join_or_exchange(spark):
    docs = _docs(spark)
    out, _ = curate(docs, [
        {"kind": "quality_filter", "min_score": 0.1},
        {"kind": "langid_filter", "allowed": ["en", "de"]},
        {"kind": "pii_filter", "max_email_count": 3},
        {"kind": "repetition_filter", "max_dup_token_fraction": 0.9,
         "max_dup_line_fraction": 0.9},
        {"kind": "length_filter", "min_chars": 1},
    ])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Exchange" not in plan
    out.count()  # and it runs


def test_repetition_top_bigram_still_uses_keep_set(spark):
    docs = _docs(spark)
    out, _ = curate(docs, [
        {"kind": "repetition_filter", "max_top_bigram_fraction": 0.9},
    ])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" in plan  # the per-doc max needs the operator channel
    assert out.count() > 0


def test_inline_gates_null_id_semantics_pinned(spark):
    """PINNED round-13 semantics for NULL-id rows (ADVICE r12): inline
    gates judge rows by TEXT only, so a passing NULL-id row SURVIVES —
    intentionally different from the old keep-set semi-join, which
    dropped NULL-id rows unconditionally (NULL join keys never match).
    Keep-set steps retain the old behavior; both halves asserted here."""
    rows = [(1, "The quick brown fox jumps over the lazy dog. " * 4),
            (None, "The quick brown fox jumps over the lazy dog. " * 4),
            (None, "!!! ??? ... ;;; ::: ---")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # inline gate: the good NULL-id row survives, the junk one is cut
    out, _ = curate(docs, [{"kind": "quality_filter", "min_score": 0.4}])
    got = sorted(
        [(r.doc_id, r.text[:3]) for r in out.collect()],
        key=lambda t: (t[0] is None, t[1]),
    )
    assert (1, "The") in got
    assert (None, "The") in got and len(got) == 2

    # keep-set step (corpus_filter) still drops NULL-id rows outright
    out2, _ = curate(docs, [{"kind": "corpus_filter", "min_tokens": 1}])
    assert sorted(r.doc_id for r in out2.collect() if r.doc_id) == [1]
    assert all(r.doc_id is not None for r in out2.collect())


def test_script_filter_inline_gate(spark):
    rows = [
        (1, "mostly latin words here with one слово"),
        (2, "Привет мир почти всё кириллица ok"),
        (3, "   "),
        (4, None),
        (5, "balanced abc где"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out, _ = curate(
        docs, [{"kind": "script_filter", "min_share_ppm": 600_000}]
    )
    # docs 1 and 5 pass (latin >= 60% of non-whitespace); doc 2 fails;
    # whitespace-only and NULL text carry no script evidence and drop
    assert sorted(r.doc_id for r in out.collect()) == [1, 5]
    cyr, _ = curate(
        docs,
        [{"kind": "script_filter", "script": "cyrillic",
          "min_share_ppm": 500_000}],
    )
    assert sorted(r.doc_id for r in cyr.collect()) == [2]


def test_script_filter_funnel_and_plan_shape(spark):
    from soda_spark_spark.pipeline import gate_funnel

    docs = spark.createDataFrame(
        [(1, "clean latin text that is long enough", "s1"),
         (2, "Привет мир кириллица всюду тут да", "s1")],
        "doc_id long, text string, source string",
    )
    funnel = gate_funnel(
        docs,
        [{"kind": "length_filter", "min_chars": 10},
         {"kind": "script_filter", "min_share_ppm": 600_000}],
    )
    got = {r.stage: (r.kind, r.n_in, r.n_out) for r in funnel.collect()}
    assert got[1] == ("length_filter", 2, 2)
    assert got[2] == ("script_filter", 2, 1)
    # inline contract: the gate chain plans with zero Join / Exchange
    out, _ = curate(
        docs,
        [{"kind": "script_filter", "min_share_ppm": 600_000},
         {"kind": "length_filter", "min_chars": 10}],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan


def test_script_filter_validation(spark):
    import pytest

    from soda_spark_spark.operators.text import script_share_condition

    with pytest.raises(ValueError, match="unknown script"):
        script_share_condition(F.col("t"), "klingon", 500_000)
    with pytest.raises(ValueError, match="min_share_ppm"):
        script_share_condition(F.col("t"), "latin", 2_000_000)
