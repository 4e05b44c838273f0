"""NBSP normalization (r14 VERDICT Next #7): the opt-in
`normalize_text(normalize_nbsp=True)` extension and the
`nbsp_normalize` curate step — U+00A0/U+2007/U+202F to plain spaces in
one regexp_replace, re-basing length/script-share signals without
touching `html_to_text`'s keep-NBSP contract."""

from __future__ import annotations

from pyspark.sql import functions as F

NBSP_TEXT = "spam pad ding here"


def test_normalize_text_nbsp_opt_in(spark):
    from soda_spark_spark.operators.text import normalize_text

    df = spark.createDataFrame([(1, NBSP_TEXT)], "id long, text string")
    # default: NBSP family untouched (engine-replayability contract)
    off = normalize_text(
        df, "text", lowercase=False, collapse_whitespace=False,
        strip_control=False,
    ).first().text
    assert off == NBSP_TEXT
    on = normalize_text(
        df, "text", lowercase=False, collapse_whitespace=False,
        strip_control=False, normalize_nbsp=True,
    ).first().text
    assert on == "spam pad ding here"
    # with collapse: the mapped spaces fold into runs and trim
    both = normalize_text(
        df.select("id", F.concat(F.lit("  "), "text").alias("text")),
        "text", lowercase=False, normalize_nbsp=True,
    ).first().text
    assert both == "spam pad ding here"


def test_curate_nbsp_step_rewrites_and_rebases_script_share(spark):
    from soda_spark_spark.pipeline import curate

    # 4 latin chars vs 12 NBSP-joined cyrillic chars: with raw NBSPs
    # counted as non-whitespace evidence the latin share is diluted;
    # the normalize step does not change which chars are LATIN, but
    # pins that the rewrite output is exact and the gate composes
    df = spark.createDataFrame(
        [(1, NBSP_TEXT), (2, "   "), (3, None)],
        "doc_id long, text string",
    )
    out, _ = curate(df, [{"kind": "nbsp_normalize"}])
    got = {r.doc_id: r.text for r in out.collect()}
    assert got[1] == "spam pad ding here"
    assert got[2] == "   "
    assert got[3] is None
    # composed with the script gate: the all-NBSP doc becomes
    # whitespace-only and is dropped (no script evidence)
    gated, _ = curate(
        df,
        [
            {"kind": "nbsp_normalize"},
            {"kind": "script_filter", "script": "latin",
             "min_share_ppm": 500_000},
        ],
    )
    assert [r.doc_id for r in gated.collect()] == [1]
    # WITHOUT the normalize step the all-NBSP doc still fails (NBSP is
    # not latin), but an NBSP-padded latin doc's share is deflated:
    padded = spark.createDataFrame(
        [(7, "ab" + " " * 6)], "doc_id long, text string"
    )
    raw_gate, _ = curate(
        padded,
        [{"kind": "script_filter", "script": "latin",
          "min_share_ppm": 500_000}],
    )
    assert raw_gate.count() == 0  # 2 latin / 8 non-whitespace = 25%
    fixed_gate, _ = curate(
        padded,
        [
            {"kind": "nbsp_normalize"},
            {"kind": "script_filter", "script": "latin",
             "min_share_ppm": 500_000},
        ],
    )
    assert fixed_gate.count() == 1  # 2 latin / 2 non-whitespace
