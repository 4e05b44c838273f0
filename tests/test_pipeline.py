"""Declarative curation pipeline: step chaining, filters, dedup tiers,
split; report counts; validation errors."""

from __future__ import annotations

import pytest

from soda_spark_spark import curate

GOOD = (
    "the quick brown fox jumps over the lazy dog and then runs far away into "
    "the woods while the hunter watches quietly from a distance near the river"
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, GOOD),
        (2, GOOD),  # exact duplicate of 1
        (3, GOOD.replace("quietly", "silently")),  # near-dup of 1
        (4, "der schnelle braune fuchs springt und der hund schlaeft unter dem baum im wald"),
        (5, "a a a a a a a a a a a a a a a a a a a a"),  # degenerate repetition
        (6, "ok"),  # too short
        (7, "the other document is about spark engines and the aggregation of "
            "very large distributed datasets with many executors in the cluster"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curate_full_flow(corpus):
    out, report = curate(
        corpus,
        [
            {"kind": "length_filter", "min_chars": 30},
            {"kind": "langid_filter", "allowed": ["en"]},
            {"kind": "repetition_filter", "max_top_bigram_fraction": 0.9},
            {"kind": "exact_dedup"},
            {"kind": "near_dedup", "threshold": 0.7, "num_hashes": 32, "bands": 8},
            {"kind": "split", "weights": {"train": 0.5, "val": 0.5}},
        ],
        report=True,
    )
    rows = {r.doc_id: r.split for r in out.collect()}
    # 6 dropped (short), 4+5 dropped (not classified en), 2 dropped (exact
    # dup of 1), 3 dropped (near-dup cluster with 1)
    assert set(rows) == {1, 7}
    assert all(s in ("train", "val") for s in rows.values())
    assert [r["rows"] for r in report] == [6, 4, 4, 3, 2, 2]
    assert [r["kind"] for r in report][0] == "length_filter"


def test_curate_is_lazy_without_report(corpus):
    out, report = curate(corpus, [{"kind": "length_filter", "min_chars": 30}])
    assert report == []
    assert out.count() == 6


def test_curate_pii_and_quality_filters(spark):
    df = spark.createDataFrame(
        [
            (1, GOOD),
            (2, GOOD + " contact me at someone@example.com or +1 (555) 123-4567"),
        ],
        "doc_id long, text string",
    )
    out, _ = curate(df, [{"kind": "pii_filter", "max_email_count": 0}])
    assert [r.doc_id for r in out.collect()] == [1]
    out2, _ = curate(df, [{"kind": "quality_filter", "min_score": 0.2}])
    assert out2.count() == 2


def test_curate_validation(corpus):
    with pytest.raises(ValueError, match="unknown kind"):
        curate(corpus, [{"kind": "nope"}])
    with pytest.raises(ValueError, match="unused arguments"):
        curate(corpus, [{"kind": "length_filter", "min_chars": 1, "typo_arg": 2}])


def test_curate_sample_deterministic(corpus):
    out1, _ = curate(corpus, [{"kind": "sample", "fraction": 0.5}])
    out2, _ = curate(corpus.repartition(5), [{"kind": "sample", "fraction": 0.5}])
    assert {r.doc_id for r in out1.collect()} == {r.doc_id for r in out2.collect()}


def test_curate_repetition_filter_drops_degenerate(spark):
    df = spark.createDataFrame(
        [(1, GOOD), (2, "spam spam spam spam spam spam spam spam spam spam")],
        "doc_id long, text string",
    )
    out, _ = curate(df, [{"kind": "repetition_filter", "max_dup_token_fraction": 0.5}])
    assert [r.doc_id for r in out.collect()] == [1]


def test_curate_round6_steps(spark):
    """corpus_filter, dedup_against, and domain_cap compose in one plan."""
    from soda_spark_spark import curate

    docs = spark.createDataFrame(
        [
            (1, "common words common words see https://a.example/x"),
            (2, "common words common words see https://a.example/y"),
            (3, "common words common words see https://a.example/z"),
            (4, "common words common words see https://b.example/x"),
            (5, "totally zxqv unique gibberish tokens qqq www eee rrr"),
            (6, "no url but common words common words fine here"),
        ],
        "doc_id long, text string",
    )
    seen = spark.createDataFrame(
        [(100, "common words common words see https://b.example/x")],
        "doc_id long, text string",
    )
    out, report = curate(
        docs,
        [
            # doc 5 is all corpus-rare tokens -> dropped
            {"kind": "corpus_filter", "max_rare_token_fraction": 0.6},
            # doc 4 exactly duplicates ingested history -> dropped
            {"kind": "dedup_against", "seen": seen},
            # a.example has 3 docs; cap 2 keeps ids 1,2; no-URL doc 6 kept
            {"kind": "domain_cap", "k": 2},
        ],
        report=True,
    )
    assert {r["doc_id"] for r in out.collect()} == {1, 2, 6}
    assert [r["kind"] for r in report] == ["corpus_filter", "dedup_against", "domain_cap"]


def test_curate_unknown_corpus_filter_arg_raises(spark):
    from soda_spark_spark import curate

    docs = spark.createDataFrame([(1, "t")], "doc_id long, text string")
    try:
        curate(docs, [{"kind": "corpus_filter", "bogus": 1}])
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "unused arguments" in str(e)


def test_curate_compression_filter(spark):
    from soda_spark_spark import curate

    docs = spark.createDataFrame(
        [
            (1, "spam " * 300),  # templated -> crushed ratio -> dropped
            (2, "Diverse natural prose with heterogeneous vocabulary and "
                "irregular structure resists dictionary compression well."),
            (3, ""),             # NULL ratio -> dropped
        ],
        "doc_id long, text string",
    )
    out, _ = curate(docs, [{"kind": "compression_filter", "min_ratio": 0.3}])
    assert {r["doc_id"] for r in out.collect()} == {2}


def test_curate_dedup_against_seen_tags(spark, tmp_path):
    """The dedup_against pipeline step accepts a persisted sketch via
    seen_tags with no raw `seen` DataFrame."""
    from pyspark.sql import functions as F

    from soda_spark_spark import curate
    from soda_spark_spark.operators.dedup import minhash_band_tags

    base = " ".join(f"w{i}" for i in range(40))
    near = " ".join(("CHANGED" if i == 17 else f"w{i}") for i in range(40))
    seen = spark.createDataFrame([(1, base)], "doc_id long, text string")
    df = spark.createDataFrame(
        [(10, near), (11, " ".join(f"x{i}" for i in range(40)))],
        "doc_id long, text string",
    )
    path = str(tmp_path / "sketch")
    minhash_band_tags(seen, "doc_id", "text").write.parquet(path)
    out, _ = curate(
        df,
        [{"kind": "dedup_against", "method": "minhash", "threshold": 0.7,
          "seen_tags": spark.read.parquet(path)}],
    )
    assert {r["doc_id"] for r in out.collect()} == {11}


def test_curate_dedup_lines_step(spark):
    """dedup_lines composes as a curate() step: boilerplate lines are
    rewritten away before downstream gates see the text."""
    from soda_spark_spark import curate

    banner = "SUBSCRIBE TO OUR NEWSLETTER TODAY"
    df = spark.createDataFrame(
        [
            (1, f"{banner}\nreal content one two three four five six"),
            (2, f"{banner}\nmore genuine content seven eight nine ten"),
            (3, f"{banner}"),
        ],
        "doc_id long, text string",
    )
    out, report = curate(
        df,
        [
            {"kind": "dedup_lines"},
            {"kind": "length_filter", "min_chars": 1},
        ],
        report=True,
    )
    rows = {r["doc_id"]: r["text"] for r in out.collect()}
    # doc 3 became empty after the line pass and fell to the length gate
    assert set(rows) == {1, 2}
    assert banner not in rows[1] and banner not in rows[2]
    assert [r["rows"] for r in report] == [3, 2]


def test_curate_round8_steps(spark):
    """clean_lines, gopher_filter and temperature_mixture compose as
    curate() steps and match the direct operator calls."""
    from pyspark.sql import functions as F

    from soda_spark_spark import curate
    from soda_spark_spark.operators.packing import temperature_mixture_sample
    from soda_spark_spark.operators.text import clean_lines, gopher_filter

    good = (
        "the quick brown fox jumps over the lazy dog and runs to be with "
        "friends of that pack which have gathered near the river bank today "
        "while many other animals watch from the shade of tall green trees "
        "that line the water and sway gently with the evening wind as birds "
        "call out from above and the day slowly turns to dusk over the hills."
    )
    rows = [(i, "a" if i % 3 else "b",
             good + "\njunk line no punct" if i % 5 else "short doc.")
            for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")

    out, report = curate(
        df,
        [
            {"kind": "clean_lines"},
            {"kind": "gopher_filter"},
            {"kind": "temperature_mixture", "group_col": "source",
             "alpha": 0.5, "target_rows": 30, "ppm": True},
        ],
        report=True,
    )
    got = {r["doc_id"] for r in out.collect()}
    want_df = temperature_mixture_sample(
        gopher_filter(clean_lines(df, "doc_id", "text"), "doc_id", "text"),
        "doc_id", "source", alpha=0.5, target_rows=30, ppm=True,
    )
    want = {r["doc_id"] for r in want_df.collect()}
    assert got == want and got
    # junk lines were rewritten away before the gate
    assert all("junk" not in r["text"] for r in out.collect())
    # short docs (every 5th) failed the gopher word-count rule
    assert all(i % 5 != 0 for i in got)
    assert [r["kind"] for r in report] == [
        "clean_lines", "gopher_filter", "temperature_mixture"
    ]


def test_eval_split_recipe_decontaminates_train_only(spark):
    import pyspark.sql.functions as F

    from soda_spark_spark.operators.sampling import train_val_test_split
    from soda_spark_spark.pipeline import eval_split_recipe

    leak = "the quick brown fox jumps over the lazy dog tonight"
    rows = [(i, f"doc {i} body filler words number {i} " + leak)
            for i in range(40)] + [(99, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = eval_split_recipe(df, "doc_id", "text", n=8).cache()
    splits = {r.doc_id: r.split for r in out.collect()}
    texts = {r.doc_id: r.text for r in out.collect()}

    # split assignment matches the standalone operator (composition adds
    # nothing to the split decision)
    base = {r.doc_id: r.split for r in train_val_test_split(
        df, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}).collect()}
    assert splits == base
    held = {i for i, s in splits.items() if s != "train"}
    assert held and len(held) < len(rows)  # both sides populated

    held_with_text = [i for i in held if texts[i] is not None]
    if held_with_text:
        # the 8-token leak span is cut from every train doc, kept verbatim
        # in held-out docs
        for i, s in splits.items():
            if texts[i] is None:
                continue
            if s == "train":
                assert leak not in texts[i], f"train doc {i} still leaks"
            else:
                assert texts[i] == dict(rows)[i]  # byte-identical
    assert texts.get(99) is None  # null text survives as null
    out.unpersist()


def test_curate_url_dedup_and_decontaminate_steps(spark):
    import pyspark.sql.functions as F

    from soda_spark_spark.pipeline import curate

    leak = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, "body one with words " + leak, "https://a.com/x?utm_source=t"),
        (2, "body two other words entirely here now", "https://A.com/x"),
        (3, "body three no url and more text " + leak, None),
        (4, "body four unique url content okay", "https://b.org/y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, url string")
    bench = spark.createDataFrame([(0, leak)], "bid long, text string")
    out, report = curate(df, [
        {"kind": "url_dedup", "url_col": "url"},
        {"kind": "decontaminate", "benchmark": bench, "n": 8},
    ], report=True)
    got = {r.doc_id: r.text for r in out.collect()}
    # url group {1,2} collapses to 1; null-url doc 3 survives
    assert sorted(got) == [1, 3, 4]
    assert leak not in got[1] and leak not in got[3]
    assert "body four" in got[4]
    assert [r["rows"] for r in report] == [3, 3]

    with pytest.raises(ValueError, match="unused arguments"):
        curate(df, [{"kind": "exact_dedup", "bogus": 1}])
