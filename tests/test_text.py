"""Unit tests for text-analysis operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from soda_spark_spark.operators.text import (
    bpe_ish_token_count,
    fingerprint,
    language_id,
    quality_score,
    text_stats,
    token_count,
    winnowing_fingerprints,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat and the dog played in the garden for hours with the children"),
            (2, "der Hund und die Katze sind nicht mit der Maus auf der Wiese"),
            (3, "le chat est dans la maison et le chien est pour les enfants"),
            (4, "el perro y el gato es una mascota para la casa con los niños"),
            (5, "xyzzy qwerty plugh"),
            (6, ""),
        ],
        "doc_id long, text string",
    )


def test_token_count(spark):
    df = spark.createDataFrame([("a b  c",), ("  x ",), ("",), ("one",)], "t string")
    out = [r.n for r in df.select(token_count(F.col("t")).alias("n")).collect()]
    assert out == [3, 1, 0, 1]


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame([("hello, world42!",)], "t string")
    # hello | , | world | 42 | !
    assert df.select(bpe_ish_token_count(F.col("t")).alias("n")).first().n == 5


def test_text_stats(docs):
    row = {r.doc_id: r for r in text_stats(docs, "doc_id", "text").collect()}
    r1 = row[1]
    assert r1.token_count == 14
    assert r1.char_count == len("the cat and the dog played in the garden for hours with the children")
    assert r1.stopword_ratio > 0.2  # 'the' x4, 'and', 'in', 'for', 'with'
    assert r1.punct_ratio == 0.0
    assert row[6].token_count == 0 and row[6].char_count == 0


def test_quality_score_ranges(docs):
    scores = {r.doc_id: r.quality_score for r in quality_score(docs, "doc_id", "text").collect()}
    assert all(0.0 <= s <= 1.0 for s in scores.values())
    assert scores[1] > scores[5]  # real English beats gibberish
    assert scores[6] <= 0.5  # empty doc scores low


def test_language_id(docs):
    pred = {r.doc_id: r.predicted_lang for r in language_id(docs, "doc_id", "text").collect()}
    assert pred[1] == "en"
    assert pred[2] == "de"
    assert pred[3] == "fr"
    assert pred[4] == "es"
    assert pred[5] == "und"
    assert pred[6] == "und"


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "  HELLO\tWORLD  "), (4, "other")],
        "doc_id long, text string",
    )
    fps = {r.doc_id: r.fingerprint for r in fingerprint(df, "doc_id", "text").collect()}
    assert fps[1] == fps[2] == fps[3]
    assert fps[4] != fps[1]


def test_winnowing_fingerprints(spark):
    base = "one two three four five six seven eight nine ten eleven twelve"
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, "totally different words appear here in this document okay")],
        "doc_id long, text string",
    )
    out = {r.doc_id: set(r.fingerprints) for r in winnowing_fingerprints(df, "doc_id", "text").collect()}
    assert out[1] == out[2] and len(out[1]) > 0
    assert not (out[1] & out[3])
    # short doc -> empty sketch, not an error
    short = spark.createDataFrame([(9, "a b")], "doc_id long, text string")
    assert winnowing_fingerprints(short, "doc_id", "text").first().fingerprints == []


def test_winnowing_overlap_pairs(spark):
    from soda_spark_spark.operators.text import winnowing_overlap_pairs

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon")
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base),  # identical: full overlap
            (3, base.replace("pi rho", "PHI RHO2")),  # partial overlap
            (4, "entirely different words about query engines and shuffles "
                "with more tokens than the winnowing window needs here now"),
        ],
        "doc_id long, text string",
    )
    rows = {(r.id_a, r.id_b): (r.shared, r.overlap)
            for r in winnowing_overlap_pairs(df, "doc_id", "text").collect()}
    assert rows[(1, 2)][1] == 1.0  # identical docs: overlap 1.0
    assert (1, 3) in rows and 0.0 < rows[(1, 3)][1] < 1.0
    assert not any(4 in p for p in rows)


def test_winnowing_overlap_fp_freq_cap(spark):
    from soda_spark_spark.operators.text import winnowing_overlap_pairs

    base = "one two three four five six seven eight nine ten eleven twelve"
    df = spark.createDataFrame(
        [(i, base) for i in range(6)], "doc_id long, text string"
    )
    uncapped = winnowing_overlap_pairs(df, "doc_id", "text")
    capped = winnowing_overlap_pairs(df, "doc_id", "text", max_fp_freq=3)
    assert uncapped.count() == 15  # all pairs share all fingerprints
    assert capped.count() == 0  # boilerplate fingerprints dropped


def test_winnowing_arrow_matches_catalyst(spark):
    """The Arrow mapInPandas kernels (md5 AND xxhash64) must produce
    byte-identical sketches to the Catalyst HOF formulation, including
    whitespace edge cases and non-ASCII content."""
    rows = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, None),
        (2, "   "),
        (3, "short text"),
        (4, "\ta b c d e f g h i j k l m n o p"),  # leading tab survives trim
        (5, "x " * 40),
        (6, "tail trailing space a b c d e f g h   "),
        # NBSP ( ) is NOT whitespace under Java regex / RE2 \s — with
        # re.ASCII the Python kernel must agree and keep it inside tokens
        (7, "a b c d e f g h i j k l m n o p q"),
        (8, "café naïve résumé 日本 one two "
            "three four five six seven eight"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def run(**kw):
        return {
            r.doc_id: list(r.fingerprints)
            for r in winnowing_fingerprints(df, "doc_id", "text", **kw).collect()
        }

    assert run(hash_fn="md5", impl="arrow") == run(hash_fn="md5", impl="catalyst")
    for seed in (42, 7):
        assert run(hash_fn="xxhash64", seed=seed, impl="arrow") == run(
            hash_fn="xxhash64", seed=seed, impl="catalyst"
        )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        winnowing_fingerprints(df, "doc_id", "text", impl="bogus")


def test_winnowing_default_path_is_arrow(spark):
    """The DEFAULT configuration (hash_fn='xxhash64', impl='auto') must route
    to the Arrow mapInPandas kernel — the interpreted-HOF Catalyst path is
    opt-in only (impl='catalyst')."""
    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j")], "doc_id long, text string"
    )
    default_plan = winnowing_fingerprints(
        df, "doc_id", "text"
    )._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in default_plan
    catalyst_plan = winnowing_fingerprints(
        df, "doc_id", "text", impl="catalyst"
    )._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in catalyst_plan


def test_compression_ratio(spark):
    import zlib

    from soda_spark_spark.operators.text import compression_ratio

    repetitive = "spam " * 200
    prose = (
        "The quarterly report outlines revenue growth across distinct "
        "segments, with notable variance in regional adoption curves and "
        "heterogeneous churn patterns among enterprise cohorts."
    )
    docs = spark.createDataFrame(
        [(1, repetitive), (2, prose), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in compression_ratio(docs, "doc_id", "text").collect()}
    # deterministic: matches a local zlib call bit-for-bit
    assert rows[1]["compressed_bytes"] == len(zlib.compress(repetitive.encode(), 6))
    assert rows[1]["raw_bytes"] == len(repetitive.encode())
    assert rows[1]["compression_ratio"] < 0.1   # templated text crushes
    assert rows[2]["compression_ratio"] > 0.5   # natural prose doesn't
    assert rows[3]["compression_ratio"] is None  # empty
    assert rows[4]["compression_ratio"] is None  # NULL


def test_corpus_health_exact_ratios(spark):
    from soda_spark_spark.operators.text import corpus_health

    docs = spark.createDataFrame(
        [
            (1, "srcA", "the cat sat"),               # 3 tokens, 2 stopwords
            (2, "srcA", "see https://x.example/page"),  # URL-bearing
            (3, "srcB", "12345"),
        ],
        "doc_id long, source string, text string",
    )
    rows = {
        r["source"]: r
        for r in corpus_health(docs, "doc_id", "text", ["source"]).collect()
    }
    a, b = rows["srcA"], rows["srcB"]
    assert a["n_docs"] == 2 and b["n_docs"] == 1
    assert a["total_chars"] == len("the cat sat") + len("see https://x.example/page")
    assert a["total_tokens"] == 3 + 2
    assert a["url_doc_fraction"] == 0.5
    assert b["digit_ratio"] == 1.0  # "12345" is all digits
    assert b["url_doc_fraction"] == 0.0


def test_ngram_stats_counts_and_order(spark):
    from soda_spark_spark.operators.text import ngram_stats

    docs = spark.createDataFrame(
        [
            (1, "accept all cookies now"),
            (2, "accept all cookies please"),
            (3, "Accept ALL terms"),
            (4, "something else entirely"),
        ],
        "doc_id long, text string",
    )
    rows = ngram_stats(docs, "doc_id", "text", n=2, k=10, min_count=2).collect()
    assert [tuple(r) for r in rows] == [
        ("accept all", 3, 3),   # case-folded across docs 1-3
        ("all cookies", 2, 2),
    ]  # every other bigram is a singleton -> pruned by min_count


def test_distinctive_terms_rarity_first(spark):
    from soda_spark_spark.operators.text import distinctive_terms

    docs = spark.createDataFrame(
        [
            (1, "common common rareword common"),
            (2, "common common other"),
        ],
        "doc_id long, text string",
    )
    # corpus freq: common=5, rareword=1, other=1
    rows = [
        tuple(r)
        for r in distinctive_terms(docs, "doc_id", "text", k=2)
        .orderBy("doc_id", "rank")
        .collect()
    ]
    assert rows == [
        (1, "rareword", 1, 1, 1),  # rarest first
        (1, "common", 3, 5, 2),
        (2, "other", 1, 1, 1),
        (2, "common", 2, 5, 2),
    ]


def test_distinctive_terms_broadcast_vocab(spark):
    """broadcast_vocab_limit: same values, guaranteed BroadcastHashJoin
    plan when the vocabulary fits; silent fallback when it doesn't."""
    from soda_spark_spark.operators.text import distinctive_terms

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog ate the rare truffle"),
            (3, "the the the common words only"),
        ],
        "doc_id long, text string",
    )
    base = distinctive_terms(docs, "doc_id", "text", k=2)
    bcast = distinctive_terms(
        docs, "doc_id", "text", k=2, broadcast_vocab_limit=1000
    )
    key = lambda r: (r["doc_id"], r["rank"])  # noqa: E731
    assert sorted(map(tuple, bcast.collect()), key=lambda x: (x[0], x[4])) == \
        sorted(map(tuple, base.collect()), key=lambda x: (x[0], x[4]))
    plan = bcast._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # above the limit: falls back to the shuffle join, same values
    small = distinctive_terms(
        docs, "doc_id", "text", k=2, broadcast_vocab_limit=3
    )
    assert sorted(map(tuple, small.collect()), key=lambda x: (x[0], x[4])) == \
        sorted(map(tuple, base.collect()), key=lambda x: (x[0], x[4]))


def test_contamination_with_persisted_benchmark_grams(spark, tmp_path):
    from soda_spark_spark.operators.text import benchmark_ngrams, contamination_overlap

    bench = spark.createDataFrame(
        [(1, " ".join(f"b{i}" for i in range(12)))], "qid long, text string"
    )
    docs = spark.createDataFrame(
        [
            (10, " ".join(f"b{i}" for i in range(12))),   # fully contaminated
            (11, " ".join(f"c{i}" for i in range(12))),   # clean
        ],
        "doc_id long, text string",
    )
    direct = {
        r["doc_id"]: r["contamination_fraction"]
        for r in contamination_overlap(
            docs, bench, id_col="doc_id", text_col="text", n=8
        ).collect()
    }
    path = str(tmp_path / "bench_grams")
    benchmark_ngrams(bench, "text", n=8).write.parquet(path)
    stored = {
        r["doc_id"]: r["contamination_fraction"]
        for r in contamination_overlap(
            docs, None, id_col="doc_id", text_col="text", n=8,
            bench_grams=spark.read.parquet(path),
        ).collect()
    }
    assert stored == direct
    assert stored[10] == 1.0 and stored[11] == 0.0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="benchmark is required"):
        contamination_overlap(docs, None, id_col="doc_id", text_col="text")
    bad = spark.createDataFrame([(1,)], "x long")
    with _pytest.raises(ValueError, match="gram"):
        contamination_overlap(
            docs, None, id_col="doc_id", text_col="text", bench_grams=bad
        )


def test_winnowing_overlap_with_persisted_sketches(spark, tmp_path):
    from soda_spark_spark.operators.text import (
        winnowing_fingerprints, winnowing_overlap_pairs,
    )

    shared = " ".join(f"s{i}" for i in range(30))
    docs = spark.createDataFrame(
        [
            (1, shared + " tail one"),
            (2, shared + " tail two"),
            (3, " ".join(f"u{i}" for i in range(30))),
        ],
        "doc_id long, text string",
    )
    direct = sorted(
        (r["id_a"], r["id_b"], r["shared"])
        for r in winnowing_overlap_pairs(docs, "doc_id", "text").collect()
    )
    path = str(tmp_path / "wsk")
    winnowing_fingerprints(docs, "doc_id", "text").write.parquet(path)
    stored = sorted(
        (r["id_a"], r["id_b"], r["shared"])
        for r in winnowing_overlap_pairs(
            None, "doc_id", "text", sketches=spark.read.parquet(path)
        ).collect()
    )
    assert stored == direct and [(a, b) for a, b, _ in stored] == [(1, 2)]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="df is required"):
        winnowing_overlap_pairs(None, "doc_id", "text")
    bad = spark.createDataFrame([(1,)], "doc_id long")
    with _pytest.raises(ValueError, match="missing column"):
        winnowing_overlap_pairs(None, "doc_id", "text", sketches=bad)


# ---------------------------------------------------------------------------
# canonical_url / url_dedup / encoding_quality
# ---------------------------------------------------------------------------


def test_canonical_url_variants_collapse(spark):
    from soda_spark_spark.operators.text import canonical_url

    rows = [
        (1, "HTTPS://WWW.Example.COM:443/Path/?utm_source=x&b=2&a=1#frag"),
        (2, "https://example.com/Path?a=1&b=2"),
        (3, "http://Example.com:80/"),
        (4, "http://example.com"),
        (5, None),
        (6, "https://other.org/p?fbclid=abc"),
        (7, "https://example.com/CaseSensitivePath"),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    got = {r.id: r.c for r in df.select(
        "id", canonical_url(F.col("url")).alias("c")).collect()}
    assert got[1] == got[2] == "https://example.com/Path?a=1&b=2"
    assert got[3] == got[4] == "http://example.com"
    assert got[5] is None
    assert got[6] == "https://other.org/p"
    # path case survives canonicalization
    assert got[7] == "https://example.com/CaseSensitivePath"


def test_url_dedup_keeps_lowest_id(spark):
    from soda_spark_spark.operators.text import url_dedup

    rows = [
        (3, "https://a.com/x?utm_source=z"),
        (1, "https://A.com/x"),
        (2, "https://a.com/y"),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    out = url_dedup(df, "id", "url")
    assert sorted(r.id for r in out.collect()) == [1, 2]
    assert "canonical_url" in out.columns


def test_encoding_quality_counters(spark):
    from soda_spark_spark.operators.text import encoding_quality

    rows = [
        (1, "clean text with tabs\tand\nnewlines"),
        (2, "bad �� decode"),
        (3, "moji cafÃ© and â€™ quote"),
        (4, "ctrl \x00\x07 bytes"),
        (5, None),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in encoding_quality(df, "doc_id", "text").collect()}
    assert got[1].encoding_ok and got[6].encoding_ok
    assert got[2].replacement_chars == 2 and not got[2].encoding_ok
    assert got[3].mojibake_markers == 2 and not got[3].encoding_ok
    assert got[4].control_chars == 2 and not got[4].encoding_ok
    assert got[5].encoding_ok is None and got[5].control_chars is None


def test_decontaminate_spans_cuts_benchmark_overlap(spark):
    from soda_spark_spark.operators.text import decontaminate_spans

    docs = spark.createDataFrame([
        (1, "intro words here the quick brown fox jumps over it tail text"),
        (2, "unrelated body entirely different tokens throughout this one"),
        (3, None),
        (4, ""),
    ], "doc_id long, text string")
    bench = spark.createDataFrame(
        [("the quick brown fox jumps over",)], "text string"
    )
    got = {r.doc_id: r.text for r in
           decontaminate_spans(docs, bench, "doc_id", "text", n=3).collect()}
    assert got[1] == "intro words here it tail text"
    assert got[2] == "unrelated body entirely different tokens throughout this one"
    assert got[3] is None and got[4] == ""
    # hash_fn variants agree
    for fn in ("md5", "text"):
        alt = {r.doc_id: r.text for r in decontaminate_spans(
            docs, bench, "doc_id", "text", n=3, hash_fn=fn).collect()}
        assert alt == got


# ---------------------------------------------------------------------------
# script_profile
# ---------------------------------------------------------------------------


def test_script_profile_counts_and_dominant(spark):
    from soda_spark_spark.operators.text import script_profile

    docs = spark.createDataFrame(
        [
            (1, "Hello world 123"),
            (2, "Привет мир hello"),
            (3, "日本語のテキストです"),
            (4, "مرحبا بالعالم"),
            (5, "한국어 텍스트"),
            (6, "   "),
            (7, None),
            (8, "!!!"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in script_profile(docs, "doc_id", "text").collect()}
    r1 = got[1]
    assert (r1.latin_count, r1.digit_count, r1.space_count) == (10, 3, 2)
    assert r1.dominant_script == "latin"
    assert r1.latin_share_ppm == 10 * 1_000_000 // 13
    r2 = got[2]
    assert (r2.latin_count, r2.cyrillic_count) == (5, 9)
    assert r2.dominant_script == "cyrillic"
    assert r2.dominant_share_ppm == 9 * 1_000_000 // 14
    r3 = got[3]
    assert (r3.cjk_count, r3.kana_count) == (3, 7)
    assert r3.dominant_script == "kana"
    assert got[4].dominant_script == "arabic"
    assert got[5].dominant_script == "hangul"
    # all-whitespace: 'none' dominant, NULL shares
    assert got[6].dominant_script == "none"
    assert got[6].latin_share_ppm is None
    # NULL text: everything NULL
    assert got[7].dominant_script is None and got[7].latin_count is None
    # punctuation-only: other_count, zero shares
    assert (got[8].other_count, got[8].dominant_script,
            got[8].dominant_share_ppm) == (3, "none", 0)


def test_script_profile_tiebreak_class_order(spark):
    from soda_spark_spark.operators.text import script_profile

    # 2 latin vs 2 cyrillic: earlier class (latin) wins the tie
    docs = spark.createDataFrame([(1, "abЖЯ")], "doc_id long, text string")
    r = script_profile(docs, "doc_id", "text").collect()[0]
    assert (r.latin_count, r.cyrillic_count) == (2, 2)
    assert r.dominant_script == "latin"


def test_script_profile_digits_never_dominate(spark):
    from soda_spark_spark.operators.text import script_profile

    docs = spark.createDataFrame([(1, "12345 x")], "doc_id long, text string")
    r = script_profile(docs, "doc_id", "text").collect()[0]
    assert r.digit_count == 5 and r.dominant_script == "latin"


# ---------------------------------------------------------------------------
# split_sentences
# ---------------------------------------------------------------------------


def test_split_sentences_segmentation(spark):
    from soda_spark_spark.operators.text import split_sentences

    docs = spark.createDataFrame(
        [
            (1, "Hello there. How are you?  Fine!\nTrailing fragment"),
            (2, "No terminator at all"),
            (3, "Multi!!! Dots... end"),
            (4, ""),
            (5, None),
        ],
        "doc_id long, text string",
    )
    got = {}
    for r in split_sentences(docs, "doc_id", "text").collect():
        got.setdefault(r.doc_id, []).append((r.sent_idx, r.sentence, r.n_chars))
    assert sorted(got[1]) == [
        (0, "Hello there.", 12), (1, "How are you?", 12),
        (2, "Fine!", 5), (3, "Trailing fragment", 17),
    ]
    assert got[2] == [(0, "No terminator at all", 20)]
    # terminator runs stay attached to their sentence
    assert sorted(got[3]) == [(0, "Multi!!!", 8), (1, "Dots...", 7), (2, "end", 3)]
    # empty / NULL text yields no rows
    assert 4 not in got and 5 not in got


def test_split_sentences_min_chars(spark):
    from soda_spark_spark.operators.text import split_sentences

    docs = spark.createDataFrame(
        [(1, "Ok. A genuinely long sentence here.")],
        "doc_id long, text string",
    )
    out = split_sentences(docs, "doc_id", "text", min_chars=5).collect()
    # the 3-char 'Ok.' drops; indexing is dense AFTER the filter
    assert [(r.sent_idx, r.sentence) for r in out] == [
        (0, "A genuinely long sentence here.")
    ]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="min_chars"):
        split_sentences(docs, "doc_id", "text", min_chars=0)


def test_readability_counts_and_formula(spark):
    from soda_spark_spark.operators.text import readability

    docs = spark.createDataFrame(
        [
            (1, "The cat sat on the mat. It was happy."),
            (2, "no terminator here"),
            (3, "Tsk tsk."),      # vowel-less words floor at 1 syllable
            (4, ""),
            (5, None),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in readability(docs, "doc_id", "text").collect()}
    r1 = got[1]
    assert (r1.n_sentences, r1.n_words, r1.n_syllables) == (2, 9, 10)
    assert abs(
        r1.flesch - (206.835 - 1.015 * (9 / 2) - 84.6 * (10 / 9))
    ) < 1e-12
    assert (got[2].n_sentences, got[2].n_words, got[2].n_syllables) == (1, 3, 7)
    assert (got[3].n_words, got[3].n_syllables) == (2, 2)
    # empty text: zero counts, NULL score; NULL text: all NULL
    assert (got[4].n_words, got[4].flesch) == (0, None)
    assert got[5].n_words is None and got[5].flesch is None
