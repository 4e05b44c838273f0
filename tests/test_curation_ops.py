"""Training-data curation operators: repetition stats, PII counts,
contamination overlap, deterministic / stratified sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from soda_spark_spark.operators.sampling import (
    deterministic_sample,
    stratified_sample,
)
from soda_spark_spark.operators.text import (
    contamination_overlap,
    pii_counts,
    repetition_stats,
    winnowing_fingerprints,
)


def test_repetition_stats_values(spark):
    df = spark.createDataFrame(
        [
            # 4 lines, one duplicated; tokens 'a a a b' -> dup tokens
            (1, "a a a b\nsame line\nsame line\nother"),
            (2, ""),  # degenerate: everything 0
            (3, "all distinct words here"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_stats(df, "doc_id", "text").collect()}
    r1 = rows[1]
    assert r1.dup_line_fraction == pytest.approx(1 / 4)  # 4 lines, 3 distinct
    # 'same line' = 9 chars duplicated once out of 7+9+9+5 = 30 line chars
    assert r1.dup_line_char_fraction == pytest.approx(9 / 30)
    # tokens: a a a b same line same line other -> 9 tokens, 5 distinct
    assert r1.dup_token_fraction == pytest.approx(4 / 9)
    # bigrams: 'a a' x2 is the top of 8 bigrams
    assert r1.top_bigram_fraction == pytest.approx(2 / 8)
    assert rows[2].dup_line_fraction == 0.0
    assert rows[2].top_bigram_fraction == 0.0
    assert rows[3].dup_token_fraction == 0.0


def test_pii_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at a.b@example.com or visit https://x.io/page"),
            (2, "server 10.0.0.1 and 192.168.1.254, call +1 (555) 123-4567"),
            (3, "nothing here"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in pii_counts(df, "doc_id", "text").collect()}
    assert rows[1].email_count == 1 and rows[1].url_count == 1
    assert rows[2].ipv4_count == 2 and rows[2].phone_count == 1
    assert rows[3].email_count == rows[3].url_count == 0


def test_contamination_overlap(spark):
    bench = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog tonight",)], "text string"
    )
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight extra words here"),
            (2, "completely different content with no overlap at all in any gram"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in contamination_overlap(
            docs, bench, id_col="doc_id", text_col="text", n=8
        ).collect()
    }
    assert out[1].contaminated_count == 3  # the 3 bench 8-grams all appear
    assert out[1].contamination_fraction > 0.4
    assert out[2].contaminated_count == 0
    assert out[2].contamination_fraction == 0.0


def test_deterministic_sample_is_partitioning_invariant(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "id long")
    a = {r.id for r in deterministic_sample(df, "id", 0.3).collect()}
    b = {
        r.id
        for r in deterministic_sample(df.repartition(13), "id", 0.3).collect()
    }
    assert a == b
    assert 200 < len(a) < 400  # ~30%
    # subset stability: sampling a subset never flips membership
    sub = df.filter(F.col("id") < 500)
    c = {r.id for r in deterministic_sample(sub, "id", 0.3).collect()}
    assert c == {i for i in a if i < 500}


def test_deterministic_sample_md5_variant(spark):
    df = spark.createDataFrame([(i,) for i in range(200)], "id long")
    a = {r.id for r in deterministic_sample(df, "id", 0.5, hash_fn="md5").collect()}
    b = {r.id for r in deterministic_sample(df, "id", 0.5, hash_fn="md5").collect()}
    assert a == b and 50 < len(a) < 150


def test_deterministic_sample_fraction_bounds(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        deterministic_sample(df, "id", 1.5)


def test_stratified_sample_caps_each_stratum(spark):
    rows = [(i, "big" if i < 90 else "small") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, stratum string")
    out = stratified_sample(df, "id", ["stratum"], 5)
    counts = {
        r.stratum: r.n
        for r in out.groupBy("stratum").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"big": 5, "small": 5}
    # deterministic: same selection every run
    again = stratified_sample(df, "id", ["stratum"], 5)
    assert {r.id for r in out.collect()} == {r.id for r in again.collect()}


def test_winnowing_md5_variant(spark):
    df = spark.createDataFrame(
        [(1, "one two three four five six seven eight nine ten"),
         (2, "one two three four five six seven eight nine ten")],
        "doc_id long, text string",
    )
    out = winnowing_fingerprints(df, "doc_id", "text", hash_fn="md5").collect()
    fps = {r.doc_id: r.fingerprints for r in out}
    assert fps[1] == fps[2] and len(fps[1]) > 0
    with pytest.raises(ValueError):
        winnowing_fingerprints(df, "doc_id", "text", hash_fn="bogus")


def test_curation_ops_on_empty_input(spark):
    """Empty frames must produce empty results, not crash (driver edge)."""
    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    empty_orders = spark.createDataFrame([], "id long, s string")
    assert repetition_stats(empty_docs, "doc_id", "text").count() == 0
    assert pii_counts(empty_docs, "doc_id", "text").count() == 0
    assert (
        contamination_overlap(
            empty_docs, empty_docs, id_col="doc_id", text_col="text"
        ).count()
        == 0
    )
    assert deterministic_sample(empty_orders, "id", 0.5).count() == 0
    assert stratified_sample(empty_orders, "id", ["s"], 3).count() == 0
    assert winnowing_fingerprints(empty_docs, "doc_id", "text").count() == 0


def test_null_text_rows_survive(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "real text here")], "doc_id long, text string"
    )
    assert repetition_stats(df, "doc_id", "text").count() == 2
    assert pii_counts(df, "doc_id", "text").count() == 2
