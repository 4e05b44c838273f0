"""Round-11 regression tests for the five round-10 ADVICE.md items:

1. interval_join: a NULL-bounded interval matches nothing (it used to
   fall through every when() branch into the raise_error guard and
   crash the whole job).
2. bm25_search certified channel: the documented idf_ppm*tfn_ppm
   BIGINT bound is now ENFORCED — an out-of-range configuration raises
   a clear error instead of wrapping to negative scores and ranking
   wrong; in-range results are byte-identical to before the guard.
3. curate() perplexity_tier step releases perplexity_buckets'
   _cached_scores persist instead of leaking one cached frame per
   invocation.
4. kmv_sketch_batch_writer treats ONLY a missing artifact path as
   "first batch"; a corrupt/unreadable existing artifact propagates
   instead of silently appending duplicates.
5. kmv_estimate md5-channel docstring describes the estimator as a
   correctly-rounded double divide over exactly-representable
   integers (not "pure integer arithmetic").
"""
from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from soda_spark_spark.operators.joins import interval_join
from soda_spark_spark.operators.similarity import bm25_index, bm25_search


# ------------------------------------------------- 1. interval_join NULLs


def test_interval_join_null_bounds_match_nothing(spark):
    pdf = spark.createDataFrame([(1, 5), (2, 15)], "pid long, t long")
    idf = spark.createDataFrame(
        [(100, 0, 10), (200, None, 10), (300, 0, None), (400, None, None)],
        "iid long, s long, e long",
    )
    got = sorted(
        (r.pid, r.iid)
        for r in interval_join(
            pdf, idf, point_col="t", start_col="s", end_col="e",
            bucket_width=4,
        ).collect()
    )
    # only the fully-bounded interval matches; NULL bounds crash nothing
    assert got == [(1, 100)]


def test_interval_join_null_bounds_left_join(spark):
    pdf = spark.createDataFrame([(1, 5)], "pid long, t long")
    idf = spark.createDataFrame(
        [(200, None, 10)], "iid long, s long, e long"
    )
    left = [
        (r.pid, r.iid)
        for r in interval_join(
            pdf, idf, point_col="t", start_col="s", end_col="e",
            bucket_width=4, how="left",
        ).collect()
    ]
    assert left == [(1, None)]  # same as the naive BETWEEN (NULL-false)


# --------------------------------------- 2. bm25 exact-channel overflow


DOCS = [
    (1, "spark scan fast fast table"),
    (2, "scan slow table table table join"),
    (3, "join merge window spark spark"),
    (4, "window window window batch"),
    (5, "batch stream stream fast scan"),
]


def test_bm25_overflow_guard_raises_not_wraps(spark):
    docs = spark.createDataFrame(DOCS, "id long, text string")
    idx = bm25_index(docs, "id", "text")
    q = spark.createDataFrame([(1, "slow")], "query_id long, term string")
    # k1=1e10 -> k1m=1e13 -> idf_ppm limit ~ 922; any real idf_ppm
    # (millions) exceeds it. Before the guard this silently wrapped.
    with pytest.raises(Exception, match="overflow|exceeds"):
        bm25_search(idx, q, k=3, k1=1e10).collect()


def test_bm25_guard_leaves_inrange_results_unchanged(spark):
    docs = spark.createDataFrame(DOCS, "id long, text string")
    idx = bm25_index(docs, "id", "text")
    q = spark.createDataFrame(
        [(1, "scan"), (1, "fast"), (2, "window")],
        "query_id long, term string",
    )
    rows = bm25_search(idx, q, k=5).collect()
    assert rows and all(r.score_p12 > 0 for r in rows)
    # rank 1 for query 2 is the window-heavy doc 4
    top2 = [r for r in rows if r.query_id == 2 and r.rank == 1]
    assert [r.id for r in top2] == [4]


# ------------------------------- 3. perplexity_tier releases the cache


def test_curate_perplexity_tier_releases_cache(spark):
    from soda_spark_spark.operators.lm import ngram_lm
    from soda_spark_spark.pipeline import curate

    docs = spark.createDataFrame(
        [(i, "the quick brown fox " * (1 + i % 3)) for i in range(30)]
        + [(100 + i, "zz qq xx vv " * 2) for i in range(6)],
        "doc_id long, text string",
    )
    model = ngram_lm(docs, "doc_id", "text", n=2)
    jsc = spark.sparkContext._jsc.sc()
    n_before = jsc.getPersistentRDDs().size()
    out, _ = curate(
        docs,
        [{"kind": "perplexity_tier", "model": model, "keep": ["head"]}],
    )
    out.count()
    n_after = jsc.getPersistentRDDs().size()
    # the step must not leave its score frame persisted behind
    assert n_after <= n_before


# ------------------------------ 4. kmv writer: corrupt artifact raises


def test_kmv_batch_writer_first_batch_vs_corrupt(spark, tmp_path):
    from soda_spark_spark.streaming.scan_stream import (
        kmv_sketch_batch_writer,
    )

    a = spark.range(0, 50).select(F.col("id").alias("v"))
    missing = str(tmp_path / "not_there_yet")
    writer = kmv_sketch_batch_writer(missing, "v", k=16, hash_fn="md5")
    writer(a, 0)  # path-missing IS the first-batch case: no raise
    assert spark.read.parquet(missing).count() >= 1

    corrupt = tmp_path / "corrupt"
    corrupt.mkdir()
    (corrupt / "part-00000.parquet").write_bytes(b"this is not parquet")
    writer2 = kmv_sketch_batch_writer(str(corrupt), "v", k=16,
                                      hash_fn="md5")
    with pytest.raises(Exception):
        writer2(a, 0)  # corruption must PROPAGATE, not append duplicates


def test_kmv_batch_writer_schema_drift_raises(spark, tmp_path):
    from soda_spark_spark.streaming.scan_stream import (
        kmv_sketch_batch_writer,
    )

    # an existing artifact with the WRONG schema (no 'h' column) must
    # surface as an error, not be treated as "first batch"
    path = str(tmp_path / "drifted")
    spark.createDataFrame([(1,)], "wrong_col long").write.parquet(path)
    writer = kmv_sketch_batch_writer(path, "v", k=16, hash_fn="md5")
    a = spark.range(0, 10).select(F.col("id").alias("v"))
    with pytest.raises(Exception):
        writer(a, 0)


# ----------------------------------------- 5. kmv_estimate docstring


def test_kmv_estimate_docstring_accurate():
    from soda_spark_spark.operators import cardinality

    doc = cardinality.kmv_estimate.__doc__
    assert "pure integer arithmetic" not in doc or "NOT pure" in doc
    assert "correctly-rounded" in doc
    assert "correctly-rounded" in cardinality.__doc__
