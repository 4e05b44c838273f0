"""Round-12 regression tests for the three round-11 ADVICE.md items:

1. bm25_search overflow guard fired on BOTH channels: score_p12 was
   computed through the raise_error even with rank_by='bm25', so
   corpora beyond the exact-channel bound crashed the documented
   float-channel fallback. Now: rank_by='exact' still raises loudly;
   rank_by='bm25' keeps running and emits NULL score_p12 for the
   affected (query_id, id) groups — never a partial sum.
2. The guard's remediation message named rank_by='float', a value the
   validator rejects. It now names rank_by='bm25' (the value that
   actually works).
3. kmv_sketch_batch_writer first-batch detection matched exception
   message substrings; it now matches the structured error class, and
   an existing-but-empty sketch directory (interrupted first write)
   counts as a first batch instead of wedging the stream forever.
"""
from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from soda_spark_spark.operators.similarity import bm25_index, bm25_search

DOCS = [
    (1, "spark scan fast fast table"),
    (2, "scan slow table table table join"),
    (3, "join merge window spark spark"),
    (4, "window window window batch"),
    (5, "batch stream stream fast scan"),
]


# ------------------- 1. float channel survives exact-channel overflow


def test_bm25_float_channel_survives_overflow(spark):
    docs = spark.createDataFrame(DOCS, "id long, text string")
    idx = bm25_index(docs, "id", "text")
    q = spark.createDataFrame([(1, "slow")], "query_id long, term string")
    # k1=1e10 -> idf_ppm limit ~922; every real idf_ppm exceeds it, so
    # the exact channel is out of range — but ranking by the float
    # channel must keep working (the documented fallback).
    rows = bm25_search(idx, q, k=3, k1=1e10, rank_by="bm25").collect()
    assert rows, "float channel must produce results beyond the bound"
    assert all(r.score_p12 is None for r in rows)
    assert all(r.bm25 is not None for r in rows)
    # and the float ranking is still ordered
    assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == list(
        range(1, len(rows) + 1)
    )


def test_bm25_exact_channel_still_raises_with_working_remedy(spark):
    docs = spark.createDataFrame(DOCS, "id long, text string")
    idx = bm25_index(docs, "id", "text")
    q = spark.createDataFrame([(1, "slow")], "query_id long, term string")
    with pytest.raises(Exception, match="rank_by='bm25'") as ei:
        bm25_search(idx, q, k=3, k1=1e10, rank_by="exact").collect()
    # the remediation value it names must actually be accepted
    assert "rank_by='float'" not in str(ei.value)
    bm25_search(idx, q, k=3, rank_by="bm25").collect()  # no raise


def test_bm25_no_partial_sum_on_mixed_overflow(spark):
    # One query with one in-range term and one configuration-wide
    # overflow: the whole group's score_p12 must be NULL, not the
    # in-range term's lone contribution masquerading as the exact sum.
    docs = spark.createDataFrame(DOCS, "id long, text string")
    idx = bm25_index(docs, "id", "text")
    q = spark.createDataFrame(
        [(1, "scan"), (1, "slow")], "query_id long, term string"
    )
    rows = bm25_search(idx, q, k=5, k1=1e10, rank_by="bm25").collect()
    assert rows
    assert all(r.score_p12 is None for r in rows)


def test_bm25_inrange_parity_across_channels(spark):
    # In-range corpora: the guard must not change either channel.
    docs = spark.createDataFrame(DOCS, "id long, text string")
    idx = bm25_index(docs, "id", "text")
    q = spark.createDataFrame(
        [(1, "scan"), (1, "fast"), (2, "window")],
        "query_id long, term string",
    )
    exact = bm25_search(idx, q, k=5, rank_by="exact").collect()
    flt = bm25_search(idx, q, k=5, rank_by="bm25").collect()
    assert all(r.score_p12 is not None and r.score_p12 > 0 for r in exact)
    assert all(r.score_p12 is not None and r.score_p12 > 0 for r in flt)
    # same (query, id) candidate sets and identical exact scores
    key = lambda r: (r.query_id, r.id)  # noqa: E731
    assert {key(r): r.score_p12 for r in exact} == {
        key(r): r.score_p12 for r in flt
    }


# --------------- 3. kmv writer: structured error class + empty dir


def test_kmv_batch_writer_empty_dir_is_first_batch(spark, tmp_path):
    from soda_spark_spark.streaming.scan_stream import (
        kmv_sketch_batch_writer,
    )

    # an existing-but-empty directory (interrupted first write) must be
    # treated as a first batch, not wedge the stream forever
    empty = tmp_path / "interrupted"
    empty.mkdir()
    (empty / "_temporary").mkdir()
    a = spark.range(0, 50).select(F.col("id").alias("v"))
    writer = kmv_sketch_batch_writer(str(empty), "v", k=16, hash_fn="md5")
    writer(a, 0)
    assert spark.read.parquet(str(empty)).count() >= 1
    # second batch anti-joins against the now-committed artifact
    n1 = spark.read.parquet(str(empty)).count()
    writer(a, 1)  # identical rows: nothing genuinely new
    assert spark.read.parquet(str(empty)).count() == n1


def test_kmv_batch_writer_corrupt_artifact_still_raises(spark, tmp_path):
    from soda_spark_spark.streaming.scan_stream import (
        kmv_sketch_batch_writer,
    )

    corrupt = tmp_path / "corrupt"
    corrupt.mkdir()
    (corrupt / "part-00000.parquet").write_bytes(b"this is not parquet")
    a = spark.range(0, 10).select(F.col("id").alias("v"))
    writer = kmv_sketch_batch_writer(str(corrupt), "v", k=16, hash_fn="md5")
    with pytest.raises(Exception):
        writer(a, 0)


def test_error_condition_helper_non_spark_exception():
    from soda_spark_spark.streaming.scan_stream import _error_condition

    assert _error_condition(ValueError("nope")) is None
