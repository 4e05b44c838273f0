"""Streaming integer-moment maintenance
(`streaming.moment_sketch_batch_writer` / `moment_sketch_compact`)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _vecs(spark, rows):
    return spark.createDataFrame(
        [(i, [int(x) for x in v]) for i, v in rows],
        "vec_id long, qvec array<long>",
    )


def test_compacted_log_equals_one_shot_moments(spark, tmp_path):
    from soda_spark_spark.operators.similarity import int_moments
    from soda_spark_spark.streaming.scan_stream import (
        moment_sketch_batch_writer, moment_sketch_compact,
    )

    all_rows = [(i, [(i * 3) % 11 - 5, (i * 7) % 13 - 6, i % 4]) for i in range(40)]
    full = _vecs(spark, all_rows)
    sketch_dir = str(tmp_path / "moments")
    writer = moment_sketch_batch_writer(sketch_dir, "vec_id", "qvec", run_id="t")
    writer(_vecs(spark, all_rows[:15]), 0)
    writer(_vecs(spark, all_rows[15:]), 1)
    got = {
        (r.i, r.j): r.s
        for r in moment_sketch_compact(
            spark.read.parquet(sketch_dir)
        ).collect()
    }
    want = {(r.i, r.j): r.s for r in int_moments(full, "vec_id", "qvec").collect()}
    assert got == want


def test_compact_dedupes_replayed_batch(spark, tmp_path):
    from soda_spark_spark.operators.similarity import int_moments
    from soda_spark_spark.streaming.scan_stream import (
        moment_sketch_batch_writer, moment_sketch_compact,
    )

    rows = [(i, [i % 3, 2 - i % 2]) for i in range(10)]
    df = _vecs(spark, rows)
    sketch_dir = str(tmp_path / "moments")
    writer = moment_sketch_batch_writer(sketch_dir, "vec_id", "qvec", run_id="t")
    writer(df, 0)
    writer(df, 0)  # replay of the same micro-batch
    got = {
        (r.i, r.j): r.s
        for r in moment_sketch_compact(
            spark.read.parquet(sketch_dir)
        ).collect()
    }
    want = {(r.i, r.j): r.s for r in int_moments(df, "vec_id", "qvec").collect()}
    assert got == want  # not doubled


def test_two_runs_need_distinct_run_ids(spark, tmp_path):
    """Two separate streaming queries share batch_id=0; without run
    separation compaction would collapse real data (the r14 bug).
    Distinct run_ids keep both runs' partials."""
    from soda_spark_spark.operators.similarity import int_moments
    from soda_spark_spark.streaming.scan_stream import (
        moment_sketch_batch_writer, moment_sketch_compact,
    )

    a = _vecs(spark, [(i, [i % 5, 1]) for i in range(10)])
    b = _vecs(spark, [(i, [i % 7, 2]) for i in range(10, 30)])
    sketch_dir = str(tmp_path / "moments")
    moment_sketch_batch_writer(sketch_dir, "vec_id", "qvec", run_id="day1")(a, 0)
    moment_sketch_batch_writer(sketch_dir, "vec_id", "qvec", run_id="day2")(b, 0)
    got = {
        (r.i, r.j): r.s
        for r in moment_sketch_compact(spark.read.parquet(sketch_dir)).collect()
    }
    full = a.unionByName(b)
    want = {(r.i, r.j): r.s for r in int_moments(full, "vec_id", "qvec").collect()}
    assert got == want
    assert got[(-1, -1)] == 30  # both snapshots counted
