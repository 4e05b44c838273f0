"""Exact quantile-bucket assignment (`stats.quantile_buckets`) and hot-key
diagnostics (`stats.key_skew`)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from soda_spark_spark.operators.stats import key_skew, quantile_buckets


def test_equal_frequency_buckets(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    out = quantile_buckets(df, "x", n_buckets=4)
    counts = {
        r.x_qbucket: r.n
        for r in out.groupBy("x_qbucket").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {0: 25, 1: 25, 2: 25, 3: 25}


def test_ties_land_low_and_cut_membership(spark):
    # values [1,1,1,1,2,2,2,2]: the 2-bucket cut is the 4th order
    # statistic (=1); rows equal to the cut stay in bucket 0
    df = spark.createDataFrame([(1.0,)] * 4 + [(2.0,)] * 4, "x double")
    out = quantile_buckets(df, "x", n_buckets=2)
    got = {(r.x, r.x_qbucket) for r in out.collect()}
    assert got == {(1.0, 0), (2.0, 1)}


def test_heavy_ties_skip_bucket_ids(spark):
    # one dominant value owns several cut ranks: ids jump but stay
    # monotone in the value
    df = spark.createDataFrame([(1.0,)] * 9 + [(5.0,)], "x double")
    out = quantile_buckets(df, "x", n_buckets=4)
    got = {(r.x, r.x_qbucket) for r in out.collect()}
    assert got == {(1.0, 0), (5.0, 3)}


def test_null_and_empty(spark):
    df = spark.createDataFrame([(1.0,), (None,), (2.0,)], "x double")
    out = quantile_buckets(df, "x", n_buckets=2)
    assert {r.x: r.x_qbucket for r in out.collect()}[None] is None
    empty = spark.createDataFrame([], "x double")
    assert quantile_buckets(empty, "x", n_buckets=2).count() == 0
    with pytest.raises(ValueError, match="n_buckets"):
        quantile_buckets(df, "x", n_buckets=1)


def test_bridges_doubles_into_zorder(spark):
    from soda_spark_spark.operators.packing import zorder_key

    df = spark.createDataFrame(
        [(float(i) / 7.0, i % 10) for i in range(50)], "price double, qty int"
    )
    bucketed = quantile_buckets(df, "price", n_buckets=8, bucket_col="pb")
    keyed = zorder_key(bucketed, ["pb", "qty"], bits=3)
    assert keyed.filter(F.col("zorder_key").isNull()).count() == 0
    assert keyed.select("zorder_key").distinct().count() > 8


def test_key_skew_report(spark):
    rows = (
        [("hot", i) for i in range(60)]
        + [(None, i) for i in range(25)]
        + [("warm", i) for i in range(10)]
        + [("c1", 0), ("c2", 1), ("c3", 2), ("c4", 3), ("c5", 4)]
    )
    df = spark.createDataFrame(rows, "k string, v int")
    out = key_skew(df, ["k"], k=3)
    got = [(r.value, r.n, r.share_ppm, r.rank) for r in
           sorted(out.collect(), key=lambda r: r.rank)]
    assert got == [
        ("hot", 60, 600_000, 1),
        (None, 25, 250_000, 2),   # NULL reported like any value
        ("warm", 10, 100_000, 3),
    ]


def test_key_skew_multi_column_and_ties(spark):
    df = spark.createDataFrame(
        [("a", 1), ("b", 1), ("a", 2), ("b", 2)], "k string, v int"
    )
    out = key_skew(df, ["k", "v"], k=2)
    by_col = {}
    for r in out.collect():
        by_col.setdefault(r.column, []).append((r.rank, r.value, r.n))
    # ties rank deterministically by value string ASC
    assert sorted(by_col["k"]) == [(1, "a", 2), (2, "b", 2)]
    assert sorted(by_col["v"]) == [(1, "1", 2), (2, "2", 2)]


def test_key_skew_validation(spark):
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError, match="at least one"):
        key_skew(df, [])
    with pytest.raises(ValueError, match="k must be"):
        key_skew(df, ["k"], k=0)


def test_outlier_report_fences(spark):
    from soda_spark_spark.operators.stats import outlier_report

    rows = [(float(i), None if i % 5 == 0 else float(i % 7))
            for i in range(1, 101)]
    rows += [(1000.0, 50.0), (-500.0, -50.0)]
    df = spark.createDataFrame(rows, "a double, b double")
    got = {r.column: r for r in outlier_report(df, ["a", "b"]).collect()}
    a = got["a"]
    # 102 values: q1 = 26th smallest = 25.0 (after -500), q3 = 77th = 76.0
    assert (a.n, a.q1, a.q3) == (102, 25.0, 76.0)
    assert a.lo_fence == 25.0 - 1.5 * 51.0 and a.hi_fence == 76.0 + 1.5 * 51.0
    assert (a.n_below, a.n_above) == (1, 1)
    b = got["b"]
    assert b.n == 82  # NULLs excluded
    assert (b.n_below, b.n_above) == (1, 1)


def test_outlier_report_all_null_and_validation(spark):
    import pytest as _pytest

    from soda_spark_spark.operators.stats import outlier_report

    df = spark.createDataFrame([(None,), (None,)], "x double")
    r = outlier_report(df, ["x"]).collect()[0]
    assert (r.n, r.q1, r.n_below, r.n_above) == (0, None, 0, 0)
    with _pytest.raises(ValueError, match="at least one"):
        outlier_report(df, [])
    with _pytest.raises(ValueError, match="k_iqr"):
        outlier_report(df, ["x"], k_iqr=-1)
