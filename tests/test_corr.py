"""Pearson correlation matrix (`stats.corr_matrix`), exact-decimal
sufficient-stats channel."""

from __future__ import annotations

import math

import pytest


def test_corr_matches_reference(spark):
    from soda_spark_spark.operators.stats import corr_matrix

    xs = [1.0, 2.0, 3.0, 4.0, 5.0]
    ys = [2.0, 1.0, 4.0, 3.0, 6.0]
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    [r] = corr_matrix(df, ["x", "y"]).collect()
    n = len(xs)
    sa, sb = sum(xs), sum(ys)
    saa = sum(v * v for v in xs)
    sbb = sum(v * v for v in ys)
    sab = sum(a * b for a, b in zip(xs, ys))
    want = (n * sab - sa * sb) / (
        math.sqrt(n * saa - sa * sa) * math.sqrt(n * sbb - sb * sb)
    )
    assert r.corr == pytest.approx(want, rel=1e-12)
    assert r.n == 5


def test_corr_perfect_and_anti(spark):
    from soda_spark_spark.operators.stats import corr_matrix

    df = spark.createDataFrame(
        [(float(i), 2.0 * i + 1, -3.0 * i) for i in range(10)],
        "a double, b double, c double",
    )
    got = {(r.col_a, r.col_b): r.corr for r in corr_matrix(
        df, ["a", "b", "c"]
    ).collect()}
    assert got[("a", "b")] == pytest.approx(1.0)
    assert got[("a", "c")] == pytest.approx(-1.0)
    assert got[("b", "c")] == pytest.approx(-1.0)


def test_corr_pairwise_deletion_and_degenerate(spark):
    from soda_spark_spark.operators.stats import corr_matrix

    df = spark.createDataFrame(
        [
            (1.0, 10.0, 7.0),
            (2.0, None, 7.0),   # excluded from (a,b) only
            (3.0, 30.0, 7.0),
            (4.0, 20.0, None),
        ],
        "a double, b double, k double",
    )
    rows = {(r.col_a, r.col_b): r for r in corr_matrix(
        df, ["a", "b", "k"]
    ).collect()}
    assert rows[("a", "b")].n == 3
    assert rows[("a", "k")].n == 3
    # constant column -> zero variance -> NULL, not a crash
    assert rows[("a", "k")].corr is None
    # n < 2 -> NULL
    one = spark.createDataFrame([(1.0, 2.0)], "a double, b double")
    [r] = corr_matrix(one, ["a", "b"]).collect()
    assert r.corr is None and r.n == 1


def test_corr_validates(spark):
    from soda_spark_spark.operators.stats import corr_matrix

    df = spark.createDataFrame([(1.0,)], "a double")
    with pytest.raises(ValueError):
        corr_matrix(df, ["a"])
