"""Greedy k-center diversity selection (`similarity.diversity_select`)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _vecs(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>",
    )


def test_kcenter_euclidean_picks_farthest(spark):
    from soda_spark_spark.operators.similarity import diversity_select

    # three tight clusters on a line: {0}, {10}, {20} — greedy from the
    # min id must visit one point per cluster before any second member
    df = _vecs(spark, [
        (1, [0.0, 0.0]), (2, [0.1, 0.0]),
        (3, [10.0, 0.0]), (4, [10.1, 0.0]),
        (5, [20.0, 0.0]), (6, [20.1, 0.0]),
    ])
    out = {r.center_rank: r for r in diversity_select(
        df, k=3, metric="euclidean2"
    ).collect()}
    assert out[1].vec_id == 1 and out[1].radius is None
    assert out[2].vec_id == 6  # farthest from the seed (20.1 > 20.0)
    # round 3: one pick from the middle cluster; id 4 edges out id 3
    # because IEEE (20.1 - 10.1)**2 = 100.0000000000000355 > 100.0
    assert out[3].vec_id == 4
    assert out[3].radius == pytest.approx(100.0)


def test_kcenter_deterministic_tiebreak(spark):
    from soda_spark_spark.operators.similarity import diversity_select

    # two candidates exactly equidistant -> min id wins
    df = _vecs(spark, [
        (1, [0.0, 0.0]), (7, [5.0, 0.0]), (9, [-5.0, 0.0]),
    ])
    out = {r.center_rank: r.vec_id for r in diversity_select(
        df, k=2, metric="euclidean2"
    ).collect()}
    assert out == {1: 1, 2: 7}


def test_kcenter_radius_non_increasing(spark):
    from soda_spark_spark.operators.similarity import diversity_select

    df = _vecs(spark, [
        (i, [math.cos(i * 0.61), math.sin(i * 0.61), float(i % 3)])
        for i in range(25)
    ])
    rows = sorted(
        diversity_select(df, k=6, metric="euclidean2").collect(),
        key=lambda r: r.center_rank,
    )
    assert len(rows) == 6
    radii = [r.radius for r in rows[1:]]
    assert all(a >= b for a, b in zip(radii, radii[1:]))


def test_kcenter_duplicates_stop_early(spark):
    from soda_spark_spark.operators.similarity import diversity_select

    df = _vecs(spark, [(i, [1.0, 2.0]) for i in range(5)])
    rows = diversity_select(df, k=4, metric="euclidean2").collect()
    assert len(rows) == 1  # everything else is distance 0


def test_kcenter_cosine_excludes_zero_norm(spark):
    from soda_spark_spark.operators.similarity import diversity_select

    df = _vecs(spark, [
        (1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.0, 1.0]),
    ])
    rows = diversity_select(df, k=3, metric="cosine").collect()
    assert sorted(r.vec_id for r in rows) == [1, 3]


def test_kcenter_seed_and_validation(spark):
    from soda_spark_spark.operators.similarity import diversity_select

    df = _vecs(spark, [(1, [0.0]), (2, [1.0]), (3, [9.0])])
    out = {r.center_rank: r.vec_id for r in diversity_select(
        df, k=2, metric="euclidean2", seed_id=3
    ).collect()}
    assert out == {1: 3, 2: 1}
    with pytest.raises(ValueError):
        diversity_select(df, k=0)
    with pytest.raises(ValueError):
        diversity_select(df, k=2, metric="manhattan")
    with pytest.raises(ValueError, match="not in the corpus"):
        diversity_select(df, k=2, seed_id=99)
