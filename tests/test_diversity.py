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


# ---------------------------------------------------------------------------
# diversity_select_grouped
# ---------------------------------------------------------------------------


def _gvecs(spark, rows):
    return spark.createDataFrame(
        [(g, i, [int(x) for x in v]) for g, i, v in rows],
        "grp string, vec_id long, qvec array<long>",
    )


def test_grouped_matches_single_group_operator(spark):
    """Per-group result must equal diversity_select run on that group
    alone (euclidean2, integer channel)."""
    from soda_spark_spark.operators.similarity import (
        diversity_select, diversity_select_grouped,
    )

    rows = [("a", i, [(i * 7) % 23, (i * 13) % 17]) for i in range(12)]
    rows += [("b", i, [(i * 5) % 19, (i * 11) % 29]) for i in range(20, 29)]
    df = _gvecs(spark, rows)
    got = {
        (r.grp, r.center_rank): (r.vec_id, r.radius)
        for r in diversity_select_grouped(df, "grp", k=4).collect()
    }
    for g in ("a", "b"):
        solo = diversity_select(
            df.filter(F.col("grp") == g).select("vec_id", "qvec"),
            "vec_id", "qvec", k=4, metric="euclidean2",
        ).collect()
        for r in solo:
            want_id, want_rad = got[(g, r.center_rank)]
            assert want_id == r.vec_id
            if r.radius is None:
                assert want_rad is None
            else:
                assert want_rad == r.radius


def test_grouped_duplicates_stop_early_per_group(spark):
    from soda_spark_spark.operators.similarity import diversity_select_grouped

    rows = [("dup", i, [5, 5]) for i in range(4)]
    rows += [("ok", 10, [0, 0]), ("ok", 11, [9, 0])]
    out = diversity_select_grouped(_gvecs(spark, rows), "grp", k=3).collect()
    per = {}
    for r in out:
        per.setdefault(r.grp, []).append(r)
    assert len(per["dup"]) == 1 and per["dup"][0].vec_id == 0
    assert len(per["ok"]) == 2
    assert {r.vec_id for r in per["ok"]} == {10, 11}


def test_grouped_nulls_excluded_and_validation(spark):
    from soda_spark_spark.operators.similarity import diversity_select_grouped

    df = spark.createDataFrame(
        [("a", 1, [1, 2]), ("a", 2, None), (None, 3, [0, 0])],
        "grp string, vec_id long, qvec array<long>",
    )
    out = diversity_select_grouped(df, "grp", k=2).collect()
    assert [(r.grp, r.vec_id) for r in out] == [("a", 1)]
    with pytest.raises(ValueError):
        diversity_select_grouped(df, "grp", k=0)
