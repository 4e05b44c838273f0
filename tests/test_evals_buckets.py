"""Eval analytics (`operators/evals.py`) and padding accounting
(`packing.length_buckets`): canonicalization, ties-count-half rates,
invalid-outcome accounting, Bradley-Terry fixed-point properties,
and the exact power-of-two roundup."""

from __future__ import annotations

import pytest

from soda_spark_spark.operators.evals import bradley_terry, pairwise_win_rates
from soda_spark_spark.operators.packing import length_buckets


@pytest.fixture(scope="module")
def judgments(spark):
    return spark.createDataFrame(
        [
            ("m1", "m2", "a"), ("m1", "m2", "a"), ("m2", "m1", "a"),
            ("m1", "m2", "tie"),
            ("m2", "m3", "b"), ("m3", "m2", "b"),
            ("m1", "m3", "a"), ("m1", "m3", "junk"),
        ],
        "ma string, mb string, o string",
    )


def test_pairwise_canonicalization_and_rates(judgments):
    got = {(r.model_lo, r.model_hi): r for r in pairwise_win_rates(
        judgments, "ma", "mb", "o").collect()}
    r12 = got[("m1", "m2")]
    # (m2,m1,'a') flips to a win for the HI side of (m1,m2)
    assert (r12.games, r12.wins_lo, r12.wins_hi, r12.ties) == (4, 2, 1, 1)
    assert r12.win_rate_lo == 0.625 and r12.win_rate_hi == 0.375
    r23 = got[("m2", "m3")]
    # 'b' from both orientations: one win each
    assert (r23.wins_lo, r23.wins_hi) == (1, 1)
    assert r23.win_rate_lo == 0.5
    r13 = got[("m1", "m3")]
    # invalid outcomes are counted, and excluded from the denominator
    assert r13.n_invalid == 1 and r13.games == 2
    assert r13.win_rate_lo == 1.0


def test_pairwise_all_invalid_gives_null_rates(spark):
    df = spark.createDataFrame(
        [("a", "b", "nope")], "ma string, mb string, o string"
    )
    r = pairwise_win_rates(df, "ma", "mb", "o").collect()[0]
    assert r.n_invalid == 1 and r.win_rate_lo is None


def test_bradley_terry_orders_by_strength(judgments):
    got = bradley_terry(judgments, "ma", "mb", "o", iterations=100).collect()
    by_rank = [r.model for r in sorted(got, key=lambda r: r.rank)]
    assert by_rank == ["m1", "m2", "m3"]
    strengths = {r.model: r.strength for r in got}
    assert strengths["m1"] > strengths["m2"] > strengths["m3"]
    # geometric-mean gauge: product of strengths ~= 1
    prod = strengths["m1"] * strengths["m2"] * strengths["m3"]
    assert abs(prod - 1.0) < 1e-9


def test_bradley_terry_symmetric_data_is_uniform(spark):
    df = spark.createDataFrame(
        [("a", "b", "a"), ("a", "b", "b")],
        "ma string, mb string, o string",
    )
    got = {r.model: r.strength for r in bradley_terry(
        df, "ma", "mb", "o").collect()}
    assert abs(got["a"] - 1.0) < 1e-9 and abs(got["b"] - 1.0) < 1e-9


def test_bradley_terry_deterministic(judgments):
    a = bradley_terry(judgments, "ma", "mb", "o").collect()
    b = bradley_terry(judgments, "ma", "mb", "o").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ------------------------------------------------------------ buckets


def test_length_buckets_roundup_and_waste(spark):
    df = spark.createDataFrame(
        [(i,) for i in [1, 5, 16, 17, 31, 32, 33, 100, 1024, None, 0]],
        "t long",
    )
    got = {r.bucket: r for r in length_buckets(df, "t").collect()}
    assert got[16].n_docs == 3 and got[16].total_padding == 26
    assert got[16].padding_ppm == 26 * 1_000_000 // (16 * 3)
    assert got[32].n_docs == 3 and got[32].total_padding == 16
    assert got[64].n_docs == 1 and got[64].total_tokens == 33
    assert got[1024].total_padding == 0 and got[1024].padding_ppm == 0
    # NULL and non-positive counts land in bucket NULL, never vanish
    assert got[None].n_docs == 2


@pytest.mark.parametrize("t,expected", [
    (1, 16), (15, 16), (16, 16), (17, 32), (2048, 2048), (2049, 4096),
    ((1 << 40) + 1, 1 << 41),
])
def test_length_buckets_exact_powers(spark, t, expected):
    df = spark.createDataFrame([(t,)], "t long")
    assert length_buckets(df, "t").collect()[0].bucket == expected


def test_length_buckets_min_bucket(spark):
    df = spark.createDataFrame([(3,)], "t long")
    assert length_buckets(df, "t", min_bucket=1).collect()[0].bucket == 4


# ----------------------------------------------------- judge agreement


def test_judge_agreement_cohen_kappa(spark):
    from soda_spark_spark.operators.evals import judge_agreement

    labels = {1: ("good", "good", "good"), 2: ("bad", "bad", "good"),
              3: ("good", "bad", "good"), 4: ("bad", "bad", "good")}
    rows = []
    for item, (l1, l2, l3) in labels.items():
        rows += [(item, "j1", l1), (item, "j2", l2), (item, "j3", l3)]
    df = spark.createDataFrame(rows, "item long, judge string, label string")
    got = {(r.judge_lo, r.judge_hi): r
           for r in judge_agreement(df, "item", "judge", "label").collect()}
    # hand-computed: agree=3, n=4, marginals j1 {good:2,bad:2},
    # j2 {good:1,bad:3} -> S=8 -> kappa=(12-8)/(16-8)=0.5
    assert got[("j1", "j2")].agreement == 0.75
    assert got[("j1", "j2")].kappa == 0.5
    # a constant judge earns kappa 0 against anyone (chance explains
    # all observed agreement with a degenerate marginal)
    assert got[("j1", "j3")].kappa == 0.0


def test_judge_agreement_undefined_kappa_is_null(spark):
    from soda_spark_spark.operators.evals import judge_agreement

    df = spark.createDataFrame(
        [(1, "a", "x"), (1, "b", "x"), (2, "a", "x"), (2, "b", "x")],
        "item long, judge string, label string",
    )
    r = judge_agreement(df, "item", "judge", "label").collect()[0]
    assert r.agreement == 1.0 and r.kappa is None


def test_judge_agreement_dedupes_double_labels(spark):
    from soda_spark_spark.operators.evals import judge_agreement

    df = spark.createDataFrame(
        [(1, "a", "y"), (1, "a", "x"), (1, "b", "x")],
        "item long, judge string, label string",
    )
    r = judge_agreement(df, "item", "judge", "label").collect()[0]
    # judge a's double label reduces to min('x','y') = 'x' -> agree
    assert r.n_items == 1 and r.n_agree == 1


def test_preference_pairs_null_scores_never_win(spark):
    from soda_spark_spark.operators.chat import preference_pairs_from_scores

    cand = spark.createDataFrame(
        [(1, "good", 0.9), (1, "unscored", None), (1, "bad", 0.25),
         (2, "x", None), (2, "y", None)],       # all unscored
        "pid long, response string, score double",
    )
    got = {r.pid: r for r in preference_pairs_from_scores(
        cand, "pid", "response", "score", min_margin=0.5).collect()}
    # the null-score candidate must not win the min() side
    assert got[1].rejected == "bad" and got[1].chosen == "good"
    assert got[1].n_candidates == 3 and got[1].n_scored == 2
    assert got[1].keep
    # an all-unscored group survives as an honest keep=false row
    assert got[2].chosen is None and got[2].keep is False
    assert got[2].n_scored == 0


def test_judge_agreement_null_labels_excluded(spark):
    from soda_spark_spark.operators.evals import judge_agreement

    df = spark.createDataFrame(
        [(1, "a", "x"), (1, "b", "x"),
         (2, "a", None), (2, "b", "x")],  # item 2: a abstained
        "item long, judge string, label string",
    )
    r = judge_agreement(df, "item", "judge", "label").collect()[0]
    assert r.n_items == 1 and r.n_agree == 1  # only co-LABELED items


def _wilson(p, n, sign, z=1.96, zz=3.8416):
    """Replay win_rate_intervals' FIXED IEEE operation order (the
    module builds z*z by decimal multiply, so 3.8416 converts to the
    same nearest double both engines use)."""
    import math

    return (
        p + zz / (2.0 * n)
        + sign * (z * math.sqrt(p * (1.0 - p) / n + zz / (4.0 * n * n)))
    ) / (1.0 + zz / n)


def test_win_rate_intervals_closed_form(judgments):
    from soda_spark_spark.operators.evals import win_rate_intervals

    got = {(r.model_lo, r.model_hi): r for r in win_rate_intervals(
        judgments, "ma", "mb", "o").collect()}
    r12 = got[("m1", "m2")]                       # 4 scored, p_lo=.625
    assert r12.ci_lo_lower == _wilson(0.625, 4.0, -1)
    assert r12.ci_lo_upper == _wilson(0.625, 4.0, +1)
    assert r12.ci_hi_lower == _wilson(0.375, 4.0, -1)
    # Wilson never leaves [0, 1] and brackets the point estimate
    for r in got.values():
        if r.ci_lo_lower is None:
            continue
        assert 0.0 <= r.ci_lo_lower <= r.win_rate_lo
        assert r.win_rate_lo <= r.ci_lo_upper <= 1.0
    # p=1.0 with n=1 (m1 vs m3, the junk row excluded): upper == 1 - eps
    r13 = got[("m1", "m3")]
    assert r13.win_rate_lo == 1.0 and r13.ci_lo_upper <= 1.0


def test_win_rate_intervals_null_when_unscored(spark):
    from soda_spark_spark.operators.evals import win_rate_intervals

    df = spark.createDataFrame(
        [("a", "b", "nope")], "ma string, mb string, o string"
    )
    r = win_rate_intervals(df, "ma", "mb", "o").collect()[0]
    assert r.ci_lo_lower is None and r.ci_hi_upper is None


def test_win_rate_intervals_small_n_stays_sane(spark):
    """n=1 loss: the normal approximation would give [0, 0]; Wilson
    gives a wide honest interval."""
    from soda_spark_spark.operators.evals import win_rate_intervals

    df = spark.createDataFrame(
        [("a", "b", "b")], "ma string, mb string, o string"
    )
    r = win_rate_intervals(df, "ma", "mb", "o").collect()[0]
    assert r.win_rate_lo == 0.0
    assert r.ci_lo_lower == _wilson(0.0, 1.0, -1) >= 0.0
    assert r.ci_lo_upper == _wilson(0.0, 1.0, +1) > 0.5
