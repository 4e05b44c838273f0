"""Property tests for the round-10 operators: exact order statistics,
KMV merge algebra, count-min one-sidedness, and interval-join
equivalence to the naive BETWEEN semantics — each against a
straightforward Python reference on arbitrary inputs (hypothesis-
driven, batched: one Spark pipeline per example)."""

from __future__ import annotations

import collections
import math

import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)


vals_strategy = st.lists(
    st.one_of(
        st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
        st.sampled_from([0.0, 1.0, -1.0, 42.0, 42.0, 1e-12]),
    ),
    min_size=1,
    max_size=80,
)


@settings(max_examples=8, deadline=None)
@given(vals_strategy, st.integers(1, 1000), st.integers(2, 9))
def test_order_statistic_property(spark, vals, rank_seed, n_buckets):
    from soda_spark_spark.operators.stats import _order_statistic

    rank = 1 + rank_seed % len(vals)
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = _order_statistic(
        df, "x", rank, min(vals), max(vals),
        n_buckets=n_buckets, exact_rows=4,
    )
    assert got == sorted(vals)[rank - 1]


keys_strategy = st.lists(
    st.integers(0, 30), min_size=0, max_size=60)


@settings(max_examples=6, deadline=None)
@given(keys_strategy, keys_strategy, st.integers(2, 12))
def test_kmv_merge_associative_with_union(spark, ka, kb, k):
    """merge(sketch(A), sketch(B)) == sketch(A ++ B) for any streams,
    any k — the algebra that makes snapshot accumulation sound."""
    from soda_spark_spark.operators.cardinality import kmv_merge, kmv_sketch

    a = spark.createDataFrame([(v,) for v in ka] or [(None,)], "v long")
    b = spark.createDataFrame([(v,) for v in kb] or [(None,)], "v long")
    u = a.unionByName(b)
    merged = sorted(map(tuple, kmv_merge(
        kmv_sketch(a, "v", k=k, hash_fn="md5"),
        kmv_sketch(b, "v", k=k, hash_fn="md5"), k=k).collect()))
    direct = sorted(map(tuple, kmv_sketch(
        u, "v", k=k, hash_fn="md5").collect()))
    assert merged == direct


@settings(max_examples=6, deadline=None)
@given(keys_strategy, st.integers(1, 3), st.integers(8, 64))
def test_cms_never_undercounts(spark, keys, depth, width):
    from soda_spark_spark.operators.cardinality import cms_query, cms_sketch

    if not keys:
        return
    df = spark.createDataFrame([(str(v),) for v in keys], "k string")
    sk = cms_sketch(df, "k", depth=depth, width=width, hash_fn="md5")
    cand = spark.createDataFrame(
        [(str(v),) for v in set(keys)], "k string")
    est = {r.k: r.freq_est for r in cms_query(
        sk, cand, "k", depth=depth, width=width, hash_fn="md5").collect()}
    truth = collections.Counter(str(v) for v in keys)
    for k_, t in truth.items():
        assert est[k_] >= t
        assert est[k_] <= len(keys)  # cannot exceed the stream length


interval_strategy = st.lists(
    st.tuples(st.integers(-50, 50), st.integers(0, 40)),
    min_size=0, max_size=25)
points_strategy = st.lists(st.integers(-60, 60), min_size=0, max_size=40)


@settings(max_examples=8, deadline=None)
@given(points_strategy, interval_strategy, st.integers(1, 30))
def test_interval_join_property(spark, pts, ivs, width):
    from soda_spark_spark.operators.joins import interval_join

    pdf = spark.createDataFrame(
        list(enumerate(pts)) or [(0, None)], "pid long, t long")
    idf = spark.createDataFrame(
        [(i, s, s + ln) for i, (s, ln) in enumerate(ivs)] or [(0, 1, 0)],
        "iid long, s long, e long")
    got = sorted(
        (r.pid, r.iid)
        for r in interval_join(
            pdf, idf, point_col="t", start_col="s", end_col="e",
            bucket_width=width).collect()
    )
    want = sorted(
        (pi, ii)
        for pi, t in enumerate(pts)
        for ii, (s, ln) in enumerate(ivs)
        if s <= t <= s + ln
    )
    assert got == want


@settings(max_examples=6, deadline=None)
@given(vals_strategy, st.lists(st.floats(0, 1, allow_nan=False),
                               min_size=1, max_size=4))
def test_exact_quantiles_property(spark, vals, fracs):
    from soda_spark_spark.operators.stats import exact_quantiles

    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {r.q: (r.rank, r.value) for r in exact_quantiles(
        df, "x", list(set(fracs)), n_buckets=8, exact_rows=4).collect()}
    s = sorted(vals)
    for q in set(fracs):
        rank = max(1, math.ceil(q * len(s)))
        assert got[q] == (rank, s[rank - 1]), q
