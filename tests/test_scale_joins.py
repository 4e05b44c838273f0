"""Scale-join levers: salted joins for skew, bucketed shuffle-free joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from soda_spark_spark.operators.joins import salted_join
from soda_spark_spark.sources.bucketing import read_table, write_bucketed


@pytest.fixture()
def skewed(spark):
    # hot key 0 dominates
    left = spark.createDataFrame(
        [(0, i) for i in range(500)] + [(k, k) for k in range(1, 50)],
        "k long, lv long",
    )
    right = spark.createDataFrame([(k, f"d{k}") for k in range(50)], "k long, rv string")
    return left, right


def test_salted_join_matches_plain_inner(spark, skewed):
    left, right = skewed
    plain = {(r.k, r.lv, r.rv) for r in left.join(right, "k").collect()}
    salted = {(r.k, r.lv, r.rv) for r in salted_join(left, right, "k", salt=8).collect()}
    assert salted == plain and len(plain) == 549


def test_salted_join_left_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, 10), (99, 20)], "k long, lv long")
    right = spark.createDataFrame([(1, "a")], "k long, rv string")
    out = {(r.k, r.rv) for r in salted_join(left, right, "k", how="left").collect()}
    assert out == {(1, "a"), (99, None)}


def test_salted_join_rejects_right_outer(spark, skewed):
    left, right = skewed
    with pytest.raises(ValueError):
        salted_join(left, right, "k", how="full")


def test_salted_join_spreads_hot_key(spark, skewed):
    left, right = skewed
    # the salted left side of the hot key lands in multiple shards
    shard = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(8))
    n_shards = (
        left.filter(F.col("k") == 0)
        .select(shard.alias("s"))
        .distinct()
        .count()
    )
    assert n_shards > 1


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    # managed tables land in the session's default warehouse dir; dropped in
    # the finally block (warehouse.dir is a static conf, not settable here)
    a = spark.createDataFrame([(i, i * 2) for i in range(100)], "k long, a long")
    b = spark.createDataFrame([(i, i * 3) for i in range(100)], "k long, b long")
    write_bucketed(a, "bkt_a", bucket_by="k", num_buckets=4, sort_by="k")
    write_bucketed(b, "bkt_b", bucket_by="k", num_buckets=4, sort_by="k")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = read_table(spark, "bkt_a").join(read_table(spark, "bkt_b"), "k")
        assert joined.count() == 100
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # bucketed co-located join: no shuffle above the scans
        assert "Exchange" not in plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")
