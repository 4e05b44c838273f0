"""KMV set-overlap estimation (`cardinality.kmv_overlap`)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from soda_spark_spark.operators.cardinality import kmv_overlap, kmv_sketch


def _df(spark, vals, col="v"):
    return spark.createDataFrame([(x,) for x in vals], f"{col} string")


def test_overlap_exact_when_exhaustive(spark):
    A = {f"a{i}" for i in range(30)} | {f"c{i}" for i in range(10)}
    B = {f"b{i}" for i in range(20)} | {f"c{i}" for i in range(10)}
    sa = kmv_sketch(_df(spark, A), "v", k=128, hash_fn="md5")
    sb = kmv_sketch(_df(spark, B), "v", k=128, hash_fn="md5")
    [r] = kmv_overlap(sa, sb, k=128, hash_fn="md5").collect()
    assert r.k_used == len(A | B)
    assert r.rho == len(A & B)
    assert r.union_est == len(A | B)
    assert r.inter_est == len(A & B)
    assert r.jaccard_ppm == 10**6 * len(A & B) // len(A | B)


def test_overlap_estimator_matches_reference(spark):
    """Past the exact cliff: replay the combined-sketch estimator
    independently in Python (md5 channel)."""
    A = {f"x{i}" for i in range(400)}
    B = {f"x{i}" for i in range(200, 600)}
    k = 64

    def h(x):
        return int(hashlib.md5(x.encode()).hexdigest()[:15], 16)

    ha, hb = sorted(map(h, A))[:k], sorted(map(h, B))[:k]
    merged = sorted(set(ha) | set(hb))[:k]
    rho = sum(1 for x in merged if x in set(ha) and x in set(hb))
    kth = max(merged)
    import math
    union_est = math.floor((k - 1) * float(16 ** 15) / float(kth))
    sa = kmv_sketch(_df(spark, A), "v", k=k, hash_fn="md5")
    sb = kmv_sketch(_df(spark, B), "v", k=k, hash_fn="md5")
    [r] = kmv_overlap(sa, sb, k=k, hash_fn="md5").collect()
    assert (r.k_used, r.rho) == (k, rho)
    assert r.union_est == union_est
    assert r.inter_est == rho * union_est // k
    # sanity: estimates land near truth
    assert abs(r.union_est - len(A | B)) / len(A | B) < 0.4
    assert abs(r.inter_est - len(A & B)) / len(A & B) < 0.5


def test_overlap_grouped_and_one_sided(spark):
    rows_a = [("g1", f"a{i}") for i in range(10)] + [("only_a", "z")]
    rows_b = [("g1", f"a{i}") for i in range(5, 15)]
    a = spark.createDataFrame(rows_a, "g string, v string")
    b = spark.createDataFrame(rows_b, "g string, v string")
    sa = kmv_sketch(a, "v", k=64, group_by=["g"], hash_fn="md5")
    sb = kmv_sketch(b, "v", k=64, group_by=["g"], hash_fn="md5")
    rows = {r.g: r for r in kmv_overlap(
        sa, sb, k=64, group_by=["g"], hash_fn="md5"
    ).collect()}
    assert rows["g1"].rho == 5 and rows["g1"].union_est == 15
    assert rows["g1"].inter_est == 5
    assert rows["only_a"].rho == 0 and rows["only_a"].inter_est == 0


def test_overlap_validates(spark):
    df = _df(spark, {"a"})
    s = kmv_sketch(df, "v", k=8, hash_fn="md5")
    with pytest.raises(ValueError):
        kmv_overlap(s, s, k=1)
    with pytest.raises(ValueError, match="unknown hash_fn"):
        kmv_overlap(s, s, k=8, hash_fn="sha1")
