"""exact_quantiles (scale-safe exact order statistics) and the
count-min frequency sketch."""

import collections
import math
import random

import pytest
from pyspark.sql import functions as F

from soda_spark_spark.operators.cardinality import (
    cms_merge,
    cms_query,
    cms_sketch,
)
from soda_spark_spark.operators.stats import exact_quantiles


# ------------------------------------------------------ exact_quantiles


def test_exact_quantiles_matches_sorted(spark):
    rng = random.Random(3)
    vals = [rng.uniform(-50, 50) for _ in range(3000)]
    vals += [7.0] * 500  # heavy tie mass
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    fr = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.999, 1.0]
    got = {r.q: (r.rank, r.value) for r in exact_quantiles(
        df, "x", fr, n_buckets=32, exact_rows=64).collect()}
    s = sorted(vals)
    n = len(s)
    for q in fr:
        rank = max(1, math.ceil(q * n))
        assert got[q] == (rank, s[rank - 1]), q


def test_exact_quantiles_nulls_and_plan(spark):
    df = spark.createDataFrame(
        [(float(i),) for i in range(100)] + [(None,)] * 20, "x double")
    out = exact_quantiles(df, "x", [0.5])
    r = out.first()
    assert r.rank == 50 and r.value == 49.0  # nulls excluded from N
    assert exact_quantiles(
        spark.createDataFrame([], "x double"), "x", [0.5]).count() == 0
    with pytest.raises(ValueError, match="fraction"):
        exact_quantiles(df, "x", [1.5])
    with pytest.raises(ValueError, match="non-empty"):
        exact_quantiles(df, "x", [])


def test_exact_quantiles_matches_spark_percentile(spark):
    """Against Spark's own exact percentile on tie-free data (where the
    lower-order-statistic and interpolating definitions coincide at
    exact rank hits)."""
    df = spark.range(1, 1001).select(F.col("id").cast("double").alias("x"))
    got = {r.q: r.value for r in exact_quantiles(
        df, "x", [0.25, 0.5, 1.0]).collect()}
    # rank = ceil(q*1000): 250, 500, 1000 -> values 250, 500, 1000
    assert got == {0.25: 250.0, 0.5: 500.0, 1.0: 1000.0}


# ------------------------------------------------------------- CMS


@pytest.fixture(scope="module")
def stream(spark):
    rng = random.Random(9)
    # Zipf-ish: a few heavy keys + a long tail
    keys = (["hot-a"] * 500 + ["hot-b"] * 300 + ["warm"] * 60
            + [f"tail-{i}" for i in range(2000)])
    rng.shuffle(keys)
    return keys, spark.createDataFrame([(k,) for k in keys], "k string")


def test_cms_one_sided_and_bounded(spark, stream):
    keys, df = stream
    truth = collections.Counter(keys)
    for hash_fn in ("md5", "xxhash64"):
        sk = cms_sketch(df, "k", depth=4, width=1024, hash_fn=hash_fn)
        cand = spark.createDataFrame(
            [(k,) for k in ["hot-a", "hot-b", "warm", "tail-7", "absent"]],
            "k string")
        est = {r.k: r.freq_est for r in cms_query(
            sk, cand, "k", depth=4, width=1024, hash_fn=hash_fn).collect()}
        n = len(keys)
        for k, e in est.items():
            t = truth.get(k, 0)
            assert e >= t  # one-sided: never undercounts
            assert e <= t + (2 * n) // 1024 + 8, k  # CM bound (loose)
        assert est["hot-a"] >= 500 and est["hot-b"] >= 300


def test_cms_merge_equals_combined_stream(spark, stream):
    keys, df = stream
    half = len(keys) // 2
    a = spark.createDataFrame([(k,) for k in keys[:half]], "k string")
    b = spark.createDataFrame([(k,) for k in keys[half:]], "k string")
    merged = sorted(map(tuple, cms_merge(
        cms_sketch(a, "k", hash_fn="md5"),
        cms_sketch(b, "k", hash_fn="md5")).collect()))
    direct = sorted(map(tuple, cms_sketch(df, "k", hash_fn="md5").collect()))
    assert merged == direct


def test_cms_validation(spark, stream):
    _, df = stream
    with pytest.raises(ValueError, match="depth"):
        cms_sketch(df, "k", depth=0)
    with pytest.raises(ValueError, match="hash_fn"):
        cms_sketch(df, "k", hash_fn="crc")
