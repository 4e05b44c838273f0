"""KMV cardinality sketches (build / merge / estimate, both hash
channels) and the range-bucket interval join."""

import random

import pytest
from pyspark.sql import functions as F

from soda_spark_spark.operators.cardinality import (
    kmv_estimate,
    kmv_merge,
    kmv_sketch,
)
from soda_spark_spark.operators.joins import interval_join


# ---------------------------------------------------------------- KMV


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame(
        [(i % 37,) for i in range(500)], "v long"
    )
    for hash_fn in ("md5", "xxhash64"):
        sk = kmv_sketch(df, "v", k=64, hash_fn=hash_fn)
        est = kmv_estimate(sk, k=64, hash_fn=hash_fn).first()
        assert est.n_sketch == 37
        assert est.distinct_est == 37  # exhaustive sketch -> exact


def test_kmv_estimate_accuracy(spark):
    n_true = 20_000
    df = spark.range(n_true).select((F.col("id") * 7).alias("v"))
    for hash_fn in ("md5", "xxhash64"):
        sk = kmv_sketch(df, "v", k=256, hash_fn=hash_fn)
        est = kmv_estimate(sk, k=256, hash_fn=hash_fn).first()
        assert est.n_sketch == 256
        assert abs(est.distinct_est - n_true) / n_true < 0.2, (
            hash_fn, est.distinct_est)


def test_kmv_merge_equals_union_sketch(spark):
    a = spark.range(3_000).select(F.col("id").alias("v"))
    b = spark.range(2_000, 6_000).select(F.col("id").alias("v"))
    sa = kmv_sketch(a, "v", k=128)
    sb = kmv_sketch(b, "v", k=128)
    merged = sorted(map(tuple, kmv_merge(sa, sb, k=128).collect()))
    direct = sorted(map(tuple, kmv_sketch(
        a.unionByName(b), "v", k=128).collect()))
    assert merged == direct


def test_kmv_grouped_and_bucket_invariance(spark):
    rng = random.Random(5)
    rows = [(rng.choice("abc"), rng.randrange(1000)) for _ in range(4000)]
    df = spark.createDataFrame(rows, "g string, v long")
    s1 = sorted(map(tuple, kmv_sketch(
        df, "v", k=32, group_by=["g"], n_buckets=1).collect()))
    s64 = sorted(map(tuple, kmv_sketch(
        df, "v", k=32, group_by=["g"], n_buckets=64).collect()))
    assert s1 == s64  # n_buckets is a plan knob, not a semantics knob
    est = {r.g: r for r in kmv_estimate(
        kmv_sketch(df, "v", k=1024, group_by=["g"]),
        k=1024, group_by=["g"]).collect()}
    truth = {g: len({v for gg, v in rows if gg == g}) for g in "abc"}
    for g in "abc":
        assert est[g].n_sketch == truth[g] < 1024
        assert est[g].distinct_est == truth[g]  # < k -> exact per group


def test_kmv_validation(spark):
    df = spark.range(5).select(F.col("id").alias("v"))
    with pytest.raises(ValueError, match="k must be"):
        kmv_sketch(df, "v", k=1)
    with pytest.raises(ValueError, match="hash_fn"):
        kmv_sketch(df, "v", hash_fn="sha9000")


# ------------------------------------------------------- interval_join


def _brute(points, intervals, keys=()):
    out = []
    for p in points:
        for iv in intervals:
            if all(p[k] == iv[k] for k in keys) and \
                    iv["s"] <= p["t"] <= iv["e"]:
                out.append((p["pid"], iv["iid"]))
    return sorted(out)


def test_interval_join_matches_bruteforce(spark):
    rng = random.Random(11)
    pts = [{"pid": i, "t": rng.randrange(0, 1000)} for i in range(300)]
    ivs = []
    for i in range(60):
        s = rng.randrange(0, 1000)
        ivs.append({"iid": i, "s": s, "e": s + rng.randrange(0, 80)})
    pdf = spark.createDataFrame([(p["pid"], p["t"]) for p in pts],
                                "pid long, t long")
    idf = spark.createDataFrame([(v["iid"], v["s"], v["e"]) for v in ivs],
                                "iid long, s long, e long")
    want = _brute(pts, ivs)
    for width in (1, 7, 100):
        got = sorted(
            (r.pid, r.iid)
            for r in interval_join(
                pdf, idf, point_col="t", start_col="s", end_col="e",
                bucket_width=width).collect()
        )
        assert got == want, width


def test_interval_join_keys_left_and_bounds(spark):
    pdf = spark.createDataFrame(
        [(1, "u", 10), (2, "u", 20), (3, "v", 10), (4, "u", 31)],
        "pid long, k string, t long")
    idf = spark.createDataFrame(
        [(100, "u", 10, 20), (200, "v", 0, 9)],
        "iid long, k string, s long, e long")
    inner = sorted(
        (r.pid, r.iid)
        for r in interval_join(
            pdf, idf, point_col="t", start_col="s", end_col="e",
            bucket_width=8, on="k").collect()
    )
    # inclusive both ends; key match required; t=31 and v@10 unmatched
    assert inner == [(1, 100), (2, 100)]
    left = sorted(
        (r.pid, r.iid)
        for r in interval_join(
            pdf, idf, point_col="t", start_col="s", end_col="e",
            bucket_width=8, on="k", how="left").collect()
    )
    assert left == [(1, 100), (2, 100), (3, None), (4, None)]


def test_interval_join_empty_interval_and_guard(spark):
    pdf = spark.createDataFrame([(1, 5)], "pid long, t long")
    idf = spark.createDataFrame([(9, 10, 2)], "iid long, s long, e long")
    assert interval_join(
        pdf, idf, point_col="t", start_col="s", end_col="e", bucket_width=4
    ).count() == 0  # start > end matches nothing (no descending explode)
    big = spark.createDataFrame([(9, 0, 10_000_000)],
                                "iid long, s long, e long")
    with pytest.raises(Exception, match="max_buckets_per_interval"):
        interval_join(
            pdf, big, point_col="t", start_col="s", end_col="e",
            bucket_width=1, max_buckets_per_interval=100,
        ).count()
    with pytest.raises(ValueError, match="how"):
        interval_join(pdf, idf, point_col="t", start_col="s",
                      end_col="e", bucket_width=1, how="outer")


# ------------------------------------------------- streaming KMV


def test_kmv_batch_writer_converges_to_direct_sketch(spark, tmp_path):
    from soda_spark_spark.operators.cardinality import kmv_compact
    from soda_spark_spark.streaming.scan_stream import (
        kmv_sketch_batch_writer,
    )

    a = spark.range(0, 900).select(F.col("id").alias("v"))
    b = spark.range(600, 1500).select(F.col("id").alias("v"))
    c = spark.range(100, 200).select(F.col("id").alias("v"))  # all seen
    path = str(tmp_path / "sketch")
    writer = kmv_sketch_batch_writer(path, "v", k=32, hash_fn="md5")
    writer(a, 0)
    writer(b, 1)
    writer(c, 2)
    writer(c, 3)  # replay of an identical batch appends NOTHING
    stored = spark.read.parquet(path)
    # append-only growth is bounded by batches * k (each batch adds at
    # most its own k rows), and an exact-duplicate batch adds zero
    assert 32 <= stored.count() <= 3 * 32
    got = sorted(map(tuple, kmv_compact(stored, k=32).collect()))
    direct = sorted(map(tuple, kmv_sketch(
        a.unionByName(b).unionByName(c), "v", k=32,
        hash_fn="md5").collect()))
    assert got == direct
