"""Bloom membership sketch (`cardinality.bloom_sketch` / `bloom_query`
/ `bloom_merge`): one-sided contract (no false negatives), md5-channel
parity with an independent Python reference, merge algebra, and the
append-only maintenance idiom."""
from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
import pytest

from soda_spark_spark.operators.cardinality import (
    bloom_merge,
    bloom_query,
    bloom_sketch,
)


def _ref_positions(key: str, m: int, k: int) -> set[int]:
    return {
        int(hashlib.md5(f"{key}:{j}".encode()).hexdigest()[:15], 16) % m
        for j in range(k)
    }


def _keys(spark, names):
    return spark.createDataFrame([(n,) for n in names], "k string")


def test_bloom_no_false_negatives_and_md5_parity(spark):
    present = [f"key_{i}" for i in range(40)]
    sk = bloom_sketch(_keys(spark, present), "k", m_bits=256, k_hashes=3,
                      hash_fn="md5")
    got_pos = {r.pos for r in sk.collect()}
    ref_pos = set().union(*[_ref_positions(k, 256, 3) for k in present])
    assert got_pos == ref_pos  # position math matches hashlib exactly
    probes = bloom_query(sk, _keys(spark, present), "k", m_bits=256,
                         k_hashes=3, hash_fn="md5")
    assert all(r.maybe_present for r in probes.collect())


def test_bloom_false_positive_set_is_deterministic(spark):
    present = [f"key_{i}" for i in range(40)]
    absent = [f"other_{i}" for i in range(60)]
    m, k = 64, 3  # deliberately saturated: some FPs must appear
    sk = bloom_sketch(_keys(spark, present), "k", m_bits=m, k_hashes=k,
                      hash_fn="md5")
    got = {r.k: r.maybe_present for r in bloom_query(
        sk, _keys(spark, absent), "k", m_bits=m, k_hashes=k,
        hash_fn="md5").collect()}
    set_pos = set().union(*[_ref_positions(x, m, k) for x in present])
    expect = {x: _ref_positions(x, m, k) <= set_pos for x in absent}
    assert got == expect  # the EXACT false-positive set, not a rate
    assert any(expect.values()) and not all(expect.values())


def test_bloom_merge_is_sketch_of_union(spark):
    a = [f"a{i}" for i in range(25)]
    b = [f"b{i}" for i in range(25)]
    kw = dict(m_bits=512, k_hashes=4, hash_fn="md5")
    merged = bloom_merge(
        bloom_sketch(_keys(spark, a), "k", **kw),
        bloom_sketch(_keys(spark, b), "k", **kw),
    )
    whole = bloom_sketch(_keys(spark, a + b), "k", **kw)
    assert {r.pos for r in merged.collect()} == {
        r.pos for r in whole.collect()}


def test_bloom_append_only_maintenance(spark, tmp_path):
    """The persisted-artifact idiom: anti-join a new batch's positions
    and append only genuinely-new rows; the file equals the one-shot
    sketch of everything seen."""
    kw = dict(m_bits=512, k_hashes=4, hash_fn="md5")
    path = str(tmp_path / "bloom")
    b1 = [f"u{i}" for i in range(30)]
    b2 = [f"u{i}" for i in range(20, 50)]  # overlaps batch 1
    bloom_sketch(_keys(spark, b1), "k", **kw).write.parquet(path)
    existing = spark.read.parquet(path)
    new = bloom_sketch(_keys(spark, b2), "k", **kw).join(
        existing, "pos", "left_anti")
    new.write.mode("append").parquet(path)
    final = {r.pos for r in spark.read.parquet(path).collect()}
    whole = {r.pos for r in bloom_sketch(
        _keys(spark, sorted(set(b1 + b2))), "k", **kw).collect()}
    assert final == whole


def test_bloom_validates_params(spark):
    with pytest.raises(ValueError):
        bloom_sketch(_keys(spark, ["x"]), "k", m_bits=0)
    with pytest.raises(ValueError):
        bloom_query(_keys(spark, ["x"]).select(F.lit(1).alias("pos")),
                    _keys(spark, ["x"]), "k", k_hashes=0)
