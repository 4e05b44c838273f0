"""Bit-exactness of the numpy XXH64 port against Spark's F.xxhash64.

The winnowing Arrow kernel's value-parity contract rests on this: the
Python-side hash of every gram must equal the Catalyst expression
`F.xxhash64(gram, F.lit(seed))` for arbitrary UTF-8 content and both the
IntegerType and LongType literal-seed paths.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from soda_spark_spark.functions.xxhash import spark_xxhash64_strings, xxh64_bytes


def _random_strings(n: int, rng: random.Random) -> list[str]:
    alphabet = (
        "abcdefghijklmnopqrstuvwxyz0123456789 \t|éü日本語語🙂"
    )
    return [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 120)))
        for _ in range(n)
    ]


def test_spark_xxhash64_parity(spark):
    rng = random.Random(1234)
    # all byte-length branch boundaries: 0, <4, <8, 8..31, 32+, multi-stripe
    strs = ["", "a", "abc", "abcd", "abcdefg", "x" * 8, "y" * 31, "z" * 32,
            "w" * 33, "v" * 64, "u" * 100] + _random_strings(200, rng)
    df = spark.createDataFrame([(s,) for s in strs], "t string")
    for seed in (42, 0, -1, 987654321, 1 << 33):
        want = [r[0] for r in df.select(F.xxhash64("t", F.lit(seed))).collect()]
        got = spark_xxhash64_strings(strs, seed).tolist()
        assert got == want, f"seed={seed}"


def test_spark_xxhash64_single_arg_parity(spark):
    """xxh64_bytes with Spark's fixed function seed 42 == F.xxhash64(col)."""
    strs = ["", "hello", "hello world " * 10]
    df = spark.createDataFrame([(s,) for s in strs], "t string")
    want = [r[0] for r in df.select(F.xxhash64("t")).collect()]
    got = (
        xxh64_bytes([s.encode() for s in strs], 42)
        .view("int64")
        .tolist()
    )
    assert got == want
