"""MinHash fidelity instrument (`dedup.minhash_fidelity`)."""

from __future__ import annotations

import hashlib

import pytest


def _sig_component(i: int, grams: set[str]) -> int:
    return min(
        int(hashlib.md5(f"{i}|{g}".encode()).hexdigest()[:15], 16)
        for g in grams
    )


def _grams(text: str, n: int = 3) -> set[str]:
    w = text.split()
    return {" ".join(w[j:j + n]) for j in range(len(w) - n + 1)}


def test_fidelity_matches_independent_reference(spark):
    from soda_spark_spark.operators.dedup import minhash_fidelity

    t1 = "a b c d e f g h"
    t2 = "a b c d e f x y"
    df = spark.createDataFrame(
        [(1, t1), (2, t2)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    [r] = minhash_fidelity(
        df, pairs, "doc_id", "text", num_hashes=8
    ).collect()
    g1, g2 = _grams(t1), _grams(t2)
    inter = len(g1 & g2)
    exact = 10**6 * inter // len(g1 | g2)
    matches = sum(
        _sig_component(i, g1) == _sig_component(i, g2) for i in range(8)
    )
    assert r.exact_ppm == exact
    assert r.est_ppm == 10**6 * matches // 8
    assert r.err_ppm == abs(r.est_ppm - r.exact_ppm)


def test_fidelity_identical_docs(spark):
    from soda_spark_spark.operators.dedup import minhash_fidelity

    df = spark.createDataFrame(
        [(1, "w x y z q"), (2, "w x y z q")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    [r] = minhash_fidelity(df, pairs, "doc_id", "text").collect()
    assert (r.est_ppm, r.exact_ppm, r.err_ppm) == (1000000, 1000000, 0)


def test_fidelity_disjoint_and_empty(spark):
    from soda_spark_spark.operators.dedup import minhash_fidelity

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "p q r s"), (3, "x"), (4, "y")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (3, 4), (1, 3)], "id_a long, id_b long"
    )
    rows = {(r.id_a, r.id_b): r for r in minhash_fidelity(
        df, pairs, "doc_id", "text", num_hashes=4
    ).collect()}
    assert rows[(1, 2)].exact_ppm == 0          # disjoint gram sets
    assert rows[(3, 4)].est_ppm is None          # both docs gram-less
    assert rows[(3, 4)].exact_ppm is None
    assert rows[(1, 3)].exact_ppm == 0           # one-sided empty
    assert rows[(1, 3)].est_ppm == 0


def test_fidelity_xxhash_channel_and_validation(spark):
    from soda_spark_spark.operators.dedup import minhash_fidelity

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    [r] = minhash_fidelity(
        df, pairs, "doc_id", "text", hash_fn="xxhash64", seed=7
    ).collect()
    assert r.est_ppm == 1000000
    with pytest.raises(ValueError, match="unseeded"):
        minhash_fidelity(df, pairs, "doc_id", "text", seed=7)
    with pytest.raises(ValueError, match="unknown hash_fn"):
        minhash_fidelity(df, pairs, "doc_id", "text", hash_fn="sha1")


def test_fidelity_only_touches_sampled_docs(spark):
    """The corpus side is semi-joined down to docs appearing in pairs."""
    from soda_spark_spark.operators.dedup import minhash_fidelity

    df = spark.createDataFrame(
        [(i, f"tok{i} tok{i+1} tok{i+2} tok{i+3}") for i in range(100)],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    out = minhash_fidelity(df, pairs, "doc_id", "text", num_hashes=4)
    assert out.count() == 1
