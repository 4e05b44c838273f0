"""Round-6 fixes: finite default hot-bucket cap for LSH pair enumeration.

An uncapped degenerate bucket costs O(bucket^2) pair-enumeration TIME in a
single task (memory is bounded — pairs stream row-by-row — but time is not),
plus one O(bucket) collect_list array per bucket row. The production default
is now a finite cap; None is the explicit exact-recall opt-in.
"""

from __future__ import annotations

import inspect

from pyspark.sql import functions as F

from soda_spark_spark.operators import dedup as D


def test_default_cap_is_finite_and_shared():
    assert isinstance(D.DEFAULT_MAX_BUCKET_SIZE, int)
    assert D.DEFAULT_MAX_BUCKET_SIZE > 0
    for fn in (
        D.lsh_candidate_pairs,
        D.minhash_near_dup_pairs,
        D.simhash_near_dup_pairs,
    ):
        default = inspect.signature(fn).parameters["max_bucket_size"].default
        assert default == D.DEFAULT_MAX_BUCKET_SIZE, fn.__name__


def _degenerate_signatures(spark, n_docs: int):
    # every doc carries the identical signature -> every band bucket holds
    # all n_docs ids (the pathological hot-bucket shape)
    rows = [(i, [7, 7, 7, 7]) for i in range(n_docs)]
    return spark.createDataFrame(rows, "id long, sig array<long>")


def test_hot_bucket_dropped_above_cap_kept_with_none(spark):
    sigs = _degenerate_signatures(spark, 10)
    capped = D.lsh_candidate_pairs(
        sigs, bands=2, rows_per_band=2, max_bucket_size=5
    )
    assert capped.count() == 0  # the 10-doc bucket exceeds the cap -> dropped
    exact = D.lsh_candidate_pairs(
        sigs, bands=2, rows_per_band=2, max_bucket_size=None
    )
    assert exact.count() == 10 * 9 // 2  # opt-out enumerates all pairs


def test_default_cap_keeps_normal_buckets(spark):
    # 10 << DEFAULT_MAX_BUCKET_SIZE: the default must not change results
    # for non-pathological buckets
    sigs = _degenerate_signatures(spark, 10)
    out = D.lsh_candidate_pairs(sigs, bands=2, rows_per_band=2)
    assert out.count() == 10 * 9 // 2


def test_simhash_cap_drops_degenerate_bucket(spark):
    docs = spark.createDataFrame(
        [(i, "same exact text body for every document") for i in range(8)],
        "doc_id long, text string",
    )
    capped = D.simhash_near_dup_pairs(
        docs, "doc_id", "text", max_hamming=3, max_bucket_size=4
    )
    assert capped.count() == 0
    exact = D.simhash_near_dup_pairs(
        docs, "doc_id", "text", max_hamming=3, max_bucket_size=None
    )
    assert exact.count() == 8 * 7 // 2


def test_oracle_full_artifact_covers_registry():
    """A late queries_full() registration must never outrun the committed
    full-registry oracle artifact (round-4 lesson: events_enrich_stream
    was registered after ORACLE_FULL_r04.json was regenerated, leaving it
    uncertified in the committed evidence)."""
    import glob
    import json
    import os
    import re
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    arts = glob.glob(os.path.join(root, "ORACLE_FULL_r*.json"))
    assert arts, "no ORACLE_FULL artifact committed"
    latest = max(
        arts, key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
    )
    with open(latest) as f:
        artifact = json.load(f)

    sys.path.insert(0, root)
    import __spark_entry__ as entry

    assert set(artifact) == set(entry.queries_full()), (
        f"{os.path.basename(latest)} does not cover the full registry: "
        f"missing={sorted(set(entry.queries_full()) - set(artifact))} "
        f"stale={sorted(set(artifact) - set(entry.queries_full()))}"
    )


def test_keyless_asof_on_string_time_is_distributed_and_exact(spark):
    """String time axes now bucket via sampled boundaries instead of
    falling back to the single-partition window: no RuntimeWarning, and
    results identical to the numeric-time keyless join."""
    import warnings

    from soda_spark_spark.operators.joins import asof_join

    # ISO-8601 strings order lexicographically == chronologically
    left = spark.createDataFrame(
        [(i, f"2026-01-{(i % 28) + 1:02d}T{i % 24:02d}:00:00") for i in range(300)],
        "lid long, t string",
    )
    # right timestamps are all distinct (j % 28 and j % 60 only collide
    # mod 420 > 300): equal-time tie resolution is order-dependent by
    # contract, so the comparison needs tie-free input
    right = spark.createDataFrame(
        [
            (j, f"2026-01-{(j % 28) + 1:02d}T00:{j % 60:02d}:30")
            for j in range(0, 300, 7)
        ],
        "v long, t string",
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        got = {
            (r["lid"], r["v"])
            for r in asof_join(
                left, right, on="t", value_cols=["v"], num_buckets=8
            ).collect()
        }

    lnum = left.withColumn("t", F.to_timestamp("t").cast("long"))
    rnum = right.withColumn("t", F.to_timestamp("t").cast("long"))
    want = {
        (r["lid"], r["v"])
        for r in asof_join(
            lnum, rnum, on="t", value_cols=["v"], num_buckets=8
        ).collect()
    }
    assert got == want


def test_keyless_asof_unorderable_type_still_warns(spark):
    from soda_spark_spark.operators.joins import asof_join

    import pytest as _pytest

    left = spark.createDataFrame([([1], 1)], "t array<int>, lid int")
    right = spark.createDataFrame([([0], 7)], "t array<int>, v int")
    with _pytest.warns(RuntimeWarning, match="single global partition"):
        asof_join(left, right, on="t", value_cols=["v"]).collect()


def test_token_corpus_stats_hand_computed(spark):
    from soda_spark_spark.operators.text import token_corpus_stats

    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "b c"), (3, "A"), (4, "   ")],
        "doc_id long, text string",
    )
    # corpus tf (lowercased): a=3, b=2, c=1
    rows = {
        r["doc_id"]: r
        for r in token_corpus_stats(docs, "doc_id", "text").collect()
    }
    assert set(rows) == {1, 2, 3}  # whitespace-only doc has no tokens
    r1 = rows[1]
    assert (r1["n_tokens"], r1["n_distinct_tokens"]) == (3, 2)
    assert abs(r1["avg_token_corpus_freq"] - 8 / 3) < 1e-12
    assert r1["rare_token_fraction"] == 0.0
    r2 = rows[2]
    assert (r2["n_tokens"], r2["n_distinct_tokens"]) == (2, 2)
    assert r2["avg_token_corpus_freq"] == 1.5
    assert r2["rare_token_fraction"] == 0.5  # only 'c' is corpus-rare
    r3 = rows[3]
    assert (r3["n_tokens"], r3["n_distinct_tokens"]) == (1, 1)
    assert r3["avg_token_corpus_freq"] == 3.0  # 'A' lowercased joins 'a'


def test_dedup_against_stream_matches_batch(spark, tmp_path):
    from pyspark.sql import functions as _F

    from soda_spark_spark.operators.dedup import dedup_against
    from soda_spark_spark.streaming.scan_stream import dedup_against_stream

    docs = spark.createDataFrame(
        [(i, f"doc body {i % 6}") for i in range(24)]  # 6 distinct texts
        + [(100, "genuinely novel content")],  # the only history-free doc
        "doc_id long, text string",
    )
    path = str(tmp_path / "docs")
    docs.write.parquet(path)
    seen = docs.filter(_F.col("doc_id") < 6)  # history covers all 6 texts

    stream = (
        spark.readStream.schema(docs.schema)
        .parquet(path)
        .filter(_F.col("doc_id") >= 6)
    )
    out = dedup_against_stream(stream, seen, "text")
    q = (
        out.writeStream.format("memory")
        .queryName("dastream_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {r["doc_id"] for r in spark.table("dastream_t").collect()}
    want = {
        r["doc_id"]
        for r in dedup_against(
            docs.filter(_F.col("doc_id") >= 6), seen, "doc_id", "text"
        ).collect()
    }
    assert got == want == {100}  # every replayed text dropped; novel kept
