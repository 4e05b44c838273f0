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
