"""Round-15 regression tests: the r14 judge defect (quantile_sketch
admits ±Infinity — the sibling of the round-14 NaN fix) plus the four
r14 ADVICE low findings.

1. quantile_sketch filtered NaN but admitted ±Infinity (VERDICT
   "What's wrong" #1): one +Inf row lands in the top edge bucket
   (floor clamps), min/max propagates it into hi_v, quantile_query
   returns Infinity, and a streaming gate calibrated off it cuts at
   Infinity — silently keeping ALL rows (-Inf symmetrically poisons
   lo_v / keeps none). Non-finite values are now excluded exactly
   like NULL/NaN, mirrored in the oracle SQL (isfinite).
2. hits() seeded hub = HITS_SCALE DIV N, which is 0 for graphs with
   more than 1e6 nodes — every iteration stayed all-zero. The seed is
   now clamped to >= 1; any constant positive seed L1-normalizes to
   bit-identical scores ((c*a*S) DIV (c*A) == (a*S) DIV A exactly).
3. moment_sketch_batch_writer defaulted run_id=None while
   moment_sketch_compact dedups on (batch_id, i, j): two distinct
   streaming queries appending to one artifact both emit batch_id=0
   and compact silently collapses real partials. run_id is now
   REQUIRED (the two-run merge test lives in test_moment_stream.py).
4. zorder_key's (clamped - lo) * 2^bits and hi - lo + 1 ran in
   non-ANSI long arithmetic: a wide bigint column silently wrapped to
   wrong/negative buckets. The span is now validated — ValueError for
   pinned stats, a runtime raise_error for derived stats.
5. read_jsonl/read_jsonl_stream/read_delimited decided whether to
   append the corrupt column via substring containment: a schema
   column named e.g. `my_corrupt_record` suppressed the append and
   the quarantine raw-line capture was silently lost. The DDL is now
   parsed and field names compared exactly.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# 1. quantile_sketch ±Infinity exclusion
# ---------------------------------------------------------------------------


def test_quantile_sketch_skips_infinity(spark):
    from soda_spark_spark.operators.cardinality import (
        quantile_query, quantile_sketch,
    )

    df = spark.createDataFrame(
        [
            (1.0,), (2.0,), (float("inf"),), (None,), (3.0,),
            (float("-inf"),), (float("nan"),),
        ],
        "v double",
    )
    sk = quantile_sketch(df, "v", lo=0.0, hi=4.0, n_buckets=4).collect()
    assert sum(r.n for r in sk) == 3  # Inf, -Inf, NaN, NULL all excluded
    for r in sk:
        assert math.isfinite(r.lo_v) and math.isfinite(r.hi_v)
    est = {
        r.q: r.estimate
        for r in quantile_query(
            quantile_sketch(df, "v", lo=0.0, hi=4.0, n_buckets=4),
            [0.5, 1.0],
        ).collect()
    }
    assert est[0.5] == 2.0 and est[1.0] == 3.0  # finite, Inf-free


def test_quantile_sketch_all_nonfinite_is_empty(spark):
    from soda_spark_spark.operators.cardinality import quantile_sketch

    df = spark.createDataFrame(
        [(float("inf"),), (float("-inf"),), (float("nan"),), (None,)],
        "v double",
    )
    assert quantile_sketch(df, "v", lo=0.0, hi=1.0).count() == 0


def test_quantile_gate_calibrates_past_infinity(spark):
    """The judge's live repro: +Inf in the calibration batch made the
    p75 cut Infinity, so the gate silently kept EVERY row (the mirror
    of the NaN zero-rows mode)."""
    from soda_spark_spark.operators.cardinality import (
        quantile_query, quantile_sketch, quantile_sketch_compact,
        quantile_sketch_merge,
    )

    clean = spark.range(1, 101).select(F.col("id").cast("double").alias("v"))
    dirty = clean.unionByName(
        spark.createDataFrame(
            [(float("inf"),)] * 5 + [(float("-inf"),)] * 5, "v double"
        )
    )
    a = quantile_sketch(clean, "v", lo=0.0, hi=100.0, n_buckets=50)
    b = quantile_sketch(dirty, "v", lo=0.0, hi=100.0, n_buckets=50)
    merged = quantile_sketch_compact(quantile_sketch_merge(a, b))
    [row] = quantile_query(merged, [0.75]).collect()
    cut = row.hi_v
    assert math.isfinite(cut)
    kept = dirty.filter(F.col("v") <= cut).count()
    # 200 finite values (two copies of 1..100), p75 cut ~ 76: the gate
    # must actually gate — neither keep-all (Inf cut) nor keep-none
    assert 0 < kept < dirty.count()
    # low quantiles must not be poisoned by -Inf either
    [q10] = quantile_query(merged, [0.1]).collect()
    assert math.isfinite(q10.estimate) and q10.estimate > 0.0


# ---------------------------------------------------------------------------
# 2. hits() seed on >HITS_SCALE-node graphs
# ---------------------------------------------------------------------------


def test_hits_seed_clamps_on_huge_graphs(spark, monkeypatch):
    """With N > HITS_SCALE the old integer seed SCALE DIV N was 0 and
    every iteration stayed all-zero. Exercise the exact failure shape
    cheaply by shrinking the scale constant below the node count."""
    from soda_spark_spark.operators import graph as graph_mod

    monkeypatch.setattr(graph_mod, "HITS_SCALE", 1000)
    # 1001-node star (1000 leaves -> center, center -> leaf 0):
    # N = 1001 > patched scale 1000 -> old seed = 1000 DIV 1001 = 0
    # and every iteration stayed all-zero; the clamped seed = 1 gives
    # auth(center) ~ SCALE and hub(leaf) ~ SCALE/1000 — nonzero.
    edges = spark.createDataFrame(
        [(i, 1000) for i in range(1000)] + [(1000, 0)],
        "src long, dst long",
    )
    scores = graph_mod.hits(
        edges, n_iter=2, cache_iterations=False
    ).collect()
    assert max(r.auth_ppm for r in scores) > 0
    assert max(r.hub_ppm for r in scores) > 0


def test_hits_seed_constant_invariance(spark):
    """The clamp's correctness argument: any constant positive seed
    L1-normalizes to identical scores after one iteration. Verify the
    default run equals a run whose seed is scaled by pinning stats via
    a graph size that divides HITS_SCALE exactly vs not at all."""
    from soda_spark_spark.operators.graph import hits

    # star + chain graph, 6 nodes: seed = 1e6 DIV 6 = 166666 (inexact
    # division — the hardest case for the invariance claim)
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 3), (3, 5), (5, 0)],
        "src long, dst long",
    )
    got = {
        r.node: (r.hub_ppm, r.auth_ppm)
        for r in hits(edges, n_iter=3, cache_iterations=False).collect()
    }
    # replay the fixpoint in exact integer arithmetic with seed=1
    # (the clamped huge-graph seed) — scores must be identical
    SCALE = 1_000_000
    e = [(1, 2), (1, 3), (2, 3), (4, 3), (3, 5), (5, 0)]
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    hub = {u: 1 for u in nodes}
    auth = {u: 0 for u in nodes}
    for _ in range(3):
        a_raw = {u: 0 for u in nodes}
        for u, v in e:
            a_raw[v] += hub[u]
        at = sum(a_raw.values())
        auth = {
            u: (a_raw[u] * SCALE) // at if at > 0 else 0 for u in nodes
        }
        h_raw = {u: 0 for u in nodes}
        for u, v in e:
            h_raw[u] += auth[v]
        ht = sum(h_raw.values())
        hub = {
            u: (h_raw[u] * SCALE) // ht if ht > 0 else 0 for u in nodes
        }
    want = {u: (hub[u], auth[u]) for u in nodes}
    assert got == want


# ---------------------------------------------------------------------------
# 3. moment_sketch_batch_writer requires run_id
# ---------------------------------------------------------------------------


def test_moment_writer_requires_run_id():
    from soda_spark_spark.streaming.scan_stream import (
        moment_sketch_batch_writer,
    )

    with pytest.raises(TypeError):
        moment_sketch_batch_writer("/tmp/x", "vec_id", "qvec")
    with pytest.raises(ValueError, match="run_id"):
        moment_sketch_batch_writer("/tmp/x", "vec_id", "qvec", run_id="")
    with pytest.raises(ValueError, match="run_id"):
        moment_sketch_batch_writer(
            "/tmp/x", "vec_id", "qvec", run_id=None  # type: ignore[arg-type]
        )


# ---------------------------------------------------------------------------
# 4. zorder_key span-overflow validation
# ---------------------------------------------------------------------------


def test_zorder_key_pinned_wide_span_raises(spark):
    from soda_spark_spark.operators.packing import zorder_key

    df = spark.createDataFrame([(1, 1)], "a long, b long")
    with pytest.raises(ValueError, match="quantile-bucket"):
        zorder_key(
            df, ["a", "b"], bits=8,
            stats={"a": (-(2**62), 2**62), "b": (0, 1)},
        )


def test_zorder_key_derived_wide_span_raises(spark):
    """A hash-valued bigint column spanning most of int64 must raise,
    not wrap to corrupt negative buckets. Since round 16 the derived
    min/max are collected eagerly (bounded driver state), so the span
    validation fails FAST at call time — same message, earlier."""
    from soda_spark_spark.operators.packing import zorder_key

    df = spark.createDataFrame(
        [(-(2**62), 0), (2**62, 1)], "a long, b long"
    )
    with pytest.raises(Exception, match="quantile-bucket"):
        zorder_key(df, ["a", "b"], bits=8).collect()


def test_zorder_key_widest_valid_span_is_exact(spark):
    """Just inside the bound the arithmetic must still be overflow-free
    and produce in-range buckets."""
    from soda_spark_spark.operators.packing import zorder_key

    max_span = ((1 << 63) - 1 >> 8) - 1
    lo, hi = 0, max_span
    df = spark.createDataFrame([(lo,), (hi,), ((lo + hi) // 2,)], "a long")
    rows = zorder_key(df, ["a"], bits=8, stats={"a": (lo, hi)}).collect()
    keys = sorted(r.zorder_key for r in rows)
    assert keys[0] == 0 and keys[-1] == 255 and 0 <= keys[1] <= 255


# ---------------------------------------------------------------------------
# 5. corrupt-column append decided by exact field name
# ---------------------------------------------------------------------------


def test_ddl_with_corrupt_exact_name_match():
    from soda_spark_spark.sources.io import ddl_with_corrupt

    # substring-containing name must NOT suppress the append
    out = ddl_with_corrupt(
        "doc_id long, my_corrupt_record string", "_corrupt_record"
    )
    assert out.endswith(", _corrupt_record string")
    # exact match must suppress it
    same = "doc_id long, _corrupt_record string"
    assert ddl_with_corrupt(same, "_corrupt_record") == same


def test_read_jsonl_quarantine_survives_lookalike_column(spark, tmp_path):
    from soda_spark_spark.sources.jsonl import read_jsonl

    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"doc_id": 1, "my_corrupt_record": "x"}\n'
        "{this is not json}\n"
    )
    df = read_jsonl(
        spark, str(p), schema="doc_id long, my_corrupt_record string"
    ).cache()
    try:
        assert "_corrupt_record" in df.columns
        bad = df.filter(F.col("_corrupt_record").isNotNull())
        assert bad.count() == 1
        assert "{this is not json}" in bad.collect()[0]._corrupt_record
    finally:
        df.unpersist()


def test_read_delimited_quarantine_survives_lookalike_column(
    spark, tmp_path
):
    from soda_spark_spark.sources.delimited import read_delimited

    p = tmp_path / "in.csv"
    p.write_text("1,a\nnot_a_long,b\n")
    df = read_delimited(
        spark, str(p), schema="doc_id long, my_corrupt_record string"
    ).cache()
    try:
        assert "_corrupt_record" in df.columns
        assert df.filter(F.col("_corrupt_record").isNotNull()).count() == 1
    finally:
        df.unpersist()
