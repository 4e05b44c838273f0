"""Round-21 optimization pins.

Each test pins the PLAN PROPERTY a round-21 optimization claims, plus
value parity where the rewrite touched result construction. Kept
deliberately loose on exact node counts (r20 ADVICE: exact counts are
Spark-version-coupled); presence/absence and =1 duplication checks only.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_dedup_against_union_new_runs_verify_once(spark):
    """The survivor filter is a left-outer + IS NULL, not a left-anti:
    an anti join against a union-shaped `new` is pushed into every
    union branch, duplicating the whole band/verify pipeline with
    per-branch inferred filters (no AQE reuse). The Jaccard verify
    expression must appear exactly ONCE in the optimized plan even when
    `new` is a two-branch union."""
    from soda_spark_spark.operators.dedup import dedup_against

    rows = [(i, f"w{i} " * 12) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    new = docs.filter(F.col("doc_id") % 4 == 0).unionByName(
        docs.filter(F.col("doc_id") % 10 == 1).select(
            (F.col("doc_id") + 1000).alias("doc_id"), "text"
        )
    )
    seen = docs.filter(F.col("doc_id") % 4 != 0)
    out = dedup_against(new, seen, "doc_id", "text", method="minhash")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("array_intersect") == 1, (
        "verify pipeline duplicated across union branches:\n" + plan
    )


def test_dedup_against_left_outer_matches_anti_semantics(spark):
    """Left-outer + IS NULL == left-anti on a distinct dropped set,
    including null ids (match in neither form) and union-shaped new."""
    from soda_spark_spark.operators.dedup import dedup_against

    base = [(i, ("alpha beta gamma delta " * 5) if i % 3 == 0
             else f"unique text number {i} " * 6) for i in range(30)]
    docs = spark.createDataFrame(base, "doc_id long, text string")
    new = docs.filter(F.col("doc_id") % 2 == 0).unionByName(
        spark.createDataFrame(
            [(None, "alpha beta gamma delta " * 5)],
            "doc_id long, text string",
        )
    )
    seen = docs.filter(F.col("doc_id") % 2 == 1)
    out = dedup_against(new, seen, "doc_id", "text", method="minhash")
    kept = {r.doc_id for r in out.collect()}
    # brute reference: a new doc is dropped iff jaccard >= 0.8 vs any seen
    new_rows = [(r.doc_id, r.text) for r in new.collect()]
    seen_rows = [(r.doc_id, r.text) for r in seen.collect()]

    def grams(t):
        w = t.split()
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    expect = set()
    for nid, nt in new_rows:
        if nid is None:
            # a null id matches no join key in EITHER formulation (anti
            # or outer): the row is always kept, whatever its content
            expect.add(nid)
            continue
        gn = grams(nt)
        dup = any(
            len(gn & grams(st)) / len(gn | grams(st)) >= 0.8
            for _, st in seen_rows
        )
        if not dup:
            expect.add(nid)
    assert kept == expect
