"""Round-10 fixes: BM25 v2 index (dictionary df rows, pre-scan stop-term
prune, query-side guard, double-chain tfn overflow fix, rank_by channels),
perplexity_buckets' scale-safe order-statistic cuts, the bounded
hashed_embedding sign memo, the stale-signs-table union, and the IVF-PQ
recall instrument."""

import random

import pytest
from pyspark.sql import functions as F

from soda_spark_spark.operators.lm import _order_statistic, perplexity_buckets
from soda_spark_spark.operators.similarity import (
    bm25_index,
    bm25_search,
    hashed_embedding,
    ivfpq_build,
    ivfpq_recall_report,
    token_signs,
)

DOCS = [
    (1, "spark scan fast fast table"),
    (2, "scan slow table table table join"),
    (3, "join merge window spark spark"),
    (4, "window window window batch"),
    (5, "batch stream stream fast scan"),
]


@pytest.fixture(scope="module")
def indexed(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    return bm25_index(docs, "doc_id", "text")


# ---------------------------------------------------------------- BM25 v2


def test_index_dictionary_rows_carry_df(indexed):
    rows = indexed.collect()
    dic = {r.term: r for r in rows if r.term is not None and r.id is None}
    # df known at build time, one dictionary row per distinct term
    assert dic["scan"].df == 3
    assert dic["spark"].df == 2
    assert dic["slow"].df == 1
    assert all(r.tf is None and r.dl is None for r in dic.values())
    # postings rows carry NULL df (the dictionary is the df channel)
    postings = [r for r in rows if r.term is not None and r.id is not None]
    assert postings and all(r.df is None for r in postings)


def test_v1_index_back_compat(spark, indexed):
    """A v1 index (no df column) searches identically via the fallback
    df aggregation."""
    qdf = spark.createDataFrame(
        [(0, "scan"), (0, "fast"), (1, "spark")], "query_id int, term string"
    )
    v1 = indexed.filter(
        F.col("term").isNull() | F.col("id").isNotNull()
    ).drop("df")
    a = sorted(map(tuple, bm25_search(indexed, qdf, k=10)
                   .select("query_id", "id", "n_terms", "score_p12", "rank")
                   .collect()))
    b = sorted(map(tuple, bm25_search(v1, qdf, k=10)
                   .select("query_id", "id", "n_terms", "score_p12", "rank")
                   .collect()))
    assert a == b and a


def test_max_df_prunes_before_postings(spark, indexed):
    """v2 max_df drops the stop term from the literal term filter:
    results match the v1 post-aggregation prune."""
    qdf = spark.createDataFrame(
        [(0, "scan"), (0, "slow")], "query_id int, term string"
    )
    v1 = indexed.filter(
        F.col("term").isNull() | F.col("id").isNotNull()
    ).drop("df")
    a = sorted(map(tuple, bm25_search(indexed, qdf, k=10, max_df=2)
                   .select("query_id", "id", "score_p12").collect()))
    b = sorted(map(tuple, bm25_search(v1, qdf, k=10, max_df=2)
                   .select("query_id", "id", "score_p12").collect()))
    assert a == b and a  # 'slow' (df=1) survives; results non-empty
    # 'scan' (df=3) must be pruned from the literal postings term
    # filter itself — its postings are never part of the v2 scan
    plan = bm25_search(indexed, qdf, k=10, max_df=2)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "slow" in plan and "scan" not in plan


def test_query_side_guard(spark, indexed):
    qdf = spark.range(50).select(
        F.lit(0).alias("query_id"), F.col("id").cast("string").alias("term")
    )
    with pytest.raises(ValueError, match="max_query_rows"):
        bm25_search(indexed, qdf, max_query_rows=10)
    # None skips the check
    assert bm25_search(indexed, qdf, max_query_rows=None).count() == 0 or True


def test_rank_by_bm25_orders_float_channel(spark, indexed):
    qdf = spark.createDataFrame(
        [(0, "scan"), (0, "fast"), (0, "spark"), (0, "table")],
        "query_id int, term string",
    )
    rows = bm25_search(indexed, qdf, k=10, rank_by="bm25").collect()
    by_float = sorted(rows, key=lambda r: (-r.bm25, r.id))
    by_rank = sorted(rows, key=lambda r: r.rank)
    assert [r.id for r in by_rank] == [r.id for r in by_float]
    with pytest.raises(ValueError, match="rank_by"):
        bm25_search(indexed, qdf, rank_by="nope")


def test_missing_query_terms_empty_result(spark, indexed):
    qdf = spark.createDataFrame([(0, "zzz")], "query_id int, term string")
    out = bm25_search(indexed, qdf, k=5)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "query_id", "id", "n_terms", "score_p12", "bm25", "rank"]


# ------------------------------------------------- order-statistic cuts


def test_order_statistic_matches_sorted(spark):
    rng = random.Random(7)
    vals = [rng.choice([1.5, 2.25, 3.0, 7.5, 11.0, 42.0]) for _ in range(500)]
    vals += [rng.uniform(-100, 100) for _ in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    s = sorted(vals)
    for rank in (1, 2, 333, 500, 667, 999, 1000):
        got = _order_statistic(
            df, "x", rank, min(vals), max(vals), n_buckets=16, exact_rows=8
        )
        assert got == s[rank - 1], rank


def test_order_statistic_all_ties(spark):
    df = spark.createDataFrame([(5.0,)] * 100, "x double")
    assert _order_statistic(df, "x", 34, 5.0, 5.0) == 5.0


def test_perplexity_buckets_matches_bruteforce(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * j) % 11}" for j in range(12)))
         for i in range(60)],
        "doc_id long, text string",
    )
    from soda_spark_spark.operators.lm import ngram_lm

    model = ngram_lm(docs.filter(F.col("doc_id") % 2 == 0),
                     "doc_id", "text", n=2)
    out = perplexity_buckets(docs, model, "doc_id", "text", n=2)
    rows = out.collect()
    avgs = sorted(r.avg_score_ppm for r in rows)
    n = len(avgs)
    cut_lo = avgs[-(-n // 3) - 1]
    cut_mid = avgs[-(-2 * n // 3) - 1]
    for r in rows:
        want = ("tail" if r.avg_score_ppm <= cut_lo
                else "middle" if r.avg_score_ppm <= cut_mid else "head")
        assert r.bucket == want
    # the returned plan must not carry an O(N) sort/limit
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrdered" not in plan
    assert "GlobalLimit" not in plan
    # ADVICE r9: the persisted score handle is caller-owned — exposed
    handle = out._cached_scores
    assert handle is not None and handle.is_cached
    handle.unpersist()
    assert not handle.is_cached


# ------------------------------------------------- hashed_embedding


def test_sign_memo_cap_bit_identical(spark):
    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{(i * 3) % 13} shared word") for i in range(40)],
        "doc_id long, text string",
    )
    a = {r.doc_id: r.embedding for r in hashed_embedding(
        docs, "doc_id", "text", dim=8).collect()}
    b = {r.doc_id: r.embedding for r in hashed_embedding(
        docs, "doc_id", "text", dim=8, sign_memo_cap=1).collect()}
    assert a == b
    with pytest.raises(ValueError, match="sign_memo_cap"):
        hashed_embedding(docs, "doc_id", "text", dim=8, sign_memo_cap=0)


def test_stale_signs_table_hashes_missing_tokens(spark):
    """ADVICE r9: an explicit signs artifact missing new-vocabulary
    tokens must not silently drop them — missing tokens are hashed
    in-plan, so output equals the no-artifact path."""
    docs = spark.createDataFrame(
        [(1, "old new1 new2"), (2, "old old new2")],
        "doc_id long, text string",
    )
    stale = token_signs(
        spark.createDataFrame([("old",)], "token string"), dim=8
    )
    want = {r.doc_id: r.embedding for r in hashed_embedding(
        docs, "doc_id", "text", dim=8, impl="catalyst").collect()}
    got = {r.doc_id: r.embedding for r in hashed_embedding(
        docs, "doc_id", "text", dim=8, impl="catalyst",
        signs=stale).collect()}
    assert got == want
    # the missing-token rows really flow through (new1/new2 contribute)
    only_old = {r.doc_id: r.embedding for r in hashed_embedding(
        docs.withColumn("text", F.lit("old")), "doc_id", "text", dim=8,
        impl="catalyst").collect()}
    assert got != only_old


# ------------------------------------------------- ivfpq recall sweep


def test_ivfpq_recall_report(spark):
    rng = random.Random(3)
    pts = [(i, [rng.randrange(-30, 30) for _ in range(8)])
           for i in range(120)]
    df = spark.createDataFrame(pts, "vec_id long, v array<long>")
    corpus = df.filter(F.col("vec_id") >= 5)
    queries = df.filter(F.col("vec_id") < 5)
    coarse, codebook, codes = ivfpq_build(
        corpus, "vec_id", "v", n_lists=4, m=2, k=4
    )
    rep = ivfpq_recall_report(
        corpus, codes, coarse, codebook, queries, "vec_id", "v",
        k=5, nprobes=[1, 2, 4],
    ).collect()
    by_probe = {}
    for r in rep:
        by_probe.setdefault(r.nprobe, []).append(r)
        assert 0 <= r.n_hits <= 5
        assert r.recall_ppm == (1000000 * r.n_hits) // 5
    assert set(by_probe) == {1, 2, 4}
    assert all(len(v) == 5 for v in by_probe.values())  # one row per query
    mean = {p: sum(r.n_hits for r in v) / len(v) for p, v in by_probe.items()}
    # probing every list can only help vs probing one
    assert mean[4] >= mean[1]
    with pytest.raises(ValueError, match="nprobes"):
        ivfpq_recall_report(
            corpus, codes, coarse, codebook, queries, "vec_id", "v",
            nprobes=[0],
        )


# ------------------------------------------------- perplexity_tier step


def test_curate_perplexity_tier_step(spark):
    from soda_spark_spark.operators.lm import ngram_lm
    from soda_spark_spark.pipeline import curate

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * j) % 9}" for j in range(10)))
         for i in range(30)] + [(99, "x")],  # doc 99: < 2 tokens, no tier
        "doc_id long, text string",
    )
    model = ngram_lm(docs.filter(F.col("doc_id") % 2 == 0),
                     "doc_id", "text", n=2)
    out, report = curate(
        docs,
        [{"kind": "perplexity_tier", "model": model,
          "keep": ["head", "middle"], "n": 2}],
        report=True,
    )
    kept = {r.doc_id for r in out.collect()}
    tiers = {r.doc_id: r.bucket for r in perplexity_buckets(
        docs, model, "doc_id", "text", n=2).collect()}
    assert kept == {d for d, b in tiers.items() if b in ("head", "middle")}
    assert 99 not in kept  # untierable docs drop (documented contract)
    assert report == [{"step": 0, "kind": "perplexity_tier",
                       "rows": len(kept)}]
    with pytest.raises(ValueError, match="unknown tiers"):
        curate(docs, [{"kind": "perplexity_tier", "model": model,
                       "keep": ["bogus"]}])
