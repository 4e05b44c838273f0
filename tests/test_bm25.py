"""BM25 retrieval: index artifact contract, exact-channel determinism,
float-channel parity with an independent Python implementation, max_df
stop-term pruning, and edge cases."""

import collections
import math

import pytest
from pyspark.sql import functions as F

from soda_spark_spark.operators.similarity import bm25_index, bm25_search


DOCS = [
    (1, "spark scan fast fast table"),
    (2, "scan slow table table table join"),
    (3, "join merge window spark spark"),
    (4, "window window window batch"),
    (5, "batch stream stream fast scan"),
]


def _reference_bm25(docs, queries, k1=1.2, b=0.75):
    """Independent plain-Python BM25 (textbook Robertson idf)."""
    occ = {i: collections.Counter(t.split()) for i, t in docs}
    dls = {i: sum(c.values()) for i, c in occ.items()}
    n = len(dls)
    avg = sum(dls.values()) / n
    dfc = collections.Counter()
    for c in occ.values():
        for w in c:
            dfc[w] += 1
    out = {}
    for qid, term in queries:
        for i, c in occ.items():
            if term in c:
                idf = math.log(1 + (n - dfc[term] + 0.5) / (dfc[term] + 0.5))
                tfn = (c[term] * (k1 + 1)) / (
                    c[term] + k1 * (1 - b + b * dls[i] / avg)
                )
                out[(qid, i)] = out.get((qid, i), 0.0) + idf * tfn
    return out


@pytest.fixture(scope="module")
def indexed(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    return bm25_index(docs, "doc_id", "text")


def test_index_shape_and_metadata(indexed):
    rows = indexed.collect()
    meta = [r for r in rows if r.term is None]
    postings = [r for r in rows if r.term is not None]
    assert len(meta) == 1
    assert meta[0].tf == 5  # n_docs
    assert meta[0].dl == sum(len(t.split()) for _, t in DOCS)  # total tokens
    # one row per (term, doc); tf/dl exact for a spot doc
    d1 = {r.term: r for r in postings if r.id == 1}
    assert d1["fast"].tf == 2 and d1["fast"].dl == 5
    assert {r.term for r in postings if r.id == 4} == {"window", "batch"}


def test_float_channel_matches_independent_reference(spark, indexed):
    queries = [(0, "scan"), (0, "fast"), (1, "window"), (2, "stream")]
    qdf = spark.createDataFrame(queries, "query_id int, term string")
    got = {
        (r.query_id, r.id): r.bm25
        for r in bm25_search(indexed, qdf, k=10).collect()
    }
    exp = _reference_bm25(DOCS, queries)
    assert set(got) == set(exp)
    for key, v in exp.items():
        assert got[key] == pytest.approx(v, rel=1e-12), key


def test_exact_channel_ranks_like_float_channel(spark, indexed):
    # On this fixture the integer channel and the textbook float score
    # produce the same ranking (the channel is a monotone-per-term
    # transform; cross-term sums can diverge in principle, so this is a
    # fixture property we pin, not a theorem).
    qdf = spark.createDataFrame(
        [(0, "scan"), (0, "table"), (1, "window"), (1, "spark")],
        "query_id int, term string",
    )
    rows = bm25_search(indexed, qdf, k=10).collect()
    for qid in {r.query_id for r in rows}:
        sub = [r for r in rows if r.query_id == qid]
        by_exact = sorted(sub, key=lambda r: (-r.score_p12, r.id))
        by_float = sorted(sub, key=lambda r: (-r.bm25, r.id))
        assert [r.id for r in by_exact] == [r.id for r in by_float]


def test_rank_is_deterministic_and_k_bounded(spark, indexed):
    qdf = spark.createDataFrame([(7, "table"), (7, "scan")],
                                "query_id int, term string")
    rows = bm25_search(indexed, qdf, k=2).orderBy("rank").collect()
    assert len(rows) == 2
    assert [r.rank for r in rows] == [1, 2]
    assert rows[0].score_p12 >= rows[1].score_p12


def test_max_df_prunes_stop_terms(spark, indexed):
    # 'table' appears in 2 docs, 'scan' in 3 — max_df=2 keeps only 'table'.
    qdf = spark.createDataFrame([(0, "table"), (0, "scan")],
                                "query_id int, term string")
    rows = bm25_search(indexed, qdf, k=10, max_df=2).collect()
    assert {r.id for r in rows} == {1, 2}  # docs containing 'table'
    assert all(r.n_terms == 1 for r in rows)


def test_persisted_roundtrip(spark, indexed, tmp_path):
    path = str(tmp_path / "bm25_idx")
    indexed.write.mode("overwrite").parquet(path)
    reread = spark.read.parquet(path)
    qdf = spark.createDataFrame([(0, "scan"), (0, "fast")],
                                "query_id int, term string")
    a = sorted(map(tuple, bm25_search(indexed, qdf, k=5)
                   .select("query_id", "id", "score_p12", "rank").collect()))
    b = sorted(map(tuple, bm25_search(reread, qdf, k=5)
                   .select("query_id", "id", "score_p12", "rank").collect()))
    assert a == b


def test_unknown_terms_and_empty_results(spark, indexed):
    qdf = spark.createDataFrame([(0, "nosuchterm")], "query_id int, term string")
    assert bm25_search(indexed, qdf, k=5).count() == 0


def test_bad_params_raise(spark, indexed):
    qdf = spark.createDataFrame([(0, "scan")], "query_id int, term string")
    with pytest.raises(ValueError):
        bm25_search(indexed, qdf, k=0)
    with pytest.raises(ValueError):
        bm25_search(indexed, qdf, k=5, b=1.5)


def test_plan_broadcasts_query_side(spark, indexed):
    qdf = spark.createDataFrame([(0, "scan")], "query_id int, term string")
    plan = bm25_search(indexed, qdf, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
