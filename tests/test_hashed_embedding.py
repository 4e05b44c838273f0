"""Feature-hashed document embeddings: independent-reference parity,
persisted sign-table reuse, partitioning invariance, and vector-ops
composition."""

import collections
import hashlib

import pytest
from pyspark.sql import functions as F

from soda_spark_spark.operators.similarity import (
    hashed_embedding,
    token_signs,
)

DOCS = [
    (1, "spark scan fast fast table"),
    (2, "scan slow table table join"),
    (3, "join merge window spark spark"),
    (4, ""),                      # empty text -> no embedding row
    (5, "   "),                   # whitespace-only -> no embedding row
    (6, "UPPER case Mixed"),
]


def _sign(tok, j):
    h = hashlib.md5(f"{tok}:{j}".encode()).hexdigest()[:8]
    return 1 if int(h, 16) % 2 == 0 else -1


def _reference(docs, dim):
    out = {}
    for i, t in docs:
        toks = [w for w in t.strip().lower().split() if w]
        if not toks:
            continue
        c = collections.Counter(toks)
        out[i] = [sum(tf * _sign(w, j) for w, tf in c.items())
                  for j in range(dim)]
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def test_matches_independent_reference(docs):
    got = {r.doc_id: list(r.embedding)
           for r in hashed_embedding(docs, "doc_id", "text", dim=8).collect()}
    assert got == _reference(DOCS, 8)


def test_empty_docs_have_no_row(docs):
    ids = {r.doc_id for r in
           hashed_embedding(docs, "doc_id", "text", dim=4).collect()}
    assert ids == {1, 2, 3, 6}


def test_persisted_sign_table_reuse(spark, docs, tmp_path):
    toks = docs.select(
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    path = str(tmp_path / "signs")
    token_signs(toks, dim=8).write.parquet(path)
    signs = spark.read.parquet(path)
    a = {r.doc_id: list(r.embedding)
         for r in hashed_embedding(docs, "doc_id", "text", dim=8).collect()}
    b = {r.doc_id: list(r.embedding)
         for r in hashed_embedding(docs, "doc_id", "text", dim=8,
                                   signs=signs).collect()}
    assert a == b


def test_partitioning_invariance(docs):
    a = {r.doc_id: list(r.embedding)
         for r in hashed_embedding(docs, "doc_id", "text", dim=6).collect()}
    b = {r.doc_id: list(r.embedding)
         for r in hashed_embedding(docs.repartition(7), "doc_id", "text",
                                   dim=6).collect()}
    assert a == b


def test_dim_validation(docs):
    toks = docs.select(F.lit("x").alias("token"))
    with pytest.raises(ValueError):
        token_signs(toks, dim=0)


def test_composes_with_pq(docs):
    from soda_spark_spark.operators.similarity import (
        pq_encode,
        pq_search,
        pq_train,
    )

    emb = hashed_embedding(docs, "doc_id", "text", dim=8).cache()
    cb = pq_train(emb, "doc_id", "embedding", m=2, k=2, n_iter=1)
    enc = pq_encode(emb, cb, "doc_id", "embedding")
    out = pq_search(enc, cb, emb.limit(1), "doc_id", "embedding", k=2)
    rows = out.collect()
    assert len(rows) == 2 and all(r.adist >= 0 for r in rows)


def test_impl_parity(docs):
    a = {r.doc_id: list(r.embedding)
         for r in hashed_embedding(docs, "doc_id", "text", dim=8,
                                   impl="catalyst").collect()}
    b = {r.doc_id: list(r.embedding)
         for r in hashed_embedding(docs, "doc_id", "text", dim=8,
                                   impl="kernel").collect()}
    assert a == b


def test_impl_parity_unicode_whitespace(spark):
    #   is Unicode whitespace but NOT Java \s — both impls must
    # treat 'a b' as ONE token
    df = spark.createDataFrame([(1, "a b a b c")],
                               "doc_id long, text string")
    a = {r.doc_id: list(r.embedding)
         for r in hashed_embedding(df, "doc_id", "text", dim=4,
                                   impl="catalyst").collect()}
    b = {r.doc_id: list(r.embedding)
         for r in hashed_embedding(df, "doc_id", "text", dim=4,
                                   impl="kernel").collect()}
    assert a == b
