"""Tests for sparse token-vector cosine similarity."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from soda_spark_spark.operators import similarity as S


DOCS = [
    (1, "apple banana apple cherry"),
    (2, "apple banana apple cherry"),          # exact dup of 1
    (3, "apple apple apple banana"),           # tf-skewed variant
    (4, "dog cat mouse"),
    (5, "dog cat mouse dog cat mouse"),        # same direction as 4 -> cos 1
    (6, "zebra"),
    (7, ""),
]


def _vecs(docs, max_df=None):
    vs = {i: Counter(t.strip().lower().split()) for i, t in docs}
    vs = {i: c for i, c in vs.items() if c}
    if max_df is not None:
        df = Counter()
        for c in vs.values():
            for tok in c:
                df[tok] += 1
        vs = {
            i: Counter({t: n for t, n in c.items() if df[t] <= max_df})
            for i, c in vs.items()
        }
        vs = {i: c for i, c in vs.items() if c}
    return vs


def _cos(a, b):
    dot = sum(a[t] * b[t] for t in a if t in b)
    if dot == 0:
        return 0.0
    na = math.sqrt(float(sum(v * v for v in a.values())))
    nb = math.sqrt(float(sum(v * v for v in b.values())))
    return float(dot) / (na * nb)


class TestSparseCosine:
    def test_pairs_match_python(self, spark):
        df = spark.createDataFrame(DOCS, ["doc_id", "text"])
        got = {
            (r["id_a"], r["id_b"]): r["cosine"]
            for r in S.sparse_cosine_pairs(
                df, "doc_id", "text", min_cosine=0.3, max_df=None
            ).collect()
        }
        vs = _vecs(DOCS)
        exp = {}
        ids = sorted(vs)
        for i in ids:
            for j in ids:
                if i < j:
                    c = _cos(vs[i], vs[j])
                    if c >= 0.3:
                        exp[(i, j)] = c
        assert set(got) == set(exp)
        for k in exp:
            assert got[k] == pytest.approx(exp[k], rel=1e-15)

    def test_exact_dup_cosine_one(self, spark):
        df = spark.createDataFrame(DOCS, ["doc_id", "text"])
        got = {
            (r["id_a"], r["id_b"]): r["cosine"]
            for r in S.sparse_cosine_pairs(
                df, "doc_id", "text", min_cosine=0.999, max_df=None
            ).collect()
        }
        assert got[(1, 2)] == pytest.approx(1.0)
        assert got[(4, 5)] == pytest.approx(1.0)

    def test_max_df_prunes_stop_tokens(self, spark):
        docs = [(i, f"common uniq{i}") for i in range(10)]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        # 'common' appears in 10 docs; with max_df=5 it is pruned and no
        # pair shares a token
        out = S.sparse_cosine_pairs(
            df, "doc_id", "text", min_cosine=0.01, max_df=5
        ).collect()
        assert out == []
        # without the prune every pair matches on 'common'
        out2 = S.sparse_cosine_pairs(
            df, "doc_id", "text", min_cosine=0.01, max_df=None
        ).collect()
        assert len(out2) == 45

    def test_topk_ranking(self, spark):
        df = spark.createDataFrame(DOCS, ["doc_id", "text"])
        rows = S.sparse_cosine_topk(
            df, "doc_id", "text", k=2, max_df=None
        ).collect()
        per = {}
        for r in rows:
            per.setdefault(r["doc_id"], []).append(r)
        for doc, rs in per.items():
            assert len(rs) <= 2
            ranks = sorted(r["rank"] for r in rs)
            assert ranks == list(range(1, len(rs) + 1))
            srt = sorted(rs, key=lambda r: (-r["cosine"], r["neighbor_id"]))
            assert [r["rank"] for r in srt] == ranks
        # doc 1's nearest is its exact dup 2
        assert per[1][0]["neighbor_id"] in (2, 3)
        top1 = min(per[1], key=lambda r: r["rank"])
        assert top1["neighbor_id"] == 2

    def test_token_vectors_df_prune(self, spark):
        df = spark.createDataFrame(DOCS, ["doc_id", "text"])
        tv = S.token_vectors(df, "doc_id", "text", max_df=2)
        toks = {r["tok"] for r in tv.collect()}
        # apple/banana appear in 3 docs -> pruned; cherry in 2 -> kept
        assert "apple" not in toks and "banana" not in toks
        assert "cherry" in toks and "zebra" in toks
