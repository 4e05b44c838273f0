"""Product-quantization ANN: codebook contract, encode impl parity,
ADC correctness vs an independent reference, recall sanity vs exact
search, and guardrails."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from soda_spark_spark.operators.similarity import (
    pq_encode,
    pq_search,
    pq_train,
)


def _vectors(n=60, dim=16, seed=3):
    rng = np.random.RandomState(seed)
    return [(i, [int(x) for x in rng.randint(-127, 128, dim)])
            for i in range(n)]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        _vectors(), "vec_id long, qvec array<long>"
    ).cache()


@pytest.fixture(scope="module")
def codebook(corpus):
    return pq_train(corpus, "vec_id", "qvec", m=4, k=4, n_iter=1,
                    impl="catalyst").cache()


def test_codebook_shape(codebook):
    rows = codebook.collect()
    assert len(rows) == 4 * 4  # m * k
    assert {r.subspace for r in rows} == {0, 1, 2, 3}
    assert all(len(r.centroid) == 4 for r in rows)  # dim/m


def test_encode_impl_parity(corpus, codebook):
    a = sorted((r.vec_id, tuple(r.codes)) for r in
               pq_encode(corpus, codebook, "vec_id", "qvec",
                         impl="catalyst").collect())
    b = sorted((r.vec_id, tuple(r.codes)) for r in
               pq_encode(corpus, codebook, "vec_id", "qvec",
                         impl="kernel").collect())
    assert a == b
    assert all(len(codes) == 4 for _, codes in a)


def test_adc_matches_independent_reference(spark, corpus, codebook):
    enc = pq_encode(corpus, codebook, "vec_id", "qvec")
    queries = corpus.filter(F.col("vec_id") < 3)
    got = sorted(tuple(r) for r in
                 pq_search(enc, codebook, queries, "vec_id", "qvec",
                           k=4).collect())
    cb = {(r.subspace, r.cluster): np.array(r.centroid)
          for r in codebook.collect()}
    codes = {r.vec_id: list(r.codes) for r in enc.collect()}
    vecs = dict(_vectors())
    exp = []
    for qid in range(3):
        qv = np.array(vecs[qid])
        ds = []
        for vid, cs in codes.items():
            tot = sum(int(((qv[s * 4:(s + 1) * 4] - cb[(s, c)]) ** 2).sum())
                      for s, c in enumerate(cs))
            ds.append((tot, vid))
        ds.sort()
        exp.extend((qid, vid, d, rk) for rk, (d, vid) in enumerate(ds[:4], 1))
    assert got == sorted(exp)


def test_recall_vs_exact_search(spark, corpus, codebook):
    # PQ is approximate; on random data the true NN should still appear
    # in the ADC top-10 most of the time. Pin a floor, not exactness.
    enc = pq_encode(corpus, codebook, "vec_id", "qvec")
    queries = corpus.filter(F.col("vec_id") < 10)
    approx = pq_search(enc, codebook, queries, "vec_id", "qvec", k=10)
    got = {}
    for r in approx.collect():
        got.setdefault(r.query_id, set()).add(r.id)
    vecs = dict(_vectors())
    hits = 0
    for qid in range(10):
        qv = np.array(vecs[qid])
        true_nn = min(
            ((int(((qv - np.array(v)) ** 2).sum()), i)
             for i, v in vecs.items()),
        )[1]
        hits += true_nn in got[qid]
    assert hits >= 6  # seed-stable; actual value pinned loosely


def test_dim_not_divisible_raises(spark):
    df = spark.createDataFrame([(1, [1, 2, 3])], "vec_id long, qvec array<long>")
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(df, "vec_id", "qvec", m=2, k=1)


def test_empty_and_bad_k(spark, corpus, codebook):
    with pytest.raises(ValueError):
        pq_search(corpus.limit(0), codebook,
                  corpus.limit(1), "vec_id", "qvec", k=0)
    empty = spark.createDataFrame([], "vec_id long, qvec array<long>")
    with pytest.raises(ValueError):
        pq_train(empty, "vec_id", "qvec", m=4, k=2)


def test_persisted_codebook_roundtrip(spark, corpus, codebook, tmp_path):
    cb_path = str(tmp_path / "cb")
    codebook.write.parquet(cb_path)
    cb2 = spark.read.parquet(cb_path)
    a = sorted((r.vec_id, tuple(r.codes)) for r in
               pq_encode(corpus, codebook, "vec_id", "qvec").collect())
    b = sorted((r.vec_id, tuple(r.codes)) for r in
               pq_encode(corpus, cb2, "vec_id", "qvec").collect())
    assert a == b


def test_search_plan_broadcasts_lookup_table(corpus, codebook):
    enc = pq_encode(corpus, codebook, "vec_id", "qvec")
    queries = corpus.filter(F.col("vec_id") < 2)
    plan = (pq_search(enc, codebook, queries, "vec_id", "qvec", k=3,
                      impl="catalyst")
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan


def test_train_impl_parity(corpus):
    for m_, k_, it in ((4, 4, 1), (2, 3, 2), (4, 2, 0)):
        a = sorted((r.subspace, r.cluster, tuple(r.centroid)) for r in
                   pq_train(corpus, "vec_id", "qvec", m=m_, k=k_,
                            n_iter=it, impl="catalyst").collect())
        b = sorted((r.subspace, r.cluster, tuple(r.centroid)) for r in
                   pq_train(corpus, "vec_id", "qvec", m=m_, k=k_,
                            n_iter=it, impl="kernel").collect())
        assert a == b, (m_, k_, it)


def test_search_impl_parity(corpus, codebook):
    enc = pq_encode(corpus, codebook, "vec_id", "qvec")
    queries = corpus.filter(F.col("vec_id") < 5)
    a = sorted(tuple(r) for r in
               pq_search(enc, codebook, queries, "vec_id", "qvec",
                         k=7, impl="catalyst").collect())
    b = sorted(tuple(r) for r in
               pq_search(enc, codebook, queries, "vec_id", "qvec",
                         k=7, impl="kernel").collect())
    assert a == b and len(a) == 5 * 7


class TestIvfPq:
    @pytest.fixture(scope="class")
    def index(self, corpus):
        from soda_spark_spark.operators.similarity import ivfpq_build

        coarse, cb, codes = ivfpq_build(
            corpus.filter(F.col("vec_id") >= 5), "vec_id", "qvec",
            n_lists=3, m=4, k=4, n_iter=1)
        return coarse.cache(), cb.cache(), codes.cache()

    def test_artifact_shapes(self, index):
        coarse, cb, codes = index
        assert coarse.count() == 3
        assert cb.count() == 4 * 4
        rows = codes.collect()
        assert len(rows) == 55  # corpus minus the 5 query vectors
        assert all(len(r.codes) == 4 and 0 <= r.list_id < 3 for r in rows)

    def test_search_matches_independent_reference(self, corpus, index):
        import numpy as np

        from soda_spark_spark.operators.similarity import ivfpq_search

        coarse, cb, codes = index
        queries = corpus.filter(F.col("vec_id") < 5)
        got = sorted(tuple(r) for r in ivfpq_search(
            codes, coarse, cb, queries, "vec_id", "qvec",
            k=3, nprobe=2).collect())
        C = {int(r.cluster): np.array(r.centroid, dtype=np.int64)
             for r in coarse.collect()}
        CB = {(r.subspace, r.cluster): np.array(r.centroid, dtype=np.int64)
              for r in cb.collect()}
        CO = {r.vec_id: (int(r.list_id), list(r.codes))
              for r in codes.collect()}
        vecs = {i: np.array(v, dtype=np.int64) for i, v in _vectors()}
        exp = []
        for qid in range(5):
            qv = vecs[qid]
            probes = [c for _, c in sorted(
                (int(((C[c] - qv) ** 2).sum()), c) for c in C)[:2]]
            cand = []
            for vid, (lid, cs) in CO.items():
                if lid not in probes:
                    continue
                rq = qv - C[lid]
                tot = sum(int(((rq[s * 4:(s + 1) * 4] - CB[(s, c)]) ** 2).sum())
                          for s, c in enumerate(cs))
                cand.append((tot, vid))
            cand.sort()
            exp.extend((qid, vid, d, rk)
                       for rk, (d, vid) in enumerate(cand[:3], 1))
        assert got == sorted(exp)

    def test_build_impl_parity(self, corpus):
        from soda_spark_spark.operators.similarity import ivfpq_build

        sub = corpus.filter(F.col("vec_id") >= 5)
        a = ivfpq_build(sub, "vec_id", "qvec", n_lists=3, m=2, k=3,
                        n_iter=1, impl="catalyst")
        b = ivfpq_build(sub, "vec_id", "qvec", n_lists=3, m=2, k=3,
                        n_iter=1, impl="kernel")
        for fa, fb in zip(a, b):
            ra = sorted(map(str, fa.collect()))
            rb = sorted(map(str, fb.collect()))
            assert ra == rb

    def test_nprobe_1_subset_of_nprobe_all(self, corpus, index):
        from soda_spark_spark.operators.similarity import ivfpq_search

        coarse, cb, codes = index
        queries = corpus.filter(F.col("vec_id") < 3)
        # k >= corpus so no truncation: probing every list must contain
        # everything a single-probe search sees, at identical distances
        full = ivfpq_search(codes, coarse, cb, queries, "vec_id", "qvec",
                            k=100, nprobe=3)
        one = ivfpq_search(codes, coarse, cb, queries, "vec_id", "qvec",
                           k=100, nprobe=1)
        fd = {(r.query_id, r.id): r.adist for r in full.collect()}
        od = {(r.query_id, r.id): r.adist for r in one.collect()}
        assert set(od) <= set(fd)
        assert all(fd[k_] == v for k_, v in od.items())

    def test_bad_params(self, corpus, index):
        from soda_spark_spark.operators.similarity import ivfpq_search

        coarse, cb, codes = index
        q = corpus.limit(1)
        with pytest.raises(ValueError):
            ivfpq_search(codes, coarse, cb, q, "vec_id", "qvec", k=0)
        with pytest.raises(ValueError):
            ivfpq_search(codes, coarse, cb, q, "vec_id", "qvec", nprobe=0)
