"""Unit tests for similarity search: brute force (fold + numpy), LSH recall."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from soda_spark_spark.operators.similarity import (
    brute_force_topk,
    brute_force_topk_numpy,
    cosine_similarity,
    exact_near_dup_pairs,
    lsh_topk,
)

DIM = 16


@pytest.fixture(scope="module")
def vectors(spark):
    rng = random.Random(7)
    rows = []
    # 3 well-separated cluster centers + jittered members
    centers = [[rng.gauss(0, 1) for _ in range(DIM)] for _ in range(3)]
    vid = 0
    for c in centers:
        for _ in range(20):
            rows.append((vid, [x + rng.gauss(0, 0.05) for x in c]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_cosine_expression(spark):
    df = spark.createDataFrame([([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 1.0])], "a array<double>, b array<double>")
    out = [r.c for r in df.select(cosine_similarity(F.col("a"), F.col("b")).alias("c")).collect()]
    assert out[0] == pytest.approx(0.0)
    assert out[1] == pytest.approx(1.0)


def test_brute_force_topk_finds_cluster_members(vectors):
    queries = vectors.filter(F.col("vec_id") == 0)
    out = brute_force_topk(vectors, queries, k=5).collect()
    assert len(out) == 5
    # all neighbors of vector 0 come from its own cluster (ids 0..19)
    assert all(r.neighbor_id < 20 and r.neighbor_id != 0 for r in out)
    assert all(r.cosine > 0.9 for r in out)


def test_numpy_path_matches_fold_path(vectors):
    queries = vectors.filter(F.col("vec_id").isin(0, 25, 55))
    a = {(r.query_id, r.neighbor_id) for r in brute_force_topk(vectors, queries, k=7).collect()}
    b = {(r.query_id, r.neighbor_id) for r in brute_force_topk_numpy(vectors, queries, k=7).collect()}
    assert a == b


def test_lsh_topk_recall(vectors):
    """LSH recall@5 vs brute force on clustered data should be near 1."""
    queries = vectors.filter(F.col("vec_id").isin(0, 25, 55))
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(vectors, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in lsh_topk(vectors, queries, dim=DIM, k=5, planes=6, tables=6).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"LSH recall {recall}"


def test_ivf_topk_recall(vectors):
    from soda_spark_spark.operators.similarity import ivf_topk

    queries = vectors.filter(F.col("vec_id").isin(0, 25, 55))
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(vectors, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(vectors, queries, k=5, n_lists=4, n_probe=2).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"IVF recall {recall}"


def test_exact_near_dup_pairs(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.999, 0.01]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    pairs = exact_near_dup_pairs(df, threshold=0.95).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}


def test_topk_excludes_self(vectors):
    queries = vectors.filter(F.col("vec_id") == 0)
    out = brute_force_topk(vectors, queries, k=59).collect()
    assert all(r.neighbor_id != 0 for r in out)
    assert len(out) == 59  # everything except self


def test_ivf_deterministic_finds_cluster_members(vectors):
    from soda_spark_spark.operators.similarity import ivf_topk_deterministic

    queries = vectors.filter(F.col("vec_id") == 0)
    out = ivf_topk_deterministic(vectors, queries, k=5, n_lists=6, n_probe=3).collect()
    assert len(out) == 5
    # clustered data: probing the nearest lists recovers own-cluster members
    assert all(r.neighbor_id < 20 and r.neighbor_id != 0 for r in out)


def test_ivf_deterministic_is_deterministic(vectors):
    from soda_spark_spark.operators.similarity import ivf_topk_deterministic

    queries = vectors.filter(F.col("vec_id").isin(0, 25))
    run = lambda: sorted(
        (r.query_id, r.neighbor_id, round(r.cosine, 12))
        for r in ivf_topk_deterministic(
            vectors, queries, k=4, n_lists=6, n_probe=2
        ).collect()
    )
    assert run() == run()


def test_knn_join_matches_broadcast_lsh_topk(vectors):
    from soda_spark_spark.operators.similarity import knn_join_lsh, lsh_topk

    kw = dict(dim=DIM, k=4, planes=6, tables=4, seed=42)
    a = sorted(
        (r.query_id, r.neighbor_id, round(r.cosine, 12))
        for r in lsh_topk(vectors, vectors, **kw).collect()
    )
    b = sorted(
        (r.query_id, r.neighbor_id, round(r.cosine, 12))
        for r in knn_join_lsh(vectors, vectors, **kw).collect()
    )
    assert a == b and len(a) > 0


def test_knn_join_plan_has_no_broadcast(vectors):
    from soda_spark_spark.operators.similarity import knn_join_lsh

    out = knn_join_lsh(vectors, vectors, dim=DIM, k=3, planes=6, tables=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan


def test_knn_join_bucket_cap_bounds_candidates(vectors):
    from soda_spark_spark.operators.similarity import knn_join_lsh

    out = knn_join_lsh(
        vectors, vectors, dim=DIM, k=4, planes=2, tables=1, max_bucket_size=5
    ).collect()
    # with <=5 corpus rows surviving per bucket, no query can exceed 5
    # candidates (minus self) — cap is enforced, results still ranked
    per_q = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append(r.cosine)
    assert all(len(v) <= 4 for v in per_q.values())
    assert all(v == sorted(v, reverse=True) for v in per_q.values())


def test_quantize_embeddings_roundtrip_and_edges(spark):
    from soda_spark_spark.operators.similarity import quantize_embeddings

    vecs = [
        (1, [1.0, -0.5, 0.25, 0.0]),
        (2, [0.0, 0.0]),          # all-zero -> scale 0, zeros
        (3, [-2.0]),              # negative max magnitude
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    rows = {
        r["vec_id"]: r
        for r in quantize_embeddings(df, "vec_id", "embedding").collect()
    }
    r1 = rows[1]
    assert abs(r1["scale"] - 1.0 / 127) < 1e-15
    assert r1["qvec"] == [127, -63, 32, 0]  # floor(v/scale + 0.5)
    assert rows[2]["scale"] == 0.0 and rows[2]["qvec"] == [0, 0]
    assert rows[3]["qvec"] == [-127]
    # dequantization error bounded by scale/2 per element
    deq = [q * r1["scale"] for q in r1["qvec"]]
    for got, want in zip(deq, [1.0, -0.5, 0.25, 0.0]):
        assert abs(got - want) <= r1["scale"] / 2 + 1e-12


def test_quantize_embeddings_kernel_matches_catalyst(spark):
    """Bit-parity between the numpy mapInPandas kernel (default) and the
    pure-Catalyst oracle path, including edge shapes: mixed dims, all-zero,
    empty, null vectors, exact .5 boundaries."""
    from soda_spark_spark.operators.similarity import quantize_embeddings

    rows = [
        (1, [1.0, -0.5, 0.25, 0.0]),
        (2, [0.0, 0.0]),
        (3, [-2.0]),
        (4, []),
        (5, None),
        (6, [0.5, 1.0, -1.0, 0.75, 0.3]),   # different dim than row 1
        (7, [127.0, -64.0, 63.5]),          # .5 floor boundary after scaling
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def _get(impl):
        return {
            r["vec_id"]: (r["scale"], None if r["qvec"] is None else list(r["qvec"]))
            for r in quantize_embeddings(
                df, "vec_id", "embedding", impl=impl
            ).collect()
        }

    kernel, catalyst = _get("kernel"), _get("catalyst")
    assert kernel == catalyst
    assert kernel[5] == (0.0, None) and kernel[4] == (0.0, [])

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown impl"):
        quantize_embeddings(df, "vec_id", "embedding", impl="nope")


def test_quantize_embeddings_kernel_matches_catalyst_on_corpus(spark):
    """Same parity over the real embeddings table (float32 values, fixed
    dims) — the production shape."""
    from soda_spark_spark.operators.similarity import quantize_embeddings

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    def _collect(impl):
        return sorted(
            (r["vec_id"], r["scale"], tuple(r["qvec"]))
            for r in quantize_embeddings(df, "vec_id", "embedding", impl=impl).collect()
        )

    assert _collect("kernel") == _collect("catalyst")


def test_ivf_index_roundtrip_matches_direct(spark, tmp_path):
    """ivf_topk served from a persisted ivf_index equals the direct
    fit-per-call path (same seed -> same centroids -> same result)."""
    from soda_spark_spark.operators.similarity import ivf_index, ivf_topk

    corpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = corpus.filter(F.col("vec_id") < 4)

    direct = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(corpus, queries, k=5, n_lists=8, n_probe=3).collect()
    }
    path = str(tmp_path / "ivf")
    ivf_index(corpus, n_lists=8).write.parquet(path)
    idx = spark.read.parquet(path)
    served = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(None, queries, k=5, n_probe=3, index=idx).collect()
    }
    assert served == direct and len(served) == 4 * 5

    import pytest as _pytest

    with _pytest.raises(ValueError, match="corpus is required"):
        ivf_topk(None, queries)
    bad = spark.createDataFrame([(1,)], "vec_id long")
    with _pytest.raises(ValueError, match="missing column"):
        ivf_topk(None, queries, index=bad)


def test_ivf_assign_appends_to_existing_lists(spark, tmp_path):
    """New vectors route to the nearest existing centroid and the
    appended index serves queries including the new vectors."""
    import numpy as np

    from soda_spark_spark.operators.similarity import (
        ivf_assign, ivf_index, ivf_topk,
    )

    corpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    old = corpus.filter(F.col("vec_id") % 5 != 0)
    new = corpus.filter(F.col("vec_id") % 5 == 0)

    path = str(tmp_path / "ivf")
    ivf_index(old, n_lists=8).write.mode("append").parquet(path)
    idx = spark.read.parquet(path)

    appended = ivf_assign(new, idx)
    assert appended.columns == ["vec_id", "list", "embedding", "is_centroid"]
    # verify one routed vector against a numpy nearest-centroid check
    cents = sorted(
        idx.filter(F.col("is_centroid")).select("list", "embedding").collect(),
        key=lambda r: r["list"],
    )
    C = np.array([r["embedding"] for r in cents], dtype=np.float64)
    row = appended.orderBy("vec_id").first()
    v = np.array(
        new.filter(F.col("vec_id") == row["vec_id"]).first()["embedding"],
        dtype=np.float64,
    )
    assert int(np.argmin(((C - v) ** 2).sum(axis=1))) == row["list"]

    appended.write.mode("append").parquet(path)
    full_idx = spark.read.parquet(path)
    assert full_idx.filter(~F.col("is_centroid")).count() == corpus.count()
    queries = corpus.filter(F.col("vec_id") < 2)
    out = ivf_topk(None, queries, k=3, n_probe=8, index=full_idx)
    assert out.count() == 2 * 3


# ---------------------------------------------------------------------------
# semantic_dedup (SemDeDup)
# ---------------------------------------------------------------------------


def test_semantic_dedup_drops_higher_id_near_dups(spark):
    from soda_spark_spark.operators.similarity import semantic_dedup

    # Two orthogonal directions -> two clusters. Within cluster 0: ids
    # 0 (centroid), 2, 4 are near-identical; within cluster 1: ids 1
    # (centroid), 3 are near-identical; id 5 = [-1, .05, 0] lands in
    # cluster 1 (Euclidean distance^2 1.90 vs 4.00 — assignment is by
    # distance, not cosine) where its cosine to every member is ~0.05,
    # so it survives.
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (2, [0.99, 0.01, 0.0]),
        (3, [0.01, 0.99, 0.0]),
        (4, [1.0, 0.001, 0.0]),
        (5, [-1.0, 0.05, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(df, n_clusters=2, threshold=0.95)
    kept = {r.vec_id: r.cluster_id for r in out.collect()}
    # 2 and 4 are >=0.95-similar to lower-id 0; 3 to lower-id 1
    assert set(kept) == {0, 1, 5}
    assert kept[0] == 0 and kept[5] == 1 and kept[1] == 1
    assert all(not r.cluster_capped for r in out.collect())


def test_semantic_dedup_cluster_cap_is_conservative(spark):
    from soda_spark_spark.operators.similarity import semantic_dedup

    # All six vectors nearly identical -> one cluster of 6 exact dups.
    rows = [(i, [1.0, float(i) * 1e-4, 0.0]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    uncapped = semantic_dedup(df, n_clusters=1, threshold=0.9)
    assert {r.vec_id for r in uncapped.collect()} == {0}
    capped = semantic_dedup(df, n_clusters=1, threshold=0.9, max_cluster_size=3)
    got = capped.collect()
    # cap exceeded -> dedup skipped, ALL members kept and flagged
    assert {r.vec_id for r in got} == {0, 1, 2, 3, 4, 5}
    assert all(r.cluster_capped for r in got)


def test_semantic_dedup_pair_work_is_cluster_local(spark):
    from soda_spark_spark.operators.similarity import semantic_dedup

    # Cross-cluster near-dups are NOT candidates: identical vectors that
    # land in different clusters both survive (the SemDeDup trade).
    rows = [
        (0, [1.0, 0.0]),   # centroid of cluster 0
        (1, [0.0, 1.0]),   # centroid of cluster 1
        (2, [0.72, 0.70]), # nearest to cluster 0
        (3, [0.70, 0.72]), # nearest to cluster 1, ~0.999 cosine to id 2
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(df, n_clusters=2, threshold=0.95)
    assert {r.vec_id for r in out.collect()} == {0, 1, 2, 3}


def test_semantic_dedup_kernel_matches_catalyst(spark, vectors):
    from soda_spark_spark.operators.similarity import semantic_dedup

    kwargs = dict(n_clusters=3, threshold=0.98)
    cat = sorted(
        (r.vec_id, r.cluster_id, r.cluster_capped)
        for r in semantic_dedup(vectors, impl="catalyst", **kwargs).collect()
    )
    ker = sorted(
        (r.vec_id, r.cluster_id, r.cluster_capped)
        for r in semantic_dedup(vectors, impl="kernel", **kwargs).collect()
    )
    assert cat == ker
    assert 0 < len(ker) < vectors.count()  # some dedup actually happened


def test_semantic_dedup_kernel_cap_and_empty(spark):
    from soda_spark_spark.operators.similarity import semantic_dedup

    rows = [(i, [1.0, float(i) * 1e-4]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    capped = semantic_dedup(
        df, n_clusters=1, threshold=0.9, max_cluster_size=3, impl="kernel"
    ).collect()
    assert {r.vec_id for r in capped} == {0, 1, 2, 3, 4, 5}
    assert all(r.cluster_capped for r in capped)
    empty = df.filter("vec_id < 0")
    assert semantic_dedup(empty, n_clusters=2, impl="kernel").count() == 0


# ---------------------------------------------------------------------------
# kmeans_exact
# ---------------------------------------------------------------------------


def test_kmeans_exact_separates_obvious_clusters(spark):
    from soda_spark_spark.operators.similarity import kmeans_exact

    rows = ([(i, [100 + (i % 3), 0]) for i in range(10)]
            + [(100 + i, [-100 - (i % 3), 50]) for i in range(10)])
    df = spark.createDataFrame(rows, "id long, v array<int>")
    a, c = kmeans_exact(df, "id", "v", 2, n_iter=3)
    got = {r.id: r.cluster for r in a.collect()}
    left = {got[i] for i in range(10)}
    right = {got[100 + i] for i in range(10)}
    assert len(left) == 1 and len(right) == 1 and left != right
    cents = {r.cluster: list(r.centroid) for r in c.collect()}
    assert len(cents) == 2
    # centroids land on the floored per-dim means of their members
    for cid, cent in cents.items():
        members = [v for (i, v) in rows if got[i] == cid]
        for d in range(2):
            s = sum(m[d] for m in members)
            assert cent[d] == s // len(members)


def test_kmeans_exact_empty_cluster_keeps_centroid(spark):
    from soda_spark_spark.operators.similarity import kmeans_exact

    # k=3 over 2 distinct points: one centroid never wins a member and
    # must carry its init vector through every iteration unchanged
    df = spark.createDataFrame(
        [(1, [0, 0]), (2, [0, 0]), (3, [10, 10])], "id long, v array<int>")
    a, c = kmeans_exact(df, "id", "v", 3, n_iter=2)
    cents = {r.cluster: list(r.centroid) for r in c.collect()}
    assert cents[1] == [0, 0]  # init = vec of id 2, orphaned by cluster 0 ties
    got = {r.id: r.cluster for r in a.collect()}
    assert got[1] == got[2] != got[3]


def test_kmeans_exact_validation(spark):
    import pytest

    from soda_spark_spark.operators.similarity import kmeans_exact

    df = spark.createDataFrame([(1, [1, 2])], "id long, v array<int>")
    with pytest.raises(ValueError, match="k must"):
        kmeans_exact(df, "id", "v", 0)
    with pytest.raises(ValueError, match="n_iter"):
        kmeans_exact(df, "id", "v", 1, n_iter=-1)
    empty = spark.createDataFrame([], "id long, v array<int>")
    with pytest.raises(ValueError, match="no non-null"):
        kmeans_exact(empty, "id", "v", 2)
    # n_iter=0: assignment under the raw init centroids, still total
    a, _ = kmeans_exact(df, "id", "v", 1, n_iter=0)
    assert a.count() == 1


def test_kmeans_exact_kernel_catalyst_bit_parity(spark):
    """Assignment kernels must agree to the last tie AND distance: int8
    values keep every float64 intermediate exact, so this is equality,
    not tolerance."""
    import random

    from soda_spark_spark.operators.similarity import kmeans_exact

    rng = random.Random(5)
    rows = [(i, [rng.randint(-127, 127) for _ in range(16)]) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, v array<int>")
    ak, ck = kmeans_exact(df, "id", "v", 7, n_iter=2, impl="kernel")
    ac, cc = kmeans_exact(df, "id", "v", 7, n_iter=2, impl="catalyst")
    assert ak.exceptAll(ac).count() == 0 and ac.exceptAll(ak).count() == 0
    assert sorted(map(tuple, ck.collect())) == sorted(map(tuple, cc.collect()))
    with pytest_raises_value_error():
        kmeans_exact(df, "id", "v", 2, impl="nope")


def pytest_raises_value_error():
    import pytest

    return pytest.raises(ValueError, match="unknown impl")


def test_semantic_layout_key_groups_related_docs(spark):
    """Same-topic docs must land in one contiguous sem_key run; the id
    guard trips on out-of-range ids."""
    import pytest as _pt

    from soda_spark_spark.operators.similarity import semantic_layout_key

    topic_a = [(i, "apple banana fruit salad sweet " * 3) for i in range(5)]
    topic_b = [(i, "kernel compiler register opcode bit " * 3)
               for i in range(10, 15)]
    df = spark.createDataFrame(topic_a + topic_b, "doc_id long, text string")
    rows = semantic_layout_key(df, "doc_id", "text", dim=16, k=2).collect()
    by_doc = {r.doc_id: r for r in rows}
    ca = {by_doc[i].cluster for i, _ in topic_a}
    cb = {by_doc[i].cluster for i, _ in topic_b}
    assert len(ca) == 1 and len(cb) == 1 and ca != cb
    # sem_key order is cluster-major: sorting by it separates topics
    order = [r.doc_id for r in sorted(rows, key=lambda r: r.sem_key)]
    a_pos = [order.index(i) for i, _ in topic_a]
    assert max(a_pos) - min(a_pos) == len(topic_a) - 1  # contiguous run
    for r in rows:
        assert r.sem_key == r.cluster * (1 << 40) + r.doc_id
    bad = spark.createDataFrame([(1 << 41, "some text here")],
                                "doc_id long, text string")
    with _pt.raises(Exception, match="2\\^40"):
        semantic_layout_key(bad, "doc_id", "text", dim=8, k=1).collect()
