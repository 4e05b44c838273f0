"""OPQ-lite rotation stack: exact integer moments, eigenvalue-balanced
PCA rotation (Ge et al. 2013 parametric init), integer re-quantized
rotation pass, and the recall effect on correlated data."""

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from soda_spark_spark.operators.similarity import (
    int_moments,
    pca_rotation,
    pq_encode,
    pq_recall_report,
    pq_train,
    rotate_vectors,
)


def _correlated(n, d, rng):
    """Low-rank + noise: strong cross-dimension correlation, the shape
    raw coordinate-sliced PQ handles worst."""
    rows = []
    for i in range(n):
        z = [rng.gauss(0, 40) for _ in range(2)]
        v = [int(z[j % 2] * (1 if j < d // 2 else -1)
                 + rng.gauss(0, 4)) for j in range(d)]
        rows.append((i, v))
    return rows


@pytest.fixture(scope="module")
def corr_df(spark):
    rng = random.Random(13)
    return spark.createDataFrame(
        _correlated(800, 8, rng), "vec_id long, v array<long>"
    ).persist()


def test_int_moments_matches_numpy(spark, corr_df):
    X = np.array([r.v for r in corr_df.orderBy("vec_id").collect()],
                 dtype=np.int64)
    got = {(r.i, r.j): r.s for r in int_moments(
        corr_df, "vec_id", "v").collect()}
    d = X.shape[1]
    assert got[(-1, -1)] == len(X)
    for i in range(d):
        assert got[(i, -1)] == int(X[:, i].sum())
        for j in range(i, d):
            assert got[(i, j)] == int((X[:, i] * X[:, j]).sum())
    # exactly the upper triangle + sums + count, nothing else
    assert len(got) == d * (d + 1) // 2 + d + 1


def test_pca_rotation_orthonormal_and_deterministic(spark, corr_df):
    mom = int_moments(corr_df, "vec_id", "v")
    r1 = pca_rotation(mom, m=2)
    r2 = pca_rotation(mom, m=2)
    R1 = np.array([r.weights for r in r1.orderBy("component").collect()])
    R2 = np.array([r.weights for r in r2.orderBy("component").collect()])
    assert np.array_equal(R1, R2)  # deterministic build
    assert np.allclose(R1 @ R1.T, np.eye(len(R1)), atol=1e-9)
    with pytest.raises(ValueError, match="divisible"):
        pca_rotation(mom, m=3)


def test_rotation_balances_subspace_variance(spark, corr_df):
    """With m=2 the greedy assignment splits the two dominant
    components across the two subspaces instead of stacking them."""
    X = np.array([r.v for r in corr_df.collect()], dtype=np.float64)
    mom = int_moments(corr_df, "vec_id", "v")
    R = np.array([r.weights for r in pca_rotation(
        mom, m=2).orderBy("component").collect()])
    Y = (X - X.mean(axis=0)) @ R.T
    var = Y.var(axis=0)
    v_a, v_b = var[:4].sum(), var[4:].sum()
    assert max(v_a, v_b) / max(min(v_a, v_b), 1e-9) < 3.0
    # unbalanced reference: plain PCA order stacks both factors first
    R0 = np.array([r.weights for r in pca_rotation(
        mom, m=1).orderBy("component").collect()])
    Y0 = (X - X.mean(axis=0)) @ R0.T
    var0 = Y0.var(axis=0)
    assert var0[:4].sum() / max(var0[4:].sum(), 1e-9) > 10.0


def test_rotate_vectors_preserves_distances(spark, corr_df):
    rot = pca_rotation(int_moments(corr_df, "vec_id", "v"), m=2)
    out = {r.vec_id: np.array(r.rvec) for r in rotate_vectors(
        corr_df, rot, "vec_id", "v").collect()}
    X = {r.vec_id: np.array(r.v, dtype=np.float64)
         for r in corr_df.collect()}
    ids = sorted(out)[:40]
    for a in ids[:10]:
        for b in ids[10:20]:
            d_raw = ((X[a] - X[b]) ** 2).sum()
            d_rot = float(((out[a] - out[b]) ** 2).sum())
            # orthonormal rotation preserves L2 up to integer rounding
            assert abs(d_rot - d_raw) <= 8 * (2 * math.sqrt(d_raw) + 8)


def test_rotation_improves_pq_recall(spark, corr_df):
    """The point of the whole stack: same m/k code budget, higher
    recall after the balanced rotation on correlated data."""
    queries = corr_df.filter(F.col("vec_id") < 40)

    def recall(vec_df, col):
        cb = pq_train(vec_df, "vec_id", col, m=2, k=16, n_iter=2)
        enc = pq_encode(vec_df, cb, "vec_id", col)
        rep = pq_recall_report(
            vec_df, enc, cb, vec_df.filter(F.col("vec_id") < 40),
            "vec_id", col, k=10,
        ).agg(F.avg("recall_ppm")).first()[0]
        return rep

    raw = recall(corr_df, "v")
    rot = pca_rotation(int_moments(corr_df, "vec_id", "v"), m=2)
    rotated = rotate_vectors(corr_df, rot, "vec_id", "v").persist()
    bal = recall(rotated, "rvec")
    assert bal > raw, (raw, bal)
    rotated.unpersist()
