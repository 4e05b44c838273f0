"""Per-dimension whitening of quantized embeddings
(`similarity.whiten_embeddings`)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_whiten_matches_population_moments(spark):
    from soda_spark_spark.operators.similarity import whiten_embeddings

    data = [(1, [0, 10, 5]), (2, [2, 10, 7]), (3, [4, 10, 9])]
    df = spark.createDataFrame(data, "vec_id long, qvec array<long>")
    out = {r.vec_id: r.wvec for r in whiten_embeddings(df).collect()}
    # dim 0: mean 2, var ((0+4+16) - 36/3)/3 = 8/3
    sd0 = math.sqrt((20.0 - 36.0 / 3) / 3)
    assert out[1][0] == pytest.approx((0 - 2) / sd0)
    assert out[3][0] == pytest.approx((4 - 2) / sd0)
    # dim 1 is constant -> zero variance -> 0.0, not NaN/inf
    assert [out[i][1] for i in (1, 2, 3)] == [0.0, 0.0, 0.0]
    # whitened moments: mean 0, population var 1 per informative dim
    col0 = [out[i][0] for i in (1, 2, 3)]
    assert sum(col0) == pytest.approx(0.0)
    assert sum(x * x for x in col0) / 3 == pytest.approx(1.0)


def test_whiten_null_vector_passthrough(spark):
    from soda_spark_spark.operators.similarity import whiten_embeddings

    df = spark.createDataFrame(
        [(1, [1, 3]), (2, None), (3, [3, 5])],
        "vec_id long, qvec array<long>",
    )
    out = {r.vec_id: r.wvec for r in whiten_embeddings(df).collect()}
    assert out[2] is None
    assert out[1] is not None and len(out[1]) == 2


def test_whiten_empty_frame(spark):
    from soda_spark_spark.operators.similarity import whiten_embeddings

    df = spark.createDataFrame([], "vec_id long, qvec array<long>")
    assert whiten_embeddings(df).count() == 0


def test_whiten_projection_plan_no_join(spark):
    """The transform must be a literal-broadcast projection — no Join
    node in the whitening stage."""
    from soda_spark_spark.operators.similarity import whiten_embeddings

    df = spark.range(100).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 7).cast("long"), (F.col("id") % 11).cast("long")
        ).alias("qvec"),
    )
    plan = whiten_embeddings(df)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
