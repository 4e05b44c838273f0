"""Feature-level scan tests beyond the golden fixture: missing-values
variants, profiling metrics, approx mode, variables, streaming scans.
(FIXTURES.md 'variant fixtures' section.)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from soda_spark_spark import execute
from soda_spark_spark.streaming import scan_stream


@pytest.fixture(scope="module")
def missing_df(spark):
    rows = []
    for i in range(20):
        rows.append(
            (
                i,
                None if i % 5 == 0 else f"name{i}",  # 4 missing
                None if i % 4 == 0 else float(i),    # 5 missing
            )
        )
    return spark.createDataFrame(rows, "id long, name string, val double")


def test_missing_metrics(missing_df):
    r = execute(
        {"table_name": "t",
         "metrics": ["row_count", "missing_count", "missing_percentage",
                     "values_count", "values_percentage"]},
        missing_df,
    )
    assert r.metric_value("missing_count", "name") == 4
    assert r.metric_value("missing_percentage", "name") == pytest.approx(20.0)
    assert r.metric_value("values_count", "val") == 15
    assert r.metric_value("values_percentage", "val") == pytest.approx(75.0)


def test_invalid_rows_fail_test_and_sample(spark):
    df = spark.createDataFrame(
        [(1, "a76824f0-50c0-11eb-8be8-88e9fe6293fd"), (2, "bogus"), (3, None)],
        "id long, uid string",
    )
    r = execute(
        {"table_name": "t",
         "metrics": ["valid_count", "invalid_count", "invalid_percentage"],
         "samples": {"failed_limit": 10},
         "columns": {"uid": {"valid_format": "uuid",
                             "tests": ["invalid_percentage == 0"]}}},
        df,
    )
    assert r.metric_value("valid_count", "uid") == 1
    assert r.metric_value("invalid_count", "uid") == 1  # null is missing, not invalid
    tr = r.test_results[0]
    assert not tr.passed
    failed = r.samples[("failed", "uid")]
    assert {row.id for row in failed} == {2, 3}  # invalid + missing rows


def test_profiling_metrics(spark):
    df = spark.createDataFrame(
        [(v,) for v in [1, 1, 1, 2, 2, 3, 4, 5, 6, 7]], "v int"
    )
    r = execute(
        {"table_name": "t", "metric_groups": ["profiling"],
         "profiling_limit": 3, "histogram_buckets": 3},
        df,
    )
    fv = r.metric_value("frequent_values", "v")
    assert fv[0] == {"value": 1, "frequency": 3}
    assert fv[1] == {"value": 2, "frequency": 2}
    assert r.metric_value("mins", "v") == [1, 2, 3]
    assert r.metric_value("maxs", "v") == [7, 6, 5]
    h = r.metric_value("histogram", "v")
    assert h["frequencies"] == [5, 2, 3] and len(h["boundaries"]) == 4


def test_approx_distinct_mode(spark):
    df = spark.createDataFrame([(i % 100,) for i in range(1000)], "v int")
    r = execute(
        {"table_name": "t", "metrics": ["distinct"], "approx_distinct": True},
        df,
    )
    # approx_count_distinct within its default ~2.3% rsd (and no groupBy pass)
    assert abs(r.metric_value("distinct", "v") - 100) <= 10


def test_variables_substitution(spark):
    df = spark.createDataFrame([(1,), (2,), (3,)], "v int")
    yml = """
table_name: t
metrics: [row_count]
tests:
- row_count > ${min_rows}
"""
    r = execute(yml, df, variables={"min_rows": 2})
    assert r.test_results[0].passed
    r = execute(yml, df, variables={"min_rows": 5})
    assert not r.test_results[0].passed


def test_excluded_columns_prune_aggregates(spark):
    df = spark.createDataFrame([(1, "x")], "a int, b string")
    r = execute(
        {"table_name": "t", "metrics": ["missing_count"], "excluded_columns": ["b"]},
        df,
    )
    assert r.metric_value("missing_count", "a") == 0
    assert r.measurement("missing_count", "b") is None


def test_scan_result_metrics_namespace_in_column_tests(spark):
    """Column tests can reference table metrics (row_count) too."""
    df = spark.createDataFrame([(1,), (None,)], "v int")
    r = execute(
        {"table_name": "t", "metrics": ["row_count", "missing_count"],
         "columns": {"v": {"tests": ["missing_count < row_count"]}}},
        df,
    )
    assert r.test_results[0].passed


def test_streaming_scan_foreachbatch(spark, tmp_path):
    """scan_stream reuses the batch compiler per micro-batch."""
    df = spark.createDataFrame([(i, float(i)) for i in range(50)], "id long, v double")
    src = str(tmp_path / "src")
    df.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    results = []
    q = scan_stream(
        stream,
        {"table_name": "s", "metrics": ["row_count", "missing_count"],
         "tests": ["row_count > 0"]},
        lambda bid, res: results.append(res),
        trigger={"availableNow": True},
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(60)
    assert len(results) == 1
    assert results[0].metric_value("row_count") == 50
    assert results[0].test_results[0].passed
