"""Round-2 fixes: evaluator short-circuit, asof_join guards, no persist
leaks, grouped sql-metric column_name + truncation visibility, column-scoped
sql_metrics, sample file publishing, TestResult.skipped, boolean columns."""

from __future__ import annotations

import warnings

import pytest
from pyspark.sql import functions as F

from soda_spark_spark import execute
from soda_spark_spark.operators.dedup import (
    minhash_near_dup_pairs,
    simhash_near_dup_pairs,
)
from soda_spark_spark.operators.evaluator import safe_eval
from soda_spark_spark.operators.joins import asof_join
from soda_spark_spark.publish import InMemoryPublisher, publish


# --- evaluator short-circuit (VERDICT #3 / ADVICE) --------------------------


def test_and_short_circuits_like_python():
    # x == 0 makes the left operand falsy; 1/x must never be evaluated
    assert safe_eval("x != 0 and 1/x > 0", {"x": 0}) is False


def test_or_short_circuits_like_python():
    # left operand truthy; right operand references an undefined name
    assert safe_eval("values_count == 0 or avg > 1", {"values_count": 0}) is True


def test_or_short_circuit_skips_undefined_name():
    assert safe_eval("a == 1 or undefined_name > 0", {"a": 1}) is True


def test_boolop_returns_last_operand_like_python():
    # Python `and` returns the last operand's value, not a coerced bool
    assert safe_eval("a and b", {"a": 1, "b": 7}) == 7
    assert safe_eval("a or b", {"a": 0, "b": 7}) == 7


def test_boolop_still_raises_when_reached():
    with pytest.raises(NameError):
        safe_eval("a == 1 and missing > 0", {"a": 1})


# --- asof_join guards (VERDICT #7 / ADVICE) ---------------------------------


def test_asof_right_by_without_by_raises(spark):
    left = spark.createDataFrame([(1, 10)], "id long, t long")
    right = spark.createDataFrame([(1, 5, 99)], "rid long, t long, v long")
    with pytest.raises(ValueError, match="right_by requires by"):
        asof_join(left, right, on="t", right_by="rid")


def test_asof_keyless_no_longer_warns(spark):
    """Round 4: keyless asof over numeric/temporal time runs the
    range-bucketed distributed fill — no single-partition warning."""
    left = spark.createDataFrame([(1, 10), (2, 20)], "id long, t long")
    right = spark.createDataFrame([(5, 99), (15, 100)], "t long, v long")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        out = asof_join(left, right, on="t")
    rows = {r["id"]: r["v"] for r in out.collect()}
    assert rows == {1: 99, 2: 100}


def test_asof_keyed_does_not_warn(spark):
    left = spark.createDataFrame([(1, 10)], "k long, t long")
    right = spark.createDataFrame([(1, 5, 42)], "k long, t long, v long")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        out = asof_join(left, right, on="t", by="k")
    assert out.collect()[0]["v"] == 42


# --- persist-leak-free dedup (VERDICT #4 / ADVICE) --------------------------


def test_near_dup_paths_leave_no_cached_rdds(spark):
    df = spark.createDataFrame(
        [(i, f"the quick brown fox jumps over dog {i % 3}") for i in range(30)],
        "doc_id long, text string",
    )
    # baseline-relative: other tests' checkpointed results are released by
    # the ContextCleaner asynchronously, so the absolute count is flaky —
    # what this guards is that THESE paths cache nothing new
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    minhash_near_dup_pairs(df, "doc_id", "text", num_hashes=16, bands=4).count()
    simhash_near_dup_pairs(df, "doc_id", "text").count()
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after <= before


# --- grouped sql metric column_name + column scope (VERDICT #5) -------------


def test_column_scoped_sql_metric_sets_column_name(spark):
    """Reference output shape: Measurement(metric=..., column_name=<col>,
    group_values=[...]) for a column-scoped grouped custom metric
    (/root/reference/tests/test_scan.py:404-413)."""
    df = spark.createDataFrame(
        [("east", "a"), ("east", "b"), ("west", "c")],
        "statename string, officename string",
    )
    r = execute(
        {
            "table_name": "offices",
            "metrics": ["row_count"],
            "columns": {
                "officename": {
                    "sql_metrics": [
                        {
                            "sql": (
                                "SELECT statename, CAST(COUNT(officename) AS BIGINT)"
                                " AS values_count FROM offices GROUP BY statename"
                            ),
                            "group_fields": ["statename"],
                        }
                    ]
                }
            },
        },
        df,
    )
    m = next(m for m in r.measurements if m.metric == "values_count")
    assert m.column_name == "officename"
    groups = {gv.group["statename"]: gv.value for gv in m.group_values}
    assert groups == {"east": 2, "west": 1}


def test_column_scoped_scalar_sql_metric_feeds_column_tests(spark):
    df = spark.createDataFrame([(1,), (2,)], "size long")
    r = execute(
        {
            "table_name": "t2",
            "metrics": ["row_count"],
            "columns": {
                "size": {
                    "sql_metrics": [
                        {
                            "sql": "SELECT CAST(SUM(size) AS BIGINT) AS total_size FROM t2",
                            "tests": ["total_size == 3"],
                        }
                    ]
                }
            },
        },
        df,
    )
    m = next(m for m in r.measurements if m.metric == "total_size")
    assert m.column_name == "size" and m.value == 3
    tr = next(t for t in r.test_results if "total_size" in t.test.expression)
    assert tr.passed and tr.test.column == "size"


def test_grouped_sql_metric_truncation_is_visible(spark, monkeypatch):
    import soda_spark_spark.operators.executor as ex

    monkeypatch.setattr(ex, "GROUPED_SQL_METRIC_MAX_GROUPS", 2)
    df = spark.createDataFrame(
        [(str(i), i) for i in range(5)], "g string, v long"
    )
    r = execute(
        {
            "table_name": "t3",
            "metrics": ["row_count"],
            "sql_metrics": [
                {
                    "sql": "SELECT g, CAST(SUM(v) AS BIGINT) AS sv FROM t3 GROUP BY g",
                    "group_fields": ["g"],
                }
            ],
        },
        df,
    )
    m = next(m for m in r.measurements if m.metric == "sv")
    assert len(m.group_values) == 2
    assert any("truncated" in e.message for e in r.errors)


# --- skipped tests (VERDICT #8) ---------------------------------------------


def test_zero_group_sql_metric_test_is_skipped(spark):
    df = spark.createDataFrame([("x", 1)], "g string, v long")
    r = execute(
        {
            "table_name": "t4",
            "metrics": ["row_count"],
            "sql_metrics": [
                {
                    "sql": (
                        "SELECT g, CAST(SUM(v) AS BIGINT) AS sv FROM t4 "
                        "WHERE v > 100 GROUP BY g"
                    ),
                    "group_fields": ["g"],
                    "tests": ["sv > 0"],
                }
            ],
        },
        df,
    )
    tr = next(t for t in r.test_results if t.test.expression == "sv > 0")
    assert tr.skipped is True and tr.passed is False and tr.error is None


# --- sample file publishing (VERDICT #6) ------------------------------------


def test_publish_uploads_sample_files(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c")], "id long, name string"
    )
    r = execute(
        {
            "table_name": "s",
            "metrics": ["row_count", "missing_count"],
            "samples": {"table_limit": 2, "failed_limit": 5},
            "columns": {"name": {"valid_regex": "[ac]"}},
        },
        df,
    )
    assert r.samples  # table + failed sample sets exist
    pub = InMemoryPublisher()
    publish(r, pub, table_name="s")
    file_cmds = [c for c in pub.commands if c["type"] == "sodaSqlScanFile"]
    assert file_cmds, "expected one sodaSqlScanFile command per sample set"
    # every file command references an uploaded file (reference _upload_file
    # surface, tests/test_scan.py:134-139)
    for c in file_cmds:
        assert c["fileId"] in pub.file_uploads
        assert c["sampleType"] in ("datasetSample", "failedRowsSample")
    # uploaded data is JSON-lines of the sample rows
    table_cmd = next(c for c in file_cmds if c["sampleType"] == "datasetSample")
    data = pub.file_uploads[table_cmd["fileId"]]["data"]
    assert len(data.splitlines()) == table_cmd["stored"] == 2
    # scanEnd remains the final command
    assert pub.commands[-1]["type"] == "sodaSqlScanEnd"


def test_publish_inlines_samples_without_upload_surface(spark):
    class BarePublisher:
        def __init__(self):
            self.commands = []

        def execute_command(self, command):
            self.commands.append(command)
            return None

    df = spark.createDataFrame([(1,)], "id long")
    r = execute(
        {"table_name": "s2", "metrics": ["row_count"],
         "samples": {"table_limit": 1}},
        df,
    )
    pub = BarePublisher()
    publish(r, pub, table_name="s2")
    file_cmds = [c for c in pub.commands if c["type"] == "sodaSqlScanFile"]
    assert file_cmds and "rows" in file_cmds[0] and "fileId" not in file_cmds[0]


# --- boolean columns are scalar (ADVICE) ------------------------------------


def test_boolean_column_gets_missing_and_duplicates_metrics(spark):
    df = spark.createDataFrame(
        [(True,), (True,), (False,), (None,)], "flag boolean"
    )
    r = execute(
        {
            "table_name": "b",
            "metrics": ["row_count", "missing_count", "values_count"],
            "metric_groups": ["duplicates"],
        },
        df,
    )
    assert r.metric_value("missing_count", "flag") == 1
    assert r.metric_value("values_count", "flag") == 3
    assert r.metric_value("distinct", "flag") == 2
    assert r.metric_value("duplicate_count", "flag") == 1
    # but no numeric statistics on booleans
    assert r.measurement("avg", "flag") is None
