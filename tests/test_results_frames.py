"""Contract tests for dataclass -> DataFrame conversions (A13-A16), mirroring
the reference's round-trip canaries (/root/reference/tests/test_scan.py:379-495).
The output StructTypes are the compatibility contract (SURVEY §1.3).
"""

from __future__ import annotations

from pyspark.sql import Row

from soda_spark_spark import GroupValue, Measurement, ScanError
from soda_spark_spark import Test as QTest
from soda_spark_spark import TestExecutionScanError
from soda_spark_spark import TestResult as QTestResult
from soda_spark_spark import (
    measurements_to_data_frame,
    scan_errors_to_data_frame,
)
from soda_spark_spark import test_results_to_data_frame as results_to_frame
from soda_spark_spark.results import (
    MEASUREMENT_SCHEMA,
    SCAN_ERROR_SCHEMA,
    TEST_RESULT_SCHEMA,
)


def test_measurement_with_group_values_round_trip(spark):
    """Grouped metric shape from the reference
    (tests/test_scan.py:404-413): value=None, one GroupValue."""
    measurements = [
        Measurement(
            metric="values_count",
            column_name="officename",
            value=None,
            group_values=[GroupValue(group={"statename": "statename"}, value="9872")],
        )
    ]
    out = measurements_to_data_frame(measurements, spark)
    assert out.schema == MEASUREMENT_SCHEMA
    row = out.first()
    assert row.metric == "values_count"
    assert row.value is None
    assert row.group_values == [Row(group={"statename": "statename"}, value="9872")]


def test_measurement_value_stringification(spark):
    ms = [
        Measurement("row_count", None, 6),
        Measurement("avg", "c", 3.5),
        Measurement("flag", "c", True),
        Measurement("mins", "c", [1, 2]),
    ]
    vals = [r.value for r in measurements_to_data_frame(ms, spark).collect()]
    assert vals == ["6", "3.5", "true", "[1, 2]"]


def test_test_result_round_trip(spark):
    """All-fields TestResult (reference tests/test_scan.py:448-464), incl.
    int values stringified into the map<string,string>."""
    trs = [
        QTestResult(
            QTest(
                id="id",
                title="title",
                expression="expression",
                metrics=["metrics"],
                column="column",
                source="source",
            ),
            passed=True,
            skipped=False,
            values={"value": 10},
            error="exception",
            group_values={"group": "by"},
        )
    ]
    out = results_to_frame(trs, spark)
    assert out.schema == TEST_RESULT_SCHEMA
    row = out.first()
    assert row.test == Row(
        id="id", title="title", expression="expression",
        metrics=["metrics"], column="column", source="source",
    )
    assert row.values == {"value": "10"}
    assert row.group_values == {"group": "by"}


def test_scan_error_round_trip(spark):
    """The reference's error fixture verbatim (tests/test_scan.py:488-493)."""
    errs = [
        TestExecutionScanError(
            message='Test "metric_name > 30" failed',
            exception="name 'metric_name' is not defined",
        )
    ]
    out = scan_errors_to_data_frame(errs, spark)
    assert out.schema == SCAN_ERROR_SCHEMA
    row = out.first()
    assert row.message == 'Test "metric_name > 30" failed'
    assert row.exception == "name 'metric_name' is not defined"


def test_empty_lists_produce_empty_frames_with_schema(spark):
    assert measurements_to_data_frame([], spark).count() == 0
    assert results_to_frame([], spark).count() == 0
    e = scan_errors_to_data_frame([], spark)
    assert e.count() == 0 and len(e.columns) == 2
