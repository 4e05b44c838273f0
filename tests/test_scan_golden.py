"""Golden e2e scan: replica of the reference's 6-row fixture and scan
definition (/root/reference/tests/test_scan.py:22-74,157-183), pinning the
same measurement values and the (88,4),(4,6),(0,2) output-frame shapes
(/root/reference/tests/test_scan.py:505-509).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import types as T

from soda_spark_spark import execute

SCAN_DEFINITION = """
table_name: demodata
samples:
  table_limit: 50
  failed_limit: 50
metrics:
- row_count
- missing_count
- missing_percentage
- values_count
- values_percentage
- valid_count
- valid_percentage
- invalid_count
- invalid_percentage
- min_length
- max_length
- avg_length
- min
- max
- avg
- sum
- variance
- stddev
metric_groups:
- duplicates
tests:
- row_count > 0
columns:
  id:
    valid_format: uuid
    tests:
    - invalid_percentage == 0
  feepct:
    valid_format: number_percentage
    tests:
    - invalid_percentage == 0
excluded_columns:
- date
sql_metrics:
- sql: |
    SELECT sum(size) as total_size_us
    FROM demodata
    WHERE country = 'US'
  tests:
  - total_size_us > 5000
- sql: |
    SELECT country, count(id) as country_count
    FROM demodata
    GROUP BY country
  group_fields:
  - country
"""


@pytest.fixture(scope="module")
def demodata(spark: SparkSession):
    date = dt.date(2021, 1, 1)
    uid = "a76824f0-50c0-11eb-8be8-88e9fe6293fd"
    rows = [
        (uid, "Paula Landry", 3006, date, "28,42 %", "UK"),
        (uid, "Kevin Crawford", 7243, date, "22,75 %", "NL"),
        (uid, "Kimberly Green", 6589, date, "11,92 %", "US"),
        (uid, "William Fox", 1972, date, "14,26 %", "UK"),
        (uid, "Cynthia Gonzales", 3687, date, "18,32 %", "US"),
        (uid, "Kim Brown", 1277, date, "16,37 %", "US"),
    ]
    schema = T.StructType(
        [
            T.StructField("id", T.StringType(), True),
            T.StructField("name", T.StringType(), True),
            T.StructField("size", T.IntegerType(), True),
            T.StructField("date", T.DateType(), True),
            T.StructField("feepct", T.StringType(), True),
            T.StructField("country", T.StringType(), True),
        ]
    )
    return spark.createDataFrame(rows, schema)


@pytest.fixture(scope="module")
def scan_result(demodata):
    return execute(SCAN_DEFINITION, demodata)


def test_no_errors(scan_result):
    assert not scan_result.has_errors()


@pytest.mark.parametrize(
    ("metric", "column", "value"),
    [
        ("row_count", None, 6),
        ("valid_count", "id", 6),
        ("max_length", "name", 16),
        ("sum", "size", 23774),
        ("distinct", "country", 3),
        ("missing_count", "name", 0),
        ("values_count", "feepct", 6),
        ("invalid_count", "feepct", 0),
        ("min", "size", 1277),
        ("max", "size", 7243),
        ("distinct", "id", 1),
        ("unique_count", "id", 0),
        ("duplicate_count", "id", 1),
        ("min_length", "country", 2),
    ],
)
def test_expected_measurement(scan_result, metric, column, value):
    assert scan_result.metric_value(metric, column) == value


def test_numeric_metrics_on_formatted_text(scan_result):
    # feepct "28,42 %" parses to 28.42 under number_percentage (SURVEY §2.3)
    assert scan_result.metric_value("min", "feepct") == pytest.approx(11.92)
    assert scan_result.metric_value("max", "feepct") == pytest.approx(28.42)
    assert scan_result.metric_value("sum", "feepct") == pytest.approx(112.04)


def test_avg_and_variance(scan_result):
    sizes = [3006, 7243, 6589, 1972, 3687, 1277]
    mean = sum(sizes) / len(sizes)
    var = sum((x - mean) ** 2 for x in sizes) / (len(sizes) - 1)
    assert scan_result.metric_value("avg", "size") == pytest.approx(mean)
    assert scan_result.metric_value("variance", "size") == pytest.approx(var)
    assert scan_result.metric_value("stddev", "size") == pytest.approx(var**0.5)


def test_expected_test_results(scan_result):
    by_id = {tr.test.id: tr for tr in scan_result.test_results}
    assert len(by_id) == 4

    tr = by_id['{"expression":"row_count > 0"}']
    assert tr.test.title == "test(row_count > 0)"
    assert tr.passed and not tr.skipped
    assert tr.values == {"expression_result": True, "row_count": 6} or tr.values == {
        "expression_result": 6,
        "row_count": 6,
    }

    tr = by_id['{"column":"id","expression":"invalid_percentage == 0"}']
    assert tr.test.title == "column(id) test(invalid_percentage == 0)"
    assert tr.passed
    assert tr.values["invalid_percentage"] == 0.0

    tr = by_id['{"sql_metric_index":0,"expression":"total_size_us > 5000"}']
    assert tr.test.title == "sqlmetric(0) test(total_size_us > 5000)"
    assert tr.passed
    assert tr.values["total_size_us"] == 11553


def test_excluded_column_has_no_measurements(scan_result):
    assert not any(m.column_name == "date" for m in scan_result.measurements)


def test_grouped_sql_metric(scan_result):
    m = scan_result.measurement("country_count")
    assert m is not None and m.value is None
    groups = {gv.group["country"]: gv.value for gv in m.group_values}
    assert groups == {"UK": 2, "NL": 1, "US": 3}


def test_samples_bounded(scan_result):
    assert len(scan_result.samples[("table",)]) == 6
    assert ("failed", "id") in scan_result.samples
    assert scan_result.samples[("failed", "id")] == []


def test_golden_frame_shapes(demodata):
    """The reference-pinned (88,4),(4,6),(0,2) shapes
    (/root/reference/tests/test_scan.py:505-509)."""
    frames = execute(SCAN_DEFINITION, demodata, as_frames=True)
    shapes = tuple((f.count(), len(f.columns)) for f in frames)
    assert shapes == ((88, 4), (4, 6), (0, 2))


def test_error_channel(demodata):
    """Unknown metric name -> TestExecutionScanError, scan continues
    (/root/reference/tests/test_scan.py:488-493)."""
    yml = """
table_name: demodata
metrics:
- row_count
tests:
- metric_name > 30
"""
    result = execute(yml, demodata)
    assert result.has_errors()
    err = result.errors[0]
    assert err.message == 'Test "metric_name > 30" failed'
    assert err.exception == "name 'metric_name' is not defined"
    # and the row_count measurement still exists
    assert result.metric_value("row_count") == 6
