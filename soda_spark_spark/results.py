"""Result data model: Measurement / TestResult / ScanError / ScanResult.

The dataclasses and the fixed output DataFrame schemas are the compatibility
contract with the reference (`/root/reference/src/sodaspark/scan.py:306-326`
measurements, `:343-370` test results, `:387-395` scan errors). Values of any
type are stringified into the DataFrame `value` columns while the Python
objects keep their native types, matching the reference's behavior.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


@dataclass
class GroupValue:
    """One group of a grouped metric (reference scan.py:306-326 `group_values`)."""

    group: dict[str, Any]
    value: Any


@dataclass
class Measurement:
    """A single metric observation (reference scan.py:292-326)."""

    metric: str
    column_name: str | None = None
    value: Any = None
    group_values: list[GroupValue] | None = None


@dataclass
class Test:
    """Identity of a declared test (reference scan.py:343-370 `test` struct)."""

    __test__ = False  # not a pytest class

    id: str
    title: str
    expression: str
    metrics: list[str] | None = None
    column: str | None = None
    source: str | None = None


@dataclass
class TestResult:
    """Outcome of one test evaluation (reference scan.py:329-370)."""

    __test__ = False  # not a pytest class

    test: Test
    passed: bool
    skipped: bool = False
    values: dict[str, Any] | None = None
    error: str | None = None
    group_values: dict[str, Any] | None = None


@dataclass
class ScanError:
    """A scan-level error (reference scan.py:373-395)."""

    message: str
    exception: str | None = None


class TestExecutionScanError(ScanError):
    """Error raised while evaluating a test expression
    (reference tests/test_scan.py:488-493)."""

    __test__ = False  # not a pytest class


@dataclass
class ScanResult:
    """All outputs of one scan (reference scan.py:398-421), plus samples."""

    measurements: list[Measurement] = field(default_factory=list)
    test_results: list[TestResult] = field(default_factory=list)
    errors: list[ScanError] = field(default_factory=list)
    # extension: bounded sample rows keyed by ("table",) or ("failed", column)
    samples: dict[tuple, list] = field(default_factory=dict)
    # scan metadata (reference C3/C4): set by api.execute
    scan_time: str | None = None
    warehouse_name: str | None = None

    def has_errors(self) -> bool:
        return bool(self.errors)

    def measurement(self, metric: str, column_name: str | None = None) -> Measurement | None:
        for m in self.measurements:
            if m.metric == metric and m.column_name == column_name:
                return m
        return None

    def metric_value(self, metric: str, column_name: str | None = None) -> Any:
        m = self.measurement(metric, column_name)
        return None if m is None else m.value


# --- fixed output schemas (the compat contract, reference scan.py:306-326,343-370,387-395)

MEASUREMENT_SCHEMA = T.StructType(
    [
        T.StructField("metric", T.StringType(), True),
        T.StructField("column_name", T.StringType(), True),
        T.StructField("value", T.StringType(), True),
        T.StructField(
            "group_values",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("group", T.MapType(T.StringType(), T.StringType()), True),
                        T.StructField("value", T.StringType(), True),
                    ]
                )
            ),
            True,
        ),
    ]
)

TEST_RESULT_SCHEMA = T.StructType(
    [
        T.StructField(
            "test",
            T.StructType(
                [
                    T.StructField("id", T.StringType(), True),
                    T.StructField("title", T.StringType(), True),
                    T.StructField("expression", T.StringType(), True),
                    T.StructField("metrics", T.ArrayType(T.StringType()), True),
                    T.StructField("column", T.StringType(), True),
                    T.StructField("source", T.StringType(), True),
                ]
            ),
            True,
        ),
        T.StructField("passed", T.BooleanType(), True),
        T.StructField("skipped", T.BooleanType(), True),
        T.StructField("values", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("error", T.StringType(), True),
        T.StructField("group_values", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

SCAN_ERROR_SCHEMA = T.StructType(
    [
        T.StructField("message", T.StringType(), True),
        T.StructField("exception", T.StringType(), True),
    ]
)


def _stringify(value: Any) -> str | None:
    """Stringify a metric value the way the reference output frames do."""
    if value is None:
        return None
    if isinstance(value, bool):
        return str(value).lower()
    if isinstance(value, (list, dict)):
        return json.dumps(value, default=str)
    return str(value)


def measurements_to_data_frame(
    measurements: list[Measurement], spark: SparkSession | None = None
) -> DataFrame:
    """List[Measurement] -> DataFrame (reference scan.py:292-326, A13)."""
    spark = spark or SparkSession.builder.getOrCreate()
    rows = [
        (
            m.metric,
            m.column_name,
            _stringify(m.value),
            None
            if m.group_values is None
            else [
                (
                    {str(k): _stringify(v) for k, v in gv.group.items()},
                    _stringify(gv.value),
                )
                for gv in m.group_values
            ],
        )
        for m in measurements
    ]
    return spark.createDataFrame(rows, MEASUREMENT_SCHEMA)


def test_results_to_data_frame(
    test_results: list[TestResult], spark: SparkSession | None = None
) -> DataFrame:
    """List[TestResult] -> DataFrame (reference scan.py:329-370, A14)."""
    spark = spark or SparkSession.builder.getOrCreate()
    rows = [
        (
            (
                tr.test.id,
                tr.test.title,
                tr.test.expression,
                tr.test.metrics,
                tr.test.column,
                tr.test.source,
            ),
            tr.passed,
            tr.skipped,
            None
            if tr.values is None
            else {str(k): _stringify(v) for k, v in tr.values.items()},
            tr.error,
            None
            if tr.group_values is None
            else {str(k): _stringify(v) for k, v in tr.group_values.items()},
        )
        for tr in test_results
    ]
    return spark.createDataFrame(rows, TEST_RESULT_SCHEMA)


def scan_errors_to_data_frame(
    errors: list[ScanError], spark: SparkSession | None = None
) -> DataFrame:
    """List[ScanError] -> DataFrame (reference scan.py:373-395, A15)."""
    spark = spark or SparkSession.builder.getOrCreate()
    rows = [(e.message, e.exception) for e in errors]
    return spark.createDataFrame(rows, SCAN_ERROR_SCHEMA)


def scan_result_to_data_frames(
    result: ScanResult, spark: SparkSession | None = None
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """ScanResult -> (measurements, test_results, errors) DataFrames
    (reference scan.py:398-421, A16)."""
    return (
        measurements_to_data_frame(result.measurements, spark),
        test_results_to_data_frame(result.test_results, spark),
        scan_errors_to_data_frame(result.errors, spark),
    )
