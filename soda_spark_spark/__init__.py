"""soda_spark_spark — a PySpark-native data-quality and data-processing engine
with the capabilities of sodadata/soda-spark, re-expressed Spark-first.

Core surface (SURVEY.md §2): declarative YAML scan definitions compiled into
one fused multi-aggregate pass + per-column group passes, driver-side safe
test evaluation, custom SQL metrics, bounded samples, fixed-schema result
DataFrames. Extensions: dedup, similarity search, text analysis, multimodal
column plumbing, streaming scans.
"""

from .api import execute, explain_scan, metrics_row_frame, scan_dataframe
from .history import MetricHistory, evaluate_anomaly_tests, evaluate_change_tests
from .pipeline import curate, eval_split_recipe
from .plans.definition import ScanDefinition, create_scan_definition
from .results import (
    GroupValue,
    Measurement,
    ScanError,
    ScanResult,
    Test,
    TestExecutionScanError,
    TestResult,
    measurements_to_data_frame,
    scan_errors_to_data_frame,
    scan_result_to_data_frames,
    test_results_to_data_frame,
)

__version__ = "0.1.0"

__all__ = [
    "execute",
    "curate",
    "eval_split_recipe",
    "MetricHistory",
    "evaluate_change_tests",
    "evaluate_anomaly_tests",
    "explain_scan",
    "metrics_row_frame",
    "scan_dataframe",
    "create_scan_definition",
    "ScanDefinition",
    "ScanResult",
    "Measurement",
    "GroupValue",
    "Test",
    "TestResult",
    "ScanError",
    "TestExecutionScanError",
    "measurements_to_data_frame",
    "test_results_to_data_frame",
    "scan_errors_to_data_frame",
    "scan_result_to_data_frames",
]
