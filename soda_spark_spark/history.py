"""Metric history and change-over-time tests.

A scan measures a table NOW; a quality gate usually asks "did it move?" —
row counts dropping, missing rates spiking, sums drifting. This module
persists each scan's measurements as an append-only parquet log and
evaluates CHANGE TESTS against the previous run(s) with the same
AST-whitelisted evaluator as regular tests:

    history = MetricHistory(spark, "s3://.../scan_history")
    result = execute(defn, df)
    tr = evaluate_change_tests(
        result, history,
        ["row_count >= prev_row_count * 0.9",
         "abs(missing_count_name - prev_missing_count_name) <= 5"],
    )
    history.append(result, table_name="orders")

Names resolve as `<metric>` / `<metric>_<column>` for the current scan and
`prev_*` for the most recent prior scan of the same table. The history
table is an ordinary partitioned parquet log — queryable by anything, and
append scales as one tiny write per scan.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .operators.evaluator import referenced_names, safe_eval
from .results import Measurement, ScanResult, Test, TestResult

HISTORY_SCHEMA = T.StructType(
    [
        T.StructField("table_name", T.StringType()),
        T.StructField("scan_time", T.StringType()),
        T.StructField("metric", T.StringType()),
        T.StructField("column_name", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _numeric(value: Any) -> float | None:
    if isinstance(value, bool) or not isinstance(value, (int, float)):
        return None
    return float(value)


def _names(measurements: list[Measurement]) -> dict[str, float]:
    out: dict[str, float] = {}
    for m in measurements:
        v = _numeric(m.value)
        if v is None:
            continue
        key = m.metric if m.column_name is None else f"{m.metric}_{m.column_name}"
        out[key] = v
    return out


class MetricHistory:
    """Append-only parquet log of scan measurements, partitioned by table."""

    def __init__(self, spark: SparkSession, path: str) -> None:
        self.spark = spark
        self.path = path

    def append(self, result: ScanResult, *, table_name: str) -> None:
        # microsecond resolution: two scans appended within the same second
        # must stay DISTINCT history points (a seconds-resolution key merged
        # them into one series entry); the generated time is written back to
        # the result so callers observe the identity the log recorded
        scan_time = result.scan_time or _dt.datetime.now(
            _dt.timezone.utc
        ).isoformat(timespec="microseconds")
        if result.scan_time is None:
            result.scan_time = scan_time
        rows = [
            (table_name, scan_time, m.metric, m.column_name, v)
            for m in result.measurements
            if (v := _numeric(m.value)) is not None
        ]
        if not rows:
            return
        (
            self.spark.createDataFrame(rows, HISTORY_SCHEMA)
            .repartition(1)  # one scan appends a handful of rows
            .write.mode("append")
            .partitionBy("table_name")
            .parquet(self.path)
        )

    def series(
        self, *, table_name: str, last_n: int | None = None
    ) -> dict[str, list[float]]:
        """Per-metric history as ordered value lists (oldest -> newest),
        optionally limited to the most recent `last_n` scans. Drives
        anomaly tests; the `last_n` cut happens IN the query (dense_rank
        over scan_time, descending) so the driver-side collect is bounded
        by last_n x metrics rows, not by the full scan history."""
        try:
            df = self.spark.read.parquet(self.path)
        except Exception:
            return {}
        log = df.filter(F.col("table_name") == table_name)
        if last_n is not None:
            w = Window.orderBy(F.col("scan_time").desc())
            log = (
                log.withColumn("__rk", F.dense_rank().over(w))
                .filter(F.col("__rk") <= last_n)
                .drop("__rk")
            )
        rows = log.orderBy(F.col("scan_time").asc()).collect()
        by_scan: dict[str, dict[str, float]] = {}
        for r in rows:
            key = (
                r["metric"]
                if r["column_name"] is None
                else f"{r['metric']}_{r['column_name']}"
            )
            by_scan.setdefault(r["scan_time"], {})[key] = r["value"]
        times = sorted(by_scan)
        if last_n is not None:
            times = times[-last_n:]
        out: dict[str, list[float]] = {}
        for t in times:
            for key, v in by_scan[t].items():
                out.setdefault(key, []).append(v)
        return out

    def previous(self, *, table_name: str) -> dict[str, float]:
        """The most recent prior scan's metrics as a `prev_*` namespace.
        Empty dict when no history exists yet."""
        try:
            df = self.spark.read.parquet(self.path)
        except Exception:
            return {}
        latest = (
            df.filter(F.col("table_name") == table_name)
            .groupBy()
            .agg(F.max("scan_time").alias("st"))
            .first()
        )
        if latest is None or latest["st"] is None:
            return {}
        rows = (
            df.filter(
                (F.col("table_name") == table_name)
                & (F.col("scan_time") == latest["st"])
            )
            .collect()
        )
        out: dict[str, float] = {}
        for r in rows:
            key = (
                r["metric"]
                if r["column_name"] is None
                else f"{r['metric']}_{r['column_name']}"
            )
            out[f"prev_{key}"] = r["value"]
        return out


def evaluate_change_tests(
    result: ScanResult,
    history: MetricHistory,
    tests: list[str],
    *,
    table_name: str,
) -> list[TestResult]:
    """Evaluate change expressions over {current metrics} ∪ {prev_*}.

    A test referencing `prev_*` names with NO prior scan recorded is
    SKIPPED (TestResult.skipped=True) rather than failed — first runs are
    not regressions. Results are appended to `result.test_results`.
    """
    namespace: dict[str, Any] = dict(_names(result.measurements))
    prev = history.previous(table_name=table_name)
    namespace.update(prev)
    out: list[TestResult] = []
    for expr in tests:
        try:
            refs_all = referenced_names(expr)
        except SyntaxError as exc:
            test = Test(
                id=f'{{"change_test":"{expr}"}}',
                title=f"change({expr})",
                expression=expr,
                metrics=None,
                column=None,
            )
            out.append(
                TestResult(test=test, passed=False, skipped=False, error=str(exc))
            )
            continue
        test = Test(
            id=f'{{"change_test":"{expr}"}}',
            title=f"change({expr})",
            expression=expr,
            metrics=refs_all,
            column=None,
        )
        wants_prev = any(n.startswith("prev_") for n in refs_all)
        if wants_prev and not prev:
            out.append(TestResult(test=test, passed=False, skipped=True))
            continue
        try:
            value = safe_eval(expr, namespace)
            refs = {
                n: namespace[n]
                for n in referenced_names(expr)
                if n in namespace
            }
            out.append(
                TestResult(
                    test=test,
                    passed=bool(value),
                    skipped=False,
                    values={"expression_result": value, **refs},
                )
            )
        except Exception as exc:
            out.append(
                TestResult(test=test, passed=False, skipped=False, error=str(exc))
            )
    result.test_results.extend(out)
    return out


def evaluate_anomaly_tests(
    result: ScanResult,
    history: MetricHistory,
    metrics: list[str],
    *,
    table_name: str,
    n_sigma: float = 3.0,
    min_history: int = 5,
    last_n: int | None = 30,
) -> list[TestResult]:
    """Z-score anomaly tests: flag a metric whose current value deviates
    more than `n_sigma` standard deviations from its history.

    Metric names use the `<metric>` / `<metric>_<column>` convention. Tests
    with fewer than `min_history` prior observations are SKIPPED (a z-score
    over 2 points is noise, not signal); constant histories (stddev 0) pass
    only on an exact match. Results append to `result.test_results`.
    """
    current = _names(result.measurements)
    series = history.series(table_name=table_name, last_n=last_n)
    out: list[TestResult] = []
    for name in metrics:
        test = Test(
            id=f'{{"anomaly_test":"{name}","n_sigma":{n_sigma}}}',
            title=f"anomaly({name}, {n_sigma}σ)",
            expression=f"abs(zscore({name})) <= {n_sigma}",
            metrics=[name],
            column=None,
        )
        hist = series.get(name, [])
        value = current.get(name)
        if value is None or len(hist) < min_history:
            out.append(TestResult(test=test, passed=False, skipped=True))
            continue
        mean = sum(hist) / len(hist)
        var = sum((x - mean) ** 2 for x in hist) / (len(hist) - 1)
        std = var**0.5
        if std == 0.0:
            passed = value == mean
            z = 0.0 if passed else float("inf")
        else:
            z = (value - mean) / std
            passed = abs(z) <= n_sigma
        out.append(
            TestResult(
                test=test,
                passed=passed,
                skipped=False,
                values={
                    "value": value,
                    "history_mean": mean,
                    "history_stddev": std,
                    "zscore": z,
                    "n_history": len(hist),
                },
            )
        )
    result.test_results.extend(out)
    return out
