"""Metric history + change-over-time tests."""

from __future__ import annotations

from soda_spark_spark import execute
from soda_spark_spark.history import MetricHistory, evaluate_change_tests

DEFN = {"table_name": "h", "metrics": ["row_count", "missing_count", "sum"]}


def _scan(spark, rows):
    df = spark.createDataFrame(rows, "id long, v double")
    return execute(dict(DEFN), df)


def test_first_run_skips_change_tests(spark, tmp_path):
    history = MetricHistory(spark, str(tmp_path / "hist"))
    r = _scan(spark, [(1, 10.0), (2, 20.0)])
    out = evaluate_change_tests(
        r, history, ["row_count >= prev_row_count"], table_name="h"
    )
    assert out[0].skipped is True and out[0].passed is False
    history.append(r, table_name="h")


def test_change_tests_against_previous_scan(spark, tmp_path):
    history = MetricHistory(spark, str(tmp_path / "hist"))
    r1 = _scan(spark, [(i, float(i)) for i in range(10)])
    r1.scan_time = "2026-01-01T00:00:00"
    history.append(r1, table_name="h")

    r2 = _scan(spark, [(i, float(i)) for i in range(9)])  # one row fewer
    r2.scan_time = "2026-01-02T00:00:00"
    out = evaluate_change_tests(
        r2,
        history,
        [
            "row_count >= prev_row_count * 0.8",   # within 20% drop -> pass
            "row_count >= prev_row_count",          # strict no-drop -> fail
            "abs(sum_v - prev_sum_v) <= 100",        # sum drift bound -> pass
        ],
        table_name="h",
    )
    assert [t.passed for t in out] == [True, False, True]
    assert out[0].values["prev_row_count"] == 10.0
    # results are appended to the ScanResult's test channel
    assert all(t in r2.test_results for t in out)


def test_previous_picks_latest_scan(spark, tmp_path):
    history = MetricHistory(spark, str(tmp_path / "hist"))
    for day, n in (("01", 5), ("03", 7), ("02", 6)):
        r = _scan(spark, [(i, 1.0) for i in range(n)])
        r.scan_time = f"2026-01-{day}T00:00:00"
        history.append(r, table_name="h")
    prev = history.previous(table_name="h")
    assert prev["prev_row_count"] == 7.0  # the latest by scan_time, not insert order


def test_history_is_per_table(spark, tmp_path):
    history = MetricHistory(spark, str(tmp_path / "hist"))
    r = _scan(spark, [(1, 1.0)])
    history.append(r, table_name="a")
    assert history.previous(table_name="b") == {}


def test_bad_change_expression_goes_to_error_channel(spark, tmp_path):
    history = MetricHistory(spark, str(tmp_path / "hist"))
    r1 = _scan(spark, [(1, 1.0)])
    history.append(r1, table_name="h")
    r2 = _scan(spark, [(1, 1.0)])
    out = evaluate_change_tests(
        r2, history, ["prev_row_count +"], table_name="h"
    )
    assert out[0].passed is False and out[0].error


def test_anomaly_tests(spark, tmp_path):
    from soda_spark_spark.history import evaluate_anomaly_tests

    history = MetricHistory(spark, str(tmp_path / "hist"))
    # 6 stable scans around 100 rows
    for day, n in enumerate((100, 101, 99, 100, 102, 98)):
        r = _scan(spark, [(i, 1.0) for i in range(n)])
        r.scan_time = f"2026-01-0{day + 1}T00:00:00"
        history.append(r, table_name="h")

    normal = _scan(spark, [(i, 1.0) for i in range(101)])
    out = evaluate_anomaly_tests(normal, history, ["row_count"], table_name="h")
    assert out[0].passed and abs(out[0].values["zscore"]) < 2

    crashed = _scan(spark, [(i, 1.0) for i in range(10)])
    out = evaluate_anomaly_tests(crashed, history, ["row_count"], table_name="h")
    assert not out[0].passed and out[0].skipped is False
    assert out[0].values["zscore"] < -3


def test_anomaly_skips_on_thin_history(spark, tmp_path):
    from soda_spark_spark.history import evaluate_anomaly_tests

    history = MetricHistory(spark, str(tmp_path / "hist"))
    r0 = _scan(spark, [(1, 1.0)])
    history.append(r0, table_name="h")
    r = _scan(spark, [(1, 1.0)])
    out = evaluate_anomaly_tests(r, history, ["row_count"], table_name="h")
    assert out[0].skipped is True


def test_series_last_n_is_cut_in_the_query(spark, tmp_path, monkeypatch):
    """last_n must bound the driver-side collect (last_n x metric keys
    rows), not just post-filter a full-history collect."""
    history = MetricHistory(spark, str(tmp_path / "hist"))
    for i in range(10):
        r = _scan(spark, [(j, float(j)) for j in range(i + 1)])
        r.scan_time = f"2026-01-{i + 1:02d}T00:00:00"
        history.append(r, table_name="h")

    try:  # the concrete class (classic API overrides the base collect)
        from pyspark.sql.classic.dataframe import DataFrame as _DF
    except ImportError:  # older pyspark layouts
        from pyspark.sql import DataFrame as _DF

    collected_sizes: list[int] = []
    orig_collect = _DF.collect

    def spying_collect(self):
        rows = orig_collect(self)
        collected_sizes.append(len(rows))
        return rows

    monkeypatch.setattr(_DF, "collect", spying_collect)
    out = history.series(table_name="h", last_n=3)
    assert out and all(len(v) == 3 for v in out.values())
    assert collected_sizes and max(collected_sizes) <= 3 * len(out)

    monkeypatch.undo()
    full = history.series(table_name="h")
    assert all(len(v) == 10 for v in full.values())
