"""Scan executor: runs a CompiledScan against a DataFrame.

Execution plan (SURVEY.md §3 lifecycle, re-expressed Spark-first):

1. ONE fused ``df.agg(*exprs)`` job for all table+column metrics (M2-M19) —
   Catalyst executes it as a single partial+final hash aggregate over one
   table scan, the engine's core performance property (SURVEY.md §4).
2. One ``groupBy`` job per column with duplicates metrics (M20-M23), each
   reading a single parquet-pruned column (or zero extra jobs in
   ``approx_distinct`` mode).
3. Profiling passes (M24-M26) per requesting column, all bounded by ``limit``
   before any collect.
4. ``sql_metrics`` via a temp view + ``spark.sql`` (M27/M28) — the only place
   a temp view is used.
5. Bounded samples (S1/S2).
6. Driver-side safe evaluation of tests (T1-T4) over the metric namespace.

Everything collected at the driver is either a single aggregate row or
explicitly ``limit``-bounded, so the executor is safe at any table size.
"""

from __future__ import annotations

import decimal
import json
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.compiler import (
    COLUMN_METRIC_ORDER,
    ColumnPlan,
    CompiledScan,
    compile_scan,
    frequent_values_plan,
    group_metrics_aggregation,
    histogram_plan,
    mins_maxs_plan,
)
from ..plans.definition import ScanDefinition, SqlMetric
from ..results import (
    GroupValue,
    Measurement,
    ScanError,
    ScanResult,
    Test,
    TestExecutionScanError,
    TestResult,
)
from .evaluator import referenced_names, safe_eval

GROUPED_SQL_METRIC_MAX_GROUPS = 10_000


def _native(value: Any, *, integral: bool = False) -> Any:
    """Convert a collected Spark value to a plain Python metric value."""
    if value is None:
        return None
    if isinstance(value, decimal.Decimal):
        if integral:
            return int(value)
        return float(value)
    return value


def _pct(part: Any, total: int | None) -> float | None:
    if part is None or not total:
        return None
    return part / total * 100


class ScanExecutor:
    def __init__(self, df: DataFrame, definition: ScanDefinition):
        if definition.repartition:
            df = df.repartition(definition.repartition)
        self.df = df
        self.definition = definition
        self.spark = df.sparkSession
        self.compiled: CompiledScan = compile_scan(definition, df)
        self.result = ScanResult()
        # metric namespaces for test evaluation
        self.table_namespace: dict[str, Any] = {}
        self.column_namespace: dict[str, dict[str, Any]] = {}

    # --- main entry ---------------------------------------------------------

    def execute(self) -> ScanResult:
        # a repartitioned input would re-shuffle on EVERY pass (agg, each
        # groupBy, sql metrics, samples) since actions recompute lineage —
        # persist it for the scan's duration
        persisted = False
        if self.definition.repartition:
            n_passes = 1 + len(
                [p for p in self.compiled.columns.values() if p.group_metrics]
            ) + len(self.definition.sql_metrics)
            if n_passes > 1:
                self.df.persist()
                persisted = True
        try:
            return self._execute()
        finally:
            if persisted:
                self.df.unpersist()

    def _execute(self) -> ScanResult:
        requested = self.definition.effective_metrics()
        self._emit_schema()
        raw = self._run_fused_aggregation()
        row_count = raw[("", "row_count")]
        self.table_namespace["row_count"] = row_count
        if "row_count" in requested:
            self._add(Measurement("row_count", None, row_count))

        group_rows = self._run_group_passes()
        for name in self.compiled.column_order:
            plan = self.compiled.columns[name]
            metrics = self._column_metrics(plan, raw, row_count, group_rows.get(name))
            self.column_namespace[name] = metrics
            for metric in COLUMN_METRIC_ORDER:
                if metric in metrics:
                    self._add(Measurement(metric, name, metrics[metric]))

        self._run_sql_metrics()
        self._collect_samples()
        self._evaluate_tests()
        return self.result

    # --- incremental derivation (streaming) ---------------------------------

    def derive_from_raw(self, raw: dict[tuple[str, str], Any]) -> ScanResult:
        """Derive measurements + tests from an externally-supplied raw slot
        dict — the incremental streaming path: per-batch fused aggregates are
        MERGED across micro-batches (streaming/scan_stream.py) and the
        cumulative sufficient statistics re-derive the full metric set here.
        Profile/group/sql/sample passes are batch-scope and skipped."""
        import dataclasses as _dc

        self.result = ScanResult()
        self.table_namespace = {}
        self.column_namespace = {}
        requested = self.definition.effective_metrics()
        self._emit_schema()
        row_count = raw[("", "row_count")]
        self.table_namespace["row_count"] = row_count
        if "row_count" in requested:
            self._add(Measurement("row_count", None, row_count))
        for name in self.compiled.column_order:
            plan = self.compiled.columns[name]
            # profile metrics would launch per-column jobs on self.df —
            # meaningless against merged state, so strip them
            stripped = _dc.replace(plan, profile_metrics=set())
            metrics = self._column_metrics(stripped, raw, row_count, None)
            # approx_distinct / percentiles slots are non-mergeable and
            # absent from merged raw; drop their None placeholders
            metrics = {
                k: v
                for k, v in metrics.items()
                if not (v is None and k in ("distinct", "percentiles"))
            }
            self.column_namespace[name] = metrics
            for metric in COLUMN_METRIC_ORDER:
                if metric in metrics:
                    self._add(Measurement(metric, name, metrics[metric]))
        self._evaluate_tests()
        return self.result

    # --- passes -------------------------------------------------------------

    def _emit_schema(self) -> None:
        # M1: schema is derived from df.schema, no query needed (SURVEY §2.2)
        value = [
            {
                "name": f.name,
                "type": f.dataType.simpleString(),
                "nullable": f.nullable,
            }
            for f in self.df.schema.fields
        ]
        self._add(Measurement("schema", None, value))

    def _run_fused_aggregation(self) -> dict[tuple[str, str], Any]:
        row = self.df.agg(*self.compiled.agg_exprs).first()
        d = row.asDict()
        return {key: d[alias] for key, alias in self.compiled.slots.items()}

    def _run_group_passes(self) -> dict[str, dict[str, int]]:
        """Exact duplicates metrics, one groupBy job per requesting column.

        Jobs are submitted concurrently from driver threads: each pass reads
        one parquet-pruned column, so the cluster can overlap their scan and
        shuffle stages instead of running them back-to-back (Spark's
        scheduler is thread-safe; FAIR/FIFO pools both benefit).
        """
        targets = []
        for name in self.compiled.column_order:
            plan = self.compiled.columns[name]
            needs = plan.group_metrics
            if not needs:
                continue
            if self.definition.approx_distinct and needs == {"distinct"}:
                continue  # served from the fused pass
            targets.append((name, plan))
        if not targets:
            return {}
        if len(targets) == 1:
            name, plan = targets[0]
            return {name: group_metrics_aggregation(self.df, plan).first().asDict()}
        from concurrent.futures import ThreadPoolExecutor

        def run(item):
            name, plan = item
            return name, group_metrics_aggregation(self.df, plan).first().asDict()

        with ThreadPoolExecutor(max_workers=min(8, len(targets))) as pool:
            return dict(pool.map(run, targets))

    def _column_metrics(
        self,
        plan: ColumnPlan,
        raw: dict[tuple[str, str], Any],
        row_count: int,
        group_row: dict[str, int] | None,
    ) -> dict[str, Any]:
        name, m = plan.name, plan.metrics
        get = lambda kind: raw.get((name, kind))  # noqa: E731
        out: dict[str, Any] = {}

        missing_count = get("missing_count")
        values_count = None if missing_count is None else row_count - missing_count
        if "missing_count" in m:
            out["missing_count"] = missing_count
        if "missing_percentage" in m:
            out["missing_percentage"] = _pct(missing_count, row_count)
        if "values_count" in m:
            out["values_count"] = values_count
        if "values_percentage" in m:
            out["values_percentage"] = _pct(values_count, row_count)

        if m & {"valid_count", "valid_percentage", "invalid_count", "invalid_percentage"}:
            # vacuous validity: valid_count == values_count (SURVEY §2.3)
            valid_count = (
                get("valid_count") if plan.valid is not None else values_count
            )
            invalid_count = (
                None
                if values_count is None or valid_count is None
                else values_count - valid_count
            )
            if "valid_count" in m:
                out["valid_count"] = valid_count
            if "valid_percentage" in m:
                out["valid_percentage"] = _pct(valid_count, row_count)
            if "invalid_count" in m:
                out["invalid_count"] = invalid_count
            if "invalid_percentage" in m:
                out["invalid_percentage"] = _pct(invalid_count, row_count)

        if "min_length" in m:
            out["min_length"] = get("len_min")
        if "max_length" in m:
            out["max_length"] = get("len_max")
        if "avg_length" in m:
            len_sum = get("len_sum")
            out["avg_length"] = (
                None if len_sum is None or not values_count else len_sum / values_count
            )

        if plan.vnum is not None and m & {"min", "max", "avg", "sum", "variance", "stddev"}:
            out.update(self._numeric_metrics(plan, raw))
        elif plan.vnum is None and m & {"min", "max"}:
            # time columns: raw min/max (no other statistics apply)
            if "min" in m:
                out["min"] = get("raw_min")
            if "max" in m:
                out["max"] = get("raw_max")

        if "percentiles" in m:
            p = get("percentiles")
            if p is not None:
                out["percentiles"] = [None if v is None else float(v) for v in p]

        if group_row is not None:
            values_for_uniq = out.get("values_count", values_count)
            if "distinct" in m:
                out["distinct"] = group_row["distinct"]
            if "unique_count" in m:
                out["unique_count"] = group_row["unique_count"]
            if "duplicate_count" in m:
                out["duplicate_count"] = group_row["duplicate_count"]
            if "uniqueness" in m:
                # (distinct - 1) / (values_count - 1) * 100  (SURVEY §2.2 M23)
                d, v = group_row["distinct"], values_for_uniq
                out["uniqueness"] = (
                    None if v is None or v <= 1 else (d - 1) / (v - 1) * 100
                )
        elif self.definition.approx_distinct and "distinct" in m:
            out["distinct"] = get("approx_distinct")

        out.update(self._profile_metrics(plan, raw))
        return out

    def _numeric_metrics(
        self, plan: ColumnPlan, raw: dict[tuple[str, str], Any]
    ) -> dict[str, Any]:
        """Derive avg/variance/stddev from the exact decimal sums; the float
        formulas are fixed-order so results are partition-independent."""
        name, m = plan.name, plan.metrics
        get = lambda kind: raw.get((name, kind))  # noqa: E731
        out: dict[str, Any] = {}
        integral = plan.num_integral
        if "min" in m:
            out["min"] = _native(get("num_min"), integral=integral)
        if "max" in m:
            out["max"] = _native(get("num_max"), integral=integral)
        s1 = get("num_sum")
        n = get("num_cnt")
        if "sum" in m:
            out["sum"] = _native(s1, integral=integral)
        if "avg" in m:
            out["avg"] = None if s1 is None or not n else float(s1) / n
        if m & {"variance", "stddev"}:
            s2 = get("num_sumsq")
            var = None
            if s1 is not None and s2 is not None and n and n > 1:
                f1, f2 = float(s1), float(s2)
                var = (f2 - f1 * f1 / n) / (n - 1)
                var = max(var, 0.0)  # guard tiny negative from cancellation
            if "variance" in m:
                out["variance"] = var
            if "stddev" in m:
                out["stddev"] = None if var is None else var**0.5
        return out

    def _profile_metrics(
        self, plan: ColumnPlan, raw: dict[tuple[str, str], Any]
    ) -> dict[str, Any]:
        out: dict[str, Any] = {}
        k = self.definition.profiling_limit
        m = plan.profile_metrics
        if "frequent_values" in m:
            rows = frequent_values_plan(self.df, plan, k).collect()
            out["frequent_values"] = [
                {"value": _jsonable(r["value"]), "frequency": r["frequency"]}
                for r in rows
            ]
        if plan.vnum is not None:
            if "mins" in m:
                rows = mins_maxs_plan(self.df, plan, k, ascending=True).collect()
                out["mins"] = [_jsonable(_native(r["value"], integral=plan.num_integral)) for r in rows]
            if "maxs" in m:
                rows = mins_maxs_plan(self.df, plan, k, ascending=False).collect()
                out["maxs"] = [_jsonable(_native(r["value"], integral=plan.num_integral)) for r in rows]
            if "histogram" in m:
                lo = _native(raw.get((plan.name, "num_min")))
                hi = _native(raw.get((plan.name, "num_max")))
                if lo is not None and hi is not None:
                    buckets = self.definition.histogram_buckets
                    rows = histogram_plan(self.df, plan, float(lo), float(hi), buckets).collect()
                    freq = {int(r["bucket"]): r["frequency"] for r in rows}
                    width = (float(hi) - float(lo)) / buckets or 1.0
                    out["histogram"] = {
                        "boundaries": [float(lo) + i * width for i in range(buckets + 1)],
                        "frequencies": [freq.get(i, 0) for i in range(buckets)],
                    }
        return out

    def _run_sql_metrics(self) -> None:
        """M27/M28: user SQL against a temp view named after the scanned table
        — the only place the engine registers a view (SURVEY §7)."""
        if not self.definition.sql_metrics:
            return
        self.df.createOrReplaceTempView(self.definition.table_name)
        for sm in self.definition.sql_metrics:
            try:
                result_df = self.spark.sql(sm.sql)
                if sm.group_fields:
                    self._grouped_sql_metric(sm, result_df)
                else:
                    self._scalar_sql_metric(sm, result_df)
            except Exception as exc:  # surface, do not abort the scan (T4 model)
                self.result.errors.append(
                    ScanError(
                        message=f"SQL metric {sm.index} failed",
                        exception=str(exc),
                    )
                )

    def _scalar_sql_metric(self, sm: SqlMetric, result_df: DataFrame) -> None:
        row = result_df.first()
        values: dict[str, Any] = {} if row is None else row.asDict()
        for alias, value in values.items():
            value = _native(value)
            # column-scoped sql_metrics carry their owning column on the
            # measurement and feed that column's test namespace (reference
            # output shape, tests/test_scan.py:404-413)
            self._add(Measurement(alias, sm.column_name, value))
            if sm.column_name is not None:
                self.column_namespace.setdefault(sm.column_name, {})[alias] = value
            else:
                self.table_namespace[alias] = value
        sm.resolved_values = values  # type: ignore[attr-defined]

    def _grouped_sql_metric(self, sm: SqlMetric, result_df: DataFrame) -> None:
        # collect cap+1 so truncation is detectable, then surface it as a
        # ScanError — groups beyond the cap must not vanish silently
        rows = result_df.limit(GROUPED_SQL_METRIC_MAX_GROUPS + 1).collect()
        if len(rows) > GROUPED_SQL_METRIC_MAX_GROUPS:
            rows = rows[:GROUPED_SQL_METRIC_MAX_GROUPS]
            self.result.errors.append(
                ScanError(
                    message=(
                        f"SQL metric {sm.index} returned more than "
                        f"{GROUPED_SQL_METRIC_MAX_GROUPS} groups; measurements "
                        f"and group tests truncated to the first "
                        f"{GROUPED_SQL_METRIC_MAX_GROUPS}"
                    )
                )
            )
        group_fields = list(sm.group_fields or [])
        metric_cols = [c for c in result_df.columns if c not in group_fields]
        for alias in metric_cols:
            gvs = [
                GroupValue(
                    group={f: str(r[f]) for f in group_fields},
                    value=_native(r[alias]),
                )
                for r in rows
            ]
            self._add(Measurement(alias, sm.column_name, None, group_values=gvs))
        # group rows kept for per-group test evaluation (TestResult.group_values)
        sm.resolved_groups = [  # type: ignore[attr-defined]
            (
                {f: str(r[f]) for f in group_fields},
                {alias: _native(r[alias]) for alias in metric_cols},
            )
            for r in rows
        ]

    def _collect_samples(self) -> None:
        s = self.definition.samples
        if s.table_limit:
            self.result.samples[("table",)] = self.df.limit(s.table_limit).collect()
        if s.failed_limit:
            for name in self.compiled.column_order:
                plan = self.compiled.columns[name]
                if plan.valid is None:
                    continue
                failed = self.df.filter(plan.miss | ~plan.valid)
                self.result.samples[("failed", name)] = failed.limit(
                    s.failed_limit
                ).collect()

    # --- tests ---------------------------------------------------------------

    def _evaluate_tests(self) -> None:
        for expr in self.definition.tests:
            test = Test(
                id=json.dumps({"expression": expr}, separators=(",", ":")),
                title=f"test({expr})",
                expression=expr,
                metrics=None,
                column=None,
            )
            self._eval_one(test, expr, dict(self.table_namespace))
        for name, cfg in self.definition.columns.items():
            namespace = dict(self.table_namespace)
            namespace.update(self.column_namespace.get(name, {}))
            for expr in cfg.tests:
                test = Test(
                    id=json.dumps(
                        {"column": name, "expression": expr}, separators=(",", ":")
                    ),
                    title=f"column({name}) test({expr})",
                    expression=expr,
                    metrics=None,
                    column=name,
                )
                self._eval_one(test, expr, namespace)
        for sm in self.definition.sql_metrics:
            groups = getattr(sm, "resolved_groups", None)
            for expr in sm.tests:
                test = Test(
                    id=json.dumps(
                        {"sql_metric_index": sm.index, "expression": expr},
                        separators=(",", ":"),
                    ),
                    title=f"sqlmetric({sm.index}) test({expr})",
                    expression=expr,
                    metrics=None,
                    column=sm.column_name,
                )
                if sm.group_fields and groups is not None:
                    # grouped sql metric: evaluate per group, each TestResult
                    # carrying its group_values (reference TestResult schema,
                    # scan.py:343-370)
                    if not groups:
                        # zero groups -> nothing to evaluate against: record
                        # the test as skipped (reference TestResult.skipped,
                        # scan.py:358) instead of silently dropping it
                        test.metrics = referenced_names(expr)
                        self.result.test_results.append(
                            TestResult(test=test, passed=False, skipped=True)
                        )
                        continue
                    for group, values in groups:
                        namespace = dict(self.table_namespace)
                        namespace.update(values)
                        self._eval_one(test, expr, namespace, group_values=group)
                else:
                    namespace = dict(self.table_namespace)
                    namespace.update(
                        {
                            k: _native(v)
                            for k, v in getattr(sm, "resolved_values", {}).items()
                        }
                    )
                    self._eval_one(test, expr, namespace)

    def _eval_one(
        self,
        test: Test,
        expr: str,
        namespace: dict[str, Any],
        group_values: dict[str, Any] | None = None,
    ) -> None:
        try:
            refs = [r for r in referenced_names(expr) if r in namespace]
            test.metrics = referenced_names(expr)
            value = safe_eval(expr, namespace)
        except Exception as exc:
            # the reference's error channel: scan continues, error recorded
            # (tests/test_scan.py:488-493)
            self.result.errors.append(
                TestExecutionScanError(
                    message=f'Test "{expr}" failed', exception=str(exc)
                )
            )
            self.result.test_results.append(
                TestResult(
                    test=test,
                    passed=False,
                    skipped=False,
                    error=str(exc),
                    group_values=group_values,
                )
            )
            return
        values = {"expression_result": value}
        for r in refs:
            values[r] = namespace[r]
        self.result.test_results.append(
            TestResult(
                test=test,
                passed=bool(value),
                skipped=False,
                values=values,
                group_values=group_values,
            )
        )

    def _add(self, measurement: Measurement) -> None:
        self.result.measurements.append(measurement)


def _jsonable(value: Any) -> Any:
    if isinstance(value, (int, float, str, bool, type(None))):
        return value
    return str(value)


def run_scan(df: DataFrame, definition: ScanDefinition) -> ScanResult:
    return ScanExecutor(df, definition).execute()
