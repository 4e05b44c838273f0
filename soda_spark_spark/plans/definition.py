"""Scan-definition model: YAML -> dataclasses (replaces soda-sql's ScanYmlParser).

The YAML surface is the reference's declared scan grammar
(/root/reference/tests/test_scan.py:22-74, /root/reference/static/demodata.yml):
``table_name``, ``metrics``, ``metric_groups``, ``columns`` (validity/missing
config + per-column tests), ``tests``, ``excluded_columns``, ``sql_metrics``,
``samples``, plus ``variables`` substitution (reference scan.py:254,266 — C2).
"""

from __future__ import annotations

import string
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

import yaml

# --- metric vocabulary -------------------------------------------------------

TABLE_METRICS = {"schema", "row_count"}
MISSING_METRICS = {
    "missing_count",
    "missing_percentage",
    "values_count",
    "values_percentage",
}
VALIDITY_METRICS = {
    "valid_count",
    "valid_percentage",
    "invalid_count",
    "invalid_percentage",
}
LENGTH_METRICS = {"min_length", "max_length", "avg_length"}
STATISTICS_METRICS = {"min", "max", "avg", "sum", "variance", "stddev"}
DUPLICATES_METRICS = {"distinct", "unique_count", "uniqueness", "duplicate_count"}
PROFILING_METRICS = {"frequent_values", "mins", "maxs", "histogram", "percentiles"}

# `metric_groups` shorthand expansion (soda-sql 2.x surface; SURVEY.md §2.2;
# the reference exercises `duplicates`, tests/test_scan.py:46-47)
METRIC_GROUPS: dict[str, set[str]] = {
    "missing": MISSING_METRICS,
    "validity": VALIDITY_METRICS,
    "length": LENGTH_METRICS,
    "statistics": STATISTICS_METRICS,
    "duplicates": DUPLICATES_METRICS,
    "profiling": PROFILING_METRICS,
}

ALL_METRICS = (
    TABLE_METRICS
    | MISSING_METRICS
    | VALIDITY_METRICS
    | LENGTH_METRICS
    | STATISTICS_METRICS
    | DUPLICATES_METRICS
    | PROFILING_METRICS
)


@dataclass
class ColumnConfig:
    """Per-column configuration (SURVEY.md §2.2 V1-V4)."""

    name: str
    metrics: set[str] = field(default_factory=set)
    tests: list[str] = field(default_factory=list)
    valid_format: str | None = None
    valid_regex: str | None = None
    valid_values: list[Any] | None = None
    valid_min: float | None = None
    valid_max: float | None = None
    valid_min_length: int | None = None
    valid_max_length: int | None = None
    missing_values: list[Any] | None = None
    missing_format: str | None = None
    missing_regex: str | None = None

    def has_validity(self) -> bool:
        return any(
            v is not None
            for v in (
                self.valid_format,
                self.valid_regex,
                self.valid_values,
                self.valid_min,
                self.valid_max,
                self.valid_min_length,
                self.valid_max_length,
            )
        )


@dataclass
class SqlMetric:
    """Custom SQL metric (M27/M28; reference tests/test_scan.py:61-73).

    `column_name` is set for sql_metrics declared under a column config
    (soda-sql's column-scoped custom metrics): measurements then carry the
    column, matching the reference output shape
    (/root/reference/tests/test_scan.py:404-413 pairs column_name with
    group_values on one Measurement).
    """

    sql: str
    tests: list[str] = field(default_factory=list)
    group_fields: list[str] | None = None
    index: int = 0
    column_name: str | None = None


@dataclass
class Samples:
    """Sampling config (S1/S2; reference tests/test_scan.py:24-26)."""

    table_limit: int | None = None
    failed_limit: int | None = None


@dataclass
class ScanDefinition:
    table_name: str
    metrics: set[str] = field(default_factory=set)
    metric_groups: list[str] = field(default_factory=list)
    tests: list[str] = field(default_factory=list)
    columns: dict[str, ColumnConfig] = field(default_factory=dict)
    excluded_columns: list[str] = field(default_factory=list)
    sql_metrics: list[SqlMetric] = field(default_factory=list)
    samples: Samples = field(default_factory=Samples)
    # extension: approximate fast paths for 100TB-scale scans
    approx_distinct: bool = False
    profiling_limit: int = 10
    histogram_buckets: int = 20
    percentiles: list[float] = field(default_factory=lambda: [0.25, 0.5, 0.75])
    # exact percentiles sort per-column — fine to ~10^9 rows; at 100TB flip
    # this on to use the approx_percentile sketch inside the fused pass
    approx_percentiles: bool = False
    # small-file/big-cluster tuning: repartition the input before scanning.
    # Leave None for large tables — the fused agg wants the source
    # partitioning, and a pre-agg shuffle at 100TB would dominate the scan.
    repartition: int | None = None

    def effective_metrics(self, column: str | None = None) -> set[str]:
        """Requested metrics after metric_groups expansion (+ column extras)."""
        out = set(self.metrics)
        for g in self.metric_groups:
            out |= METRIC_GROUPS.get(g, set())
        if column is not None and column in self.columns:
            out |= self.columns[column].metrics
        return out


def _substitute_variables(text: str, variables: dict[str, Any] | None) -> str:
    """Variable substitution into the YAML text (reference scan.py:254,266 — C2).

    Supports ``${var}`` / ``$var`` placeholders; unknown placeholders are left
    untouched so YAML containing literal ``$`` survives.
    """
    if not variables:
        return text
    return string.Template(text).safe_substitute(
        {k: str(v) for k, v in variables.items()}
    )


def _parse_column(name: str, raw: dict[str, Any]) -> ColumnConfig:
    raw = raw or {}
    metrics = set(raw.get("metrics") or [])
    for g in raw.get("metric_groups") or []:
        metrics |= METRIC_GROUPS.get(g, set())
    return ColumnConfig(
        name=name,
        metrics=metrics,
        tests=[str(t) for t in (raw.get("tests") or [])],
        valid_format=raw.get("valid_format"),
        valid_regex=raw.get("valid_regex"),
        valid_values=raw.get("valid_values"),
        valid_min=raw.get("valid_min"),
        valid_max=raw.get("valid_max"),
        valid_min_length=raw.get("valid_min_length"),
        valid_max_length=raw.get("valid_max_length"),
        missing_values=raw.get("missing_values"),
        missing_format=raw.get("missing_format"),
        missing_regex=raw.get("missing_regex"),
    )


def create_scan_definition(
    scan_definition: str | Path | dict,
    variables: dict[str, Any] | None = None,
) -> ScanDefinition:
    """Load a scan definition from a YAML path, literal YAML text, or a dict
    (reference scan.py:204-233 `create_scan_yml`, A3: an existing file is
    treated as a path, else as literal YAML content)."""
    if isinstance(scan_definition, dict):
        raw = scan_definition
    else:
        text: str
        if isinstance(scan_definition, Path):
            text = scan_definition.read_text()
        else:
            as_path = Path(scan_definition)
            try:
                is_file = as_path.is_file()
            except OSError:  # very long literal YAML can exceed path limits
                is_file = False
            text = as_path.read_text() if is_file else str(scan_definition)
        text = _substitute_variables(text, variables)
        raw = yaml.safe_load(text)
    if not isinstance(raw, dict) or "table_name" not in raw:
        raise ValueError("scan definition must be a mapping with a `table_name`")

    metrics = set(raw.get("metrics") or [])
    unknown = metrics - ALL_METRICS
    if unknown:
        raise ValueError(f"unknown metrics in scan definition: {sorted(unknown)}")

    sql_metrics = [
        SqlMetric(
            sql=str(sm["sql"]),
            tests=[str(t) for t in (sm.get("tests") or [])],
            group_fields=sm.get("group_fields"),
            index=i,
        )
        for i, sm in enumerate(raw.get("sql_metrics") or [])
    ]
    # column-scoped sql_metrics (columns.<name>.sql_metrics): same grammar,
    # measurements carry the owning column_name
    for col_name, cfg in (raw.get("columns") or {}).items():
        for sm in (cfg or {}).get("sql_metrics") or []:
            sql_metrics.append(
                SqlMetric(
                    sql=str(sm["sql"]),
                    tests=[str(t) for t in (sm.get("tests") or [])],
                    group_fields=sm.get("group_fields"),
                    index=len(sql_metrics),
                    column_name=str(col_name),
                )
            )
    samples_raw = raw.get("samples") or {}
    return ScanDefinition(
        table_name=str(raw["table_name"]),
        metrics=metrics,
        metric_groups=[str(g) for g in (raw.get("metric_groups") or [])],
        tests=[str(t) for t in (raw.get("tests") or [])],
        columns={
            name: _parse_column(name, cfg)
            for name, cfg in (raw.get("columns") or {}).items()
        },
        excluded_columns=[str(c) for c in (raw.get("excluded_columns") or [])],
        sql_metrics=sql_metrics,
        samples=Samples(
            table_limit=samples_raw.get("table_limit"),
            failed_limit=samples_raw.get("failed_limit"),
        ),
        approx_distinct=bool(raw.get("approx_distinct", False)),
        profiling_limit=int(raw.get("profiling_limit", 10)),
        histogram_buckets=int(raw.get("histogram_buckets", 20)),
        percentiles=[float(p) for p in raw.get("percentiles", [0.25, 0.5, 0.75])],
        approx_percentiles=bool(raw.get("approx_percentiles", False)),
        repartition=(
            int(raw["repartition"]) if raw.get("repartition") is not None else None
        ),
    )
