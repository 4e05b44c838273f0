"""MetricCompiler: ScanDefinition + df.schema -> one fused set of aggregate
Columns plus per-column group/profile plans.

This replaces the reference stack's SQL-string generation (soda-sql dialect →
mock cursor → `spark.sql`, /root/reference/src/sodaspark/scan.py:94-159)
with native Catalyst expressions. All table+column metrics (SURVEY.md §2.2
M2-M19) compile into ONE wide `.agg()` so the table is scanned exactly once
— the engine's core performance property (SURVEY.md §4). Group metrics
(M20-M26) compile into per-column groupBy plans that read a single
parquet-pruned column each.

Determinism at scale: sums over floating-point columns are computed as exact
DECIMAL(38,6) sums (and sum-of-squares as per-row double squares cast to
decimal, then exact decimal sum), so results do not depend on partition count
or aggregation order — a scan at 32 partitions and at 100k partitions returns
bit-identical measurements, and variance/stddev derive from the exact sums
driver-side. (Caveat: values with |x| >= ~1e16 overflow the square's decimal
and yield null variance.)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.formats import is_numeric_format
from ..functions.predicates import missing_expr, numeric_value_expr, validity_expr
from .definition import (
    DUPLICATES_METRICS,
    LENGTH_METRICS,
    MISSING_METRICS,
    PROFILING_METRICS,
    STATISTICS_METRICS,
    VALIDITY_METRICS,
    ColumnConfig,
    ScanDefinition,
)

SUM_DECIMAL = T.DecimalType(38, 6)

# canonical emission order of per-column metrics
COLUMN_METRIC_ORDER = [
    "missing_count",
    "missing_percentage",
    "values_count",
    "values_percentage",
    "valid_count",
    "valid_percentage",
    "invalid_count",
    "invalid_percentage",
    "min_length",
    "max_length",
    "avg_length",
    "min",
    "max",
    "avg",
    "sum",
    "variance",
    "stddev",
    "distinct",
    "unique_count",
    "uniqueness",
    "duplicate_count",
    "frequent_values",
    "mins",
    "maxs",
    "histogram",
    "percentiles",
]


def type_category(dtype: T.DataType) -> str:
    """soda-sql's taxonomy derived from the Spark DataType (SURVEY.md §1.2):
    text / number / time, plus 'boolean' — a scalar category eligible for
    missing/validity/duplicates metrics but not numeric statistics; anything
    non-scalar is 'other' and skipped by per-column metrics."""
    if isinstance(dtype, T.StringType):
        return "text"
    if isinstance(dtype, T.BooleanType):
        return "boolean"
    if isinstance(dtype, T.NumericType):
        return "number"
    if isinstance(dtype, (T.DateType, T.TimestampType, T.TimestampNTZType)):
        return "time"
    return "other"


@dataclass
class ColumnPlan:
    name: str
    category: str
    integral: bool
    metrics: set[str]
    col: Column
    miss: Column
    valid: Column | None
    vnum: Column | None  # numeric value over non-missing (and valid) rows
    num_integral: bool
    group_metrics: set[str] = field(default_factory=set)
    profile_metrics: set[str] = field(default_factory=set)

    @property
    def values(self) -> Column:
        return ~self.miss


@dataclass
class CompiledScan:
    definition: ScanDefinition
    column_order: list[str]
    columns: dict[str, ColumnPlan]
    agg_exprs: list[Column]
    slots: dict[tuple[str, str], str]  # (column|'', kind) -> agg alias


def _applicable_metrics(
    requested: set[str], category: str, cfg: ColumnConfig | None
) -> set[str]:
    """Filter requested metrics down to those applicable to the column's type
    category (SURVEY.md §2.3: lengths → text; statistics → number or
    numerically-valid text; missing/validity/duplicates → all scalars)."""
    out: set[str] = set()
    out |= requested & MISSING_METRICS
    out |= requested & VALIDITY_METRICS
    out |= requested & DUPLICATES_METRICS
    if "frequent_values" in requested:
        out.add("frequent_values")
    if category == "text":
        out |= requested & LENGTH_METRICS
        if cfg is not None and is_numeric_format(cfg.valid_format):
            out |= requested & STATISTICS_METRICS
            out |= requested & {"mins", "maxs", "histogram", "percentiles"}
    elif category == "number":
        out |= requested & STATISTICS_METRICS
        out |= requested & {"mins", "maxs", "histogram", "percentiles"}
    elif category == "time":
        # min/max are meaningful on time columns, other stats are not
        out |= requested & {"min", "max"}
    return out


def compile_scan(definition: ScanDefinition, df: DataFrame) -> CompiledScan:
    slots: dict[tuple[str, str], str] = {}
    agg_exprs: list[Column] = []

    def add(column: str, kind: str, expr: Column) -> None:
        alias = f"s{len(agg_exprs)}"
        slots[(column, kind)] = alias
        agg_exprs.append(expr.alias(alias))

    # row_count is always computed: percentages and tests derive from it
    add("", "row_count", F.count(F.lit(1)))

    excluded = set(definition.excluded_columns)
    column_order: list[str] = []
    plans: dict[str, ColumnPlan] = {}

    for fld in df.schema.fields:
        name = fld.name
        if name in excluded:
            continue  # C1: excluded columns produce no measurements at all
        category = type_category(fld.dataType)
        if category == "other":
            continue  # non-scalar columns are skipped (SURVEY.md §1.4)
        cfg = definition.columns.get(name)
        requested = definition.effective_metrics(name)
        metrics = _applicable_metrics(requested, category, cfg)
        if not metrics:
            continue
        column_order.append(name)

        # backtick-quote so exotic names with dots/spaces resolve as a single
        # top-level column, not a nested-field path
        col = F.col("`" + name.replace("`", "``") + "`")
        is_text = category == "text"
        miss = missing_expr(col, cfg)
        valid = validity_expr(col, cfg, is_text=is_text)
        vnum_raw = numeric_value_expr(
            col, cfg, is_text=is_text, is_numeric=category == "number"
        )
        integral = isinstance(
            fld.dataType, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
        )
        vnum = None
        if vnum_raw is not None:
            gate = ~miss if valid is None else (~miss) & valid
            vnum = F.when(gate, vnum_raw)

        plan = ColumnPlan(
            name=name,
            category=category,
            integral=integral,
            metrics=metrics,
            col=col,
            miss=miss,
            valid=valid,
            vnum=vnum,
            num_integral=integral and category == "number",
            group_metrics=metrics & DUPLICATES_METRICS,
            profile_metrics=metrics & PROFILING_METRICS,
        )
        plans[name] = plan

        # --- fused aggregate slots for this column
        if metrics & (MISSING_METRICS | VALIDITY_METRICS | LENGTH_METRICS | {"uniqueness"}):
            add(name, "missing_count", F.count(F.when(miss, True)))
        if valid is not None and metrics & VALIDITY_METRICS:
            add(name, "valid_count", F.count(F.when((~miss) & valid, True)))
        if metrics & LENGTH_METRICS:
            length = F.when(~miss, F.length(col))
            if "min_length" in metrics:
                add(name, "len_min", F.min(length))
            if "max_length" in metrics:
                add(name, "len_max", F.max(length))
            if "avg_length" in metrics:
                add(name, "len_sum", F.sum(length.cast("long")))
        if vnum is None and metrics & {"min", "max"}:
            # time columns: min/max aggregate the raw (non-missing) value
            raw_val = F.when(~miss, col)
            if "min" in metrics:
                add(name, "raw_min", F.min(raw_val))
            if "max" in metrics:
                add(name, "raw_max", F.max(raw_val))
        if vnum is not None and metrics & (STATISTICS_METRICS | {"histogram", "percentiles"}):
            stats = metrics & STATISTICS_METRICS
            if "min" in stats or "histogram" in metrics:
                add(name, "num_min", F.min(vnum))
            if "max" in stats or "histogram" in metrics:
                add(name, "num_max", F.max(vnum))
            if stats & {"avg", "sum", "variance", "stddev"}:
                add(name, "num_sum", F.sum(vnum.cast(SUM_DECIMAL)))
            if stats & {"avg", "variance", "stddev"}:
                add(name, "num_cnt", F.count(vnum))
            if stats & {"variance", "stddev"}:
                sq = vnum.cast("double") * vnum.cast("double")
                add(name, "num_sumsq", F.sum(sq.cast(SUM_DECIMAL)))
            if "percentiles" in metrics and definition.percentiles:
                pcts = list(definition.percentiles)
                if definition.approx_percentiles:
                    # t-digest-style sketch: single-pass, mergeable, bounded
                    # memory — the 100TB path
                    add(name, "percentiles", F.percentile_approx(vnum, pcts, 10000))
                else:
                    # exact (sort-based) — matches an exact SQL oracle
                    add(name, "percentiles", F.percentile(vnum, pcts))
        if definition.approx_distinct and "distinct" in plan.group_metrics:
            # scale fast-path: approx distinct folds into the single scan and
            # the per-column groupBy pass is skipped for `distinct`
            add(name, "approx_distinct", F.approx_count_distinct(F.when(~miss, col)))

    return CompiledScan(
        definition=definition,
        column_order=column_order,
        columns=plans,
        agg_exprs=agg_exprs,
        slots=slots,
    )


def group_metrics_aggregation(df: DataFrame, plan: ColumnPlan) -> DataFrame:
    """Per-column duplicates pass (M20-M23): one groupBy job per column.

    Two-level aggregation — groupBy(col).count() then a single-row summary —
    which Spark executes with map-side partial aggregation; with parquet
    column pruning each pass reads exactly one column. Returns a 1-row DF with
    `distinct`, `unique_count`, `duplicate_count`.
    """
    vc = df.filter(~plan.miss).groupBy(plan.col.alias("__value")).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    return vc.agg(
        F.count(F.lit(1)).alias("distinct"),
        F.count(F.when(F.col("__cnt") == 1, True)).alias("unique_count"),
        F.count(F.when(F.col("__cnt") > 1, True)).alias("duplicate_count"),
    )


def frequent_values_plan(df: DataFrame, plan: ColumnPlan, k: int) -> DataFrame:
    """M24: top-k values by frequency, deterministic tie-break on value."""
    return (
        df.filter(~plan.miss)
        .groupBy(plan.col.alias("value"))
        .agg(F.count(F.lit(1)).alias("frequency"))
        .orderBy(F.desc("frequency"), F.asc("value"))
        .limit(k)
    )


def mins_maxs_plan(df: DataFrame, plan: ColumnPlan, k: int, ascending: bool) -> DataFrame:
    """M25: k smallest/largest distinct numeric values."""
    assert plan.vnum is not None
    vals = df.select(plan.vnum.alias("value")).filter(F.col("value").isNotNull()).distinct()
    order = F.asc("value") if ascending else F.desc("value")
    return vals.orderBy(order).limit(k)


def histogram_plan(
    df: DataFrame, plan: ColumnPlan, lo: float, hi: float, buckets: int
) -> DataFrame:
    """M26: fixed-width histogram between lo/hi (from the fused min/max pass).

    Bucket formula `least(floor((x - lo) / width), buckets-1)` keeps the max
    value in the last bucket; runs as one groupBy over the pruned column.
    """
    assert plan.vnum is not None
    width = (hi - lo) / buckets
    if width <= 0:  # constant column: single bucket
        return df.select(plan.vnum.alias("v")).filter(F.col("v").isNotNull()).agg(
            F.lit(0).alias("bucket"), F.count(F.lit(1)).alias("frequency")
        )
    x = plan.vnum.cast("double")
    bucket = F.least(
        F.floor((x - F.lit(float(lo))) / F.lit(float(width))),
        F.lit(buckets - 1),
    )
    return (
        df.select(bucket.alias("bucket"))
        .filter(F.col("bucket").isNotNull())
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("frequency"))
        .orderBy("bucket")
    )
