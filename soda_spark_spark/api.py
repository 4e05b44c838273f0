"""Public API: `execute` mirrors the reference's flagship entry point
(`/root/reference/src/sodaspark/scan.py:424-474`, operator A1) with the same
call shape, but compiles the scan to native DataFrame operations instead of
routing SQL strings through a mock DB-API cursor.
"""

from __future__ import annotations

import datetime as dt
from pathlib import Path
from typing import Any

from pyspark.sql import DataFrame

from .operators.executor import run_scan
from .plans.definition import ScanDefinition, create_scan_definition
from .results import ScanResult, scan_result_to_data_frames


def execute(
    scan_definition: str | Path | dict,
    df: DataFrame,
    *,
    variables: dict[str, Any] | None = None,
    as_frames: bool = False,
    time: str | None = None,
    warehouse_name: str = "soda_spark_spark",
) -> ScanResult | tuple[DataFrame, DataFrame, DataFrame]:
    """Execute a scan of `df` described by `scan_definition` (YAML text, path,
    or dict). Returns a ScanResult, or the three fixed-schema DataFrames when
    `as_frames=True` (reference scan.py:469-471).

    `time` (ISO-8601, defaults to UTC now — reference scan.py:269-280, C3)
    and `warehouse_name` (reference scan.py:428-429, C4) are scan metadata;
    they do not affect computation.
    """
    definition = create_scan_definition(scan_definition, variables)
    result = run_scan(df, definition)
    result.scan_time = time or dt.datetime.now(tz=dt.timezone.utc).isoformat(
        timespec="seconds"
    )
    result.warehouse_name = warehouse_name
    if as_frames:
        return scan_result_to_data_frames(result, df.sparkSession)
    return result


def metrics_row_frame(
    df: DataFrame,
    definition: ScanDefinition | dict | str,
    selections: list[tuple[str, str, str | None, str]],
) -> DataFrame:
    """Run a scan and expose selected metric values as a one-row DataFrame.

    `selections` is a list of (output_name, metric, column_name, spark_type)
    with spark_type in {'long','double','string'}. This is the oracle-friendly
    face of the engine: typed scalars, deterministic values.
    """
    from pyspark.sql import types as T

    if not isinstance(definition, ScanDefinition):
        definition = create_scan_definition(definition)
    result = run_scan(df, definition)
    type_map = {"long": T.LongType(), "double": T.DoubleType(), "string": T.StringType()}
    values: list[Any] = []
    fields: list[T.StructField] = []
    for out_name, metric, column, typ in selections:
        v = result.metric_value(metric, column)
        if v is not None:
            v = {"long": int, "double": float, "string": str}[typ](v)
        values.append(v)
        fields.append(T.StructField(out_name, type_map[typ], True))
    return df.sparkSession.createDataFrame([tuple(values)], T.StructType(fields))


def explain_scan(
    df: DataFrame, definition: ScanDefinition | dict | str | Path
) -> dict[str, str]:
    """Formatted physical plans for every Spark job a scan would run —
    the operational introspection face of the compiler. Keys: 'fused_agg'
    plus 'group:<column>' per duplicates pass. Nothing is executed."""
    import contextlib
    import io

    from pyspark.sql import functions as F  # noqa: F401

    from .plans.compiler import compile_scan, group_metrics_aggregation

    if not isinstance(definition, ScanDefinition):
        definition = create_scan_definition(definition)
    compiled = compile_scan(definition, df)

    def captured(frame: DataFrame) -> str:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            frame.explain("formatted")
        return buf.getvalue()

    out = {"fused_agg": captured(df.agg(*compiled.agg_exprs))}
    for name in compiled.column_order:
        plan = compiled.columns[name]
        if plan.group_metrics and not (
            definition.approx_distinct and plan.group_metrics == {"distinct"}
        ):
            out[f"group:{name}"] = captured(group_metrics_aggregation(df, plan))
    return out


def scan_dataframe(
    df: DataFrame, definition: ScanDefinition | dict | str | Path
) -> ScanResult:
    """Lower-level entry: run a pre-parsed ScanDefinition against a DataFrame."""
    if not isinstance(definition, ScanDefinition):
        definition = create_scan_definition(definition)
    return run_scan(df, definition)
