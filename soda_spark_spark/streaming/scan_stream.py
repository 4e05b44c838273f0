"""Streaming scans: reuse the batch MetricCompiler per micro-batch via
foreachBatch, plus watermarked windowed rollups for event tables.

The reference has no streaming surface (SURVEY.md §2.4); this is the additive
Structured-Streaming path: the same ScanDefinition drives a per-micro-batch
scan (exactly the batch semantics, incrementally), and `windowed_rollup`
gives the watermark/window aggregation a training-data event pipeline needs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.executor import run_scan
from ..plans.definition import ScanDefinition, create_scan_definition
from ..results import ScanResult


def scan_stream(
    stream_df: DataFrame,
    definition: ScanDefinition | str | dict,
    on_result: Callable[[int, ScanResult], None],
    *,
    trigger: dict | None = None,
    checkpoint_dir: str | None = None,
) -> StreamingQuery:
    """Run a scan on every micro-batch of a streaming DataFrame.

    `on_result(batch_id, scan_result)` receives each batch's ScanResult —
    push to a metrics sink, alert on failed tests, etc. The batch compiler is
    reused unchanged; each micro-batch is one fused .agg() job.
    """
    if not isinstance(definition, ScanDefinition):
        definition = create_scan_definition(definition)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        on_result(batch_id, run_scan(batch_df, definition))

    writer = stream_df.writeStream.foreachBatch(process)
    if trigger:
        writer = writer.trigger(**trigger)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def windowed_rollup(
    stream_df: DataFrame,
    *,
    ts_col: str,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: list[str] | None = None,
    agg_col: str | None = None,
) -> DataFrame:
    """Watermarked tumbling-window rollup: count + optional sum/avg per
    window (and group columns). Late rows beyond the watermark are dropped;
    state size stays bounded by (windows in watermark horizon x groups)."""
    groups = [F.window(F.col(ts_col), window_duration).alias("window")]
    if group_cols:
        groups += [F.col(c) for c in group_cols]
    aggs = [F.count(F.lit(1)).alias("n")]
    if agg_col:
        aggs += [
            F.sum(agg_col).alias(f"sum_{agg_col}"),
            F.avg(agg_col).alias(f"avg_{agg_col}"),
        ]
    return stream_df.withWatermark(ts_col, watermark).groupBy(*groups).agg(*aggs)
