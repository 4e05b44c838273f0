from .scan_stream import (
    IncrementalScan,
    classifier_gate_batch_writer,
    curate_batch_writer,
    dedup_against_stream,
    dedup_stream,
    enrich_stream,
    quality_gate_stream,
    scan_stream,
    scan_stream_incremental,
    sketched_dedup_batch_writer,
    windowed_rollup,
)
from .sessionize_stream import sessionize_stream

__all__ = [
    "IncrementalScan",
    "classifier_gate_batch_writer",
    "curate_batch_writer",
    "quality_gate_stream",
    "sketched_dedup_batch_writer",
    "dedup_against_stream",
    "dedup_stream",
    "enrich_stream",
    "scan_stream",
    "scan_stream_incremental",
    "sessionize_stream",
    "windowed_rollup",
]
