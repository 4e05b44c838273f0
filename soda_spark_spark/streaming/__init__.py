from .scan_stream import (
    IncrementalScan,
    dedup_against_stream,
    dedup_stream,
    enrich_stream,
    scan_stream,
    scan_stream_incremental,
    windowed_rollup,
)
from .sessionize_stream import sessionize_stream

__all__ = [
    "IncrementalScan",
    "dedup_against_stream",
    "dedup_stream",
    "enrich_stream",
    "scan_stream",
    "scan_stream_incremental",
    "sessionize_stream",
    "windowed_rollup",
]
