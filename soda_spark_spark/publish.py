"""Result publishing: the reference pushes scan results to Soda Cloud with a
command protocol (scanStart / measurements / testResults / file uploads —
vocabulary visible in MockSodaServerClient,
/root/reference/tests/test_scan.py:90-139). This module reproduces that
*surface* without any network dependency: a `ScanPublisher` protocol, a
command builder emitting the same command types, and local sinks (in-memory,
JSON-lines file, parquet result frames).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Protocol

from pyspark.sql import SparkSession

from .results import ScanResult, scan_result_to_data_frames


class ScanPublisher(Protocol):
    def execute_command(self, command: dict) -> Any: ...


def build_commands(
    result: ScanResult, *, table_name: str, scan_reference: str | None = None
) -> list[dict]:
    """Build the command sequence for a completed scan, mirroring the
    reference protocol's command types."""
    commands: list[dict] = [
        {
            "type": "sodaSqlScanStart",
            "warehouseName": result.warehouse_name,
            "tableName": table_name,
            "scanTime": result.scan_time,
        }
    ]
    if result.measurements:
        commands.append(
            {
                "type": "sodaSqlMeasurements",
                "measurements": [dataclasses.asdict(m) for m in result.measurements],
            }
        )
    if result.test_results:
        commands.append(
            {
                "type": "sodaSqlTestResults",
                "testResults": [dataclasses.asdict(t) for t in result.test_results],
            }
        )
    if result.errors:
        commands.append(
            {
                "type": "sodaSqlScanErrors",
                "errors": [dataclasses.asdict(e) for e in result.errors],
            }
        )
    commands.append(
        {"type": "sodaSqlScanEnd", "scanReference": scan_reference}
    )
    return commands


def publish(
    result: ScanResult,
    publisher: ScanPublisher,
    *,
    table_name: str,
) -> list[Any]:
    """Send the scan's command sequence to a publisher; each command is
    JSON-serializable by construction (the reference's mock asserts exactly
    that). Returns the publisher responses."""
    responses = []
    scan_reference = None
    for command in build_commands(result, table_name=table_name):
        json.dumps(command, default=str)  # serializability invariant
        out = publisher.execute_command(command)
        if isinstance(out, dict) and "scanReference" in out:
            scan_reference = out["scanReference"]
        responses.append(out)
    _ = scan_reference
    return responses


class InMemoryPublisher:
    """Captures commands — the local analogue of MockSodaServerClient."""

    def __init__(self) -> None:
        self.commands: list[dict] = []

    def execute_command(self, command: dict) -> Any:
        self.commands.append(command)
        if command["type"] == "sodaSqlScanStart":
            return {"scanReference": f"scanref-{len(self.commands)}"}
        return None


class JsonLinesPublisher:
    """Appends each command as one JSON line — a durable local sink."""

    def __init__(self, path: str | Path) -> None:
        self.path = Path(path)

    def execute_command(self, command: dict) -> Any:
        with self.path.open("a") as f:
            f.write(json.dumps(command, default=str) + "\n")
        return None


def write_result_frames(
    result: ScanResult,
    base_path: str,
    spark: SparkSession | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist the three fixed-schema result frames as parquet under
    base_path/{measurements,test_results,errors} — the batch sink for scan
    pipelines (downstream dashboards read these like any other table)."""
    m, t, e = scan_result_to_data_frames(result, spark)
    m.write.mode(mode).parquet(f"{base_path}/measurements")
    t.write.mode(mode).parquet(f"{base_path}/test_results")
    e.write.mode(mode).parquet(f"{base_path}/errors")
