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
import io
import json
from pathlib import Path
from typing import Any, BinaryIO, Protocol

from pyspark.sql import SparkSession

from .results import ScanResult, scan_result_to_data_frames


class ScanPublisher(Protocol):
    def execute_command(self, command: dict) -> Any: ...


def _sample_rows_jsonl(rows: list) -> bytes:
    """Sample rows as JSON-lines bytes (the reference uploads sample rows as
    files, tests/test_scan.py:134-139 `_upload_file`)."""
    out = io.StringIO()
    for r in rows:
        d = r.asDict(recursive=True) if hasattr(r, "asDict") else dict(r)
        out.write(json.dumps(d, default=str) + "\n")
    return out.getvalue().encode("utf-8")


def build_sample_file_commands(
    result: ScanResult, publisher: Any, *, table_name: str
) -> list[dict]:
    """Upload each sample set (S1 table samples / S2 failed rows) as a
    JSON-lines file and build one file-reference command per set.

    Publishers exposing the reference client's ``_upload_file(headers,
    temp_file)`` surface (tests/test_scan.py:134-139) receive the rows as a
    file and the command carries the returned ``fileId``; other publishers
    get the rows inlined under ``rows`` so no sample data is ever dropped.
    """
    commands: list[dict] = []
    for key in sorted(result.samples):
        rows = result.samples[key]
        sample_type = "datasetSample" if key[0] == "table" else "failedRowsSample"
        column_name = key[1] if len(key) > 1 else None
        command: dict = {
            "type": "sodaSqlScanFile",
            "sampleType": sample_type,
            "tableName": table_name,
            "columnName": column_name,
            "stored": len(rows),
        }
        payload = _sample_rows_jsonl(rows)
        upload = getattr(publisher, "_upload_file", None)
        if callable(upload):
            headers = {
                "Content-Type": "application/octet-stream",
                "Soda-File-Type": sample_type,
            }
            temp_file: BinaryIO = io.BytesIO(payload)
            response = upload(headers, temp_file)
            command["fileId"] = (response or {}).get("fileId")
        else:
            command["rows"] = payload.decode("utf-8").splitlines()
        commands.append(command)
    return commands


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
    commands = build_commands(result, table_name=table_name)
    # sample file commands go before scanEnd (the reference uploads sample
    # files during the scan, before closing it)
    if result.samples:
        commands[-1:-1] = build_sample_file_commands(
            result, publisher, table_name=table_name
        )
    for command in commands:
        json.dumps(command, default=str)  # serializability invariant
        out = publisher.execute_command(command)
        if isinstance(out, dict) and "scanReference" in out:
            scan_reference = out["scanReference"]
        responses.append(out)
    _ = scan_reference
    return responses


class InMemoryPublisher:
    """Captures commands and file uploads — the local analogue of
    MockSodaServerClient (tests/test_scan.py:84-139, incl. `_upload_file`)."""

    def __init__(self) -> None:
        self.commands: list[dict] = []
        self.file_uploads: dict[str, dict] = {}

    def execute_command(self, command: dict) -> Any:
        self.commands.append(command)
        if command["type"] == "sodaSqlScanStart":
            return {"scanReference": f"scanref-{len(self.commands)}"}
        return None

    def _upload_file(self, headers: Any, temp_file: Any) -> dict:
        file_id = f"file-{len(self.file_uploads)}"
        data = temp_file.read().decode("utf-8")
        self.file_uploads[file_id] = {"headers": headers, "data": data}
        temp_file.close()
        return {"fileId": file_id}


class HttpPublisher:
    """Generic HTTP command publisher: POSTs each scan command as JSON to a
    configurable endpoint (the transport the reference delegates to its
    cloud client; here a dependency-free stdlib implementation so any
    HTTP-speaking metrics backend can receive the protocol).

    File uploads implement the `_upload_file(headers, temp_file)` surface
    (tests/test_scan.py:134-139): payload bytes PUT/POST to
    `{base_url}/files`, response JSON expected to carry `fileId`.
    """

    def __init__(
        self,
        base_url: str,
        *,
        token: str | None = None,
        timeout_s: float = 30.0,
        command_path: str = "/commands",
        file_path: str = "/files",
    ) -> None:
        self.base_url = base_url.rstrip("/")
        self.token = token
        self.timeout_s = timeout_s
        self.command_path = command_path
        self.file_path = file_path

    def _headers(self, extra: dict | None = None) -> dict:
        headers = {"Content-Type": "application/json"}
        if self.token:
            headers["Authorization"] = f"Bearer {self.token}"
        if extra:
            headers.update(extra)
        return headers

    def _post(self, path: str, body: bytes, headers: dict) -> Any:
        import urllib.request

        req = urllib.request.Request(
            self.base_url + path, data=body, headers=headers, method="POST"
        )
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            data = resp.read()
        try:
            return json.loads(data) if data else None
        except json.JSONDecodeError:
            return None

    def execute_command(self, command: dict) -> Any:
        body = json.dumps(command, default=str).encode("utf-8")
        return self._post(self.command_path, body, self._headers())

    def _upload_file(self, headers: Any, temp_file: Any) -> dict:
        payload = temp_file.read()
        temp_file.close()
        extra = dict(headers) if isinstance(headers, dict) else {}
        extra.setdefault("Content-Type", "application/octet-stream")
        out = self._post(self.file_path, payload, self._headers(extra))
        return out if isinstance(out, dict) else {"fileId": None}


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
