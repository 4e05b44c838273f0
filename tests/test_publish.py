"""Tests for the publishing surface (command protocol + local sinks)."""

from __future__ import annotations

import json

import pytest

from soda_spark_spark import execute
from soda_spark_spark.publish import (
    InMemoryPublisher,
    JsonLinesPublisher,
    publish,
    write_result_frames,
)


@pytest.fixture(scope="module")
def result(spark):
    df = spark.createDataFrame([(1, "a"), (2, None)], "id long, name string")
    return execute(
        {"table_name": "t", "metrics": ["row_count", "missing_count"],
         "tests": ["row_count > 0"]},
        df,
    )


def test_command_sequence(result):
    pub = InMemoryPublisher()
    publish(result, pub, table_name="t")
    types = [c["type"] for c in pub.commands]
    assert types == [
        "sodaSqlScanStart",
        "sodaSqlMeasurements",
        "sodaSqlTestResults",
        "sodaSqlScanEnd",
    ]
    start = pub.commands[0]
    assert start["tableName"] == "t" and start["scanTime"]
    measurements = pub.commands[1]["measurements"]
    assert any(m["metric"] == "row_count" and m["value"] == 2 for m in measurements)


def test_commands_json_serializable(result):
    pub = InMemoryPublisher()
    publish(result, pub, table_name="t")
    for c in pub.commands:
        json.dumps(c, default=str)


def test_jsonlines_sink(result, tmp_path):
    path = tmp_path / "commands.jsonl"
    publish(result, JsonLinesPublisher(path), table_name="t")
    lines = [json.loads(line) for line in path.read_text().splitlines()]
    assert lines[0]["type"] == "sodaSqlScanStart"
    assert len(lines) == 4


def test_parquet_result_sink(result, spark, tmp_path):
    write_result_frames(result, str(tmp_path / "out"), spark)
    m = spark.read.parquet(str(tmp_path / "out/measurements"))
    t = spark.read.parquet(str(tmp_path / "out/test_results"))
    e = spark.read.parquet(str(tmp_path / "out/errors"))
    assert m.count() == len(result.measurements)
    assert t.count() == 1
    assert e.count() == 0


def test_grouped_sql_metric_tests(spark):
    """Per-group test evaluation with group_values in each TestResult."""
    df = spark.createDataFrame(
        [("US", 10), ("US", 20), ("NL", 1)], "country string, size long"
    )
    r = execute(
        {"table_name": "g", "metrics": ["row_count"],
         "sql_metrics": [{
             "sql": "SELECT country, CAST(sum(size) AS BIGINT) AS total FROM g GROUP BY country",
             "group_fields": ["country"],
             "tests": ["total > 5"],
         }]},
        df,
    )
    grouped = [t for t in r.test_results if t.group_values is not None]
    assert len(grouped) == 2
    by_country = {t.group_values["country"]: t for t in grouped}
    assert by_country["US"].passed and by_country["US"].values["total"] == 30
    assert not by_country["NL"].passed


def test_http_publisher_against_local_server(result):
    """HttpPublisher end-to-end against an in-process HTTP server."""
    import http.server
    import threading

    received = {"commands": [], "files": []}

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
            if self.path == "/commands":
                received["commands"].append(json.loads(body))
                out = b'{"scanReference": "ref-1"}'
            else:
                received["files"].append(body)
                out = b'{"fileId": "file-9"}'
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def log_message(self, *a):  # quiet
            pass

    server = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        from soda_spark_spark.publish import HttpPublisher

        pub = HttpPublisher(
            f"http://127.0.0.1:{server.server_port}", token="tok"
        )
        result.samples[("table",)] = []  # empty sample set -> still a file cmd
        publish(result, pub, table_name="t")
    finally:
        server.shutdown()
        thread.join(timeout=5)
    types = [c["type"] for c in received["commands"]]
    assert types[0] == "sodaSqlScanStart" and types[-1] == "sodaSqlScanEnd"
    file_cmds = [c for c in received["commands"] if c["type"] == "sodaSqlScanFile"]
    assert file_cmds and file_cmds[0]["fileId"] == "file-9"
    result.samples.pop(("table",), None)
