"""Migration-compat surface (`soda_spark_spark.scan`) + robustness edges."""

from __future__ import annotations

import pytest

from soda_spark_spark import scan
from soda_spark_spark.publish import InMemoryPublisher


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame([(1, "x"), (2, None)], "id long, name string")


def test_reference_shaped_execute(df):
    result = scan.execute(
        "table_name: t\nmetrics: [row_count, missing_count]\ntests:\n- row_count > 0",
        df,
        variables=None,
        warehouse_name="wh1",
    )
    assert result.metric_value("row_count") == 2
    assert result.warehouse_name == "wh1"


def test_execute_with_server_client_publishes(df):
    client = InMemoryPublisher()
    result = scan.execute(
        "table_name: t\nmetrics: [row_count]",
        df,
        soda_server_client=client,
    )
    assert not result.has_errors()
    assert [c["type"] for c in client.commands][0] == "sodaSqlScanStart"
    assert client.commands[0]["tableName"] == "t"


def test_create_scan_yml_alias(df):
    yml = scan.create_scan_yml("table_name: demodata\nmetrics: [row_count]")
    assert yml.table_name == "demodata"


def test_as_frames_through_compat(df):
    m, t, e = scan.execute(
        "table_name: t\nmetrics: [row_count]", df, as_frames=True
    )
    assert len(m.columns) == 4 and len(t.columns) == 6 and len(e.columns) == 2


def test_exotic_column_names(spark):
    """Columns with dots and spaces must survive compilation (df[name]
    resolution, not F.col string parsing)."""
    from soda_spark_spark import execute

    sdf = spark.createDataFrame(
        [(1, "a"), (2, "b"), (None, "b")], ["weird.col name", "other col.x"]
    )
    r = execute(
        {"table_name": "t",
         "metrics": ["row_count", "missing_count", "min", "max"],
         "metric_groups": ["duplicates"]},
        sdf,
    )
    assert r.metric_value("missing_count", "weird.col name") == 1
    assert r.metric_value("max", "weird.col name") == 2
    assert r.metric_value("distinct", "other col.x") == 2
