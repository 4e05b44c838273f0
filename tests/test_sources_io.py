"""Source/sink layer: batch + streaming readers, partitioned writers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from soda_spark_spark.sources import read_source, read_stream_source, write_sink


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "x"), (3, "c", "y")],
        "id long, name string, part string",
    )


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_roundtrip(spark, df, tmp_path, fmt):
    path = str(tmp_path / fmt)
    write_sink(df, fmt, path, mode="overwrite")
    schema = None if fmt in ("parquet", "orc") else df.schema
    back = read_source(spark, fmt, path, schema=schema)
    assert {tuple(r) for r in back.select("id", "name", "part").collect()} == {
        tuple(r) for r in df.collect()
    }


def test_partitioned_write_prunes(spark, df, tmp_path):
    path = str(tmp_path / "pp")
    write_sink(df, "parquet", path, mode="overwrite", partition_by=["part"])
    back = read_source(spark, "parquet", path).filter(F.col("part") == "x")
    assert back.count() == 2
    # partition pruning: the physical plan's partition filters mention `part`
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "part" in plan


def test_unknown_format_raises(spark, df, tmp_path):
    with pytest.raises(ValueError, match="unsupported"):
        read_source(spark, "avroish", "/tmp/x")
    with pytest.raises(ValueError, match="unsupported"):
        write_sink(df, "avroish", str(tmp_path / "x"))


def test_stream_source_feeds_scan(spark, df, tmp_path):
    from soda_spark_spark.streaming import scan_stream

    src = str(tmp_path / "csv_src")
    write_sink(df, "csv", src, mode="overwrite")
    stream = read_stream_source(
        spark, "csv", src, schema=df.schema, max_files_per_trigger=1
    )
    results = {}
    q = scan_stream(
        stream,
        {"table_name": "s", "metrics": ["row_count"]},
        lambda bid, r: results.update({bid: r.metric_value("row_count")}),
        trigger={"availableNow": True},
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(60)
    assert sum(results.values()) == 3
