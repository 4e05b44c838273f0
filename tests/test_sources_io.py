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


def test_compact_files_reduces_file_count(spark, tmp_path):
    from soda_spark_spark.sources import compact_files

    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    df = spark.createDataFrame([(i, f"row-{i}") for i in range(1000)], "k long, v string")
    # fragment into 40 tiny files
    df.repartition(40).write.parquet(src)
    import glob

    assert len(glob.glob(f"{src}/part-*")) == 40
    n = compact_files(spark, "parquet", src, dst, target_file_bytes=1 << 30)
    assert n == 1
    assert len(glob.glob(f"{dst}/part-*")) == 1
    got = spark.read.parquet(dst)
    assert got.count() == 1000
    assert sorted(got.columns) == ["k", "v"]


def test_compact_files_target_splits(spark, tmp_path):
    from soda_spark_spark.sources import compact_files
    from soda_spark_spark.sources.io import _dir_bytes

    src = str(tmp_path / "frag2")
    dst = str(tmp_path / "comp2")
    spark.createDataFrame(
        [(i, "x" * 100) for i in range(5000)], "k long, v string"
    ).repartition(20).write.parquet(src)
    total = _dir_bytes(spark, src)
    # target a quarter of the source: expect ceil(total / (total//4)) ~ 4-5 files
    n = compact_files(spark, "parquet", src, dst, target_file_bytes=max(total // 4, 1))
    assert 4 <= n <= 5
    import glob

    assert len(glob.glob(f"{dst}/part-*")) == n


def test_text_source_reads_one_doc_per_line(spark, tmp_path):
    path = str(tmp_path / "corpus")
    docs = spark.createDataFrame(
        [("first document line",), ("second doc",), ("third one here",)],
        "value string",
    )
    write_sink(docs, "text", path, mode="overwrite")
    back = read_source(spark, "text", path)
    assert back.columns == ["value"]
    assert {r.value for r in back.collect()} == {
        "first document line", "second doc", "third one here"
    }


def test_text_stream_source(spark, tmp_path):
    path = str(tmp_path / "scorpus")
    spark.createDataFrame([("line a",), ("line b",)], "value string") \
        .write.format("text").save(path)
    stream = read_stream_source(
        spark, "text", path, schema="value string", max_files_per_trigger=1
    )
    assert stream.isStreaming and stream.columns == ["value"]
