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


# ---------------------------------------------------------------------------
# compaction_plan
# ---------------------------------------------------------------------------


def _files(spark):
    rows = [
        ("a/f1", 700, "p1"), ("a/f2", 600, "p1"), ("a/f3", 300, "p1"),
        ("a/f4", 250, "p1"), ("a/f5", 1500, "p1"),
        ("b/f6", 100, "p2"), ("b/f7", 2000, "p2"),
        ("c/f8", None, "p1"),
    ]
    return spark.createDataFrame(rows, "path string, size_bytes long, part string")


def test_compaction_plan_partitioned(spark):
    from soda_spark_spark.sources.io import compaction_plan

    out = compaction_plan(_files(spark), target_bytes=1000, partition_by=("part",))
    got = {r.path: (r.file_group, r.file_group_bytes) for r in out.collect()}
    # p1 smalls sorted desc: f1(700) f2(600) f3(300) f4(250); boundaries at 1000
    assert got["a/f1"] == (0, 1300) and got["a/f2"] == (0, 1300)
    assert got["a/f3"] == (1, 550) and got["a/f4"] == (1, 550)
    # large singleton numbered AFTER the packed groups
    assert got["a/f5"] == (2, 1500)
    # p2: one small, one large
    assert got["b/f6"] == (0, 100) and got["b/f7"] == (1, 2000)
    # unknown size -> NULL group
    assert got["c/f8"] == (None, None)


def test_compaction_plan_group_sizes_bounded(spark):
    import math

    from soda_spark_spark.sources.io import compaction_plan

    # exactly ceil(total/target) packed groups (the minimum possible),
    # each strictly under target + one member file (< 2*target here)
    rows = [(f"f{i:03d}", 100 + 7 * (i % 13), "p") for i in range(60)]
    df = spark.createDataFrame(rows, "path string, size_bytes long, part string")
    out = compaction_plan(df, target_bytes=400, partition_by=("part",))
    groups = {}
    for r in out.collect():
        groups.setdefault(r.file_group, []).append(r.size_bytes)
    total = sum(s for sizes in groups.values() for s in sizes)
    assert len(groups) == math.ceil(total / 400)
    assert set(groups) == set(range(len(groups)))  # dense from 0
    for g, sizes in groups.items():
        assert sum(sizes) < 400 + max(sizes), (g, sum(sizes))


def test_compaction_plan_global_large_only(spark):
    from soda_spark_spark.sources.io import compaction_plan

    df = spark.createDataFrame(
        [("x", 5000), ("y", 9000)], "path string, size_bytes long"
    )
    out = compaction_plan(df, target_bytes=1000)
    got = {r.path: r.file_group for r in out.collect()}
    assert got == {"y": 0, "x": 1}  # size-desc deterministic numbering


def test_compaction_plan_validation(spark):
    from soda_spark_spark.sources.io import compaction_plan

    with pytest.raises(ValueError, match="target_bytes"):
        compaction_plan(_files(spark), target_bytes=0)


# ---------------------------------------------------------------------------
# delimited (CSV/TSV) quarantine source
# ---------------------------------------------------------------------------


def _csv_docs(spark):
    return spark.createDataFrame(
        [
            (1, "src1", "hello world"),
            (2, "src2", 'text with, comma and "quotes" in it'),
            (3, "src3", "  edge  spaces  "),
        ],
        "doc_id long, source string, text string",
    )


def test_delimited_roundtrip_and_quarantine(spark, tmp_path):
    from soda_spark_spark.sources.delimited import (
        read_delimited, write_delimited,
    )
    from soda_spark_spark.sources.jsonl import corrupt_summary

    docs = _csv_docs(spark)
    out = str(tmp_path / "csv")
    write_delimited(docs.repartition(2), out)
    (tmp_path / "csv" / "zz-garbage.csv").write_text(
        "totally not csv\nnot_a_number,src,text\n"
    )
    back = read_delimited(
        spark, out, schema="doc_id long, source string, text string"
    ).cache()
    parsed = {r.doc_id: r.text for r in back.collect() if r.doc_id is not None}
    # byte-exact: commas/quotes quoted, edge whitespace NOT trimmed
    assert parsed == {r.doc_id: r.text for r in docs.collect()}
    s = corrupt_summary(back).collect()[0]
    assert (s.n_lines, s.n_parsed, s.n_corrupt) == (5, 3, 2)


def test_delimited_multiline_newline_fields(spark, tmp_path):
    from soda_spark_spark.sources.delimited import (
        read_delimited, write_delimited,
    )

    docs = spark.createDataFrame(
        [(1, "line\nbreak inside"), (2, "plain")],
        "doc_id long, text string",
    )
    out = str(tmp_path / "ml")
    write_delimited(docs, out, compression=None)
    back = read_delimited(
        spark, out, schema="doc_id long, text string", multiline=True
    ).cache()
    assert {r.doc_id: r.text for r in back.collect()} == {
        1: "line\nbreak inside", 2: "plain"
    }
    assert back.filter("_corrupt_record is not null").count() == 0


def test_delimited_tsv_and_header(spark, tmp_path):
    from soda_spark_spark.sources.delimited import (
        read_delimited, write_delimited,
    )

    docs = _csv_docs(spark)
    out = str(tmp_path / "tsv")
    write_delimited(docs, out, delimiter="\t", header=True, compression=None)
    back = read_delimited(
        spark, out, schema="doc_id long, source string, text string",
        delimiter="\t", header=True,
    ).cache()
    assert {r.doc_id: r.text for r in back.collect()} == {
        r.doc_id: r.text for r in docs.collect()
    }
