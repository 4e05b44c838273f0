"""JSONL source (`sources.jsonl`): quarantine contract, round-trip,
health summary."""

from __future__ import annotations

import gzip
import os

import pytest
from pyspark.sql import functions as F

from soda_spark_spark.sources.jsonl import (
    corrupt_summary, read_jsonl, write_jsonl,
)


def test_jsonl_roundtrip_gzip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "alpha"), (2, 'quote " and \\ backslash'), (3, "uni é中")],
        "doc_id long, text string",
    )
    out = str(tmp_path / "shards")
    write_jsonl(df, out)
    assert any(f.endswith(".gz") for f in os.listdir(out))
    back = read_jsonl(spark, out, schema="doc_id long, text string")
    got = {r.doc_id: r.text for r in back.collect()}
    assert got == {1: "alpha", 2: 'quote " and \\ backslash', 3: "uni é中"}
    # NB: corrupt-only COUNTS over raw JSON scans are disallowed by
    # Spark (column pruning leaves only the corrupt column referenced;
    # documented in read_jsonl) — collect() references every column
    assert back.filter(F.col("_corrupt_record").isNotNull()).collect() == []


def test_jsonl_corrupt_quarantine(spark, tmp_path):
    d = tmp_path / "mixed"
    d.mkdir()
    (d / "good.jsonl").write_text(
        '{"doc_id": 1, "text": "ok"}\n{"doc_id": 2, "text": "also ok"}\n'
    )
    (d / "bad.jsonl").write_text(
        'not json at all\n{"doc_id": 3, "text": "fine"}\n{broken\n'
    )
    df = read_jsonl(spark, str(d), schema="doc_id long, text string")
    ok = df.filter(F.col("_corrupt_record").isNull()).select("doc_id")
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert sorted(r.doc_id for r in ok.collect()) == [1, 2, 3]
    # corrupt rows carry the raw line and NULL schema columns
    rows = bad.collect()
    assert len(rows) == 2
    assert all(r.doc_id is None for r in rows)
    assert {r._corrupt_record for r in rows} == {"not json at all", "{broken"}
    s = corrupt_summary(df).collect()[0]
    assert (s.n_lines, s.n_parsed, s.n_corrupt, s.n_key_nonnull) == (5, 3, 2, 3)


def test_jsonl_type_drift_lands_in_corrupt_channel(spark, tmp_path):
    d = tmp_path / "drift"
    d.mkdir()
    (d / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "ok"}\n{"doc_id": "not-a-number", "text": "x"}\n'
    )
    df = read_jsonl(spark, str(d), schema="doc_id long, text string")
    assert len(df.filter(F.col("_corrupt_record").isNotNull()).collect()) == 1


def test_jsonl_gz_file_reads(spark, tmp_path):
    d = tmp_path / "gz"
    d.mkdir()
    with gzip.open(d / "part-0.jsonl.gz", "wt") as f:
        f.write('{"doc_id": 7, "text": "zipped"}\n')
    df = read_jsonl(spark, str(d), schema="doc_id long, text string")
    assert [r.text for r in df.collect()] == ["zipped"]


def test_jsonl_stream_quarantine_router(spark, tmp_path):
    from soda_spark_spark.sources.jsonl import (
        jsonl_quarantine_batch_writer, read_jsonl_stream,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "long enough body text"}\n'
        "garbage line\n"
        '{"doc_id": 2, "text": "xx"}\n'
    )
    good_dir = str(tmp_path / "good")
    quar_dir = str(tmp_path / "quarantine")
    q = (
        read_jsonl_stream(
            spark, str(landing), schema="doc_id long, text string"
        )
        .writeStream.foreachBatch(
            jsonl_quarantine_batch_writer(
                good_dir, quar_dir,
                gate=lambda df: df.filter(F.length("text") >= 10),
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    good = spark.read.parquet(good_dir).collect()
    assert [r.doc_id for r in good] == [1]  # doc 2 gated out on length
    quar = spark.read.parquet(quar_dir).collect()
    assert [r.raw_line for r in quar] == ["garbage line"]
    assert quar[0].batch_id == 0
