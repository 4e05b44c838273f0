"""Incremental (stateful) streaming scan: cumulative metrics across
micro-batches must equal a batch scan over the union of all batches."""

from __future__ import annotations

import pytest

from soda_spark_spark import execute
from soda_spark_spark.streaming.scan_stream import IncrementalScan

DEFN = {
    "table_name": "inc",
    "metrics": [
        "row_count", "missing_count", "missing_percentage", "values_count",
        "min_length", "max_length", "avg_length",
        "min", "max", "avg", "sum", "variance", "stddev",
    ],
    "tests": ["row_count > 0"],
}


@pytest.fixture()
def batches(spark):
    b1 = spark.createDataFrame(
        [(1, "aa", 10.5), (2, None, 3.25), (3, "cccc", None)],
        "id long, name string, v double",
    )
    b2 = spark.createDataFrame(
        [(4, "d", 100.0), (5, "eeeee", -7.75), (6, None, 0.5)],
        "id long, name string, v double",
    )
    return b1, b2


def test_cumulative_equals_batch_scan_over_union(spark, batches):
    b1, b2 = batches
    inc = IncrementalScan(DEFN)
    inc.update(b1)
    cumulative = inc.update(b2)
    full = execute(dict(DEFN), b1.unionByName(b2))

    check = [
        ("row_count", None), ("missing_count", "name"),
        ("missing_percentage", "name"), ("values_count", "name"),
        ("min_length", "name"), ("max_length", "name"), ("avg_length", "name"),
        ("min", "v"), ("max", "v"), ("avg", "v"), ("sum", "v"),
        ("variance", "v"), ("stddev", "v"),
    ]
    for metric, col in check:
        assert cumulative.metric_value(metric, col) == pytest.approx(
            full.metric_value(metric, col)
        ), (metric, col)


def test_cumulative_state_updates_monotonically(spark, batches):
    b1, b2 = batches
    inc = IncrementalScan(DEFN)
    r1 = inc.update(b1)
    assert r1.metric_value("row_count") == 3
    r2 = inc.update(b2)
    assert r2.metric_value("row_count") == 6
    assert r2.metric_value("min", "v") == -7.75
    assert r2.metric_value("max", "v") == 100.0


def test_cumulative_tests_evaluate_each_batch(spark, batches):
    b1, _ = batches
    inc = IncrementalScan(DEFN)
    r = inc.update(b1)
    tr = next(t for t in r.test_results if t.test.expression == "row_count > 0")
    assert tr.passed


def test_incremental_via_streaming(spark, batches, tmp_path):
    """End-to-end through readStream/foreachBatch."""
    import time

    from soda_spark_spark.streaming.scan_stream import scan_stream_incremental

    b1, b2 = batches
    src = tmp_path / "src"
    b1.write.mode("overwrite").parquet(str(src))
    results = {}
    stream = (
        spark.readStream.schema(b1.schema).parquet(str(src))
    )
    q = scan_stream_incremental(
        stream, DEFN, lambda bid, r: results.update({bid: r}),
        trigger={"availableNow": True},
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(60)
    assert results
    last = results[max(results)]
    assert last.metric_value("row_count") == 3


def test_dedup_stream_drops_duplicates(spark, tmp_path):
    import datetime as dt

    from soda_spark_spark.streaming.scan_stream import dedup_stream

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, t0), (1, t0 + dt.timedelta(minutes=1)), (2, t0), (2, t0), (3, t0)],
        "k long, ts timestamp",
    )
    src = tmp_path / "src"
    df.write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(df.schema).parquet(str(src))
    out = dedup_stream(stream, ["k"], ts_col="ts", watermark="10 minutes")
    q = (
        out.writeStream.format("memory").queryName("dedup_sink")
        .outputMode("append").trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt")).start()
    )
    q.awaitTermination(60)
    ks = [r.k for r in spark.sql("SELECT k FROM dedup_sink").collect()]
    assert sorted(ks) == [1, 2, 3]


def test_incremental_time_columns_merge(spark):
    import datetime as dt

    defn = {"table_name": "tt", "metrics": ["row_count", "min", "max"]}
    t = dt.datetime(2024, 1, 1)
    b1 = spark.createDataFrame(
        [(1, t), (2, t + dt.timedelta(days=3))], "id long, ts timestamp"
    )
    b2 = spark.createDataFrame(
        [(3, t - dt.timedelta(days=5)), (4, t + dt.timedelta(days=1))],
        "id long, ts timestamp",
    )
    inc = IncrementalScan(defn)
    inc.update(b1)
    r = inc.update(b2)
    assert r.metric_value("min", "ts") == t - dt.timedelta(days=5)
    assert r.metric_value("max", "ts") == t + dt.timedelta(days=3)


def test_incremental_empty_batch_is_neutral(spark):
    defn = {"table_name": "te", "metrics": ["row_count", "min", "max", "sum"]}
    b1 = spark.createDataFrame([(1, 5.0), (2, 7.0)], "id long, v double")
    empty = b1.limit(0)
    inc = IncrementalScan(defn)
    r1 = inc.update(b1)
    r2 = inc.update(empty)
    assert r2.metric_value("row_count") == r1.metric_value("row_count") == 2
    assert r2.metric_value("sum", "v") == 12.0
    assert r2.metric_value("min", "v") == 5.0


def test_incremental_distinct_via_hll_sketches(spark):
    """approx_distinct becomes a MERGEABLE incremental statistic: sketches
    union across batches, so overlapping batches don't double-count."""
    from soda_spark_spark.streaming import IncrementalScan

    inc = IncrementalScan(
        {
            "table_name": "t",
            "metrics": ["row_count"],
            "metric_groups": ["duplicates"],
            "approx_distinct": True,
            "columns": {"v": {}},
        }
    )
    b1 = spark.createDataFrame([(i,) for i in range(100)], "v long")
    b2 = spark.createDataFrame([(i,) for i in range(50, 150)], "v long")
    r1 = inc.update(b1)
    assert r1.metric_value("distinct", "v") == 100
    r2 = inc.update(b2)
    # union is {0..149}: merged sketches estimate 150, NOT 100+100
    assert r2.metric_value("distinct", "v") == 150
    assert r2.metric_value("row_count") == 200


def test_incremental_distinct_all_null_batch(spark):
    from soda_spark_spark.streaming import IncrementalScan

    inc = IncrementalScan(
        {
            "table_name": "t",
            "metrics": ["row_count", "missing_count"],
            "metric_groups": ["duplicates"],
            "approx_distinct": True,
            "columns": {"v": {}},
        }
    )
    b1 = spark.createDataFrame([(None,), (None,)], "v string")
    r1 = inc.update(b1)  # no sketch yet: distinct absent, no crash
    assert r1.metric_value("missing_count", "v") == 2
    b2 = spark.createDataFrame([("x",), ("y",)], "v string")
    r2 = inc.update(b2)
    assert r2.metric_value("distinct", "v") == 2


def test_sketched_dedup_batch_writer_matches_batch(spark, tmp_path):
    """Streaming foreachBatch near-dup ingestion dedup == the batch
    dedup_against(seen_tags=) over the same snapshot."""
    import tempfile

    from pyspark.sql import functions as F

    from soda_spark_spark.operators.dedup import dedup_against, minhash_band_tags
    from soda_spark_spark.streaming.scan_stream import sketched_dedup_batch_writer

    base = " ".join(f"w{i}" for i in range(40))
    near = " ".join(("CHANGED" if i == 17 else f"w{i}") for i in range(40))
    seen = spark.createDataFrame([(1, base)], "doc_id long, text string")
    new_rows = [(10, near), (11, " ".join(f"x{i}" for i in range(40)))]
    new = spark.createDataFrame(new_rows, "doc_id long, text string")

    sketch_path = str(tmp_path / "sketch")
    minhash_band_tags(seen, "doc_id", "text").write.parquet(sketch_path)
    seen_tags = spark.read.parquet(sketch_path)

    src = str(tmp_path / "src")
    new.repartition(1).write.parquet(src)
    out_dir = str(tmp_path / "out")

    stream = spark.readStream.schema(new.schema).parquet(src)
    q = (
        stream.writeStream.foreachBatch(
            sketched_dedup_batch_writer(
                seen_tags, "doc_id", "text", out_dir, threshold=0.7
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    want = {
        r["doc_id"]
        for r in dedup_against(
            new, None, "doc_id", "text", method="minhash",
            threshold=0.7, seen_tags=seen_tags,
        ).collect()
    }
    assert got == want == {11}
