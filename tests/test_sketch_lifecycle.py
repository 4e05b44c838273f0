"""append_sketch — the shared append/compaction step of the persisted
single-column hash-sketch lifecycle (gram_key_sketch / window_hash_sketch /
line_hash_sketch)."""
from __future__ import annotations

import pyspark.sql.functions as F
import pytest


def test_append_sketch_unions_distinct(spark):
    from soda_spark_spark.operators.dedup import (
        append_sketch,
        gram_key_sketch,
    )

    a = spark.createDataFrame([(1, "alpha beta gamma delta")],
                              "id long, text string")
    b = spark.createDataFrame([(2, "beta gamma delta epsilon")],
                              "id long, text string")
    sa = gram_key_sketch(a, "id", "text")
    sb = gram_key_sketch(b, "id", "text")
    merged = append_sketch(sa, sb)
    keys = {r[0] for r in merged.collect()}
    assert keys == {r[0] for r in sa.collect()} | {r[0] for r in sb.collect()}
    # distinct: re-appending the same batch changes nothing
    assert append_sketch(merged, sb).count() == len(keys)
    # fresh history
    assert {r[0] for r in append_sketch(None, sb).collect()} == {
        r[0] for r in sb.collect()
    }


def test_append_sketch_feeds_novelty_incrementally(spark, tmp_path):
    from soda_spark_spark.operators.dedup import (
        append_sketch,
        gram_key_sketch,
        novelty_scores,
    )

    batch1 = spark.createDataFrame([(1, "one two three four five six")],
                                   "id long, text string")
    batch2 = spark.createDataFrame([(2, "four five six seven eight nine")],
                                   "id long, text string")
    probe = spark.createDataFrame(
        [(9, "one two three four five six seven eight nine")],
        "id long, text string")
    hist = append_sketch(None, gram_key_sketch(batch1, "id", "text"))
    p1 = str(tmp_path / "s1")
    hist.write.parquet(p1)
    r1 = novelty_scores(probe, spark.read.parquet(p1), "id", "text").first()
    hist2 = append_sketch(
        spark.read.parquet(p1), gram_key_sketch(batch2, "id", "text"))
    p2 = str(tmp_path / "s2")
    hist2.write.parquet(p2)
    r2 = novelty_scores(probe, spark.read.parquet(p2), "id", "text").first()
    # appending history can only reduce novelty, never raise it
    assert r2.novelty < r1.novelty
    assert r2.n_grams == r1.n_grams


def test_append_sketch_rejects_mixed_hash_fn(spark):
    from soda_spark_spark.operators.dedup import (
        append_sketch,
        window_hash_sketch,
    )

    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(20)))], "id long, text string")
    hashed = window_hash_sketch(df, "id", "text", window=5)
    textual = window_hash_sketch(df, "id", "text", window=5, hash_fn="text")
    with pytest.raises(ValueError, match="key types differ"):
        append_sketch(hashed, textual)
    with pytest.raises(ValueError, match="__h"):
        append_sketch(hashed, df)


def test_novelty_gate_stream_matches_batch(spark, tmp_path):
    """The streaming novelty gate must reproduce the batch decision:
    rehashes of sketched history drop, novel docs land in the sink."""
    import pyspark.sql.functions as F  # noqa: F811

    from soda_spark_spark.operators.dedup import gram_key_sketch, novelty_scores
    from soda_spark_spark.streaming.scan_stream import novelty_gate_batch_writer

    hist = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta eta theta"),  # rehash
         (11, "completely novel words that history never saw at all"),
         (12, "xy")],                                            # no 3-grams
        "doc_id long, text string")
    sketch_dir = str(tmp_path / "sketch")
    gram_key_sketch(hist, "doc_id", "text").write.parquet(sketch_dir)
    new_dir = str(tmp_path / "new")
    new.write.parquet(new_dir)
    out_dir = str(tmp_path / "sink")
    q = (
        spark.readStream.schema(new.schema).parquet(new_dir)
        .writeStream.foreachBatch(
            novelty_gate_batch_writer(
                spark.read.parquet(sketch_dir), "doc_id", "text", out_dir,
                min_novelty_ppm=500_000))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = sorted(r.doc_id for r in spark.read.parquet(out_dir).collect())
    assert got == [11]  # rehash gated out, gram-less doc unscorable

    # parity with the batch operator + the same integer threshold
    batch = novelty_scores(
        new, spark.read.parquet(sketch_dir), "doc_id", "text")
    batch_keep = sorted(
        r.doc_id for r in batch.filter(
            F.col("unseen_grams") * 1_000_000 >= 500_000 * F.col("n_grams")
        ).collect())
    assert batch_keep == got


def test_append_sketch_serves_span_dedup(spark):
    from soda_spark_spark.operators.dedup import (
        append_sketch,
        dedup_spans_against,
        window_hash_sketch,
    )

    h1 = spark.createDataFrame(
        [(1, " ".join(f"a{i}" for i in range(12)))], "id long, text string")
    h2 = spark.createDataFrame(
        [(2, " ".join(f"b{i}" for i in range(12)))], "id long, text string")
    hist = append_sketch(
        window_hash_sketch(h1, "id", "text", window=6),
        window_hash_sketch(h2, "id", "text", window=6),
    )
    new = spark.createDataFrame(
        [(10, " ".join(f"a{i}" for i in range(12))),     # verbatim h1 copy
         (11, "totally novel content with enough words here ok")],
        "id long, text string")
    out = {r.id: r.text for r in dedup_spans_against(
        new, None, "id", "text", window=6, seen_hashes=hist).collect()}
    assert out[10] == ""  # fully duplicated -> emptied
    assert "novel" in out[11]
