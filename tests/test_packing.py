"""Tests for sequence packing, mixture sampling, and per-group top-k."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from soda_spark_spark.operators.packing import (
    pack_chunks,
    top_k_per_group,
    weighted_mixture_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "id long, tok long")


def _layout_rows(df):
    return {
        r["id"]: (r["start_offset"], r["first_chunk"], r["last_chunk"], r["n_chunks"])
        for r in df.collect()
    }


class TestPackChunks:
    def test_matches_serial_layout(self, spark):
        rows = [(i, (i * 37) % 90 + 1) for i in range(200)]
        out = pack_chunks(_docs(spark, rows), "id", "tok", 128, num_buckets=16)
        got = _layout_rows(out)
        off = 0
        for i, tok in rows:
            first = off // 128
            last = (off + tok - 1) // 128
            assert got[i] == (off, first, last, last - first + 1), i
            off += tok

    def test_partitioning_invariant(self, spark):
        rows = [(i, (i * 13) % 50 + 1) for i in range(100)]
        base = _layout_rows(pack_chunks(_docs(spark, rows), "id", "tok", 64))
        shuffled = _docs(spark, list(reversed(rows))).repartition(7)
        assert _layout_rows(pack_chunks(shuffled, "id", "tok", 64)) == base
        one_bucket = _layout_rows(
            pack_chunks(_docs(spark, rows), "id", "tok", 64, num_buckets=1)
        )
        assert one_bucket == base

    def test_zero_token_docs(self, spark):
        rows = [(0, 10), (1, 0), (2, 5)]
        got = _layout_rows(pack_chunks(_docs(spark, rows), "id", "tok", 8))
        assert got[0] == (0, 0, 1, 2)
        assert got[1] == (10, 1, 1, 0)  # empty doc spans no chunks
        assert got[2] == (10, 1, 1, 1)

    def test_doc_larger_than_chunk(self, spark):
        got = _layout_rows(pack_chunks(_docs(spark, [(0, 1000)]), "id", "tok", 128))
        assert got[0] == (0, 0, 7, 8)

    def test_stale_max_id_clamps(self, spark):
        rows = [(i, 10) for i in range(20)]
        got = _layout_rows(
            pack_chunks(_docs(spark, rows), "id", "tok", 32, max_id=9, num_buckets=4)
        )
        off = 0
        for i, tok in rows:
            assert got[i][0] == off
            off += tok

    def test_bad_args(self, spark):
        df = _docs(spark, [(0, 1)])
        with pytest.raises(ValueError):
            pack_chunks(df, "id", "tok", 0)
        with pytest.raises(ValueError):
            pack_chunks(df, "id", "tok", 8, num_buckets=0)


class TestWeightedMixtureSample:
    def test_rates_applied_per_group(self, spark):
        df = spark.createDataFrame(
            [(i, "a" if i % 2 else "b") for i in range(2000)], "k long, g string"
        )
        out = weighted_mixture_sample(df, "k", "g", {"a": 1.0, "b": 0.0})
        got = out.groupBy("g").count().collect()
        assert {r["g"]: r["count"] for r in got} == {"a": 1000}

    def test_default_rate_and_determinism(self, spark):
        df = spark.createDataFrame(
            [(i, f"s{i % 5}") for i in range(1000)], "k long, g string"
        )
        kept = weighted_mixture_sample(
            df, "k", "g", {"s0": 0.5}, default_rate=0.2
        )
        again = weighted_mixture_sample(
            df.repartition(13), "k", "g", {"s0": 0.5}, default_rate=0.2
        )
        a = sorted(r["k"] for r in kept.collect())
        b = sorted(r["k"] for r in again.collect())
        assert a == b
        # ~50% of s0 (200 rows), ~20% of the rest (800 rows)
        n0 = kept.filter(F.col("g") == "s0").count()
        nrest = kept.filter(F.col("g") != "s0").count()
        assert 60 <= n0 <= 140 and 100 <= nrest <= 220

    def test_bad_rates(self, spark):
        df = spark.createDataFrame([(1, "a")], "k long, g string")
        with pytest.raises(ValueError):
            weighted_mixture_sample(df, "k", "g", {"a": 1.5})
        with pytest.raises(ValueError):
            weighted_mixture_sample(df, "k", "g", {}, default_rate=-0.1)


class TestTopKPerGroup:
    def test_selection_and_tiebreak(self, spark):
        rows = [
            ("g1", 1, 5.0), ("g1", 2, 9.0), ("g1", 3, 9.0), ("g1", 4, 1.0),
            ("g2", 5, 2.0), ("g2", 6, 2.0),
        ]
        df = spark.createDataFrame(rows, "g string, id long, score double")
        out = top_k_per_group(df, ["g"], "score", 2, id_col="id")
        got = {(r["g"], r["id"]): r["rank"] for r in out.collect()}
        # ties broken by ascending id
        assert got == {("g1", 2): 1, ("g1", 3): 2, ("g2", 5): 1, ("g2", 6): 2}

    def test_ascending_and_bad_k(self, spark):
        df = spark.createDataFrame(
            [("g", 1, 5.0), ("g", 2, 3.0)], "g string, id long, score double"
        )
        out = top_k_per_group(df, ["g"], "score", 1, id_col="id", descending=False)
        assert [r["id"] for r in out.collect()] == [2]
        with pytest.raises(ValueError):
            top_k_per_group(df, ["g"], "score", 0, id_col="id")


class TestEmbeddingStats:
    def test_report(self, spark):
        from soda_spark_spark.operators.similarity import embedding_stats

        rows = [
            (0, [3.0, 4.0]),
            (1, [0.0, 0.0]),
            (2, None),
            (3, [1.0, 0.0, 0.0]),
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        r = embedding_stats(df, "vec_id", "embedding").collect()[0]
        assert r["n_vecs"] == 4 and r["null_vecs"] == 1
        assert r["min_dims"] == 2 and r["max_dims"] == 3
        assert r["zero_vecs"] == 1
        assert r["min_norm"] == 0.0 and r["max_norm"] == 5.0
        assert abs(r["avg_norm"] - (5.0 + 0.0 + 1.0) / 3) < 1e-9


def test_chunk_documents_shapes(spark):
    from soda_spark_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, "t0 t1 t2 t3 t4 t5 t6"),  # 7 tokens -> 3 chunks at (3, ov 1)
            (2, "a b"),                    # short doc -> exactly 1 chunk
            (3, "   "),                    # whitespace-only -> no rows
            (4, "x"),                      # 1 token -> 1 chunk
        ],
        "doc_id long, text string",
    )
    rows = [
        tuple(r)
        for r in chunk_documents(docs, "doc_id", "text", chunk_tokens=3, overlap=1)
        .orderBy("doc_id", "chunk_idx")
        .collect()
    ]
    assert rows == [
        (1, 0, 3, "t0 t1 t2"),
        (1, 1, 3, "t2 t3 t4"),  # 1-token overlap carries t2
        (1, 2, 3, "t4 t5 t6"),
        (2, 0, 2, "a b"),
        (4, 0, 1, "x"),
    ]


def test_chunk_documents_no_overlap_reconstructs(spark):
    from pyspark.sql import functions as F

    from soda_spark_spark.operators.packing import chunk_documents

    text = " ".join(f"w{i}" for i in range(100))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = chunk_documents(docs, "doc_id", "text", chunk_tokens=32)
    joined = (
        out.orderBy("chunk_idx")
        .agg(F.concat_ws(" ", F.collect_list("chunk_text")))
        .first()[0]
    )
    assert joined == text  # zero overlap partitions the token stream


def test_chunk_documents_validates_args(spark):
    import pytest as _pytest

    from soda_spark_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="chunk_tokens"):
        chunk_documents(docs, "doc_id", "text", chunk_tokens=0)
    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, "doc_id", "text", chunk_tokens=4, overlap=4)


def test_select_by_budget_prefix_rule(spark):
    from soda_spark_spark.operators.packing import select_by_budget

    df = spark.createDataFrame(
        [
            (1, 10, 0.9),
            (2, 20, 0.8),
            (3, 30, 0.7),   # cum 60 > 55 -> excluded
            (4, 5, 0.6),    # would fit, but prefix rule excludes it too
        ],
        "doc_id long, n_tokens long, score double",
    )
    out = select_by_budget(df, "doc_id", "n_tokens", "score", 55)
    got = {r["doc_id"]: r["cum_tokens"] for r in out.collect()}
    assert got == {1: 10, 2: 30}

    # ascending selection + id tiebreak on equal scores
    df2 = spark.createDataFrame(
        [(1, 10, 0.5), (2, 10, 0.5), (3, 10, 0.5)],
        "doc_id long, n_tokens long, score double",
    )
    got2 = {
        r["doc_id"]: r["cum_tokens"]
        for r in select_by_budget(
            df2, "doc_id", "n_tokens", "score", 20, descending=False
        ).collect()
    }
    assert got2 == {1: 10, 2: 20}  # constant score -> one bucket, id order


def test_select_by_budget_matches_single_partition_reference(spark):
    """Bucketed distributed prefix sum == the naive global-window answer
    on a larger random-ish corpus (deterministic seed via hash)."""
    from pyspark.sql import Window

    from soda_spark_spark.operators.packing import select_by_budget

    df = (
        spark.range(5000)
        .select(
            F.col("id").alias("doc_id"),
            (F.xxhash64("id") % 100 + 101).alias("n_tokens"),
            (F.xxhash64("id", F.lit(1)) % 1000).cast("double").alias("score"),
        )
    )
    budget = 120_000
    got = {
        r["doc_id"]: r["cum_tokens"]
        for r in select_by_budget(
            df, "doc_id", "n_tokens", "score", budget, num_buckets=32
        ).collect()
    }
    w = Window.orderBy(F.desc("score"), F.asc("doc_id")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    ref = {
        r["doc_id"]: r["c"]
        for r in df.withColumn("c", F.sum("n_tokens").over(w))
        .filter(F.col("c") <= budget)
        .collect()
    }
    assert got == ref and len(got) > 100


# ---------------------------------------------------------------------------
# training-shard assignment
# ---------------------------------------------------------------------------


def test_assign_shards_matches_python_reference(spark):
    import hashlib

    from soda_spark_spark.operators.packing import assign_shards

    rows = [(i, (i % 7) + 1) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    got = {
        r.doc_id: (r.shard_id, r.start_offset)
        for r in assign_shards(df, "doc_id", "n_tok", shard_tokens=50).collect()
    }

    def h(i, seed=42):
        return int(hashlib.md5(f"{i}|{seed}".encode()).hexdigest()[:15], 16)

    cum, exp = 0, {}
    for i, t in sorted(rows, key=lambda r: (h(r[0]), r[0])):
        exp[i] = (cum // 50, cum)
        cum += t
    assert got == exp


def test_assign_shards_id_order_and_nulls(spark):
    from soda_spark_spark.operators.packing import assign_shards

    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 5)], "doc_id long, n_tok long"
    )
    got = {
        r.doc_id: (r.shard_id, r.start_offset)
        for r in assign_shards(
            df, "doc_id", "n_tok", shard_tokens=8, order="id"
        ).collect()
    }
    # null tokens count as 0; offsets: 1->0, 2->10, 3->10
    assert got == {1: (0, 0), 2: (1, 10), 3: (1, 10)}


def test_write_training_shards_partitions(spark, tmp_path):
    from soda_spark_spark.operators.packing import write_training_shards

    df = spark.createDataFrame(
        [(i, 10) for i in range(40)], "doc_id long, n_tok long"
    )
    p = str(tmp_path / "shards")
    write_training_shards(df, "doc_id", "n_tok", 100, p)
    back = spark.read.parquet(p)
    assert back.count() == 40
    sizes = {
        r.shard_id: r.t
        for r in back.groupBy("shard_id")
        .agg(F.sum("n_tok").alias("t"))
        .collect()
    }
    # 400 tokens into 100-token shards -> 4 shards of exactly 100
    assert sizes == {0: 100, 1: 100, 2: 100, 3: 100}
