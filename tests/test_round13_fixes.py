"""Round-13 ADVICE fixes + the reliable-checkpoint option.

Covers (ADVICE r12, all five items):
- scan_stream first-batch detection now refuses to re-seed a sketch dir
  that holds committed-but-unreadable part files (data loss != first
  batch);
- curate(checkpoint_every=) validates >= 1 (a negative value used to
  silently checkpoint after EVERY step via Python's % -1 == 0);
- pagerank unpersists its static caches even when an iteration fails
  (try/finally);
- inline-gate NULL-id semantics are pinned in test_inline_gates.py;
- encode_png / _png_raster bound the PLTE palette to 1..256 triples.

Plus judge ask #3: `checkpoint_dir=` on pagerank / connected components
/ curate upgrades executor-local localCheckpoint to RELIABLE
df.checkpoint() — bit-identical results in both modes, pinned here.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from soda_spark_spark.operators.dedup import (
    connected_components,
    connected_components_star,
)
from soda_spark_spark.operators.graph import pagerank
from soda_spark_spark.pipeline import curate

EDGES = [
    (1, 2), (2, 3), (3, 1), (3, 4),  # cycle + tail
    (5, 6),                          # separate pair; 6 dangling
    (7, 7),                          # self-loop
]


def test_has_committed_parts_blocks_reseed(spark, tmp_path):
    from soda_spark_spark.streaming.scan_stream import _has_committed_parts

    d = tmp_path / "sketch"
    d.mkdir()
    assert not _has_committed_parts(spark, str(d))
    (d / "_temporary").mkdir()
    (d / "_SUCCESS").write_bytes(b"")
    # markers only -> still "no committed data" (genuine first batch)
    assert not _has_committed_parts(spark, str(d))
    (d / "part-00000.snappy.parquet").write_bytes(b"not parquet")
    # a committed part file exists -> NOT a first batch
    assert _has_committed_parts(spark, str(d))
    assert not _has_committed_parts(spark, str(tmp_path / "absent"))


def test_kmv_writer_refuses_lost_data_dir(spark, tmp_path):
    """A dir whose committed part files are unreadable must raise, not
    silently re-seed and append duplicates."""
    from soda_spark_spark.streaming.scan_stream import (
        kmv_sketch_batch_writer,
    )

    lost = tmp_path / "lost"
    lost.mkdir()
    # parquet dir with a committed but empty (corrupt) data file: spark
    # raises UNABLE_TO_INFER_SCHEMA, which used to read as "first batch"
    (lost / "part-00000-lost.snappy.parquet").write_bytes(b"")
    a = spark.range(0, 10).select(F.col("id").alias("v"))
    writer = kmv_sketch_batch_writer(str(lost), "v", k=16, hash_fn="md5")
    with pytest.raises(Exception):
        writer(a, 0)
    # and nothing was appended behind the failure
    names = [p.name for p in lost.iterdir()]
    assert names == ["part-00000-lost.snappy.parquet"]


def test_curate_checkpoint_every_validated(spark):
    docs = spark.createDataFrame(
        [(1, "hello world")], "doc_id long, text string"
    )
    for bad in (-1, 0, -7):
        with pytest.raises(ValueError, match="checkpoint_every"):
            curate(
                docs,
                [{"kind": "length_filter", "min_chars": 1}],
                checkpoint_every=bad,
            )


def test_pagerank_unpersists_caches_on_failure(spark):
    """try/finally releases the three static caches even when the loop
    dies mid-iteration."""
    sc = spark.sparkContext
    count_cached = lambda: sc._jsc.sc().getPersistentRDDs().size()  # noqa: E731
    before = count_cached()
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    with pytest.raises(Exception):
        # damping_m validated before any caching; trigger a mid-loop
        # failure instead: a column that cannot cast kills the first job
        pagerank(
            edges.select(
                F.col("src"),
                F.when(F.col("dst") < 4, F.col("dst")).otherwise(
                    F.raise_error(F.lit("boom")).cast("long")
                ).alias("dst"),
            ),
            n_iter=2,
        )
    after = count_cached()
    assert after <= before  # no leaked static caches


def test_pagerank_checkpoint_dir_bit_identical(spark, tmp_path):
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    local = {
        r.node: r.rank_ppt for r in pagerank(edges, n_iter=8).collect()
    }
    reliable = {
        r.node: r.rank_ppt
        for r in pagerank(
            edges, n_iter=8, checkpoint_dir=str(tmp_path / "ckpt")
        ).collect()
    }
    assert local == reliable
    # the reliable run actually wrote checkpoint files
    ckpt = tmp_path / "ckpt"
    assert ckpt.exists() and any(ckpt.rglob("*"))


def test_connected_components_checkpoint_dir_bit_identical(spark, tmp_path):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)],
        "id_a long, id_b long",
    )
    want = {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10),
            (20, 20), (21, 20), (22, 20)}
    for fn in (connected_components, connected_components_star):
        local = {(r.id, r.comp) for r in fn(pairs).collect()}
        rel = {
            (r.id, r.comp)
            for r in fn(
                pairs, checkpoint_dir=str(tmp_path / "cc")
            ).collect()
        }
        assert local == rel == want
    # force the distributed label-prop path too (driver_threshold=None)
    dist = {
        (r.id, r.comp)
        for r in connected_components(
            pairs,
            driver_threshold=None,
            checkpoint_dir=str(tmp_path / "cc2"),
        ).collect()
    }
    assert dist == want


def test_curate_checkpoint_dir_bit_identical(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"some document text number {i} with several words") for i in
         range(20)],
        "doc_id long, text string",
    )
    steps = [
        {"kind": "length_filter", "min_chars": 5},
        {"kind": "exact_dedup"},
        {"kind": "length_filter", "max_chars": 500},
    ]
    base, _ = curate(docs, [dict(s) for s in steps])
    ck, _ = curate(
        docs,
        [dict(s) for s in steps],
        checkpoint_every=1,
        checkpoint_dir=str(tmp_path / "curate_ckpt"),
    )
    assert sorted(r.doc_id for r in base.collect()) == sorted(
        r.doc_id for r in ck.collect()
    )


def test_encode_png_palette_bounds():
    from soda_spark_spark.operators.multimodal import (
        _png_raster,
        encode_png,
    )

    # empty palette now rejected at encode time (used to slip through
    # the %3 check and die later in _png_raster)
    with pytest.raises(ValueError, match="PLTE"):
        encode_png(2, 2, bytes([0, 0, 0, 0]), color_type=3, palette=b"")
    with pytest.raises(ValueError, match="PLTE"):
        encode_png(
            2, 2, bytes([0] * 4), color_type=3, palette=b"\x00" * 771
        )
    # a legal 1-triple palette round-trips
    png = encode_png(
        2, 2, bytes([0, 0, 0, 0]), color_type=3,
        palette=bytes([7, 8, 9]),
    )
    w, h, ch, samples = _png_raster(png)
    assert (w, h, ch) == (2, 2, 3)
    assert bytes(samples.tobytes()) == bytes([7, 8, 9] * 4)
