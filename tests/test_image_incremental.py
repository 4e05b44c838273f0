"""Incremental perceptual image dedup: `dedup.hamming_matches_against`
(cross-set banded Hamming), `multimodal.image_hash_sketch` /
`image_dedup_against` (persisted-sketch batch path), and
`streaming.image_dedup_batch_writer` (self-maintaining stream path)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F


def _pgm(key: str, flip: int | None = None) -> bytes:
    """Deterministic 9x8 grayscale PGM; `flip` inverts one pixel byte
    (moves at most 2 dhash gradient bits)."""
    pix = bytearray(
        b"".join(
            hashlib.md5(f"{key}{s}".encode()).digest()
            for s in ("", "a", "b", "c", "d")
        )[:72]
    )
    if flip is not None:
        pix[flip] = 255 - pix[flip]
    return b"P5\n9 8\n255\n" + bytes(pix)


# ---------------------------------------------------------------------------
# hamming_matches_against
# ---------------------------------------------------------------------------


def test_hamming_matches_against_exact_and_near(spark):
    from soda_spark_spark.operators.dedup import hamming_matches_against

    seen = spark.createDataFrame(
        [(0b1010_1010,), (1 << 60,)], "simhash long"
    )
    new = spark.createDataFrame(
        [
            (1, 0b1010_1010),        # distance 0 -> match
            (2, 0b1010_1011),        # distance 1 -> match
            (3, 0b1010_1010 ^ 0b111),  # distance 3 -> match at h=3
            (4, 0b1010_1010 ^ 0b1111),  # distance 4 -> no match at h=3
            (5, (1 << 60) ^ (1 << 5)),  # distance 1 to the other seen
        ],
        "id long, simhash long",
    )
    got = sorted(
        r.id
        for r in hamming_matches_against(
            new, seen, bits=64, max_hamming=3
        ).collect()
    )
    assert got == [1, 2, 3, 5]


def test_hamming_matches_against_null_never_matches(spark):
    from soda_spark_spark.operators.dedup import hamming_matches_against

    seen = spark.createDataFrame([(None,), (7,)], "simhash long")
    new = spark.createDataFrame(
        [(1, None), (2, 7)], "id long, simhash long"
    )
    got = [r.id for r in hamming_matches_against(new, seen).collect()]
    assert got == [2]


def test_hamming_matches_against_degenerate_history(spark):
    """A million-copies history costs one distinct signature row —
    and still matches."""
    from soda_spark_spark.operators.dedup import hamming_matches_against

    seen = spark.range(1000).select(F.lit(42).alias("simhash"))
    new = spark.createDataFrame([(1, 42), (2, 9999)], "id long, simhash long")
    got = [r.id for r in hamming_matches_against(new, seen, max_hamming=0).collect()]
    assert got == [1]


# ---------------------------------------------------------------------------
# image_hashes precision (the round-14 float64 regression)
# ---------------------------------------------------------------------------


def test_image_hashes_exact_int64_with_quarantine_in_batch(spark):
    """A single undecodable payload in a batch must NOT degrade the
    other hashes: pandas would infer float64 for a column with None and
    silently round 64-bit hashes to the 53-bit mantissa, making equal
    pictures hash 'differently' across batches."""
    from soda_spark_spark.operators.multimodal import image_hashes

    pic = bytearray(_pgm("precision"))
    clean = spark.createDataFrame(
        [(1, pic)], "doc_id long, payload binary"
    ).coalesce(1)
    mixed = spark.createDataFrame(
        [(1, pic), (2, bytearray(b"JUNK"))], "doc_id long, payload binary"
    ).coalesce(1)
    h_clean = {r.id: r.hash for r in image_hashes(clean, "doc_id", "payload").collect()}
    h_mixed = {r.id: r.hash for r in image_hashes(mixed, "doc_id", "payload").collect()}
    assert h_mixed[1] == h_clean[1]  # bit-exact, not mantissa-rounded
    assert h_mixed[2] is None


# ---------------------------------------------------------------------------
# image_hash_sketch / image_dedup_against
# ---------------------------------------------------------------------------


def test_image_hash_sketch_drops_quarantined(spark):
    from soda_spark_spark.operators.multimodal import image_hash_sketch

    df = spark.createDataFrame(
        [(1, bytearray(_pgm("a"))), (2, bytearray(b"not an image"))],
        "doc_id long, payload binary",
    )
    rows = image_hash_sketch(df, "doc_id", "payload").collect()
    assert [r.id for r in rows] == [1]
    assert rows[0].hash is not None


def test_image_dedup_against_drops_history_near_dups(spark):
    from soda_spark_spark.operators.multimodal import (
        image_dedup_against, image_hash_sketch,
    )

    history = spark.createDataFrame(
        [(100, bytearray(_pgm("h1"))), (101, bytearray(_pgm("h2")))],
        "doc_id long, payload binary",
    )
    sketch = image_hash_sketch(history, "doc_id", "payload")
    new = spark.createDataFrame(
        [
            (1, bytearray(_pgm("h1"))),          # exact re-ingest -> drop
            (2, bytearray(_pgm("h2", flip=5))),  # near-dup -> drop
            (3, bytearray(_pgm("fresh"))),       # novel -> keep
            (4, bytearray(b"JUNK")),             # undecodable -> keep
        ],
        "doc_id long, payload binary",
    )
    kept = sorted(
        r.doc_id
        for r in image_dedup_against(
            new, "doc_id", "payload", seen_hashes=sketch, max_hamming=4
        ).collect()
    )
    assert kept == [3, 4]


def test_image_dedup_against_requires_hash_column(spark):
    from soda_spark_spark.operators.multimodal import image_dedup_against

    new = spark.createDataFrame(
        [(1, bytearray(_pgm("x")))], "doc_id long, payload binary"
    )
    bad = spark.createDataFrame([(1,)], "nothash long")
    with pytest.raises(ValueError, match="image_hash_sketch"):
        image_dedup_against(new, "doc_id", "payload", seen_hashes=bad)


# ---------------------------------------------------------------------------
# image_dedup_batch_writer (driven directly, as foreachBatch would)
# ---------------------------------------------------------------------------


def test_image_dedup_batch_writer_two_batches(spark, tmp_path):
    from soda_spark_spark.streaming.scan_stream import image_dedup_batch_writer

    sketch_dir = str(tmp_path / "sketch")
    out_dir = str(tmp_path / "out")
    writer = image_dedup_batch_writer(
        "doc_id", "payload", sketch_dir, out_dir, max_hamming=4
    )
    b1 = spark.createDataFrame(
        [
            (1, bytearray(_pgm("p1"))),
            (2, bytearray(_pgm("p1", flip=3))),  # near-dup of 1 in-batch
            (3, bytearray(_pgm("p2"))),
        ],
        "doc_id long, payload binary",
    )
    writer(b1, 0)
    got1 = sorted(r.doc_id for r in spark.read.parquet(out_dir).collect())
    assert got1 == [1, 3]  # in-batch near-dup collapsed to min id
    b2 = spark.createDataFrame(
        [
            (10, bytearray(_pgm("p2", flip=9))),  # near-dup of batch-1's 3
            (11, bytearray(_pgm("p3"))),          # novel
            (12, bytearray(b"JUNK")),             # undecodable -> keep
        ],
        "doc_id long, payload binary",
    )
    writer(b2, 1)
    got2 = sorted(r.doc_id for r in spark.read.parquet(out_dir).collect())
    assert got2 == [1, 3, 11, 12]
    # the sketch holds exactly the decodable survivors' hashes
    sk = spark.read.parquet(sketch_dir).collect()
    assert sorted(r.id for r in sk) == [1, 3, 11]
    assert all(r.hash is not None for r in sk)


def test_image_dedup_batch_writer_corrupt_sketch_raises(spark, tmp_path):
    from soda_spark_spark.streaming.scan_stream import image_dedup_batch_writer

    sketch_dir = tmp_path / "sketch"
    sketch_dir.mkdir()
    # a committed-looking part file with garbage -> must propagate
    (sketch_dir / "part-00000-deadbeef.snappy.parquet").write_bytes(b"junk")
    writer = image_dedup_batch_writer(
        "doc_id", "payload", str(sketch_dir), str(tmp_path / "out")
    )
    b = spark.createDataFrame(
        [(1, bytearray(_pgm("x")))], "doc_id long, payload binary"
    )
    with pytest.raises(Exception):
        writer(b, 0)
