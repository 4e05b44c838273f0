"""TFRecord shard ingestion (`sources/tfrecord.py`) and NumPy
array-shard ingestion (`sources/npy.py`): CRC-32C vectors, framing,
corruption/truncation quarantine, dtype canonicalization, and the
pickle refusal."""

from __future__ import annotations

import numpy as np
import pytest

from soda_spark_spark.sources.npy import (
    read_npy_embeddings,
    write_npy,
    write_npz,
)
from soda_spark_spark.sources.tfrecord import (
    crc32c,
    masked_crc32c,
    read_tfrecords,
    split_tfrecords,
    write_tfrecords,
)


def test_crc32c_public_vectors():
    # RFC 3720 / Castagnoli check value
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    # 32 bytes of zeros, a classic iSCSI vector
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def test_tfrecord_roundtrip(tmp_path):
    recs = [b"hello", b"", b"x" * 5000]
    p = str(tmp_path / "a.tfrecord")
    write_tfrecords(recs, p)
    got, err = split_tfrecords(open(p, "rb").read())
    assert err is None and got == recs


def test_tfrecord_corruption_stops_shard(tmp_path):
    p = str(tmp_path / "a.tfrecord")
    write_tfrecords([b"aa", b"bb", b"cc"], p)
    data = bytearray(open(p, "rb").read())
    # flip a byte inside record 1's payload
    data[12 + 2 + 4 + 12] ^= 0xFF
    got, err = split_tfrecords(bytes(data))
    assert got == [b"aa"]
    assert "record 1" in err


def test_tfrecord_truncation(tmp_path):
    p = str(tmp_path / "a.tfrecord")
    write_tfrecords([b"aa", b"bb"], p)
    data = open(p, "rb").read()
    got, err = split_tfrecords(data[:-3])
    assert got == [b"aa"] and "truncated" in err


def test_read_tfrecords_distributed(spark, tmp_path):
    write_tfrecords([b"r0", b"r1"], str(tmp_path / "a.tfrecord"))
    write_tfrecords([b"gz"], str(tmp_path / "b.tfrecord.gz"),
                    compress="gzip")
    (tmp_path / "c.tfrecord").write_bytes(b"junk")
    out = read_tfrecords(spark, str(tmp_path / "*.tfrecord*")).collect()
    good = {(r.rec_index, bytes(r.payload)) for r in out if r.error is None}
    assert good == {(0, b"r0"), (1, b"r1"), (0, b"gz")}
    bad = [r for r in out if r.error is not None]
    assert len(bad) == 1 and "truncated header" in bad[0].error


# ---------------------------------------------------------------- npy


def test_npy_2d_and_dtype_canonicalization(spark, tmp_path):
    write_npy(np.arange(6, dtype=np.float64).reshape(2, 3),
              str(tmp_path / "a.npy"))
    out = read_npy_embeddings(spark, str(tmp_path / "a.npy")).collect()
    got = {r.row_index: r.embedding for r in out}
    assert got == {0: [0.0, 1.0, 2.0], 1: [3.0, 4.0, 5.0]}
    assert all(r.dim == 3 and r.member == "arr" for r in out)


def test_npy_1d_and_int_upcast(spark, tmp_path):
    write_npy(np.array([1, 2], dtype=np.int16), str(tmp_path / "a.npy"))
    r = read_npy_embeddings(spark, str(tmp_path / "a.npy")).collect()[0]
    assert r.embedding == [1.0, 2.0] and r.row_index == 0


def test_npz_members_sorted(spark, tmp_path):
    write_npz(
        {"b": np.zeros((1, 2), dtype=np.float16), "a": np.ones(2)},
        str(tmp_path / "c.npz"),
    )
    out = read_npy_embeddings(spark, str(tmp_path / "c.npz")).collect()
    assert {(r.member, r.row_index) for r in out} == {("a", 0), ("b", 0)}


def test_npy_quarantines_garbage_and_pickle(spark, tmp_path):
    (tmp_path / "bad.npy").write_bytes(b"not numpy at all")
    # an object array forces a pickle payload; allow_pickle=False must
    # refuse it rather than execute anything
    obj = np.empty(2, dtype=object)
    obj[:] = [{"x": 1}, {"y": 2}]
    np.save(str(tmp_path / "evil.npy"), obj, allow_pickle=True)
    out = read_npy_embeddings(spark, str(tmp_path / "*.npy")).collect()
    assert len(out) == 2
    assert all(r.error is not None and r.embedding is None for r in out)


def test_npy_rank3_quarantines(spark, tmp_path):
    write_npy(np.zeros((2, 2, 2), dtype=np.float32),
              str(tmp_path / "r3.npy"))
    r = read_npy_embeddings(spark, str(tmp_path / "r3.npy")).collect()[0]
    assert r.error is not None and "rank 3" in r.error


# ------------------------------------------------------ tf.train.Example


def test_tf_example_roundtrip_all_kinds():
    from soda_spark_spark.sources.tfrecord import (
        build_tf_example,
        parse_tf_example,
    )

    ex = build_tf_example({
        "text": [b"doc 7", b"second"],
        "ids": [7, 0, -3, 1 << 40],
        "score": [3.5, -0.25],
    })
    got = parse_tf_example(ex)
    assert got["text"] == ("bytes", [b"doc 7", b"second"])
    assert got["ids"] == ("int64", [7, 0, -3, 1 << 40])
    kind, vals = got["score"]
    assert kind == "float" and vals == [3.5, -0.25]


def test_tf_example_unpacked_floats_and_unknown_fields():
    from soda_spark_spark.sources.tfrecord import (
        _emit_ld,
        _emit_varint,
        parse_tf_example,
    )
    import struct as _s

    # FloatList with UNPACKED fixed32 entries + an unknown field the
    # walker must skip (forward compatibility)
    fl = (_emit_varint((1 << 3) | 5) + _s.pack("<f", 1.5)
          + _emit_varint((1 << 3) | 5) + _s.pack("<f", 2.5)
          + _emit_varint((9 << 3) | 0) + _emit_varint(42))
    feat = _emit_ld(2, fl)
    entry = _emit_ld(1, b"s") + _emit_ld(2, feat)
    ex = _emit_ld(1, _emit_ld(1, entry))
    assert parse_tf_example(ex)["s"] == ("float", [1.5, 2.5])


def test_tf_example_malformed_raises():
    from soda_spark_spark.sources.tfrecord import parse_tf_example

    for bad in (b"", b"\xff\xff\xff", b"\x0a\xff"):
        with pytest.raises(ValueError):
            parse_tf_example(bad)


def test_tf_examples_operator(spark):
    from soda_spark_spark.sources.tfrecord import (
        build_tf_example,
        tf_examples,
    )

    ex = build_tf_example({"text": [b"hi"], "n": [5, 6]})
    df = spark.createDataFrame(
        [(1, bytearray(ex)), (2, bytearray(b"junk"))],
        "id long, payload binary",
    )
    out = tf_examples(df, "id", "payload").collect()
    good = {(r.key, r.kind, r.n_values, r.str0, r.i0)
            for r in out if r.error is None}
    assert good == {("text", "bytes", 1, "hi", None),
                    ("n", "int64", 2, None, 5)}
    assert [r for r in out if r.error is not None][0].id == 2


# ------------------------------------------------- round-18 additions


def test_tfrecord_zlib_shard(spark, tmp_path):
    """TFRecordOptions(compression_type='ZLIB') shards — raw RFC-1950
    framing, no gzip wrapper — ingest instead of quarantining."""
    from soda_spark_spark.sources.tfrecord import (
        read_tfrecords,
        write_tfrecords,
    )

    recs = [b"alpha", b"beta", b"gamma"]
    write_tfrecords(recs, str(tmp_path / "z.tfrecord"), compress="zlib")
    raw = (tmp_path / "z.tfrecord").read_bytes()
    assert raw[:1] == b"\x78"  # really zlib-framed on disk
    rows = read_tfrecords(spark, str(tmp_path / "z.tfrecord")).collect()
    assert [bytes(r.payload) for r in sorted(rows, key=lambda r: r.rec_index)] == recs
    assert all(r.error is None for r in rows)


def test_tf_example_decode_typed_columns(spark):
    from soda_spark_spark.sources.tfrecord import (
        build_tf_example,
        tf_example_decode,
    )

    rows = [
        (0, bytearray(build_tf_example({
            "text": [b"hello", b"world"],
            "emb": [1.5, -2.5],
            "label": [7],
        }))),
        (1, bytearray(build_tf_example({  # 'emb' absent -> NULL
            "text": [b"solo"], "label": [-1, 2],
        }))),
        (2, bytearray(build_tf_example({  # wrong kind -> quarantine
            "text": [3], "emb": [0.0], "label": [0],
        }))),
        (3, bytearray(b"\xff\xff garbage")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {
        r.doc_id: r
        for r in tf_example_decode(
            df, "doc_id", "payload",
            {"text": "bytes", "emb": "float", "label": "int64"},
        ).collect()
    }
    assert out[0].text == ["hello", "world"]
    assert out[0].emb == [1.5, -2.5]
    assert out[0].label == [7]
    assert out[1].emb is None and out[1].label == [-1, 2]
    assert out[2].error is not None and "text" in out[2].error
    assert out[2].label is None  # quarantine nulls ALL committed cols
    assert out[3].error is not None


def test_tf_example_decode_rejects_unknown_kind(spark):
    import pytest as _pytest

    from soda_spark_spark.sources.tfrecord import tf_example_decode

    df = spark.createDataFrame([(1, bytearray(b""))], "i long, p binary")
    with _pytest.raises(ValueError, match="unknown kind"):
        tf_example_decode(df, "i", "p", {"x": "double"})


def test_tf_example_decode_rejects_bookkeeping_collision(spark):
    import pytest

    from soda_spark_spark.sources.tfrecord import tf_example_decode

    df = spark.createDataFrame([(1, b"x")], "doc_id long, p binary")
    with pytest.raises(ValueError, match="collides"):
        tf_example_decode(df, "doc_id", "p", {"doc_id": "int64"})
    with pytest.raises(ValueError, match="collides"):
        tf_example_decode(df, "doc_id", "p", {"error": "bytes"})
