"""CBOR ingestion (`sources/cbor.py`): decoder conformance against
RFC 8949 Appendix A vectors, well-formedness laws, the sequence
reader's stop-on-corruption stance, and committed-schema extraction."""

from __future__ import annotations

import math

import pytest

from soda_spark_spark.sources.cbor import (
    UNDEFINED,
    Tag,
    cbor_extract,
    decode_cbor,
    encode_cbor,
    read_cbor_records,
)


def _dec(hexstr: str):
    v, pos = decode_cbor(bytes.fromhex(hexstr))
    assert pos == len(bytes.fromhex(hexstr))
    return v


class TestRfc8949AppendixA:
    """Spot checks straight from the RFC's published example table."""

    @pytest.mark.parametrize("hx,want", [
        ("00", 0), ("0a", 10), ("17", 23), ("1818", 24),
        ("1903e8", 1000), ("1a000f4240", 1000000),
        ("1b000000e8d4a51000", 1000000000000),
        ("20", -1), ("29", -10), ("3863", -100), ("3903e7", -1000),
        ("f4", False), ("f5", True), ("f6", None),
        ("60", ""), ("6161", "a"), ("6449455446", "IETF"),
        ("62225c", "\"\\"), ("62c3bc", "ü"),
        ("40", b""), ("4401020304", b"\x01\x02\x03\x04"),
        ("80", []), ("83010203", [1, 2, 3]),
        ("8301820203820405", [1, [2, 3], [4, 5]]),
        ("a0", {}), ("a201020304", {1: 2, 3: 4}),
        ("a26161016162820203", {"a": 1, "b": [2, 3]}),
    ])
    def test_vector(self, hx, want):
        assert _dec(hx) == want

    @pytest.mark.parametrize("hx,want", [
        ("f90000", 0.0), ("f93c00", 1.0), ("f93e00", 1.5),
        ("f97bff", 65504.0), ("fa47c35000", 100000.0),
        ("fb3ff199999999999a", 1.1),
        ("f9c400", -4.0),
    ])
    def test_float_vectors(self, hx, want):
        assert _dec(hx) == want

    def test_half_infinity_and_nan(self):
        assert _dec("f97c00") == math.inf
        assert _dec("f9fc00") == -math.inf
        assert math.isnan(_dec("f97e00"))

    def test_undefined_and_simple(self):
        assert _dec("f7") is UNDEFINED
        assert _dec("f0") == ("simple", 16)
        assert _dec("f8ff") == ("simple", 255)

    def test_tags(self):
        v = _dec("c074323031332d30332d32315432303a30343a30305a")
        assert v == Tag(0, "2013-03-21T20:04:00Z")
        assert _dec("d74401020304") == Tag(23, b"\x01\x02\x03\x04")

    def test_indefinite_forms(self):
        assert _dec("5f42010243030405ff") == b"\x01\x02\x03\x04\x05"
        assert _dec("7f657374726561646d696e67ff") == "streaming"
        assert _dec("9f018202039f0405ffff") == [1, [2, 3], [4, 5]]
        assert _dec("bf61610161629f0203ffff") == {"a": 1, "b": [2, 3]}

    def test_nested_100_levels_within_default_bound(self):
        data = b"\x81" * 50 + b"\x00"
        v, _ = decode_cbor(data)
        for _ in range(50):
            (v,) = v
        assert v == 0


class TestWellFormedness:
    @pytest.mark.parametrize("hx,msg", [
        ("18", "truncated"),            # argument byte missing
        ("1a0000", "truncated"),        # 4-byte arg cut short
        ("62c3", "truncated"),          # text payload cut short
        ("8301", "truncated"),          # array missing elements
        ("1c", "reserved"),             # additional info 28
        ("ff", "break"),                # break outside a container
        ("5f4101420203ff", None),       # ok: chained byte chunks
        ("5f610100ff", "definite string of the same type"),
        ("7f42c3bcff", "definite string of the same type"),
        ("a2616101616102", "duplicate map key"),
        ("62ffff", "UTF-8"),            # invalid utf-8 text
        ("3f", "indefinite length on an integer"),
        ("f81f", "invalid two-byte simple"),
    ])
    def test_law(self, hx, msg):
        data = bytes.fromhex(hx)
        if msg is None:
            decode_cbor(data)
            return
        with pytest.raises(ValueError, match=msg):
            decode_cbor(data)

    def test_depth_bound(self):
        data = b"\x81" * 100 + b"\x00"
        with pytest.raises(ValueError, match="nesting too deep"):
            decode_cbor(data, max_depth=64)

    def test_unhashable_map_key(self):
        # {[1]: 2} — array as key
        with pytest.raises(ValueError, match="unhashable"):
            decode_cbor(bytes.fromhex("a1810102"))


class TestEncoder:
    @pytest.mark.parametrize("v", [
        0, 23, 24, 255, 256, 65535, 65536, 2**32, -1, -25, -2**33,
        "", "héllo", b"\x00\xff", [1, [2], "x"], {"k": [True, None]},
        True, False, None, UNDEFINED, 1.5, -0.0,
        Tag(1, 1363896240),
    ])
    def test_roundtrip(self, v):
        got, pos = decode_cbor(encode_cbor(v))
        data = encode_cbor(v)
        assert pos == len(data)
        if isinstance(v, float):
            assert got == v and isinstance(got, float)
        else:
            assert got == v

    def test_shortest_int_heads(self):
        assert encode_cbor(10) == bytes.fromhex("0a")
        assert encode_cbor(1000) == bytes.fromhex("1903e8")
        assert encode_cbor(-1000) == bytes.fromhex("3903e7")


class TestSparkReaders:
    def test_sequence_census(self, spark, tmp_path):
        seq = b"".join([
            encode_cbor({"id": 1, "t": "a"}),
            encode_cbor([1, 2, 3]),
            encode_cbor("plain"),
            encode_cbor(-7),
            encode_cbor(Tag(0, "2024-01-01T00:00:00Z")),
        ])
        (tmp_path / "a.cborseq").write_bytes(seq)
        rows = sorted(read_cbor_records(
            spark, str(tmp_path / "a.cborseq")).collect(),
            key=lambda r: r.rec_index)
        assert [r.major for r in rows] == [
            "map", "array", "text", "nint", "tag"]
        assert rows[0].n_children == 2 and rows[1].n_children == 3
        assert all(r.error is None for r in rows)

    def test_corruption_stops_shard_honestly(self, spark, tmp_path):
        seq = (encode_cbor({"ok": 1}) + encode_cbor({"ok": 2})
               + bytes.fromhex("1c") + encode_cbor({"never": 3}))
        (tmp_path / "c.cborseq").write_bytes(seq)
        rows = sorted(read_cbor_records(
            spark, str(tmp_path / "c.cborseq")).collect(),
            key=lambda r: r.rec_index)
        assert len(rows) == 3          # 2 good + 1 error, rest untrusted
        assert rows[2].rec_index == 2 and "bad cbor" in rows[2].error

    def test_extract_typed_columns(self, spark):
        recs = [
            (1, encode_cbor({"id": 10, "score": 0.5, "t": "x",
                             "raw": b"\xab", "ok": True})),
            (2, encode_cbor({"id": 20})),            # sparse
            (3, encode_cbor({"id": "wrong kind"})),  # quarantine
            (4, encode_cbor([1, 2])),                # not a map
            (5, b"\x1c"),                            # malformed
        ]
        df = spark.createDataFrame(recs, "k long, payload binary")
        out = {r.k: r for r in cbor_extract(
            df, "k", "payload",
            {"id": "int", "score": "float", "t": "text",
             "raw": "bytes", "ok": "bool"},
        ).collect()}
        assert (out[1].id, out[1].score, out[1].t, out[1].raw,
                out[1].ok) == (10, 0.5, "x", "ab", True)
        assert out[2].id == 20 and out[2].score is None
        assert out[2].error is None
        for k in (3, 4, 5):
            assert out[k].error is not None and out[k].id is None

    def test_extract_rejects_unknown_kind(self, spark):
        df = spark.createDataFrame([(1, b"\xa0")], "k long, payload binary")
        with pytest.raises(ValueError, match="unknown kind"):
            cbor_extract(df, "k", "payload", {"x": "blob"})

    def test_extract_rejects_bookkeeping_collision(self, spark):
        df = spark.createDataFrame([(1, b"\xa0")], "k long, payload binary")
        with pytest.raises(ValueError, match="collides"):
            cbor_extract(df, "k", "payload", {"k": "int"})
        with pytest.raises(ValueError, match="collides"):
            cbor_extract(df, "k", "payload", {"error": "text"})
