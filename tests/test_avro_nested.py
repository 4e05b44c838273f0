"""Round-19 Avro surface: nested records (dotted columns), typed
array/map columns, the from-scratch snappy codec (+ the Avro CRC32
suffix), logical types (date / timestamp-millis / timestamp-micros /
decimal), integer range quarantine, URI-glob head expansion, and the
pinned first-file schema election."""

from __future__ import annotations

import datetime
import decimal
import json
import struct
import zlib

import pytest

from soda_spark_spark.sources.avro_ocf import (
    _snappy_compress,
    _snappy_decompress,
    read_avro_records,
    write_avro,
)

NESTED = json.dumps({
    "type": "record", "name": "Doc",
    "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "addr", "type": {
            "type": "record", "name": "Addr",
            "fields": [
                {"name": "city", "type": "string"},
                {"name": "zip", "type": ["null", "string"]},
            ]}},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "scores", "type": {"type": "map", "values": "double"}},
    ],
})


class TestSnappyCodec:
    def test_literal_roundtrip(self):
        data = b"hello snappy world" * 100
        assert _snappy_decompress(
            _snappy_compress(data), 1 << 20
        ) == data

    def test_empty_roundtrip(self):
        assert _snappy_decompress(_snappy_compress(b""), 10) == b""

    def test_copy_elements_decode(self):
        # hand-craft: literal "abcd" then a 1-byte-offset copy of
        # len 8 off=4 -> "abcdabcd" repeated pattern (overlap path)
        comp = bytes([12]) + bytes([(4 - 1) << 2]) + b"abcd"
        comp += bytes([((8 - 4) << 2) | 1, 4])  # type-1 copy len 8 off 4
        assert _snappy_decompress(comp, 100) == b"abcdabcdabcd"

    def test_two_byte_offset_copy(self):
        data = b"x" * 70
        comp = bytearray([70])  # varint 70
        comp += bytes([61 << 2]) + (64 - 1).to_bytes(2, "little")
        comp += b"x" * 64
        comp += bytes([((6 - 1) << 2) | 2]) + (64).to_bytes(2, "little")
        assert _snappy_decompress(bytes(comp), 100) == data

    def test_bad_offset_raises(self):
        comp = bytes([4]) + bytes([((4 - 4) << 2) | 1, 9])
        with pytest.raises(ValueError, match="copy offset"):
            _snappy_decompress(comp, 100)

    def test_length_mismatch_raises(self):
        comp = bytes([10]) + bytes([(4 - 1) << 2]) + b"abcd"
        with pytest.raises(ValueError, match="length mismatch"):
            _snappy_decompress(comp, 100)

    def test_bomb_guard(self):
        with pytest.raises(ValueError, match="exceeds"):
            _snappy_decompress(_snappy_compress(b"z" * 1000), 10)


class TestNestedAndContainers:
    def test_nested_record_flattens_to_dotted_columns(
        self, spark, tmp_path
    ):
        recs = [
            {"doc_id": 1,
             "addr": {"city": "oslo", "zip": "0150"},
             "tags": ["a", "b"], "scores": {"q": 1.5}},
            {"doc_id": 2,
             "addr": {"city": "bergen", "zip": None},
             "tags": [], "scores": {}},
        ]
        p = str(tmp_path / "n.avro")
        write_avro(recs, NESTED, p)
        df = read_avro_records(spark, p)
        assert "addr.city" in df.columns and "addr.zip" in df.columns
        rows = {r.rec_index: r for r in df.collect()}
        assert rows[0]["addr.city"] == "oslo"
        assert rows[0].tags == ["a", "b"]
        assert rows[0].scores == {"q": 1.5}
        assert rows[1]["addr.zip"] is None
        assert rows[1].tags == [] and rows[1].scores == {}

    def test_nullable_nested_record_nulls_children(
        self, spark, tmp_path
    ):
        s = json.dumps({
            "type": "record", "name": "R",
            "fields": [
                {"name": "k", "type": "long"},
                {"name": "sub", "type": ["null", {
                    "type": "record", "name": "S",
                    "fields": [{"name": "x", "type": "long"},
                               {"name": "y", "type": "string"}]}]},
            ],
        })
        p = str(tmp_path / "nn.avro")
        write_avro(
            [{"k": 1, "sub": {"x": 5, "y": "v"}},
             {"k": 2, "sub": None}],
            s, p,
        )
        rows = {r.k: r for r in read_avro_records(spark, p).collect()}
        assert rows[1]["sub.x"] == 5 and rows[1]["sub.y"] == "v"
        assert rows[2]["sub.x"] is None and rows[2]["sub.y"] is None

    def test_snappy_shard_roundtrip(self, spark, tmp_path):
        recs = [{"doc_id": i, "addr": {"city": f"c{i}", "zip": None},
                 "tags": [f"t{i}"], "scores": {"s": float(i)}}
                for i in range(50)]
        p = str(tmp_path / "s.avro")
        write_avro(recs, NESTED, p, codec="snappy")
        df = read_avro_records(spark, p)
        got = sorted(
            (r.doc_id, r["addr.city"]) for r in df.collect()
        )
        assert got == [(i, f"c{i}") for i in range(50)]

    def test_snappy_crc_mismatch_quarantines(self, spark, tmp_path):
        s = json.dumps({
            "type": "record", "name": "R",
            "fields": [{"name": "v", "type": "long"}],
        })
        p = tmp_path / "crc.avro"
        write_avro([{"v": 1}], s, str(p), codec="snappy")
        raw = bytearray(p.read_bytes())
        # flip a CRC byte: the block payload's last 4 bytes precede
        # the trailing 16-byte sync
        raw[-17] ^= 0xFF
        p.write_bytes(bytes(raw))
        rows = read_avro_records(spark, str(p)).collect()
        assert len(rows) == 1 and "CRC mismatch" in rows[0].error


class TestLogicalTypes:
    LOGICAL = json.dumps({
        "type": "record", "name": "Evt",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "d", "type": {
                "type": "int", "logicalType": "date"}},
            {"name": "ts_ms", "type": {
                "type": "long", "logicalType": "timestamp-millis"}},
            {"name": "ts_us", "type": {
                "type": "long", "logicalType": "timestamp-micros"}},
            {"name": "amount", "type": {
                "type": "bytes", "logicalType": "decimal",
                "precision": 10, "scale": 2}},
            {"name": "fx", "type": {
                "type": "fixed", "name": "F8", "size": 8,
                "logicalType": "decimal",
                "precision": 12, "scale": 4}},
        ],
    })

    def test_logical_roundtrip(self, spark, tmp_path):
        p = str(tmp_path / "l.avro")
        write_avro([{
            "k": 1,
            "d": datetime.date(2021, 3, 14),
            "ts_ms": datetime.datetime(2021, 3, 14, 1, 59, 26, 535000),
            "ts_us": datetime.datetime(2021, 3, 14, 1, 59, 26, 535897),
            "amount": decimal.Decimal("-12345.67"),
            "fx": decimal.Decimal("3.1415"),
        }], self.LOGICAL, p)
        df = read_avro_records(spark, p)
        types = dict(df.dtypes)
        assert types["d"] == "date"
        assert types["ts_ms"] == "timestamp"
        assert types["amount"] == "decimal(10,2)"
        assert types["fx"] == "decimal(12,4)"
        (r,) = df.collect()
        assert r.d == datetime.date(2021, 3, 14)
        assert r.ts_ms == datetime.datetime(
            2021, 3, 14, 1, 59, 26, 535000)
        assert r.ts_us == datetime.datetime(
            2021, 3, 14, 1, 59, 26, 535897)
        assert r.amount == decimal.Decimal("-12345.67")
        assert r.fx == decimal.Decimal("3.1415")

    def test_negative_date_and_epoch(self, spark, tmp_path):
        p = str(tmp_path / "l2.avro")
        write_avro([{
            "k": 1, "d": datetime.date(1969, 12, 31),
            "ts_ms": 0, "ts_us": -1,
            "amount": decimal.Decimal("0.00"),
            "fx": decimal.Decimal("-0.0001"),
        }], self.LOGICAL, p)
        (r,) = read_avro_records(spark, p).collect()
        assert r.d == datetime.date(1969, 12, 31)
        assert r.ts_ms == datetime.datetime(1970, 1, 1)
        assert r.ts_us == datetime.datetime(
            1969, 12, 31, 23, 59, 59, 999999)
        assert r.amount == decimal.Decimal("0.00")
        assert r.fx == decimal.Decimal("-0.0001")

    def test_unknown_logical_falls_back_to_base_type(
        self, spark, tmp_path
    ):
        s = json.dumps({
            "type": "record", "name": "R",
            "fields": [{"name": "u", "type": {
                "type": "string", "logicalType": "uuid"}},
                {"name": "k", "type": "long"}],
        })
        p = str(tmp_path / "u.avro")
        write_avro([{"u": "abc", "k": 1}], s, p)
        (r,) = read_avro_records(spark, p).collect()
        assert r.u == "abc"

    def test_decimal_precision_overflow_quarantines(
        self, spark, tmp_path
    ):
        s = json.dumps({
            "type": "record", "name": "R",
            "fields": [{"name": "a", "type": {
                "type": "bytes", "logicalType": "decimal",
                "precision": 3, "scale": 1}}],
        })
        p = str(tmp_path / "dp.avro")
        # unscaled 12345 exceeds precision 3
        write_avro([{"a": 12345}], s, p)
        rows = read_avro_records(spark, p).collect()
        assert len(rows) == 1
        assert "exceeds precision" in rows[0].error


class TestIntegerRangeLaws:
    def test_int_overflow_quarantines(self, spark, tmp_path):
        s = json.dumps({
            "type": "record", "name": "R",
            "fields": [{"name": "v", "type": "int"}],
        })
        p = str(tmp_path / "i.avro")
        # encoder is long-width; 2^31 is out of int range
        write_avro([{"v": 1 << 31}], s, p)
        rows = read_avro_records(spark, p).collect()
        assert len(rows) == 1
        assert "outside 32-bit range" in rows[0].error

    def test_long_varint_past_2p63_quarantines(self, spark, tmp_path):
        from soda_spark_spark.sources.avro_ocf import (
            _MAGIC, _zigzag_encode,
        )

        s = json.dumps({
            "type": "record", "name": "R",
            "fields": [{"name": "v", "type": "long"}],
        })
        sync = bytes(range(16))
        buf = bytearray(_MAGIC)
        meta = {"avro.schema": s.encode(), "avro.codec": b"null"}
        buf += _zigzag_encode(len(meta))
        for k, v in sorted(meta.items()):
            kb = k.encode()
            buf += _zigzag_encode(len(kb)) + kb
            buf += _zigzag_encode(len(v)) + v
        buf += _zigzag_encode(0) + sync
        # a 10-byte varint whose zigzag value is 2^63 (legal wire,
        # out of int64): zigzag(2^63) = 2^64 as unsigned varint
        payload = b"\x80" * 9 + b"\x02"
        buf += _zigzag_encode(1) + _zigzag_encode(len(payload))
        buf += payload + sync
        p = tmp_path / "big.avro"
        p.write_bytes(bytes(buf))
        rows = read_avro_records(spark, str(p)).collect()
        assert len(rows) == 1
        assert (
            "outside 64-bit range" in rows[0].error
            or "varint too long" in rows[0].error
        )


class TestPathHandling:
    def test_uri_glob_head_expansion(self, spark, tmp_path):
        s = json.dumps({
            "type": "record", "name": "R",
            "fields": [{"name": "v", "type": "long"}],
        })
        write_avro([{"v": 1}], s, str(tmp_path / "part-0.avro"))
        write_avro([{"v": 2}], s, str(tmp_path / "part-1.avro"))
        uri = f"file://{tmp_path}/part-*.avro"
        got = sorted(
            r.v for r in read_avro_records(spark, uri).collect()
        )
        assert got == [1, 2]

    def test_first_file_schema_election_is_sorted_order(
        self, spark, tmp_path
    ):
        s1 = json.dumps({
            "type": "record", "name": "R",
            "fields": [{"name": "v", "type": "long"}],
        })
        s2 = json.dumps({
            "type": "record", "name": "R",
            "fields": [{"name": "w", "type": "string"}],
        })
        # lexicographically FIRST file carries s1 -> s1 wins and the
        # divergent file quarantines, regardless of creation order
        write_avro([{"w": "x"}], s2, str(tmp_path / "b.avro"))
        write_avro([{"v": 9}], s1, str(tmp_path / "a.avro"))
        df = read_avro_records(spark, str(tmp_path / "*.avro"))
        assert "v" in df.columns and "w" not in df.columns
        rows = df.collect()
        good = [r for r in rows if r.error is None]
        bad = [r for r in rows if r.error is not None]
        assert len(good) == 1 and good[0].v == 9
        assert len(bad) == 1
        assert "differs from the plan schema" in bad[0].error


class TestNamedReferences:
    def test_enum_reference_by_name(self, spark, tmp_path):
        s = json.dumps({
            "type": "record", "name": "R",
            "fields": [
                {"name": "a", "type": {
                    "type": "enum", "name": "Lang",
                    "symbols": ["en", "de"]}},
                {"name": "b", "type": "Lang"},
            ],
        })
        p = str(tmp_path / "er.avro")
        write_avro([{"a": "en", "b": "de"}], s, p)
        (r,) = read_avro_records(spark, p).collect()
        assert r.a == "en" and r.b == "de"

    def test_record_reference_by_fullname(self, spark, tmp_path):
        s = json.dumps({
            "type": "record", "name": "R", "namespace": "com.x",
            "fields": [
                {"name": "p1", "type": {
                    "type": "record", "name": "Pt",
                    "fields": [{"name": "x", "type": "long"},
                               {"name": "y", "type": "long"}]}},
                {"name": "p2", "type": "com.x.Pt"},
                {"name": "p3", "type": ["null", "Pt"]},
            ],
        })
        p = str(tmp_path / "rr.avro")
        write_avro([{
            "p1": {"x": 1, "y": 2},
            "p2": {"x": 3, "y": 4},
            "p3": None,
        }], s, p)
        df = read_avro_records(spark, p)
        assert "p2.x" in df.columns and "p3.y" in df.columns
        (r,) = df.collect()
        assert r["p1.x"] == 1 and r["p2.y"] == 4
        assert r["p3.x"] is None

    def test_recursive_schema_rejected(self):
        from soda_spark_spark.sources.avro_ocf import _parse_schema

        s = json.dumps({
            "type": "record", "name": "Node",
            "fields": [
                {"name": "v", "type": "long"},
                {"name": "next", "type": ["null", "Node"]},
            ],
        })
        with pytest.raises(ValueError, match="recursive"):
            _parse_schema(s)

    def test_unknown_reference_rejected(self):
        from soda_spark_spark.sources.avro_ocf import _parse_schema

        s = json.dumps({
            "type": "record", "name": "R",
            "fields": [{"name": "a", "type": "Mystery"}],
        })
        with pytest.raises(ValueError, match="unsupported field type"):
            _parse_schema(s)

    def test_fixed_decimal_reference(self, spark, tmp_path):
        s = json.dumps({
            "type": "record", "name": "R",
            "fields": [
                {"name": "a", "type": {
                    "type": "fixed", "name": "Amt", "size": 4,
                    "logicalType": "decimal",
                    "precision": 8, "scale": 2}},
                {"name": "b", "type": "Amt"},
            ],
        })
        p = str(tmp_path / "fd.avro")
        write_avro(
            [{"a": decimal.Decimal("12.50"),
              "b": decimal.Decimal("-0.75")}], s, p)
        (r,) = read_avro_records(spark, p).collect()
        assert r.a == decimal.Decimal("12.50")
        assert r.b == decimal.Decimal("-0.75")
