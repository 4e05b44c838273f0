"""MessagePack wire-format laws (`sources/msgpack.py`): full
format-byte coverage with spec-vector pins, strict well-formedness,
census poison-rest stance, committed-schema extraction quarantine
laws (the CBOR/TFRecord discipline)."""

import pytest

from soda_spark_spark.sources.msgpack import (
    Ext,
    decode_msgpack,
    encode_msgpack,
    msgpack_extract,
    read_msgpack_records,
)


def _rt(v):
    raw = encode_msgpack(v)
    out, pos = decode_msgpack(raw)
    assert pos == len(raw)
    return out


class TestDecoder:
    def test_spec_example_vector(self):
        # the msgpack spec's own README example:
        # {"compact": true, "schema": 0} -> 18 bytes
        raw = bytes([0x82, 0xA7]) + b"compact" + bytes([0xC3, 0xA6]) \
            + b"schema" + bytes([0x00])
        assert len(raw) == 18
        v, pos = decode_msgpack(raw)
        assert v == {"compact": True, "schema": 0} and pos == 18

    def test_integer_widths(self):
        for n in (0, 1, 127, 128, 255, 256, 65535, 65536,
                  (1 << 32) - 1, 1 << 32, (1 << 64) - 1,
                  -1, -32, -33, -128, -129, -32768, -32769,
                  -(1 << 31), -(1 << 31) - 1, -(1 << 63)):
            assert _rt(n) == n

    def test_explicit_width_bytes(self):
        assert decode_msgpack(b"\xcc\xff")[0] == 255
        assert decode_msgpack(b"\xcd\x01\x00")[0] == 256
        assert decode_msgpack(b"\xcf" + b"\xff" * 8)[0] == (1 << 64) - 1
        assert decode_msgpack(b"\xd0\x80")[0] == -128
        assert decode_msgpack(b"\xd3" + b"\x80" + b"\x00" * 7)[0] \
            == -(1 << 63)

    def test_floats(self):
        assert _rt(1.5) == 1.5
        assert decode_msgpack(b"\xca\x3f\xc0\x00\x00")[0] == 1.5  # f32
        import struct
        raw = b"\xcb" + struct.pack(">d", -0.1)
        assert decode_msgpack(raw)[0] == -0.1

    def test_strings_and_bins(self):
        assert _rt("") == ""
        assert _rt("héllo") == "héllo"
        long = "x" * 40  # forces str8
        raw = encode_msgpack(long)
        assert raw[0] == 0xD9
        assert _rt(long) == long
        assert _rt(b"\x00\xff") == b"\x00\xff"

    def test_containers_nested(self):
        v = {"a": [1, "two", 3.0, None, True],
             "b": {"c": [-5, b"zz"]}}
        assert _rt(v) == v

    def test_big_array_and_map_framing(self):
        arr = list(range(20))  # forces array16
        raw = encode_msgpack(arr)
        assert raw[0] == 0xDC
        assert _rt(arr) == arr
        m = {f"k{i}": i for i in range(20)}  # forces map16
        raw = encode_msgpack(m)
        assert raw[0] == 0xDE
        assert _rt(m) == m

    def test_ext_surfaced_uninterpreted(self):
        e = Ext(-1, b"\x01\x02\x03\x04")  # the timestamp ext code
        out = _rt(e)
        assert out == e  # NOT a datetime — interpretation is ours

    def test_nil_bool(self):
        assert _rt(None) is None
        assert _rt(True) is True
        assert _rt(False) is False


class TestWellFormedness:
    def test_reserved_0xc1(self):
        with pytest.raises(ValueError, match="0xc1"):
            decode_msgpack(b"\xc1")

    def test_truncation(self):
        for raw in (b"\xcc", b"\xa3ab", b"\x92\x01", b"\xcb\x00"):
            with pytest.raises(ValueError):
                decode_msgpack(raw)

    def test_bad_utf8(self):
        with pytest.raises(ValueError, match="utf-8"):
            decode_msgpack(b"\xa2\xff\xfe")

    def test_duplicate_map_keys_rejected(self):
        raw = bytes([0x82, 0xA1]) + b"k" + bytes([0x01, 0xA1]) \
            + b"k" + bytes([0x02])
        with pytest.raises(ValueError, match="duplicate map key"):
            decode_msgpack(raw)

    def test_container_map_key_rejected(self):
        raw = bytes([0x81, 0x91, 0x01, 0x02])  # key = [1]
        with pytest.raises(ValueError, match="non-scalar map key"):
            decode_msgpack(raw)

    def test_nesting_cap(self):
        raw = b"\x91" * 70 + b"\x01"
        with pytest.raises(ValueError, match="nesting too deep"):
            decode_msgpack(raw)
        assert decode_msgpack(raw, max_depth=200)[0] is not None


class TestCensus:
    def test_kinds_and_nbytes(self, spark, tmp_path):
        p = str(tmp_path / "a.msgpack")
        objs = [{"k": 1}, [1, 2, 3], "txt", 7, 1.5, None, True,
                b"\x01", Ext(5, b"\x00\x01")]
        with open(p, "wb") as f:
            for o in objs:
                f.write(encode_msgpack(o))
        rows = sorted(
            read_msgpack_records(spark, p).collect(),
            key=lambda r: r.rec_index,
        )
        assert [r.kind for r in rows] == [
            "map", "array", "str", "int", "float", "nil", "bool",
            "bin", "ext",
        ]
        assert rows[0].n_children == 1 and rows[1].n_children == 3
        assert rows[3].nbytes == 1  # fixint
        assert all(r.error is None for r in rows)

    def test_poison_rest_on_corruption(self, spark, tmp_path):
        p = str(tmp_path / "a.msgpack")
        with open(p, "wb") as f:
            f.write(encode_msgpack({"k": 1}))
            f.write(b"\xc1")  # reserved byte
            f.write(encode_msgpack({"k": 2}))  # unreachable
        rows = sorted(
            read_msgpack_records(spark, p).collect(),
            key=lambda r: r.rec_index,
        )
        assert len(rows) == 2  # good record + ONE stop row
        assert rows[0].error is None and rows[0].kind == "map"
        assert rows[1].rec_index == 1
        assert "bad msgpack" in rows[1].error

    def test_truncated_tail_stops(self, spark, tmp_path):
        p = str(tmp_path / "a.msgpack")
        with open(p, "wb") as f:
            f.write(encode_msgpack([1, 2]))
            f.write(b"\xcd\x01")  # truncated uint16
        rows = read_msgpack_records(spark, p).collect()
        errs = [r for r in rows if r.error is not None]
        assert len(errs) == 1 and "truncated" in errs[0].error


class TestExtract:
    def _df(self, spark, payloads):
        return spark.createDataFrame(
            [(i, bytearray(encode_msgpack(p)))
             for i, p in enumerate(payloads)],
            "doc_id long, payload binary",
        )

    def test_typed_extraction_sparse_nulls(self, spark):
        df = self._df(spark, [
            {"n": 7, "t": "hi", "f": 1.5, "b": True,
             "raw": b"\x0a\xff", "v": [1.0, 2.5],
             "ids": [1, 2], "tags": ["x", "y"]},
            {"n": 9},  # sparse
        ])
        out = {r.doc_id: r for r in msgpack_extract(
            df, "doc_id", "payload",
            {"n": "int", "t": "text", "f": "float", "b": "bool",
             "raw": "bytes", "v": "array<double>",
             "ids": "array<long>", "tags": "array<text>"},
        ).collect()}
        r = out[0]
        assert (r.n, r.t, r.f, r.b) == (7, "hi", 1.5, True)
        assert r.raw == "0aff"
        assert r.v == [1.0, 2.5] and r.ids == [1, 2]
        assert r.tags == ["x", "y"] and r.error is None
        assert out[1].n == 9 and out[1].t is None
        assert out[1].error is None

    def test_kind_violation_quarantines(self, spark):
        df = self._df(spark, [{"n": "not-an-int"}, {"n": 3}])
        out = {r.doc_id: r for r in msgpack_extract(
            df, "doc_id", "payload", {"n": "int"}
        ).collect()}
        assert out[0].n is None and "not int" in out[0].error
        assert out[1].n == 3 and out[1].error is None

    def test_uint64_overflow_quarantines(self, spark):
        df = self._df(spark, [{"n": (1 << 63)}])
        r = msgpack_extract(
            df, "doc_id", "payload", {"n": "int"}
        ).collect()[0]
        assert r.n is None and "overflows int64" in r.error

    def test_mixed_array_quarantines(self, spark):
        df = self._df(spark, [{"v": [1.0, "two"]}])
        r = msgpack_extract(
            df, "doc_id", "payload", {"v": "array<double>"}
        ).collect()[0]
        assert r.v is None and "non-float" in r.error

    def test_non_map_record_quarantines(self, spark):
        df = self._df(spark, [[1, 2, 3]])
        r = msgpack_extract(
            df, "doc_id", "payload", {"n": "int"}
        ).collect()[0]
        assert "not a msgpack map" in r.error

    def test_trailing_bytes_quarantine(self, spark):
        raw = encode_msgpack({"n": 1}) + b"\x00"
        df = spark.createDataFrame(
            [(0, bytearray(raw))], "doc_id long, payload binary"
        )
        r = msgpack_extract(
            df, "doc_id", "payload", {"n": "int"}
        ).collect()[0]
        assert "trailing bytes" in r.error

    def test_string_id_passthrough(self, spark):
        df = spark.createDataFrame(
            [("doc-a", bytearray(encode_msgpack({"n": 4})))],
            "name string, payload binary",
        )
        r = msgpack_extract(
            df, "name", "payload", {"n": "int"}
        ).collect()[0]
        assert r.name == "doc-a" and r.n == 4

    def test_refusals(self, spark):
        df = self._df(spark, [{"n": 1}])
        with pytest.raises(ValueError, match="unknown kind"):
            msgpack_extract(df, "doc_id", "payload", {"n": "uuid"})
        with pytest.raises(ValueError, match="collides"):
            msgpack_extract(
                df, "doc_id", "payload", {"doc_id": "int"}
            )
        with pytest.raises(ValueError, match="collides"):
            msgpack_extract(
                df, "doc_id", "payload", {"error": "text"}
            )
