"""Round-19 fix regressions — one test per verdict/advice item:

- mime: the child-level attachment rule now applies at depth 0 (a
  top-level message/rfc822 or attachment-disposition root is ONE
  attachment, its internals never reach body selection);
- mbox: the per-message `max_bytes` bound holds in `read_mbox` too,
  so the split law has no raw-archive edge gap;
- cbor_extract: committed ints are range-checked to int64 (a legal
  CBOR uint64 >= 2^63 quarantines instead of crashing the task),
  non-integer id columns pass through, and the new array kinds
  extract homogeneous arrays;
- tfrecord: tf_example_decode / tf_examples accept string doc ids;
- safetensors: the census is ranged (exactly 8 + header_len bytes
  read), shards beyond the 2 GiB binaryFile cap census and stream,
  and F8 (E4M3FN/E5M2) widens exactly.
"""

from __future__ import annotations

import json
import struct

import numpy as np
import pytest

from soda_spark_spark.operators.mime import eml_parse
from soda_spark_spark.sources.cbor import cbor_extract, encode_cbor
from soda_spark_spark.sources.mbox import read_mbox, read_mbox_split, write_mbox
from soda_spark_spark.sources.safetensors import (
    _fetch_header,
    read_safetensors_index,
    read_safetensors_vectors,
    write_safetensors,
)
from soda_spark_spark.sources.tfrecord import (
    build_tf_example,
    tf_example_decode,
    tf_examples,
)


class TestMimeTopLevelAttachment:
    def test_rfc822_root_is_one_attachment(self):
        inner = (
            b"From: inner@example.com\r\n"
            b"Subject: inner\r\n"
            b"Content-Type: text/plain\r\n\r\n"
            b"INNER BODY MUST NOT WIN\r\n"
        )
        outer = (
            b"From: outer@example.com\r\n"
            b"Subject: fwd\r\n"
            b"Content-Type: message/rfc822\r\n\r\n" + inner
        )
        m = eml_parse(outer)
        assert m["n_attachments"] == 1
        assert m["n_parts"] == 1
        assert m["body_text"] is None
        assert m["attachment_types"] == "message/rfc822"
        assert m["attachment_bytes"] > 0

    def test_attachment_disposition_root_counts_as_attachment(self):
        msg = (
            b"From: a@example.com\r\n"
            b"Content-Type: text/plain\r\n"
            b"Content-Disposition: attachment; filename=x.txt\r\n\r\n"
            b"file payload\r\n"
        )
        m = eml_parse(msg)
        assert m["n_attachments"] == 1
        assert m["body_text"] is None
        assert m["attachment_types"] == "text/plain"

    def test_plain_single_part_still_body(self):
        msg = (
            b"From: a@example.com\r\n"
            b"Content-Type: text/plain\r\n\r\n"
            b"hello\r\n"
        )
        m = eml_parse(msg)
        assert m["body_text"] == "hello"
        assert m["n_attachments"] == 0


def _msg(i: int, extra: bytes = b"") -> bytes:
    return (
        b"From: u%d@example.com\nMessage-ID: <m%d@x>\n"
        b"Subject: s%d\n\nbody %d\n" % (i, i, i, i) + extra
    )


class TestMboxMaxBytesLaw:
    def test_read_mbox_quarantines_oversize_message(self, spark, tmp_path):
        p = str(tmp_path / "a.mbox")
        write_mbox([_msg(0), _msg(1, b"X" * 3000), _msg(2)], p)
        rows = sorted(
            read_mbox(spark, p, max_bytes=1024).collect(),
            key=lambda r: r.msg_index,
        )
        assert len(rows) == 3
        assert rows[0].error is None and rows[2].error is None
        assert "message spans more than 1024 bytes" in rows[1].error
        assert rows[1].msg_index == 1

    def test_split_law_holds_with_oversize_message(self, spark, tmp_path):
        p = str(tmp_path / "b.mbox")
        write_mbox(
            [_msg(0), _msg(1, b"Y" * 5000), _msg(2), _msg(3)], p
        )
        whole = sorted(
            read_mbox(spark, p, max_bytes=2048).collect(),
            key=lambda r: r.msg_index,
        )
        split = sorted(
            read_mbox_split(
                spark, p, chunk_bytes=512, max_bytes=2048
            ).collect(),
            key=lambda r: r.msg_index,
        )
        assert [r.msg_index for r in whole] == [r.msg_index for r in split]
        assert [r.subject for r in whole] == [r.subject for r in split]
        assert [r.error for r in whole] == [r.error for r in split]
        assert "message spans more than 2048 bytes" in whole[1].error


class TestCborExtractHardening:
    def test_uint64_overflow_quarantines(self, spark):
        good = encode_cbor({"n": 7})
        huge = encode_cbor({"n": (1 << 63)})  # legal CBOR, > int64
        df = spark.createDataFrame(
            [(1, bytearray(good)), (2, bytearray(huge))],
            "doc_id long, payload binary",
        )
        rows = {
            r.doc_id: r
            for r in cbor_extract(
                df, "doc_id", "payload", {"n": "int"}
            ).collect()
        }
        assert rows[1].n == 7 and rows[1].error is None
        assert rows[2].n is None
        assert "overflows int64" in rows[2].error

    def test_array_long_overflow_quarantines(self, spark):
        df = spark.createDataFrame(
            [(1, bytearray(encode_cbor({"v": [1, (1 << 63)]})))],
            "doc_id long, payload binary",
        )
        (r,) = cbor_extract(
            df, "doc_id", "payload", {"v": "array<long>"}
        ).collect()
        assert r.v is None and "overflows int64" in r.error

    def test_string_id_passes_through(self, spark):
        df = spark.createDataFrame(
            [("doc-a", bytearray(encode_cbor({"t": "x"})))],
            "doc_id string, payload binary",
        )
        (r,) = cbor_extract(
            df, "doc_id", "payload", {"t": "text"}
        ).collect()
        assert r.doc_id == "doc-a" and r.t == "x"

    def test_array_kinds_extract(self, spark):
        rec = {
            "tags": ["a", "b"],
            "emb": [1.5, -2.0],
            "ids": [3, 4, 5],
        }
        df = spark.createDataFrame(
            [(1, bytearray(encode_cbor(rec)))],
            "doc_id long, payload binary",
        )
        (r,) = cbor_extract(
            df, "doc_id", "payload",
            {"tags": "array<text>", "emb": "array<double>",
             "ids": "array<long>"},
        ).collect()
        assert r.tags == ["a", "b"]
        assert r.emb == [1.5, -2.0]
        assert r.ids == [3, 4, 5]
        assert r.error is None

    def test_mixed_array_quarantines(self, spark):
        df = spark.createDataFrame(
            [(1, bytearray(encode_cbor({"ids": [1, "x"]})))],
            "doc_id long, payload binary",
        )
        (r,) = cbor_extract(
            df, "doc_id", "payload", {"ids": "array<long>"}
        ).collect()
        assert r.ids is None and "not int" in r.error

    def test_non_array_for_array_kind_quarantines(self, spark):
        df = spark.createDataFrame(
            [(1, bytearray(encode_cbor({"ids": 5})))],
            "doc_id long, payload binary",
        )
        (r,) = cbor_extract(
            df, "doc_id", "payload", {"ids": "array<long>"}
        ).collect()
        assert r.ids is None and "not an array" in r.error


class TestTfrecordStringIds:
    def test_decode_with_string_id(self, spark):
        payload = build_tf_example({"lbl": [3]})
        df = spark.createDataFrame(
            [("doc-z", bytearray(payload))],
            "doc_id string, payload binary",
        )
        (r,) = tf_example_decode(
            df, "doc_id", "payload", {"lbl": "int64"}
        ).collect()
        assert r.doc_id == "doc-z" and r.lbl == [3]

    def test_examples_census_with_string_id(self, spark):
        payload = build_tf_example({"txt": [b"hi"]})
        df = spark.createDataFrame(
            [("k-1", bytearray(payload))],
            "doc_id string, payload binary",
        )
        (r,) = tf_examples(df, "doc_id", "payload").collect()
        assert r.id == "k-1" and r.key == "txt" and r.str0 == "hi"


class _CountingFile:
    """File shim that counts bytes handed out — the census must read
    exactly 8 + header_len, never tensor data."""

    def __init__(self, path):
        self._f = open(path, "rb")
        self.bytes_read = 0

    def read(self, n):
        data = self._f.read(n)
        self.bytes_read += len(data)
        return data

    def seek(self, pos):
        return self._f.seek(pos)

    def close(self):
        self._f.close()


class TestSafetensorsRanged:
    def test_census_reads_header_only(self, tmp_path):
        p = str(tmp_path / "big.safetensors")
        write_safetensors(
            {"w": np.zeros(100_000, dtype=np.float32)}, p
        )
        import os

        size = os.path.getsize(p)
        f = _CountingFile(p)
        tensors, _, buf0 = _fetch_header(f, size)
        f.close()
        assert tensors["w"][0] == "F32"
        assert f.bytes_read == buf0  # 8 + header_len, nothing more
        assert f.bytes_read < 1000 < size

    def test_census_beyond_2gib_sparse_shard(self, spark, tmp_path):
        # a 2.5 GB shard (sparse on disk) — binaryFile would refuse
        # it; the ranged census must not care
        n_elem = 650_000_000  # 2.6e9 bytes of F32
        h = json.dumps({
            "big": {"dtype": "F32", "shape": [n_elem],
                    "data_offsets": [0, 4 * n_elem]},
            "a_small": {"dtype": "F32", "shape": [1, 4],
                        "data_offsets": [4 * n_elem, 4 * n_elem + 16]},
        }).encode()
        p = tmp_path / "huge.safetensors"
        with open(p, "wb") as f:
            f.write(struct.pack("<Q", len(h)) + h)
            f.seek(8 + len(h) + 4 * n_elem + 16 - 1)
            f.write(b"\x00")
        rows = {r.tensor: r for r in read_safetensors_index(
            spark, str(p)).collect()}
        assert rows["big"].n_elements == n_elem
        assert rows["big"].error is None
        assert rows["a_small"].nbytes == 16

    def test_vectors_stream_one_tensor_from_huge_shard(
        self, spark, tmp_path
    ):
        n_elem = 650_000_000
        h = json.dumps({
            "a_small": {"dtype": "F32", "shape": [1, 4],
                        "data_offsets": [0, 16]},
            "big": {"dtype": "F32", "shape": [n_elem],
                    "data_offsets": [16, 16 + 4 * n_elem]},
        }).encode()
        p = tmp_path / "huge2.safetensors"
        vals = np.array([[1.0, 2.5, -3.0, 4.0]], dtype=np.float32)
        with open(p, "wb") as f:
            f.write(struct.pack("<Q", len(h)) + h)
            f.write(vals.tobytes())
            f.seek(8 + len(h) + 16 + 4 * n_elem - 1)
            f.write(b"\x00")
        rows = read_safetensors_vectors(
            spark, str(p), tensor="a_small"
        ).collect()
        assert len(rows) == 1
        assert rows[0].embedding == [1.0, 2.5, -3.0, 4.0]

    def test_f8_e4m3_decode_exact(self, spark, tmp_path):
        # E4M3FN: 0x00=+0, 0x38=1.0 (e=7), 0xC0=-2.0? check:
        # 0x40 = e=8,m=0 -> 2.0; 0xC0 its negative; 0x7E = 448 (max);
        # 0x7F = NaN; 0x01 = smallest subnormal 2^-9
        raw = bytes([0x00, 0x38, 0x40, 0xC0, 0x7E, 0x01])
        p = str(tmp_path / "f8.safetensors")
        write_safetensors({"t": ("F8_E4M3", [6], raw)}, p)
        (row,) = read_safetensors_vectors(spark, p).collect()
        got = row.embedding
        assert got[0] == 0.0
        assert got[1] == 1.0
        assert got[2] == 2.0
        assert got[3] == -2.0
        assert got[4] == 448.0
        assert got[5] == 2.0 ** -9

    def test_f8_e4m3_nan_becomes_null(self, spark, tmp_path):
        # NaN payloads surface as NULL elements (the pandas->Arrow
        # null convention every float decoder in this repo shares);
        # the point here is they are NOT infinities — E4M3FN has none
        p = str(tmp_path / "f8n.safetensors")
        write_safetensors(
            {"t": ("F8_E4M3", [2], bytes([0x7F, 0xFF]))}, p
        )
        (row,) = read_safetensors_vectors(spark, p).collect()
        assert row.embedding == [None, None]

    def test_f8_e5m2_inf_and_values(self, spark, tmp_path):
        import math

        # E5M2: 0x3C = e=15,m=0 -> 1.0; 0x7C = +inf; 0xFC = -inf;
        # 0x7E = NaN; 0x04 = smallest normal 2^-14
        raw = bytes([0x3C, 0x7C, 0xFC, 0x7E, 0x04])
        p = str(tmp_path / "f8b.safetensors")
        write_safetensors({"t": ("F8_E5M2", [5], raw)}, p)
        (row,) = read_safetensors_vectors(spark, p).collect()
        got = row.embedding
        assert got[0] == 1.0
        assert got[1] == math.inf and got[2] == -math.inf
        assert got[3] is None  # NaN -> NULL element (Arrow convention)
        assert got[4] == 2.0 ** -14

    def test_vectors_chunked_rows_keep_global_index(
        self, spark, tmp_path
    ):
        # chunk_bytes forces ~3 rows per ranged read; row_index and
        # values must be identical to the unchunked decode
        mat = np.arange(40, dtype=np.float32).reshape(10, 4) / 3.0
        p = str(tmp_path / "c.safetensors")
        write_safetensors({"emb": mat}, p)
        whole = {
            r.row_index: r.embedding
            for r in read_safetensors_vectors(spark, p).collect()
        }
        chunked = {
            r.row_index: r.embedding
            for r in read_safetensors_vectors(
                spark, p, chunk_bytes=48
            ).collect()
        }
        assert whole == chunked and len(chunked) == 10
        assert chunked[7] == [float(x) for x in mat[7]]

    def test_census_matches_old_error_laws(self, spark, tmp_path):
        (tmp_path / "bad.safetensors").write_bytes(
            struct.pack("<Q", 2) + b"{}" + b"EXTRA"
        )
        rows = read_safetensors_index(
            spark, str(tmp_path / "bad.safetensors")
        ).collect()
        assert len(rows) == 1 and "bad safetensors" in rows[0].error

    def test_vectors_file_error_one_row(self, spark, tmp_path):
        (tmp_path / "bad2.safetensors").write_bytes(b"\x01\x02")
        rows = read_safetensors_vectors(
            spark, str(tmp_path / "bad2.safetensors")
        ).collect()
        assert len(rows) == 1 and "shorter" in rows[0].error

    def test_census_plan_has_no_binary_file_scan(self, spark, tmp_path):
        # the whole point of the rework: the plan must not contain a
        # binaryFile scan (which materializes full shard content and
        # caps at ~2 GiB) — only the (file, size) plan rows + Arrow
        p = str(tmp_path / "p.safetensors")
        write_safetensors({"w": np.zeros(4, dtype=np.float32)}, p)
        df = read_safetensors_index(spark, p)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "binaryFile" not in plan
        assert "MapInPandas" in plan
        vdf = read_safetensors_vectors(spark, p)
        vplan = vdf._jdf.queryExecution().executedPlan().toString()
        assert "binaryFile" not in vplan
