"""SafeTensors shard ingestion (`sources/safetensors.py`): header
validation laws, census, vector decode incl. the BF16 widening, and
the quarantine channels."""

from __future__ import annotations

import json
import struct

import numpy as np
import pytest

from soda_spark_spark.sources.safetensors import (
    parse_safetensors_header,
    read_safetensors_index,
    read_safetensors_vectors,
    write_safetensors,
)


def _shard(tensors, metadata=None) -> bytes:
    import tempfile

    p = tempfile.mktemp(suffix=".safetensors")
    write_safetensors(tensors, p, metadata=metadata)
    with open(p, "rb") as f:
        return f.read()


class TestHeaderLaws:
    def test_roundtrip(self):
        data = _shard({
            "a": np.arange(6, dtype=np.float32).reshape(2, 3),
            "b": np.arange(4, dtype=np.int64),
        }, metadata={"k": "v"})
        tensors, meta, buf0 = parse_safetensors_header(data)
        assert tensors["a"] == ("F32", [2, 3], 0, 24)
        assert tensors["b"] == ("I64", [4], 24, 56)
        assert json.loads(meta) == {"k": "v"}
        assert data[buf0:buf0 + 4] == struct.pack("<f", 0.0)

    def test_short_file(self):
        with pytest.raises(ValueError, match="shorter"):
            parse_safetensors_header(b"\x01\x02")

    def test_header_length_beyond_file(self):
        with pytest.raises(ValueError, match="exceeds file size"):
            parse_safetensors_header(struct.pack("<Q", 999) + b"{}")

    def test_header_not_json(self):
        bad = struct.pack("<Q", 4) + b"nope"
        with pytest.raises(ValueError, match="not valid JSON"):
            parse_safetensors_header(bad)

    def test_header_not_object(self):
        bad = struct.pack("<Q", 2) + b"[]"
        with pytest.raises(ValueError, match="not an object"):
            parse_safetensors_header(bad)

    def test_unknown_dtype(self):
        h = json.dumps({"t": {"dtype": "X9", "shape": [1],
                              "data_offsets": [0, 1]}}).encode()
        bad = struct.pack("<Q", len(h)) + h + b"\x00"
        with pytest.raises(ValueError, match="unknown dtype"):
            parse_safetensors_header(bad)

    def test_size_mismatch(self):
        h = json.dumps({"t": {"dtype": "F32", "shape": [2],
                              "data_offsets": [0, 4]}}).encode()
        bad = struct.pack("<Q", len(h)) + h + b"\x00" * 4
        with pytest.raises(ValueError, match="bytes for"):
            parse_safetensors_header(bad)

    def test_offsets_out_of_bounds(self):
        h = json.dumps({"t": {"dtype": "U8", "shape": [4],
                              "data_offsets": [0, 4]}}).encode()
        bad = struct.pack("<Q", len(h)) + h + b"\x00"  # 1-byte buffer
        with pytest.raises(ValueError, match="outside"):
            parse_safetensors_header(bad)

    def test_hole_between_tensors(self):
        h = json.dumps({
            "a": {"dtype": "U8", "shape": [1], "data_offsets": [0, 1]},
            "b": {"dtype": "U8", "shape": [1], "data_offsets": [2, 3]},
        }).encode()
        bad = struct.pack("<Q", len(h)) + h + b"\x00" * 3
        with pytest.raises(ValueError, match="not contiguous"):
            parse_safetensors_header(bad)

    def test_overlap_between_tensors(self):
        h = json.dumps({
            "a": {"dtype": "U8", "shape": [2], "data_offsets": [0, 2]},
            "b": {"dtype": "U8", "shape": [2], "data_offsets": [1, 3]},
        }).encode()
        bad = struct.pack("<Q", len(h)) + h + b"\x00" * 3
        with pytest.raises(ValueError, match="not contiguous"):
            parse_safetensors_header(bad)

    def test_uncovered_buffer_tail(self):
        h = json.dumps({
            "a": {"dtype": "U8", "shape": [1], "data_offsets": [0, 1]},
        }).encode()
        bad = struct.pack("<Q", len(h)) + h + b"\x00" * 5
        with pytest.raises(ValueError, match="not covered"):
            parse_safetensors_header(bad)

    def test_metadata_must_be_str_str(self):
        h = json.dumps({"__metadata__": {"k": 3}}).encode()
        bad = struct.pack("<Q", len(h)) + h
        with pytest.raises(ValueError, match="__metadata__"):
            parse_safetensors_header(bad)

    def test_bool_shape_rejected(self):
        h = json.dumps({"t": {"dtype": "U8", "shape": [True],
                              "data_offsets": [0, 1]}}).encode()
        bad = struct.pack("<Q", len(h)) + h + b"\x00"
        with pytest.raises(ValueError, match="bad shape"):
            parse_safetensors_header(bad)

    def test_zero_element_tensor_ok(self):
        data = _shard({"empty": np.zeros((0, 4), dtype=np.float32),
                       "one": np.ones(1, dtype=np.uint8)})
        tensors, _, _ = parse_safetensors_header(data)
        assert tensors["empty"] == ("F32", [0, 4], 0, 0)


class TestSparkReaders:
    def test_index_census(self, spark, tmp_path):
        write_safetensors({
            "w": np.zeros((3, 4), dtype=np.float16),
            "ids": np.arange(5, dtype=np.int32),
        }, str(tmp_path / "a.safetensors"), metadata={"fmt": "pt"})
        got = {r.tensor: r for r in read_safetensors_index(
            spark, str(tmp_path / "a.safetensors")).collect()}
        assert got["ids"].dtype == "I32" and got["ids"].nbytes == 20
        assert got["w"].shape == [3, 4] and got["w"].n_elements == 12
        assert json.loads(got["w"].metadata) == {"fmt": "pt"}
        assert got["ids"].offset_begin == 0   # sorted-name layout
        assert got["w"].offset_begin == 20

    def test_index_quarantines_corrupt_file(self, spark, tmp_path):
        (tmp_path / "bad.safetensors").write_bytes(
            struct.pack("<Q", 2) + b"{}" + b"EXTRA"
        )
        rows = read_safetensors_index(
            spark, str(tmp_path / "bad.safetensors")).collect()
        assert len(rows) == 1
        assert rows[0].tensor is None
        assert "bad safetensors" in rows[0].error

    def test_vectors_roundtrip_f32(self, spark, tmp_path):
        mat = np.arange(12, dtype=np.float32).reshape(3, 4) / 7.0
        write_safetensors({"emb": mat},
                          str(tmp_path / "v.safetensors"))
        rows = read_safetensors_vectors(
            spark, str(tmp_path / "v.safetensors")).collect()
        assert len(rows) == 3
        by_i = {r.row_index: r for r in rows}
        assert by_i[1].embedding == [float(x) for x in mat[1]]
        assert by_i[0].dim == 4 and by_i[0].error is None

    def test_vectors_bf16_widening_exact(self, spark, tmp_path):
        # hand-build a BF16 tensor: bf16 is the top half of binary32
        f32 = np.array([1.5, -2.25, 0.0, 3.0], dtype=np.float32)
        u16 = (f32.view(np.uint32) >> 16).astype(np.uint16)
        h = json.dumps({"t": {"dtype": "BF16", "shape": [4],
                              "data_offsets": [0, 8]}}).encode()
        (tmp_path / "b.safetensors").write_bytes(
            struct.pack("<Q", len(h)) + h + u16.tobytes()
        )
        rows = read_safetensors_vectors(
            spark, str(tmp_path / "b.safetensors")).collect()
        # these values have zero low-mantissa bits: exact round-trip
        assert rows[0].embedding == [1.5, -2.25, 0.0, 3.0]

    def test_vectors_rank3_quarantines_tensor_only(self, spark, tmp_path):
        write_safetensors({
            "cube": np.zeros((2, 2, 2), dtype=np.float32),
            "flat": np.ones(3, dtype=np.float32),
        }, str(tmp_path / "m.safetensors"))
        rows = read_safetensors_vectors(
            spark, str(tmp_path / "m.safetensors")).collect()
        errs = [r for r in rows if r.error]
        good = [r for r in rows if not r.error]
        assert len(errs) == 1 and errs[0].tensor == "cube"
        assert len(good) == 1 and good[0].embedding == [1.0, 1.0, 1.0]

    def test_vectors_named_tensor_filter(self, spark, tmp_path):
        write_safetensors({
            "a": np.zeros(2, dtype=np.float32),
            "b": np.ones(2, dtype=np.float32),
        }, str(tmp_path / "n.safetensors"))
        rows = read_safetensors_vectors(
            spark, str(tmp_path / "n.safetensors"), tensor="b").collect()
        assert len(rows) == 1 and rows[0].tensor == "b"
