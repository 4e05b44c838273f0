"""Rank-N SafeTensors slice reader laws
(`sources/safetensors.py` `read_safetensors_slices`): one row per
last-axis vector at any rank, GLOBAL flattened row_index stable
across chunked reads, unflattened coordinate indices, parity with
the rank-1/2 vectors reader, dtype widening, quarantine contract."""

import numpy as np
import pytest

from soda_spark_spark.sources.safetensors import (
    read_safetensors_slices,
    read_safetensors_vectors,
    write_safetensors,
)


def _rank3(shape=(2, 3, 4)):
    n = int(np.prod(shape))
    return np.arange(n, dtype=np.float32).reshape(shape)


class TestRank3:
    def test_values_indices_dim(self, spark, tmp_path):
        p = str(tmp_path / "a.safetensors")
        t = _rank3()
        write_safetensors({"attn": t}, p)
        rows = sorted(
            read_safetensors_slices(spark, p).collect(),
            key=lambda r: r.row_index,
        )
        assert len(rows) == 6 and all(r.error is None for r in rows)
        assert [r.row_index for r in rows] == list(range(6))
        # C-order: row g covers t[g // 3, g % 3, :]
        for r in rows:
            g = r.row_index
            assert r.indices == [g // 3, g % 3]
            assert r.vector == [float(x) for x in t[g // 3, g % 3]]
            assert r.dim == 4 and r.tensor == "attn"

    def test_rank4(self, spark, tmp_path):
        p = str(tmp_path / "a.safetensors")
        t = np.arange(2 * 2 * 3 * 5, dtype=np.float32).reshape(
            2, 2, 3, 5
        )
        write_safetensors({"kv": t}, p)
        rows = sorted(
            read_safetensors_slices(spark, p).collect(),
            key=lambda r: r.row_index,
        )
        assert len(rows) == 12
        r7 = rows[7]  # g=7 -> [1, 0, 1] over lead (2, 2, 3)
        assert r7.indices == [1, 0, 1]
        assert r7.vector == [float(x) for x in t[1, 0, 1]]

    def test_chunked_equals_whole_global_row_index(
        self, spark, tmp_path
    ):
        # THE chunk law: tiny chunk_bytes forces many spans; the
        # global flattened row_index (and every value) must be
        # identical to the one-span read
        p = str(tmp_path / "a.safetensors")
        t = np.arange(40 * 8, dtype=np.float32).reshape(5, 8, 8)
        write_safetensors({"attn": t}, p)
        whole = sorted(
            read_safetensors_slices(spark, p).collect(),
            key=lambda r: r.row_index,
        )
        chunked = sorted(
            read_safetensors_slices(
                spark, p, chunk_bytes=64  # 2 rows of 8 f32 per span
            ).collect(),
            key=lambda r: r.row_index,
        )
        assert [tuple(r) for r in whole] == [tuple(r) for r in chunked]
        assert [r.row_index for r in chunked] == list(range(40))


class TestParityAndRanks:
    def test_rank2_parity_with_vectors_reader(self, spark, tmp_path):
        p = str(tmp_path / "a.safetensors")
        t = np.arange(6 * 3, dtype=np.float32).reshape(6, 3) * 0.5
        write_safetensors({"emb": t}, p)
        vec = sorted(
            read_safetensors_vectors(spark, p).collect(),
            key=lambda r: r.row_index,
        )
        sli = sorted(
            read_safetensors_slices(spark, p).collect(),
            key=lambda r: r.row_index,
        )
        assert [(r.row_index, r.embedding, r.dim) for r in vec] == [
            (r.row_index, r.vector, r.dim) for r in sli
        ]
        # rank-2: indices is the single leading coordinate
        assert [r.indices for r in sli] == [[i] for i in range(6)]

    def test_rank1_single_row_empty_indices(self, spark, tmp_path):
        p = str(tmp_path / "a.safetensors")
        write_safetensors(
            {"bias": np.array([1.0, 2.0], dtype=np.float32)}, p
        )
        rows = read_safetensors_slices(spark, p).collect()
        assert len(rows) == 1
        # rank 1 = one vector along the only axis
        assert rows[0].row_index == 0 and rows[0].indices == []
        assert rows[0].vector == [1.0, 2.0] and rows[0].dim == 2

    def test_bf16_rank3_exact(self, spark, tmp_path):
        p = str(tmp_path / "a.safetensors")
        vals = np.arange(2 * 2 * 2, dtype=np.float32).reshape(2, 2, 2)
        u32 = vals.view(np.uint32)
        bf16 = ((u32 >> 16).astype(np.uint16)).tobytes()
        write_safetensors(
            {"w": ("BF16", [2, 2, 2], bf16)}, p
        )
        rows = sorted(
            read_safetensors_slices(spark, p).collect(),
            key=lambda r: r.row_index,
        )
        # small integers are exact in bfloat16
        assert rows[3].vector == [6.0, 7.0]
        assert rows[3].indices == [1, 1]

    def test_tensor_narrowing(self, spark, tmp_path):
        p = str(tmp_path / "a.safetensors")
        write_safetensors({
            "a": _rank3((2, 2, 2)),
            "b": _rank3((3, 2, 2)),
        }, p)
        rows = read_safetensors_slices(spark, p, tensor="b").collect()
        assert {r.tensor for r in rows} == {"b"} and len(rows) == 6


class TestQuarantine:
    def test_corrupt_file_one_error_row(self, spark, tmp_path):
        p = str(tmp_path / "a.safetensors")
        with open(p, "wb") as f:
            f.write(b"\xff" * 32)
        rows = read_safetensors_slices(spark, p).collect()
        assert len(rows) == 1
        assert rows[0].error is not None and rows[0].vector is None

    def test_good_tensors_survive_multifile(self, spark, tmp_path):
        good = str(tmp_path / "a.safetensors")
        bad = str(tmp_path / "b.safetensors")
        write_safetensors({"x": _rank3((2, 2, 2))}, good)
        with open(bad, "wb") as f:
            f.write(b"\x00" * 16)
        rows = read_safetensors_slices(
            spark, str(tmp_path / "*.safetensors")
        ).collect()
        assert sum(r.error is None for r in rows) == 4
        assert sum(r.error is not None for r in rows) == 1
