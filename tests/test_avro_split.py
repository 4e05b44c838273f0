"""`read_avro_split` — byte-range-parallel Avro OCF (the sync-marker
split discipline): row-for-row equality with `read_avro_records` on
well-formed shards across all codecs, the file-poison law for bad
headers, the resync law for mid-file corruption, and >cap framing."""

from __future__ import annotations

import json

import pytest

from soda_spark_spark.sources.avro_ocf import (
    read_avro_records,
    read_avro_split,
    write_avro,
)

SCHEMA = json.dumps({
    "type": "record", "name": "R",
    "fields": [
        {"name": "v", "type": "long"},
        {"name": "t", "type": "string"},
        {"name": "s", "type": ["null", "double"]},
    ],
})


def _recs(n):
    return [
        {"v": i, "t": f"row {i} " + "x" * (i % 37),
         "s": None if i % 5 == 0 else i * 0.5}
        for i in range(n)
    ]


def _collect(df):
    return sorted(
        (r.rec_index, r.v, r.t, r.s, r.error) for r in df.collect()
    )


class TestSplitEquality:
    @pytest.mark.parametrize("codec", ["null", "deflate", "snappy"])
    def test_split_equals_whole_multiblock(self, spark, tmp_path, codec):
        p = str(tmp_path / f"a_{codec}.avro")
        write_avro(_recs(200), SCHEMA, p, codec=codec,
                   records_per_block=7)
        whole = _collect(read_avro_records(spark, p))
        split = _collect(read_avro_split(spark, p, chunk_bytes=512))
        assert len(whole) == 200
        assert split == whole

    def test_split_multi_file_glob(self, spark, tmp_path):
        write_avro(_recs(30), SCHEMA, str(tmp_path / "p0.avro"),
                   records_per_block=4)
        write_avro(_recs(11), SCHEMA, str(tmp_path / "p1.avro"),
                   codec="snappy", records_per_block=3)
        whole = read_avro_records(spark, str(tmp_path / "p*.avro"))
        split = read_avro_split(spark, str(tmp_path / "p*.avro"),
                                chunk_bytes=256)
        w = sorted((r.file.split("/")[-1].lstrip("file:"),
                    r.rec_index, r.v) for r in whole.collect())
        s = sorted((r.file.split("/")[-1], r.rec_index, r.v)
                   for r in split.collect())
        assert [x[1:] for x in w] == [x[1:] for x in s]

    def test_single_chunk_still_works(self, spark, tmp_path):
        p = str(tmp_path / "one.avro")
        write_avro(_recs(5), SCHEMA, p)
        assert _collect(read_avro_split(spark, p)) == _collect(
            read_avro_records(spark, p)
        )

    def test_header_only_file_zero_rows(self, spark, tmp_path):
        p = str(tmp_path / "empty.avro")
        write_avro([], SCHEMA, p)
        assert read_avro_split(spark, p, chunk_bytes=64).count() == 0


class TestSplitLaws:
    def test_bad_header_one_error_row(self, spark, tmp_path):
        # the FIRST (schema-election) file must parse — an unreadable
        # head raises at plan time in BOTH readers; a bad NON-FIRST
        # file quarantines as one error row despite spanning many
        # chunks
        write_avro(_recs(8), SCHEMA, str(tmp_path / "a.avro"),
                   records_per_block=2)
        (tmp_path / "z.avro").write_bytes(b"NOPE" + b"\x00" * 3000)
        rows = read_avro_split(
            spark, str(tmp_path / "*.avro"), chunk_bytes=256
        ).collect()
        bad = [r for r in rows if r.error is not None]
        assert len(bad) == 1
        assert bad[0].rec_index == 0
        assert "bad magic" in bad[0].error
        assert len(rows) == 9

    def test_unreadable_head_file_raises_at_plan(self, spark, tmp_path):
        p = tmp_path / "bad.avro"
        p.write_bytes(b"NOPE" + b"\x00" * 100)
        with pytest.raises(ValueError, match="bad magic"):
            read_avro_split(spark, str(p))
        with pytest.raises(ValueError, match="bad magic"):
            read_avro_records(spark, str(p))

    def test_divergent_schema_one_error_row(self, spark, tmp_path):
        other = json.dumps({
            "type": "record", "name": "R",
            "fields": [{"name": "z", "type": "string"}],
        })
        write_avro(_recs(20), SCHEMA, str(tmp_path / "a.avro"),
                   records_per_block=5)
        write_avro([{"z": "x"}] * 40, other, str(tmp_path / "b.avro"),
                   records_per_block=2)
        rows = read_avro_split(
            spark, str(tmp_path / "*.avro"), chunk_bytes=128
        ).collect()
        bad = [r for r in rows if r.error is not None]
        good = [r for r in rows if r.error is None]
        assert len(good) == 20
        assert len(bad) == 1
        assert "differs from the plan schema" in bad[0].error

    def test_resync_after_corrupt_block(self, spark, tmp_path):
        sync = bytes.fromhex("00112233445566778899aabbccddeeff")
        p = tmp_path / "c.avro"
        write_avro(_recs(12), SCHEMA, str(p), records_per_block=3)
        data = bytearray(p.read_bytes())
        # corrupt the SECOND block's payload (first byte after its
        # start): find sync ends; block starts follow them
        first = data.find(sync) + 16          # end of header
        second = data.find(sync, first) + 16  # end of block 1
        data[second + 2] ^= 0xFF              # inside block 2
        p.write_bytes(bytes(data))
        rows = sorted(
            read_avro_split(spark, str(p), chunk_bytes=128).collect(),
            key=lambda r: r.rec_index,
        )
        good = [r for r in rows if r.error is None]
        bad = [r for r in rows if r.error is not None]
        # blocks 1, 3, 4 survive (9 records); block 2 is one error
        # row whose rec_index continues the good count — the resync
        # law (the whole-file reader would stop at the corruption)
        assert len(bad) >= 1
        assert len(good) + len(bad) == len(rows)
        assert len(good) >= 9
        vs = {r.v for r in good}
        assert {0, 1, 2, 6, 7, 8, 9, 10, 11} <= vs

    def test_rec_index_contiguous_per_file(self, spark, tmp_path):
        p = str(tmp_path / "idx.avro")
        write_avro(_recs(50), SCHEMA, p, records_per_block=4)
        rows = read_avro_split(spark, p, chunk_bytes=200).collect()
        idx = sorted(r.rec_index for r in rows)
        assert idx == list(range(50))
        by_idx = {r.rec_index: r.v for r in rows}
        assert all(by_idx[i] == i for i in range(50))
