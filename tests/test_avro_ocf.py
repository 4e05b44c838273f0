"""Avro OCF ingestion (`sources/avro_ocf.py`): container framing,
zigzag/binary encoding, codec handling, schema scoping, and the
corruption-stop law."""

from __future__ import annotations

import json

import pytest

from soda_spark_spark.sources.avro_ocf import (
    parse_avro_header,
    read_avro_records,
    write_avro,
)

SCHEMA = json.dumps({
    "type": "record", "name": "Doc",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "text", "type": "string"},
        {"name": "score", "type": ["null", "double"]},
        {"name": "ok", "type": "boolean"},
        {"name": "lang", "type": {"type": "enum", "name": "L",
                                  "symbols": ["en", "de", "fr"]}},
        {"name": "raw", "type": "bytes"},
    ],
})


def _recs(n):
    return [
        {"id": i if i % 2 == 0 else -i, "text": f"doc {i}",
         "score": None if i % 3 == 0 else i * 0.5,
         "ok": i % 2 == 0, "lang": ["en", "de", "fr"][i % 3],
         "raw": bytes([i % 256, 255]).hex()}
        for i in range(n)
    ]


class TestHeaderAndEncoding:
    def test_header_roundtrip(self, tmp_path):
        p = str(tmp_path / "a.avro")
        write_avro(_recs(3), SCHEMA, p)
        with open(p, "rb") as f:
            sj, codec, sync, pos = parse_avro_header(f.read())
        assert json.loads(sj)["name"] == "Doc"
        assert codec == "null" and len(sync) == 16 and pos > 20

    def test_bad_magic(self):
        with pytest.raises(ValueError, match="bad magic"):
            parse_avro_header(b"NOPE" + b"\x00" * 40)

    def test_missing_schema(self):
        # magic + empty metadata map + sync
        data = b"Obj\x01" + b"\x00" + b"\x00" * 16
        with pytest.raises(ValueError, match="missing avro.schema"):
            parse_avro_header(data)

    def test_unsupported_codec(self, tmp_path):
        p = str(tmp_path / "a.avro")
        write_avro(_recs(1), SCHEMA, p, codec="null")
        raw = open(p, "rb").read().replace(b"null", b"zstd", 1)
        with pytest.raises(ValueError, match="unsupported codec"):
            parse_avro_header(raw)


class TestSparkReader:
    def test_roundtrip_typed_columns(self, spark, tmp_path):
        p = str(tmp_path / "a.avro")
        write_avro(_recs(10), SCHEMA, p)
        rows = {r.rec_index: r for r in read_avro_records(
            spark, p).collect()}
        assert len(rows) == 10
        assert rows[3].id == -3 and rows[4].id == 4
        assert rows[1].score == 0.5 and rows[3].score is None
        assert rows[2].lang == "fr" and rows[5].text == "doc 5"
        assert rows[7].raw == bytes([7, 255]).hex()
        assert rows[6].ok is True and rows[5].ok is False
        assert all(r.error is None for r in rows.values())

    def test_deflate_codec(self, spark, tmp_path):
        p = str(tmp_path / "d.avro")
        write_avro(_recs(50), SCHEMA, p, codec="deflate",
                   records_per_block=7)
        rows = read_avro_records(spark, p).collect()
        assert len(rows) == 50
        assert all(r.error is None for r in rows)

    def test_sync_mismatch_stops_shard(self, spark, tmp_path):
        p = str(tmp_path / "c.avro")
        write_avro(_recs(20), SCHEMA, p, records_per_block=5)
        raw = bytearray(open(p, "rb").read())
        # corrupt the SECOND sync marker (after block 2)
        first = raw.find(b"\x00\x11\x22\x33")
        second = raw.find(b"\x00\x11\x22\x33", first + 1)
        third = raw.find(b"\x00\x11\x22\x33", second + 1)
        raw[third] ^= 0xFF
        open(p, "wb").write(bytes(raw))
        rows = sorted(read_avro_records(spark, p).collect(),
                      key=lambda r: r.rec_index)
        good = [r for r in rows if r.error is None]
        bad = [r for r in rows if r.error is not None]
        # the sync is each block's integrity witness and is validated
        # BEFORE the block's records are emitted: block 1 stands,
        # block 2 (whose trailing sync is corrupt) does not
        assert len(good) == 5 and len(bad) == 1
        assert bad[0].rec_index == 5
        assert "sync marker" in bad[0].error

    def test_mixed_schema_glob_quarantines_other_file(
        self, spark, tmp_path
    ):
        other = json.dumps({
            "type": "record", "name": "Other",
            "fields": [{"name": "id", "type": "long"},
                       {"name": "text", "type": "string"},
                       {"name": "score", "type": ["null", "double"]},
                       {"name": "ok", "type": "boolean"},
                       {"name": "lang", "type": {
                           "type": "enum", "name": "L",
                           "symbols": ["en", "de", "fr"]}},
                       {"name": "raw", "type": "bytes"},
                       {"name": "extra", "type": "long"}],
        })
        write_avro(_recs(4), SCHEMA, str(tmp_path / "a.avro"))
        write_avro(
            [dict(r, extra=1) for r in _recs(2)], other,
            str(tmp_path / "b.avro"),
        )
        rows = read_avro_records(
            spark, str(tmp_path / "*.avro")).collect()
        good = [r for r in rows if r.error is None]
        bad = [r for r in rows if r.error is not None]
        assert len(good) == 4 and len(bad) == 1
        assert "differs from the plan schema" in bad[0].error

    def test_unsupported_field_type_raises_at_plan(self, tmp_path):
        # round 19 widened scope: array<long> now PARSES; the
        # unsupported boundary moved to containers of containers
        from soda_spark_spark.sources.avro_ocf import _parse_schema

        flat_array = json.dumps({
            "type": "record", "name": "N",
            "fields": [{"name": "a", "type": {
                "type": "array", "items": "long"}}],
        })
        assert _parse_schema(flat_array)[0][1]["k"] == "array"
        # round 20 widened again: array<record-of-scalars> PARSES
        # (the lakehouse manifest shape); the boundary is now record
        # elements with CONTAINER fields
        rec_items = json.dumps({
            "type": "record", "name": "M",
            "fields": [{"name": "a", "type": {
                "type": "array", "items": {
                    "type": "record", "name": "Inner",
                    "fields": [{"name": "x", "type": "long"}]}}}],
        })
        assert _parse_schema(rec_items)[0][1]["items"]["k"] == "record"
        deep = json.dumps({
            "type": "record", "name": "M2",
            "fields": [{"name": "a", "type": {
                "type": "array", "items": {
                    "type": "record", "name": "Inner2",
                    "fields": [{"name": "x", "type": {
                        "type": "array", "items": "long"}}]}}}],
        })
        with pytest.raises(ValueError, match="scalar"):
            _parse_schema(deep)

    def test_bookkeeping_collision_refused(self, spark, tmp_path):
        s = json.dumps({
            "type": "record", "name": "R",
            "fields": [{"name": "error", "type": "string"}],
        })
        write_avro([{"error": "x"}], s, str(tmp_path / "e.avro"))
        with pytest.raises(ValueError, match="collides"):
            read_avro_records(spark, str(tmp_path / "e.avro"))

    def test_empty_record_list_is_header_only_file(self, spark, tmp_path):
        p = str(tmp_path / "z.avro")
        write_avro([], SCHEMA, p)
        assert read_avro_records(spark, p).count() == 0


class TestBombGuard:
    def test_deflate_bomb_quarantines(self, spark, tmp_path):
        """A block whose plaintext exceeds the bound must quarantine
        without materializing the bomb."""
        import zlib

        p = str(tmp_path / "bomb.avro")
        s = json.dumps({
            "type": "record", "name": "B",
            "fields": [{"name": "raw", "type": "bytes"}],
        })
        # one legit record whose plaintext is ~4 MB of zeros
        big = ("00" * (4 << 20))
        write_avro([{"raw": big}], s, p, codec="deflate")
        rows = read_avro_records(
            spark, p, max_block_bytes=1 << 20).collect()
        assert len(rows) == 1
        assert rows[0].error is not None
        assert "exceeds" in rows[0].error

    def test_same_file_fine_with_default_bound(self, spark, tmp_path):
        p = str(tmp_path / "ok.avro")
        s = json.dumps({
            "type": "record", "name": "B",
            "fields": [{"name": "raw", "type": "bytes"}],
        })
        write_avro([{"raw": "00" * (1 << 20)}], s, p, codec="deflate")
        rows = read_avro_records(spark, p).collect()
        assert len(rows) == 1 and rows[0].error is None
