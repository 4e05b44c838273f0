"""Round-20 regression tests: the r19 verdict's one red cell
(driver-unsafe typed outputs) and all five r19 ADVICE items.

1. Driver-safe output types: `tools/oracle_check.py` now FAILS any
   registry row whose output schema carries a type outside the
   hash-stable primitive set (timestamp/date/decimal/binary renders
   session- or engine-dependently through the driver's stringified
   value-hash — the r17 signed-zero / r19 avro_logical incident
   class, made structural).
2. Delta protocol gate reads the CHECKPOINT's protocol rows too, and
   runs even when log retention removed every JSON commit
   (`sources/delta_log.py` — ADVICE high).
3. Pure-JSON Delta replay refuses a log whose oldest commit is not
   version 0 when no checkpoint covers the gap (ADVICE medium).
4. Arrow IPC rec_index subtracts preceding error rows, so a mid-file
   failed batch leaves no gap (ADVICE medium).
5. Avro: unknown logicalType on fixed/enum falls back to the full
   underlying declaration (spec rule; `duration` on fixed(12) must
   decode, not quarantine) (ADVICE low).
6. Avro: named-type references resolve namespace-qualified FIRST and
   a later namespace's declaration cannot hijack another namespace's
   bare name (ADVICE low).
"""

import json
import struct

import pyarrow as pa
import pytest

from soda_spark_spark.sources.avro_ocf import (
    read_avro_records,
    write_avro,
)
from soda_spark_spark.sources.delta_log import (
    delta_snapshot,
    write_delta_checkpoint,
    write_delta_commit,
)


# ---------------------------------------------------------------------------
# 1. driver-safe output types (tools/oracle_check.py guard)
# ---------------------------------------------------------------------------


class TestDriverSafeTypeGuard:
    def _guard(self):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "oracle_check", "/root/repo/tools/oracle_check.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_flags_timestamp_date_decimal_binary(self, spark):
        mod = self._guard()
        df = spark.sql(
            "SELECT TIMESTAMP'2024-01-01 00:00:00' AS ts,"
            " DATE'2024-01-01' AS d, CAST(1.5 AS DECIMAL(10,2)) AS m,"
            " CAST('x' AS BINARY) AS b, 1L AS ok_long, 'a' AS ok_str"
        )
        bad = dict(mod.unsafe_output_fields(df.schema))
        assert set(bad) == {"ts", "d", "m", "b"}
        assert bad["ts"] == "timestamp"
        assert bad["m"] == "decimal(10,2)"

    def test_accepts_all_safe_primitives(self, spark):
        mod = self._guard()
        df = spark.sql(
            "SELECT 1L AS a, CAST(1 AS INT) AS b,"
            " CAST(1 AS SMALLINT) AS c, CAST(1 AS TINYINT) AS d,"
            " 1.5D AS e, CAST(1.5 AS FLOAT) AS f, 's' AS g,"
            " TRUE AS h"
        )
        assert mod.unsafe_output_fields(df.schema) == []

    def test_flags_containers(self, spark):
        # arrays/maps/structs stringify engine-dependently too; the
        # registry projects them away, and the guard enforces it
        mod = self._guard()
        df = spark.sql(
            "SELECT array(1, 2) AS arr, map('k', 1) AS m,"
            " named_struct('x', 1) AS s"
        )
        assert {n for n, _ in mod.unsafe_output_fields(df.schema)} == {
            "arr", "m", "s"
        }

    def test_registry_avro_logical_is_driver_safe(self, spark):
        # the r19 red cell specifically: its registry projection must
        # emit only hash-stable primitives now
        import sys

        sys.path.insert(0, "/root/repo")
        import __spark_entry__ as entry

        mod = self._guard()
        df = entry.queries_full()["avro_logical"](
            spark, "/root/testdata/sf0.001"
        )
        assert mod.unsafe_output_fields(df.schema) == []
        # and the typed values survive the projection exactly
        rows = {r.k: r for r in df.where("shard = 0").collect()}
        k = sorted(rows)[1]
        assert rows[k].d_days == k % 1461
        assert rows[k].ts_ms_epoch == k * 97_003
        assert rows[k].ts_us_epoch == k * 1_000_003
        assert rows[k].amount_unscaled == k * 7919 - 500_000
        assert rows[k].fx_unscaled == (k % 20_000) - 10_000


# ---------------------------------------------------------------------------
# 2 + 3. Delta protocol gate from the checkpoint; commit-0 law
# ---------------------------------------------------------------------------


def _add(path, size, nrec):
    return {"add": {
        "path": path, "size": size, "dataChange": True,
        "modificationTime": 1, "partitionValues": {},
        "stats": json.dumps({"numRecords": nrec}),
    }}


class TestDeltaCheckpointProtocolGate:
    def test_checkpoint_only_reader_v2_refuses(self, spark, tmp_path):
        # retention removed EVERY JSON commit; the checkpoint alone
        # carries protocol minReaderVersion=2 — the exact silent-
        # deleted-rows scenario the ADVICE names
        d = str(tmp_path)
        write_delta_checkpoint(
            d, 3, [("f0.parquet", 100, json.dumps({"numRecords": 5}),
                    None)],
            protocol=(2, None),
        )
        with pytest.raises(ValueError, match="minReaderVersion=2"):
            delta_snapshot(spark, d)

    def test_checkpoint_reader_features_floor_3(self, spark, tmp_path):
        # readerFeatures in the checkpoint floors the effective
        # minReaderVersion to 3, same as the JSON-line parse
        d = str(tmp_path)
        write_delta_checkpoint(
            d, 3, [("f0.parquet", 100, None, None)],
            protocol=(1, ["deletionVectors"]),
        )
        with pytest.raises(ValueError, match="minReaderVersion=3"):
            delta_snapshot(spark, d)

    def test_checkpoint_protocol_with_clean_json_tail_refuses(
        self, spark, tmp_path
    ):
        # the protocol action lives ONLY in the checkpoint (commit-0
        # JSON where it was written is retained-away); the JSON tail
        # past the checkpoint carries no protocol — the gate must
        # still fire off the union
        d = str(tmp_path)
        write_delta_checkpoint(
            d, 3, [("f0.parquet", 100, None, None)],
            protocol=(2, None),
        )
        write_delta_commit(d, 4, [_add("f1.parquet", 10, 1)])
        with pytest.raises(ValueError, match="minReaderVersion=2"):
            delta_snapshot(spark, d)

    def test_checkpoint_only_v1_snapshot_works(self, spark, tmp_path):
        # benign protocol in a checkpoint-only table: snapshot is the
        # checkpoint state (and the gate runs without JSON commits)
        d = str(tmp_path)
        write_delta_checkpoint(
            d, 3,
            [("f0.parquet", 100, json.dumps({"numRecords": 5}), None)],
            protocol=(1, None),
        )
        rows = delta_snapshot(spark, d).collect()
        assert [(r.path, r.size, r.num_records, r.asserted_version)
                for r in rows] == [("f0.parquet", 100, 5, 3)]


class TestDeltaCommitZeroLaw:
    def test_pure_json_replay_missing_commit0_refuses(
        self, spark, tmp_path
    ):
        # retention removed commit 0; no checkpoint: replaying from
        # commit 1 silently drops commit 0's adds — must refuse
        d = str(tmp_path)
        write_delta_commit(d, 1, [_add("f1.parquet", 10, 1)])
        write_delta_commit(d, 2, [_add("f2.parquet", 20, 2)])
        with pytest.raises(ValueError, match="incomplete Delta log"):
            delta_snapshot(spark, d, checkpoint=False)

    def test_time_travel_below_checkpoint_missing_commit0_refuses(
        self, spark, tmp_path
    ):
        # checkpoint at 3 exists, but time travel to version 1 falls
        # back to pure JSON — and commits 0..1 are gone below it
        d = str(tmp_path)
        write_delta_commit(d, 2, [_add("f2.parquet", 20, 2)])
        write_delta_checkpoint(
            d, 3, [("f2.parquet", 20, None, None)]
        )
        with pytest.raises(ValueError, match="incomplete Delta log"):
            delta_snapshot(spark, d, version=2)

    def test_complete_json_replay_still_works(self, spark, tmp_path):
        d = str(tmp_path)
        write_delta_commit(d, 0, [_add("f0.parquet", 10, 1)])
        write_delta_commit(d, 1, [_add("f1.parquet", 20, 2)])
        rows = delta_snapshot(spark, d, checkpoint=False).collect()
        assert sorted(r.path for r in rows) == [
            "f0.parquet", "f1.parquet",
        ]


# ---------------------------------------------------------------------------
# 4. Arrow IPC: mid-file failed batch leaves no rec_index gap
# ---------------------------------------------------------------------------


def _corrupt_batch(path: str, batch_index: int) -> None:
    """Smash the metadata flatbuffer of record batch `batch_index`
    (message batch_index+1 after the schema message) while leaving
    the footer valid — `get_batch` on it raises, every other batch
    decodes."""
    raw = bytearray(open(path, "rb").read())
    buf = pa.BufferReader(bytes(raw[8:]))  # past ARROW1\x00\x00
    rd = pa.ipc.MessageReader.open_stream(buf)
    ends = []
    while True:
        try:
            if rd.read_next_message() is None:
                break
        except (StopIteration, pa.ArrowInvalid):
            break
        ends.append(buf.tell())
    start = 8 + ends[batch_index]  # end of the preceding message
    for i in range(8, 40):  # skip continuation + metadata-length
        raw[start + i] ^= 0xFF
    open(path, "wb").write(bytes(raw))


class TestArrowIpcRecIndexNoGap:
    def test_mid_file_failed_batch_leaves_no_gap(self, spark, tmp_path):
        from soda_spark_spark.sources.arrow_ipc import (
            read_arrow_ipc,
            write_arrow_ipc,
        )

        p = str(tmp_path / "a.arrow")
        t = pa.table({"id": pa.array(range(10), pa.int64())})
        write_arrow_ipc(t, p, batch_rows=3)  # batches: 3, 3, 3, 1
        _corrupt_batch(p, 1)

        rows = read_arrow_ipc(spark, p).collect()
        errs = [r for r in rows if r.error is not None]
        good = sorted(
            (r for r in rows if r.error is None),
            key=lambda r: (r.batch_index, r.row_index),
        )
        assert len(errs) == 1 and errs[0].batch_index == 1
        assert errs[0].rec_index is None
        # REC_INDEX law: decoded rows number densely 0..n-1 even with
        # the error row sorting mid-file — no +1 shift, no gap
        assert [r.rec_index for r in good] == list(range(7))
        assert [r.id for r in good] == [0, 1, 2, 6, 7, 8, 9]


# ---------------------------------------------------------------------------
# 5. Avro: unknown logicalType on fixed/enum keeps the declaration
# ---------------------------------------------------------------------------


class TestAvroUnknownLogicalFallback:
    def test_duration_on_fixed12_decodes_as_fixed(self, spark, tmp_path):
        # spec: `duration` annotates fixed(12); this module has no
        # duration mapping, so the fallback must decode the
        # UNDERLYING fixed(12) (hex surface) — not raise on a bare
        # 'fixed' string
        schema = json.dumps({
            "type": "record", "name": "R",
            "fields": [
                {"name": "k", "type": "long"},
                {"name": "dur", "type": {
                    "type": "fixed", "name": "Dur", "size": 12,
                    "logicalType": "duration"}},
            ],
        })
        p = str(tmp_path / "a.avro")
        payload = bytes(range(12))
        write_avro([{"k": 7, "dur": payload}], schema, p)
        rows = read_avro_records(spark, p).collect()
        assert len(rows) == 1 and rows[0].error is None
        assert rows[0].k == 7
        assert rows[0].dur == payload.hex()

    def test_unknown_logical_on_enum_decodes_symbols(
        self, spark, tmp_path
    ):
        schema = json.dumps({
            "type": "record", "name": "R",
            "fields": [
                {"name": "e", "type": {
                    "type": "enum", "name": "E",
                    "symbols": ["A", "B", "C"],
                    "logicalType": "made-up"}},
            ],
        })
        p = str(tmp_path / "a.avro")
        write_avro([{"e": "B"}], schema, p)
        rows = read_avro_records(spark, p).collect()
        assert rows[0].error is None and rows[0].e == "B"

    def test_unknown_logical_on_primitive_still_falls_back(
        self, spark, tmp_path
    ):
        # the pre-existing behavior the fix must preserve
        schema = json.dumps({
            "type": "record", "name": "R",
            "fields": [
                {"name": "x", "type": {
                    "type": "int", "logicalType": "weird"}},
            ],
        })
        p = str(tmp_path / "a.avro")
        write_avro([{"x": 41}], schema, p)
        rows = read_avro_records(spark, p).collect()
        assert rows[0].error is None and rows[0].x == 41


# ---------------------------------------------------------------------------
# 6. Avro: named references resolve in the current namespace first
# ---------------------------------------------------------------------------


class TestAvroNamespaceResolution:
    def test_same_bare_name_two_namespaces_resolves_locally(
        self, spark, tmp_path
    ):
        # two fixed types share the bare name `Id` across namespaces
        # with DIFFERENT sizes; the unqualified reference inside
        # namespace `a` must resolve to a.Id (size 2), not the
        # later-declared b.Id (size 4) — last-declared-wins would
        # mis-frame every record byte after the first field
        schema = json.dumps({
            "type": "record", "name": "Top",
            "fields": [
                {"name": "ra", "type": {
                    "type": "record", "name": "RA", "namespace": "a",
                    "fields": [
                        {"name": "ia", "type": {
                            "type": "fixed", "name": "Id",
                            "size": 2}},
                    ]}},
                {"name": "rb", "type": {
                    "type": "record", "name": "RB", "namespace": "b",
                    "fields": [
                        {"name": "ib", "type": {
                            "type": "fixed", "name": "Id",
                            "size": 4}},
                        # unqualified ref in namespace b -> b.Id (4)
                        {"name": "ib2", "type": "Id"},
                    ]}},
                # unqualified ref resolved in the ROOT namespace:
                # no root declaration exists, so the bare fallback
                # finds the FIRST declaration (a.Id, size 2) — and a
                # later b.Id must not have hijacked it
                {"name": "i0", "type": "Id"},
            ],
        })
        p = str(tmp_path / "a.avro")
        write_avro([{
            "ra": {"ia": b"\x01\x02"},
            "rb": {"ib": b"\x03\x04\x05\x06", "ib2": b"\x07\x08\x09\x0a"},
            "i0": b"\x0b\x0c",
        }], schema, p)
        rows = read_avro_records(spark, p).collect()
        assert len(rows) == 1 and rows[0].error is None
        r = rows[0]
        assert r["ra.ia"] == "0102"
        assert r["rb.ib"] == "03040506"
        assert r["rb.ib2"] == "0708090a"
        assert r["i0"] == "0b0c"

    def test_qualified_reference_crosses_namespaces(
        self, spark, tmp_path
    ):
        schema = json.dumps({
            "type": "record", "name": "Top",
            "fields": [
                {"name": "ra", "type": {
                    "type": "record", "name": "RA", "namespace": "a",
                    "fields": [
                        {"name": "ia", "type": {
                            "type": "fixed", "name": "Id",
                            "size": 2}},
                    ]}},
                # fully-qualified reference from the root namespace
                {"name": "x", "type": "a.Id"},
            ],
        })
        p = str(tmp_path / "a.avro")
        write_avro(
            [{"ra": {"ia": b"\x01\x02"}, "x": b"\x03\x04"}], schema, p
        )
        rows = read_avro_records(spark, p).collect()
        assert rows[0].error is None and rows[0].x == "0304"


# ---------------------------------------------------------------------------
# 7. Avro array<record-of-scalars> (round-20 widening: the lakehouse
#    manifest shape)
# ---------------------------------------------------------------------------


class TestAvroArrayOfRecord:
    def test_round_trip_with_nullable_subfield(self, spark, tmp_path):
        schema = json.dumps({
            "type": "record", "name": "M",
            "fields": [
                {"name": "k", "type": "long"},
                {"name": "partitions", "type": {
                    "type": "array", "items": {
                        "type": "record", "name": "FieldSummary",
                        "fields": [
                            {"name": "contains_null",
                             "type": "boolean"},
                            {"name": "contains_nan",
                             "type": ["null", "boolean"],
                             "default": None},
                            {"name": "lower_bound",
                             "type": ["null", "bytes"],
                             "default": None},
                        ]}}},
            ],
        })
        p = str(tmp_path / "a.avro")
        write_avro([{
            "k": 1,
            "partitions": [
                {"contains_null": True, "contains_nan": False,
                 "lower_bound": b"\x01\x02"},
                {"contains_null": False, "contains_nan": None,
                 "lower_bound": None},
            ],
        }], schema, p)
        rows = read_avro_records(spark, p).collect()
        assert len(rows) == 1 and rows[0].error is None
        ps = rows[0].partitions
        assert len(ps) == 2
        assert ps[0].contains_null is True
        assert ps[0].contains_nan is False
        assert ps[0].lower_bound == "0102"  # bytes -> hex law
        assert ps[1].contains_nan is None
        assert ps[1].lower_bound is None

    def test_empty_array_of_record(self, spark, tmp_path):
        schema = json.dumps({
            "type": "record", "name": "M",
            "fields": [
                {"name": "xs", "type": {
                    "type": "array", "items": {
                        "type": "record", "name": "E",
                        "fields": [{"name": "v", "type": "long"}]}}},
            ],
        })
        p = str(tmp_path / "a.avro")
        write_avro([{"xs": []}], schema, p)
        rows = read_avro_records(spark, p).collect()
        assert rows[0].error is None and rows[0].xs == []

    def test_nested_container_in_element_rejected(self):
        # record elements must have SCALAR fields — deeper nesting
        # stays out of the committed scope, honestly (the shared
        # schema parse rejects it for reader and fixture writer
        # alike)
        from soda_spark_spark.sources.avro_ocf import _parse_schema

        schema = json.dumps({
            "type": "record", "name": "M",
            "fields": [
                {"name": "xs", "type": {
                    "type": "array", "items": {
                        "type": "record", "name": "E",
                        "fields": [{"name": "inner", "type": {
                            "type": "array", "items": "long"}}]}}},
            ],
        })
        with pytest.raises(ValueError, match="scalar"):
            _parse_schema(schema)

    def test_real_shape_iceberg_manifest_list_decodes(
        self, spark, tmp_path
    ):
        # the reason this widening exists: a manifest list carrying
        # the spec's OPTIONAL `partitions` field-summary array (what
        # real Iceberg writers emit) must decode, not quarantine
        import os

        from soda_spark_spark.sources.avro_ocf import (
            read_avro_records as rar,
        )
        from soda_spark_spark.sources.iceberg import write_manifest

        md = str(tmp_path)
        m = write_manifest(f"{md}/m.avro", [{
            "status": 1, "snapshot_id": 1,
            "data_file": {"file_path": "f.parquet",
                          "file_format": "PARQUET",
                          "partition": {"p": 0},
                          "record_count": 1,
                          "file_size_in_bytes": 10}}])
        ml_schema = json.dumps({
            "type": "record", "name": "manifest_file",
            "fields": [
                {"name": "manifest_path", "type": "string"},
                {"name": "manifest_length", "type": "long"},
                {"name": "partition_spec_id", "type": "int"},
                {"name": "added_snapshot_id", "type": "long"},
                {"name": "partitions", "type": ["null", {
                    "type": "array", "items": {
                        "type": "record", "name": "field_summary",
                        "fields": [
                            {"name": "contains_null",
                             "type": "boolean"},
                            {"name": "lower_bound",
                             "type": ["null", "bytes"],
                             "default": None},
                            {"name": "upper_bound",
                             "type": ["null", "bytes"],
                             "default": None},
                        ]}}], "default": None},
            ],
        })
        # nullable ARRAY (not nullable elements) is in scope
        p = f"{md}/list.avro"
        write_avro([{
            "manifest_path": m,
            "manifest_length": os.path.getsize(m),
            "partition_spec_id": 0,
            "added_snapshot_id": 9,
            "partitions": [
                {"contains_null": False, "lower_bound": b"\x00",
                 "upper_bound": b"\x09"},
            ],
        }], ml_schema, p)
        rows = rar(spark, [p]).collect()
        assert len(rows) == 1 and rows[0].error is None
        assert rows[0].manifest_path == m
        assert rows[0].partitions[0].contains_null is False
        assert rows[0].partitions[0].upper_bound == "09"
