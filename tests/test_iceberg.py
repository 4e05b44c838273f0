"""Iceberg metadata-tree laws (`sources/iceberg.py`): version-hint /
max-version metadata election, snapshot selection + time travel,
manifest-list census, live-file reconstruction (status semantics),
format gate, delete-manifest gate, corrupt-manifest quarantine,
spec-id broadcast join."""

import json
import os

import pytest

from soda_spark_spark.sources.iceberg import (
    iceberg_census,
    iceberg_snapshot,
    iceberg_table_info,
    write_iceberg_metadata,
    write_manifest,
    write_manifest_list,
)


def _entry(status, path, n, size, p, snap=10):
    return {"status": status, "snapshot_id": snap,
            "data_file": {"file_path": path, "file_format": "PARQUET",
                          "partition": {"p": p}, "record_count": n,
                          "file_size_in_bytes": size}}


def _ml_row(p, spec=0, content=0, added=2, rows=12):
    return {"manifest_path": p, "manifest_length": os.path.getsize(p),
            "partition_spec_id": spec, "content": content,
            "added_snapshot_id": 10, "added_data_files_count": added,
            "existing_data_files_count": 0,
            "deleted_data_files_count": 0, "added_rows_count": rows,
            "existing_rows_count": 0, "deleted_rows_count": 0}


def _table(tmp_path):
    """Two snapshots: 10 adds a+b via m1; 11 keeps a, deletes b,
    adds c via m2 (spec id 3)."""
    d = str(tmp_path)
    md = os.path.join(d, "metadata")
    os.makedirs(md, exist_ok=True)
    m1 = write_manifest(f"{md}/m1.avro", [
        _entry(1, "data/a.parquet", 5, 100, 0),
        _entry(1, "data/b.parquet", 7, 200, 1),
    ])
    m2 = write_manifest(f"{md}/m2.avro", [
        _entry(0, "data/a.parquet", 5, 100, 0),
        _entry(2, "data/b.parquet", 7, 200, 1),
        _entry(1, "data/c.parquet", 9, 300, 0),
    ])
    ml1 = write_manifest_list(f"{md}/snap-10.avro", [_ml_row(m1)])
    ml2 = write_manifest_list(f"{md}/snap-11.avro",
                              [_ml_row(m2, spec=3)])
    write_iceberg_metadata(d, [
        {"snapshot-id": 10, "manifest-list": ml1},
        {"snapshot-id": 11, "manifest-list": ml2},
    ])
    return d, md, m1, m2


class TestTableInfo:
    def test_version_hint_wins(self, tmp_path):
        d, md, _, _ = _table(tmp_path)
        # a later metadata file exists but the hint names v1
        with open(f"{md}/v9.metadata.json", "w") as f:
            json.dump({"format-version": 2, "snapshots": []}, f)
        meta = iceberg_table_info(d)
        assert meta["current-snapshot-id"] == 11

    def test_max_version_without_hint(self, tmp_path):
        d, md, _, _ = _table(tmp_path)
        os.remove(f"{md}/version-hint.text")
        with open(f"{md}/v2.metadata.json", "w") as f:
            json.dump({"format-version": 2, "snapshots": [],
                       "current-snapshot-id": None}, f)
        meta = iceberg_table_info(d)
        assert meta["snapshots"] == []  # v2 elected over v1

    def test_no_metadata_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            iceberg_table_info(str(tmp_path))


class TestCensus:
    def test_one_row_per_manifest(self, spark, tmp_path):
        d, _, _, m2 = _table(tmp_path)
        rows = iceberg_census(spark, d).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r.manifest_path.endswith("m2.avro")
        assert r.manifest_length == os.path.getsize(m2)
        assert r.partition_spec_id == 3 and r.content == 0
        assert r.added_files == 2 and r.added_rows == 12
        assert r.error is None

    def test_census_of_past_snapshot(self, spark, tmp_path):
        d, _, m1, _ = _table(tmp_path)
        rows = iceberg_census(spark, d, snapshot_id=10).collect()
        assert len(rows) == 1
        assert rows[0].manifest_path.endswith("m1.avro")
        assert rows[0].partition_spec_id == 0


class TestSnapshot:
    def test_live_files_status_semantics(self, spark, tmp_path):
        d, _, _, _ = _table(tmp_path)
        rows = sorted(iceberg_snapshot(spark, d).collect(),
                      key=lambda r: r.file_path)
        # EXISTING (0) and ADDED (1) are live; DELETED (2) is not
        assert [(r.file_path, r.status, r.record_count, r.file_size)
                for r in rows] == [
            ("data/a.parquet", 0, 5, 100),
            ("data/c.parquet", 1, 9, 300),
        ]
        assert all(r.partition_spec_id == 3 for r in rows)
        assert [r["data_file.partition.p"] for r in rows] == [0, 0]

    def test_time_travel(self, spark, tmp_path):
        d, _, _, _ = _table(tmp_path)
        rows = sorted(
            iceberg_snapshot(spark, d, snapshot_id=10).collect(),
            key=lambda r: r.file_path,
        )
        assert [r.file_path for r in rows] == [
            "data/a.parquet", "data/b.parquet",
        ]

    def test_expired_snapshot_raises(self, spark, tmp_path):
        d, _, _, _ = _table(tmp_path)
        with pytest.raises(ValueError, match="not in table metadata"):
            iceberg_snapshot(spark, d, snapshot_id=999)

    def test_multi_manifest_snapshot(self, spark, tmp_path):
        d, md, m1, m2 = _table(tmp_path)
        ml = write_manifest_list(f"{md}/snap-12.avro", [
            _ml_row(m1, spec=0), _ml_row(m2, spec=3),
        ])
        write_iceberg_metadata(
            d, [{"snapshot-id": 12, "manifest-list": ml}], version=2
        )
        rows = iceberg_snapshot(spark, d).collect()
        # m1: a, b added; m2: a existing, b deleted, c added
        assert len(rows) == 4
        specs = {(r.manifest_path.split("/")[-1], r.partition_spec_id)
                 for r in rows}
        assert specs == {("m1.avro", 0), ("m2.avro", 3)}


class TestGates:
    def test_format_v3_refuses(self, spark, tmp_path):
        d, md, _, _ = _table(tmp_path)
        meta = json.load(open(f"{md}/v1.metadata.json"))
        meta["format-version"] = 3
        json.dump(meta, open(f"{md}/v1.metadata.json", "w"))
        with pytest.raises(ValueError, match="format-version=3"):
            iceberg_snapshot(spark, d)

    def test_delete_manifest_refuses(self, spark, tmp_path):
        d, md, m1, m2 = _table(tmp_path)
        ml = write_manifest_list(f"{md}/snap-12.avro", [
            _ml_row(m2), _ml_row(m1, content=1),
        ])
        write_iceberg_metadata(
            d, [{"snapshot-id": 12, "manifest-list": ml}], version=2
        )
        with pytest.raises(ValueError, match="DELETE manifests"):
            iceberg_snapshot(spark, d)

    def test_corrupt_manifest_list_refuses(self, spark, tmp_path):
        d, md, _, _ = _table(tmp_path)
        p = f"{md}/snap-13.avro"
        with open(p, "wb") as f:
            f.write(b"Obj\x01 corrupt beyond the magic")
        write_iceberg_metadata(
            d, [{"snapshot-id": 13, "manifest-list": p}], version=2
        )
        with pytest.raises(ValueError, match="corrupt manifest list"):
            iceberg_snapshot(spark, d)

    def test_corrupt_manifest_quarantines_as_error_row(
        self, spark, tmp_path
    ):
        # a corrupt MANIFEST (not the list) is an error row from the
        # Avro reader, surfaced — not silently dropped
        d, md, m1, _ = _table(tmp_path)
        bad = f"{md}/zz-bad.avro"
        good_bytes = open(m1, "rb").read()
        with open(bad, "wb") as f:
            f.write(good_bytes[: len(good_bytes) // 2])
        ml = write_manifest_list(f"{md}/snap-12.avro", [
            _ml_row(m1), _ml_row(bad),
        ])
        write_iceberg_metadata(
            d, [{"snapshot-id": 12, "manifest-list": ml}], version=2
        )
        rows = iceberg_snapshot(spark, d).collect()
        errs = [r for r in rows if r.error is not None]
        assert len(errs) == 1
        assert errs[0].manifest_path.endswith("zz-bad.avro")
        assert sum(r.error is None for r in rows) == 2  # m1's a+b

    def test_no_current_snapshot_raises(self, spark, tmp_path):
        d = str(tmp_path)
        write_iceberg_metadata(d, [])
        with pytest.raises(ValueError, match="no current snapshot"):
            iceberg_snapshot(spark, d)


class TestHistory:
    def test_snapshot_lineage(self, spark, tmp_path):
        d = str(tmp_path)
        md = os.path.join(d, "metadata")
        os.makedirs(md, exist_ok=True)
        m = write_manifest(f"{md}/m.avro",
                           [_entry(1, "data/a.parquet", 5, 100, 0)])
        ml = write_manifest_list(f"{md}/snap.avro", [_ml_row(m)])
        write_iceberg_metadata(d, [
            {"snapshot-id": 10, "manifest-list": ml,
             "timestamp-ms": 1000,
             "summary": {"operation": "append",
                         "added-data-files": "2",
                         "added-records": "12"}},
            {"snapshot-id": 11, "parent-snapshot-id": 10,
             "manifest-list": ml, "timestamp-ms": 2000,
             "summary": {"operation": "overwrite",
                         "added-data-files": "1",
                         "deleted-data-files": "1",
                         "added-records": "9",
                         "deleted-records": "7"}},
        ])
        from soda_spark_spark.sources.iceberg import iceberg_history

        rows = sorted(iceberg_history(spark, d).collect(),
                      key=lambda r: r.snapshot_id)
        assert len(rows) == 2
        s10, s11 = rows
        assert s10.parent_snapshot_id is None
        assert s10.operation == "append"
        assert s10.added_data_files == 2 and s10.added_records == 12
        assert s10.deleted_data_files is None  # absent, never invented
        assert s10.is_current is False
        assert s11.parent_snapshot_id == 10
        assert s11.deleted_records == 7 and s11.is_current is True
        assert s11.manifest_list == ml

    def test_empty_snapshot_list(self, spark, tmp_path):
        d = str(tmp_path)
        write_iceberg_metadata(d, [])
        from soda_spark_spark.sources.iceberg import iceberg_history

        assert iceberg_history(spark, d).count() == 0


class TestDeleteCensus:
    def test_delete_files_visible(self, spark, tmp_path):
        from soda_spark_spark.sources.iceberg import (
            iceberg_delete_census,
        )

        d, md, m1, m2 = _table(tmp_path)
        dels = write_manifest(f"{md}/del.avro", [
            _entry(1, "deletes/d0.parquet", 4, 50, 0),
            _entry(1, "deletes/d1.parquet", 6, 60, 1),
        ])
        ml = write_manifest_list(f"{md}/snap-12.avro", [
            _ml_row(m2), _ml_row(dels, content=1),
        ])
        write_iceberg_metadata(
            d, [{"snapshot-id": 12, "manifest-list": ml}], version=2
        )
        # the snapshot refuses...
        with pytest.raises(ValueError, match="DELETE manifests"):
            from soda_spark_spark.sources.iceberg import (
                iceberg_snapshot,
            )
            iceberg_snapshot(spark, d)
        # ...and the delete census is how you SEE why
        rows = sorted(iceberg_delete_census(spark, d).collect(),
                      key=lambda r: r.file_path)
        assert [(r.file_path, r.record_count, r.file_size)
                for r in rows] == [
            ("deletes/d0.parquet", 4, 50),
            ("deletes/d1.parquet", 6, 60),
        ]
        assert all(r.manifest_path.endswith("del.avro") for r in rows)

    def test_no_deletes_empty_frame(self, spark, tmp_path):
        from soda_spark_spark.sources.iceberg import (
            iceberg_delete_census,
        )

        d, _, _, _ = _table(tmp_path)
        out = iceberg_delete_census(spark, d)
        assert out.count() == 0
        assert "record_count" in out.columns
