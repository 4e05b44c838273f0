"""Delta transaction-log reader laws (`sources/delta_log.py`):
action census, last-writer-wins snapshot reconstruction, checkpoint
vs JSON-replay equality, protocol gate, corrupt-log refusal."""

import json

import pytest

from soda_spark_spark.sources.delta_log import (
    delta_snapshot,
    read_delta_log,
    write_delta_checkpoint,
    write_delta_commit,
)


def _add(path, size, nrec, p=None, ts=1):
    return {"add": {
        "path": path, "size": size, "dataChange": True,
        "modificationTime": ts,
        "partitionValues": {} if p is None else {"p": str(p)},
        "stats": json.dumps({"numRecords": nrec}),
    }}


def _rm(path, ts=2):
    return {"remove": {
        "path": path, "deletionTimestamp": ts, "dataChange": True,
    }}


def _base(d):
    write_delta_commit(d, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "m", "schemaString": "{}",
                      "partitionColumns": ["p"]}},
        _add("p%3D0/f0.parquet", 100, 10, p=0),
        _add("p%3D1/f1.parquet", 200, 20, p=1),
    ])
    write_delta_commit(d, 1, [
        {"commitInfo": {"timestamp": 99}},
        _rm("p%3D0/f0.parquet"),
        _add("p%3D0/f2.parquet", 300, 30, p=0),
    ])


class TestCensus:
    def test_actions_parse(self, spark, tmp_path):
        d = str(tmp_path)
        _base(d)
        rows = read_delta_log(spark, d).orderBy("version", "seq").collect()
        kinds = [r.kind for r in rows]
        assert kinds == ["protocol", "metaData", "add", "add",
                         "commitInfo", "remove", "add"]
        adds = [r for r in rows if r.kind == "add"]
        # URI-encoded paths decode exactly once
        assert adds[0].path == "p=0/f0.parquet"
        assert adds[0].size == 100 and adds[0].num_records == 10
        assert adds[0].partition_values == {"p": "0"}
        assert rows[0].min_reader == 1
        assert rows[4].ts == 99
        assert all(r.error is None for r in rows)

    def test_version_filter(self, spark, tmp_path):
        d = str(tmp_path)
        _base(d)
        assert read_delta_log(spark, d, version=0).count() == 4

    def test_missing_log_raises(self, spark, tmp_path):
        with pytest.raises(FileNotFoundError):
            read_delta_log(spark, str(tmp_path))

    def test_corrupt_line_is_one_error_row(self, spark, tmp_path):
        d = str(tmp_path)
        _base(d)
        p = write_delta_commit(d, 2, [_add("f3.parquet", 1, 1)])
        with open(p, "a") as f:
            f.write("{not json\n")
        rows = read_delta_log(spark, d).collect()
        errs = [r for r in rows if r.error is not None]
        assert len(errs) == 1
        assert errs[0].version == 2 and errs[0].seq == 1
        assert "bad delta action" in errs[0].error

    def test_reader_features_pin_min_reader_3(self, spark, tmp_path):
        d = str(tmp_path)
        write_delta_commit(d, 0, [
            {"protocol": {"minReaderVersion": 1,
                          "readerFeatures": ["deletionVectors"]}},
            _add("f0.parquet", 1, 1),
        ])
        rows = read_delta_log(spark, d).collect()
        assert max(r.min_reader or 0 for r in rows) == 3


class TestSnapshot:
    def test_last_writer_wins(self, spark, tmp_path):
        d = str(tmp_path)
        _base(d)
        snap = {r.path: r for r in delta_snapshot(spark, d).collect()}
        assert set(snap) == {"p=1/f1.parquet", "p=0/f2.parquet"}
        assert snap["p=0/f2.parquet"].asserted_version == 1
        assert snap["p=0/f2.parquet"].num_records == 30

    def test_time_travel(self, spark, tmp_path):
        d = str(tmp_path)
        _base(d)
        snap = {r.path for r in
                delta_snapshot(spark, d, version=0).collect()}
        assert snap == {"p=0/f0.parquet", "p=1/f1.parquet"}

    def test_readd_after_remove_is_live(self, spark, tmp_path):
        d = str(tmp_path)
        _base(d)
        write_delta_commit(d, 2, [_add("p%3D0/f0.parquet", 555, 55, p=0)])
        snap = {r.path: r for r in delta_snapshot(spark, d).collect()}
        assert snap["p=0/f0.parquet"].size == 555
        assert snap["p=0/f0.parquet"].asserted_version == 2

    def test_same_commit_remove_then_add(self, spark, tmp_path):
        """Within one commit, line order decides: remove at seq 0,
        re-add at seq 1 leaves the path LIVE."""
        d = str(tmp_path)
        _base(d)
        write_delta_commit(d, 2, [
            _rm("p%3D1/f1.parquet"),
            _add("p%3D1/f1.parquet", 999, 99, p=1),
        ])
        snap = {r.path: r for r in delta_snapshot(spark, d).collect()}
        assert snap["p=1/f1.parquet"].size == 999

    def test_checkpoint_equals_json_replay(self, spark, tmp_path):
        """Checkpoint-replay and pure-JSON-replay snapshots are
        row-for-row equal on (path, size, num_records); for
        asserted_version the checkpoint is the log's information
        horizon — a file added BEFORE the checkpoint reports the
        checkpoint version (the spec's checkpoint carries no add
        provenance), stated, not hidden."""
        d = str(tmp_path)
        _base(d)
        write_delta_checkpoint(d, 1, [
            ("p=1/f1.parquet", 200, json.dumps({"numRecords": 20}),
             {"p": "1"}),
            ("p=0/f2.parquet", 300, json.dumps({"numRecords": 30}),
             {"p": "0"}),
        ], removes=["p=0/f0.parquet"])
        write_delta_commit(d, 2, [
            _add("p%3D2/f3.parquet", 400, 40, p=2),
        ])
        key = lambda r: r.path  # noqa: E731
        a = sorted(delta_snapshot(spark, d).collect(), key=key)
        b = sorted(delta_snapshot(spark, d, checkpoint=False).collect(),
                   key=key)
        assert [(r.path, r.size, r.num_records) for r in a] == \
               [(r.path, r.size, r.num_records) for r in b]
        assert {r.path for r in a} == {
            "p=1/f1.parquet", "p=0/f2.parquet", "p=2/f3.parquet"}
        av = {r.path: r.asserted_version for r in a}
        bv = {r.path: r.asserted_version for r in b}
        # f1 was added at 0: the JSON replay knows that, the
        # checkpoint path reports its horizon (version 1)
        assert bv["p=1/f1.parquet"] == 0
        assert av["p=1/f1.parquet"] == 1
        # files at/after the checkpoint agree exactly
        assert av["p=0/f2.parquet"] == bv["p=0/f2.parquet"] == 1
        assert av["p=2/f3.parquet"] == bv["p=2/f3.parquet"] == 2

    def test_checkpoint_authoritative_at_its_own_version(
        self, spark, tmp_path
    ):
        """A checkpoint at version V is the COMPLETE state at V
        (spec); the JSON tail replays strictly-greater versions
        only — commit V's JSON is never applied on top of it."""
        d = str(tmp_path)
        write_delta_commit(d, 0, [_add("f0.parquet", 1, 1)])
        write_delta_commit(d, 1, [_add("f0.parquet", 77, 7)])
        # the checkpoint HAS already folded commit 1 in (spec-valid)
        write_delta_checkpoint(d, 1, [
            ("f0.parquet", 77, json.dumps({"numRecords": 7}), None),
        ])
        snap = delta_snapshot(spark, d).collect()
        assert len(snap) == 1 and snap[0].size == 77
        # and the JSON-only replay agrees
        snap2 = delta_snapshot(spark, d, checkpoint=False).collect()
        assert snap2[0].size == 77

    def test_time_travel_below_checkpoint_falls_back(
        self, spark, tmp_path
    ):
        d = str(tmp_path)
        _base(d)
        write_delta_checkpoint(d, 1, [
            ("p=1/f1.parquet", 200, None, {"p": "1"}),
            ("p=0/f2.parquet", 300, None, {"p": "0"}),
        ], removes=["p=0/f0.parquet"])
        snap = {r.path for r in
                delta_snapshot(spark, d, version=0).collect()}
        assert snap == {"p=0/f0.parquet", "p=1/f1.parquet"}

    def test_protocol_gate_refuses_v2_reader(self, spark, tmp_path):
        d = str(tmp_path)
        write_delta_commit(d, 0, [
            {"protocol": {"minReaderVersion": 2,
                          "minWriterVersion": 5}},
            _add("f0.parquet", 1, 1),
        ])
        with pytest.raises(ValueError, match="minReaderVersion=2"):
            delta_snapshot(spark, d)

    def test_protocol_gate_refuses_reader_features(
        self, spark, tmp_path
    ):
        d = str(tmp_path)
        write_delta_commit(d, 0, [
            {"protocol": {"minReaderVersion": 1,
                          "readerFeatures": ["deletionVectors"]}},
            _add("f0.parquet", 1, 1),
        ])
        with pytest.raises(ValueError, match="minReaderVersion=3"):
            delta_snapshot(spark, d)

    def test_corrupt_log_refuses_snapshot(self, spark, tmp_path):
        d = str(tmp_path)
        _base(d)
        p = write_delta_commit(d, 2, [_add("f3.parquet", 1, 1)])
        with open(p, "a") as f:
            f.write("{not json\n")
        with pytest.raises(ValueError, match="corrupt Delta log"):
            delta_snapshot(spark, d)
        # the census still reads it — that's the inspection channel
        assert read_delta_log(spark, d).where(
            "error is not null").count() == 1

    def test_unpartitioned_add(self, spark, tmp_path):
        d = str(tmp_path)
        write_delta_commit(d, 0, [_add("f0.parquet", 5, 2)])
        snap = delta_snapshot(spark, d).collect()
        assert snap[0].partition_values == {}
