"""Arrow IPC file reader laws (`sources/arrow_ipc.py`): footer-only
census, per-(file, batch) ranged decode, head-magic validation,
first-file schema election, quarantine contract, rec_index law."""

import datetime

import pyarrow as pa
import pytest

from soda_spark_spark.sources.arrow_ipc import (
    arrow_ipc_census,
    read_arrow_ipc,
    write_arrow_ipc,
)


def _table(n=10):
    return pa.table({
        "id": pa.array(range(n), pa.int64()),
        "text": pa.array([f"doc {i}" for i in range(n)], pa.string()),
        "score": pa.array(
            [None if i % 3 == 0 else i * 0.5 for i in range(n)],
            pa.float64(),
        ),
        "ok": pa.array([i % 2 == 0 for i in range(n)], pa.bool_()),
        "tags": pa.array(
            [[f"t{i}", f"u{i}"] for i in range(n)],
            pa.list_(pa.string()),
        ),
    })


class TestRoundTrip:
    def test_basic_values(self, spark, tmp_path):
        p = str(tmp_path / "a.arrow")
        write_arrow_ipc(_table(6), p)
        rows = {
            r.id: r
            for r in read_arrow_ipc(spark, p).collect()
        }
        assert len(rows) == 6
        assert rows[1].text == "doc 1"
        assert rows[0].score is None and rows[2].score == 1.0
        assert rows[4].ok is True and rows[3].ok is False
        assert rows[5].tags == ["t5", "u5"]
        assert all(r.error is None for r in rows.values())

    def test_multibatch_rec_index_law(self, spark, tmp_path):
        p = str(tmp_path / "a.arrow")
        write_arrow_ipc(_table(10), p, batch_rows=3)
        out = sorted(
            read_arrow_ipc(spark, p).collect(), key=lambda r: r.id
        )
        # rec_index numbers records in (batch, row) order == write order
        assert [r.rec_index for r in out] == list(range(10))
        assert [r.batch_index for r in out] == [i // 3 for i in range(10)]
        assert [r.row_index for r in out] == [i % 3 for i in range(10)]

    def test_no_binaryfile_scan_and_two_arrow_stages(self, spark, tmp_path):
        p = str(tmp_path / "a.arrow")
        write_arrow_ipc(_table(10), p, batch_rows=2)
        plan = (
            read_arrow_ipc(spark, p)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "binaryFile" not in plan
        # span planning + decode are both Arrow-batched python stages
        assert plan.count("MapInPandas") == 2

    def test_dictionary_encoded_strings_decode(self, spark, tmp_path):
        p = str(tmp_path / "a.arrow")
        t = pa.table({
            "id": pa.array([0, 1, 2], pa.int64()),
            "lang": pa.array(["en", "de", "en"]).dictionary_encode(),
        })
        write_arrow_ipc(t, p)
        out = sorted(
            read_arrow_ipc(spark, p).collect(), key=lambda r: r.id
        )
        assert [r.lang for r in out] == ["en", "de", "en"]

    def test_date_and_timestamp(self, spark, tmp_path):
        p = str(tmp_path / "a.arrow")
        d0 = datetime.date(2024, 1, 2)
        ts0 = datetime.datetime(2024, 1, 2, 3, 4, 5, 123456)
        t = pa.table({
            "d": pa.array([d0, None], pa.date32()),
            "ts": pa.array([ts0, None], pa.timestamp("us")),
        })
        write_arrow_ipc(t, p)
        out = read_arrow_ipc(spark, p).collect()
        got = {(r.d, r.ts) for r in out}
        assert (d0, ts0) in got and (None, None) in got

    def test_zero_batch_file(self, spark, tmp_path):
        p = str(tmp_path / "a.arrow")
        write_arrow_ipc(_table(0), p)
        assert read_arrow_ipc(spark, p).count() == 0
        c = arrow_ipc_census(spark, p).collect()[0]
        assert c.num_batches == 0 and c.error is None

    def test_empty_glob_raises(self, spark, tmp_path):
        with pytest.raises(FileNotFoundError):
            read_arrow_ipc(spark, str(tmp_path / "none-*.arrow"))


class TestCensus:
    def test_footer_only_bytes(self, tmp_path, monkeypatch):
        """The census witness: a ~1 MB single-batch file censuses by
        reading the 6-byte head magic + the tail (footer length +
        footer) — never a batch body."""
        import os

        from soda_spark_spark.sources import safetensors as st_mod
        from soda_spark_spark.sources.arrow_ipc import _open_footer

        p = str(tmp_path / "big.arrow")
        t = pa.table({
            "v": pa.array([float(i) for i in range(200_000)],
                          pa.float64()),
        })
        write_arrow_ipc(t, p)
        size = os.path.getsize(p)
        assert size > 1_000_000

        counts = {"n": 0}

        class _Shim:
            def __init__(self, path):
                self._f = open(path, "rb")

            def read(self, n=-1):
                b = self._f.read(n)
                counts["n"] += len(b)
                return b

            def seek(self, pos, whence=0):
                return self._f.seek(pos, whence)

            def tell(self):
                return self._f.tell()

            def close(self):
                self._f.close()

            @property
            def closed(self):
                return self._f.closed

        monkeypatch.setattr(st_mod, "_open_input", lambda p: _Shim(p))
        f, reader = _open_footer(p)
        nb = reader.num_record_batches
        f.close()
        assert nb == 1
        assert counts["n"] < 2000, counts["n"]

    def test_census_fields(self, spark, tmp_path):
        p = str(tmp_path / "a.arrow")
        write_arrow_ipc(_table(10), p, batch_rows=4)
        c = arrow_ipc_census(spark, p).collect()[0]
        assert c.num_batches == 3 and c.num_fields == 5
        assert "id bigint" in c.schema_ddl
        assert "tags array<string>" in c.schema_ddl

    def test_census_marks_unsupported_types(self, spark, tmp_path):
        p = str(tmp_path / "a.arrow")
        t = pa.table({
            "id": pa.array([1], pa.int64()),
            "big": pa.array([2], pa.uint64()),
        })
        write_arrow_ipc(t, p)
        c = arrow_ipc_census(spark, p).collect()[0]
        assert c.error is None
        assert "UNSUPPORTED<uint64>" in c.schema_ddl


class TestQuarantine:
    def test_bad_head_magic(self, spark, tmp_path):
        """pyarrow validates only the TAIL magic; the module pins the
        head-magic law itself."""
        good = str(tmp_path / "good.arrow")
        write_arrow_ipc(_table(5), good)
        bad = str(tmp_path / "zbad.arrow")
        data = bytearray(open(good, "rb").read())
        data[:6] = b"XXXXXX"
        open(bad, "wb").write(bytes(data))

        out = read_arrow_ipc(spark, str(tmp_path / "*.arrow")).collect()
        errs = [r for r in out if r.error is not None]
        assert len(errs) == 1
        assert "bad head magic" in errs[0].error
        assert errs[0].file.endswith("zbad.arrow")
        assert errs[0].id is None and errs[0].rec_index is None
        assert len([r for r in out if r.error is None]) == 5

        c = {
            r.file.rsplit("/", 1)[-1]: r
            for r in arrow_ipc_census(
                spark, str(tmp_path / "*.arrow")
            ).collect()
        }
        assert c["zbad.arrow"].error is not None
        assert c["good.arrow"].num_batches == 1

    def test_truncated_footer(self, spark, tmp_path):
        good = str(tmp_path / "good.arrow")
        write_arrow_ipc(_table(5), good)
        bad = str(tmp_path / "ztrunc.arrow")
        data = open(good, "rb").read()
        open(bad, "wb").write(data[: len(data) // 2])
        out = read_arrow_ipc(spark, str(tmp_path / "*.arrow")).collect()
        errs = [r for r in out if r.error is not None]
        assert len(errs) == 1 and errs[0].file.endswith("ztrunc.arrow")

    def test_schema_divergence_quarantines_file(self, spark, tmp_path):
        write_arrow_ipc(_table(4), str(tmp_path / "a.arrow"))
        t = pa.table({
            "id": pa.array(["x"], pa.string()),  # int64 -> string
            "text": pa.array(["y"], pa.string()),
            "score": pa.array([1.0], pa.float64()),
            "ok": pa.array([True], pa.bool_()),
            "tags": pa.array([["t"]], pa.list_(pa.string())),
        })
        write_arrow_ipc(t, str(tmp_path / "b.arrow"))
        out = read_arrow_ipc(spark, str(tmp_path / "*.arrow")).collect()
        errs = [r for r in out if r.error is not None]
        assert len(errs) == 1 and errs[0].file.endswith("b.arrow")
        assert "diverges" in errs[0].error
        assert len([r for r in out if r.error is None]) == 4

    def test_divergence_checked_on_selected_columns_only(
        self, spark, tmp_path
    ):
        """`columns=` narrows the election: a later file divergent in
        an UNSELECTED field still reads — pruning is semantic, not
        just I/O."""
        write_arrow_ipc(_table(4), str(tmp_path / "a.arrow"))
        t = pa.table({
            "id": pa.array([100], pa.int64()),
            "text": pa.array([7], pa.int64()),  # divergent, unselected
        })
        write_arrow_ipc(t, str(tmp_path / "b.arrow"))
        out = read_arrow_ipc(
            spark, str(tmp_path / "*.arrow"), columns=["id"]
        ).collect()
        assert all(r.error is None for r in out)
        assert {r.id for r in out} == {0, 1, 2, 3, 100}


class TestElection:
    def test_unsupported_type_raises_at_driver(self, spark, tmp_path):
        p = str(tmp_path / "a.arrow")
        t = pa.table({
            "id": pa.array([1], pa.int64()),
            "big": pa.array([2], pa.uint64()),
        })
        write_arrow_ipc(t, p)
        with pytest.raises(ValueError, match="unsupported Arrow type"):
            read_arrow_ipc(spark, p)
        # excluding it via columns= works
        out = read_arrow_ipc(spark, p, columns=["id"]).collect()
        assert out[0].id == 1

    def test_ns_timestamp_rejected_not_truncated(self, spark, tmp_path):
        p = str(tmp_path / "a.arrow")
        t = pa.table({
            "ts": pa.array([1], pa.timestamp("ns")),
        })
        write_arrow_ipc(t, p)
        with pytest.raises(ValueError, match="ns precision"):
            read_arrow_ipc(spark, p)

    def test_unknown_column_raises(self, spark, tmp_path):
        p = str(tmp_path / "a.arrow")
        write_arrow_ipc(_table(2), p)
        with pytest.raises(ValueError, match="not in the elected"):
            read_arrow_ipc(spark, p, columns=["nope"])

    def test_bookkeeping_collision_raises(self, spark, tmp_path):
        p = str(tmp_path / "a.arrow")
        t = pa.table({"error": pa.array(["x"], pa.string())})
        write_arrow_ipc(t, p)
        with pytest.raises(ValueError, match="collide with bookkeeping"):
            read_arrow_ipc(spark, p)

    def test_empty_columns_raises(self, spark, tmp_path):
        p = str(tmp_path / "a.arrow")
        write_arrow_ipc(_table(2), p)
        with pytest.raises(ValueError, match="non-empty"):
            read_arrow_ipc(spark, p, columns=[])
