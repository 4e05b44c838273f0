"""Arrow IPC *stream*-format reader laws (`sources/arrow_ipc.py`
`read_arrow_stream`): schema election off the schema message,
one-sequential-task-per-file decode, in-task rec_index, sequential
corruption stop, EOS-less tail behavior, schema-divergence
quarantine, column pruning — and row-shape parity with the file
reader."""

import pyarrow as pa
import pytest

from soda_spark_spark.sources.arrow_ipc import (
    read_arrow_ipc,
    read_arrow_stream,
    write_arrow_ipc,
    write_arrow_stream,
)


def _table(n=10):
    return pa.table({
        "id": pa.array(range(n), pa.int64()),
        "text": pa.array([f"doc {i}" for i in range(n)], pa.string()),
        "score": pa.array(
            [None if i % 3 == 0 else i * 0.5 for i in range(n)],
            pa.float64(),
        ),
    })


class TestRoundTrip:
    def test_values_and_indices(self, spark, tmp_path):
        p = str(tmp_path / "a.arrows")
        write_arrow_stream(_table(10), p, batch_rows=3)
        rows = sorted(
            read_arrow_stream(spark, p).collect(), key=lambda r: r.id
        )
        assert [r.id for r in rows] == list(range(10))
        assert rows[1].text == "doc 1"
        assert rows[0].score is None and rows[2].score == 1.0
        # in-task rec_index: arrival order == write order
        assert [r.rec_index for r in rows] == list(range(10))
        assert [r.batch_index for r in rows] == [i // 3 for i in range(10)]
        assert [r.row_index for r in rows] == [i % 3 for i in range(10)]
        assert all(r.error is None for r in rows)

    def test_row_shape_parity_with_file_reader(self, spark, tmp_path):
        ps = str(tmp_path / "a.arrows")
        pf = str(tmp_path / "a.arrow")
        write_arrow_stream(_table(7), ps, batch_rows=2)
        write_arrow_ipc(_table(7), pf, batch_rows=2)
        ds = read_arrow_stream(spark, ps)
        df = read_arrow_ipc(spark, pf)
        assert ds.columns == df.columns
        key = lambda r: r.id  # noqa: E731
        srows = sorted(ds.collect(), key=key)
        frows = sorted(df.collect(), key=key)
        # identical except the file path itself
        assert [tuple(r)[1:] for r in srows] == [
            tuple(r)[1:] for r in frows
        ]

    def test_multi_file_glob(self, spark, tmp_path):
        write_arrow_stream(_table(4), str(tmp_path / "a.arrows"))
        write_arrow_stream(_table(3), str(tmp_path / "b.arrows"))
        out = read_arrow_stream(spark, str(tmp_path / "*.arrows"))
        assert out.count() == 7

    def test_column_pruning(self, spark, tmp_path):
        p = str(tmp_path / "a.arrows")
        write_arrow_stream(_table(4), p)
        out = read_arrow_stream(spark, p, columns=["id"])
        assert out.columns == [
            "file", "batch_index", "rec_index", "row_index", "id",
            "error",
        ]

    def test_unknown_column_raises_at_driver(self, spark, tmp_path):
        p = str(tmp_path / "a.arrows")
        write_arrow_stream(_table(4), p)
        with pytest.raises(ValueError, match="not in the elected"):
            read_arrow_stream(spark, p, columns=["nope"])


class TestSequentialCorruption:
    def test_torn_tail_keeps_prefix_one_stop_row(self, spark, tmp_path):
        p = str(tmp_path / "a.arrows")
        write_arrow_stream(_table(10), p, batch_rows=3)
        raw = open(p, "rb").read()
        open(p, "wb").write(raw[:-30])  # tear into the last message
        rows = read_arrow_stream(spark, p).collect()
        good = sorted(
            (r for r in rows if r.error is None), key=lambda r: r.id
        )
        errs = [r for r in rows if r.error is not None]
        # batches 0..2 (9 rows) decode; the torn 4th is one stop row
        assert [r.id for r in good] == list(range(9))
        assert [r.rec_index for r in good] == list(range(9))
        assert len(errs) == 1
        assert errs[0].batch_index == 3 and errs[0].rec_index is None
        assert "bad arrow ipc stream batch" in errs[0].error

    def test_eos_less_clean_boundary_decodes_fully(self, spark, tmp_path):
        # writer died after the last complete batch but before EOS:
        # everything decodes, no error row (EOF at a message boundary
        # is indistinguishable from a finished stream)
        p = str(tmp_path / "a.arrows")
        write_arrow_stream(_table(10), p, batch_rows=5, eos=False)
        rows = read_arrow_stream(spark, p).collect()
        assert len(rows) == 10
        assert all(r.error is None for r in rows)

    def test_not_a_stream_quarantines_wholesale(self, spark, tmp_path):
        p = str(tmp_path / "a.arrows")
        open(p, "wb").write(b"PK\x03\x04 definitely not arrow")
        # elect from a good sibling so the bad file is a worker-side
        # quarantine, not a driver raise
        g = str(tmp_path / "0good.arrows")
        write_arrow_stream(_table(3), g)
        rows = read_arrow_stream(
            spark, str(tmp_path / "*.arrows")
        ).collect()
        errs = [r for r in rows if r.error is not None]
        assert len(errs) == 1
        assert errs[0].file.endswith("a.arrows")
        assert "bad arrow ipc stream" in errs[0].error
        assert sum(r.error is None for r in rows) == 3


class TestSchemaElection:
    def test_divergent_schema_quarantines_wholesale(self, spark, tmp_path):
        write_arrow_stream(_table(3), str(tmp_path / "0a.arrows"))
        write_arrow_stream(
            pa.table({
                "id": pa.array([1.5], pa.float64()),  # type diverges
                "text": pa.array(["x"]),
                "score": pa.array([0.0], pa.float64()),
            }),
            str(tmp_path / "1b.arrows"),
        )
        rows = read_arrow_stream(
            spark, str(tmp_path / "*.arrows")
        ).collect()
        errs = [r for r in rows if r.error is not None]
        assert len(errs) == 1 and errs[0].file.endswith("1b.arrows")
        assert "diverges from the elected" in errs[0].error

    def test_one_task_per_file_no_window_shuffle(self, spark, tmp_path):
        # sequential format -> the plan must contain NO window
        # exchange for rec_index (it is assigned in-task) and no
        # binaryFile scan
        p = str(tmp_path / "a.arrows")
        write_arrow_stream(_table(6), p, batch_rows=2)
        plan = (
            read_arrow_stream(spark, p)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Window" not in plan
        assert "binaryFile" not in plan
        assert plan.count("MapInPandas") == 1
