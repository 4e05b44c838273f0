"""Parquet footer census (`sources/parquet_meta.py`): cross-engine
equality against DuckDB's independent parquet_metadata()
implementation (including byte sizes — the strongest possible check
of the footer parse), multi-file fan-out, and the quarantine row."""

from __future__ import annotations

import duckdb

from soda_spark_spark.sources.parquet_meta import parquet_footer_stats

_COLS = (
    "file, row_group_id, row_group_num_rows, column_id,"
    " path_in_schema, physical_type, num_values, null_count,"
    " compression, total_compressed_size, total_uncompressed_size"
)


def _duck_rows(path: str):
    con = duckdb.connect()
    return con.execute(f"""
        SELECT list_extract(str_split(file_name, '/'), -1) AS file,
               CAST(row_group_id AS INTEGER) AS row_group_id,
               row_group_num_rows,
               CAST(column_id AS INTEGER) AS column_id,
               replace(path_in_schema, ', ', '.') AS path_in_schema,
               type AS physical_type, num_values,
               stats_null_count AS null_count, compression,
               total_compressed_size, total_uncompressed_size
        FROM parquet_metadata('{path}')
    """).fetchall()


def test_footer_stats_match_duckdb_on_real_tables(spark):
    """Byte-for-byte agreement with DuckDB's footer reader on the
    real test tables — two independent implementations of the binary
    format agreeing on every chunk's sizes and counts."""
    for table in ("lineitem", "documents", "embeddings"):
        path = f"/root/testdata/sf0.001/{table}.parquet"
        got = sorted(
            tuple(r) for r in parquet_footer_stats(spark, path)
            .selectExpr(*_COLS.split(", ")).collect()
        )
        want = sorted(_duck_rows(path))
        assert got == want, table


def test_footer_stats_multifile_and_quarantine(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({"a": list(range(10))})
    pq.write_table(t, str(tmp_path / "good.parquet"))
    (tmp_path / "bad.parquet").write_bytes(b"PAR1 not really")
    out = parquet_footer_stats(spark, str(tmp_path / "*.parquet"))
    rows = {r.file: r for r in out.collect()}
    assert rows["good.parquet"].error is None
    assert rows["good.parquet"].num_values == 10
    assert rows["bad.parquet"].error is not None
    assert rows["bad.parquet"].row_group_id is None


def test_footer_scan_reads_no_content(spark):
    """The binaryFile listing must prune to `path` — the data pages
    are never shipped to the census."""
    out = parquet_footer_stats(
        spark, "/root/testdata/sf0.001/lineitem.parquet"
    )
    plan = spark._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "ReadSchema: struct<path:string>" in plan
    assert "content" not in plan.split("ReadSchema")[1].split("\n")[0]