"""Parquet footer census — per-(row-group, column-chunk) metadata for
a file set, WITHOUT reading data pages. The layout-audit primitive
that pairs with `zone_map`/`compaction_plan`/`apply_zorder`: whether
a clustered write actually produced tight min/max envelopes, whether
row groups are sized for the reader, which columns dominate bytes,
and what compression each chunk landed on — all live in the footer,
and a 100-TB layout audit must read ONLY footers (a few KB per file,
~10^6x less I/O than the data).

`parquet_footer_stats` fans the file list out one-file-per-task (the
binaryFile listing pruned to `path` — content is never read) and
parses each footer with pyarrow. One row per column chunk:
(file, row_group_id, row_group_num_rows, column_id, path_in_schema,
physical_type, num_values, null_count, compression,
total_compressed_size, total_uncompressed_size, error). A file whose
footer cannot be parsed yields ONE quarantine row — same contract as
every reader in `sources/`.

The registry row certifies this against DuckDB's independent
`parquet_metadata()` implementation on the same files — a true
cross-engine check of the binary footer parse, not a replayed
fixture.

Derived from the public Apache Parquet format spec
(parquet.apache.org/docs/file-format) via the pyarrow API; the
reference (src/sodaspark/scan.py:441) scans already-loaded frames —
layout introspection is additive surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["parquet_footer_stats", "PARQUET_META_SCHEMA"]

PARQUET_META_SCHEMA = (
    "file string, row_group_id int, row_group_num_rows long,"
    " column_id int, path_in_schema string, physical_type string,"
    " num_values long, null_count long, compression string,"
    " total_compressed_size long, total_uncompressed_size long,"
    " error string"
)


def parquet_footer_stats(spark: SparkSession, path: str) -> DataFrame:
    """One row per (row group, column chunk) across the files at
    `path` (glob ok); footer-only I/O."""
    src = spark.read.format("binaryFile").load(path).select("path")

    def run(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for uri in pdf["path"]:
                local = uri[5:] if uri.startswith("file:") else uri
                fname = uri.rsplit("/", 1)[-1]
                try:
                    meta = pq.ParquetFile(local).metadata
                    for rg in range(meta.num_row_groups):
                        g = meta.row_group(rg)
                        for ci in range(g.num_columns):
                            c = g.column(ci)
                            st = c.statistics
                            rows.append((
                                fname, rg, g.num_rows, ci,
                                c.path_in_schema, c.physical_type,
                                c.num_values,
                                st.null_count if st is not None
                                and st.has_null_count else None,
                                c.compression,
                                c.total_compressed_size,
                                c.total_uncompressed_size, None,
                            ))
                except Exception as e:  # noqa: BLE001 — quarantine
                    rows.append((fname, None, None, None, None, None,
                                 None, None, None, None, None,
                                 str(e)[:200]))
            yield pd.DataFrame(
                rows,
                columns=["file", "row_group_id", "row_group_num_rows",
                         "column_id", "path_in_schema",
                         "physical_type", "num_values", "null_count",
                         "compression", "total_compressed_size",
                         "total_uncompressed_size", "error"],
            ).astype({
                "row_group_id": "Int32", "column_id": "Int32",
                "row_group_num_rows": "Int64", "num_values": "Int64",
                "null_count": "Int64",
                "total_compressed_size": "Int64",
                "total_uncompressed_size": "Int64",
            })

    return src.mapInPandas(run, schema=PARQUET_META_SCHEMA)
