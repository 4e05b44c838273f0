"""Delimited-text (CSV/TSV) ingestion with the quarantine contract —
the same two at-scale decisions `sources/jsonl.py` pins, applied to the
other interchange format every warehouse export and labeling vendor
ships:

- **Malformed lines are a QUARANTINE channel**: always PERMISSIVE with
  a named corrupt-record column, so a shifted delimiter, a broken
  quote, or a type-drifted field surfaces as a row with `corrupt_col`
  holding the raw line — never a crash, never a silent drop.
- **Schema is explicit**: a DDL string is REQUIRED (CSV inference is a
  full extra pass AND silently widens drifted types — exactly the
  failures the corrupt channel exists to catch). Type mismatches and
  token-count mismatches both quarantine.

Parallelism model matches `jsonl.py`: uncompressed/.bz2 splits, .gz is
one task per file — shard into many medium files.

The reference scans already-loaded frames (src/sodaspark/scan.py:441);
ingestion is additive surface. Certified by the `csv_ingest` registry
row (write -> corrupt-inject -> read round-trip vs the documents
table); `jsonl.corrupt_summary` works on these frames unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .io import ddl_with_corrupt


def read_delimited(
    spark: SparkSession,
    path: str,
    *,
    schema: str,
    delimiter: str = ",",
    header: bool = False,
    quote: str = '"',
    multiline: bool = False,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """Read delimited text under the quarantine contract: well-formed
    lines parse into `schema` (explicit DDL, required — module note);
    lines with the wrong token count, unparseable field types, or
    broken quoting surface with `corrupt_col` holding the raw line and
    every schema column NULL. The corrupt column is appended to the
    schema automatically when absent.

    Fields containing NEWLINES (quoted by the writer) need
    `multiline=True` to round-trip — the line-splitting fast path
    cannot see quote state across lines, so a quoted newline otherwise
    fragments the record across quarantine rows. multiline parsing is
    per-file (not per-split): keep shards medium-sized, the module's
    parallelism model anyway.

    The corrupt-column-only query restriction documented on
    `read_jsonl` applies here too: reference a schema column alongside
    the corrupt column (as `jsonl.corrupt_summary` does)."""
    ddl = ddl_with_corrupt(schema, corrupt_col)
    return (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .option("sep", delimiter)
        .option("quote", quote)
        .option("header", "true" if header else "false")
        .option("multiLine", "true" if multiline else "false")
        .option("enforceSchema", "false")
        .schema(ddl)
        .csv(path)
    )


def write_delimited(
    df: DataFrame,
    path: str,
    *,
    delimiter: str = ",",
    header: bool = False,
    compression: str | None = "gzip",
    mode: str = "overwrite",
) -> None:
    """Write a frame as delimited shards (one file per partition —
    `repartition(n)` upstream for n shards). Spark quotes fields
    containing the delimiter/quote/newlines, AND this writer pins
    ignoreLeading/TrailingWhiteSpace=false (Spark's CSV writer TRIMS
    field edges by default — a silent corpus mutation), so round-trips
    are byte-exact for string content; gzip by default (unsplittable
    shards — the corpus norm, module note)."""
    w = (
        df.write.mode(mode)
        .option("sep", delimiter)
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
    )
    if header:
        w = w.option("header", "true")
    if compression is not None:
        w = w.option("compression", compression)
    w.csv(path)
