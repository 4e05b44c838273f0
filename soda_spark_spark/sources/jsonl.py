"""JSONL (newline-delimited JSON) ingestion/export — the interchange
format public text corpora actually ship in (The Pile, RedPajama,
Dolma, FineWeb all publish .jsonl / .jsonl.gz / .jsonl.zst shards).

Thin, contract-pinning wrappers over Spark's native distributed JSON
source (one task per split; Catalyst prunes unread columns at the
scan), with the two decisions a 100-TB ingest gets wrong by default
made explicit:

- **Malformed lines are a QUARANTINE channel, not a crash and not a
  silent drop**: `read_jsonl` always runs PERMISSIVE with a named
  corrupt-record column, so a truncated shard or a stray log line
  surfaces as rows with `corrupt_col` set — the same
  observable-malformedness contract as `sources/warc.py` and the
  multimodal decoders.
- **Schema is explicit by default at scale**: passing `schema=None`
  infers (one extra full pass over the data!); production ingest
  should pin the schema so ingestion is single-pass and drift in a
  shard (a field flipping type) lands in the corrupt channel instead
  of silently widening the inferred type.

Compression note (the sharding model): .gz files are NOT splittable —
one task per file — which matches how crawl corpora actually shard
(many ~100 MB-1 GB files), the `sources/warc.py` parallelism model.
Prefer many medium files over few huge ones; .zst requires a Hadoop
codec on the cluster classpath.

The reference (src/sodaspark/scan.py:424-474) scans already-loaded
frames and has no ingestion story; certified by the `jsonl_ingest`
registry row (write -> corrupt-inject -> read round-trip vs the
documents table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .io import ddl_with_corrupt


def read_jsonl(
    spark: SparkSession,
    path: str,
    *,
    schema: str | None = None,
    corrupt_col: str = "_corrupt_record",
    multiline: bool = False,
) -> DataFrame:
    """Read JSONL with the quarantine contract: well-formed lines parse
    into `schema` (explicit DDL string, or None to infer — see module
    note), malformed lines surface with `corrupt_col` holding the raw
    line and every schema column NULL. The corrupt column is appended
    to the schema automatically when absent.

    Spark restriction worth knowing: a query that references ONLY the
    corrupt column over the raw scan is disallowed
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — reference
    any schema column alongside it (as `corrupt_summary` does), or
    cache()/persist the parsed frame first."""
    reader = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .option("multiLine", "true" if multiline else "false")
    )
    if schema is not None:
        reader = reader.schema(ddl_with_corrupt(schema, corrupt_col))
    return reader.json(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    compression: str | None = "gzip",
    mode: str = "overwrite",
) -> None:
    """Write a frame as JSONL shards (one file per partition — size
    the partitioning upstream; `repartition(n)` for n shards). gzip by
    default: the corpus-interchange norm, readable everywhere, at the
    cost of unsplittable shards (module note)."""
    w = df.write.mode(mode)
    if compression is not None:
        w = w.option("compression", compression)
    w.json(path)


def corrupt_summary(
    df: DataFrame,
    corrupt_col: str = "_corrupt_record",
    *,
    key_col: str | None = None,
) -> DataFrame:
    """One-row health report of a `read_jsonl` frame: total lines,
    parsed lines, corrupt lines, plus the non-NULL count of `key_col`
    (default: the first schema column) — the ingest gate's decision
    input (alert when corrupt_pct spikes, or when the key field starts
    arriving null, on a new snapshot). Referencing the key column also
    keeps the plan clear of Spark's corrupt-column-only query
    restriction (see `read_jsonl`)."""
    c = F.col(corrupt_col)
    if key_col is None:
        others = [x for x in df.columns if x != corrupt_col]
        if not others:
            raise ValueError("corrupt_summary needs at least one schema column")
        key_col = others[0]
    return df.agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.when(c.isNull(), 1).otherwise(0)).cast("long").alias("n_parsed"),
        F.sum(F.when(c.isNotNull(), 1).otherwise(0)).cast("long").alias("n_corrupt"),
        F.count(F.col(key_col)).cast("long").alias("n_key_nonnull"),
    )


def read_jsonl_stream(
    spark: SparkSession,
    path: str,
    *,
    schema: str,
    corrupt_col: str = "_corrupt_record",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming JSONL source with the same quarantine contract as
    `read_jsonl` — the continuous-ingestion shape (a crawler drops
    .jsonl.gz shards into a landing directory; the stream picks up new
    files per micro-batch). Structured Streaming requires an explicit
    schema (there is no inference pass over an unbounded source), so
    `schema` is mandatory here; the corrupt column is appended when
    absent. `max_files_per_trigger` bounds per-batch work for backfill
    over a deep landing directory."""
    reader = (
        spark.readStream.schema(ddl_with_corrupt(schema, corrupt_col))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.json(path)


def jsonl_quarantine_batch_writer(
    good_path: str,
    quarantine_path: str,
    *,
    corrupt_col: str = "_corrupt_record",
    gate=None,
):
    """foreachBatch router for a `read_jsonl_stream`: malformed lines
    append to `quarantine_path` (raw line + batch id — the audit
    trail), well-formed rows optionally pass `gate` (a
    DataFrame -> DataFrame transform, e.g. a curation filter) and
    append to `good_path`. Split-to-two-sinks needs foreachBatch (one
    streaming query writes one sink); both writes are plain appends,
    so the router stays O(batch) with no state store::

        q = (read_jsonl_stream(spark, landing, schema=DDL)
             .writeStream.foreachBatch(jsonl_quarantine_batch_writer(
                 good_dir, quarantine_dir,
                 gate=lambda df: df.filter(F.length("text") >= 120)))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True)
             .start())
    """

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        c = F.col(corrupt_col)
        bad = batch_df.filter(c.isNotNull()).select(
            c.alias("raw_line"), F.lit(batch_id).cast("long").alias("batch_id")
        )
        bad.write.mode("append").parquet(quarantine_path)
        good = batch_df.filter(c.isNull()).drop(corrupt_col)
        if gate is not None:
            good = gate(good)
        good.write.mode("append").parquet(good_path)

    return _write
