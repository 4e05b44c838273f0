"""General source/sink layer: batch + streaming readers and writers for the
formats a scan pipeline meets in practice (parquet, csv, json, orc).

The reference takes "whatever DataFrame the caller hands in"
(/root/reference/src/sodaspark/scan.py:441-442); this layer is the additive
convenience that turns a (format, path) pair into that DataFrame with
scale-appropriate defaults:

- batch readers pass options straight to the DataSource V2 scan so predicate
  pushdown / column pruning still reach the files;
- streaming readers REQUIRE an explicit schema (no inference on unbounded
  input) and expose `max_files_per_trigger` — the knob that bounds
  micro-batch size at scale;
- writers default to append-free `mode` choices and support partitioning
  columns, the primary layout lever for downstream scan pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

BATCH_FORMATS = ("parquet", "csv", "json", "orc", "text")


def read_source(
    spark: SparkSession,
    fmt: str,
    path: str,
    *,
    schema: T.StructType | str | None = None,
    options: dict | None = None,
) -> DataFrame:
    """Batch-read `path` as `fmt`. csv defaults to header=true +
    schema inference only when no schema is given (inference costs an extra
    pass — pass a schema for large inputs). 'text' reads raw lines as a
    one-column (`value` string) frame — the one-document-per-line corpus
    dump format; pass options={'wholetext': 'true'} for one row per FILE
    instead (per-file documents; each file must fit in one task)."""
    if fmt not in BATCH_FORMATS:
        raise ValueError(f"unsupported source format {fmt!r}; one of {BATCH_FORMATS}")
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true")
        if schema is None:
            reader = reader.option("inferSchema", "true")
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load(path)


def read_stream_source(
    spark: SparkSession,
    fmt: str,
    path: str,
    *,
    schema: T.StructType | str,
    options: dict | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming-read `path` as `fmt`. Schema is mandatory — inference over
    an unbounded directory is both slow and unsafe. `max_files_per_trigger`
    bounds each micro-batch."""
    if fmt not in BATCH_FORMATS:
        raise ValueError(f"unsupported source format {fmt!r}; one of {BATCH_FORMATS}")
    reader = spark.readStream.format(fmt).schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load(path)


def _dir_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes under `path` via the Hadoop FileSystem API (works for any
    FS the session can reach: local, HDFS, object stores)."""
    jvm = spark._jvm
    hadoop_path = jvm.org.apache.hadoop.fs.Path(path)
    fs = hadoop_path.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.getContentSummary(hadoop_path).getLength()


def compact_files(
    spark: SparkSession,
    fmt: str,
    src: str,
    dst: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    mode: str = "error",
    options: dict | None = None,
) -> int:
    """Small-file compaction: rewrite a dataset into ~target-sized files.

    Streaming sinks and incremental appends accumulate many small files;
    at scale the per-file open/footer cost dominates scans long before data
    volume does. This reads `src`, repartitions to
    ceil(source_bytes / target_file_bytes) partitions (source bytes from the
    FileSystem, so the estimate is pre-decompression — conservative for
    parquet-to-parquet rewrites), and writes `dst`. Returns the partition
    count used. Flat (non-partitionBy) layouts only — compact each partition
    directory of a partitioned layout separately so the shuffle stays
    bounded per partition.
    """
    import math

    df = read_source(spark, fmt, src, options=options)
    total = _dir_bytes(spark, src)
    n = max(1, math.ceil(total / target_file_bytes))
    write_sink(df.repartition(n), fmt, dst, mode=mode)
    return n


def write_sink(
    df: DataFrame,
    fmt: str,
    path: str,
    *,
    mode: str = "error",
    partition_by: list[str] | None = None,
    options: dict | None = None,
) -> None:
    """Batch-write `df` to `path` as `fmt`. `partition_by` is the layout
    lever that makes downstream scans partition-prunable — use low-cardinality
    columns that appear in filters."""
    if fmt not in BATCH_FORMATS:
        raise ValueError(f"unsupported sink format {fmt!r}; one of {BATCH_FORMATS}")
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        writer = writer.option("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.save(path)
