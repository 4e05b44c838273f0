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


def ddl_with_corrupt(ddl: str, corrupt_col: str) -> str:
    """Append `corrupt_col string` to a DDL schema string unless a
    column with EXACTLY that name is already declared. Parses the DDL
    (StructType.fromDDL) rather than substring-matching it: a schema
    column whose name merely CONTAINS the corrupt name (e.g.
    `my_corrupt_record`) must not suppress the append, or the
    quarantine raw-line capture is silently lost."""
    names = {f.name for f in T.StructType.fromDDL(ddl).fields}
    if corrupt_col in names:
        return ddl
    return f"{ddl}, {corrupt_col} string"


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


def compaction_plan(
    files: DataFrame,
    *,
    size_col: str = "size_bytes",
    file_col: str = "path",
    target_bytes: int,
    partition_by: tuple[str, ...] | list[str] = (),
    group_col: str = "file_group",
) -> DataFrame:
    """Deterministic small-file compaction PLAN — the bin-packing pass
    Delta `OPTIMIZE` / Iceberg `rewrite_data_files(binpack)` run before
    rewriting: given a file listing (path, size), assign every file to a
    compaction group of ~`target_bytes`, so each group becomes one
    rewrite task / one output file. `compact_files` rewrites a whole
    directory by a global size estimate; this plans PER-FILE groups from
    metadata, the shape a 100-TB table needs (compact only the
    small-file tail, schedule groups independently, skip well-sized
    files).

    Packing rule (next-fit decreasing — deterministic and
    window-expressible, unlike first-fit's sequential bin scan):
    files with `size >= target_bytes` are already well-sized and each
    get a SINGLETON group; the rest sort by (size DESC, file ASC) and
    split at running-sum boundaries: group k holds the files whose
    preceding cumulative size lies in [k*target, (k+1)*target). That
    yields exactly ceil(total_small / target) packed groups — the
    MINIMUM possible count for target-sized outputs — and every group
    stays under target + one member file (< 2*target, since members
    are < target). A group can undershoot target only when its
    predecessor overshot, so sizes oscillate around target rather than
    drifting. NULL sizes get a NULL group (unknown size can't be
    packed; filter or stat them first).

    Scale: packing runs INSIDE each `partition_by` group (pass the
    table's partition columns — compaction never merges across
    partitions), so the sort window is per-partition. With no
    `partition_by` the window is global: fine for file LISTINGS
    (metadata scale — millions of rows, not billions), not for data
    rows. Returns the input plus `group_col` (long, dense from 0 per
    partition group: packed groups first, singletons after) and
    `<group_col>_bytes`, the group's total size.
    """
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be > 0, got {target_bytes}")
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    pb = [F.col(c) for c in partition_by]
    order = [F.desc(size_col), F.asc(file_col)]
    w = Window.partitionBy(*pb).orderBy(*order)
    size = F.col(size_col).cast("long")
    sized = files.filter(size.isNotNull())
    small = sized.filter(size < target_bytes)
    large = sized.filter(size >= target_bytes)
    cum_before = F.coalesce(
        F.sum(size).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    packed = small.withColumn(
        group_col, (cum_before / F.lit(target_bytes)).cast("long")
    )
    # singleton groups number AFTER the packed ones: base = max packed
    # group + 1 within the partition group (0 when nothing packs)
    base = packed.groupBy(*pb).agg(
        (F.max(group_col) + 1).alias("__base")
    )
    rn = F.row_number().over(w)
    if partition_by:
        # a partition group with only large files has no base row:
        # left join + coalesce(0)
        singles = large.join(base, list(partition_by), "left")
    else:
        # global groupBy() always yields exactly one row (max = NULL
        # when nothing packs → coalesce 0); broadcast the 1-row dim
        singles = large.crossJoin(F.broadcast(base))
    singles = singles.withColumn(
        group_col, F.coalesce(F.col("__base"), F.lit(0)) + rn - 1
    ).drop("__base")
    out = packed.unionByName(singles)
    wg = Window.partitionBy(*pb, F.col(group_col))
    out = out.withColumn(
        f"{group_col}_bytes", F.sum(size).over(wg)
    )
    unk = files.filter(F.col(size_col).isNull()).withColumn(
        group_col, F.lit(None).cast("long")
    ).withColumn(f"{group_col}_bytes", F.lit(None).cast("long"))
    return out.unionByName(unk)


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
