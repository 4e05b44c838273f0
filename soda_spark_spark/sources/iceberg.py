"""Apache Iceberg metadata reader — snapshot census + active-file
reconstruction, from the PUBLIC table spec alone
(iceberg.apache.org/spec/).

The second-most-common lakehouse format after Delta. Where Delta's
truth is a JSON commit log (`sources/delta_log.py`), Iceberg's is a
METADATA TREE: a JSON table-metadata file names SNAPSHOTS, each
snapshot points at a MANIFEST LIST (one Avro file, one row per
manifest), and each MANIFEST (Avro again) lists data-file entries
with a status. Reading the parquet directory without walking the
tree double-counts dead files — the same wrongness the Delta module
refuses. The tree composes directly onto `read_avro_records`
(`sources/avro_ocf.py` — manifests are plain Avro OCF with nested
records, which it decodes natively):

- `iceberg_table_info`: driver-side parse of the current (or
  explicit) `v<N>.metadata.json` — bytes-sized, the
  `_last_checkpoint` analogue.
- `iceberg_census`: one row per MANIFEST of a snapshot's manifest
  list — the who-wrote-what census (spec manifest-list fields
  500-514: path, length, spec id, content kind, added snapshot,
  added/existing/deleted file and row counts).
- `iceberg_snapshot`: the LIVE data files of a snapshot — every
  DATA-manifest entry whose status is not DELETED (spec: 0=EXISTING,
  1=ADDED, 2=DELETED; a snapshot's manifests are self-contained, so
  liveness needs no cross-commit replay, unlike Delta's
  last-writer-wins window).
- `iceberg_history` (round-20 wave 2): one row per snapshot in the
  metadata JSON — commit lineage with the writer's summary
  counters, the `delta_log_census` analogue.
- `iceberg_delete_census` (round-20 wave 2): the entries of every
  DELETE manifest — the visibility side of the delete gate: see
  what the deletes are without anyone pretending they were applied.
- `read_iceberg_table` (round-20 wave 3): the snapshot's live files
  read as an actual DataFrame through the native parquet scan —
  the end-to-end "read the table CORRECTLY" capability, twin of
  `read_delta_table`.

Safety laws (each pinned by a test):
- FORMAT GATE: `format-version` > 2 refuses (ValueError) — v3
  features (row lineage, binary deletion vectors) change row
  visibility.
- DELETE-MANIFEST GATE: a manifest list naming any DELETE manifest
  (`content` = 1 — v2 positional/equality deletes) refuses:
  reporting deleted rows as live is the silent wrongness this
  module exists to prevent. Honest refusal over wrong data (the
  Delta module's deletion-vector stance).
- MISSING SNAPSHOT: an explicit `snapshot_id` not present in the
  metadata raises (you cannot time-travel to an expired snapshot).
- Manifest I/O scale shape: the manifest LIST is metadata-sized
  (one row per manifest) and is collected driver-side to plan the
  fan-out — the `_read_last_checkpoint` argument; the MANIFESTS
  fan out as one binaryFile task each through
  `read_avro_records(list_of_paths)`, and a 100k-manifest table
  parallelizes across them. Data files are never touched.
- Manifest lists carrying the spec's optional `partitions`
  field-summary array, and manifests carrying column-stats k/v pair
  lists, decode natively since the round-20 Avro
  array<record-of-scalars> widening (pinned by a real-shape test);
  encodings beyond that scope still QUARANTINE as the Avro reader's
  error rows — stated honestly.

Fixture/test writers (`write_iceberg_metadata`, `write_manifest_list`,
`write_manifest`) emit spec-shaped files so every law is testable
without an Iceberg writer on the box.

The reference (src/sodaspark/scan.py:441-442) scans already-loaded
frames; lakehouse-tree introspection is additive surface.
"""

from __future__ import annotations

import json as _json
import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "iceberg_table_info",
    "iceberg_census",
    "iceberg_snapshot",
    "iceberg_history",
    "iceberg_delete_census",
    "read_iceberg_table",
    "write_iceberg_metadata",
    "write_manifest_list",
    "write_manifest",
]


def iceberg_table_info(table_dir: str) -> dict:
    """Driver-side parse of the table's CURRENT metadata JSON:
    `metadata/version-hint.text` names the version when present
    (Hadoop catalog layout), else the highest `v<N>.metadata.json`
    wins. Bytes-sized I/O — the snapshot pointers, never data."""
    import re

    from soda_spark_spark.sources.safetensors import (
        _open_input,
        _plan_files,
    )

    md_dir = table_dir.rstrip("/") + "/metadata"
    hint = None
    try:
        with _open_input(md_dir + "/version-hint.text") as f:
            hint = int(f.read().decode("ascii").strip())
    except (OSError, ValueError):
        pass
    if hint is not None:
        md_path = f"{md_dir}/v{hint}.metadata.json"
    else:
        best = None
        for p, _ in _plan_files(md_dir + "/*.metadata.json"):
            m = re.fullmatch(r"v(\d+)\.metadata\.json",
                             posixpath.basename(p))
            if m and (best is None or int(m.group(1)) > best[0]):
                best = (int(m.group(1)), p)
        if best is None:
            raise FileNotFoundError(
                f"no v<N>.metadata.json under {md_dir}"
            )
        md_path = best[1]
    with _open_input(md_path) as f:
        meta = _json.loads(f.read())
    if not isinstance(meta, dict) or "format-version" not in meta:
        raise ValueError(f"not an Iceberg metadata file: {md_path}")
    return meta


def _pick_snapshot(meta: dict, snapshot_id: int | None) -> dict:
    """The requested (or current) snapshot entry; raises for a
    format version this module does not implement and for expired/
    unknown snapshot ids — never a silent fallback."""
    fv = meta.get("format-version")
    if fv not in (1, 2):
        raise ValueError(
            f"unsupported Iceberg format-version={fv!r} (v3 row "
            "lineage / deletion vectors change row visibility; "
            "refusing rather than returning wrong data)"
        )
    snaps = meta.get("snapshots") or []
    if snapshot_id is None:
        snapshot_id = meta.get("current-snapshot-id")
        if snapshot_id in (None, -1):
            raise ValueError("table has no current snapshot")
    for s in snaps:
        if s.get("snapshot-id") == snapshot_id:
            if "manifest-list" not in s:
                raise ValueError(
                    "snapshot carries no manifest-list (the v1 "
                    "embedded-manifests layout is not implemented)"
                )
            return s
    raise ValueError(
        f"snapshot {snapshot_id} not in table metadata (expired or "
        "never existed; cannot time-travel to it)"
    )


def _read_manifest_list(spark: SparkSession, snap: dict) -> DataFrame:
    """The snapshot's manifest list as decoded Avro rows; a list
    whose header fails the driver-side schema election refuses with
    the honest corrupt-manifest-list message (a readable list with
    corrupt BLOCKS still flows through the reader's error rows and
    is caught by `iceberg_snapshot`'s collect-side check)."""
    from soda_spark_spark.sources.avro_ocf import read_avro_records

    try:
        return read_avro_records(spark, [snap["manifest-list"]])
    except ValueError as err:
        raise ValueError(
            f"corrupt manifest list {snap['manifest-list']}: {err}"
        ) from err


_ML_COLS = (
    ("manifest_path", "manifest_path", "string"),
    ("manifest_length", "manifest_length", "long"),
    ("partition_spec_id", "partition_spec_id", "int"),
    ("content", "content", "int"),
    ("added_snapshot_id", "added_snapshot_id", "long"),
    ("added_data_files_count", "added_files", "long"),
    ("existing_data_files_count", "existing_files", "long"),
    ("deleted_data_files_count", "deleted_files", "long"),
    ("added_rows_count", "added_rows", "long"),
    ("existing_rows_count", "existing_rows", "long"),
    ("deleted_rows_count", "deleted_rows", "long"),
)


def iceberg_census(
    spark: SparkSession,
    table_dir: str,
    *,
    snapshot_id: int | None = None,
) -> DataFrame:
    """One row per MANIFEST of the snapshot's manifest list (module
    contract): (manifest_path, manifest_length, partition_spec_id,
    content [0=data, 1=deletes], added_snapshot_id, added/existing/
    deleted file and row counts, error). The manifest list is ONE
    metadata-sized Avro file; a v1 list missing the v2-only columns
    surfaces them as nulls."""
    from soda_spark_spark.sources.avro_ocf import read_avro_records

    meta = iceberg_table_info(table_dir)
    snap = _pick_snapshot(meta, snapshot_id)
    ml = _read_manifest_list(spark, snap)
    cols = []
    for avro_name, out_name, ddl in _ML_COLS:
        if avro_name in ml.columns:
            cols.append(F.col(f"`{avro_name}`").cast(ddl)
                        .alias(out_name))
        else:
            cols.append(F.lit(None).cast(ddl).alias(out_name))
    return ml.select(*cols, "error")


def iceberg_snapshot(
    spark: SparkSession,
    table_dir: str,
    *,
    snapshot_id: int | None = None,
) -> DataFrame:
    """The LIVE data files of the snapshot (module contract):
    (manifest_path, status, file_path, file_format, record_count,
    file_size, partition_spec_id, plus any decoded
    `data_file.partition.*` columns, error) — every entry of every
    DATA manifest whose status != 2 (DELETED). Gates: format
    version, delete manifests (see module laws). One binaryFile
    task per manifest; data files are never read."""
    from soda_spark_spark.sources.avro_ocf import read_avro_records

    meta = iceberg_table_info(table_dir)
    snap = _pick_snapshot(meta, snapshot_id)
    ml = _read_manifest_list(spark, snap)
    # manifest list = one row per manifest: metadata-sized collect
    # (the _read_last_checkpoint argument); the fan-out below is per
    # manifest, which is where the real width lives
    mrows = ml.collect()
    bad = [r for r in mrows if r.error is not None]
    if bad:
        raise ValueError(
            f"corrupt manifest list {snap['manifest-list']}: "
            f"{bad[0].error}"
        )
    if "content" in ml.columns and any(
        (r["content"] or 0) == 1 for r in mrows
    ):
        raise ValueError(
            "snapshot carries DELETE manifests (content=1): "
            "positional/equality deletes change row visibility; "
            "refusing rather than returning deleted rows as live"
        )
    paths = [r["manifest_path"] for r in mrows]
    if not paths:
        raise ValueError("manifest list names no manifests")
    entries = read_avro_records(spark, sorted(paths))
    part_cols = [
        c for c in entries.columns
        if c.startswith("data_file.partition.")
    ]
    # manifest -> spec id: a BROADCAST join against the tiny
    # manifest-list frame (never a literal map — a 100k-manifest
    # table must not inline 100k literals into the plan). Joined on
    # the scheme-stripped path: binaryFile echoes `file:/...` URIs
    # while the manifest list stores whatever the writer stored.
    import re as _re

    def _canon(p: str) -> str:
        return "/" + _re.sub(r"^[a-z0-9+.-]+:/{0,2}", "", p,
                             flags=_re.I).lstrip("/")

    spec_df = spark.createDataFrame(
        [(_canon(r["manifest_path"]),
          None if r["partition_spec_id"] is None
          else int(r["partition_spec_id"]))
         for r in mrows],
        "_canon_path string, partition_spec_id int",
    )
    live = entries.where(
        F.col("error").isNotNull() | (F.col("status") != 2)
    )
    canon_col = F.concat(
        F.lit("/"),
        F.regexp_replace(
            F.regexp_replace(F.col("manifest_path"),
                             r"^[a-zA-Z0-9+.-]+:/{0,2}", ""),
            r"^/+", "",
        ),
    )
    return (
        live.withColumnRenamed("file", "manifest_path")
        .withColumn("_canon_path", canon_col)
        .join(F.broadcast(spec_df), "_canon_path", "left")
        .drop("_canon_path")
        .select(
            "manifest_path",
            F.col("status").cast("int").alias("status"),
            F.col("`data_file.file_path`").alias("file_path"),
            F.col("`data_file.file_format`").alias("file_format"),
            F.col("`data_file.record_count`").cast("long")
             .alias("record_count"),
            F.col("`data_file.file_size_in_bytes`").cast("long")
             .alias("file_size"),
            "partition_spec_id",
            *[F.col(f"`{c}`") for c in part_cols],
            "error",
        )
    )


# ---------------------------------------------------------------------------
# fixture/test writers — spec-shaped metadata without an Iceberg
# writer on the box
# ---------------------------------------------------------------------------


def write_iceberg_metadata(
    table_dir: str,
    snapshots: list[dict],
    *,
    current_snapshot_id: int | None = None,
    format_version: int = 2,
    version: int = 1,
) -> str:
    """Write `metadata/v<version>.metadata.json` (+
    `version-hint.text`). `snapshots` = [{"snapshot-id": int,
    "manifest-list": path, ...}]."""
    import os

    d = os.path.join(table_dir, "metadata")
    os.makedirs(d, exist_ok=True)
    if current_snapshot_id is None and snapshots:
        current_snapshot_id = snapshots[-1]["snapshot-id"]
    meta = {
        "format-version": format_version,
        "table-uuid": "00000000-0000-0000-0000-000000000000",
        "location": table_dir,
        "snapshots": snapshots,
        "current-snapshot-id": current_snapshot_id,
    }
    p = os.path.join(d, f"v{version}.metadata.json")
    with open(p, "w", encoding="utf-8") as f:
        _json.dump(meta, f)
    with open(os.path.join(d, "version-hint.text"), "w") as f:
        f.write(str(version))
    return p


_MANIFEST_LIST_SCHEMA = _json.dumps({
    "type": "record", "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "added_snapshot_id", "type": "long"},
        {"name": "added_data_files_count", "type": "int"},
        {"name": "existing_data_files_count", "type": "int"},
        {"name": "deleted_data_files_count", "type": "int"},
        {"name": "added_rows_count", "type": "long"},
        {"name": "existing_rows_count", "type": "long"},
        {"name": "deleted_rows_count", "type": "long"},
    ],
})


def write_manifest_list(path: str, manifests: list[dict]) -> str:
    """Write a manifest-list Avro file: `manifests` = [{
    manifest_path, manifest_length, partition_spec_id, content,
    added_snapshot_id, added_data_files_count,
    existing_data_files_count, deleted_data_files_count,
    added_rows_count, existing_rows_count, deleted_rows_count}]
    (spec fields 500-514)."""
    from soda_spark_spark.sources.avro_ocf import write_avro

    write_avro(manifests, _MANIFEST_LIST_SCHEMA, path)
    return path


def _manifest_schema(partition_fields: list[tuple[str, str]]):
    return _json.dumps({
        "type": "record", "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {"name": "snapshot_id", "type": ["null", "long"],
             "default": None},
            {"name": "data_file", "type": {
                "type": "record", "name": "r102",
                "fields": [
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "partition", "type": {
                        "type": "record", "name": "r103",
                        "fields": [
                            {"name": n, "type": t}
                            for n, t in partition_fields
                        ]}},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                ]}},
        ],
    })


def write_manifest(
    path: str,
    entries: list[dict],
    *,
    partition_fields: list[tuple[str, str]] = (("p", "int"),),
) -> str:
    """Write a manifest Avro file: `entries` = [{status, snapshot_id,
    data_file: {file_path, file_format, partition: {...},
    record_count, file_size_in_bytes}}] (spec manifest-entry
    shape)."""
    from soda_spark_spark.sources.avro_ocf import write_avro

    write_avro(
        entries, _manifest_schema(list(partition_fields)), path
    )
    return path


def iceberg_history(spark: SparkSession, table_dir: str) -> DataFrame:
    """One row per SNAPSHOT in the table metadata (module contract):
    (snapshot_id, parent_snapshot_id, timestamp_ms, operation,
    added_data_files, deleted_data_files, added_records,
    deleted_records, is_current, manifest_list) — the table's commit
    lineage, the `delta_log_census` analogue for the metadata-tree
    format. The snapshots list lives INSIDE the bytes-sized metadata
    JSON (spec: table metadata carries the full retained snapshot
    log), so this is a driver-side parse surfaced as a DataFrame —
    the `_last_checkpoint` argument; there is nothing to fan out
    until a snapshot's manifests are opened (`iceberg_census`).
    Summary counters absent from a writer's summary map surface as
    nulls, never invented."""
    meta = iceberg_table_info(table_dir)
    fv = meta.get("format-version")
    if fv not in (1, 2):
        raise ValueError(
            f"unsupported Iceberg format-version={fv!r}"
        )
    cur = meta.get("current-snapshot-id")
    rows = []
    for s in meta.get("snapshots") or []:
        summ = s.get("summary") or {}

        def n(key):
            v = summ.get(key)
            try:
                return None if v is None else int(v)
            except (TypeError, ValueError):
                return None

        rows.append((
            int(s["snapshot-id"]),
            None if s.get("parent-snapshot-id") is None
            else int(s["parent-snapshot-id"]),
            None if s.get("timestamp-ms") is None
            else int(s["timestamp-ms"]),
            summ.get("operation"),
            n("added-data-files"), n("deleted-data-files"),
            n("added-records"), n("deleted-records"),
            s.get("snapshot-id") == cur,
            s.get("manifest-list"),
        ))
    return spark.createDataFrame(rows, (
        "snapshot_id long, parent_snapshot_id long,"
        " timestamp_ms long, operation string,"
        " added_data_files long, deleted_data_files long,"
        " added_records long, deleted_records long,"
        " is_current boolean, manifest_list string"
    ))


def iceberg_delete_census(
    spark: SparkSession,
    table_dir: str,
    *,
    snapshot_id: int | None = None,
) -> DataFrame:
    """One row per entry of every DELETE manifest (content=1) of the
    snapshot: (manifest_path, status, file_path, file_format,
    record_count [= number of delete rows], file_size, error) — the
    visibility side of the DELETE-MANIFEST GATE. `iceberg_snapshot`
    REFUSES delete-bearing snapshots because a file-level liveness
    answer cannot reflect row-level deletes; this census is how a
    caller sees WHAT those deletes are (how many delete files, how
    many deleted rows, where) without anyone pretending the rows
    were applied. A snapshot with no delete manifests returns an
    empty frame. Same scale shape as `iceberg_snapshot`: the
    metadata-sized manifest list plans the fan-out, one task per
    delete manifest."""
    from soda_spark_spark.sources.avro_ocf import read_avro_records

    meta = iceberg_table_info(table_dir)
    snap = _pick_snapshot(meta, snapshot_id)
    ml = _read_manifest_list(spark, snap)
    mrows = ml.collect()
    bad = [r for r in mrows if r.error is not None]
    if bad:
        raise ValueError(
            f"corrupt manifest list {snap['manifest-list']}: "
            f"{bad[0].error}"
        )
    paths = sorted(
        r["manifest_path"] for r in mrows
        if (r["content"] or 0) == 1
    )
    empty_schema = (
        "manifest_path string, status int, file_path string,"
        " file_format string, record_count long, file_size long,"
        " error string"
    )
    if not paths:
        return spark.createDataFrame([], empty_schema)
    entries = read_avro_records(spark, paths)
    return entries.select(
        F.col("file").alias("manifest_path"),
        F.col("status").cast("int").alias("status"),
        F.col("`data_file.file_path`").alias("file_path"),
        F.col("`data_file.file_format`").alias("file_format"),
        F.col("`data_file.record_count`").cast("long")
         .alias("record_count"),
        F.col("`data_file.file_size_in_bytes`").cast("long")
         .alias("file_size"),
        "error",
    )


def read_iceberg_table(
    spark: SparkSession,
    table_dir: str,
    *,
    snapshot_id: int | None = None,
) -> DataFrame:
    """The table's DATA as a DataFrame — `iceberg_snapshot`'s
    live-file set read natively with `spark.read.parquet` (round-20
    wave 3, the `read_delta_table` twin: a raw directory read
    double-counts files deleted or rewritten by later snapshots).

    Scale shape: the live PATH LIST materializes on the driver —
    file-count-sized, what every Iceberg reader's planner holds —
    and the data flows through the native parquet scan (columnar
    pruning/pushdown intact, no Python). Every `iceberg_snapshot`
    gate runs first (format version, DELETE manifests, corrupt
    lists/manifests — a snapshot with a quarantined manifest
    REFUSES here: a partial table read is silently wrong, the thing
    this module exists to prevent). Data-file paths are used as the
    manifests store them (absolute URIs per spec), with bare
    relative paths resolved against the table root — the fixture
    layout. Hive-style partition directories surface as partition
    columns via `basePath` when the files live under the table root;
    non-parquet file_formats refuse (ORC/Avro data files are out of
    this module's committed scope)."""
    snap = iceberg_snapshot(
        spark, table_dir, snapshot_id=snapshot_id
    ).select("file_path", "file_format", "error").collect()
    bad = [r for r in snap if r.error is not None]
    if bad:
        raise ValueError(
            "snapshot has quarantined manifest entries; a partial "
            f"table read would be silently wrong: {bad[0].error}"
        )
    fmts = {(r.file_format or "").upper() for r in snap}
    if fmts - {"PARQUET"}:
        raise ValueError(
            f"unsupported data file formats {sorted(fmts - {'PARQUET'})} "
            "(only PARQUET data files are in scope)"
        )
    base = table_dir.rstrip("/")

    def resolve(p: str) -> str:
        if "://" in p or p.startswith("/"):
            return p
        return base + "/" + p

    paths = sorted({resolve(r.file_path) for r in snap})
    if not paths:
        raise ValueError(
            "snapshot has no live files; the table schema is not "
            "reconstructible from data (the metadata JSON's schema "
            "field is deliberately not interpreted here)"
        )
    return spark.read.option("basePath", base).parquet(*paths)
