"""Delta Lake transaction-log reader — commit census + snapshot
reconstruction, from the PUBLIC protocol spec alone.

A data lake at 100 TB is almost never bare parquet: it's a lakehouse
table whose truth is the `_delta_log/` transaction log (Delta
PROTOCOL.md, github.com/delta-io/delta — versioned JSON commits
`<20-digit version>.json` of single-action lines, periodically
compacted into `<version>.checkpoint.parquet` plus a `_last_checkpoint`
pointer). Reading the DATA without replaying the LOG is wrong: dead
files (compacted away, deleted, or replaced) still sit in the
directory, and a raw `spark.read.parquet(table_dir)` double-counts
them. These operators make the log itself a first-class input:

- `read_delta_log`: one row per ACTION across the JSON commits —
  the census primitive (who added/removed what, when, how big). The
  log is metadata (KBs per commit), so one task per commit file is
  the right granule; a corrupt line quarantines as one error row
  carrying its (version, seq) position.
- `delta_snapshot`: the ACTIVE file set at a version — the latest
  checkpoint at-or-below the requested version read NATIVELY
  (`spark.read.parquet`, columnar, predicate-pushdown-friendly: a
  million-file table's checkpoint is GBs and must not funnel through
  Python), unioned with the JSON tail, reconciled per-path by
  last-writer-wins (version, then line order) — the protocol's
  reconstruction rule. `checkpoint=False` replays JSON from zero;
  the two paths are row-for-row equal (pytest-pinned).
- `read_delta_table` (round-20 wave 3): the snapshot's live files
  read as an actual DataFrame through the native parquet scan with
  `basePath` partition inference — the end-to-end "read the table
  CORRECTLY" capability the two primitives exist for.

Safety laws (each pinned by a test):
- PROTOCOL GATE: `delta_snapshot` REFUSES (ValueError) a log whose
  `protocol` action demands minReaderVersion > 1 or names reader
  features (deletion vectors, column mapping): silently ignoring a
  deletion vector returns deleted rows as live. Honest refusal over
  wrong data. The gate examines the UNION of protocol assertions —
  the JSON commit lines AND the checkpoint parquet's protocol rows
  (real checkpoints are complete snapshots and always carry the
  protocol action) — and runs even when log retention has removed
  every JSON commit, so a reader-v2+ table whose commit-0 JSON is
  gone still refuses (round 20).
- PATH DECODING: `add.path`/`remove.path` are URI-encoded relative
  paths (spec); decoded exactly once.
- LAST-WRITER-WINS: per path, the action with the highest
  (version, seq) decides liveness. A checkpoint at version V is the
  COMPLETE state at V (spec), so the JSON tail replays versions
  STRICTLY greater than V; checkpoint entries carry seq = -1 purely
  as a stable tiebreak.
- TIME TRAVEL below the last checkpoint falls back to the JSON
  replay and raises (ValueError) if version-0 JSON is gone (the
  protocol's own limit: you cannot reconstruct below your oldest
  retained log) — the same completeness check guards every
  pure-JSON replay, including `checkpoint=False` (round 20).

The reference (src/sodaspark/scan.py:441-442) takes whatever
DataFrame the caller hands in; lakehouse-log introspection is
additive surface.
"""

from __future__ import annotations

import json as _json

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = [
    "read_delta_log",
    "delta_snapshot",
    "read_delta_table",
    "write_delta_commit",
    "write_delta_checkpoint",
]

DELTA_ACTION_SCHEMA = (
    "version long, seq int, kind string, path string, size long,"
    " num_records long, partition_values map<string,string>,"
    " data_change boolean, ts long, min_reader int, error string"
)

_KINDS = ("add", "remove", "metaData", "protocol", "commitInfo",
          "txn", "cdc", "domainMetadata")


def _plan_commits(table_dir: str, version: int | None):
    """Driver-side plan: sorted [(file, version)] for the JSON
    commits at-or-below `version` (None = all). Metadata-only (file
    listing); raises FileNotFoundError when the table has no log."""
    import posixpath
    import re

    from soda_spark_spark.sources.safetensors import _plan_files

    log_glob = table_dir.rstrip("/") + "/_delta_log/*.json"
    out = []
    for p, _ in _plan_files(log_glob):
        name = posixpath.basename(p)
        m = re.fullmatch(r"(\d{20})\.json", name)
        if not m:
            continue  # _last_checkpoint & friends
        v = int(m.group(1))
        if version is None or v <= version:
            out.append((p, v))
    if not out:
        raise FileNotFoundError(
            f"no Delta JSON commits under {table_dir}/_delta_log"
            + (f" at version <= {version}" if version is not None
               else "")
        )
    return sorted(out, key=lambda t: t[1])


def read_delta_log(
    spark: SparkSession,
    table_dir: str,
    *,
    version: int | None = None,
) -> DataFrame:
    """One row per action line across the JSON commits of
    `table_dir/_delta_log` at-or-below `version` (module contract).
    One task per commit file — commits are metadata-sized. A corrupt
    line is ONE error row at its (version, seq)."""
    from urllib.parse import unquote

    plan = _plan_commits(table_dir, version)
    plan_df = spark.createDataFrame(
        plan, "file string, version long"
    ).repartition(max(len(plan), 1))

    def run(batches):
        import pandas as pd

        from soda_spark_spark.sources.safetensors import _open_input

        for pdf in batches:
            rows = []
            for fname, ver in zip(pdf["file"], pdf["version"]):
                ver = int(ver)
                try:
                    with _open_input(fname) as f:
                        data = f.read()
                except OSError as err:
                    rows.append((
                        ver, None, None, None, None, None, None,
                        None, None, None,
                        f"bad delta commit: {err}"[:500],
                    ))
                    continue
                for seq, line in enumerate(
                    data.decode("utf-8", "replace").splitlines()
                ):
                    if not line.strip():
                        continue
                    try:
                        act = _json.loads(line)
                        kind = next(
                            (k for k in _KINDS if k in act), "other"
                        )
                        body = act.get(kind, {})
                        path = size = nrec = pv = dc = ts = mr = None
                        if kind in ("add", "remove", "cdc"):
                            path = unquote(body["path"])
                            size = body.get("size")
                            pv = body.get("partitionValues")
                            dc = body.get("dataChange")
                            ts = body.get(
                                "modificationTime",
                                body.get("deletionTimestamp"),
                            )
                            stats = body.get("stats")
                            if stats:
                                nrec = _json.loads(stats).get(
                                    "numRecords"
                                )
                        elif kind == "protocol":
                            mr = body.get("minReaderVersion", 1)
                            if body.get("readerFeatures"):
                                # reader features exist only at
                                # minReaderVersion 3 (spec); pin the
                                # floor so the snapshot gate fires
                                # even on a non-compliant writer
                                mr = max(int(mr), 3)
                        elif kind == "commitInfo":
                            ts = body.get("timestamp")
                        rows.append((
                            ver, seq, kind, path,
                            None if size is None else int(size),
                            None if nrec is None else int(nrec),
                            pv, dc,
                            None if ts is None else int(ts),
                            None if mr is None else int(mr),
                            None,
                        ))
                    except (ValueError, KeyError, TypeError) as err:
                        rows.append((
                            ver, seq, None, None, None, None, None,
                            None, None, None,
                            f"bad delta action: {err}"[:500],
                        ))
            out = pd.DataFrame(rows, columns=[
                "version", "seq", "kind", "path", "size",
                "num_records", "partition_values", "data_change",
                "ts", "min_reader", "error",
            ])
            for c, d in (("seq", "Int32"), ("size", "Int64"),
                         ("num_records", "Int64"), ("ts", "Int64"),
                         ("min_reader", "Int32")):
                out[c] = pd.array(out[c], dtype=d)
            yield out

    return plan_df.select("file", "version").mapInPandas(
        run, schema=DELTA_ACTION_SCHEMA
    )


def _read_last_checkpoint(table_dir: str) -> int | None:
    """Driver-side read of `_last_checkpoint` (a one-line JSON
    pointer, bytes not MBs). None when absent. Multi-part
    checkpoints (`parts` > 1) are globbed by the caller."""
    from soda_spark_spark.sources.safetensors import _open_input

    p = table_dir.rstrip("/") + "/_delta_log/_last_checkpoint"
    try:
        with _open_input(p) as f:
            return int(_json.loads(f.read())["version"])
    except (OSError, ValueError, KeyError):
        return None


def _checkpoint_protocol_agg(cp: DataFrame) -> DataFrame | None:
    """ONE-ROW aggregate frame of the max effective minReaderVersion
    asserted by the checkpoint's `protocol` rows (None when the
    checkpoint carries no protocol column — only this module's own
    minimal test fixtures; real checkpoints are complete snapshots and
    always carry the protocol action, spec §Checkpoints).
    readerFeatures floors the value to 3 exactly like the JSON-line
    parse — the gate must fire off the checkpoint alone, because log
    retention routinely deletes the commit-0 JSON where the protocol
    action originally lived. Returned lazy so `_protocol_gate` can
    evaluate it in the SAME job as the JSON-line aggregate."""
    if "protocol" not in cp.columns:
        return None
    prot_fields = {f.name for f in cp.schema["protocol"].dataType.fields}
    if "minReaderVersion" not in prot_fields:
        return None
    mr = F.coalesce(
        F.col("protocol.minReaderVersion").cast("int"), F.lit(1)
    )
    if "readerFeatures" in prot_fields:
        feats = F.col("protocol.readerFeatures")
        mr = F.when(
            feats.isNotNull() & (F.size(feats) > 0),
            F.greatest(mr, F.lit(3)),
        ).otherwise(mr)
    return (
        cp.where(F.col("protocol").isNotNull())
        .agg(F.max(mr).alias("mr_cp"))
    )


def _checkpoint_min_reader(cp: DataFrame) -> int | None:
    """Collected form of `_checkpoint_protocol_agg` (compat surface)."""
    agg = _checkpoint_protocol_agg(cp)
    if agg is None:
        return None
    row = agg.collect()[0]
    return None if row.mr_cp is None else int(row.mr_cp)


def _protocol_gate(actions: DataFrame | None,
                   cp: DataFrame | None = None) -> None:
    """Refuse tables whose reader requirements exceed what this
    module implements (minReaderVersion > 1, which includes every
    readerFeatures table — deletion vectors, column mapping):
    ignoring a deletion vector silently returns deleted rows as
    live. The gate examines the UNION of protocol assertions: the
    JSON commit lines (`actions`, None when retention cleaned every
    JSON) and the checkpoint parquet's protocol rows (`cp`) — a
    protocol action carried only by the checkpoint must still
    refuse. Distributed aggregation over the already-planned action
    frame (commit files are metadata-sized; the gate must not
    serialize them through the driver); the JSON-line and checkpoint
    aggregates are crossJoined so both tiny subtrees evaluate in ONE
    eager job instead of two back-to-back."""
    mr_json = bad = mr_cp = None
    a = None
    if actions is not None:
        a = actions.agg(
            F.max("min_reader").alias("mr_json"),
            F.max(F.col("error").isNotNull().cast("int")).alias("bad"),
        )
    c = _checkpoint_protocol_agg(cp) if cp is not None else None
    if a is not None and c is not None:
        row = a.crossJoin(c).collect()[0]
    elif a is not None:
        row = a.collect()[0]
    elif c is not None:
        row = c.collect()[0]
    else:
        return
    d = row.asDict()
    mr_json, bad = d.get("mr_json"), d.get("bad")
    mr_cp = d.get("mr_cp")
    if mr_cp is not None:
        mr_cp = int(mr_cp)
    mr = max(
        (v for v in (mr_json, mr_cp) if v is not None),
        default=None,
    )
    if mr is not None and mr > 1:
        raise ValueError(
            "unsupported Delta reader requirements: "
            f"minReaderVersion={mr} (deletion vectors / column "
            "mapping change row visibility; refusing rather than "
            "returning wrong data)"
        )
    if bad:
        raise ValueError(
            "corrupt Delta log: at least one action line failed to "
            "parse; a snapshot reconstructed from a damaged log "
            "would be silently wrong (inspect with read_delta_log)"
        )


def delta_snapshot(
    spark: SparkSession,
    table_dir: str,
    *,
    version: int | None = None,
    checkpoint: bool = True,
) -> DataFrame:
    """The ACTIVE data files of the table at `version` (None =
    latest): (path, size, num_records, partition_values,
    asserted_version) — module contract. `asserted_version` is the
    newest commit that asserted the file live: the adding commit on
    a JSON replay, but the CHECKPOINT version for files carried by a
    checkpoint — the spec's checkpoint drops add-provenance (no
    original version field in the add action schema), so the
    checkpoint is the log's information horizon and this module
    reports that honestly rather than inventing provenance. All
    OTHER columns are row-for-row equal between the checkpoint and
    pure-JSON paths (pytest-pinned). Uses the newest checkpoint
    at-or-below `version` when `checkpoint=True` and one exists
    (read natively with `spark.read.parquet` — the scale channel for
    million-file tables), replaying only the JSON tail past it."""
    cp_version = _read_last_checkpoint(table_dir) if checkpoint else None
    if (cp_version is not None and version is not None
            and cp_version > version):
        cp_version = None  # time travel below the checkpoint

    try:
        log = read_delta_log(spark, table_dir, version=version)
    except FileNotFoundError:
        if cp_version is None:
            raise
        # log-retention cleaned every JSON at-or-below the
        # checkpoint and nothing committed since: the checkpoint
        # alone IS the snapshot
        log = None

    cp = None
    if cp_version is not None:
        cp_glob = (
            table_dir.rstrip("/")
            + f"/_delta_log/{cp_version:020d}.checkpoint*.parquet"
        )
        cp = spark.read.parquet(cp_glob)
    elif log is not None:
        # pure-JSON replay: the reconstruction is only complete if
        # the log reaches version 0 (no checkpoint covers the gap) —
        # the module's TIME TRAVEL law. Metadata-only listing.
        oldest = _plan_commits(table_dir, version)[0][1]
        if oldest != 0:
            raise ValueError(
                "incomplete Delta log: oldest JSON commit is version "
                f"{oldest} and no checkpoint covers versions below it "
                "(log retention removed early commits); a snapshot "
                "replayed from here would silently drop their adds"
            )
    # the decoded action frame is metadata-sized (module contract) and
    # is consumed twice — by the protocol gate's eager aggregate and by
    # the returned snapshot plan — so persist it for the call's
    # duration: the JSON commits are fetched and parsed ONCE, not once
    # per consumer. The handle rides the returned frame as
    # `_cached_log` (the perplexity_buckets `_cached_scores` pattern):
    # long-lived sessions may unpersist after materializing.
    if log is not None:
        from pyspark.storagelevel import StorageLevel

        log = log.persist(StorageLevel.MEMORY_AND_DISK)

    # the gate examines the UNION of protocol assertions — JSON
    # lines AND the checkpoint's protocol rows — and must run even
    # when retention cleaned every JSON commit (log=None)
    try:
        _protocol_gate(log, cp)
    except Exception:
        if log is not None:
            log.unpersist()
        raise

    parts = []
    if cp is not None:
        adds = cp.where(F.col("add.path").isNotNull()).select(
            F.lit(cp_version).cast("long").alias("version"),
            F.lit(-1).alias("seq"),
            F.lit("add").alias("kind"),
            F.url_decode(F.col("add.path")).alias("path"),
            F.col("add.size").cast("long").alias("size"),
            F.get_json_object(F.col("add.stats"), "$.numRecords")
             .cast("long").alias("num_records"),
            F.col("add.partitionValues").alias("partition_values"),
        )
        removes = cp.where(F.col("remove.path").isNotNull()).select(
            F.lit(cp_version).cast("long").alias("version"),
            F.lit(-1).alias("seq"),
            F.lit("remove").alias("kind"),
            F.url_decode(F.col("remove.path")).alias("path"),
            F.lit(None).cast("long").alias("size"),
            F.lit(None).cast("long").alias("num_records"),
            F.lit(None).cast("map<string,string>")
             .alias("partition_values"),
        )
        parts.append(adds.unionByName(removes))

    if log is not None:
        tail = log.where(F.col("kind").isin("add", "remove"))
        if cp_version is not None:
            tail = tail.where(F.col("version") > cp_version)
        parts.append(tail.select(
            "version", F.col("seq").cast("int").alias("seq"),
            "kind", "path", "size", "num_records",
            "partition_values",
        ))

    acts = parts[0]
    for p in parts[1:]:
        acts = acts.unionByName(p)

    w = Window.partitionBy("path").orderBy(
        F.col("version").desc(), F.col("seq").desc()
    )
    latest = (
        acts.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("kind") == "add"))
    )
    out = latest.select(
        "path", "size", "num_records", "partition_values",
        F.col("version").alias("asserted_version"),
    )
    out._cached_log = log  # caller-owned persist handle (may be None)
    return out


def write_delta_commit(table_dir: str, version: int, actions) -> str:
    """Write one JSON commit (`actions` = list of single-action
    dicts, spec shape) as `_delta_log/<version>.json`. Local paths —
    the fixture/test writer."""
    import os

    d = os.path.join(table_dir, "_delta_log")
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, f"{version:020d}.json")
    with open(p, "w", encoding="utf-8") as f:
        for a in actions:
            f.write(_json.dumps(a) + "\n")
    return p


def write_delta_checkpoint(table_dir: str, version: int,
                           adds, removes=(), *,
                           protocol=None) -> str:
    """Write `<version>.checkpoint.parquet` (+ `_last_checkpoint`)
    holding `adds` = [(path, size, stats_json_or_None, partition_values
    dict)] and `removes` = [path]. `protocol`, when given, is
    (minReaderVersion, [readerFeatures...]) written as one protocol
    row — real checkpoints always carry one (they are complete
    snapshots, spec §Checkpoints). Spec columns only as far as this
    module reads them — the fixture/test writer."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    add_t = pa.struct([
        ("path", pa.string()), ("size", pa.int64()),
        ("stats", pa.string()),
        ("partitionValues", pa.map_(pa.string(), pa.string())),
    ])
    rem_t = pa.struct([("path", pa.string())])
    prot_t = pa.struct([
        ("minReaderVersion", pa.int32()),
        ("readerFeatures", pa.list_(pa.string())),
    ])
    add_col, rem_col, prot_col = [], [], []
    for path, size, stats, pv in adds:
        add_col.append({
            "path": path, "size": size, "stats": stats,
            "partitionValues": sorted((pv or {}).items()),
        })
        rem_col.append(None)
        prot_col.append(None)
    for path in removes:
        add_col.append(None)
        rem_col.append({"path": path})
        prot_col.append(None)
    cols = {
        "add": pa.array(add_col, add_t),
        "remove": pa.array(rem_col, rem_t),
    }
    if protocol is not None:
        mr, feats = protocol
        add_col.append(None)
        rem_col.append(None)
        prot_col.append({
            "minReaderVersion": mr,
            "readerFeatures": list(feats) if feats else None,
        })
        cols = {
            "add": pa.array(add_col, add_t),
            "remove": pa.array(rem_col, rem_t),
            "protocol": pa.array(prot_col, prot_t),
        }
    t = pa.table(cols)
    d = os.path.join(table_dir, "_delta_log")
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, f"{version:020d}.checkpoint.parquet")
    pq.write_table(t, p)
    with open(os.path.join(d, "_last_checkpoint"), "w") as f:
        f.write(_json.dumps({"version": version, "size": len(adds)}))
    return p


def read_delta_table(
    spark: SparkSession,
    table_dir: str,
    *,
    version: int | None = None,
    checkpoint: bool = True,
) -> DataFrame:
    """The table's DATA as a DataFrame — `delta_snapshot`'s live-file
    set read natively with `spark.read.parquet` (round-20 wave 3:
    the reason snapshot reconstruction exists; a raw
    `spark.read.parquet(table_dir)` double-counts every dead file
    still sitting in the directory).

    Scale shape: the live PATH LIST materializes on the driver —
    file-count-sized, exactly what every Delta reader's planner
    holds (the Spark DataSource keeps the same list to plan splits);
    the DATA then flows through the native parquet scan with full
    columnar pruning/pushdown, never through Python. Hive-style
    partition directories (`p=0/...`) surface as partition columns
    via `basePath`, matching how Delta writers lay files out. All of
    `delta_snapshot`'s gates (protocol, commit-0 completeness,
    corrupt log) run first — refusal beats wrong rows. An empty
    snapshot raises: this module cannot know the table schema
    without a file (schema lives in metaData, whose schemaString is
    deliberately not interpreted here — stated scope)."""
    snap = delta_snapshot(
        spark, table_dir, version=version, checkpoint=checkpoint
    )
    base = table_dir.rstrip("/")
    try:
        paths = sorted(
            base + "/" + r.path for r in snap.select("path").collect()
        )
    finally:
        # the collect fully materialized the snapshot: the decoded
        # action frame persisted inside `delta_snapshot` has served both
        # its consumers (gate + replay) and the returned parquet reader
        # never references it — release the handle so long-lived
        # sessions don't accumulate InMemoryRelations (the snapshot
        # API itself keeps the handle alive because its RETURNED plan
        # still reads from it).
        if snap._cached_log is not None:
            snap._cached_log.unpersist()
    if not paths:
        raise ValueError(
            "snapshot has no live files; the table schema is not "
            "reconstructible from data (metaData.schemaString is "
            "out of this module's scope)"
        )
    return spark.read.option("basePath", base).parquet(*paths)
