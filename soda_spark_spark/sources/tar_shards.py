"""WebDataset-style tar-shard reader — the on-disk shape multimodal
training corpora actually ship in (image/caption/metadata files grouped
by a shared basename inside sequentially-read tar shards; Weber et al.,
the webdataset convention). No external library: stdlib `tarfile` over
an in-memory buffer inside an Arrow `mapInPandas` pass.

Parallelism model: one tar shard = one task (`binaryFile` source), the
sharding the convention is FOR — a corpus ships as thousands of ~1 GB
.tar files, so a 1000-executor cluster saturates on file-level
parallelism and every shard streams sequentially (the whole point of
tar over per-sample object storage). Each shard must fit in a task
(binaryFile contract); `.tar.gz` members gunzip with stdlib gzip.

Row model: one row per tar MEMBER — (file, member, key, ext, n_bytes,
payload, error). `key`/`ext` split on the FIRST dot of the basename
(webdataset groups `000123.jpg` + `000123.txt` + `000123.json` under
key '000123'; extensions like 'seg.png' stay whole in `ext`).
`group_samples` pivots members into one row per SAMPLE with a
map<ext, payload> — the shape a training loader consumes. A corrupt
shard surfaces as one error row (the WARC/multimodal quarantine
contract) instead of vanishing.

Certified by the `tar_ingest` registry row: documents -> tar shards
(text + json members per sample, `write_tar_shard` twin) -> re-read ->
regroup, hash-exact against deriving the same rows from the table.

Reference anchor: the reference (src/sodaspark/scan.py:424-474) scans
already-loaded DataFrames; ingestion is additive surface, like
sources/warc.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TAR_SCHEMA = (
    "file string, member string, key string, ext string, "
    "n_bytes long, payload binary, error string"
)


def _member_name(name: str) -> str:
    """Normalize a member name for the Arrow string channel: tarfile
    decodes POSIX names with surrogateescape, and lone surrogates
    crash the pandas -> Arrow conversion (a task failure, not a
    quarantine row). Re-encode undecodable bytes as U+FFFD instead."""
    try:
        name.encode("utf-8")
        return name
    except UnicodeEncodeError:
        # recover the original raw bytes, then decode them lossily —
        # each undecodable byte becomes U+FFFD (not '?': encode-side
        # 'replace' would lose the replacement-character convention)
        return name.encode("utf-8", "surrogateescape").decode(
            "utf-8", "replace"
        )


def _split_member(name: str) -> tuple[str, str]:
    """webdataset key/ext split: basename up to the FIRST dot is the
    sample key, the rest (dots preserved) is the extension."""
    base = name.rsplit("/", 1)[-1]
    key, dot, ext = base.partition(".")
    prefix = name[: len(name) - len(base)]
    return prefix + key, ext if dot else ""


def read_tar_shards(
    spark: SparkSession,
    path: str,
    *,
    exts: list[str] | None = None,
) -> DataFrame:
    """Read tar shard(s) at `path` (glob ok; `.gz`/`.tgz` names are
    gunzipped with stdlib gzip) into one row per regular tar member:
    (file, member, key, ext, n_bytes, payload, error). Directories and
    special entries are skipped; a shard whose tar structure cannot be
    parsed yields ONE row with `error` set (quarantine — filter or
    alert, never silently vanish). `exts` keeps only the named
    extensions (applied AFTER parsing, so error rows always survive).
    Pair with `group_samples` for the one-row-per-sample shape."""
    src = spark.read.format("binaryFile").load(path)

    def run(batches):
        import gzip
        import io
        import tarfile

        import pandas as pd

        for pdf in batches:
            out = []
            for fname, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if fname.endswith((".gz", ".tgz")):
                    try:
                        data = gzip.decompress(data)
                    except OSError as e:
                        out.append(dict(
                            file=fname, member=None, key=None, ext=None,
                            n_bytes=None, payload=None,
                            error=f"bad gzip: {e}",
                        ))
                        continue
                try:
                    with tarfile.open(
                        fileobj=io.BytesIO(data), mode="r:"
                    ) as tf:
                        for m in tf:
                            if not m.isreg():
                                continue
                            f = tf.extractfile(m)
                            payload = f.read() if f is not None else b""
                            name = _member_name(m.name)
                            key, ext = _split_member(name)
                            out.append(dict(
                                file=fname, member=name, key=key,
                                ext=ext, n_bytes=len(payload),
                                payload=payload, error=None,
                            ))
                except tarfile.TarError as e:
                    out.append(dict(
                        file=fname, member=None, key=None, ext=None,
                        n_bytes=None, payload=None,
                        error=f"bad tar: {e}",
                    ))
            if out:
                yield pd.DataFrame(out)

    parsed = src.select("path", "content").mapInPandas(
        run, schema=TAR_SCHEMA
    )
    if exts is not None:
        parsed = parsed.filter(
            F.col("ext").isin(list(exts)) | F.col("error").isNotNull()
        )
    return parsed


def read_zip_shards(
    spark: SparkSession,
    path: str,
    *,
    exts: list[str] | None = None,
) -> DataFrame:
    """ZIP-shard twin of `read_tar_shards` (stdlib `zipfile`; some
    corpora ship zip instead of tar): same one-shard-per-task model,
    same (file, member, key, ext, n_bytes, payload, error) rows, same
    quarantine contract (a bad archive or a member failing CRC/
    decompression yields an error row), composable with
    `group_samples`. Encrypted members quarantine rather than fail the
    shard."""
    src = spark.read.format("binaryFile").load(path)

    def run(batches):
        import io
        import zipfile

        import pandas as pd

        for pdf in batches:
            out = []
            for fname, content in zip(pdf["path"], pdf["content"]):
                try:
                    zf = zipfile.ZipFile(io.BytesIO(bytes(content)))
                except Exception as e:  # noqa: BLE001 — quarantine
                    out.append(dict(
                        file=fname, member=None, key=None, ext=None,
                        n_bytes=None, payload=None,
                        error=f"bad zip: {e}",
                    ))
                    continue
                with zf:
                    for info in zf.infolist():
                        if info.is_dir():
                            continue
                        name = _member_name(info.filename)
                        key, ext = _split_member(name)
                        try:
                            payload = zf.read(info)
                        except Exception as e:  # noqa: BLE001
                            out.append(dict(
                                file=fname, member=name,
                                key=key, ext=ext, n_bytes=None,
                                payload=None,
                                error=f"bad member: {e}",
                            ))
                            continue
                        out.append(dict(
                            file=fname, member=name, key=key,
                            ext=ext, n_bytes=len(payload),
                            payload=payload, error=None,
                        ))
            if out:
                yield pd.DataFrame(out)

    parsed = src.select("path", "content").mapInPandas(
        run, schema=TAR_SCHEMA
    )
    if exts is not None:
        parsed = parsed.filter(
            F.col("ext").isin(list(exts)) | F.col("error").isNotNull()
        )
    return parsed


def group_samples(
    members: DataFrame,
    *,
    exts: list[str] | None = None,
) -> DataFrame:
    """Pivot a `read_tar_shards` member table into one row per SAMPLE:
    (file, key, parts map<ext, payload>) — the shape a training loader
    consumes (parts['jpg'], parts['txt'], parts['json']...). Error
    rows are excluded (they carry no key) — quarantine them off the
    member table first. One hash shuffle on (file, key); duplicate
    (key, ext) entries — tar permits identical member names — keep
    ONE deterministic member (min by member name then payload) rather
    than tripping Spark's duplicate-map-key exception.
    `exts` optionally restricts which extensions are collected."""
    m = members.filter(F.col("error").isNull())
    if exts is not None:
        m = m.filter(F.col("ext").isin(list(exts)))
    one = m.groupBy("file", "key", "ext").agg(
        F.min(F.struct("member", "payload")).alias("__m")
    )
    return (
        one.groupBy("file", "key")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("ext", F.col("__m.payload")))
            ).alias("parts")
        )
    )


def write_tar_shards(
    df: DataFrame,
    path: str,
    *,
    shard_col: str = "shard_id",
    member_col: str = "member",
    payload_col: str = "payload",
    gzip_shards: bool = False,
) -> DataFrame:
    """DISTRIBUTED WebDataset export: one tar shard per `shard_col`
    group, written in parallel (groupBy + applyInPandas — each task
    builds its shard in memory and writes `shard-<id>.tar[.gz]` under
    `path`). The export twin of `read_tar_shards`: members are sorted
    by name within each shard (deterministic bytes, zero tar
    metadata), so export -> re-read round-trips exactly and re-running
    a shard task is idempotent (same bytes, same name).

    Returns the per-shard manifest (shard_id, file, n_members,
    n_bytes) — an ACTION on it triggers the writes. Size shards
    upstream (`packing.assign_shards` fixed-token budgets): a shard
    must fit in one task's memory, which is exactly the ~1 GB shape
    the webdataset convention wants anyway. `path` must be a
    filesystem every executor can write (local dir on local[N], a
    mounted DFS/object store on a cluster). `shard_col` must be
    non-null on every row — a NULL shard id has no shard file to land
    in, and the task fails loudly rather than inventing one."""
    import os

    spark_types = (
        "shard_id long, file string, n_members long, n_bytes long"
    )

    def _write(pdf):
        import gzip
        import io
        import os as _os
        import tarfile

        import pandas as pd

        # the driver-side makedirs below covers local[N]; on a real
        # cluster each executor may see the (shared) path first
        _os.makedirs(path, exist_ok=True)
        sid = int(pdf[shard_col].iloc[0])
        rows = sorted(
            zip(pdf[member_col], pdf[payload_col]), key=lambda t: t[0]
        )
        buf = io.BytesIO()
        with tarfile.open(
            fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT
        ) as tf:
            for name, payload in rows:
                payload = bytes(payload) if payload is not None else b""
                info = tarfile.TarInfo(str(name))
                info.size = len(payload)
                info.mtime = 0
                info.uid = info.gid = 0
                tf.addfile(info, io.BytesIO(payload))
        data = buf.getvalue()
        suffix = ".tar.gz" if gzip_shards else ".tar"
        if gzip_shards:
            data = gzip.compress(data, mtime=0)
        fname = os.path.join(path, f"shard-{sid:06d}{suffix}")
        with open(fname, "wb") as f:
            f.write(data)
        return pd.DataFrame(
            [(sid, fname, len(rows), len(data))],
            columns=["shard_id", "file", "n_members", "n_bytes"],
        )

    os.makedirs(path, exist_ok=True)
    return (
        df.select(shard_col, member_col, payload_col)
        .groupBy(shard_col)
        .applyInPandas(_write, spark_types)
    )


def write_tar_shard(members: list[dict], path: str) -> None:
    """Serialize (member name, payload bytes) dicts into one tar shard
    — the driver-side test/certification writer (and the format
    contract `read_tar_shards` parses back byte-exactly). Deterministic
    metadata (zero mtime/uid/gid) so shard bytes are reproducible.
    Gzip when `path` ends '.gz'/'.tgz'."""
    import gzip
    import io
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for r in members:
            payload = r["payload"]
            info = tarfile.TarInfo(r["member"])
            info.size = len(payload)
            info.mtime = 0
            info.uid = info.gid = 0
            tf.addfile(info, io.BytesIO(payload))
    data = buf.getvalue()
    if path.endswith((".gz", ".tgz")):
        data = gzip.compress(data, mtime=0)
    with open(path, "wb") as f:
        f.write(data)
