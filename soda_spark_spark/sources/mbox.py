"""mbox mail-archive ingestion — many RFC-5322 messages per file.
Mailing-list archives (the classic public-corpus mail source) ship as
mbox: messages concatenated, each introduced by a `From ` separator
line, with body lines that would collide escaped as `>From ` (the
mboxrd convention — RFC 4155 documents the family). The reader is
the mail analog of `sources/wiki_dump.py`: one binaryFile row per
archive, transparent bz2/gzip unwrap by magic (the SAME `_decompress`
with the multi-member chain and the `max_bytes` bomb guard), then a
per-file split into messages and `operators/mime.eml_parse` on each.

Contract:
- a message starts at every line that begins EXACTLY `From ` (the
  separator is metadata, not part of the message); `>From ` /
  `>>From ` body lines lose ONE `>` on read (mboxrd unescape);
- each message's trailing blank separator line is removed; interior
  blank lines survive;
- a file that fails decompression or contains no separator at all
  quarantines as ONE error row (filter or alert, never silently
  vanish); a single unparseable MESSAGE quarantines as one row with
  `msg_index` intact, the rest of the file still parses.
- `msg_index` is the 0-based position of the message within its
  file — stable provenance for dedup survivorship;
- a single message larger than `max_bytes` quarantines as one error
  row (the same bound `read_mbox_split` enforces while stitching, so
  the split law holds on raw archives too, not only compressed ones).

Scale shape: `read_mbox` is one task per archive file (binaryFile),
Arrow-batched output; archives are many and individually bounded
(`max_bytes`), so parallelism comes from file count, the same model
as WARC / tar / wiki-dump shards. For multi-GB SINGLE archives
(Enron-scale: one 1.5 GB file), `read_mbox_split` (round 18) chunks
each uncompressed file into byte ranges with overlap-stitched
`From `-boundary scan — the Hadoop-TextInputFormat split discipline:
a chunk owns every separator whose offset lands in [start, end) and
reads PAST its end until the next separator to complete its last
message, so every message is parsed exactly once and chunk
boundaries never cut one. `msg_index` stays stable (one window over
the global separator offset). Compressed archives are not
byte-splittable and fall back to one whole-file chunk, honestly.

Derived from RFC 4155 (mbox) + RFC 5322 via the stdlib; the reference
(src/sodaspark/scan.py:441) scans already-loaded frames — mail
ingestion is additive surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from soda_spark_spark.operators.mime import EML_SCHEMA, eml_parse
from soda_spark_spark.sources.wiki_dump import _DEFAULT_MAX_BYTES, _decompress

__all__ = [
    "split_mbox",
    "read_mbox",
    "read_mbox_split",
    "write_mbox",
    "MBOX_SCHEMA",
]

MBOX_SCHEMA = "file string, msg_index int," + EML_SCHEMA


def _iter_separators(data: bytes, *, from_pos: int = 0):
    """Yield byte offsets of `From ` separator lines: positions p with
    data[p:p+5] == b'From ' at the start of the buffer or right after
    a newline. The offset definition is what makes the format
    SPLITTABLE — any reader holding the byte before p can decide
    locally whether p starts a separator."""
    if from_pos == 0 and data[:5] == b"From ":
        yield 0
    i = max(from_pos - 1, 0)
    while True:
        i = data.find(b"\nFrom ", i)
        if i < 0:
            return
        if i + 1 >= from_pos:
            yield i + 1
        i += 1


def _unescape_and_trim(raw: bytes) -> bytes:
    """mboxrd unescape (shed exactly one `>` level off `>*From `
    lines) + drop the ONE trailing blank framing line (a
    whitespace-only line is CONTENT, and extra empty lines belong to
    the message body)."""
    lines = []
    for line in raw.splitlines(keepends=True):
        stripped = line.lstrip(b">")
        if stripped.startswith(b"From ") and line[:1] == b">":
            line = line[1:]
        lines.append(line)
    if lines and lines[-1] in (b"\n", b"\r\n", b""):
        lines.pop()
    return b"".join(lines)


def _message_span(data: bytes, sep: int, nxt: int) -> bytes:
    """Raw message bytes between separator `sep`'s line end and the
    next separator (or EOF)."""
    line_end = data.find(b"\n", sep)
    body_start = len(data) if line_end < 0 else line_end + 1
    return _unescape_and_trim(data[body_start:nxt])


def split_mbox(data: bytes) -> list[bytes]:
    """Split one mbox buffer into raw message byte strings (module
    contract). ValueError when the buffer has no `From ` separator —
    a plain-text file is not an mbox."""
    seps = list(_iter_separators(data))
    if not seps:
        raise ValueError("not an mbox: no 'From ' separator found")
    if data[: seps[0]].strip():
        raise ValueError(
            "not an mbox: content before first 'From ' separator"
        )
    bounds = seps + [len(data)]
    return [
        _message_span(data, bounds[k], bounds[k + 1])
        for k in range(len(seps))
    ]


def write_mbox(
    messages: list[bytes], path: str, *, compress: str | None = None
) -> None:
    """Fixture writer: messages -> one mboxrd file; `compress` in
    {None, 'bz2', 'gzip'}."""
    import bz2
    import gzip

    parts = []
    for raw in messages:
        parts.append(b"From MAILER-DAEMON Thu Jan  1 00:00:00 2020\n")
        for line in bytes(raw).splitlines(keepends=True):
            if line.lstrip(b">").startswith(b"From "):
                line = b">" + line  # mboxrd escape
            parts.append(line)
        if not parts[-1].endswith(b"\n"):
            parts.append(b"\n")
        parts.append(b"\n")
    data = b"".join(parts)
    if compress == "bz2":
        data = bz2.compress(data)
    elif compress == "gzip":
        data = gzip.compress(data, mtime=0)
    elif compress is not None:
        raise ValueError(f"unknown compress: {compress}")
    with open(path, "wb") as f:
        f.write(data)


def read_mbox(
    spark: SparkSession,
    path: str,
    *,
    max_bytes: int = _DEFAULT_MAX_BYTES,
) -> DataFrame:
    """Read mbox archive(s) at `path` (glob ok) into one row per
    message (module contract)."""
    src = spark.read.format("binaryFile").load(path)

    n_fields = len(MBOX_SCHEMA.split(","))

    def run(batches):
        import zlib

        import pandas as pd

        cols = [c.strip().split(" ")[0] for c in MBOX_SCHEMA.split(",")]

        def file_error(fname: str, e: Exception) -> tuple:
            return (fname, None) + (None,) * (n_fields - 3) + (
                f"bad mbox: {e}",
            )

        for pdf in batches:
            rows = []
            for fname, content in zip(pdf["path"], pdf["content"]):
                try:
                    data = _decompress(bytes(content), fname, max_bytes)
                    raw_msgs = split_mbox(data)
                except (ValueError, OSError, EOFError, zlib.error) as e:
                    rows.append(file_error(fname, e))
                    continue
                for i, raw in enumerate(raw_msgs):
                    if len(raw) > max_bytes:
                        # the same per-message bound the split reader
                        # enforces while stitching — without it a raw
                        # (uncompressed) archive's messages were
                        # unbounded and the split law had an edge gap
                        # (round-19 advice)
                        rows.append((
                            fname, i) + (None,) * (n_fields - 3) + (
                            f"message spans more than "
                            f"{max_bytes} bytes",
                        ))
                        continue
                    try:
                        m = eml_parse(raw)
                        rows.append(
                            (fname, i)
                            + tuple(m[c] for c in cols[2:-1])
                            + (None,)
                        )
                    except Exception as e:
                        rows.append((
                            fname, i) + (None,) * (n_fields - 3) + (
                            f"{type(e).__name__}: {e}"[:500],
                        ))
            out = pd.DataFrame(rows, columns=cols)
            out["msg_index"] = pd.array(out["msg_index"], dtype="Int32")
            for c in ("n_parts", "n_attachments"):
                out[c] = pd.array(out[c], dtype="Int32")
            out["attachment_bytes"] = pd.array(
                out["attachment_bytes"], dtype="Int64"
            )
            yield out

    return src.select("path", "content").mapInPandas(run, schema=MBOX_SCHEMA)


class _NotAnMbox(ValueError):
    """File-level head failure: the archive is not an mbox (no
    separator at all, or content precedes the first one). Raised only
    by the FIRST chunk of `read_mbox_split`; the reader turns it into
    a whole-file quarantine so output matches `read_mbox`."""


_MAGICS = (b"BZh", b"\x1f\x8b")


def _is_compressed(head: bytes) -> bool:
    if head[:3] == _MAGICS[0] or head[:2] == _MAGICS[1]:
        return True
    return (
        len(head) >= 2
        and head[0] == 0x78
        and (head[0] * 256 + head[1]) % 31 == 0
    )


def _plan_chunks(
    p: str, size: int, head: bytes, chunk_bytes: int
) -> list[tuple]:
    """(file, start, end, size, whole) ranges for one file: byte
    chunks for a raw mbox, ONE whole-file chunk for a compressed one —
    compressed streams are not byte-splittable. A zero-byte file
    plans NO chunks: Spark's binaryFile source (read_mbox's path)
    emits no row for it, and the split law is row-for-row equality."""
    if size == 0:
        return []
    if _is_compressed(head):
        return [(p, 0, size, size, True)]
    out = []
    start = 0
    while start < size:
        end = min(start + chunk_bytes, size)
        out.append((p, start, end, size, False))
        start = end
    return out


def read_mbox_split(
    spark: SparkSession,
    path: str,
    *,
    chunk_bytes: int = 64 * 1024 * 1024,
    max_bytes: int = _DEFAULT_MAX_BYTES,
) -> DataFrame:
    """Read mbox archive(s) at `path` (local glob ok) with BYTE-RANGE
    parallelism inside each file (module contract; header for the
    split law). Output equals `read_mbox` row-for-row on the same
    well-formed archive: same columns, same `msg_index`. Both readers
    enforce the same per-message `max_bytes` bound (an oversize
    message is one error row in each); at the exact boundary the
    split reader measures the raw separator-to-separator span while
    `read_mbox` measures the unescaped message, so a message within
    one separator line's width of the limit may quarantine on one
    side only — the law is exact for messages not straddling it.

    Split mechanics (chunk task, no driver I/O beyond the size stat):
    - the planner emits (file, start, end) ranges of `chunk_bytes`;
    - a task reads from start-1 (one byte of left context decides
      whether a `From ` at `start` begins a line) and OWNS separators
      with offset in [start, end);
    - its last message may extend past `end`: the task keeps reading
      forward (doubling lookahead, bounded by `max_bytes`) until the
      next separator or EOF — the same stitch TextInputFormat uses
      for lines;
    - a file whose head is a known compression magic is one
      whole-file chunk (gzip/bz2/zlib are not byte-splittable);
    - quarantine laws follow `read_mbox`, chunk-locally: the FIRST
      chunk validates the file head (no separator anywhere in a
      headless first chunk -> one file error row), an unparseable
      message is one error row, an over-`max_bytes` message is one
      error row with the rest of the chunk intact.

    One shuffle total: the window that turns global separator offsets
    into the stable 0-based `msg_index` (keyed on file — thousands of
    chunks reduce to a per-file sort of message COUNTS-sized data,
    not bytes). Files open through `pyarrow.fs` ranged reads, so the
    same code path serves local disk and object stores."""
    import glob as _glob
    import os

    if "://" in path:
        paths = [path]
    else:
        paths = sorted(p for p in _glob.glob(path) if os.path.isfile(p))
        if not paths:
            raise FileNotFoundError(f"no files match {path}")

    from pyarrow import fs as pafs

    def _open(p):
        if "://" in p:
            fs_, rel = pafs.FileSystem.from_uri(p)
            return fs_.open_input_file(rel)
        return pafs.LocalFileSystem().open_input_file(p)

    plan = []
    for p in paths:
        with _open(p) as f:
            size = f.size()
            head = f.read(4)
        plan.extend(_plan_chunks(p, size, head, chunk_bytes))
    plan_df = spark.createDataFrame(
        plan, "file string, start long, end long, size long, whole boolean"
    ).repartition(max(len(plan), 1))

    n_fields = len(MBOX_SCHEMA.split(","))
    inner_schema = "msg_offset long," + MBOX_SCHEMA

    def run(batches):
        import zlib

        import pandas as pd

        cols = ["msg_offset"] + [
            c.strip().split(" ")[0] for c in MBOX_SCHEMA.split(",")
        ]

        def emit(rows, fname, offset, raw):
            if len(raw) > max_bytes:
                # same per-message bound as read_mbox (the split law
                # is row-for-row equality, so the trigger must match)
                rows.append(
                    (offset, fname, 0)
                    + (None,) * (n_fields - 3)
                    + (f"message spans more than {max_bytes} bytes",)
                )
                return
            try:
                m = eml_parse(raw)
                rows.append(
                    (offset, fname, 0)
                    + tuple(m[c] for c in cols[3:-1])
                    + (None,)
                )
            except Exception as e:
                rows.append(
                    (offset, fname, 0)
                    + (None,) * (n_fields - 3)
                    + (f"{type(e).__name__}: {e}"[:500],)
                )

        for pdf in batches:
            rows = []
            for fname, start, end, size, whole in zip(
                pdf["file"], pdf["start"], pdf["end"],
                pdf["size"], pdf["whole"],
            ):
                start, end, size = int(start), int(end), int(size)
                try:
                    if whole:
                        with _open(fname) as f:
                            data = _decompress(
                                f.read(), fname, max_bytes
                            )
                        for i, raw in enumerate(split_mbox(data)):
                            emit(rows, fname, i, raw)
                        continue
                    base = start - 1 if start else 0
                    with _open(fname) as f:
                        f.seek(base)
                        look = 1 << 20
                        buf = f.read(min(size, end + look) - base)
                        # owned separators: global offset in [start, end)
                        seps = [
                            base + q
                            for q in _iter_separators(
                                buf, from_pos=start - base
                            )
                            if base + q < end
                        ]
                        if start == 0:
                            # head law, verbatim from split_mbox: the
                            # FIRST chunk owns file validation, and a
                            # head failure poisons the WHOLE file
                            # (other chunks' output is discarded by
                            # the _poison filter below) so a bad-head
                            # archive yields the same single error
                            # row as read_mbox. The first separator
                            # may live beyond this chunk (long
                            # whitespace prefix): scan forward,
                            # bounded by max_bytes, before judging.
                            first_any = next(
                                iter(_iter_separators(buf)), None
                            )
                            while (
                                first_any is None
                                and base + len(buf) < size
                                and len(buf) <= max_bytes
                            ):
                                more = f.read(look)
                                if not more:
                                    break
                                buf += more
                                look = min(look * 2, 64 << 20)
                                first_any = next(
                                    iter(_iter_separators(buf)), None
                                )
                            if first_any is None:
                                raise _NotAnMbox(
                                    "not an mbox: no 'From ' "
                                    "separator found"
                                )
                            if buf[:first_any].strip():
                                raise _NotAnMbox(
                                    "not an mbox: content before "
                                    "first 'From ' separator"
                                )
                        if not seps:
                            continue
                        # stitch: extend until a separator at/past end
                        # (or EOF) closes the last owned message
                        stitch_err = None
                        while base + len(buf) < size:
                            nxt = next(
                                (
                                    base + q
                                    for q in _iter_separators(
                                        buf, from_pos=end - base
                                    )
                                ),
                                None,
                            )
                            if nxt is not None:
                                break
                            if (base + len(buf)) - seps[-1] > max_bytes:
                                # measure the TAIL MESSAGE's span, not
                                # the whole stitch buffer — a chunk
                                # whose separator sits late must not
                                # falsely quarantine a message that
                                # read_mbox's per-message bound accepts
                                stitch_err = (
                                    f"message spans more than "
                                    f"{max_bytes} bytes"
                                )
                                break
                            more = f.read(look)
                            if not more:
                                break
                            buf += more
                            look = min(look * 2, 64 << 20)
                    tail = next(
                        (
                            base + q
                            for q in _iter_separators(
                                buf, from_pos=end - base
                            )
                        ),
                        base + len(buf),
                    )
                    bounds = seps + [tail]
                    for k, sep in enumerate(seps):
                        if stitch_err is not None and k == len(seps) - 1:
                            # only the unbounded TAIL message
                            # quarantines; the chunk's earlier
                            # messages are intact
                            rows.append(
                                (sep, fname, 0)
                                + (None,) * (n_fields - 3)
                                + (stitch_err,)
                            )
                            continue
                        raw = _message_span(
                            buf, sep - base, bounds[k + 1] - base
                        )
                        emit(rows, fname, sep, raw)
                except (ValueError, OSError, EOFError, zlib.error) as e:
                    # -2 = file-poisoning head failure (the whole
                    # file quarantines, matching read_mbox); -1 =
                    # chunk-local failure (other chunks' rows stand)
                    off = -2 if isinstance(e, _NotAnMbox) else -1
                    rows.append(
                        (off, fname)
                        + (None,) * (n_fields - 2)
                        + (f"bad mbox: {e}",)
                    )
            out = pd.DataFrame(rows, columns=cols)
            out["msg_index"] = pd.array(out["msg_index"], dtype="Int32")
            for c in ("n_parts", "n_attachments"):
                out[c] = pd.array(out[c], dtype="Int32")
            out["attachment_bytes"] = pd.array(
                out["attachment_bytes"], dtype="Int64"
            )
            yield out

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    parsed = plan_df.mapInPandas(run, schema=inner_schema)
    # a head failure (msg_offset = -2, only the first chunk can emit
    # one) poisons the file: keep ONLY its error row, so a bad-head
    # multi-chunk archive equals read_mbox's single quarantine row
    # instead of leaking the later chunks' messages
    wf = Window.partitionBy("file")
    poison = F.max(
        F.when(F.col("msg_offset") == -2, 1).otherwise(0)
    ).over(wf)
    parsed = (
        parsed.withColumn("_poison", poison)
        .filter((F.col("_poison") == 0) | (F.col("msg_offset") == -2))
        .drop("_poison")
    )
    w = Window.partitionBy("file").orderBy("msg_offset")
    names = [c.strip().split(" ")[0] for c in MBOX_SCHEMA.split(",")]
    # file-level error rows carry msg_offset = -1 and sort first:
    # subtract their cumulative count so real messages still number
    # from 0 (matching read_mbox) even when a file also quarantined
    n_err = F.sum(
        F.when(F.col("msg_offset") < 0, 1).otherwise(0)
    ).over(w)
    return parsed.withColumn(
        "msg_index",
        F.when(
            F.col("msg_offset") >= 0,
            (F.row_number().over(w) - 1 - n_err).cast("int"),
        ),
    ).select(*names)
