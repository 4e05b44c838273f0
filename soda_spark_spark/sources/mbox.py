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
  file — stable provenance for dedup survivorship.

Scale shape: one task per archive file (binaryFile), Arrow-batched
output; archives are many and individually bounded (`max_bytes`), so
parallelism comes from file count, the same model as WARC / tar /
wiki-dump shards. For multi-GB single archives, split upstream — the
format is line-delimited and splittable by `From ` scan.

Derived from RFC 4155 (mbox) + RFC 5322 via the stdlib; the reference
(src/sodaspark/scan.py:441) scans already-loaded frames — mail
ingestion is additive surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from soda_spark_spark.operators.mime import EML_SCHEMA, eml_parse
from soda_spark_spark.sources.wiki_dump import _DEFAULT_MAX_BYTES, _decompress

__all__ = ["split_mbox", "read_mbox", "write_mbox", "MBOX_SCHEMA"]

MBOX_SCHEMA = "file string, msg_index int," + EML_SCHEMA


def split_mbox(data: bytes) -> list[bytes]:
    """Split one mbox buffer into raw message byte strings (module
    contract). ValueError when the buffer has no `From ` separator —
    a plain-text file is not an mbox."""
    msgs: list[list[bytes]] = []
    cur: list[bytes] | None = None
    for line in data.splitlines(keepends=True):
        if line.startswith(b"From "):
            cur = []
            msgs.append(cur)
            continue
        if cur is None:
            if line.strip():
                raise ValueError("not an mbox: content before first 'From ' separator")
            continue
        stripped = line.lstrip(b">")
        if stripped.startswith(b"From ") and line[:1] == b">":
            line = line[1:]  # mboxrd: shed exactly one escape level
        cur.append(line)
    if not msgs:
        raise ValueError("not an mbox: no 'From ' separator found")
    out = []
    for lines in msgs:
        # the framing before the next separator is exactly ONE empty
        # line: shed only that (a whitespace-only line is CONTENT,
        # and extra empty lines belong to the message body)
        if lines and lines[-1] in (b"\n", b"\r\n", b""):
            lines.pop()
        out.append(b"".join(lines))
    return out


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
