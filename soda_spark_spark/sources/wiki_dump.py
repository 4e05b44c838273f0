"""MediaWiki XML export ("dump") ingestion — Wikipedia-style dumps
are the canonical curated pretraining source, shipped as one or more
`<mediawiki>` XML files (often bz2/gzip-compressed, in the multistream
layout one independent bz2 member per ~100 pages).

`read_wiki_dump` fans the dump files out one-file-per-task through
Spark's binaryFile source and streams each through stdlib
`xml.etree.ElementTree.iterparse` — constant memory per page (every
`<page>` element is cleared after emission), never a whole-document
DOM, so a multi-GB dump shard costs one page of memory at a time.
Namespace-agnostic tag matching (the export namespace version changes
release to release: export-0.10/0.11/...). A file whose XML is
malformed yields ONE quarantine row with `error` set — same contract
as `read_tar_shards`/`read_warc`: filter or alert, never silently
vanish.

Row shape: (file, page_id, ns, title, redirect, rev_id, timestamp,
model, format, text, error). `redirect` is the redirect TARGET title
(null for regular articles) — redirect stubs carry no corpus text and
a curation pipeline drops them with `WHERE redirect IS NULL`; they are
still emitted because the redirect graph itself is a dedup/alias
signal.

Scale: dump shards are embarrassingly parallel (one task per file;
Wikipedia publishes ~600 multistream parts), the schema is pruned at
the scan (path+content only), and the downstream wikitext projection
(`operators/wikitext.py`) is a mapInPandas over the text column.
bz2/gzip members decompress with a bounded streaming guard
(`max_bytes`) so one crafted/corrupt member cannot inflate an
executor to death — the same decompression-bomb contract as the
document router.

Derived from the public MediaWiki XML export format
(mediawiki.org/xml/export-0.10.xsd); the reference
(src/sodaspark/scan.py:441) scans already-loaded frames — dump
ingestion is additive surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["read_wiki_dump", "WIKI_SCHEMA", "write_wiki_dump"]

WIKI_SCHEMA = (
    "file string, page_id long, ns int, title string, redirect string,"
    " rev_id long, timestamp string, model string, format string,"
    " text string, error string"
)

_DEFAULT_MAX_BYTES = 256 * 1024 * 1024


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _decompress(data: bytes, fname: str, max_bytes: int) -> bytes:
    """Transparently unwrap bz2/gzip/raw-zlib by magic, with a
    streaming bound: decompression stops (ValueError) once the
    plaintext would exceed `max_bytes`, so the bomb never
    materializes."""
    import bz2
    import zlib

    if data[:3] == b"BZh":
        dec = bz2.BZ2Decompressor()
        out = []
        total = 0
        buf = data
        # multistream dumps concatenate independent bz2 members;
        # BZ2Decompressor stops at each EOS, so chain on unused_data
        while buf:
            chunk = dec.decompress(buf, max_bytes - total + 1)
            total += len(chunk)
            if total > max_bytes:
                raise ValueError(
                    f"decompressed size exceeds {max_bytes} bytes"
                )
            out.append(chunk)
            if dec.eof:
                buf = dec.unused_data.lstrip(b"\x00")
                if not buf:
                    break
                dec = bz2.BZ2Decompressor()
            elif dec.needs_input:
                break
            else:
                buf = b""
        return b"".join(out)
    if data[:2] == b"\x1f\x8b":
        # concatenated .gz members (cat a.gz b.gz, pigz, BGZF-style
        # writers) are one logical stream: chain on unused_data with a
        # fresh decompressobj per member, mirroring the bz2 branch, so
        # later members are never silently dropped
        out = []
        total = 0
        buf = data
        while buf:
            dec = zlib.decompressobj(wbits=47)
            chunk = dec.decompress(buf, max_bytes - total + 1)
            total += len(chunk)
            if total > max_bytes:
                raise ValueError(
                    f"decompressed size exceeds {max_bytes} bytes"
                )
            out.append(chunk)
            if not dec.eof:
                # input exhausted mid-member: a truncated file must
                # quarantine, not parse as a shorter document
                raise ValueError("truncated gzip member")
            buf = dec.unused_data.lstrip(b"\x00")
        return b"".join(out)
    if (
        len(data) >= 2
        and data[0] == 0x78
        and (data[0] * 256 + data[1]) % 31 == 0
    ):
        # raw zlib framing (RFC 1950: 0x78 CMF + a flag byte making
        # the 16-bit header divisible by 31 — 0x01/0x5E/0x9C/0xDA for
        # the standard levels). TensorFlow's TFRecordOptions
        # compression_type='ZLIB' writes exactly this: no gzip
        # wrapper, no member chaining convention (round 18 — such
        # shards used to quarantine wholesale). The header-checksum
        # test keeps plain text starting with 'x' out of this branch.
        out = []
        total = 0
        buf = data
        while True:
            dec = zlib.decompressobj(wbits=15)
            chunk = dec.decompress(buf, max_bytes + 1 - total)
            total += len(chunk)
            if total > max_bytes:
                raise ValueError(
                    f"decompressed size exceeds {max_bytes} bytes"
                )
            if not dec.eof:
                raise ValueError("truncated zlib stream")
            out.append(chunk)
            # chain concatenated streams the way the gzip branch
            # chains members (round-18 self-review: the tail used to
            # be dropped SILENTLY); anything after a complete stream
            # that is not another zlib header is an honest error,
            # never silent truncation
            buf = dec.unused_data.lstrip(b"\x00")
            if not buf:
                return b"".join(out)
            if not (
                len(buf) >= 2
                and buf[0] == 0x78
                and (buf[0] * 256 + buf[1]) % 31 == 0
            ):
                raise ValueError("trailing data after zlib stream")
    return data


def _parse_pages(data: bytes, fname: str):
    """Yield one dict per <page> via streaming iterparse; constant
    memory per page: each emitted <page> is cleared AND detached from
    the root's child list (a cleared element left attached still
    costs O(pages) in the parent), bounded overall by the `max_bytes`
    decompression guard on the input buffer itself."""
    import io
    import xml.etree.ElementTree as ET

    root = None
    for event, elem in ET.iterparse(
        io.BytesIO(data), events=("start", "end")
    ):
        if event == "start":
            if root is None:
                root = elem
            continue
        if _localname(elem.tag) != "page":
            continue
        row = dict(
            file=fname, page_id=None, ns=None, title=None,
            redirect=None, rev_id=None, timestamp=None, model=None,
            format=None, text=None, error=None,
        )
        for child in elem:
            name = _localname(child.tag)
            if name == "title":
                row["title"] = child.text
            elif name == "ns":
                row["ns"] = int(child.text) if child.text else None
            elif name == "id":
                row["page_id"] = int(child.text) if child.text else None
            elif name == "redirect":
                row["redirect"] = child.get("title")
            elif name == "revision":
                for rc in child:
                    rname = _localname(rc.tag)
                    if rname == "id":
                        row["rev_id"] = int(rc.text) if rc.text else None
                    elif rname == "timestamp":
                        row["timestamp"] = rc.text
                    elif rname == "model":
                        row["model"] = rc.text
                    elif rname == "format":
                        row["format"] = rc.text
                    elif rname == "text":
                        row["text"] = rc.text or ""
        yield row
        elem.clear()
        if root is not None and len(root) and root[-1] is elem:
            # drop completed children from the root so its child list
            # doesn't grow O(pages); guarded on the page being root's
            # LAST direct child — if a dump ever nested pages deeper,
            # root[-1] would be the still-open ancestor and we'd skip
            # the trim rather than truncate a subtree mid-parse
            del root[:]


def read_wiki_dump(
    spark: SparkSession,
    path: str,
    *,
    max_bytes: int = _DEFAULT_MAX_BYTES,
) -> DataFrame:
    """Read MediaWiki XML dump file(s) at `path` (glob ok; bz2/gzip
    unwrapped by magic with a `max_bytes` bomb guard) into one row per
    <page>. Malformed XML / oversized decompression quarantines the
    FILE as one error row."""
    src = spark.read.format("binaryFile").load(path)

    def run(batches):
        import xml.etree.ElementTree as ET
        import zlib

        import pandas as pd

        for pdf in batches:
            out = []
            for fname, content in zip(pdf["path"], pdf["content"]):
                try:
                    data = _decompress(bytes(content), fname, max_bytes)
                    out.extend(_parse_pages(data, fname))
                except (
                    ET.ParseError, ValueError, OSError, EOFError,
                    zlib.error,
                ) as e:
                    out.append(dict(
                        file=fname, page_id=None, ns=None, title=None,
                        redirect=None, rev_id=None, timestamp=None,
                        model=None, format=None, text=None,
                        error=f"bad dump: {e}",
                    ))
            if out:
                yield pd.DataFrame(out)

    return src.select("path", "content").mapInPandas(
        run, schema=WIKI_SCHEMA
    )


def write_wiki_dump(pages: list[dict], path: str, *, compress: str | None = None) -> None:
    """Fixture writer: serialize `pages` (dicts with title/ns/page_id/
    rev_id/timestamp/text and optional redirect) as a minimal
    namespace-qualified MediaWiki export file; `compress` in
    {None, 'bz2', 'gzip'}."""
    import bz2
    import gzip
    from xml.sax.saxutils import escape, quoteattr

    parts = [
        '<mediawiki xmlns="http://www.mediawiki.org/xml/export-0.11/"'
        ' version="0.11" xml:lang="en">'
    ]
    for p in pages:
        parts.append("<page>")
        parts.append(f"<title>{escape(p['title'])}</title>")
        parts.append(f"<ns>{int(p.get('ns', 0))}</ns>")
        parts.append(f"<id>{int(p['page_id'])}</id>")
        if p.get("redirect") is not None:
            parts.append(f"<redirect title={quoteattr(p['redirect'])} />")
        parts.append("<revision>")
        parts.append(f"<id>{int(p.get('rev_id', 1))}</id>")
        ts = p.get("timestamp", "2001-01-15T00:00:00Z")
        parts.append(f"<timestamp>{escape(ts)}</timestamp>")
        parts.append("<model>wikitext</model>")
        parts.append("<format>text/x-wiki</format>")
        parts.append(
            '<text bytes="%d" xml:space="preserve">%s</text>'
            % (len(p.get("text", "")), escape(p.get("text", "")))
        )
        parts.append("</revision>")
        parts.append("</page>")
    parts.append("</mediawiki>")
    raw = "\n".join(parts).encode("utf-8")
    if compress == "bz2":
        raw = bz2.compress(raw)
    elif compress == "gzip":
        raw = gzip.compress(raw, mtime=0)
    elif compress is not None:
        raise ValueError(f"unknown compress {compress!r}")
    with open(path, "wb") as f:
        f.write(raw)
