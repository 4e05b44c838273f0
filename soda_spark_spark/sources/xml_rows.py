"""Attribute-row XML ingestion — the Stack Exchange data-dump shape
(`Posts.xml`/`Comments.xml`/`Users.xml`: one `<row Attr="..."/>`
element per record, all payload in ATTRIBUTES), which is also the
shape of many export/reporting feeds. Stack Exchange dumps are a
classic curated Q&A pretraining source; their `Body` attributes are
HTML, which `operators/html_text.py` already projects to text.

`read_xml_rows` fans files out one-per-task through binaryFile and
streams each through stdlib `xml.etree.ElementTree.iterparse` —
constant memory per row (elements cleared after emission), no DOM.
Rows emit as (file, row_index, attrs map<string,string>, error):
the attribute map is schema-free on purpose (dump schemas differ per
entity and per site); project typed columns downstream with
`attrs['Id']` + casts, which stays JVM-side. A file whose XML is
malformed yields ONE quarantine row with `error` set — same contract
as read_wiki_dump/read_tar_shards. bz2/gzip unwrap by magic behind
the same bounded decompression guard as the wiki reader.

Scale: dump files are embarrassingly parallel; the scan prunes to
path+content; attribute projection and casting after the parse are
Catalyst expressions. For multi-GB single-file dumps, split upstream
(the published dumps ship per-site and per-entity, naturally
sharded).

Derived from the public Stack Exchange data-dump layout
(archive.org/details/stackexchange); the reference
(src/sodaspark/scan.py:441) scans already-loaded frames — dump
ingestion is additive surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .wiki_dump import _DEFAULT_MAX_BYTES, _decompress

__all__ = ["read_xml_rows", "XML_ROWS_SCHEMA", "write_xml_rows"]

XML_ROWS_SCHEMA = (
    "file string, row_index long, attrs map<string,string>,"
    " error string"
)


def read_xml_rows(
    spark: SparkSession,
    path: str,
    *,
    row_tag: str = "row",
    max_bytes: int = _DEFAULT_MAX_BYTES,
) -> DataFrame:
    """Read attribute-row XML file(s) at `path` (glob ok; bz2/gzip
    unwrapped by magic with the bomb guard) into one row per
    `<row_tag>` element; attributes become a string map."""
    src = spark.read.format("binaryFile").load(path)

    def run(batches):
        import io
        import xml.etree.ElementTree as ET
        import zlib

        import pandas as pd

        def parse(data: bytes, fname: str):
            i = 0
            for _ev, elem in ET.iterparse(
                io.BytesIO(data), events=("end",)
            ):
                if elem.tag.rsplit("}", 1)[-1] == row_tag:
                    yield dict(
                        file=fname, row_index=i,
                        attrs=dict(elem.attrib), error=None,
                    )
                    i += 1
                elem.clear()

        for pdf in batches:
            out = []
            for fname, content in zip(pdf["path"], pdf["content"]):
                try:
                    data = _decompress(bytes(content), fname, max_bytes)
                    out.extend(parse(data, fname))
                except (
                    ET.ParseError, ValueError, OSError, EOFError,
                    zlib.error,
                ) as e:
                    out.append(dict(
                        file=fname, row_index=None, attrs=None,
                        error=f"bad xml: {e}",
                    ))
            if out:
                yield pd.DataFrame(out)

    return src.select("path", "content").mapInPandas(
        run, schema=XML_ROWS_SCHEMA
    )


def write_xml_rows(
    rows: list[dict], path: str, *, root_tag: str = "posts",
    row_tag: str = "row", compress: str | None = None,
) -> None:
    """Fixture writer: serialize attribute dicts as one
    `<root_tag>` document of `<row_tag .../>` elements; `compress`
    in {None, 'bz2', 'gzip'}."""
    import bz2
    import gzip
    from xml.sax.saxutils import quoteattr

    parts = [f"<{root_tag}>"]
    for r in rows:
        attrs = " ".join(
            f"{k}={quoteattr(str(v))}" for k, v in r.items()
        )
        parts.append(f"  <{row_tag} {attrs} />")
    parts.append(f"</{root_tag}>")
    raw = "\n".join(parts).encode("utf-8")
    if compress == "bz2":
        raw = bz2.compress(raw)
    elif compress == "gzip":
        raw = gzip.compress(raw, mtime=0)
    elif compress is not None:
        raise ValueError(f"unknown compress {compress!r}")
    with open(path, "wb") as f:
        f.write(raw)
