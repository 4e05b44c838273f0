"""WARC (Web ARChive, ISO 28500) reader — the Common Crawl ingestion
format, the on-disk shape a web-scale pretraining corpus actually
arrives in. No external WARC library: records are parsed with a small
stdlib-only state machine inside an Arrow `mapInPandas` pass.

Parallelism model: one WARC file = one task (`binaryFile` source), the
same sharding real CC pipelines use — a crawl ships as ~64k files of
~1 GB, so a 1000-executor cluster saturates on file-level parallelism
without any intra-file splitting (which WARC's length-delimited,
gzip-member layout makes impractical anyway). Each file must fit in a
task (binaryFile contract); `.warc.gz` members are handled with stdlib
gzip.

Extends the reference's source surface (reference
src/sodaspark/scan.py:424-474 scans an already-loaded DataFrame; it
has no ingestion story) with the raw-crawl entry point; certified by
the `warc_ingest` registry row (synthesize -> write -> parse
round-trip vs the documents table)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_SCHEMA = (
    "file string, record_id string, warc_type string, target_uri string, "
    "warc_date string, content_type string, content_length long, "
    "payload binary, http_status int, http_content_type string, "
    "body binary, parse_error string"
)


def _http_fields(content_type, payload):
    """Split an application/http payload into (status, content-type
    header, body). Real Common Crawl `response` records are HTTP
    MESSAGES — status line + headers + blank line + entity — not bare
    documents; every consumer wants the entity and the status. Non-HTTP
    records (and HTTP blocks without the header terminator) pass
    through with body == payload and NULL status/header — nothing is
    ever dropped here, malformed-ness stays observable downstream.

    RFC 9112 mandates CRLF line endings, but wild crawls carry LF-only
    HTTP messages from sloppy origin servers; a strict CRLF-CRLF scan
    would hand those records NULL status (silently failing the
    documented http_status == 200 gate) and raw header bytes as body.
    Fall back to the first LF-LF terminator when no CRLF-CRLF exists,
    and split header lines on CRLF-or-LF."""
    if (
        payload is None
        or not content_type
        or not content_type.lower().startswith("application/http")
    ):
        return None, None, payload
    # earliest terminator wins: an LF-only header block whose BODY
    # happens to contain CRLF-CRLF must still split at the header end
    # (a well-formed CRLF head contains no bare LF-LF, so this never
    # mis-fires on compliant messages)
    i_crlf = payload.find(b"\r\n\r\n")
    i_lf = payload.find(b"\n\n")
    if i_crlf >= 0 and (i_lf < 0 or i_crlf <= i_lf):
        i, skip = i_crlf, 4
    elif i_lf >= 0:
        i, skip = i_lf, 2
    else:
        return None, None, payload
    head = payload[:i].decode("iso-8859-1")
    lines = head.replace("\r\n", "\n").split("\n")
    status = None
    first = lines[0].split()
    if len(first) >= 2 and first[0].upper().startswith("HTTP/"):
        try:
            status = int(first[1])
        except ValueError:
            status = None
    ct = None
    for ln in lines[1:]:
        k, sep, v = ln.partition(":")
        if sep and k.strip().lower() == "content-type":
            ct = v.strip()
            break
    return status, ct, payload[i + skip:]


def _parse_warc_bytes(data: bytes, fname: str):
    """Yield per-record dict rows from one WARC file's bytes. Tolerant
    sequential parse: Content-Length delimits payloads (payload bytes
    may contain anything); a malformed header block stops the file with
    ONE error row so corrupt crawl files surface instead of vanishing."""
    rows = []
    pos = 0
    n = len(data)
    while True:
        # skip inter-record CRLFs
        while pos < n and data[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return rows
        head_end = data.find(b"\r\n\r\n", pos)
        if not data.startswith(b"WARC/", pos) or head_end < 0:
            rows.append(dict(
                file=fname, record_id=None, warc_type=None,
                target_uri=None, warc_date=None, content_type=None,
                content_length=None, payload=None, http_status=None,
                http_content_type=None, body=None,
                parse_error=f"malformed record header at byte {pos}",
            ))
            return rows
        headers = {}
        for line in data[pos:head_end].split(b"\r\n")[1:]:
            k, sep, v = line.partition(b":")
            if sep:
                headers[k.strip().lower().decode("ascii", "replace")] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            rows.append(dict(
                file=fname, record_id=headers.get("warc-record-id"),
                warc_type=headers.get("warc-type"),
                target_uri=headers.get("warc-target-uri"),
                warc_date=headers.get("warc-date"),
                content_type=headers.get("content-type"),
                content_length=None, payload=None, http_status=None,
                http_content_type=None, body=None,
                parse_error=f"missing/invalid Content-Length at byte {pos}",
            ))
            return rows
        body_start = head_end + 4
        if body_start + clen > n:
            rows.append(dict(
                file=fname, record_id=headers.get("warc-record-id"),
                warc_type=headers.get("warc-type"),
                target_uri=headers.get("warc-target-uri"),
                warc_date=headers.get("warc-date"),
                content_type=headers.get("content-type"),
                content_length=clen, payload=None, http_status=None,
                http_content_type=None, body=None,
                parse_error=f"truncated payload at byte {body_start}",
            ))
            return rows
        payload = data[body_start:body_start + clen]
        status, http_ct, body = _http_fields(
            headers.get("content-type"), payload
        )
        rows.append(dict(
            file=fname, record_id=headers.get("warc-record-id"),
            warc_type=headers.get("warc-type"),
            target_uri=headers.get("warc-target-uri"),
            warc_date=headers.get("warc-date"),
            content_type=headers.get("content-type"),
            content_length=clen,
            payload=payload, http_status=status,
            http_content_type=http_ct, body=body,
            parse_error=None,
        ))
        pos = body_start + clen


def read_warc(
    spark: SparkSession,
    path: str,
    *,
    record_types: list[str] | None = None,
    html_to_text: bool = False,
) -> DataFrame:
    """Read WARC file(s) at `path` (glob ok; `.gz` names are
    gunzipped with stdlib gzip) into one row per WARC record:
    (file, record_id, warc_type, target_uri, warc_date, content_type,
    content_length, payload binary, http_status, http_content_type,
    body binary, parse_error). `payload` is the record's full content
    block; for `application/http` records (what real Common Crawl
    `response` records are) the HTTP message splits into `http_status`
    / the `http_content_type` header / the entity `body` — for
    everything else `body == payload` with NULL http fields. Malformed
    files
    surface as rows with `parse_error` set (filter or alert on it —
    the multimodal quarantine contract); `record_types` keeps only the
    named WARC-Type values (e.g. ['response']), applied AFTER parsing
    so error rows always survive.

    `html_to_text=True` appends a `text` string column — the payload
    decoded as UTF-8 and, for records whose Content-Type mentions
    'html', run through the stdlib boilerplate-stripping extractor
    (`operators.html_text`: script/style/head/nav dropped, block tags
    break lines, entities decoded, ASCII whitespace collapsed). Real
    crawl `response` records are HTML; this is the fetch -> curation
    bridge every production pipeline needs. Non-HTML payloads decode
    verbatim; NULL payloads (error rows) yield NULL text. The payload
    column is retained — project it away downstream to drop the bytes
    before a shuffle."""
    src = spark.read.format("binaryFile").load(path)

    def run(batches):
        import gzip

        import pandas as pd

        for pdf in batches:
            out = []
            for fname, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if fname.endswith(".gz"):
                    try:
                        data = gzip.decompress(data)
                    except OSError as e:
                        out.append(dict(
                            file=fname, record_id=None, warc_type=None,
                            target_uri=None, warc_date=None,
                            content_type=None, content_length=None,
                            payload=None, http_status=None,
                            http_content_type=None, body=None,
                            parse_error=f"bad gzip: {e}",
                        ))
                        continue
                out.extend(_parse_warc_bytes(data, fname))
            if out:
                yield pd.DataFrame(out)

    parsed = src.select("path", "content").mapInPandas(
        run, schema=WARC_SCHEMA
    )
    if record_types is not None:
        parsed = parsed.filter(
            F.col("warc_type").isin(list(record_types))
            | F.col("parse_error").isNotNull()
        )
    if html_to_text:
        from ..operators.html_text import extract_html_col

        # the entity BODY (== payload for non-HTTP records) under the
        # EFFECTIVE content type: the HTTP Content-Type header when the
        # record is an HTTP message, the WARC header otherwise
        decoded = F.decode(F.col("body"), "UTF-8")
        is_html = F.lower(F.coalesce(
            F.col("http_content_type"), F.col("content_type"), F.lit("")
        )).contains("html")
        parsed = parsed.withColumn(
            "text",
            F.when(is_html, extract_html_col(decoded)).otherwise(decoded),
        )
    return parsed


def http_response_payload(
    body: bytes,
    *,
    status: int = 200,
    reason: str = "OK",
    content_type: str = "text/html; charset=utf-8",
    extra_headers: list[tuple[str, str]] | None = None,
) -> bytes:
    """Build an HTTP/1.1 response message around `body` — the payload
    shape a real crawl `response` record carries (pair with
    `write_warc_records(content_type='application/http;
    msgtype=response')`). The fixture twin of `_http_fields`."""
    head = [f"HTTP/1.1 {status} {reason}",
            f"Content-Type: {content_type}",
            f"Content-Length: {len(body)}"]
    for k, v in extra_headers or []:
        head.append(f"{k}: {v}")
    return "\r\n".join(head).encode("iso-8859-1") + b"\r\n\r\n" + body


def write_warc_records(rows: list[dict], path: str) -> None:
    """Serialize (record_id, warc_type, target_uri, payload bytes,
    [warc_date, content_type]) dicts into one WARC/1.0 file — the
    driver-side test/certification writer (and the format contract
    `read_warc` parses back byte-exactly). Gzip when `path` ends
    '.gz'."""
    import gzip

    buf = bytearray()
    for r in rows:
        payload = r["payload"]
        head = [b"WARC/1.0"]
        head.append(b"WARC-Type: " + r["warc_type"].encode())
        head.append(b"WARC-Record-ID: " + r["record_id"].encode())
        if r.get("target_uri"):
            head.append(b"WARC-Target-URI: " + r["target_uri"].encode())
        if r.get("warc_date"):
            head.append(b"WARC-Date: " + r["warc_date"].encode())
        if r.get("content_type"):
            head.append(b"Content-Type: " + r["content_type"].encode())
        head.append(b"Content-Length: " + str(len(payload)).encode())
        buf += b"\r\n".join(head) + b"\r\n\r\n" + payload + b"\r\n\r\n"
    data = bytes(buf)
    if path.endswith(".gz"):
        data = gzip.compress(data, mtime=0)
    with open(path, "wb") as f:
        f.write(data)
