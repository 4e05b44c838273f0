"""TFRecord shard ingestion — the TensorFlow training-data container.
A TFRecord file is a flat sequence of length-framed records, each
protected by two masked CRC-32C checksums (public format, documented
in the TensorFlow source and docs):

    uint64 length (little-endian)
    uint32 masked_crc32c(length bytes)
    byte   data[length]
    uint32 masked_crc32c(data)

with ``masked = (rotr15(crc) + 0xa282ead8) mod 2^32`` over the
Castagnoli polynomial (reflected 0x82F63B78). The payload bytes are
opaque here (usually a serialized Example proto; this module hands
them to downstream decoders as `binary`, the same opaque-payload
stance as the multimodal tables).

Contract (`read_tfrecords`):
- one row per record: `file`, `rec_index` (0-based within its
  shard), `payload`, `n_bytes`;
- transparent gzip/bzip2 unwrap by magic (TF's GZIP file option),
  through the SAME multi-member `_decompress` as the wiki/mbox
  readers, bomb-guarded;
- integrity is the point of the format: a record whose length-CRC or
  data-CRC fails STOPS the shard (the framing can no longer be
  trusted — TFRecord has no resync marker) and emits ONE error row
  carrying the index where parsing stopped; records before the
  corruption are kept. Truncated tails quarantine the same way.
  Filter or alert, never silently vanish.

The pure-Python table-driven CRC-32C is certification-grade (records
are small and the table loop is O(bytes)); a production fleet swaps a
native crc32c via the same byte contract — the framing logic is the
part under test.

Scale shape: one binaryFile task per shard, Arrow-batched output —
the same parallelism model as WARC / tar / wiki / mbox (shard count
is the unit of parallelism; TFRecord shards are conventionally
100-500 MB for exactly this reason).

Derived from the public TFRecord framing spec and CRC-32C (RFC 3720
Castagnoli); the reference (src/sodaspark/scan.py:441) scans
already-loaded frames — container ingestion is additive surface.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, SparkSession

from soda_spark_spark.sources.wiki_dump import _DEFAULT_MAX_BYTES, _decompress

__all__ = [
    "crc32c",
    "masked_crc32c",
    "split_tfrecords",
    "read_tfrecords",
    "write_tfrecords",
    "TFRECORD_SCHEMA",
]

TFRECORD_SCHEMA = (
    "file string, rec_index int, payload binary, n_bytes long,"
    " error string"
)

_CRC32C_POLY = 0x82F63B78
_CRC_TABLE: list[int] | None = None


def _table() -> list[int]:
    global _CRC_TABLE
    if _CRC_TABLE is None:
        t = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ _CRC32C_POLY if c & 1 else c >> 1
            t.append(c)
        _CRC_TABLE = t
    return _CRC_TABLE


def crc32c(data: bytes) -> int:
    """Castagnoli CRC-32C (reflected), table-driven."""
    t = _table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = t[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def masked_crc32c(data: bytes) -> int:
    """TFRecord's rotated-and-offset mask over crc32c."""
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def split_tfrecords(data: bytes) -> tuple[list[bytes], str | None]:
    """(records, error): parse records until EOF or the first
    integrity failure; `error` is None on a clean parse, else a
    message naming the failed index (module contract)."""
    out: list[bytes] = []
    pos, n = 0, len(data)
    while pos < n:
        if pos + 12 > n:
            return out, f"truncated header at record {len(out)}"
        (length,) = struct.unpack_from("<Q", data, pos)
        (len_crc,) = struct.unpack_from("<I", data, pos + 8)
        if masked_crc32c(data[pos:pos + 8]) != len_crc:
            return out, f"length crc mismatch at record {len(out)}"
        start = pos + 12
        end = start + length
        if end + 4 > n:
            return out, f"truncated data at record {len(out)}"
        payload = data[start:end]
        (data_crc,) = struct.unpack_from("<I", data, end)
        if masked_crc32c(payload) != data_crc:
            return out, f"data crc mismatch at record {len(out)}"
        out.append(payload)
        pos = end + 4
    return out, None


def write_tfrecords(
    records: list[bytes], path: str, *, compress: str | None = None
) -> None:
    """Fixture writer: records -> one TFRecord shard; `compress` in
    {None, 'gzip', 'bz2'}."""
    import bz2
    import gzip

    parts = []
    for raw in records:
        raw = bytes(raw)
        header = struct.pack("<Q", len(raw))
        parts.append(header)
        parts.append(struct.pack("<I", masked_crc32c(header)))
        parts.append(raw)
        parts.append(struct.pack("<I", masked_crc32c(raw)))
    data = b"".join(parts)
    if compress == "gzip":
        data = gzip.compress(data, mtime=0)
    elif compress == "bz2":
        data = bz2.compress(data)
    elif compress is not None:
        raise ValueError(f"unknown compress: {compress}")
    with open(path, "wb") as f:
        f.write(data)


def read_tfrecords(
    spark: SparkSession,
    path: str,
    *,
    max_bytes: int = _DEFAULT_MAX_BYTES,
) -> DataFrame:
    """Read TFRecord shard(s) at `path` (glob ok) into one row per
    record (module contract)."""
    src = spark.read.format("binaryFile").load(path)

    def run(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            rows = []
            for fname, content in zip(pdf["path"], pdf["content"]):
                try:
                    data = _decompress(bytes(content), fname, max_bytes)
                except (ValueError, OSError, EOFError, zlib.error) as e:
                    rows.append((fname, None, None, None,
                                 f"bad shard: {e}"))
                    continue
                recs, err = split_tfrecords(data)
                for i, payload in enumerate(recs):
                    rows.append((
                        fname, i, bytearray(payload),
                        len(payload), None,
                    ))
                if err is not None:
                    rows.append((fname, len(recs), None, None, err))
            out = pd.DataFrame(rows, columns=[
                "file", "rec_index", "payload", "n_bytes", "error",
            ])
            out["rec_index"] = pd.array(out["rec_index"], dtype="Int32")
            out["n_bytes"] = pd.array(out["n_bytes"], dtype="Int64")
            yield out

    return src.select("path", "content").mapInPandas(
        run, schema=TFRECORD_SCHEMA
    )
