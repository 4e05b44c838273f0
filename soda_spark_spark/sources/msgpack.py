"""MessagePack record-shard ingestion — the msgpack wire format
(github.com/msgpack/msgpack spec.md) into census rows and
committed-schema typed columns.

MessagePack is CBOR's older sibling: the compact binary-JSON wire
format ML cache layers, feature stores, and RPC dumps actually ship
(Redis/Fluentd/Kafka payloads, `datasets` arrow-alternative caches).
Shards are back-to-back top-level objects — the same one-object-per-
record framing as a CBOR sequence (RFC 8742) or ndjson. This module
is a from-scratch wire decoder in the same spirit as
`sources/cbor.py` / the TFRecord proto walker: no third-party
msgpack library, just the public spec.

Decoder (`decode_msgpack`) coverage — every format-family byte:
- positive/negative fixint, uint 8/16/32/64, int 8/16/32/64 (a
  uint64 up to 2^64-1 decodes exactly; range enforcement happens at
  the COMMIT layer, where int64 is the promise),
- fixstr / str 8/16/32 (STRICT UTF-8 — the spec says str carries
  UTF-8; a shard that lies quarantines rather than mojibakes),
- bin 8/16/32 (raw bytes),
- fixarray / array 16/32, fixmap / map 16/32 — DUPLICATE map keys
  are REJECTED (the spec is silent; a dedup pipeline must never
  silently drop a colliding record field — the CBOR module's
  stance), and map keys must be scalars (a map/array key raises),
- nil / false / true, float 32/64,
- fixext 1/2/4/8/16 and ext 8/16/32 — surfaced as `Ext(code,
  data)`, NEVER interpreted (even the spec's own timestamp ext -1:
  interpretation is the caller's schema commitment, the CBOR Tag
  stance),
- strict well-formedness: 0xc1 (spec: "never used"), truncation,
  and over-deep nesting (default 64) all raise.

`read_msgpack_records`: one census row per top-level object.
Framing is self-delimiting with NO resync point, so a malformed
object POISONS THE REST of its shard — the reader stops with one
honest error row carrying the failed record index (the TFRecord /
CBOR corruption stance).

`msgpack_extract`: the consumption side — the caller commits
{key: kind} over top-level-map records (kinds: int / float / text /
bool / bytes / array<long> / array<double> / array<text>), each
committed key becomes a typed column; absent key -> NULL (sparse is
normal); wrong kind, non-map record, mixed-type array, or an
integer outside int64 -> the record quarantines (all committed
columns NULL + error; silent coercion would corrupt training
data). Identical laws to `cbor_extract` / `tf_example_decode`,
including the id-column passthrough and name-collision refusals.

Scale shape: one binaryFile task per shard, Arrow-batched
mapInPandas; per-byte Python is inherent to wire decoding and the
shard count is the parallelism unit (TFRecord/CBOR/NPY stance).

Derived from the public msgpack spec (github.com/msgpack/msgpack,
spec.md); the reference (src/sodaspark/scan.py:441-442) scans
already-loaded frames — container ingestion is additive surface.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "MSGPACK_SCHEMA",
    "Ext",
    "decode_msgpack",
    "encode_msgpack",
    "read_msgpack_records",
    "msgpack_extract",
]

MSGPACK_SCHEMA = (
    "file string, rec_index int, kind string, n_children int,"
    " nbytes long, error string"
)


@dataclass(frozen=True)
class Ext:
    """A msgpack extension value, surfaced uninterpreted."""

    code: int
    data: bytes


def _need(data: bytes, pos: int, n: int) -> None:
    if pos + n > len(data):
        raise ValueError("truncated msgpack")


def _decode(data: bytes, pos: int, depth: int):
    if depth < 0:
        raise ValueError("nesting too deep")
    _need(data, pos, 1)
    b = data[pos]
    pos += 1
    if b <= 0x7F:  # positive fixint
        return b, pos
    if b >= 0xE0:  # negative fixint
        return b - 0x100, pos
    if 0x80 <= b <= 0x8F:
        return _map(data, pos, b & 0x0F, depth)
    if 0x90 <= b <= 0x9F:
        return _array(data, pos, b & 0x0F, depth)
    if 0xA0 <= b <= 0xBF:
        return _str(data, pos, b & 0x1F)
    if b == 0xC0:
        return None, pos
    if b == 0xC1:
        raise ValueError("reserved byte 0xc1")
    if b == 0xC2:
        return False, pos
    if b == 0xC3:
        return True, pos
    if b in (0xC4, 0xC5, 0xC6):  # bin 8/16/32
        n, pos = _len(data, pos, 1 << (b - 0xC4))
        _need(data, pos, n)
        return data[pos : pos + n], pos + n
    if b in (0xC7, 0xC8, 0xC9):  # ext 8/16/32
        n, pos = _len(data, pos, 1 << (b - 0xC7))
        _need(data, pos, 1 + n)
        code = struct.unpack_from(">b", data, pos)[0]
        return Ext(code, data[pos + 1 : pos + 1 + n]), pos + 1 + n
    if b == 0xCA:
        _need(data, pos, 4)
        return struct.unpack_from(">f", data, pos)[0], pos + 4
    if b == 0xCB:
        _need(data, pos, 8)
        return struct.unpack_from(">d", data, pos)[0], pos + 8
    if 0xCC <= b <= 0xCF:  # uint 8/16/32/64
        n = 1 << (b - 0xCC)
        _need(data, pos, n)
        return int.from_bytes(data[pos : pos + n], "big"), pos + n
    if 0xD0 <= b <= 0xD3:  # int 8/16/32/64
        n = 1 << (b - 0xD0)
        _need(data, pos, n)
        return (
            int.from_bytes(data[pos : pos + n], "big", signed=True),
            pos + n,
        )
    if 0xD4 <= b <= 0xD8:  # fixext 1/2/4/8/16
        n = 1 << (b - 0xD4)
        _need(data, pos, 1 + n)
        code = struct.unpack_from(">b", data, pos)[0]
        return Ext(code, data[pos + 1 : pos + 1 + n]), pos + 1 + n
    if b in (0xD9, 0xDA, 0xDB):  # str 8/16/32
        n, pos = _len(data, pos, 1 << (b - 0xD9))
        return _str(data, pos, n)
    if b in (0xDC, 0xDD):  # array 16/32
        n, pos = _len(data, pos, 2 << (b - 0xDC))
        return _array(data, pos, n, depth)
    if b in (0xDE, 0xDF):  # map 16/32
        n, pos = _len(data, pos, 2 << (b - 0xDE))
        return _map(data, pos, n, depth)
    raise ValueError(f"unhandled format byte 0x{b:02x}")


def _len(data: bytes, pos: int, width: int) -> tuple[int, int]:
    _need(data, pos, width)
    return int.from_bytes(data[pos : pos + width], "big"), pos + width


def _str(data: bytes, pos: int, n: int):
    _need(data, pos, n)
    try:
        return data[pos : pos + n].decode("utf-8"), pos + n
    except UnicodeDecodeError as e:
        raise ValueError(f"invalid utf-8 in str: {e}") from e


def _array(data: bytes, pos: int, n: int, depth: int):
    out = []
    for _ in range(n):
        v, pos = _decode(data, pos, depth - 1)
        out.append(v)
    return out, pos


def _map(data: bytes, pos: int, n: int, depth: int):
    out = {}
    for _ in range(n):
        k, pos = _decode(data, pos, depth - 1)
        if isinstance(k, (dict, list, bytearray)) or isinstance(
            k, Ext
        ):
            raise ValueError("unsupported non-scalar map key")
        if isinstance(k, bytes):
            k = ("bytes", k)  # keep bin keys distinct from str keys
        if k in out:
            raise ValueError(f"duplicate map key {k!r}")
        v, pos = _decode(data, pos, depth - 1)
        out[k] = v
    return out, pos


def decode_msgpack(
    data: bytes, pos: int = 0, *, max_depth: int = 64
):
    """Decode ONE msgpack object at `pos` -> (value, next_pos);
    raises ValueError on any well-formedness violation (module
    contract; laws in the module docstring)."""
    return _decode(data, pos, max_depth)


def encode_msgpack(value) -> bytes:
    """Canonical-enough encoder for fixtures/tests: smallest-width
    integers, float64 for floats, str/bin/array/map with the
    smallest framing that fits, `Ext` passthrough."""
    if value is None:
        return b"\xc0"
    if value is True:
        return b"\xc3"
    if value is False:
        return b"\xc2"
    if isinstance(value, int):
        if 0 <= value <= 0x7F:
            return bytes([value])
        if -32 <= value < 0:
            return bytes([value & 0xFF])
        if value >= 0:
            for code, width in ((0xCC, 1), (0xCD, 2), (0xCE, 4),
                                (0xCF, 8)):
                if value < (1 << (8 * width)):
                    return bytes([code]) + value.to_bytes(width, "big")
            raise ValueError("integer too large for msgpack")
        for code, width in ((0xD0, 1), (0xD1, 2), (0xD2, 4),
                            (0xD3, 8)):
            if -(1 << (8 * width - 1)) <= value:
                return bytes([code]) + value.to_bytes(
                    width, "big", signed=True
                )
        raise ValueError("integer too small for msgpack")
    if isinstance(value, float):
        return b"\xcb" + struct.pack(">d", value)
    if isinstance(value, str):
        raw = value.encode("utf-8")
        n = len(raw)
        if n <= 31:
            return bytes([0xA0 | n]) + raw
        for code, width in ((0xD9, 1), (0xDA, 2), (0xDB, 4)):
            if n < (1 << (8 * width)):
                return bytes([code]) + n.to_bytes(width, "big") + raw
    if isinstance(value, (bytes, bytearray)):
        raw = bytes(value)
        n = len(raw)
        for code, width in ((0xC4, 1), (0xC5, 2), (0xC6, 4)):
            if n < (1 << (8 * width)):
                return bytes([code]) + n.to_bytes(width, "big") + raw
    if isinstance(value, Ext):
        n = len(value.data)
        if n in (1, 2, 4, 8, 16):
            code = 0xD4 + n.bit_length() - 1
            return (bytes([code])
                    + struct.pack(">b", value.code) + value.data)
        if n < 256:
            return (b"\xc7" + bytes([n])
                    + struct.pack(">b", value.code) + value.data)
        raise ValueError("ext too long for the fixture encoder")
    if isinstance(value, (list, tuple)):
        n = len(value)
        if n <= 15:
            head = bytes([0x90 | n])
        elif n < (1 << 16):
            head = b"\xdc" + n.to_bytes(2, "big")
        else:
            head = b"\xdd" + n.to_bytes(4, "big")
        return head + b"".join(encode_msgpack(v) for v in value)
    if isinstance(value, dict):
        n = len(value)
        if n <= 15:
            head = bytes([0x80 | n])
        elif n < (1 << 16):
            head = b"\xde" + n.to_bytes(2, "big")
        else:
            head = b"\xdf" + n.to_bytes(4, "big")
        return head + b"".join(
            encode_msgpack(k) + encode_msgpack(v)
            for k, v in value.items()
        )
    raise ValueError(f"cannot encode {type(value).__name__}")


def _kind_of(v) -> tuple[str, int | None]:
    if v is None:
        return "nil", None
    if isinstance(v, bool):
        return "bool", None
    if isinstance(v, int):
        return "int", None
    if isinstance(v, float):
        return "float", None
    if isinstance(v, str):
        return "str", None
    if isinstance(v, bytes):
        return "bin", None
    if isinstance(v, list):
        return "array", len(v)
    if isinstance(v, dict):
        return "map", len(v)
    if isinstance(v, Ext):
        return "ext", None
    return type(v).__name__, None


def read_msgpack_records(
    spark: SparkSession, path: str, *, max_depth: int = 64
) -> DataFrame:
    """Read msgpack-sequence shard(s) at `path`: one census row per
    top-level object (module contract). A malformed object stops its
    shard with one error row at the first untrusted index — msgpack
    framing is self-delimiting, so nothing after a bad object can be
    trusted."""
    src = spark.read.format("binaryFile").load(path)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for fname, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                pos, idx = 0, 0
                while pos < len(data):
                    try:
                        v, nxt = decode_msgpack(
                            data, pos, max_depth=max_depth
                        )
                    except ValueError as e:
                        rows.append((
                            fname, idx, None, None, None,
                            f"bad msgpack: {e}"[:500],
                        ))
                        break
                    kind, nch = _kind_of(v)
                    rows.append(
                        (fname, idx, kind, nch, nxt - pos, None)
                    )
                    pos, idx = nxt, idx + 1
            out = pd.DataFrame(rows, columns=[
                "file", "rec_index", "kind", "n_children", "nbytes",
                "error",
            ])
            for c in ("rec_index", "n_children"):
                out[c] = pd.array(out[c], dtype="Int32")
            out["nbytes"] = pd.array(out["nbytes"], dtype="Int64")
            yield out

    return src.select("path", "content").mapInPandas(
        run, schema=MSGPACK_SCHEMA
    )


_EXTRACT_KINDS = {
    "int", "float", "text", "bool", "bytes",
    "array<long>", "array<double>", "array<text>",
}

_I64_MIN, _I64_MAX = -(1 << 63), (1 << 63) - 1


def msgpack_extract(
    df: "DataFrame",
    id_col: str,
    payload_col: str,
    fields: dict[str, str],
) -> "DataFrame":
    """Committed-schema extraction over one-msgpack-map-per-record
    payload columns (module contract; laws in the module docstring —
    identical to `cbor_extract`: bytes surface as lowercase hex,
    array kinds commit homogeneous element types, committed integers
    must fit int64, record-level quarantine on any violation, the
    id column passes through unconverted)."""
    from pyspark.sql.types import (
        ArrayType, BooleanType, DoubleType, LongType, StringType,
        StructField, StructType,
    )

    for key, kind in fields.items():
        if kind not in _EXTRACT_KINDS:
            raise ValueError(
                f"unknown kind {kind!r} for {key!r}; pick from "
                f"{sorted(_EXTRACT_KINDS)}"
            )
        if key in (id_col, "error"):
            raise ValueError(
                f"committed key {key!r} collides with the {key!r} "
                f"output column; rename the id column or the key"
            )
    typ = {
        "int": LongType(), "float": DoubleType(), "text": StringType(),
        "bool": BooleanType(), "bytes": StringType(),
        "array<long>": ArrayType(LongType()),
        "array<double>": ArrayType(DoubleType()),
        "array<text>": ArrayType(StringType()),
    }
    id_field = df.select(id_col).schema.fields[0]
    keys = sorted(fields)
    schema = StructType(
        [StructField(id_col, id_field.dataType)]
        + [StructField(k, typ[fields[k]]) for k in keys]
        + [StructField("error", StringType())]
    )

    def run(batches):
        import pandas as pd

        def as_long(v, k):
            if isinstance(v, bool) or not isinstance(v, int):
                raise ValueError(f"key {k!r} is not int")
            if not _I64_MIN <= v <= _I64_MAX:
                raise ValueError(f"key {k!r} overflows int64")
            return v

        def pull(rec, k):
            if k not in rec:
                return None
            v, want = rec[k], fields[k]
            if want == "bool":
                if not isinstance(v, bool):
                    raise ValueError(f"key {k!r} is not bool")
                return v
            if want == "int":
                return as_long(v, k)
            if want == "float":
                if not isinstance(v, float):
                    raise ValueError(f"key {k!r} is not float")
                return v
            if want == "text":
                if not isinstance(v, str):
                    raise ValueError(f"key {k!r} is not text")
                return v
            if want.startswith("array<"):
                if not isinstance(v, list):
                    raise ValueError(f"key {k!r} is not an array")
                elem = want[6:-1]
                if elem == "long":
                    return [as_long(x, k) for x in v]
                if elem == "double":
                    if not all(isinstance(x, float) for x in v):
                        raise ValueError(
                            f"key {k!r} has non-float elements"
                        )
                    return list(v)
                if not all(isinstance(x, str) for x in v):
                    raise ValueError(f"key {k!r} has non-text elements")
                return list(v)
            if not isinstance(v, bytes):
                raise ValueError(f"key {k!r} is not bytes")
            return v.hex()

        for pdf in batches:
            rows = []
            for rid, payload in zip(
                pdf[id_col].values, pdf[payload_col].values
            ):
                try:
                    raw = bytes(payload)
                    rec, nxt = decode_msgpack(raw)
                    if not isinstance(rec, dict):
                        raise ValueError(
                            "record is not a msgpack map"
                        )
                    if nxt != len(raw):
                        raise ValueError("trailing bytes after record")
                    rows.append(
                        [rid] + [pull(rec, k) for k in keys] + [None]
                    )
                except Exception as e:
                    rows.append(
                        [rid] + [None] * len(keys)
                        + [f"{type(e).__name__}: {e}"[:500]]
                    )
            yield pd.DataFrame(
                rows, columns=[id_col] + keys + ["error"]
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)
