"""CBOR record-shard ingestion — RFC 8949 (Concise Binary Object
Representation) items and RFC 8742 CBOR sequences into census rows
and committed-schema typed columns.

CBOR is the IETF's binary JSON: web archives, sensor/event streams,
and COSE-adjacent tooling ship record shards as back-to-back CBOR
items (a "CBOR sequence", RFC 8742 — the same one-item-per-record
framing as ndjson). This module is a from-scratch wire decoder in
the same spirit as the TFRecord proto walker: no third-party CBOR
library, just the spec.

Decoder (`decode_cbor`) coverage:
- major types 0/1 (unsigned / negative integers, all argument
  widths incl. the 8-byte form),
- 2/3 (byte / text strings, definite AND indefinite-length with
  chunk-type enforcement: an indefinite text string may only chain
  definite TEXT chunks, per RFC 8949 §3.2.3),
- 4/5 (arrays / maps, definite and indefinite; duplicate map keys
  are REJECTED — the spec lets a decoder choose, and a dedup
  pipeline must never silently drop a colliding record field),
- 6 (tags — surfaced as `Tag(number, value)`, never interpreted:
  interpretation is the caller's schema commitment),
- 7 (false/true/null/undefined, simple values, and half/single/
  double floats — half decoded via the binary16 layout),
- strict well-formedness: reserved additional-info values (28-30),
  a break (0xFF) outside an indefinite container, truncation, bad
  UTF-8 in text, and over-deep nesting (default 64) all raise.

`read_cbor_records` reads shard files that are CBOR sequences, one
census row per top-level item. Framing is self-delimiting, so a
malformed item POISONS THE REST of its shard (there is no way to
resync) — the reader stops with one honest error row carrying the
failed record index, exactly the TFRecord corruption stance.

`cbor_extract` is the consumption side: the caller commits
{key: kind} over top-level-map records (kind in {'int','float',
'text','bool','bytes','array<long>','array<double>','array<text>'})
and each committed key
becomes a real typed column; absent key -> NULL (sparse is normal),
wrong kind or non-map record -> the record quarantines (all
committed columns NULL + error; silent coercion would corrupt
training data) — the same laws as `tfrecord.tf_example_decode`.

Scale shape: one binaryFile task per shard, Arrow-batched
mapInPandas; per-byte Python is inherent to wire decoding and the
shard count is the parallelism unit (TFRecord/NPY/WARC stance).

Derived from RFC 8949 / RFC 8742 (public IETF specs); the reference
(src/sodaspark/scan.py:441-442) scans already-loaded frames —
container ingestion is additive surface.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "CBOR_SCHEMA",
    "Tag",
    "Undefined",
    "decode_cbor",
    "encode_cbor",
    "read_cbor_records",
    "cbor_extract",
]

CBOR_SCHEMA = (
    "file string, rec_index int, major string, n_children int,"
    " nbytes long, error string"
)


@dataclass(frozen=True)
class Tag:
    """An RFC 8949 tagged value, surfaced uninterpreted."""

    number: int
    value: object


class Undefined:
    """The CBOR `undefined` simple value (0xF7) — distinct from null."""

    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return "Undefined"


UNDEFINED = Undefined()


def _arg(data: bytes, pos: int, ai: int) -> tuple[int | None, int]:
    """Decode the additional-info argument. Returns (value, new_pos);
    value None means indefinite (ai=31)."""
    if ai < 24:
        return ai, pos
    if ai == 24:
        if pos >= len(data):
            raise ValueError("truncated argument")
        return data[pos], pos + 1
    if ai == 25:
        if pos + 2 > len(data):
            raise ValueError("truncated argument")
        return int.from_bytes(data[pos : pos + 2], "big"), pos + 2
    if ai == 26:
        if pos + 4 > len(data):
            raise ValueError("truncated argument")
        return int.from_bytes(data[pos : pos + 4], "big"), pos + 4
    if ai == 27:
        if pos + 8 > len(data):
            raise ValueError("truncated argument")
        return int.from_bytes(data[pos : pos + 8], "big"), pos + 8
    if ai == 31:
        return None, pos
    raise ValueError(f"reserved additional info {ai}")


def _hashable(v) -> bool:
    return isinstance(v, (int, float, str, bytes, bool, frozenset,
                          tuple)) or v is None or v is UNDEFINED


def _decode(data: bytes, pos: int, depth: int):
    if depth < 0:
        raise ValueError("nesting too deep")
    if pos >= len(data):
        raise ValueError("truncated item")
    ib = data[pos]
    mt, ai = ib >> 5, ib & 0x1F
    pos += 1
    arg, pos = _arg(data, pos, ai)

    if mt == 0:
        if arg is None:
            raise ValueError("indefinite length on an integer")
        return arg, pos
    if mt == 1:
        if arg is None:
            raise ValueError("indefinite length on an integer")
        return -1 - arg, pos

    if mt in (2, 3):
        if arg is not None:
            if pos + arg > len(data):
                raise ValueError("truncated string payload")
            raw = data[pos : pos + arg]
            pos += arg
        else:
            # indefinite: chain DEFINITE chunks of the same type
            chunks = []
            while True:
                if pos >= len(data):
                    raise ValueError("truncated indefinite string")
                if data[pos] == 0xFF:
                    pos += 1
                    break
                cmt, cai = data[pos] >> 5, data[pos] & 0x1F
                if cmt != mt or cai == 31:
                    raise ValueError(
                        "indefinite string chunk must be a definite "
                        "string of the same type"
                    )
                chunk, pos = _decode(data, pos, depth - 1)
                chunks.append(
                    chunk if mt == 2 else chunk.encode("utf-8")
                )
            raw = b"".join(chunks)
        if mt == 2:
            return bytes(raw), pos
        try:
            return raw.decode("utf-8"), pos
        except UnicodeDecodeError as e:
            raise ValueError(f"invalid UTF-8 in text string: {e}")

    if mt == 4:
        out = []
        if arg is not None:
            for _ in range(arg):
                v, pos = _decode(data, pos, depth - 1)
                out.append(v)
        else:
            while True:
                if pos >= len(data):
                    raise ValueError("truncated indefinite array")
                if data[pos] == 0xFF:
                    pos += 1
                    break
                v, pos = _decode(data, pos, depth - 1)
                out.append(v)
        return out, pos

    if mt == 5:
        out: dict = {}
        def put(k, v):
            if not _hashable(k):
                raise ValueError("unhashable map key")
            if k in out:
                raise ValueError(f"duplicate map key {k!r}")
            out[k] = v
        if arg is not None:
            for _ in range(arg):
                k, pos2 = _decode(data, pos, depth - 1)
                v, pos = _decode(data, pos2, depth - 1)
                put(k, v)
        else:
            while True:
                if pos >= len(data):
                    raise ValueError("truncated indefinite map")
                if data[pos] == 0xFF:
                    pos += 1
                    break
                k, pos2 = _decode(data, pos, depth - 1)
                v, pos = _decode(data, pos2, depth - 1)
                put(k, v)
        return out, pos

    if mt == 6:
        if arg is None:
            raise ValueError("indefinite length on a tag")
        v, pos = _decode(data, pos, depth - 1)
        return Tag(arg, v), pos

    # mt == 7
    if ai == 20:
        return False, pos
    if ai == 21:
        return True, pos
    if ai == 22:
        return None, pos
    if ai == 23:
        return UNDEFINED, pos
    if ai == 24:
        if arg < 32:
            raise ValueError(f"invalid two-byte simple value {arg}")
        return ("simple", arg), pos
    if ai < 20:
        return ("simple", ai), pos
    if ai == 25:
        return struct.unpack(">e", data[pos - 2 : pos])[0], pos
    if ai == 26:
        return struct.unpack(">f", data[pos - 4 : pos])[0], pos
    if ai == 27:
        return struct.unpack(">d", data[pos - 8 : pos])[0], pos
    if ai == 31:
        raise ValueError("unexpected break (0xFF) outside a container")
    raise ValueError(f"reserved additional info {ai}")  # 28-30


def decode_cbor(
    data: bytes, pos: int = 0, *, max_depth: int = 64
) -> tuple[object, int]:
    """Decode ONE item starting at `pos` (module contract). Returns
    (value, next_pos). ValueError on any well-formedness violation."""
    return _decode(bytes(data), pos, max_depth)


def _encode_int(mt: int, n: int) -> bytes:
    """Head byte + shortest-form argument (RFC 8949 preferred)."""
    if n < 24:
        return bytes([(mt << 5) | n])
    if n < 0x100:
        return bytes([(mt << 5) | 24, n])
    if n < 0x10000:
        return bytes([(mt << 5) | 25]) + n.to_bytes(2, "big")
    if n < 0x100000000:
        return bytes([(mt << 5) | 26]) + n.to_bytes(4, "big")
    return bytes([(mt << 5) | 27]) + n.to_bytes(8, "big")


def encode_cbor(value) -> bytes:
    """Fixture encoder: definite lengths, shortest integer heads,
    floats always binary64 (one deterministic width — fixtures and
    oracles replay values, not encodings)."""
    if value is True:
        return b"\xf5"
    if value is False:
        return b"\xf4"
    if value is None:
        return b"\xf6"
    if value is UNDEFINED:
        return b"\xf7"
    if isinstance(value, Tag):
        return _encode_int(6, value.number) + encode_cbor(value.value)
    if isinstance(value, int):
        if value >= 0:
            return _encode_int(0, value)
        return _encode_int(1, -1 - value)
    if isinstance(value, float):
        return b"\xfb" + struct.pack(">d", value)
    if isinstance(value, bytes):
        return _encode_int(2, len(value)) + value
    if isinstance(value, str):
        raw = value.encode("utf-8")
        return _encode_int(3, len(raw)) + raw
    if isinstance(value, (list, tuple)):
        return _encode_int(4, len(value)) + b"".join(
            encode_cbor(v) for v in value
        )
    if isinstance(value, dict):
        return _encode_int(5, len(value)) + b"".join(
            encode_cbor(k) + encode_cbor(v) for k, v in value.items()
        )
    raise TypeError(f"cannot encode {type(value).__name__}")


def _major_of(v) -> tuple[str, int | None]:
    """Census classification: (major, n_children)."""
    if isinstance(v, bool):
        return "bool", None
    if isinstance(v, int):
        return ("uint", None) if v >= 0 else ("nint", None)
    if isinstance(v, float):
        return "float", None
    if isinstance(v, bytes):
        return "bytes", len(v)
    if isinstance(v, str):
        return "text", len(v)
    if isinstance(v, list):
        return "array", len(v)
    if isinstance(v, dict):
        return "map", len(v)
    if isinstance(v, Tag):
        return "tag", 1
    if v is None:
        return "null", None
    if v is UNDEFINED:
        return "undefined", None
    return "simple", None


def read_cbor_records(
    spark: SparkSession, path: str, *, max_depth: int = 64
) -> DataFrame:
    """Read CBOR-sequence shard(s) at `path`: one census row per
    top-level item (module contract). A malformed item stops its
    shard with one error row at the first untrusted index — CBOR
    framing is self-delimiting, so nothing after a bad item can be
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
                        v, nxt = decode_cbor(
                            data, pos, max_depth=max_depth
                        )
                    except ValueError as e:
                        rows.append((
                            fname, idx, None, None, None,
                            f"bad cbor: {e}"[:500],
                        ))
                        break
                    major, nch = _major_of(v)
                    rows.append(
                        (fname, idx, major, nch, nxt - pos, None)
                    )
                    pos, idx = nxt, idx + 1
            out = pd.DataFrame(rows, columns=[
                "file", "rec_index", "major", "n_children", "nbytes",
                "error",
            ])
            for c in ("rec_index", "n_children"):
                out[c] = pd.array(out[c], dtype="Int32")
            out["nbytes"] = pd.array(out["nbytes"], dtype="Int64")
            yield out

    return src.select("path", "content").mapInPandas(
        run, schema=CBOR_SCHEMA
    )


_EXTRACT_KINDS = {
    "int", "float", "text", "bool", "bytes",
    "array<long>", "array<double>", "array<text>",
}

# committed 'int' / 'array<long>' values must fit Spark's LongType:
# a legal CBOR uint64 >= 2^63 would otherwise overflow at the Arrow
# conversion OUTSIDE the per-record try and crash the task instead of
# quarantining (round-19 advice)
_I64_MIN, _I64_MAX = -(1 << 63), (1 << 63) - 1


def cbor_extract(
    df: "DataFrame",
    id_col: str,
    payload_col: str,
    fields: dict[str, str],
) -> "DataFrame":
    """Committed-schema extraction over one-CBOR-map-per-record
    payload columns (module contract; laws in the module docstring).
    `bytes` values surface as lowercase hex strings — one explicit,
    deterministic text form. Array kinds (`array<long>`,
    `array<double>`, `array<text>`) commit a homogeneous CBOR array:
    every element must match the element kind (tags/embeddings/
    tool-call payloads); a mixed or mistyped array quarantines the
    record like any other kind violation. Committed integers (scalar
    and array elements) must fit int64 — a legal CBOR uint64 beyond
    2^63-1 is a kind violation, quarantined, never a task crash."""
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
                # rid passes through UNCONVERTED: the output schema
                # advertises the caller's id dataType, so a string or
                # other non-integer doc id must round-trip as-is
                # (round-19 advice; the old int(rid) raised on them)
                try:
                    rec, nxt = decode_cbor(bytes(payload))
                    if not isinstance(rec, dict):
                        raise ValueError("record is not a CBOR map")
                    if nxt != len(bytes(payload)):
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
