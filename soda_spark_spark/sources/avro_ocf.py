"""Avro Object Container File ingestion — the Kafka-archive / data-
warehouse interchange format into typed DataFrame rows, decoded
from scratch per the public Apache Avro 1.11 specification.

Container layout (spec "Object Container Files"):
- 4-byte magic ``Obj\\x01``;
- a file-metadata map (avro binary map encoding: block-counted
  key/value pairs) carrying at least ``avro.schema`` (the writer
  schema as JSON) and optionally ``avro.codec``;
- a random 16-byte sync marker;
- then data blocks: record count (zigzag varint), serialized size
  (zigzag varint), the (possibly compressed) records, and the sync
  marker again — a mismatched sync means corruption, and NOTHING
  after it can be trusted.

Binary encoding (spec "Binary Encoding"): int/long are zigzag
varints; float/double little-endian IEEE; bytes/string are
length-prefixed; fixed is its declared size raw; enum is the symbol
index; a union is the branch index followed by the branch value;
arrays and maps are blocks of counted items ending in a 0 count (a
negative count is followed by the block's byte size).

Design: the SCHEMA DRIVES THE OUTPUT — `read_avro_records` reads one
file's header driver-side (header only, never data blocks), derives
a Spark schema from the writer schema's top-level record fields, and
decodes every shard distributed. Supported (round 19 widened the
scope from flat primitives to the shapes real event-log Avro uses):
- primitives: null, boolean, int, long, float, double, bytes
  (surfaced as lowercase hex, one deterministic text form), string;
- enum (surfaced as its symbol) and fixed (surfaced as hex);
- NESTED RECORDS, flattened to dotted columns (``addr.city``) —
  a null record nulls all its child columns;
- arrays of primitives/enums/logical types -> typed array columns,
  and arrays of RECORDS-OF-SCALARS -> array<struct> columns (round
  20 — the lakehouse manifest shape: Iceberg `partitions` field
  summaries and column-stats k/v pair lists decode natively);
- maps of string -> primitive/enum/logical -> typed map columns;
- 2-branch ``[null, <supported>]`` unions anywhere (nullable);
- logical types: ``date`` (int -> DateType),
  ``timestamp-millis``/``timestamp-micros`` (long -> TimestampType,
  naive UTC), ``decimal(p<=38, s)`` on bytes/fixed (big-endian
  two's-complement unscaled -> DecimalType(p, s));
- NAMED-TYPE REFERENCES: a record/enum/fixed declared once may be
  referenced later by bare or namespace-qualified name (the Avro
  name rules); RECURSIVE references are rejected — a self-referential
  record has no finite flattened column set.
A writer schema using anything else (wider unions, arrays of
containers or of nullable/nested records) QUARANTINES the file with
an honest error row — stated scope, never silent mangling.

Laws:
- bad magic / metadata / schema JSON -> file error row;
- MIXED-SCHEMA GLOBS: the output schema is committed to the FIRST
  file's writer schema in `sorted(glob)` order (renaming files can
  change which file is first — the election is lexicographic and
  deliberate, documented here and pinned by test); every shard whose
  embedded schema differs from the committed one -> file error row
  (mixed schemas must not silently cast);
- ``avro.codec`` in {null, deflate, snappy} (deflate = raw zlib,
  RFC 1951, via zlib with wbits=-15; snappy = the raw snappy block
  format decoded from scratch per google/snappy
  format_description.txt, followed by the 4-byte big-endian CRC32 of
  the PLAINTEXT that the Avro spec appends — checked); zstd
  quarantines honestly;
- a sync-marker mismatch or a truncated block stops the shard with
  one error row at the first untrusted record index — the TFRecord
  corruption stance. The sync is validated BEFORE the block's
  records are emitted (it is the block's integrity witness), so a
  block with a bad trailing sync contributes no rows;
- record decode is strict: truncation, a bad union index, an
  out-of-range enum index, or an int/long/decimal outside its
  declared range (int: 32-bit, long: 64-bit — a 10-byte varint can
  legally encode past 2^63 and must quarantine, not overflow the
  Arrow conversion) stops the shard the same way.

Scale shape: one binaryFile task per shard; the driver touches ONE
header (bounded ranged read — URI globs are expanded driver-side via
`pyarrow.fs` so object-store paths work), never data. Per-record
Python is inherent to wire decoding; Arrow-batched mapInPandas is
the right channel, and shard count is the parallelism unit
(TFRecord/CBOR/NPY stance).

Derived from the Apache Avro 1.11.1 specification and the public
snappy format description (google/snappy format_description.txt);
the reference (src/sodaspark/scan.py:441-442) scans already-loaded
frames — container ingestion is additive surface.
"""

from __future__ import annotations

import io
import json
import struct

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "read_avro_records",
    "read_avro_split",
    "write_avro",
    "parse_avro_header",
]

_MAGIC = b"Obj\x01"

_PRIMITIVES = {
    "null", "boolean", "int", "long", "float", "double", "bytes",
    "string",
}

_INT_MIN, _INT_MAX = -(1 << 31), (1 << 31) - 1
_LONG_MIN, _LONG_MAX = -(1 << 63), (1 << 63) - 1

_MAX_NEST = 32


def _zigzag_decode(data: bytes, pos: int) -> tuple[int, int]:
    """Avro int/long: zigzag-encoded varint."""
    shift, acc = 0, 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated varint")
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")
    return (acc >> 1) ^ -(acc & 1), pos


def _zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    u &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_bytes(data: bytes, pos: int) -> tuple[bytes, int]:
    n, pos = _zigzag_decode(data, pos)
    if n < 0 or pos + n > len(data):
        raise ValueError("truncated bytes/string")
    return data[pos : pos + n], pos + n


def _read_meta_map(data: bytes, pos: int) -> tuple[dict, int]:
    """The file-metadata map: blocks of count (possibly negative =
    count+bytesize form) then key/value pairs, 0-count terminator."""
    out: dict[str, bytes] = {}
    while True:
        n, pos = _zigzag_decode(data, pos)
        if n == 0:
            return out, pos
        if n < 0:
            # negative count: followed by the block's byte size
            n = -n
            _, pos = _zigzag_decode(data, pos)
        for _ in range(n):
            k, pos = _read_bytes(data, pos)
            v, pos = _read_bytes(data, pos)
            out[k.decode("utf-8")] = v


# ---------------------------------------------------------------------------
# schema model: a recursive descriptor dict per field
#   {"k": kind, "nullable": bool, "null_first": bool, and per-kind
#    extras: symbols / size / precision / scale / items / values /
#    fields}
# kinds: the primitives, enum, fixed, date, timestamp-millis,
#        timestamp-micros, decimal, array, map, record
# ---------------------------------------------------------------------------

_LOGICAL_ON = {
    ("date", "int"): "date",
    ("timestamp-millis", "long"): "timestamp-millis",
    ("timestamp-micros", "long"): "timestamp-micros",
}


def _names_of(ftype, ns: str) -> tuple[str, str, str]:
    """(fullname, bare name, child namespace) for a named type per
    the Avro name rules: a dotted `name` IS the fullname; otherwise
    `namespace` (or the enclosing one) qualifies it."""
    nm = ftype.get("name")
    if not isinstance(nm, str) or not nm:
        raise ValueError("named type without a name")
    if "." in nm:
        return nm, nm.rsplit(".", 1)[1], nm.rsplit(".", 1)[0]
    space = ftype.get("namespace", ns)
    full = f"{space}.{nm}" if space else nm
    return full, nm, space


def _field_kind(
    ftype,
    depth: int = 0,
    named: dict | None = None,
    ns: str = "",
    open_names: set | None = None,
) -> dict:
    """Normalize one field's type -> descriptor. Raises ValueError
    for out-of-scope types. `named` is the registry of previously
    DECLARED record/enum/fixed types (a string that is not a
    primitive resolves through it — the Avro named-reference rule);
    `open_names` holds names still being declared, so a self- or
    mutually-recursive schema is rejected honestly (it has no finite
    flattened column set)."""
    if named is None:
        named = {}
    if open_names is None:
        open_names = set()
    if depth > _MAX_NEST:
        raise ValueError("schema nesting too deep")
    if isinstance(ftype, str):
        if ftype in _PRIMITIVES:
            return {"k": ftype, "nullable": False, "null_first": False}
        # Avro name resolution: an unqualified reference resolves in
        # the CURRENT namespace first (the spec's rule), falling back
        # to the bare registration only when no same-namespace
        # declaration exists (round 20 — qualified-first ordering, so
        # two types sharing a bare name across namespaces resolve to
        # the right one instead of last-declared-wins)
        keys = [ftype]
        if ns and "." not in ftype:
            keys.insert(0, f"{ns}.{ftype}")
        for key in keys:
            if key in open_names:
                raise ValueError(
                    f"unsupported recursive type {ftype!r}"
                )
            if key in named:
                return named[key]
        raise ValueError(f"unsupported field type {ftype!r}")
    if isinstance(ftype, dict):
        t = ftype.get("type")
        logical = ftype.get("logicalType")
        if logical is not None:
            if logical == "decimal" and t in ("bytes", "fixed"):
                p, s = ftype.get("precision"), ftype.get("scale", 0)
                if (
                    not isinstance(p, int) or isinstance(p, bool)
                    or not isinstance(s, int) or isinstance(s, bool)
                    or not 0 < p <= 38 or not 0 <= s <= p
                ):
                    raise ValueError(
                        f"unsupported decimal(precision={p!r}, "
                        f"scale={s!r})"
                    )
                d = {"k": "decimal", "nullable": False,
                     "null_first": False, "precision": p, "scale": s}
                if t == "fixed":
                    size = ftype.get("size")
                    if (
                        not isinstance(size, int)
                        or isinstance(size, bool) or size <= 0
                    ):
                        raise ValueError("fixed without a valid size")
                    d["size"] = size
                    full, bare, _ = _names_of(ftype, ns)
                    named[full] = d
                    named.setdefault(bare, d)
                return d
            mapped = _LOGICAL_ON.get((logical, t))
            if mapped is not None:
                return {"k": mapped, "nullable": False,
                        "null_first": False}
            # unknown logical annotation: per spec, fall back to the
            # underlying type rather than failing — re-normalize the
            # FULL declaration with logicalType stripped, so a
            # spec-defined case like `duration` on fixed(12), or any
            # unknown annotation on fixed/enum, keeps its
            # size/name/symbols instead of raising (round 20)
            return _field_kind(
                {k: v for k, v in ftype.items() if k != "logicalType"},
                depth + 1, named, ns, open_names,
            )
        if t == "enum":
            symbols = ftype.get("symbols")
            if not isinstance(symbols, list) or not symbols:
                raise ValueError("enum without symbols")
            d = {"k": "enum", "nullable": False,
                 "null_first": False, "symbols": list(symbols)}
            full, bare, _ = _names_of(ftype, ns)
            named[full] = d
            named.setdefault(bare, d)
            return d
        if t == "fixed":
            size = ftype.get("size")
            if (
                not isinstance(size, int) or isinstance(size, bool)
                or size <= 0
            ):
                raise ValueError("fixed without a valid size")
            d = {"k": "fixed", "nullable": False,
                 "null_first": False, "size": size}
            full, bare, _ = _names_of(ftype, ns)
            named[full] = d
            named.setdefault(bare, d)
            return d
        if t == "array":
            items = _field_kind(
                ftype.get("items"), depth + 1, named, ns, open_names
            )
            if items["k"] == "record":
                # array<record-of-scalars> (round 20 — the lakehouse
                # manifest shape: Iceberg field summaries and
                # column-stats k/v pairs): every subfield must be a
                # scalar (nullable ok); deeper nesting stays out of
                # the committed scope
                bad = [
                    n for n, fd in items["fields"]
                    if fd["k"] in ("array", "map", "record")
                ]
                if bad or items["nullable"]:
                    raise ValueError(
                        "unsupported array items (record elements "
                        "must be non-null records of scalar fields; "
                        f"{bad!r} violate)"
                    )
            elif items["k"] in ("array", "map") or items["nullable"]:
                raise ValueError(
                    "unsupported array items (primitives/enum/"
                    "logical/record-of-scalars only)"
                )
            return {"k": "array", "nullable": False,
                    "null_first": False, "items": items}
        if t == "map":
            values = _field_kind(
                ftype.get("values"), depth + 1, named, ns, open_names
            )
            if values["k"] in ("array", "map", "record") or values[
                "nullable"
            ]:
                raise ValueError(
                    "unsupported map values (primitives/enum/"
                    "logical only)"
                )
            return {"k": "map", "nullable": False,
                    "null_first": False, "values": values}
        if t == "record":
            flds = ftype.get("fields")
            if not isinstance(flds, list):
                raise ValueError("record schema without fields")
            full, bare, child_ns = _names_of(ftype, ns)
            open_names |= {full, bare}
            out = []
            for f in flds:
                name = f.get("name")
                if not isinstance(name, str):
                    raise ValueError("field without a name")
                out.append((name, _field_kind(
                    f.get("type"), depth + 1, named, child_ns,
                    open_names,
                )))
            open_names -= {full, bare}
            d = {"k": "record", "nullable": False,
                 "null_first": False, "fields": out}
            named[full] = d
            named.setdefault(bare, d)
            return d
        if isinstance(t, (str, list, dict)) and t != ftype:
            # {"type": "string"} wrapper form
            return _field_kind(t, depth + 1, named, ns, open_names)
        raise ValueError(f"unsupported field type {t!r}")
    if isinstance(ftype, list):
        if len(ftype) == 2 and "null" in ftype:
            other = ftype[0] if ftype[1] == "null" else ftype[1]
            d = _field_kind(other, depth + 1, named, ns, open_names)
            if d["k"] == "null" or d["nullable"]:
                raise ValueError("union of null with null")
            d = dict(d)
            d["nullable"] = True
            d["null_first"] = ftype[0] == "null"
            return d
        raise ValueError(f"unsupported union {ftype!r}")
    raise ValueError(f"unsupported field type {ftype!r}")


def _parse_schema(schema_json: str) -> list[tuple[str, dict]]:
    """Writer schema -> [(name, descriptor)] for the top-level record
    fields. Named types (record/enum/fixed) declared anywhere in the
    schema are registered and may be REFERENCED by name afterwards —
    the Avro named-reference rule; recursive references are rejected
    (no finite flattened column set)."""
    schema = json.loads(schema_json)
    if not isinstance(schema, dict) or schema.get("type") != "record":
        raise ValueError("writer schema is not a record")
    fields = schema.get("fields")
    if not isinstance(fields, list):
        raise ValueError("record schema without fields")
    named: dict = {}
    full, bare, child_ns = _names_of(schema, "")
    open_names = {full, bare}
    out = []
    for f in fields:
        name, ftype = f.get("name"), f.get("type")
        if not isinstance(name, str):
            raise ValueError("field without a name")
        out.append((name, _field_kind(
            ftype, 0, named, child_ns, open_names,
        )))
    return out


def _flat_columns(fields: list[tuple[str, dict]], prefix: str = ""):
    """Flatten [(name, descriptor)] to [(colname, descriptor)] leaf
    columns — nested records become dotted names; everything else is
    itself a leaf."""
    out = []
    for name, d in fields:
        col = f"{prefix}{name}"
        if d["k"] == "record":
            out.extend(_flat_columns(d["fields"], f"{col}."))
        else:
            out.append((col, d))
    return out


def parse_avro_header(data: bytes) -> tuple[str, str, bytes, int]:
    """(schema_json, codec, sync_marker, first_block_pos); ValueError
    on any header-law violation (module contract)."""
    if data[:4] != _MAGIC:
        raise ValueError("bad magic: not an Avro object container")
    meta, pos = _read_meta_map(data, 4)
    if "avro.schema" not in meta:
        raise ValueError("missing avro.schema in file metadata")
    schema_json = meta["avro.schema"].decode("utf-8")
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate", "snappy"):
        raise ValueError(f"unsupported codec {codec!r}")
    if pos + 16 > len(data):
        raise ValueError("truncated sync marker")
    return schema_json, codec, data[pos : pos + 16], pos + 16


# ---------------------------------------------------------------------------
# snappy raw block format (google/snappy format_description.txt):
# a little-endian base-128 varint of the uncompressed length, then
# tagged elements — literals (tag&3 == 0) and back-reference copies
# with 1-, 2-, or 4-byte little-endian offsets (tag&3 == 1/2/3).
# ---------------------------------------------------------------------------


def _snappy_decompress(data: bytes, max_out: int) -> bytes:
    pos, shift, ulen = 0, 0, 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated snappy preamble")
        b = data[pos]
        pos += 1
        ulen |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 35:
            raise ValueError("snappy length varint too long")
    if ulen > max_out:
        raise ValueError(f"block plaintext exceeds {max_out} bytes")
    out = bytearray()
    while pos < len(data):
        tag = data[pos]
        pos += 1
        ttype = tag & 3
        if ttype == 0:  # literal
            ln = (tag >> 2) + 1
            if ln > 60:
                nb = ln - 60
                if pos + nb > len(data):
                    raise ValueError("truncated snappy literal length")
                ln = int.from_bytes(data[pos : pos + nb], "little") + 1
                pos += nb
            if pos + ln > len(data):
                raise ValueError("truncated snappy literal")
            if len(out) + ln > ulen:
                raise ValueError("snappy output overrun")
            out += data[pos : pos + ln]
            pos += ln
            continue
        if ttype == 1:
            ln = ((tag >> 2) & 7) + 4
            if pos >= len(data):
                raise ValueError("truncated snappy copy")
            off = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif ttype == 2:
            ln = (tag >> 2) + 1
            if pos + 2 > len(data):
                raise ValueError("truncated snappy copy")
            off = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
        else:
            ln = (tag >> 2) + 1
            if pos + 4 > len(data):
                raise ValueError("truncated snappy copy")
            off = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        if off == 0 or off > len(out):
            raise ValueError("bad snappy copy offset")
        if len(out) + ln > ulen:
            raise ValueError("snappy output overrun")
        start = len(out) - off
        if off >= ln:
            out += out[start : start + ln]
        else:
            # overlapping copy repeats the trailing pattern
            chunk = bytes(out[start:])
            out += (chunk * (ln // off + 1))[:ln]
    if len(out) != ulen:
        raise ValueError("snappy length mismatch")
    return bytes(out)


def _snappy_compress(data: bytes) -> bytes:
    """Fixture-side compressor: emits one all-literal stream — valid
    snappy (the format does not require back-references)."""
    out = bytearray()
    u = len(data)
    while True:
        b = u & 0x7F
        u >>= 7
        out.append(b | 0x80 if u else b)
        if not u:
            break
    pos = 0
    while pos < len(data) or (pos == 0 and not data):
        ln = min(len(data) - pos, 1 << 16)
        if not ln:
            break
        if ln <= 60:
            out.append((ln - 1) << 2)
        else:
            out.append(61 << 2)  # 2-byte literal length
            out += (ln - 1).to_bytes(2, "little")
        out += data[pos : pos + ln]
        pos += ln
    return bytes(out)


# ---------------------------------------------------------------------------
# value decode
# ---------------------------------------------------------------------------


def _check_long(v: int, bits: int) -> int:
    lo, hi = (_INT_MIN, _INT_MAX) if bits == 32 else (_LONG_MIN, _LONG_MAX)
    if not lo <= v <= hi:
        raise ValueError(f"integer {v} outside {bits}-bit range")
    return v


def _decode_scalar(data, pos, d):
    """Decode one non-container value per descriptor `d` (no union
    prefix — the caller handles nullability)."""
    k = d["k"]
    if k == "null":
        return None, pos
    if k == "boolean":
        if pos >= len(data):
            raise ValueError("truncated boolean")
        b = data[pos]
        if b not in (0, 1):
            raise ValueError(f"bad boolean byte {b}")
        return b == 1, pos + 1
    if k == "int":
        v, pos = _zigzag_decode(data, pos)
        return _check_long(v, 32), pos
    if k == "long":
        v, pos = _zigzag_decode(data, pos)
        return _check_long(v, 64), pos
    if k == "float":
        if pos + 4 > len(data):
            raise ValueError("truncated float")
        return struct.unpack("<f", data[pos : pos + 4])[0], pos + 4
    if k == "double":
        if pos + 8 > len(data):
            raise ValueError("truncated double")
        return struct.unpack("<d", data[pos : pos + 8])[0], pos + 8
    if k == "bytes":
        raw, pos = _read_bytes(data, pos)
        return raw.hex(), pos
    if k == "string":
        raw, pos = _read_bytes(data, pos)
        return raw.decode("utf-8"), pos
    if k == "enum":
        idx, pos = _zigzag_decode(data, pos)
        symbols = d["symbols"]
        if not 0 <= idx < len(symbols):
            raise ValueError(f"enum index {idx} out of range")
        return symbols[idx], pos
    if k == "fixed":
        n = d["size"]
        if pos + n > len(data):
            raise ValueError("truncated fixed")
        return data[pos : pos + n].hex(), pos + n
    if k == "date":
        import datetime

        v, pos = _zigzag_decode(data, pos)
        _check_long(v, 32)
        return (
            datetime.date(1970, 1, 1) + datetime.timedelta(days=v)
        ), pos
    if k in ("timestamp-millis", "timestamp-micros"):
        import datetime

        v, pos = _zigzag_decode(data, pos)
        _check_long(v, 64)
        us = v * 1000 if k == "timestamp-millis" else v
        try:
            ts = datetime.datetime(
                1970, 1, 1
            ) + datetime.timedelta(microseconds=us)
        except OverflowError:
            raise ValueError(
                f"timestamp {v} outside the datetime range"
            ) from None
        return ts, pos
    if k == "decimal":
        import decimal

        if "size" in d:
            n = d["size"]
            if pos + n > len(data):
                raise ValueError("truncated fixed decimal")
            raw = data[pos : pos + n]
            pos += n
        else:
            raw, pos = _read_bytes(data, pos)
        unscaled = int.from_bytes(raw, "big", signed=True) if raw else 0
        if abs(unscaled) >= 10 ** d["precision"]:
            raise ValueError(
                f"decimal unscaled {unscaled} exceeds "
                f"precision {d['precision']}"
            )
        return decimal.Decimal(unscaled).scaleb(-d["scale"]), pos
    raise ValueError(f"unsupported kind {k!r}")


def _decode_blocks(data, pos, item_d, *, with_keys: bool):
    """Array/map item blocks: count (negative = count+bytesize),
    items, 0 terminator."""
    out_list, out_map = [], {}
    while True:
        n, pos = _zigzag_decode(data, pos)
        if n == 0:
            return (out_map if with_keys else out_list), pos
        if n < 0:
            n = -n
            _, pos = _zigzag_decode(data, pos)
        for _ in range(n):
            if with_keys:
                raw, pos = _read_bytes(data, pos)
                key = raw.decode("utf-8")
                v, pos = _decode_scalar(data, pos, item_d)
                out_map[key] = v
            else:
                if item_d["k"] == "record":
                    # array<record-of-scalars>: one dict per element
                    # (becomes a Spark struct)
                    v, pos = _decode_field(data, pos, item_d)
                else:
                    v, pos = _decode_scalar(data, pos, item_d)
                out_list.append(v)


def _decode_field(data, pos, d):
    """Decode one field value (handles the union prefix). Records
    return a dict of {relative_dotted_leaf: value}."""
    if d["nullable"]:
        idx, pos = _zigzag_decode(data, pos)
        if idx not in (0, 1):
            raise ValueError(f"bad union index {idx}")
        if (idx == 0) == d["null_first"]:
            if d["k"] == "record":
                return (
                    {c: None for c, _ in _flat_columns(d["fields"])},
                    pos,
                )
            return None, pos
    if d["k"] == "record":
        out = {}
        for name, fd in d["fields"]:
            v, pos = _decode_field(data, pos, fd)
            if fd["k"] == "record":
                for sub, sv in v.items():
                    out[f"{name}.{sub}"] = sv
            else:
                out[name] = v
        return out, pos
    if d["k"] == "array":
        return _decode_blocks(data, pos, d["items"], with_keys=False)
    if d["k"] == "map":
        return _decode_blocks(data, pos, d["values"], with_keys=True)
    return _decode_scalar(data, pos, d)


def _compile_scalar(d):
    """Closure form of `_decode_scalar` for the hot wire kinds — each
    branch is the verbatim body of its `_decode_scalar` arm (same
    values, same error strings), bound once per schema instead of
    re-dispatched through the kind chain per value. Returns None for
    kinds that keep the interpreted path (containers, enums, fixed,
    logical types)."""
    k = d["k"]
    if k == "long":
        def dec(data, pos):
            v, pos = _zigzag_decode(data, pos)
            return _check_long(v, 64), pos
        return dec
    if k == "string":
        def dec(data, pos):
            raw, pos = _read_bytes(data, pos)
            return raw.decode("utf-8"), pos
        return dec
    if k == "int":
        def dec(data, pos):
            v, pos = _zigzag_decode(data, pos)
            return _check_long(v, 32), pos
        return dec
    if k == "double":
        def dec(data, pos):
            if pos + 8 > len(data):
                raise ValueError("truncated double")
            return struct.unpack("<d", data[pos : pos + 8])[0], pos + 8
        return dec
    if k == "float":
        def dec(data, pos):
            if pos + 4 > len(data):
                raise ValueError("truncated float")
            return struct.unpack("<f", data[pos : pos + 4])[0], pos + 4
        return dec
    if k == "boolean":
        def dec(data, pos):
            if pos >= len(data):
                raise ValueError("truncated boolean")
            b = data[pos]
            if b not in (0, 1):
                raise ValueError(f"bad boolean byte {b}")
            return b == 1, pos + 1
        return dec
    if k == "bytes":
        def dec(data, pos):
            raw, pos = _read_bytes(data, pos)
            return raw.hex(), pos
        return dec
    if k == "null":
        return lambda data, pos: (None, pos)
    return None


def _compile_field(d):
    """Per-descriptor decode closure — identical values and errors to
    `_decode_field(data, pos, d)`. Scalar wire kinds skip the per-value
    kind dispatch; containers, enums, fixed, and logical types fall
    back to the interpreted path unchanged."""
    sc = _compile_scalar(d)
    if sc is None:
        def dec(data, pos, _d=d):
            return _decode_field(data, pos, _d)
        return dec
    if not d["nullable"]:
        return sc
    null_first = d["null_first"]

    def dec(data, pos):
        idx, pos = _zigzag_decode(data, pos)
        if idx not in (0, 1):
            raise ValueError(f"bad union index {idx}")
        if (idx == 0) == null_first:
            return None, pos
        return sc(data, pos)

    return dec


# ---------------------------------------------------------------------------
# fixture writer
# ---------------------------------------------------------------------------


def write_avro(
    records: list[dict],
    schema_json: str,
    path: str,
    *,
    codec: str = "null",
    records_per_block: int = 1000,
    sync: bytes = b"\x00\x11\x22\x33\x44\x55\x66\x77"
                  b"\x88\x99\xaa\xbb\xcc\xdd\xee\xff",
) -> None:
    """Fixture writer (deterministic sync marker by default). Nested
    record values are plain dicts; arrays lists; maps dicts; dates
    `datetime.date`; timestamps `datetime.datetime` (naive UTC) or
    epoch ints; decimals `decimal.Decimal` or ints of the unscaled
    value."""
    import zlib

    fields = _parse_schema(schema_json)
    buf = io.BytesIO()
    buf.write(_MAGIC)
    meta = {"avro.schema": schema_json.encode(),
            "avro.codec": codec.encode()}
    buf.write(_zigzag_encode(len(meta)))
    for k, v in sorted(meta.items()):
        kb = k.encode()
        buf.write(_zigzag_encode(len(kb)) + kb)
        buf.write(_zigzag_encode(len(v)) + v)
    buf.write(_zigzag_encode(0))
    buf.write(sync)

    def enc_scalar(v, d) -> bytes:
        import datetime
        import decimal as _dec

        k = d["k"]
        if k == "null":
            return b""
        if k == "boolean":
            return bytes([1 if v else 0])
        if k in ("int", "long"):
            return _zigzag_encode(int(v))
        if k == "float":
            return struct.pack("<f", float(v))
        if k == "double":
            return struct.pack("<d", float(v))
        if k == "bytes":
            raw = bytes.fromhex(v) if isinstance(v, str) else bytes(v)
            return _zigzag_encode(len(raw)) + raw
        if k == "string":
            raw = str(v).encode("utf-8")
            return _zigzag_encode(len(raw)) + raw
        if k == "enum":
            return _zigzag_encode(d["symbols"].index(v))
        if k == "fixed":
            raw = bytes.fromhex(v) if isinstance(v, str) else bytes(v)
            if len(raw) != d["size"]:
                raise ValueError("fixed value of wrong size")
            return raw
        if k == "date":
            if isinstance(v, datetime.date):
                v = (v - datetime.date(1970, 1, 1)).days
            return _zigzag_encode(int(v))
        if k in ("timestamp-millis", "timestamp-micros"):
            if isinstance(v, datetime.datetime):
                delta = v - datetime.datetime(1970, 1, 1)
                us = (
                    delta.days * 86_400_000_000
                    + delta.seconds * 1_000_000
                    + delta.microseconds
                )
                v = us // 1000 if k == "timestamp-millis" else us
            return _zigzag_encode(int(v))
        if k == "decimal":
            if isinstance(v, _dec.Decimal):
                unscaled = int(v.scaleb(d["scale"]).to_integral_value())
            else:
                unscaled = int(v)
            if "size" in d:
                return unscaled.to_bytes(d["size"], "big", signed=True)
            n = max(1, (unscaled.bit_length() + 8) // 8)
            raw = unscaled.to_bytes(n, "big", signed=True)
            return _zigzag_encode(len(raw)) + raw
        raise ValueError(f"unsupported kind {k!r}")

    def enc_field(v, d) -> bytes:
        out = b""
        if d["nullable"]:
            if v is None:
                return _zigzag_encode(0 if d["null_first"] else 1)
            out += _zigzag_encode(1 if d["null_first"] else 0)
        if d["k"] == "record":
            for name, fd in d["fields"]:
                out += enc_field((v or {}).get(name), fd)
            return out
        if d["k"] == "array":
            items = list(v or [])
            if items:
                out += _zigzag_encode(len(items))
                for x in items:
                    # enc_field handles record elements (and reduces
                    # to enc_scalar for plain non-nullable scalars)
                    out += enc_field(x, d["items"])
            return out + _zigzag_encode(0)
        if d["k"] == "map":
            entries = dict(v or {})
            if entries:
                out += _zigzag_encode(len(entries))
                for key in sorted(entries):
                    kb = str(key).encode("utf-8")
                    out += _zigzag_encode(len(kb)) + kb
                    out += enc_scalar(entries[key], d["values"])
            return out + _zigzag_encode(0)
        return out + enc_scalar(v, d)

    for i in range(0, max(len(records), 1), records_per_block):
        block = records[i : i + records_per_block]
        if not block:
            break
        payload = b"".join(
            b"".join(
                enc_field(rec.get(name), d) for name, d in fields
            )
            for rec in block
        )
        if codec == "deflate":
            payload = zlib.compress(payload)[2:-4]  # raw RFC 1951
        elif codec == "snappy":
            crc = struct.pack(">I", zlib.crc32(payload) & 0xFFFFFFFF)
            payload = _snappy_compress(payload) + crc
        buf.write(_zigzag_encode(len(block)))
        buf.write(_zigzag_encode(len(payload)))
        buf.write(payload)
        buf.write(sync)
    with open(path, "wb") as f:
        f.write(buf.getvalue())


def _spark_out_schema(fields):
    """(flat cols, names, StructType) for a parsed schema — shared by
    the whole-file and split readers."""
    from pyspark.sql.types import (
        ArrayType, BooleanType, DateType, DecimalType, DoubleType,
        FloatType, LongType, MapType, StringType, StructField,
        StructType, TimestampType,
    )

    def spark_type(d):
        scalar = {
            "null": StringType(), "boolean": BooleanType(),
            "int": LongType(), "long": LongType(),
            "float": FloatType(), "double": DoubleType(),
            "bytes": StringType(), "string": StringType(),
            "enum": StringType(), "fixed": StringType(),
            "date": DateType(),
            "timestamp-millis": TimestampType(),
            "timestamp-micros": TimestampType(),
        }
        if d["k"] == "decimal":
            return DecimalType(d["precision"], d["scale"])
        if d["k"] == "array":
            if d["items"]["k"] == "record":
                return ArrayType(StructType([
                    StructField(n, spark_type(fd))
                    for n, fd in d["items"]["fields"]
                ]))
            return ArrayType(spark_type(d["items"]))
        if d["k"] == "map":
            return MapType(StringType(), spark_type(d["values"]))
        return scalar[d["k"]]

    cols = _flat_columns(fields)
    names = [c for c, _ in cols]
    for reserved in ("file", "rec_index", "error"):
        if reserved in names:
            raise ValueError(
                f"schema field {reserved!r} collides with a "
                f"bookkeeping output column"
            )
    out_schema = StructType(
        [StructField("file", StringType()),
         StructField("rec_index", LongType())]
        + [StructField(c, spark_type(d)) for c, d in cols]
        + [StructField("error", StringType())]
    )
    return cols, names, out_schema


def _read_driver_head(path) -> str:
    """Bounded header read of the FIRST file in sorted order (the
    schema election) — ranged via pyarrow.fs for URIs. `path` may be
    an explicit list of files (the lakehouse-manifest channel: the
    caller already knows the exact shard set)."""
    from soda_spark_spark.sources.safetensors import _plan_files

    if isinstance(path, (list, tuple)):
        if not path:
            raise FileNotFoundError("empty file list")
        head_path = sorted(path)[0]
    else:
        head_path = _plan_files(path)[0][0]
    if "://" in head_path:
        from pyarrow import fs as pafs

        fs_, rel = pafs.FileSystem.from_uri(head_path)
        with fs_.open_input_file(rel) as f:
            head = f.read(1 << 20)  # header only — never data blocks
    else:
        with open(head_path, "rb") as f:
            head = f.read(1 << 20)
    schema_json, _, _, _ = parse_avro_header(head)
    return schema_json


def _decompress_block(payload: bytes, codec: str, max_block_bytes: int):
    """Apply the block codec with the bomb guard (shared by both
    readers)."""
    import zlib

    if codec == "deflate":
        dec = zlib.decompressobj(-15)
        payload = dec.decompress(payload, max_block_bytes + 1)
        if len(payload) > max_block_bytes:
            raise ValueError(
                f"block plaintext exceeds {max_block_bytes} bytes"
            )
        if not dec.eof:
            raise ValueError("truncated deflate block")
        return payload
    if codec == "snappy":
        if len(payload) < 4:
            raise ValueError("snappy block shorter than its CRC")
        comp, crc = payload[:-4], payload[-4:]
        payload = _snappy_decompress(comp, max_block_bytes)
        if struct.pack(
            ">I", zlib.crc32(payload) & 0xFFFFFFFF
        ) != crc:
            raise ValueError("snappy CRC mismatch")
        return payload
    return payload


def read_avro_records(
    spark: SparkSession,
    path,
    *,
    max_block_bytes: int = 256 * 1024 * 1024,
) -> DataFrame:
    """Read Avro OCF shard(s) at `path` (local or `scheme://` glob,
    or an explicit list of files — the lakehouse-manifest channel)
    into typed rows driven by the FIRST file's writer schema in
    sorted order (module contract; laws — including the first-file
    schema election for mixed globs — in the module docstring).
    Output: `file`, `rec_index`, one column per flattened schema
    field (nested records become dotted columns), `error`. A
    compressed block whose plaintext exceeds `max_block_bytes`
    quarantines the shard (decompression is streamed/bounded — the
    bomb never materializes)."""
    schema_json = _read_driver_head(path)
    fields = _parse_schema(schema_json)
    cols, names, out_schema = _spark_out_schema(fields)
    plan_schema = json.dumps(json.loads(schema_json), sort_keys=True)
    n_cols = len(names)
    # per-field decode closures, bound once per schema (not per value)
    decoders = [
        (name, _compile_field(d), d["k"] == "record")
        for name, d in fields
    ]

    src = spark.read.format("binaryFile").load(path)

    def run(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            rows = []
            for fname, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                idx = 0
                try:
                    sj, codec, sync, pos = parse_avro_header(data)
                    if json.dumps(
                        json.loads(sj), sort_keys=True
                    ) != plan_schema:
                        raise ValueError(
                            "shard schema differs from the plan "
                            "schema (first file)"
                        )
                    while pos < len(data):
                        n, pos = _zigzag_decode(data, pos)
                        size, pos = _zigzag_decode(data, pos)
                        if n < 0 or size < 0 or pos + size > len(data):
                            raise ValueError("truncated block")
                        payload = data[pos : pos + size]
                        pos += size
                        if data[pos : pos + 16] != sync:
                            raise ValueError("sync marker mismatch")
                        pos += 16
                        payload = _decompress_block(
                            payload, codec, max_block_bytes
                        )
                        rpos = 0
                        for _ in range(n):
                            flat = {}
                            for name, dec, is_rec in decoders:
                                v, rpos = dec(payload, rpos)
                                if is_rec:
                                    for sub, sv in v.items():
                                        flat[f"{name}.{sub}"] = sv
                                else:
                                    flat[name] = v
                            rows.append(
                                (fname, idx)
                                + tuple(flat[c] for c in names)
                                + (None,)
                            )
                            idx += 1
                        if rpos != len(payload):
                            raise ValueError(
                                "trailing bytes in block payload"
                            )
                except (ValueError, zlib.error) as e:
                    rows.append(
                        (fname, idx, *([None] * n_cols),
                         f"bad avro: {e}"[:500])
                    )
            out = pd.DataFrame(
                rows,
                columns=["file", "rec_index"] + names + ["error"],
            )
            for name, d in cols:
                if d["k"] in ("int", "long"):
                    out[name] = pd.array(out[name], dtype="Int64")
                elif d["k"] == "float":
                    out[name] = pd.array(out[name], dtype="Float32")
                elif d["k"] == "double":
                    out[name] = pd.array(out[name], dtype="Float64")
            yield out

    return src.select("path", "content").mapInPandas(
        run, schema=out_schema
    )

def _fetch_avro_header(f, size: int, *, max_scan: int = 64 << 20):
    """Ranged header read off an open `pyarrow.fs` input file: start
    with 64 KB and grow geometrically while the metadata map is
    truncated, capped at `max_scan` (a header is KBs of schema JSON;
    64 MB is already pathological). Returns
    (schema_json, codec, sync, first_block_pos)."""
    ln = min(size, 1 << 16)
    while True:
        f.seek(0)
        head = f.read(ln)
        try:
            return parse_avro_header(head)
        except ValueError as e:
            if "truncated" in str(e) and ln < min(size, max_scan):
                ln = min(size, max_scan, ln * 8)
                continue
            raise


def read_avro_split(
    spark: SparkSession,
    path: str,
    *,
    chunk_bytes: int = 64 * 1024 * 1024,
    max_block_bytes: int = 256 * 1024 * 1024,
) -> DataFrame:
    """Read Avro OCF shard(s) with BYTE-RANGE parallelism inside each
    file — the Hadoop AvroInputFormat discipline the container was
    DESIGNED for: every data block ends with the file's 16-byte sync
    marker, so a task holding an arbitrary byte range can find block
    boundaries locally. Output equals `read_avro_records` row-for-row
    on well-formed shards (same columns, same `rec_index`), works on
    files beyond the ~2 GiB `binaryFile` cap, and turns one multi-GB
    Kafka-archive file into size/chunk_bytes parallel tasks; all
    three codecs split (blocks are compressed independently).

    Split mechanics (per chunk task; the driver does one bounded
    header read for the schema election plus a size stat per file):
    - each task ranged-reads ITS file's header (KBs) for the sync
      marker + schema validation;
    - a block START b is the file's `first_block_pos` or any sync
      occurrence q at [q, q+16) with b = q+16; the task OWNS starts
      in [start, end) — scanning q in [start-16, end-16) makes the
      ownership partition exact, the `read_mbox_split` separator
      rule. (A sync is 16 random bytes, so a payload collision is a
      2^-128 event — the same assumption Avro's own resync makes.)
    - an owned block may extend past `end`: the count/size varints
      say exactly how far, so the task issues ONE exact ranged read —
      no speculative lookahead needed;
    - laws follow `read_avro_records` chunk-locally: a header/schema
      failure poisons the WHOLE file as one error row (only the
      start-0 chunk emits it); a corrupt block is one error row with
      `rec_index` = good records before it. ONE divergence, stated:
      after mid-file corruption the whole-file reader stops the shard
      (nothing after the bad sync is trusted), while the split reader
      RESYNCS at the next sync marker and keeps decoding — the
      Hadoop recovery semantics; on well-formed files the two are
      row-for-row identical.

    One shuffle total: the per-file window ordering (block_offset,
    in-block position) that turns block-local counts into the global
    `rec_index` — rows, not bytes, the `read_mbox_split` discipline.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from soda_spark_spark.sources.safetensors import (
        _open_input,
        _plan_files,
    )

    schema_json = _read_driver_head(path)
    fields = _parse_schema(schema_json)
    cols, names, out_schema = _spark_out_schema(fields)
    plan_schema = json.dumps(json.loads(schema_json), sort_keys=True)
    n_cols = len(names)
    # per-field decode closures, bound once per schema (not per value)
    decoders = [
        (name, _compile_field(d), d["k"] == "record")
        for name, d in fields
    ]

    files = _plan_files(path)
    plan = []
    for p, size in files:
        start = 0
        while start < size or start == 0:
            end = min(start + chunk_bytes, size)
            plan.append((p, start, end, size))
            start = end
            if size == 0:
                break
    plan_df = spark.createDataFrame(
        plan, "file string, start long, end long, size long"
    ).repartition(max(len(plan), 1))

    from pyspark.sql.types import (
        IntegerType, LongType, StringType, StructField, StructType,
    )

    inner_schema = StructType(
        [StructField("block_off", LongType()),
         StructField("seq", LongType()),
         StructField("is_err", IntegerType())]
        + [f for f in out_schema.fields if f.name != "rec_index"]
    )
    inner_names = ["block_off", "seq", "is_err", "file"] + names + [
        "error"
    ]

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for fname, start, end, size in zip(
                pdf["file"], pdf["start"], pdf["end"], pdf["size"]
            ):
                start, end, size = int(start), int(end), int(size)
                try:
                    with _open_input(fname) as f:
                        try:
                            sj, codec, sync, fbp = _fetch_avro_header(
                                f, size
                            )
                            if json.dumps(
                                json.loads(sj), sort_keys=True
                            ) != plan_schema:
                                raise ValueError(
                                    "shard schema differs from the "
                                    "plan schema (first file)"
                                )
                        except ValueError as e:
                            if start == 0:
                                rows.append(
                                    (-2, 0, 1, fname,
                                     *([None] * n_cols),
                                     f"bad avro: {e}"[:500])
                                )
                            continue
                        # owned block starts: first_block_pos if in
                        # range, plus q+16 for syncs q scanned in
                        # [start-16, end-16)
                        starts = set()
                        if start <= fbp < end:
                            starts.add(fbp)
                        lo = max(start - 16, fbp)
                        hi = min(end - 16 + 16, size)
                        if lo < hi:
                            f.seek(lo)
                            buf = f.read(hi - lo)
                            q = buf.find(sync)
                            while q >= 0:
                                gq = lo + q
                                if start - 16 <= gq < end - 16:
                                    b = gq + 16
                                    if fbp <= b < size:
                                        starts.add(b)
                                q = buf.find(sync, q + 1)
                        for b in sorted(starts):
                            seq = 0
                            try:
                                f.seek(b)
                                head = f.read(24)
                                n, p1 = _zigzag_decode(head, 0)
                                size_b, p2 = _zigzag_decode(head, p1)
                                if n < 0 or size_b < 0:
                                    raise ValueError(
                                        "truncated block"
                                    )
                                if b + p2 + size_b + 16 > size:
                                    raise ValueError(
                                        "truncated block"
                                    )
                                f.seek(b + p2)
                                payload = f.read(size_b)
                                if f.read(16) != sync:
                                    raise ValueError(
                                        "sync marker mismatch"
                                    )
                                payload = _decompress_block(
                                    payload, codec, max_block_bytes
                                )
                                rpos = 0
                                for _ in range(n):
                                    flat = {}
                                    for name, dec, is_rec in decoders:
                                        v, rpos = dec(payload, rpos)
                                        if is_rec:
                                            for sub, sv in v.items():
                                                flat[
                                                    f"{name}.{sub}"
                                                ] = sv
                                        else:
                                            flat[name] = v
                                    rows.append(
                                        (b, seq, 0, fname)
                                        + tuple(
                                            flat[c] for c in names
                                        )
                                        + (None,)
                                    )
                                    seq += 1
                                if rpos != len(payload):
                                    raise ValueError(
                                        "trailing bytes in block "
                                        "payload"
                                    )
                            except ValueError as e:
                                rows.append(
                                    (b, seq, 1, fname,
                                     *([None] * n_cols),
                                     f"bad avro: {e}"[:500])
                                )
                except OSError as e:
                    if start == 0:
                        rows.append(
                            (-2, 0, 1, fname, *([None] * n_cols),
                             f"bad avro: {e}"[:500])
                        )
            out = pd.DataFrame(rows, columns=inner_names)
            for name, d in cols:
                if d["k"] in ("int", "long"):
                    out[name] = pd.array(out[name], dtype="Int64")
                elif d["k"] == "float":
                    out[name] = pd.array(out[name], dtype="Float32")
                elif d["k"] == "double":
                    out[name] = pd.array(out[name], dtype="Float64")
            yield out

    parsed = plan_df.mapInPandas(run, schema=inner_schema)
    # file-level poison (header/schema failure, block_off = -2, only
    # the first chunk can emit one): keep ONLY that row so the file
    # quarantines exactly like read_avro_records
    wf = Window.partitionBy("file")
    poison = F.max(
        F.when(F.col("block_off") == -2, 1).otherwise(0)
    ).over(wf)
    parsed = (
        parsed.withColumn("_poison", poison)
        .filter((F.col("_poison") == 0) | (F.col("block_off") == -2))
        .drop("_poison")
    )
    w = Window.partitionBy("file").orderBy("block_off", "seq")
    n_err_before = F.coalesce(
        F.sum("is_err").over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    return (
        parsed.withColumn(
            "rec_index",
            (F.row_number().over(w) - 1 - n_err_before).cast("long"),
        )
        .select("file", "rec_index", *names, "error")
    )
