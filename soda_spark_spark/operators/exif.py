"""JPEG Exif metadata census + decode-free metadata stripping — the
image-side PII story. Crawled photos routinely carry GPS coordinates,
capture timestamps, and device identifiers in their APP1 Exif
segment; a curation pipeline must SEE that (census/gate) and be able
to REMOVE it without touching pixels (re-encoding 100 TB of images to
drop a GPS tag would be absurd — the metadata lives in its own marker
segments and strips byte-exactly).

Two primitives, both header-only (no entropy decode ever):

- `exif_extract(payload)` -> {make, model, software, datetime,
  orientation, has_gps, gps_lat, gps_lon}: TIFF byte-order header,
  IFD0 entry walk, Exif sub-IFD (DateTimeOriginal preferred over
  IFD0 DateTime), GPS sub-IFD with the rational
  degrees/minutes/seconds triple folded to signed decimal degrees
  (S/W refs negate). Missing segment or fields -> Nones; a payload
  that is not a JPEG raises ValueError (quarantine).
- `strip_jpeg_metadata(payload)` -> scrubbed JPEG: drops APP1..APP15
  and COM segments WHOLE (Exif, XMP, ICC beyond APP0, comments);
  keeps APP0/JFIF, all coding segments (DQT/DHT/SOF/SOS), and the
  entropy-coded data byte-identically. Removing whole segments is
  the only safe scrub: surgical in-place GPS edits must rewrite every
  following TIFF offset, and one missed pointer corrupts the file.
  The trade: orientation (stored in Exif) is dropped too — callers
  that need it extract FIRST, then strip (the census row does
  exactly this). Fill bytes before markers tolerated (T.81
  B.1.1.2); the scan's entropy tail is copied verbatim.

Spark surface: `image_exif(df, id_col, payload_col)` (one row per
image, quarantine error channel) and `image_strip_metadata(df,
id_col, payload_col)` (scrubbed payload + bytes_saved), both
Arrow-batched `mapInPandas` over two-column pruned scans.

`write_exif_app1` builds a real two-IFD Exif segment (offset area
for oversized values, GPS sub-IFD, both byte orders) so the parser
and scrubber certify against structurally honest fixtures.

Derived from the public Exif 2.3 / TIFF 6.0 / ITU-T T.81 specs; the
reference (src/sodaspark/scan.py:441) scans already-loaded frames —
image-metadata curation is additive surface.
"""

from __future__ import annotations

import struct
from typing import Any

from pyspark.sql import DataFrame

__all__ = [
    "exif_extract",
    "strip_jpeg_metadata",
    "image_exif",
    "image_strip_metadata",
    "write_exif_app1",
    "EXIF_SCHEMA",
]

EXIF_SCHEMA = (
    "id long, make string, model string, software string,"
    " datetime string, orientation int, has_gps boolean,"
    " gps_lat double, gps_lon double, error string"
)

# APP1..APP15 + COM, EXCEPT APP14 (0xEE): Adobe's color-transform
# marker carries no PII, and Adobe-encoded JPEGs (CMYK/YCCK, or
# transform=0 RGB) need it to pick the right color transform — a
# scrub that drops it can decode with wrong colors even though the
# entropy data is byte-identical (round-17 ADVICE fix).
_STRIP_MARKERS = (set(range(0xE1, 0xF0)) - {0xEE}) | {0xFE}


def _segments(payload: bytes):
    """Yield (marker, seg_start, seg_end) for each marker segment up
    to and including the SOS header; the entropy tail after SOS is
    the caller's. Tolerates 0xFF fill bytes (T.81 B.1.1.2)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    n = len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker stream lost sync")
        while pos < n and payload[pos] == 0xFF:
            pos += 1
        if pos >= n:
            raise ValueError("truncated JPEG")
        marker = payload[pos]
        pos += 1
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI with no scan
            yield marker, pos - 2, pos
            return
        if pos + 2 > n:
            raise ValueError("truncated JPEG segment")
        (seglen,) = struct.unpack_from(">H", payload, pos)
        if seglen < 2 or pos + seglen > n:
            raise ValueError("bad JPEG segment length")
        # seg_start points at the 0xFF of THIS marker (fill bytes,
        # if any, belong to the previous gap and are preserved)
        yield marker, pos - 2, pos + seglen
        if marker == 0xDA:  # SOS: entropy data follows
            return
        pos += seglen


def _tiff_value(t: bytes, end: str, typ: int, cnt: int, off: int):
    """Decode one IFD entry value (inline or via offset area)."""
    sizes = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}
    size = sizes.get(typ)
    if size is None:
        return None
    total = size * cnt
    if total <= 4:
        base = off
    else:
        if off + 4 > len(t):
            return None
        (base,) = struct.unpack_from(end + "I", t, off)
    if base + total > len(t):
        return None
    if typ == 2:  # ASCII, NUL-terminated
        raw = t[base : base + cnt]
        return raw.split(b"\x00", 1)[0].decode("ascii", "replace")
    if typ == 3:
        return list(struct.unpack_from(end + f"{cnt}H", t, base))
    if typ == 4:
        return list(struct.unpack_from(end + f"{cnt}I", t, base))
    if typ == 5:  # unsigned rational
        out = []
        for i in range(cnt):
            num, den = struct.unpack_from(end + "II", t, base + 8 * i)
            out.append((num, den))
        return out
    return None


def _ifd_entries(t: bytes, end: str, ifd: int) -> dict[int, tuple]:
    if ifd + 2 > len(t):
        return {}
    (count,) = struct.unpack_from(end + "H", t, ifd)
    out = {}
    for i in range(count):
        off = ifd + 2 + 12 * i
        if off + 12 > len(t):
            break
        tag, typ, cnt = struct.unpack_from(end + "HHI", t, off)
        out[tag] = (typ, cnt, off + 8)
    return out


def _dms_to_degrees(rationals, ref: str | None) -> float | None:
    if not rationals or len(rationals) != 3:
        return None
    try:
        d, m, s = (
            (num / den if den else 0.0) for num, den in rationals
        )
    except TypeError:
        return None
    v = d + m / 60.0 + s / 3600.0
    if ref in ("S", "W"):
        v = -v
    return v


def exif_extract(payload: bytes) -> dict[str, Any]:
    """Module contract: Exif census fields from the APP1 segment;
    all-None when no Exif is present; ValueError on non-JPEG."""
    out: dict[str, Any] = dict(
        make=None, model=None, software=None, datetime=None,
        orientation=None, has_gps=False, gps_lat=None, gps_lon=None,
    )
    payload = bytes(payload)
    for marker, s, e in _segments(payload):
        if marker != 0xE1 or payload[s + 4 : s + 10] != b"Exif\x00\x00":
            continue
        t = payload[s + 10 : e]
        if len(t) < 8 or t[:2] not in (b"II", b"MM"):
            return out
        end = "<" if t[:2] == b"II" else ">"
        if struct.unpack_from(end + "H", t, 2)[0] != 42:
            return out
        (ifd0,) = struct.unpack_from(end + "I", t, 4)
        e0 = _ifd_entries(t, end, ifd0)

        def val(entries, tag):
            if tag not in entries:
                return None
            typ, cnt, voff = entries[tag]
            return _tiff_value(t, end, typ, cnt, voff)

        def first(v):
            return v[0] if isinstance(v, list) and v else None

        out["make"] = val(e0, 0x010F)
        out["model"] = val(e0, 0x0110)
        out["software"] = val(e0, 0x0131)
        out["datetime"] = val(e0, 0x0132)
        ori = first(val(e0, 0x0112))
        out["orientation"] = ori if ori and 1 <= ori <= 8 else None
        exif_ptr = first(val(e0, 0x8769))
        if exif_ptr is not None:
            ee = _ifd_entries(t, end, exif_ptr)
            dto = val(ee, 0x9003)
            if dto:
                out["datetime"] = dto
        gps_ptr = first(val(e0, 0x8825))
        if gps_ptr is not None:
            ge = _ifd_entries(t, end, gps_ptr)
            lat_ref = val(ge, 0x0001)
            lat = _dms_to_degrees(val(ge, 0x0002), lat_ref)
            lon_ref = val(ge, 0x0003)
            lon = _dms_to_degrees(val(ge, 0x0004), lon_ref)
            out["has_gps"] = lat is not None or lon is not None
            out["gps_lat"] = lat
            out["gps_lon"] = lon
        break
    return out


def strip_jpeg_metadata(payload: bytes) -> bytes:
    """Module contract: remove APP1..APP15 + COM segments whole —
    except APP14, Adobe's color-transform marker, which carries no
    PII and is load-bearing for CMYK/YCCK decode; all other bytes
    (incl. the entropy-coded scan) pass through byte-identically.
    ValueError on non-JPEG."""
    payload = bytes(payload)
    drop: list[tuple[int, int]] = []
    tail_from = len(payload)
    for marker, s, e in _segments(payload):
        if marker in _STRIP_MARKERS:
            drop.append((s, e))
        if marker == 0xDA:
            tail_from = e
            break
    if not drop:
        return payload
    parts = []
    pos = 0
    for s, e in drop:
        parts.append(payload[pos:s])
        pos = e
    parts.append(payload[pos:])
    return b"".join(parts)


def image_exif(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """One census row per image; non-JPEG payloads quarantine via the
    error column. Arrow-batched, two-column pruned scan."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for rid, payload in zip(
                pdf[id_col].values, pdf[payload_col].values
            ):
                rid = int(rid)
                try:
                    m = exif_extract(bytes(payload))
                    rows.append((
                        rid, m["make"], m["model"], m["software"],
                        m["datetime"], m["orientation"], m["has_gps"],
                        m["gps_lat"], m["gps_lon"], None,
                    ))
                except ValueError as e:
                    rows.append((rid, None, None, None, None, None,
                                 None, None, None, str(e)))
            yield pd.DataFrame(
                rows,
                columns=["id", "make", "model", "software", "datetime",
                         "orientation", "has_gps", "gps_lat",
                         "gps_lon", "error"],
            ).astype({"orientation": "Int32", "has_gps": "boolean"})

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=EXIF_SCHEMA
    )


def image_strip_metadata(
    df: DataFrame, id_col: str, payload_col: str
) -> DataFrame:
    """Scrubbed payload + bytes_saved per image; non-JPEGs quarantine
    with a null payload (never emit an unscrubbed original as if it
    were scrubbed)."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for rid, payload in zip(
                pdf[id_col].values, pdf[payload_col].values
            ):
                rid = int(rid)
                try:
                    raw = bytes(payload)
                    out = strip_jpeg_metadata(raw)
                    rows.append((
                        rid, bytearray(out), len(raw) - len(out), None,
                    ))
                except ValueError as e:
                    rows.append((rid, None, None, str(e)))
            yield pd.DataFrame(
                rows,
                columns=["id", "payload", "bytes_saved", "error"],
            ).astype({"bytes_saved": "Int64"})

    return df.select(id_col, payload_col).mapInPandas(
        run,
        schema="id long, payload binary, bytes_saved long, error string",
    )


def write_exif_app1(
    *,
    make: str | None = None,
    model: str | None = None,
    orientation: int | None = None,
    datetime_original: str | None = None,
    gps: tuple[float, float] | None = None,
    byte_order: str = "II",
) -> bytes:
    """Fixture builder: one APP1 Exif segment (marker + length +
    payload) with a real two-level IFD layout — IFD0, optional Exif
    sub-IFD (DateTimeOriginal), optional GPS sub-IFD (rational DMS
    triples), oversized values in a trailing offset area."""
    end = "<" if byte_order == "II" else ">"

    def rat(v: float, den: int = 3600) -> tuple[int, int]:
        return int(round(v * den)), den

    def dms(v: float) -> list[tuple[int, int]]:
        v = abs(v)
        d = int(v)
        m = int((v - d) * 60)
        s = (v - d - m / 60.0) * 3600.0
        return [(d, 1), (m, 1), rat(s)]

    # plan entries per IFD: (tag, typ, cnt, inline_or_payload)
    def ascii_v(s: str) -> bytes:
        return s.encode("ascii") + b"\x00"

    ifd0: list[tuple[int, int, int, bytes]] = []
    if make is not None:
        ifd0.append((0x010F, 2, len(ascii_v(make)), ascii_v(make)))
    if model is not None:
        ifd0.append((0x0110, 2, len(ascii_v(model)), ascii_v(model)))
    if orientation is not None:
        ifd0.append((0x0112, 3, 1, struct.pack(end + "H", orientation)))
    exif_ifd: list[tuple[int, int, int, bytes]] = []
    if datetime_original is not None:
        v = ascii_v(datetime_original)
        exif_ifd.append((0x9003, 2, len(v), v))
    gps_ifd: list[tuple[int, int, int, bytes]] = []
    if gps is not None:
        lat, lon = gps
        lat_ref = b"N\x00" if lat >= 0 else b"S\x00"
        lon_ref = b"E\x00" if lon >= 0 else b"W\x00"
        lat_b = b"".join(struct.pack(end + "II", *r) for r in dms(lat))
        lon_b = b"".join(struct.pack(end + "II", *r) for r in dms(lon))
        gps_ifd = [
            (0x0001, 2, 2, lat_ref),
            (0x0002, 5, 3, lat_b),
            (0x0003, 2, 2, lon_ref),
            (0x0004, 5, 3, lon_b),
        ]

    def ifd_size(entries, with_pointers: int) -> int:
        return 2 + 12 * (len(entries) + with_pointers) + 4

    n_ptr = (1 if exif_ifd else 0) + (1 if gps_ifd else 0)
    ifd0_off = 8
    exif_off = ifd0_off + ifd_size(ifd0, n_ptr)
    gps_off = exif_off + (ifd_size(exif_ifd, 0) if exif_ifd else 0)
    data_off = gps_off + (ifd_size(gps_ifd, 0) if gps_ifd else 0)

    data_area = bytearray()

    def emit(entries, extra_ptrs) -> bytes:
        nonlocal data_area
        total = len(entries) + len(extra_ptrs)
        out = struct.pack(end + "H", total)
        items = []
        for tag, typ, cnt, payload_b in entries:
            if len(payload_b) <= 4:
                inline = payload_b + b"\x00" * (4 - len(payload_b))
            else:
                off = data_off + len(data_area)
                data_area += payload_b
                inline = struct.pack(end + "I", off)
            items.append((tag, typ, cnt, inline))
        for tag, off in extra_ptrs:
            items.append((tag, 4, 1, struct.pack(end + "I", off)))
        for tag, typ, cnt, inline in sorted(items):
            out += struct.pack(end + "HHI", tag, typ, cnt) + inline
        out += struct.pack(end + "I", 0)  # next-IFD pointer
        return out

    ptrs = []
    if exif_ifd:
        ptrs.append((0x8769, exif_off))
    if gps_ifd:
        ptrs.append((0x8825, gps_off))
    tiff = byte_order.encode("ascii") + struct.pack(end + "H", 42)
    tiff += struct.pack(end + "I", ifd0_off)
    tiff += emit(ifd0, ptrs)
    if exif_ifd:
        tiff += emit(exif_ifd, [])
    if gps_ifd:
        tiff += emit(gps_ifd, [])
    tiff += bytes(data_area)
    body = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
