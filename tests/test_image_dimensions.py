"""Header-only image dimension triage (`multimodal.image_dimensions`):
dimension parses must agree with the full decoders, cover the JPEG
variants the pixel decoder quarantines (progressive/arithmetic), and
route unparseable payloads to the error channel."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from soda_spark_spark.operators.multimodal import (
    encode_gif,
    encode_jpeg_baseline,
    encode_png,
    image_dimensions,
    image_dimensions_payload,
)


def _fixtures():
    gray = bytes(range(63))
    pal = bytes(b for i in range(256) for b in (i, i, i))
    rgb = np.repeat(np.frombuffer(gray, np.uint8), 3).tobytes()
    return {
        "pgm": b"P5\n9 7\n255\n" + gray,
        "png": encode_png(9, 7, gray, color_type=0),
        "gif": encode_gif(9, 7, gray, pal),
        "jpeg": encode_jpeg_baseline(9, 7, rgb, quality=80),
    }


def test_header_dims_agree_with_decoders():
    from soda_spark_spark.operators.multimodal import decode_image

    for fmt, payload in _fixtures().items():
        d = image_dimensions_payload(payload)
        assert d == {"format": fmt, "width": 9, "height": 7}
        full = decode_image(payload)
        assert (full["width"], full["height"]) == (9, 7)


def test_header_dims_cover_quarantined_jpeg_variants():
    j = bytearray(_fixtures()["jpeg"])
    i = j.find(b"\xff\xc0")
    for marker in (0xC2, 0xC9):  # progressive, arithmetic
        j[i + 1] = marker
        assert image_dimensions_payload(bytes(j)) == {
            "format": "jpeg", "width": 9, "height": 7,
        }


def test_header_dims_error_paths():
    # WebP is a NAMED format since round 16 — a truncated payload is a
    # ValueError, not unknown-format NotImplementedError
    with pytest.raises(ValueError):
        image_dimensions_payload(b"RIFFxxxxWEBPdata")
    with pytest.raises(NotImplementedError):
        image_dimensions_payload(b"RIFFxxxxAVI LIST")  # not an image
    with pytest.raises(ValueError):
        image_dimensions_payload(b"\x89PNG\r\n\x1a\n0000")
    with pytest.raises(ValueError):
        image_dimensions_payload(b"\xff\xd8\xff\xd9")  # SOI+EOI, no SOF


def test_image_dimensions_operator_quarantines(spark):
    rows = [(i, bytearray(p)) for i, p in enumerate(_fixtures().values())]
    rows.append((99, bytearray(b"JUNK bytes")))
    rows.append((100, None))
    df = spark.createDataFrame(rows, "id long, payload binary")
    out = {r.id: r for r in image_dimensions(df, "id", "payload").collect()}
    assert len(out) == 6
    for i in range(4):
        assert (out[i].width, out[i].height) == (9, 7)
        assert out[i].error is None
    for bad in (99, 100):
        assert out[bad].width is None and out[bad].error is not None


def test_exif_orientation_parsed_both_byte_orders():
    import struct as st

    j = bytearray(_fixtures()["jpeg"])

    def app1(tiff):
        body = b"Exif\x00\x00" + tiff
        return b"\xff\xe1" + st.pack(">H", len(body) + 2) + body

    # little-endian TIFF, orientation 6 (rotate 90 CW)
    tiff_le = (
        b"II" + st.pack("<H", 42) + st.pack("<I", 8) + st.pack("<H", 1)
        + st.pack("<HHI", 0x0112, 3, 1) + st.pack("<HH", 6, 0)
        + st.pack("<I", 0)
    )
    p = bytes(j[:2]) + app1(tiff_le) + bytes(j[2:])
    assert image_dimensions_payload(p) == {
        "format": "jpeg", "width": 9, "height": 7, "orientation": 6,
    }
    # big-endian TIFF, orientation 3
    tiff_be = (
        b"MM" + st.pack(">H", 42) + st.pack(">I", 8) + st.pack(">H", 1)
        + st.pack(">HHI", 0x0112, 3, 1) + st.pack(">HH", 3, 0)
        + st.pack(">I", 0)
    )
    p = bytes(j[:2]) + app1(tiff_be) + bytes(j[2:])
    assert image_dimensions_payload(p)["orientation"] == 3
    # no Exif -> no orientation key
    assert "orientation" not in image_dimensions_payload(bytes(j))
    # corrupt Exif is ignored, never fatal
    bad = b"\xff\xe1" + st.pack(">H", 10) + b"Exif\x00\x00XX"
    p = bytes(j[:2]) + bad + bytes(j[2:])
    assert image_dimensions_payload(p)["width"] == 9
