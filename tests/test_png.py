"""Real stdlib PNG decoding (`multimodal._decode_png`): an independent
pure-Python encoder writes KNOWN raw pixels through every filter type
and color type; the decoder must reconstruct the exact sample sums.

Reference shape: /root/reference has no media surface (SURVEY.md §2.4);
this is the additive multimodal path — the one compressed image format
decodable with nothing beyond the stdlib (DEFLATE ships in zlib)."""
from __future__ import annotations

import struct
import zlib

import pytest

from soda_spark_spark.operators import multimodal as mm


# --------------------------- independent encoder (forward filters) ---


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + ctype + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_row(f: int, row: list[int], prev: list[int], bpp: int) -> bytes:
    out = bytearray([f])
    for i, x in enumerate(row):
        a = row[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        pred = (0, a, b, (a + b) // 2, _paeth(a, b, c))[f]
        out.append((x - pred) % 256)
    return bytes(out)


def make_png(width: int, height: int, pixels: list[list[int]],
             color_type: int, filters: list[int],
             plte: bytes | None = None, depth: int = 8,
             interlace: int = 0) -> bytes:
    """pixels: per-row flat sample lists (already channel-expanded)."""
    ihdr = struct.pack(">IIBBBBB", width, height, depth, color_type,
                       0, 0, interlace)
    raster = b""
    prev = [0] * len(pixels[0])
    for r, row in enumerate(pixels):
        raster += _filter_row(filters[r % len(filters)], row, prev,
                              {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type])
        prev = row
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    # split IDAT to prove multi-chunk reassembly works
    z = zlib.compress(raster)
    out += _chunk(b"IDAT", z[: len(z) // 2]) + _chunk(b"IDAT", z[len(z) // 2:])
    return out + _chunk(b"IEND", b"")


def _pix(w: int, h: int, ch: int, salt: int = 0) -> list[list[int]]:
    return [[(salt + 37 * r + 11 * i) % 256 for i in range(w * ch)]
            for r in range(h)]


# ------------------------------------------------------------- tests


@pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4],
                                     [0, 1, 2, 3, 4]])
def test_png_rgb_every_filter_type(filters):
    w, h = 7, 6
    pixels = _pix(w, h, 3)
    payload = make_png(w, h, pixels, color_type=2, filters=filters)
    got = mm._decode_png(payload)
    assert (got["format"], got["width"], got["height"]) == ("png", w, h)
    assert got["sum_value"] == sum(sum(r) for r in pixels)
    assert got["mean_value"] == got["sum_value"] / (w * h * 3)
    assert got["n_bytes"] == len(payload)


@pytest.mark.parametrize("color_type,ch", [(0, 1), (4, 2), (6, 4)])
def test_png_gray_alpha_rgba(color_type, ch):
    w, h = 5, 4
    pixels = _pix(w, h, ch, salt=9)
    payload = make_png(w, h, pixels, color_type=color_type,
                       filters=[4, 3, 1, 2])
    got = mm._decode_png(payload)
    assert got["sum_value"] == sum(sum(r) for r in pixels)
    assert got["width"] == w and got["height"] == h


def test_png_palette_expands_through_plte():
    w, h = 4, 3
    idx = [[(r + i) % 5 for i in range(w)] for r in range(h)]
    plte = bytes(range(15))  # 5 RGB entries
    payload = make_png(w, h, idx, color_type=3, filters=[1], plte=plte)
    got = mm._decode_png(payload)
    expect = sum(sum(plte[v * 3: v * 3 + 3]) for row in idx for v in row)
    assert got["sum_value"] == expect
    assert got["mean_value"] == expect / (w * h * 3)


def test_png_through_decode_image_registry():
    payload = make_png(3, 3, _pix(3, 3, 3), color_type=2, filters=[2])
    assert mm.sniff_image_format(payload) == "png"
    got = mm.decode_image(payload)  # registry route, sniffed format
    assert got["format"] == "png"


def test_png_unsupported_shapes_quarantine():
    pixels = _pix(2, 2, 3)
    # a SEQUENTIAL stream mislabeled as Adam7 is corrupt, not merely
    # unsupported (Adam7 itself decodes since round 13): the per-pass
    # layout can't parse it
    with pytest.raises(ValueError):
        mm._decode_png(make_png(2, 2, pixels, 2, [0], interlace=1))
    # 16-bit DECODES since round 13; a 1-byte-per-sample stream merely
    # CLAIMING depth 16 is a size mismatch, and depth 3 never exists
    with pytest.raises(ValueError, match="size mismatch"):
        mm._decode_png(make_png(2, 2, pixels, 2, [0], depth=16))
    with pytest.raises(ValueError, match="depth"):
        mm._decode_png(make_png(2, 2, pixels, 2, [0], depth=3))


def test_png_corruption_raises_value_error():
    good = make_png(2, 2, _pix(2, 2, 3), color_type=2, filters=[0])
    with pytest.raises(ValueError):
        mm._decode_png(good[:30])  # truncated chunk
    with pytest.raises(ValueError):
        mm._decode_png(b"\x89PNG\r\n\x1a\n" + _chunk(b"IEND", b""))
    # raster size lie: claim 3 rows but ship 2
    bad = make_png(2, 3, _pix(2, 2, 3) + [[0] * 6], 2, [0])
    bad = bad.replace(struct.pack(">II", 2, 3), struct.pack(">II", 2, 9))
    with pytest.raises(ValueError):
        mm._decode_png(bad)


def test_encode_png_matches_independent_encoder_roundtrip():
    """`mm.encode_png` (the library write path) round-trips through the
    decoder with the same sums as this file's independent encoder for
    every filter type and a palette image."""
    w, h = 5, 5
    pixels = _pix(w, h, 3, salt=3)
    flat = bytes(v for row in pixels for v in row)
    for f in range(5):
        lib = mm._decode_png(mm.encode_png(w, h, flat, filters=f))
        ind = mm._decode_png(make_png(w, h, pixels, 2, [f]))
        assert lib["sum_value"] == ind["sum_value"] == sum(
            sum(r) for r in pixels)
    plte = bytes(range(30))
    idx = [[(r * 2 + i) % 10 for i in range(w)] for r in range(h)]
    lib = mm._decode_png(mm.encode_png(
        w, h, bytes(v for r in idx for v in r), color_type=3,
        filters=[0, 1, 2, 3, 4], palette=plte))
    ind = mm._decode_png(make_png(w, h, idx, 3, [0, 1, 2, 3, 4],
                                  plte=plte))
    assert lib["sum_value"] == ind["sum_value"]


def test_encode_png_validates_inputs():
    with pytest.raises(ValueError, match="sample bytes"):
        mm.encode_png(2, 2, b"\x00" * 5)
    with pytest.raises(ValueError, match="color type"):
        mm.encode_png(2, 2, b"\x00" * 4, color_type=7)
    with pytest.raises(ValueError, match="PLTE"):
        mm.encode_png(2, 2, b"\x00" * 4, color_type=3)
    with pytest.raises(ValueError, match="filter"):
        mm.encode_png(2, 2, b"\x00" * 12, filters=9)


def test_png_mixed_with_ppm_in_one_arrow_pass(spark):
    """decode_image_stats handles PNG and PPM payloads in the same
    batch through format sniffing — one Arrow loop, two codecs."""
    png = make_png(4, 2, _pix(4, 2, 3), color_type=2, filters=[1, 4])
    ppm_pixels = bytes((7 * i) % 256 for i in range(4 * 2 * 3))
    ppm = b"P6\n4 2\n255\n" + ppm_pixels
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(ppm))],
        "id long, payload binary",
    )
    rows = {r.id: r for r in mm.decode_image_stats(
        df, "id", "payload").collect()}
    assert rows[1].format == "png" and rows[1].error is None
    assert rows[1].sum_value == sum(sum(r) for r in _pix(4, 2, 3))
    assert rows[2].format == "ppm"
    assert rows[2].sum_value == sum(ppm_pixels)


# ---------------------------------------------------------------------------
# Adam7 interlace (round 13)
# ---------------------------------------------------------------------------


def test_adam7_round_trip_sizes_and_color_types():
    """Adam7 encode -> decode is byte-identical to the sequential
    raster, across dims exercising empty and single-pixel passes and
    across color types."""
    import hashlib

    from soda_spark_spark.operators.multimodal import (
        _png_raster, encode_png,
    )

    cases = [
        (1, 1, 0), (2, 2, 0), (3, 3, 2), (4, 4, 6), (5, 7, 2),
        (8, 8, 0), (9, 8, 2), (16, 16, 4), (13, 11, 6), (7, 1, 0),
        (1, 9, 2),
    ]
    for w, h, ctype in cases:
        ch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
        samples = bytes(
            hashlib.md5(f"a7{w}x{h}c{ctype}i{i}".encode()).digest()[0]
            for i in range(w * h * ch)
        )
        plain = encode_png(w, h, samples, color_type=ctype)
        inter = encode_png(w, h, samples, color_type=ctype,
                           interlace=True)
        assert inter != plain
        pw, ph, pch, ps = _png_raster(plain)
        iw, ih, ich, is_ = _png_raster(inter)
        assert (pw, ph, pch) == (iw, ih, ich) == (w, h, ch)
        assert bytes(ps.tobytes()) == bytes(is_.tobytes()) == samples


def test_adam7_with_filters_and_palette():
    import hashlib

    from soda_spark_spark.operators.multimodal import (
        _png_raster, encode_png,
    )

    samples = bytes(
        hashlib.md5(f"a7f{i}".encode()).digest()[0]
        for i in range(12 * 10 * 3)
    )
    # per-scanline filter cycle hits every filter type inside passes
    inter = encode_png(12, 10, samples, color_type=2,
                       filters=[0, 1, 2, 3, 4], interlace=True)
    w, h, ch, got = _png_raster(inter)
    assert bytes(got.tobytes()) == samples
    # interlaced palette image: indices scatter, then PLTE expands
    pal = bytes(b for j in range(256) for b in (j, (j * 5) % 256, 255 - j))
    idx = bytes(hashlib.md5(f"a7p{i}".encode()).digest()[0]
                for i in range(9 * 6))
    inter_p = encode_png(9, 6, idx, color_type=3, palette=pal,
                         interlace=True)
    w, h, ch, got_p = _png_raster(inter_p)
    assert (w, h, ch) == (9, 6, 3)
    assert bytes(got_p.tobytes()) == bytes(
        b for i in idx for b in pal[3 * i:3 * i + 3]
    )


def test_adam7_truncated_stream_rejected():
    import zlib

    from soda_spark_spark.operators.multimodal import (
        _png_raster, encode_png,
    )

    inter = bytearray(encode_png(8, 8, bytes(64), color_type=0,
                                 interlace=True))
    # rebuild with one byte lopped off the decompressed stream
    import struct
    pos = 8
    parts = {}
    order = []
    while pos + 8 <= len(inter):
        (length,) = struct.unpack_from(">I", inter, pos)
        ctype = bytes(inter[pos + 4:pos + 8])
        parts[ctype] = bytes(inter[pos + 8:pos + 8 + length])
        order.append(ctype)
        pos += 12 + length
    raw = zlib.decompress(parts[b"IDAT"])
    bad = zlib.compress(raw[:-1])

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    rebuilt = (bytes(inter[:8]) + chunk(b"IHDR", parts[b"IHDR"])
               + chunk(b"IDAT", bad) + chunk(b"IEND", b""))
    import pytest
    with pytest.raises(ValueError, match="Adam7"):
        _png_raster(rebuilt)


# ---------------------------------------------------------------------------
# 16-bit and packed 1/2/4-bit depths (round 13)
# ---------------------------------------------------------------------------


def test_png_16bit_msb_reduction():
    import hashlib

    from soda_spark_spark.operators.multimodal import (
        _png_raster, encode_png,
    )

    raw16 = bytes(
        hashlib.md5(f"s16{i}".encode()).digest()[0]
        for i in range(5 * 4 * 3 * 2)
    )
    png = encode_png(5, 4, raw16, color_type=2, depth=16,
                     filters=[0, 1, 2, 3, 4])
    w, h, ch, got = _png_raster(png)
    assert (w, h, ch) == (5, 4, 3)
    # 8-bit reduction takes each sample's MSB (big-endian first byte)
    assert bytes(got.tobytes()) == raw16[0::2]
    # 16-bit gray+alpha too
    ga = bytes(hashlib.md5(f"ga{i}".encode()).digest()[0]
               for i in range(3 * 3 * 2 * 2))
    png2 = encode_png(3, 3, ga, color_type=4, depth=16)
    _, _, ch2, got2 = _png_raster(png2)
    assert ch2 == 2 and bytes(got2.tobytes()) == ga[0::2]


def test_png_packed_depths_gray_and_palette():
    import hashlib

    from soda_spark_spark.operators.multimodal import (
        _png_raster, encode_png,
    )

    # 1/2/4-bit grayscale: unpack big-endian-first, exact 255/(2^d-1)
    # rescale; widths chosen to need padding bits in the last byte
    for d, scale in [(1, 255), (2, 85), (4, 17)]:
        vals = bytes(
            hashlib.md5(f"p{d}{i}".encode()).digest()[0] % (1 << d)
            for i in range(7 * 5)
        )
        png = encode_png(7, 5, vals, color_type=0, depth=d,
                         filters=[0, 1, 2])
        w, h, ch, got = _png_raster(png)
        assert (w, h, ch) == (7, 5, 1)
        assert bytes(got.tobytes()) == bytes(v * scale for v in vals)
    # 4-bit palette: indices unpack RAW (no rescale), then PLTE expands
    pal = bytes(b for j in range(16) for b in (j * 16, 255 - j * 16, j))
    idx = bytes(hashlib.md5(f"pi{i}".encode()).digest()[0] % 16
                for i in range(6 * 3))
    png = encode_png(6, 3, idx, color_type=3, depth=4, palette=pal)
    w, h, ch, got = _png_raster(png)
    assert (w, h, ch) == (6, 3, 3)
    assert bytes(got.tobytes()) == bytes(
        b for i in idx for b in pal[3 * i:3 * i + 3]
    )


def test_png_packed_and_16bit_interlaced():
    import hashlib

    from soda_spark_spark.operators.multimodal import (
        _png_raster, encode_png,
    )

    # Adam7 + packed bits: per-pass packing means pass rows pad
    # independently — decode must still reconstruct exactly
    vals = bytes(hashlib.md5(f"ip{i}".encode()).digest()[0] % 4
                 for i in range(9 * 9))
    plain = encode_png(9, 9, vals, color_type=0, depth=2)
    inter = encode_png(9, 9, vals, color_type=0, depth=2, interlace=True)
    _, _, _, sp = _png_raster(plain)
    _, _, _, si = _png_raster(inter)
    assert bytes(si.tobytes()) == bytes(sp.tobytes()) == bytes(
        v * 85 for v in vals
    )
    raw16 = bytes(hashlib.md5(f"i16{i}".encode()).digest()[0]
                  for i in range(5 * 5 * 2))
    i16 = encode_png(5, 5, raw16, color_type=0, depth=16, interlace=True)
    _, _, _, g16 = _png_raster(i16)
    assert bytes(g16.tobytes()) == raw16[0::2]


def test_png_depth_validation():
    import pytest

    from soda_spark_spark.operators.multimodal import encode_png

    with pytest.raises(ValueError, match="depth"):
        encode_png(2, 2, bytes(4), color_type=2, depth=4)  # RGB can't pack
    with pytest.raises(ValueError, match="depth"):
        encode_png(2, 2, bytes(8), color_type=3, depth=16)  # palette <= 8
    with pytest.raises(ValueError, match="range"):
        encode_png(2, 2, bytes([4, 0, 0, 0]), color_type=0, depth=2)
