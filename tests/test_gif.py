"""GIF decode (round 13): from-scratch variable-width LZW + palette
expansion — the second stdlib-closable compressed image format after
PNG. The encoder (`encode_gif`/`_gif_lzw_encode`) exists for
certification; the decoder is the product."""
from __future__ import annotations

import hashlib
import random

import pytest

from soda_spark_spark.operators.multimodal import (
    _gif_lzw_decode,
    _gif_lzw_encode,
    _gif_raster,
    decode_image,
    encode_gif,
    image_hash_payload,
    resize_image_payload,
    sniff_image_format,
)

GRAY256 = bytes(b for i in range(256) for b in (i, i, i))


def test_sniff_gif():
    assert sniff_image_format(b"GIF89a" + b"\x00" * 10) == "gif"
    assert sniff_image_format(b"GIF87a" + b"\x00" * 10) == "gif"


def test_lzw_round_trip_fuzz():
    """Round-trip across code widths, table growth, KwKwK runs, and
    the 4096-entry clear: any encoder/decoder width desync fails
    immediately."""
    rng = random.Random(13)
    for min_code, n_sym, length in [
        (2, 4, 1), (2, 4, 50), (2, 3, 2000), (4, 16, 5000),
        (8, 256, 20000),  # long enough to force a 4096-cap CLEAR
    ]:
        data = bytes(rng.randrange(n_sym) for _ in range(length))
        packed = _gif_lzw_encode(data, min_code)
        assert bytes(_gif_lzw_decode(packed, min_code)) == data
    # highly repetitive input exercises deep KwKwK chains
    rep = (b"\x00\x01" * 300 + b"\x02" * 700) * 3
    packed = _gif_lzw_encode(rep, 2)
    assert bytes(_gif_lzw_decode(packed, 2)) == rep
    assert len(packed) < len(rep)  # it actually compresses


def test_lzw_decode_errors():
    # bit exhaustion without END: tolerated (browser behavior), the
    # raster-length check downstream catches real truncation
    assert _gif_lzw_decode(b"", 2) == bytearray()
    with pytest.raises(ValueError, match="min code size"):
        _gif_lzw_decode(b"\x00", 1)
    # first data code beyond the table
    bad = (4 | (7 << 3)).to_bytes(2, "little")  # CLEAR then code 7 (> end)
    with pytest.raises(ValueError, match="code"):
        _gif_lzw_decode(bad, 2)


def test_gif_missing_end_code_tolerated():
    idx = bytes(range(12))
    gif = bytearray(encode_gif(4, 3, idx, GRAY256))
    # strip the END code's final byte from the (single) data sub-block:
    # find the sub-block, shorten it by one byte
    img_at = gif.index(0x2C, 13 + 768)
    blk_at = img_at + 10 + 1  # descriptor + min-code byte
    n = gif[blk_at]
    stream = bytes(gif[blk_at + 1:blk_at + 1 + n])
    packed = _gif_lzw_encode(idx, 8)
    assert stream == packed
    short = packed[:-1]  # lops the END code's bits
    rebuilt = (bytes(gif[:blk_at]) + bytes([len(short)]) + short
               + b"\x00\x3b")
    w, h, ch, samples = _gif_raster(rebuilt)
    assert (w, h) == (4, 3)
    assert bytes(samples.tobytes()) == bytes(
        b for i in idx for b in (i, i, i)
    )
    # but a stream missing real PIXELS still fails the length check
    very_short = packed[:2]
    rebuilt2 = (bytes(gif[:blk_at]) + bytes([len(very_short)])
                + very_short + b"\x00\x3b")
    with pytest.raises(ValueError, match="short"):
        _gif_raster(rebuilt2)


def test_gif_encode_decode_round_trip():
    idx = bytes(hashlib.md5(f"g{i}".encode()).digest()[0] for i in range(72))
    gif = encode_gif(9, 8, idx, GRAY256)
    w, h, ch, samples = _gif_raster(gif)
    assert (w, h, ch) == (9, 8, 3)
    # identity gray palette: every RGB triple is (i, i, i)
    got = bytes(samples.tobytes())
    assert got == bytes(b for i in idx for b in (i, i, i))
    stats = decode_image(gif)
    assert stats["format"] == "gif"
    assert stats["sum_value"] == 3 * sum(idx)
    assert stats["width"] == 9 and stats["height"] == 8


def test_gif_small_palette_and_multi_subblock():
    pal = bytes([0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255])  # 4 colors
    idx = bytes((i * 7 + i // 9) % 4 for i in range(900))  # 30x30
    gif = encode_gif(30, 30, idx, pal)
    w, h, ch, samples = _gif_raster(gif)
    assert (w, h, ch) == (30, 30, 3)
    px = samples.reshape(-1, 3)
    assert all(tuple(px[i]) == tuple(pal[3 * idx[i]:3 * idx[i] + 3])
               for i in range(0, 900, 97))


def test_gif_extensions_skipped_and_87a():
    idx = bytes(range(12))
    gif = bytearray(encode_gif(4, 3, idx, GRAY256))
    # splice a GCE (transparency) + comment extension before the image
    img_at = gif.index(0x2C, 13 + 768)
    ext = (b"\x21\xf9\x04\x01\x00\x00\x05\x00"          # GCE, transp idx 5
           b"\x21\xfe\x05hello\x00")                     # comment
    patched = bytes(gif[:img_at]) + ext + bytes(gif[img_at:])
    w, h, ch, samples = _gif_raster(patched)
    assert (w, h) == (4, 3)
    # transparent index still decodes as its palette color (documented)
    assert samples.reshape(-1, 3)[5][0] == 5
    # GIF87a variant parses identically
    w2, _, _, s2 = _gif_raster(b"GIF87a" + patched[6:])
    assert w2 == 4 and bytes(s2.tobytes()) == bytes(samples.tobytes())


def test_gif_interlaced_round_trip():
    """GIF interlacing is a pure four-pass row permutation; decode
    undoes it exactly, for heights exercising every pass pattern."""
    for h in (1, 2, 3, 5, 8, 13, 16):
        idx = bytes(hashlib.md5(f"il{h}{i}".encode()).digest()[0]
                    for i in range(7 * h))
        plain = encode_gif(7, h, idx, GRAY256)
        inter = encode_gif(7, h, idx, GRAY256, interlace=True)
        assert inter != plain  # genuinely stored in pass order
        w, hh, ch, s_plain = _gif_raster(plain)
        _, _, _, s_inter = _gif_raster(inter)
        assert bytes(s_inter.tobytes()) == bytes(s_plain.tobytes())


def test_gif_quarantine_paths():
    with pytest.raises(ValueError, match="not a GIF"):
        _gif_raster(b"NOTGIF" + bytes(20))
    with pytest.raises(ValueError, match="no image data"):
        _gif_raster(b"GIF89a" + (4).to_bytes(2, "little")
                    + (3).to_bytes(2, "little") + b"\x00\x00\x00\x3b")
    # encoder validation
    with pytest.raises(ValueError, match="palette"):
        encode_gif(2, 2, bytes(4), bytes(9))  # 3 colors: not a power of 2
    with pytest.raises(ValueError, match="index"):
        encode_gif(2, 2, bytes([0, 1, 2, 3]), bytes(6))  # 2-color palette


def test_gif_feeds_resize_and_hash():
    idx = bytes(hashlib.md5(f"rz{i}".encode()).digest()[0]
                for i in range(72))
    gif = encode_gif(9, 8, idx, GRAY256)
    out = resize_image_payload(gif, 3, 2, out_format="ppm")
    assert (out["width"], out["height"], out["format"]) == (3, 2, "ppm")
    # gray identity palette -> GIF hash == the PGM hash of the same pixels
    pgm = b"P5\n9 8\n255\n" + idx
    assert image_hash_payload(gif) == image_hash_payload(pgm)


def _bmp24(w: int, h: int, rgb_topdown: bytes) -> bytes:
    """Minimal bottom-up 24-bit BMP writer (test-local): takes TOP-DOWN
    RGB pixels, stores them the way BMP does (bottom-up, BGR, rows
    padded to 4 bytes)."""
    import struct

    row_raw = w * 3
    pad = (4 - row_raw % 4) % 4
    body = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up
        row = rgb_topdown[r * row_raw:(r + 1) * row_raw]
        for c in range(w):  # RGB -> BGR
            px = row[c * 3:c * 3 + 3]
            body += bytes([px[2], px[1], px[0]])
        body += b"\x00" * pad
    off = 54
    hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
    return hdr + dib + bytes(body)


def test_bmp_raster_normalization_and_parity():
    """BMP joins the unified raster channel: _bmp_raster yields
    top-down RGB, so the SAME pixels hash identically through
    BMP and PPM, and resize accepts BMP input."""
    import hashlib

    from soda_spark_spark.operators.multimodal import (
        _bmp_raster,
        image_hash_payload,
        resize_image_payload,
    )

    rgb = bytes(hashlib.md5(f"bmp{i}".encode()).digest()[0]
                for i in range(9 * 8 * 3))
    bmp = _bmp24(9, 8, rgb)
    w, h, ch, samples = _bmp_raster(bmp)
    assert (w, h, ch) == (9, 8, 3)
    assert bytes(samples.tobytes()) == rgb  # normalized to top-down RGB
    ppm = b"P6\n9 8\n255\n" + rgb
    assert image_hash_payload(bmp) == image_hash_payload(ppm)
    out = resize_image_payload(bmp, 3, 2, out_format="ppm")
    assert (out["width"], out["height"]) == (3, 2)
    # resized BMP == resized PPM byte-exactly
    assert out["payload"] == resize_image_payload(ppm, 3, 2,
                                                  out_format="ppm")["payload"]
