"""Round-16 regressions — every defect from the r15 VERDICT/ADVICE:

1. pdf_text `/Length` regex backtracking on INDIRECT multi-digit
   references (`/Length 50 0 R` misparsed as direct length 5): the
   Flate variant quarantined whole documents, the raw variant silently
   returned '' (the wrong-answer mode). Fixed with a \\b anchor.
2. pdf_text stream-filter coverage: /ASCIIHexDecode, /ASCII85Decode,
   /LZWDecode, filter chains, PNG predictors (/Predictor >= 10) and
   TIFF predictor 2 — plus the ObjStm quarantine contract: an object
   stream that cannot be decoded now FAILS the document instead of
   silently skipping (a Type0 font hidden inside would otherwise
   escape the CID quarantine).
3. JPEG 0xFF fill-byte tolerance (T.81 B.1.1.2) in both marker walks
   (decoder + header-only dimensions probe).
4. MP3 VBRI (Fraunhofer) frame-count header -> exact VBR duration.
5. WebP header-only dimensions (VP8 / VP8L / VP8X) in the triage
   sniffer + `image_dimensions_payload`.
6. M4A (ISOBMFF audio) leg of `audio_probe`.
"""

from __future__ import annotations

import base64
import struct
import zlib

import pytest

from soda_spark_spark.operators.pdf_text import (
    _ascii85_decode,
    _ascii_hex_decode,
    _lzw_decode,
    _png_unpredict,
    _tiff_unpredict,
    pdf_to_text,
)


# --------------------------------------------------------------- PDF /Length


def _pdf(*parts: bytes) -> bytes:
    return b"%PDF-1.4\n" + b"".join(parts) + b"%%EOF"


def _obj(num: int, body: bytes) -> bytes:
    return b"%d 0 obj\n" % num + body + b"\nendobj\n"


def _stream_obj(num: int, head: bytes, data: bytes) -> bytes:
    return _obj(num, head + b"\nstream\n" + data + b"\nendstream")


def test_indirect_length_flate_extracts():
    """`/Length 12 0 R` (multi-digit object number) on a FlateDecode
    content stream: the old regex backtracked to a direct length of 1,
    truncating the stream and quarantining the document."""
    content = b"BT /F1 11 Tf (indirect flate length) Tj ET"
    z = zlib.compress(content)
    pdf = _pdf(
        _stream_obj(1, b"<< /Length 12 0 R /Filter /FlateDecode >>", z),
        _obj(12, str(len(z)).encode()),
    )
    assert pdf_to_text(pdf) == "indirect flate length"


def test_indirect_length_raw_extracts_not_silent_empty():
    """The silent-wrong-answer mode: a RAW stream with `/Length 50 0 R`
    used to be truncated to its first byte(s), so the BT block vanished
    and pdf_to_text returned '' with no error."""
    content = b"BT /F1 11 Tf (raw indirect length) Tj ET"
    pdf = _pdf(
        _stream_obj(50, b"<< /Type /X >>", b"x"),  # ref target exists
        _stream_obj(1, b"<< /Length 50 0 R >>", content),
    )
    assert pdf_to_text(pdf) == "raw indirect length"


def test_direct_length_still_bounds_exactly():
    """A direct `/Length N` must bound the stream even when the data
    contains an `endstream` look-alike."""
    content = b"BT (bounded) Tj ET fake endstream tail BT (noise"
    bounded = content[: content.find(b" fake")]
    pdf = _pdf(
        _stream_obj(1, b"<< /Length %d >>" % len(bounded), content)
    )
    assert pdf_to_text(pdf) == "bounded"


# ------------------------------------------------------------- PDF filters


def test_ascii_hex_filter():
    content = b"BT /F1 11 Tf (hex filtered) Tj ET"
    enc = content.hex().encode() + b">"
    pdf = _pdf(
        _stream_obj(
            1, b"<< /Length %d /Filter /ASCIIHexDecode >>" % len(enc), enc
        )
    )
    assert pdf_to_text(pdf) == "hex filtered"


def test_ascii85_filter_and_flate_chain():
    content = b"BT /F1 11 Tf (a85 + flate chain) Tj ET"
    enc = base64.a85encode(zlib.compress(content)) + b"~>"
    pdf = _pdf(
        _stream_obj(
            1,
            b"<< /Length %d /Filter [ /ASCII85Decode /FlateDecode ] >>"
            % len(enc),
            enc,
        )
    )
    assert pdf_to_text(pdf) == "a85 + flate chain"


def _lzw_encode(data: bytes) -> bytes:
    """Test-side LZW encoder (PDF/TIFF convention, EarlyChange=1):
    width bookkeeping mirrors the DECODER's table-length view so the
    9->10->11 bit transitions land on the same code boundaries."""
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    dec_len = 258  # the decoder's table length after each code
    codes: list[tuple[int, int]] = [(256, 9)]
    emitted = 0

    def emit(code: int) -> None:
        nonlocal dec_len, width, emitted
        codes.append((code, width))
        emitted += 1
        if emitted > 1:
            dec_len += 1
        if dec_len + 1 >= (1 << width) and width < 12:
            width += 1

    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = next_code
        next_code += 1
        if next_code >= 4095:
            # table nearly full at 12 bits: the spec requires a Clear
            codes.append((256, width))
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            dec_len = 258
            width = 9
            emitted = 0
        w = bytes([ch])
    if w:
        emit(table[w])
    codes.append((257, width))
    acc = nbits = 0
    out = bytearray()
    for code, cw in codes:
        acc = (acc << cw) | code
        nbits += cw
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def test_lzw_decode_roundtrip_with_width_growth():
    # deterministic pseudo-random bytes (seeded LCG) long enough to
    # push the code width past 9 and 10 bits, with repeats so the
    # code-reuse and KwKwK paths both run
    x = 12345
    data = bytearray()
    for _ in range(6000):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        data.append((x >> 16) & 0xFF)
    data += b"abcabcabc" * 50
    assert _lzw_decode(_lzw_encode(bytes(data))) == bytes(data)


def test_lzw_filter_in_document():
    content = b"BT /F1 11 Tf (lzw filtered) Tj ET"
    enc = _lzw_encode(content)
    pdf = _pdf(
        _stream_obj(
            1, b"<< /Length %d /Filter /LZWDecode >>" % len(enc), enc
        )
    )
    assert pdf_to_text(pdf) == "lzw filtered"


def test_png_unpredict_all_filters():
    rows = [bytes(range(16)), bytes(range(16, 32)), bytes(range(32, 48))]
    flat = b"".join(rows)
    for ftype in (0, 1, 2, 3, 4):
        enc = bytearray()
        prev = bytes(16)
        for r in rows:
            enc.append(ftype)
            if ftype == 0:
                enc += r
            elif ftype == 1:
                enc += bytes(
                    (r[i] - (r[i - 1] if i else 0)) & 0xFF
                    for i in range(16)
                )
            elif ftype == 2:
                enc += bytes((r[i] - prev[i]) & 0xFF for i in range(16))
            elif ftype == 3:
                enc += bytes(
                    (r[i] - ((r[i - 1] if i else 0) + prev[i]) // 2) & 0xFF
                    for i in range(16)
                )
            else:  # paeth: with a=left, b=up, c=up-left
                row_enc = bytearray()
                for i in range(16):
                    a = r[i - 1] if i else 0
                    b = prev[i]
                    c = prev[i - 1] if i else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = (
                        a if pa <= pb and pa <= pc
                        else (b if pb <= pc else c)
                    )
                    row_enc.append((r[i] - pred) & 0xFF)
                enc += row_enc
            prev = r
        assert _png_unpredict(bytes(enc), 1, 8, 16) == flat, ftype


def test_tiff_unpredict():
    rows = [bytes([10, 20, 35, 60]), bytes([5, 5, 5, 5])]
    enc = bytearray()
    for r in rows:
        enc.append(r[0])
        for i in range(1, 4):
            enc.append((r[i] - r[i - 1]) & 0xFF)
    assert _tiff_unpredict(bytes(enc), 1, 4) == b"".join(rows)


def _predict_up(data: bytes, columns: int) -> bytes:
    """PNG-predict (filter type 2 = Up) helper for ObjStm fixtures;
    pads the tail row with spaces (harmless in ObjStm bodies)."""
    if len(data) % columns:
        data += b" " * (columns - len(data) % columns)
    out = bytearray()
    prev = bytes(columns)
    for i in range(0, len(data), columns):
        row = data[i : i + columns]
        out.append(2)
        out += bytes((row[j] - prev[j]) & 0xFF for j in range(columns))
        prev = row
    return bytes(out)


def test_predictor_objstm_type0_still_quarantines():
    """A /Predictor 12 Flate ObjStm hiding a Type0 font: the unpack
    used to fail silently (predictor never applied -> header parse
    failed -> `continue`), so the hidden font escaped the CID
    quarantine and 2-byte codes emitted as mojibake."""
    inner = (
        b"<< /Type /Font /Subtype /Type0 /BaseFont /Hidden >>"
        b"<< /Type /Page /Resources << /Font << /F1 3 0 R >> >> >>"
    )
    off2 = len(b"<< /Type /Font /Subtype /Type0 /BaseFont /Hidden >>")
    header = b"3 0 4 %d " % off2
    z = zlib.compress(_predict_up(header + inner, 16))
    content = b"BT /F1 11 Tf (\x00H\x00i) Tj ET"
    pdf = _pdf(
        _stream_obj(
            2,
            b"<< /Type /ObjStm /N 2 /First %d /Length %d "
            b"/Filter /FlateDecode "
            b"/DecodeParms << /Predictor 12 /Columns 16 >> >>"
            % (len(header), len(z)),
            z,
        ),
        _stream_obj(5, b"<< /Length %d >>" % len(content), content),
    )
    with pytest.raises(NotImplementedError, match="CID"):
        pdf_to_text(pdf)


def test_undecodable_objstm_quarantines_document():
    """An ObjStm behind an unsupported filter must FAIL the document
    (its hidden objects are invisible), never silently skip."""
    pdf = _pdf(
        _stream_obj(
            2,
            b"<< /Type /ObjStm /N 1 /First 4 /Length 5 "
            b"/Filter /DCTDecode >>",
            b"xxxxx",
        ),
        _stream_obj(5, b"<< /Length 10 >>", b"BT (t) Tj ET"[:10]),
    )
    with pytest.raises(NotImplementedError, match="DCTDecode"):
        pdf_to_text(pdf)


def test_unsupported_filter_on_non_text_stream_still_skipped():
    """Image streams (DCTDecode etc) outside an ObjStm keep the old
    behavior: skipped, document extracts."""
    content = b"BT /F1 11 Tf (with an image) Tj ET"
    pdf = _pdf(
        _stream_obj(
            4, b"<< /Subtype /Image /Filter /DCTDecode /Length 3 >>",
            b"\xff\xd8\xff",
        ),
        _stream_obj(1, b"<< /Length %d >>" % len(content), content),
    )
    assert pdf_to_text(pdf) == "with an image"


# -------------------------------------------------------- JPEG fill bytes


def test_jpeg_fill_bytes_decode_and_dims():
    import numpy as np

    from soda_spark_spark.operators.jpeg import (
        _jpeg_raster,
        encode_jpeg_baseline,
    )
    from soda_spark_spark.operators.multimodal import (
        image_dimensions_payload,
    )

    img = np.arange(16 * 16, dtype=np.uint8).tobytes()
    jp = encode_jpeg_baseline(16, 16, img, channels=1)
    base = _jpeg_raster(jp)
    # T.81 B.1.1.2: a 0xFF fill byte before any marker is legal
    padded = jp[:2] + b"\xff" + jp[2:]
    w, h, ch, samples = _jpeg_raster(padded)
    assert (w, h, ch) == (base[0], base[1], base[2])
    assert np.array_equal(samples, base[3])
    dims = image_dimensions_payload(padded)
    assert (dims["width"], dims["height"]) == (16, 16)


# ---------------------------------------------------------------- MP3 VBRI


def test_mp3_vbri_exact_duration():
    from soda_spark_spark.operators.multimodal import _probe_mp3

    # MPEG1 Layer III, 128 kbps, 44100 Hz, stereo; VBRI sits at a
    # FIXED 32 bytes after the 4-byte frame header
    frame = bytearray(bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\x00" * 2000)
    vbri = (
        b"VBRI" + struct.pack(">HHH", 1, 0, 0)
        + struct.pack(">I", 123456) + struct.pack(">I", 1000)
    )
    frame[36 : 36 + len(vbri)] = vbri
    m = _probe_mp3(bytes(frame))
    assert m["duration_exact"] is True
    assert m["duration_ms"] == 1000 * 1152 * 1000 // 44100


def test_mp3_without_vbr_header_stays_estimate():
    from soda_spark_spark.operators.multimodal import _probe_mp3

    frame = bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\x00" * 2000
    assert _probe_mp3(frame)["duration_exact"] is False


# ------------------------------------------------------------- WebP dims


def _webp(fourcc: bytes, data: bytes) -> bytes:
    chunk = fourcc + struct.pack("<I", len(data)) + data
    if len(data) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def test_webp_vp8_lossy_dims():
    from soda_spark_spark.operators.multimodal import (
        image_dimensions_payload,
        sniff_image_format,
    )

    p = _webp(
        b"VP8 ",
        b"\x00\x00\x00\x9d\x01\x2a"
        + struct.pack("<HH", 320, 240) + b"\x00" * 8,
    )
    assert sniff_image_format(p) == "webp"
    assert image_dimensions_payload(p) == {
        "format": "webp", "width": 320, "height": 240,
    }


def test_webp_vp8l_lossless_dims():
    from soda_spark_spark.operators.multimodal import (
        image_dimensions_payload,
    )

    bits = (1024 - 1) | ((768 - 1) << 14)
    p = _webp(b"VP8L", b"\x2f" + struct.pack("<I", bits) + b"\x00" * 8)
    d = image_dimensions_payload(p)
    assert (d["width"], d["height"]) == (1024, 768)


def test_webp_vp8x_extended_dims():
    from soda_spark_spark.operators.multimodal import (
        image_dimensions_payload,
    )

    p = _webp(
        b"VP8X",
        b"\x02" + b"\x00" * 3
        + (640 - 1).to_bytes(3, "little")
        + (480 - 1).to_bytes(3, "little") + b"\x00" * 6,
    )
    d = image_dimensions_payload(p)
    assert (d["width"], d["height"]) == (640, 480)


def test_webp_pixel_decode_stays_quarantined():
    from soda_spark_spark.operators.multimodal import decode_image

    p = _webp(
        b"VP8 ",
        b"\x00\x00\x00\x9d\x01\x2a"
        + struct.pack("<HH", 8, 8) + b"\x00" * 8,
    )
    with pytest.raises(NotImplementedError, match="webp"):
        decode_image(p)


def _tiff(order: str, w: int, h: int, *, long_type: bool = False) -> bytes:
    end = "<" if order == "II" else ">"
    typ, fmt = (4, "I") if long_type else (3, "H")
    entries = b""
    for tag, v in ((256, w), (257, h), (259, 1)):
        val = struct.pack(end + fmt, v)
        val += b"\x00" * (4 - len(val))
        entries += struct.pack(end + "HHI", tag, typ, 1) + val
    hdr = (b"II*\x00" if order == "II" else b"MM\x00*") \
        + struct.pack(end + "I", 8)
    return hdr + struct.pack(end + "H", 3) + entries \
        + struct.pack(end + "I", 0)


def test_tiff_dims_both_byte_orders():
    from soda_spark_spark.operators.multimodal import (
        image_dimensions_payload,
        sniff_image_format,
    )

    for order in ("II", "MM"):
        p = _tiff(order, 800, 600)
        assert sniff_image_format(p) == "tiff"
        assert image_dimensions_payload(p) == {
            "format": "tiff", "width": 800, "height": 600,
        }
    # LONG-typed dimension values
    d = image_dimensions_payload(_tiff("II", 70000, 3, long_type=True))
    assert (d["width"], d["height"]) == (70000, 3)


def test_tiff_without_dims_quarantines():
    from soda_spark_spark.operators.multimodal import (
        image_dimensions_payload,
    )

    p = b"II*\x00" + struct.pack("<I", 8) + struct.pack("<H", 0) \
        + struct.pack("<I", 0)
    with pytest.raises(ValueError, match="dimension"):
        image_dimensions_payload(p)


def test_webp_truncated_quarantines():
    from soda_spark_spark.operators.multimodal import (
        image_dimensions_payload,
    )

    with pytest.raises(ValueError):
        image_dimensions_payload(b"RIFF\x00\x00\x00\x00WEBPVP8 ")


# ---------------------------------------------------------------- M4A probe


def _box(t: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + t + body


def _m4a_fixture(
    *, rate: int = 44100, channels: int = 2, seconds: int = 7,
    mvhd_version: int = 0, entry_type: bytes = b"mp4a",
) -> bytes:
    if mvhd_version == 1:
        mvhd_body = (
            b"\x01" + b"\x00" * 3 + struct.pack(">QQ", 0, 0)
            + struct.pack(">IQ", rate, rate * seconds) + b"\x00" * 80
        )
    else:
        mvhd_body = (
            b"\x00" + b"\x00" * 3 + struct.pack(">II", 0, 0)
            + struct.pack(">II", rate, rate * seconds) + b"\x00" * 80
        )
    entry = _box(
        entry_type,
        b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 8
        + struct.pack(">HH", channels, 16) + b"\x00" * 4
        + struct.pack(">I", rate << 16),
    )
    stsd = _box(b"stsd", b"\x00" * 4 + struct.pack(">I", 1) + entry)
    moov = _box(
        b"moov",
        _box(b"mvhd", mvhd_body)
        + _box(b"trak", _box(b"mdia", _box(b"minf", _box(b"stbl", stsd)))),
    )
    ftyp = _box(b"ftyp", b"M4A " + struct.pack(">I", 0) + b"M4A mp42isom")
    return ftyp + moov


def test_m4a_probe_exact():
    from soda_spark_spark.operators.multimodal import (
        audio_probe_payload,
        sniff_audio_format,
    )

    p = _m4a_fixture()
    assert sniff_audio_format(p) == "m4a"
    m = audio_probe_payload(p)
    assert m["format"] == "m4a"
    assert m["sample_rate"] == 44100
    assert m["channels"] == 2
    assert m["duration_ms"] == 7000
    assert m["bitrate_kbps"] is None
    assert m["duration_exact"] is True


def test_m4a_probe_v1_mvhd_and_mono():
    from soda_spark_spark.operators.multimodal import audio_probe_payload

    m = audio_probe_payload(
        _m4a_fixture(rate=16000, channels=1, seconds=3, mvhd_version=1)
    )
    assert (m["sample_rate"], m["channels"], m["duration_ms"]) == (
        16000, 1, 3000,
    )


def test_m4a_no_moov_quarantines():
    from soda_spark_spark.operators.multimodal import audio_probe_payload

    ftyp = _box(b"ftyp", b"M4A " + struct.pack(">I", 0) + b"M4A ")
    with pytest.raises(ValueError, match="moov"):
        audio_probe_payload(ftyp + _box(b"mdat", b"\x00" * 32))


def test_mp42_video_brand_not_claimed_by_audio_sniffer():
    from soda_spark_spark.operators.multimodal import sniff_audio_format

    p = _box(b"ftyp", b"mp42" + struct.pack(">I", 0) + b"mp42isom")
    assert sniff_audio_format(p + _box(b"mdat", b"")) is None
