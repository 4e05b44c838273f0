"""Nearest-neighbor image resize (`multimodal.resize_image_payload` /
`resize_images`): exact integer index mapping
src = (dst * src_dim) // dst_dim, pinned against hand-computed picks,
round-tripped through both output encoders, and driven through the
Arrow operator with the quarantine contract."""
from __future__ import annotations

import pytest

from soda_spark_spark.operators import multimodal as mm


def _ppm(w, h, pix):
    return f"P6\n{w} {h}\n255\n".encode() + bytes(pix)


def test_resize_identity_is_lossless_ppm():
    pix = [(i * 7) % 256 for i in range(4 * 3 * 3)]
    src = _ppm(4, 3, pix)
    out = mm.resize_image_payload(src, 4, 3, out_format="ppm")
    assert out["payload"] == src
    assert (out["width"], out["height"], out["format"]) == (4, 3, "ppm")


def test_resize_downsample_picks_expected_pixels():
    # 4x3 RGB -> 2x2: rows (0*3)//2=0,(1*3)//2=1; cols (0*4)//2=0,(1*4)//2=2
    pix = list(range(4 * 3 * 3))  # byte p = index (values 0..35 fit)
    out = mm.resize_image_payload(_ppm(4, 3, pix), 2, 2, out_format="ppm")
    body = out["payload"][out["n_bytes"] - 12:]
    expect = []
    for r in (0, 1):
        for c in (0, 2):
            p = (r * 4 + c) * 3
            expect += pix[p : p + 3]
    assert list(body) == expect


def test_resize_upsample_replicates_nearest():
    # 2x1 -> 4x2: cols (0*2)//4=0,(1*2)//4=0,(2*2)//4=1,(3*2)//4=1
    pix = [10, 20, 30, 40, 50, 60]  # two RGB pixels A, B
    out = mm.resize_image_payload(_ppm(2, 1, pix), 4, 2, out_format="ppm")
    body = list(out["payload"][-24:])
    row = [10, 20, 30, 10, 20, 30, 40, 50, 60, 40, 50, 60]
    assert body == row + row


def test_resize_png_roundtrip_and_gray():
    pix = bytes((11 * i) % 256 for i in range(6 * 4 * 3))
    png = mm.encode_png(6, 4, pix, filters=[0, 1, 2, 3, 4])
    out = mm.resize_image_payload(png, 3, 2, out_format="png")
    assert out["format"] == "png"
    got = mm._decode_png(out["payload"])
    rows, cols = (0, 2), (0, 2, 4)
    expect = sum(
        pix[(r * 6 + c) * 3 + ch]
        for r in rows for c in cols for ch in range(3)
    )
    assert got["sum_value"] == expect
    # grayscale PGM -> PNG color type 0
    pgm = b"P5\n3 2\n255\n" + bytes([1, 2, 3, 4, 5, 6])
    g = mm.resize_image_payload(pgm, 2, 1, out_format="png")
    dec = mm._decode_png(g["payload"])
    assert (dec["width"], dec["height"]) == (2, 1)
    assert dec["sum_value"] == 1 + 2  # cols (0*3)//2=0,(1*3)//2=1 of row 0


def test_resize_rgba_requires_png_out():
    pix = bytes(range(2 * 2 * 4))
    png = mm.encode_png(2, 2, pix, color_type=6)
    with pytest.raises(ValueError, match="alpha"):
        mm.resize_image_payload(png, 1, 1, out_format="ppm")
    out = mm.resize_image_payload(png, 1, 1, out_format="png")
    assert mm._decode_png(out["payload"])["sum_value"] == sum(pix[:4])


def test_resize_rejects_unsupported_inputs():
    # unknown formats stay a registry boundary; jpeg is REAL as of
    # round 15, so a garbage jpeg-signature payload is now a parse
    # error, not an unsupported format
    with pytest.raises(NotImplementedError, match="ppm/pgm/png"):
        mm.resize_image_payload(b"RIFFxxxxWEBPish", 2, 2)
    with pytest.raises(ValueError):
        mm.resize_image_payload(b"\xff\xd8\xffjpegish", 2, 2)
    with pytest.raises(ValueError, match=">= 1x1"):
        mm.resize_image_payload(_ppm(2, 1, [0] * 6), 0, 2)


def test_resize_images_operator_quarantine(spark):
    good = _ppm(4, 3, [(i * 3) % 256 for i in range(36)])
    rows = [(1, bytearray(good)), (2, b"not an image"), (3, None)]
    df = spark.createDataFrame(rows, "id long, payload binary")
    got = {r.id: r for r in mm.resize_images(
        df, "id", "payload", width=2, height=2).collect()}
    assert got[1].error is None and got[1].format == "png"
    assert got[1].width == 2 and got[1].height == 2
    # the resized payload itself decodes
    dec = mm.decode_image(bytes(got[1].payload))
    assert (dec["width"], dec["height"]) == (2, 2)
    assert got[2].error is not None and got[2].payload is None
    assert got[3].error is not None
    import py4j.protocol  # noqa: F401

    with pytest.raises(Exception):
        mm.resize_images(df, "id", "payload", width=2, height=2,
                         on_error="raise").collect()


# ------------------------------------------------- audio resample


def _wav(samples16, rate=8000, channels=1):
    import struct

    data = b"".join(struct.pack("<h", s) for s in samples16)
    block = channels * 2
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate,
                                rate * block, block, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )


def test_resample_downsample_picks_even_samples():
    src = _wav([100, -200, 300, -400, 500, -600], rate=8000)
    out = mm.resample_audio_payload(src, 4000)
    assert (out["sample_rate"], out["n_samples"]) == (4000, 3)
    dec = mm.decode_audio(out["payload"])
    assert dec["sum_value"] == 100 + 300 + 500
    assert dec["sample_rate"] == 4000


def test_resample_upsample_replicates_and_identity():
    src = _wav([7, -9], rate=1000)
    up = mm.resample_audio_payload(src, 2000)
    assert up["n_samples"] == 4
    assert mm.decode_audio(up["payload"])["sum_value"] == 7 + 7 - 9 - 9
    same = mm.resample_audio_payload(src, 1000)
    assert same["payload"] == src  # canonical header in == identity


def test_resample_stereo_keeps_frames_paired():
    # stereo frames (L,R): (1,2) (3,4) (5,6) (7,8) @8k -> 4k picks 0,2
    src = _wav([1, 2, 3, 4, 5, 6, 7, 8], rate=8000, channels=2)
    out = mm.resample_audio_payload(src, 4000)
    assert (out["channels"], out["n_samples"]) == (2, 4)
    dec = mm.decode_audio(out["payload"])
    assert dec["sum_value"] == 1 + 2 + 5 + 6  # whole frames, never split


def test_resample_rejects_bad_inputs():
    import pytest as _pytest

    with _pytest.raises(NotImplementedError, match="PCM WAV"):
        mm.resample_audio_payload(b"\xff\xfb mp3ish....", 4000)
    src = _wav([1, 2, 3], rate=8000)
    with _pytest.raises(ValueError, match="no output frames"):
        mm.resample_audio_payload(src, 1000)  # 3*1000//8000 == 0


def test_resample_audio_operator_quarantine(spark):
    good = _wav([10, 20, 30, 40], rate=8000)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, b"junk"), (3, None)],
        "id long, payload binary",
    )
    got = {r.id: r for r in mm.resample_audio(
        df, "id", "payload", target_rate=4000).collect()}
    assert got[1].error is None and got[1].sample_rate == 4000
    assert mm.decode_audio(bytes(got[1].payload))["sum_value"] == 10 + 30
    assert got[2].error is not None and got[2].payload is None
    assert got[3].error is not None
