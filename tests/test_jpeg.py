"""Baseline JPEG codec tests (`operators/jpeg.py`): spec-table and
fixed-point pins, closed-form flat-block exactness (the arithmetic the
`jpeg_decode` oracle replays in SQL), encoder/decoder round trips
across subsampling/restart/odd-size configurations, quarantine paths,
and the multimodal plumbing (decode_image / image hash / resize over
JPEG payloads)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from soda_spark_spark.operators.jpeg import (
    _QUANT_CHROMA,
    _QUANT_LUMA,
    _ZIGZAG,
    _huff_lengths,
    _huff_spec,
    _idct_blocks,
    _idct_table,
    _jpeg_raster,
    _scaled_quant,
    encode_jpeg_baseline,
)


def test_zigzag_is_the_standard_order():
    # the well-known first and last runs of the T.81 zigzag sequence
    assert _ZIGZAG[:16] == [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    ]
    assert _ZIGZAG[-8:] == [53, 60, 61, 54, 47, 55, 62, 63]
    assert sorted(_ZIGZAG) == list(range(64))


def test_idct_matches_float_reference_within_one():
    """The pinned fixed-point IDCT vs the spec's real-valued IDCT on
    random dequantized coefficient blocks."""
    import math

    rng = np.random.RandomState(42)
    blocks = rng.randint(-900, 900, size=(32, 8, 8)).astype(np.int64)
    blocks[:, 0, 0] = rng.randint(-8192, 8192, size=32)
    got = _idct_blocks(blocks).astype(np.int64)
    cf = np.empty((8, 8))
    for u in range(8):
        cu = 1.0 / math.sqrt(2.0) if u == 0 else 1.0
        for x in range(8):
            cf[u, x] = cu / 2.0 * math.cos((2 * x + 1) * u * math.pi / 16)
    ref = cf.T @ blocks.astype(np.float64) @ cf
    ref = np.clip(np.round(ref) + 128, 0, 255)
    assert np.abs(got - ref).max() <= 1


def test_idct_dc_only_closed_form():
    """A DC-only block decodes to the closed form the oracle replays:
    ((S00 * 2896^2 + 2^25) >> 26) + 128."""
    a00 = int(_idct_table()[0, 0])
    assert a00 == 2896
    for s00 in (-1024, -100, 0, 7, 96, 800):
        block = np.zeros((1, 8, 8), dtype=np.int64)
        block[0, 0, 0] = s00
        px = _idct_blocks(block)
        want = ((s00 * a00 * a00 + (1 << 25)) >> 26) + 128
        want = min(255, max(0, want))
        assert set(px.reshape(-1).tolist()) == {want}


def test_quality_scaling_pins():
    assert _scaled_quant(_QUANT_LUMA, 50) == _QUANT_LUMA
    q90 = _scaled_quant(_QUANT_LUMA, 90)
    assert q90[0] == (16 * 20 + 50) // 100 == 3
    assert all(1 <= q <= 255 for q in _scaled_quant(_QUANT_CHROMA, 1))
    assert all(q == 1 for q in _scaled_quant(_QUANT_LUMA, 100))


def test_huffman_all_ones_code_never_assigned():
    """The reserved code point must keep every real symbol off the
    all-1-bits pattern — including the uniform-frequency case that
    breaks a naive heap merge."""
    for freqs in (
        {0: 1, 2: 1, 5: 1, 253: 1},
        {k: 1 for k in range(17)},
        {0: 1000000, 1: 1},
        {3: 5},
        {k: (k * 7919) % 101 + 1 for k in range(162)},
    ):
        lengths = _huff_lengths(freqs)
        assert set(lengths) == set(freqs)
        assert max(lengths.values()) <= 16
        _bits, _vals, codes = _huff_spec(lengths)
        for _sym, (code, ln) in codes.items():
            assert code != (1 << ln) - 1 or ln < max(
                lv for lv in lengths.values()
            ) or len(freqs) == 1
        # Kraft inequality strictly < 1 (the reserved slot was dropped)
        kraft = sum(2.0 ** -ln for ln in lengths.values())
        assert kraft < 1.0 or len(lengths) == 1


def test_flat_gray_block_is_closed_form():
    """Flat 8x8 grayscale: AC quantizes to zero, DC follows the pinned
    integer path — the whole pipeline collapses to one replayable
    expression."""
    a00 = 2896
    for v, q in ((100, 90), (7, 50), (255, 75), (128, 25)):
        payload = encode_jpeg_baseline(
            8, 8, bytes([v]) * 64, channels=1, quality=q
        )
        w, h, ch, sm = _jpeg_raster(payload)
        assert (w, h, ch) == (8, 8, 1)
        q00 = _scaled_quant(_QUANT_LUMA, q)[0]
        i = 64 * v - 8192
        mag = abs(i)
        stored = (2 * mag + 8 * q00) // (16 * q00)
        if i < 0:
            stored = -stored
        want = ((stored * q00 * a00 * a00 + (1 << 25)) >> 26) + 128
        want = min(255, max(0, want))
        assert set(sm.reshape(-1).tolist()) == {want}


def _flat_color_expected(rgb: tuple[int, int, int], quality: int):
    """Replay the full flat-MCU pipeline (the oracle's closed form):
    RGB -> YCbCr -> DC quantize/dequantize -> IDCT -> YCbCr -> RGB."""
    a00 = 2896

    def rdiv(n, d):
        return (2 * n + d) // (2 * d)

    r, g, b = rgb
    y = rdiv(299 * r + 587 * g + 114 * b, 1000)
    cb = 128 + rdiv(-168736 * r - 331264 * g + 500000 * b, 1000000)
    cr = 128 + rdiv(500000 * r - 418688 * g - 81312 * b, 1000000)
    ql = _scaled_quant(_QUANT_LUMA, quality)[0]
    qc = _scaled_quant(_QUANT_CHROMA, quality)[0]

    def chan(v, q00):
        i = 64 * v - 8192
        stored = (2 * abs(i) + 8 * q00) // (16 * q00)
        if i < 0:
            stored = -stored
        out = ((stored * q00 * a00 * a00 + (1 << 25)) >> 26) + 128
        return min(255, max(0, out))

    y2, cb2, cr2 = chan(y, ql), chan(cb, qc), chan(cr, qc)
    rr = y2 + rdiv(1402 * (cr2 - 128), 1000)
    gg = y2 + rdiv(-344136 * (cb2 - 128) - 714136 * (cr2 - 128), 1000000)
    bb = y2 + rdiv(1772 * (cb2 - 128), 1000)
    clamp = lambda x: min(255, max(0, x))  # noqa: E731
    return clamp(rr), clamp(gg), clamp(bb)


@pytest.mark.parametrize("subsampling", ["444", "420"])
def test_flat_color_is_closed_form(subsampling):
    for rgb, q in (((200, 30, 60), 85), ((0, 255, 128), 50), ((17, 17, 18), 95)):
        size = 16 if subsampling == "420" else 8
        payload = encode_jpeg_baseline(
            size, size, bytes(rgb) * (size * size),
            quality=q, subsampling=subsampling,
        )
        w, h, ch, sm = _jpeg_raster(payload)
        assert (w, h, ch) == (size, size, 3)
        px = sm.reshape(h, w, 3)
        want = _flat_color_expected(rgb, q)
        assert set(map(tuple, px.reshape(-1, 3).tolist())) == {want}


def test_roundtrip_smooth_gradient_tolerance():
    g = np.zeros((24, 40, 3), dtype=np.uint8)
    for y in range(24):
        for x in range(40):
            g[y, x] = (min(255, x * 5), min(255, y * 9), 60)
    for q, tol in ((95, 6), (75, 14)):
        j = encode_jpeg_baseline(40, 24, g.tobytes(), quality=q)
        w, h, ch, sm = _jpeg_raster(j)
        out = sm.reshape(h, w, 3).astype(np.int64)
        err = np.abs(out - g.astype(np.int64))
        assert err.max() <= tol, (q, err.max())


def test_roundtrip_420_and_restart_and_odd_dims():
    rng = np.random.RandomState(7)
    base = rng.randint(60, 196, size=(3, 3, 3))
    # smooth upscale so chroma subsampling loses little
    img = np.repeat(np.repeat(base, 8, axis=0), 8, axis=1).astype(np.uint8)
    img = img[:19, :21]  # odd crop: exercises edge padding
    for rst in (0, 1, 3):
        j = encode_jpeg_baseline(
            21, 19, img.tobytes(), quality=92,
            subsampling="420", restart_interval=rst,
        )
        w, h, ch, sm = _jpeg_raster(j)
        assert (w, h, ch) == (21, 19, 3)
        out = sm.reshape(h, w, 3).astype(np.int64)
        assert np.abs(out - img.astype(np.int64)).max() <= 10


def test_grayscale_roundtrip_and_decode_stats():
    from soda_spark_spark.operators.multimodal import decode_image

    ramp = np.tile(np.arange(64, 192, 2, dtype=np.uint8), (16, 1))
    j = encode_jpeg_baseline(64, 16, ramp.tobytes(), channels=1, quality=95)
    st = decode_image(j)
    assert st["format"] == "jpeg"
    assert (st["width"], st["height"]) == (64, 16)
    w, h, ch, sm = _jpeg_raster(j)
    assert ch == 1
    assert np.abs(
        sm.astype(np.int64) - ramp.astype(np.int64)
    ).max() <= 4
    assert st["sum_value"] == int(sm.astype(np.int64).sum())


def test_decode_is_bit_deterministic():
    img = np.random.RandomState(3).randint(
        0, 256, size=(16, 24, 3), dtype=np.uint8
    )
    j = encode_jpeg_baseline(24, 16, img.tobytes(), quality=80)
    d1 = _jpeg_raster(j)[3].tobytes()
    d2 = _jpeg_raster(j)[3].tobytes()
    assert hashlib.md5(d1).hexdigest() == hashlib.md5(d2).hexdigest()


def test_exotic_sofs_quarantine_and_mangled_progressive_errors():
    img = bytes([10]) * 64
    j = bytearray(encode_jpeg_baseline(8, 8, img, channels=1))
    sof = j.find(b"\xff\xc0")
    assert sof > 0
    # progressive is REAL now; a baseline stream relabeled SOF2 is an
    # INVALID progressive stream (its single scan spans DC+AC bands)
    # and must error, not mis-decode
    j[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="Ss=0"):
        _jpeg_raster(bytes(j))
    j[sof + 1] = 0xC9  # arithmetic-coded
    with pytest.raises(NotImplementedError):
        _jpeg_raster(bytes(j))


def test_truncation_and_garbage_error_not_misdecode():
    img = bytes([10]) * 64
    j = encode_jpeg_baseline(8, 8, img, channels=1)
    with pytest.raises(ValueError):
        _jpeg_raster(j[: len(j) // 2])
    with pytest.raises(ValueError):
        _jpeg_raster(b"\x00\x01\x02")


def test_image_hash_and_resize_accept_jpeg():
    from soda_spark_spark.operators.multimodal import (
        image_hash_payload, resize_image_payload,
    )

    # a left-dark right-bright image has a stable dhash
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[:, 8:] = 230
    j = encode_jpeg_baseline(16, 16, img.tobytes(), quality=90)
    hv = image_hash_payload(j)
    assert hv != 0
    # the same image as PNG should produce a NEARBY hash (identical
    # gradients survive the lossy encode)
    from soda_spark_spark.operators.multimodal import encode_png

    p = encode_png(16, 16, img.tobytes(), color_type=2)
    hp = image_hash_payload(p)
    assert bin((hv ^ hp) & ((1 << 64) - 1)).count("1") <= 4
    r = resize_image_payload(j, width=4, height=4)
    assert (r["width"], r["height"], r["format"]) == (4, 4, "png")


def test_dqt_16bit_precision_parses():
    """Rewrite the 8-bit luma DQT of a grayscale stream into a Pq=1
    (16-bit) table with identical values — decode must be unchanged."""
    img = bytes(range(64))
    j = encode_jpeg_baseline(8, 8, img, channels=1, quality=75)
    ref = _jpeg_raster(j)[3].tobytes()
    i = j.find(b"\xff\xdb")
    assert i >= 0
    seglen = int.from_bytes(j[i + 2 : i + 4], "big")
    assert seglen == 67
    vals = j[i + 5 : i + 69]
    wide = b"".join(bytes([0, v]) for v in vals)
    rebuilt = (
        j[:i]
        + b"\xff\xdb" + (131).to_bytes(2, "big")
        + bytes([0x10 | (j[i + 4] & 0x0F)]) + wide
        + j[i + 69 :]
    )
    assert _jpeg_raster(rebuilt)[3].tobytes() == ref


# ---------------------------------------------------------------------------
# progressive (SOF2): spectral selection + successive approximation
# ---------------------------------------------------------------------------


def _rand_image(seed, w, h, ch):
    return np.random.RandomState(seed).randint(
        0, 256, size=h * w * ch, dtype=np.uint8
    ).tobytes()


def test_progressive_default_script_bit_identical_to_baseline():
    """The equality law: both encoders share the quantized
    coefficients, so progressive decode must EQUAL baseline decode
    bit-for-bit — any misplaced EOB run, correction bit, or band
    boundary breaks it."""
    from soda_spark_spark.operators.jpeg import encode_jpeg_progressive

    for seed, w, h, ch, sub in (
        (1, 24, 16, 1, "444"), (2, 24, 16, 3, "444"),
        (3, 21, 19, 3, "420"), (4, 8, 8, 3, "444"),
        (5, 33, 25, 3, "420"),
    ):
        raw = _rand_image(seed, w, h, ch)
        for q in (30, 75, 95):
            b = _jpeg_raster(
                encode_jpeg_baseline(
                    w, h, raw, channels=ch, quality=q, subsampling=sub
                )
            )
            p = _jpeg_raster(
                encode_jpeg_progressive(
                    w, h, raw, channels=ch, quality=q, subsampling=sub
                )
            )
            assert b[:3] == p[:3]
            assert (b[3] == p[3]).all(), (seed, q, sub)


def test_progressive_scan_script_variants():
    """Spectral-only, no-SA, deep SA, and fine band splits all decode
    to the same raster."""
    from soda_spark_spark.operators.jpeg import encode_jpeg_progressive

    raw = _rand_image(7, 24, 16, 3)
    base = _jpeg_raster(encode_jpeg_baseline(24, 16, raw, quality=60))
    scripts = [
        # no successive approximation, one full AC band per comp
        [("dc", None, 0, 0, 0, 0)]
        + [("ac", c, 1, 63, 0, 0) for c in range(3)],
        # fine spectral splits
        [("dc", None, 0, 0, 0, 0)]
        + [("ac", c, 1, 2, 0, 0) for c in range(3)]
        + [("ac", c, 3, 9, 0, 0) for c in range(3)]
        + [("ac", c, 10, 63, 0, 0) for c in range(3)],
        # deep successive approximation (3 AC bits, 2 DC bits)
        [("dc", None, 0, 0, 0, 2), ("dc", None, 0, 0, 2, 1)]
        + [("ac", c, 1, 63, 0, 2) for c in range(3)]
        + [("ac", c, 1, 63, 2, 1) for c in range(3)]
        + [("ac", c, 1, 63, 1, 0) for c in range(3)]
        + [("dc", None, 0, 0, 1, 0)],
        # interleave refinement order across components
        [("dc", None, 0, 0, 0, 1)]
        + [("ac", 2, 1, 63, 0, 1), ("ac", 0, 1, 5, 0, 1),
           ("ac", 1, 1, 63, 0, 1), ("ac", 0, 6, 63, 0, 1),
           ("ac", 0, 1, 63, 1, 0), ("dc", None, 0, 0, 1, 0),
           ("ac", 2, 1, 63, 1, 0), ("ac", 1, 1, 63, 1, 0)],
    ]
    for si, script in enumerate(scripts):
        p = _jpeg_raster(
            encode_jpeg_progressive(24, 16, raw, quality=60, scans=script)
        )
        assert (base[3] == p[3]).all(), f"script {si}"


def test_progressive_randomized_sweep():
    """Randomized bit-identity sweep — sparse/flat images maximize EOB
    runs, noisy ones maximize refinement traffic."""
    from soda_spark_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.RandomState(99)
    for trial in range(12):
        w = int(rng.randint(8, 40))
        h = int(rng.randint(8, 40))
        ch = int(rng.choice([1, 3]))
        sub = "420" if ch == 3 and rng.rand() < 0.5 else "444"
        q = int(rng.randint(25, 98))
        if rng.rand() < 0.5:
            raw = rng.randint(0, 256, size=h * w * ch, dtype=np.uint8)
        else:  # sparse: flat + a few spikes (deep EOB runs)
            raw = np.full(h * w * ch, 130, dtype=np.uint8)
            idx = rng.randint(0, raw.size, size=max(1, raw.size // 50))
            raw[idx] = rng.randint(0, 256, size=idx.size)
        raw = raw.tobytes()
        b = _jpeg_raster(encode_jpeg_baseline(
            w, h, raw, channels=ch, quality=q, subsampling=sub))
        p = _jpeg_raster(encode_jpeg_progressive(
            w, h, raw, channels=ch, quality=q, subsampling=sub))
        assert (b[3] == p[3]).all(), (trial, w, h, ch, sub, q)


def test_progressive_scan_script_validation():
    from soda_spark_spark.operators.jpeg import encode_jpeg_progressive

    raw = _rand_image(1, 8, 8, 1)
    with pytest.raises(ValueError, match="first scan"):
        encode_jpeg_progressive(
            8, 8, raw, channels=1,
            scans=[("dc", None, 0, 0, 0, 0), ("dc", None, 0, 0, 0, 0),
                   ("ac", 0, 1, 63, 0, 0)],
        )
    with pytest.raises(ValueError, match="step"):
        encode_jpeg_progressive(
            8, 8, raw, channels=1,
            scans=[("dc", None, 0, 0, 0, 2), ("dc", None, 0, 0, 2, 0),
                   ("ac", 0, 1, 63, 0, 0)],
        )
    with pytest.raises(ValueError, match="band"):
        encode_jpeg_progressive(
            8, 8, raw, channels=1,
            scans=[("dc", None, 0, 0, 0, 0), ("ac", 0, 0, 63, 0, 0)],
        )


def test_progressive_decode_via_registry_and_dims():
    from soda_spark_spark.operators.jpeg import encode_jpeg_progressive
    from soda_spark_spark.operators.multimodal import (
        decode_image, image_dimensions_payload, image_hash_payload,
    )

    raw = _rand_image(13, 16, 16, 3)
    p = encode_jpeg_progressive(16, 16, raw, quality=85)
    st = decode_image(p)
    assert (st["width"], st["height"], st["format"]) == (16, 16, "jpeg")
    assert image_dimensions_payload(p) == {
        "format": "jpeg", "width": 16, "height": 16,
    }
    b = encode_jpeg_baseline(16, 16, raw, quality=85)
    assert image_hash_payload(p) == image_hash_payload(b)


def test_progressive_missing_dc_scan_rejected():
    """A progressive stream whose component never got a DC scan must
    error, not silently decode garbage."""
    from soda_spark_spark.operators.jpeg import encode_jpeg_progressive

    raw = _rand_image(1, 8, 8, 1)
    p = bytearray(
        encode_jpeg_progressive(
            8, 8, raw, channels=1,
            scans=[("dc", None, 0, 0, 0, 0), ("ac", 0, 1, 63, 0, 0)],
        )
    )
    # surgically drop the DC scan: splice from just before the first
    # SOS to the AC scan's own DHT (so its table survives the cut)
    first = p.find(b"\xff\xda")
    dht2 = p.find(b"\xff\xc4", first + 2)
    assert dht2 > first
    mangled = bytes(p[:first] + p[dht2:])
    with pytest.raises(ValueError, match="DC scan"):
        _jpeg_raster(mangled)


# ---------------------------------------------------------------------------
# external validity: real libjpeg-encoded files shipped with the OS
# ---------------------------------------------------------------------------


_REAL_JPEGS = [
    ("/usr/share/doc/nodejs/thin-white-stripe.jpg", 493, 58),
    ("/usr/share/doc/nodejs/full-white-stripe.jpg", 493, 312),
]


@pytest.mark.parametrize("path,w,h", _REAL_JPEGS)
def test_real_libjpeg_files_decode(path, w, h):
    """Files produced by a REAL encoder (not our own round trip):
    dimensions must match the header scan and the 'white stripe'
    content must decode near-white — external validity beyond the
    self-consistent encoder/decoder pair."""
    import os

    if not os.path.exists(path):
        pytest.skip(f"{path} not present")
    data = open(path, "rb").read()
    dw, dh, ch, sm = _jpeg_raster(data)
    assert (dw, dh, ch) == (w, h, 3)
    assert sm.astype(np.int64).mean() > 225  # a white-stripe image
    from soda_spark_spark.operators.multimodal import (
        image_dimensions_payload,
    )

    dims = image_dimensions_payload(data)
    assert (dims["width"], dims["height"]) == (w, h)
