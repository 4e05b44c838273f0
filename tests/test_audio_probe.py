"""Header-only audio probing (`multimodal.audio_probe`): WAV/FLAC/
MP3/OGG metadata from header bytes, exact-vs-estimated duration
flags, and the operator's quarantine channel."""

from __future__ import annotations

import struct

import pytest

from soda_spark_spark.operators.multimodal import (
    audio_probe,
    audio_probe_payload,
)


def _wav(rate=8000, channels=2, bits=16, frames=4000):
    bpf = channels * bits // 8
    size = frames * bpf
    return (
        b"RIFF" + struct.pack("<I", 36 + size) + b"WAVE"
        + b"fmt " + struct.pack(
            "<IHHIIHH", 16, 1, channels, rate, rate * bpf, bpf, bits
        )
        + b"data" + struct.pack("<I", size) + b"\0" * size
    )


def _flac(rate=44100, channels=2, total=441000):
    si = bytearray(34)
    si[10] = rate >> 12
    si[11] = (rate >> 4) & 0xFF
    si[12] = ((rate & 0xF) << 4) | ((channels - 1) << 1) | ((16 - 1) >> 4)
    si[13] = (((16 - 1) & 0xF) << 4) | ((total >> 32) & 0xF)
    si[14:18] = struct.pack(">I", total & 0xFFFFFFFF)
    return b"fLaC" + bytes([0x80]) + b"\x00\x00\x22" + bytes(si)


def _mp3_frame():
    # MPEG1 Layer III, 128 kbps, 44100 Hz, stereo -> 417-byte frames
    return bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\0" * 413


def test_wav_probe_exact():
    assert audio_probe_payload(_wav()) == {
        "format": "wav", "sample_rate": 8000, "channels": 2,
        "duration_ms": 500, "bitrate_kbps": 256, "duration_exact": True,
    }


def test_flac_probe_exact():
    got = audio_probe_payload(_flac(rate=16000, channels=1, total=48000))
    assert got["sample_rate"] == 16000
    assert got["channels"] == 1
    assert got["duration_ms"] == 3000 and got["duration_exact"]


def test_mp3_cbr_estimate_and_xing_exact():
    cbr = audio_probe_payload(_mp3_frame() * 4)
    assert (cbr["sample_rate"], cbr["bitrate_kbps"]) == (44100, 128)
    assert cbr["duration_ms"] == 4 * 417 * 8 // 128
    assert not cbr["duration_exact"]
    x = bytearray(_mp3_frame())
    xa = 4 + 32  # MPEG1 stereo side info
    x[xa:xa + 4] = b"Xing"
    x[xa + 4:xa + 8] = struct.pack(">I", 1)
    x[xa + 8:xa + 12] = struct.pack(">I", 100)
    xg = audio_probe_payload(bytes(x) + _mp3_frame() * 3)
    assert xg["duration_ms"] == 100 * 1152 * 1000 // 44100
    assert xg["duration_exact"]


def test_mp3_id3v2_skipped():
    tag = b"ID3" + bytes([4, 0, 0]) + bytes([0, 0, 0, 20]) + b"\0" * 20
    got = audio_probe_payload(tag + _mp3_frame() * 2)
    assert got["format"] == "mp3" and got["sample_rate"] == 44100


def _ogg_pages(idhdr, granule, clock_rate):
    page1 = (
        b"OggS" + bytes([0, 2]) + struct.pack("<q", 0) + b"\0" * 12
        + bytes([1, len(idhdr)]) + idhdr
    )
    page2 = (
        b"OggS" + bytes([0, 4]) + struct.pack("<q", granule)
        + b"\0" * 12 + bytes([1, 0])
    )
    return page1 + page2


def test_ogg_vorbis_and_opus():
    vor = (
        b"\x01vorbis" + bytes(4) + bytes([2])
        + struct.pack("<I", 44100) + b"\0" * 9
    )
    got = audio_probe_payload(_ogg_pages(vor, 220500, 44100))
    assert got["format"] == "ogg-vorbis"
    assert got["duration_ms"] == 5000 and got["duration_exact"]
    op = (
        b"OpusHead" + bytes([1, 2]) + struct.pack("<H", 312)
        + struct.pack("<I", 48000) + b"\0\0\0"
    )
    got = audio_probe_payload(_ogg_pages(op, 144000, 48000))
    assert got["format"] == "ogg-opus"
    assert got["sample_rate"] == 48000 and got["duration_ms"] == 3000


def test_probe_error_paths():
    with pytest.raises(NotImplementedError):
        audio_probe_payload(b"not audio at all")
    with pytest.raises(ValueError):
        audio_probe_payload(b"RIFF\0\0\0\0WAVE")  # no fmt/data
    with pytest.raises(ValueError):
        audio_probe_payload(b"ID3" + bytes([4, 0, 0, 0, 0, 0, 0]))


def test_audio_probe_operator_quarantines(spark):
    rows = [
        (1, bytearray(_wav())),
        (2, bytearray(_flac())),
        (3, bytearray(_mp3_frame() * 2)),
        (4, bytearray(b"JUNK")),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    out = {r.id: r for r in audio_probe(df, "id", "payload").collect()}
    assert out[1].duration_ms == 500 and out[1].error is None
    assert out[2].format == "flac" and out[2].sample_rate == 44100
    assert out[3].bitrate_kbps == 128
    assert out[4].error is not None and out[4].sample_rate is None
    assert out[5].error is not None


# ---------------------------------------------------------------------------
# video probe (the third census leg)
# ---------------------------------------------------------------------------


def _box(t, body):
    return struct.pack(">I", 8 + len(body)) + t + body


def _mp4(timescale=1000, duration=5500, w=320, h=240, v1=False):
    if v1:
        mvhd = _box(
            b"mvhd", bytes([1, 0, 0, 0]) + b"\0" * 16
            + struct.pack(">IQ", timescale, duration) + b"\0" * 80
        )
    else:
        mvhd = _box(
            b"mvhd", bytes(4) + b"\0" * 8
            + struct.pack(">II", timescale, duration) + b"\0" * 80
        )
    tkhd = _box(
        b"tkhd", bytes(4) + b"\0" * 72
        + struct.pack(">II", w << 16, h << 16)
    )
    moov = _box(b"moov", mvhd + _box(b"trak", tkhd))
    return _box(b"ftyp", b"isom\0\0\0\0isom") + moov


def test_video_probe_y4m_and_mp4():
    from soda_spark_spark.operators.multimodal import video_probe_payload

    y = video_probe_payload(
        b"YUV4MPEG2 W320 H240 F30000:1001 Ip A1:1\nFRAME\n"
    )
    assert (y["width"], y["height"]) == (320, 240)
    assert abs(y["fps"] - 29.97002997) < 1e-6
    m = video_probe_payload(_mp4())
    assert m == {
        "format": "mp4", "width": 320, "height": 240,
        "duration_ms": 5500, "fps": None, "n_tracks": 1,
    }
    m1 = video_probe_payload(_mp4(timescale=600, duration=3600, v1=True))
    assert m1["duration_ms"] == 6000


def _ebml_elem(eid: bytes, body: bytes) -> bytes:
    return eid + struct.pack(">H", 0x4000 | len(body)) + body


def _webm(dur=12345.0, scale=1_000_000, w=640, h=360, unknown_size=False):
    ts = _ebml_elem(bytes.fromhex("2AD7B1"), scale.to_bytes(4, "big"))
    dr = _ebml_elem(bytes.fromhex("4489"), struct.pack(">d", dur))
    info = _ebml_elem(bytes.fromhex("1549A966"), ts + dr)
    video = _ebml_elem(
        b"\xE0",
        _ebml_elem(b"\xB0", w.to_bytes(2, "big"))
        + _ebml_elem(b"\xBA", h.to_bytes(2, "big")),
    )
    tracks = _ebml_elem(
        bytes.fromhex("1654AE6B"),
        _ebml_elem(b"\xAE", video)
        + _ebml_elem(b"\xAE", _ebml_elem(b"\xD7", b"\x02")),
    )
    if unknown_size:
        seg = bytes.fromhex("18538067") + b"\xFF" + info + tracks
    else:
        seg = _ebml_elem(bytes.fromhex("18538067"), info + tracks)
    hdr = _ebml_elem(
        bytes.fromhex("1A45DFA3"), _ebml_elem(b"\x42\x82", b"webm")
    )
    return hdr + seg


def test_video_probe_webm_ebml():
    from soda_spark_spark.operators.multimodal import video_probe_payload

    got = video_probe_payload(_webm())
    assert got == {
        "format": "webm", "width": 640, "height": 360,
        "duration_ms": 12345, "fps": None, "n_tracks": 2,
    }
    # streamed files: unknown-size Segment parses the same
    assert video_probe_payload(_webm(unknown_size=True)) == got
    # non-default TimecodeScale (0.5 ms ticks)
    half = video_probe_payload(_webm(dur=2000.0, scale=500_000))
    assert half["duration_ms"] == 1000


def test_video_probe_quarantines():
    from soda_spark_spark.operators.multimodal import video_probe_payload

    with pytest.raises(ValueError, match="Info/Tracks"):
        video_probe_payload(b"\x1aE\xdf\xa3webmish")
    with pytest.raises(NotImplementedError):
        video_probe_payload(b"random bytes")
    with pytest.raises(ValueError, match="moov"):
        video_probe_payload(_box(b"ftyp", b"isom\0\0\0\0isom"))


def test_video_probe_operator(spark):
    from soda_spark_spark.operators.multimodal import video_probe

    rows = [
        (1, bytearray(_mp4())),
        (2, bytearray(b"YUV4MPEG2 W64 H48 F25:1\nFRAME\n" + b"\0" * 10)),
        (3, bytearray(b"nonsense")),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    out = {r.id: r for r in video_probe(df, "id", "payload").collect()}
    assert out[1].duration_ms == 5500 and out[1].n_tracks == 1
    assert out[2].format == "y4m" and out[2].fps == 25.0
    assert out[3].error is not None
