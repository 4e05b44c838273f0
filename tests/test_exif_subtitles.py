"""Exif census + metadata strip (`operators/exif.py`) and SRT/WebVTT
caption extraction (`operators/subtitles.py`): parser contracts, the
byte-exact scrub law, sloppy-input tolerance, quarantine channels."""

from __future__ import annotations

import pytest

from soda_spark_spark.operators.exif import (
    exif_extract,
    image_exif,
    image_strip_metadata,
    strip_jpeg_metadata,
    write_exif_app1,
)
from soda_spark_spark.operators.jpeg import encode_jpeg_baseline
from soda_spark_spark.operators.subtitles import (
    parse_subtitles,
    subtitle_cues,
)


def _jpg() -> bytes:
    return encode_jpeg_baseline(8, 8, bytes([90]) * (8 * 8 * 3))


def _with_exif(**kw) -> bytes:
    base = _jpg()
    return base[:2] + write_exif_app1(**kw) + base[2:]


@pytest.mark.parametrize("order", ["II", "MM"])
def test_exif_extract_both_byte_orders(order):
    m = exif_extract(_with_exif(
        make="Cam", model="X100", orientation=6,
        datetime_original="2020:01:02 03:04:05",
        gps=(12.5, -45.25), byte_order=order,
    ))
    assert m["make"] == "Cam" and m["model"] == "X100"
    assert m["orientation"] == 6
    assert m["datetime"] == "2020:01:02 03:04:05"
    assert m["has_gps"]
    assert abs(m["gps_lat"] - 12.5) < 1e-9
    assert abs(m["gps_lon"] + 45.25) < 1e-9


def test_exif_absent_and_non_jpeg():
    m = exif_extract(_jpg())
    assert m == dict(make=None, model=None, software=None,
                     datetime=None, orientation=None, has_gps=False,
                     gps_lat=None, gps_lon=None)
    with pytest.raises(ValueError):
        exif_extract(b"\x89PNG not a jpeg")


def test_strip_is_byte_exact_and_decodable():
    base = _jpg()
    dressed = _with_exif(make="Cam", gps=(1.0, 2.0))
    # add a COM segment too
    com = b"\xff\xfe" + (11).to_bytes(2, "big") + b"comment__"
    dressed = dressed[:2] + com + dressed[2:]
    out = strip_jpeg_metadata(dressed)
    assert out == base  # the scrub law: exactly the undressed bytes
    assert strip_jpeg_metadata(base) == base  # idempotent / no-op
    from soda_spark_spark.operators.jpeg import _jpeg_raster

    w, h = _jpeg_raster(out)[:2]
    assert (w, h) == (8, 8)


def test_exif_spark_ops(spark):
    rows = [
        (1, bytearray(_with_exif(make="A", gps=(10.0, 20.0)))),
        (2, bytearray(_jpg())),
        (3, bytearray(b"not an image")),
    ]
    df = spark.createDataFrame(rows, "doc long, payload binary")
    got = {r.id: r for r in image_exif(df, "doc", "payload").collect()}
    assert got[1].make == "A" and got[1].has_gps
    assert got[2].has_gps is False and got[2].error is None
    assert got[3].error is not None
    s = {r.id: r
         for r in image_strip_metadata(df, "doc", "payload").collect()}
    assert s[1].bytes_saved > 0 and bytes(s[1].payload) == _jpg()
    assert s[2].bytes_saved == 0
    assert s[3].payload is None and s[3].error is not None


SRT = (
    "1\n"
    "00:00:01,000 --> 00:00:02,500\n"
    "Hello <i>world</i>\n"
    "\n"
    "2\n"
    "00:00:03,000 --> 00:00:04,000\n"
    "Two lines\nof text &amp; more\n"
    "\n"
    "not a cue at all\n"
)

VTT = (
    "WEBVTT - demo\n"
    "\n"
    "NOTE this block is ignored\n"
    "\n"
    "intro-cue\n"
    "00:01.000 --> 00:02.000 position:50%\n"
    "Short <00:00:01.500>timed <c.yellow>words</c>\n"
    "\n"
    "01:00:00.000 --> 01:00:05.000\n"
    "Hour cue\n"
)


def test_srt_parse():
    cues, bad = parse_subtitles(SRT.encode())
    assert bad == 1
    assert cues[0] == dict(cue_index=0, start_ms=1000, end_ms=2500,
                           text="Hello world")
    assert cues[1]["text"] == "Two lines\nof text & more"
    assert cues[1]["start_ms"] == 3000


def test_vtt_parse_settings_ids_notes_hourless():
    cues, bad = parse_subtitles(VTT.encode())
    assert bad == 0
    # VTT hourless form is MM:SS.mmm — 00:01.000 is ONE SECOND
    assert cues[0]["start_ms"] == 1000 and cues[0]["end_ms"] == 2000
    assert cues[0]["text"] == "Short timed words"
    assert cues[1]["start_ms"] == 3_600_000
    assert cues[1]["end_ms"] == 3_605_000


def test_subtitles_bom_crlf_and_bad_bytes():
    bom = b"\xef\xbb\xbf" + SRT.replace("\n", "\r\n").encode()
    cues, bad = parse_subtitles(bom)
    assert len(cues) == 2 and bad == 1
    with pytest.raises(ValueError):
        parse_subtitles(b"\xff\xfe\x00 broken")


def test_subtitle_cues_spark(spark):
    rows = [
        (1, bytearray(SRT.encode())),
        (2, bytearray(b"no cues here at all")),
        (3, bytearray(b"\xff\xfe\x00")),
    ]
    df = spark.createDataFrame(rows, "doc long, payload binary")
    got = sorted(
        ((r.id, r.cue_index, r.start_ms, r.n_bad_cues,
          r.error is not None)
         for r in subtitle_cues(df, "doc", "payload").collect()),
        key=lambda x: (x[0], x[1] if x[1] is not None else -1),
    )
    assert got[0][:3] == (1, 0, 1000)
    assert got[1][:3] == (1, 1, 3000)
    # file 2: zero cues still visible with its bad-cue count
    assert got[2][0] == 2 and got[2][1] is None and got[2][3] == 1
    assert got[3][0] == 3 and got[3][4] is True
