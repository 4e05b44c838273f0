"""Unit tests for multimodal binary-column plumbing."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from soda_spark_spark.operators.multimodal import (
    as_media_table,
    binary_stats,
    decode_image,
    extract_image_features,
    repartition_by_bytes,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [(i, bytes([i % 256]) * (100 + i)) for i in range(8)]
    return spark.createDataFrame(rows, "id long, payload binary")


def test_binary_stats(media):
    out = {r.id: r for r in binary_stats(media, "id", "payload").collect()}
    assert out[0].n_bytes == 100
    assert out[7].n_bytes == 107
    assert out[3].digest == hashlib.md5(bytes([3]) * 103).hexdigest()


def test_as_media_table_shape(media):
    t = as_media_table(media, "payload", "image", "png")
    assert "payload" in t.columns and "meta" in t.columns
    row = t.first()
    assert row.meta.media_type == "image" and row.meta.format == "png"


def test_unregistered_compressed_format_raises():
    # webp/avif stay documented registry boundaries; png is REAL as of
    # round 12 (tests/test_png.py), baseline jpeg as of round 15
    # (tests/test_jpeg.py) — a garbage payload now fails its signature
    # check instead of the registry miss
    with pytest.raises(NotImplementedError):
        decode_image(b"xx", "webp")
    with pytest.raises(ValueError, match="signature"):
        decode_image(b"xx", "png")
    with pytest.raises(ValueError, match="signature"):
        decode_image(b"xx", "jpeg")


def test_extract_features_fake_decoder(media):
    out = {r.id: r for r in extract_image_features(media, "id", "payload", fake_decoder=True).collect()}
    assert len(out) == 8
    for i, r in out.items():
        digest = hashlib.md5(bytes([i % 256]) * (100 + i)).digest()
        assert r.width == 1 + digest[0] % 64
        assert r.height == 1 + digest[1] % 64
        assert r.n_bytes == 100 + i
        assert r.feature == pytest.approx(r.width / r.height)


def test_extract_features_null_payload(spark):
    df = spark.createDataFrame([(1, None)], "id long, payload binary")
    r = extract_image_features(df, "id", "payload", fake_decoder=True).first()
    assert r.n_bytes == 0


def test_repartition_by_bytes(media):
    out = repartition_by_bytes(media, "payload", target_bytes_per_partition=300)
    # ~830 payload bytes total / 300 -> 3+ partitions
    assert out.rdd.getNumPartitions() >= 3
    assert out.count() == 8


def test_sample_frames_fake_decoder(spark):
    from soda_spark_spark.operators.multimodal import sample_frames
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, b"video-bytes-a"), (2, b"video-bytes-b"), (3, None)],
        "doc_id long, payload binary",
    )
    out = sample_frames(df, "doc_id", "payload", n_frames=3, fake_decoder=True)
    rows = out.collect()
    assert len(rows) == 9  # 3 videos x 3 frames (None payload -> b"")
    per_vid = {r.id for r in rows}
    assert per_vid == {1, 2, 3}
    # deterministic: same payload -> same frame digests across runs
    again = sample_frames(df, "doc_id", "payload", n_frames=3, fake_decoder=True)
    assert sorted((r.id, r.frame_idx, r.frame_digest) for r in rows) == sorted(
        (r.id, r.frame_idx, r.frame_digest) for r in again.collect()
    )
    # frames of different videos differ
    d1 = {r.frame_digest for r in rows if r.id == 1}
    d2 = {r.frame_digest for r in rows if r.id == 2}
    assert d1.isdisjoint(d2)


def test_sample_frames_real_decoder_is_honest_stub(spark):
    from soda_spark_spark.operators.multimodal import sample_frames

    df = spark.createDataFrame([(1, b"x")], "doc_id long, payload binary")
    out = sample_frames(df, "doc_id", "payload", n_frames=2)
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    with _pytest.raises(Exception):  # NotImplementedError inside the worker
        out.collect()


# ---------------------------------------------------------------------------
# real decoders (pure numpy/stdlib formats)
# ---------------------------------------------------------------------------


def _ppm(w, h, pix):
    assert len(pix) == w * h * 3
    return b"P6\n# a comment\n%d %d\n255\n" % (w, h) + bytes(pix)


def _bmp(w, h, rows_bgr):
    import struct

    bytes_pp = 3
    row = (w * bytes_pp + 3) // 4 * 4
    data = b""
    for r in rows_bgr:  # bottom-up storage order as given
        data += bytes(r) + b"\x00" * (row - len(r))
    off = 54
    header = (
        b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 0, 0, 0, 0)
    )
    return header + data


def test_decode_image_ppm_pgm_bmp():
    from soda_spark_spark.operators.multimodal import decode_image

    ppm = _ppm(2, 2, [10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120])
    m = decode_image(ppm)
    assert (m["format"], m["width"], m["height"]) == ("ppm", 2, 2)
    assert m["sum_value"] == sum(range(10, 121, 10))
    assert m["mean_value"] == m["sum_value"] / 12

    pgm = b"P5\n3 1\n255\n" + bytes([1, 2, 3])
    m = decode_image(pgm)
    assert (m["format"], m["width"], m["height"], m["sum_value"]) == ("pgm", 3, 1, 6)

    # 2x2 24-bit BMP: rows pad 6 -> 8 bytes; padding must NOT count
    bmp = _bmp(2, 2, [[1, 2, 3, 4, 5, 6], [7, 8, 9, 10, 11, 12]])
    m = decode_image(bmp)
    assert (m["format"], m["width"], m["height"]) == ("bmp", 2, 2)
    assert m["sum_value"] == sum(range(1, 13))

    # png decodes for real now; a signature with garbage chunks is a
    # malformed file (ValueError -> quarantine), not a missing codec
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG\r\n\x1a\n....")


def test_decode_image_stats_operator_and_quarantine(spark):
    from soda_spark_spark.operators.multimodal import decode_image_stats

    rows = [
        (1, _ppm(2, 1, [0, 0, 0, 30, 60, 90])),
        (2, b"\x89PNG\r\n\x1a\n broken"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.id: r for r in decode_image_stats(df, "doc_id", "payload").collect()}
    assert got[1].format == "ppm" and got[1].sum_value == 180
    assert got[1].mean_value == 30.0 and got[1].error is None
    assert got[2].format == "png" and got[2].sum_value is None
    assert got[2].error is not None
    assert got[3].error is not None
    # fail-fast mode raises through the job
    import py4j.protocol

    with pytest.raises(Exception):
        decode_image_stats(df, "doc_id", "payload", on_error="raise").collect()


def _wav(samples, rate=8000, channels=1):
    import struct

    data = b"".join(struct.pack("<h", s) for s in samples)
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate,
                                rate * channels * 2, channels * 2, 16)
        + b"data" + struct.pack("<I", len(data))
    )
    return hdr + data


def test_decode_audio_wav_pcm():
    from soda_spark_spark.operators.multimodal import decode_audio

    m = decode_audio(_wav([100, -200, 300, -400], rate=4000))
    assert (m["format"], m["channels"], m["sample_rate"], m["bits"]) == (
        "wav", 1, 4000, 16)
    assert m["n_samples"] == 4 and m["sum_value"] == -200
    assert m["duration_ms"] == 4 / 4000 * 1000
    assert m["mean_value"] == -50.0
    # stereo frames halve the duration
    st = decode_audio(_wav([1, 2, 3, 4], rate=4000, channels=2))
    assert st["duration_ms"] == 2 / 4000 * 1000
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x04mp3-ish payload")


def test_decode_audio_stats_operator(spark):
    from soda_spark_spark.operators.multimodal import decode_audio_stats

    rows = [(1, _wav([10, 20, 30])), (2, b"not audio"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.id: r for r in decode_audio_stats(df, "doc_id", "payload").collect()}
    assert got[1].sum_value == 60 and got[1].error is None
    assert got[2].sum_value is None and got[2].error is not None
    assert got[3].error is not None


def _y4m(w, h, frames, fps=(25, 1), cs=b"C444"):
    hdr = b"YUV4MPEG2 W%d H%d F%d:%d %s\n" % (w, h, fps[0], fps[1], cs)
    body = b""
    for f in frames:
        body += b"FRAME\n" + bytes(f)
    return hdr + body


def test_decode_video_y4m():
    from soda_spark_spark.operators.multimodal import decode_video

    # 2x1 C444 -> 6 bytes per frame
    m = decode_video(_y4m(2, 1, [[1, 2, 3, 4, 5, 6], [10, 20, 30, 40, 50, 60]]))
    assert (m["format"], m["width"], m["height"], m["n_frames"]) == ("y4m", 2, 1, 2)
    assert m["sum_value"] == 21 + 210
    assert m["fps"] == 25.0 and m["duration_ms"] == 2 * 1000.0 / 25
    assert m["mean_value"] == (21 + 210) / 12
    # 2x2 420 -> 4 + 2*1 = 6 bytes per frame
    m2 = decode_video(
        b"YUV4MPEG2 W2 H2 F30:1 C420jpeg\nFRAME\n" + bytes(range(6))
    )
    assert m2["n_frames"] == 1 and m2["sum_value"] == 15
    with pytest.raises(NotImplementedError):
        decode_video(b"\x00\x00\x00 ftypmp42 not a y4m")


def test_decode_video_stats_operator(spark):
    from soda_spark_spark.operators.multimodal import decode_video_stats

    rows = [(1, _y4m(2, 1, [[1, 2, 3, 4, 5, 6]])), (2, b"mp4-ish"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.id: r for r in decode_video_stats(df, "doc_id", "payload").collect()}
    assert got[1].sum_value == 21 and got[1].error is None
    assert got[2].error is not None and got[3].error is not None
