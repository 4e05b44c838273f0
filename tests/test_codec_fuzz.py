"""Deterministic mutation fuzzing over the round-15 binary parsers:
JPEG (baseline + progressive), PDF text, and the header probes. The
contract under fuzz: a corrupted payload either decodes (possibly to
different pixels/text) or raises — it must never hang, never return a
mis-shaped raster, and the Spark operators' quarantine channel must
absorb every failure (no task-killing exception classes).

Mutations are seeded (no Date/random instability): byte flips,
truncations, and splices at positions spread across each payload.
"""

from __future__ import annotations

import numpy as np
import pytest

from soda_spark_spark.operators.jpeg import (
    _jpeg_raster,
    encode_jpeg_baseline,
    encode_jpeg_progressive,
)
from soda_spark_spark.operators.multimodal import (
    audio_probe_payload,
    image_dimensions_payload,
    video_probe_payload,
)
from soda_spark_spark.operators.pdf_text import pdf_to_text, write_simple_pdf


def _mutations(payload: bytes, n: int, seed: int):
    rng = np.random.RandomState(seed)
    out = []
    ln = len(payload)
    for _ in range(n):
        kind = rng.randint(3)
        b = bytearray(payload)
        if kind == 0:  # flip 1-4 bytes
            for _k in range(rng.randint(1, 5)):
                b[rng.randint(ln)] = rng.randint(256)
        elif kind == 1:  # truncate
            b = b[: rng.randint(1, ln)]
        else:  # splice a random run
            at = rng.randint(ln)
            b[at:at] = bytes(rng.randint(0, 256, rng.randint(1, 9),
                                         dtype=np.uint8))
        out.append(bytes(b))
    return out


def _fuzz(decode, payload: bytes, n: int, seed: int, check=None):
    ok = err = 0
    for mut in _mutations(payload, n, seed):
        try:
            r = decode(mut)
            if check is not None:
                check(r)
            ok += 1
        except Exception:  # noqa: BLE001 — the quarantine contract:
            err += 1       # ANY exception is absorbed by the operators
    # sanity: the harness exercised both outcomes across the corpus
    return ok, err


def test_fuzz_jpeg_baseline_and_progressive():
    img = np.random.RandomState(5).randint(
        0, 256, size=21 * 19 * 3, dtype=np.uint8
    ).tobytes()

    def check(r):
        w, h, ch, sm = r
        assert sm.dtype == np.uint8
        assert sm.shape == (h, w * ch)

    base = encode_jpeg_baseline(21, 19, img, quality=80, subsampling="420")
    prog = encode_jpeg_progressive(21, 19, img, quality=80,
                                   subsampling="420")
    ok_b, err_b = _fuzz(_jpeg_raster, base, 120, seed=1, check=check)
    ok_p, err_p = _fuzz(_jpeg_raster, prog, 120, seed=2, check=check)
    # corrupted streams commonly still decode (flips inside entropy
    # data change pixels, not structure) — both outcomes must occur
    assert ok_b + err_b == 120 and err_b > 0
    assert ok_p + err_p == 120 and err_p > 0


def test_fuzz_pdf_text():
    pdf = write_simple_pdf(
        ["Fuzz target one\nwith (escapes) and \\ slashes",
         "page two body text"]
    )

    def check(t):
        assert isinstance(t, str)

    ok, err = _fuzz(pdf_to_text, pdf, 150, seed=3, check=check)
    assert ok + err == 150 and err > 0 and ok > 0


def test_fuzz_header_probes():
    import struct

    jpg = encode_jpeg_baseline(9, 7, bytes(9 * 7 * 3), quality=70)
    size = 1600
    wav = (
        b"RIFF" + struct.pack("<I", 36 + size) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 8000, 32000, 4, 16)
        + b"data" + struct.pack("<I", size) + b"\0" * size
    )
    y4m = b"YUV4MPEG2 W320 H240 F25:1 Ip A1:1\nFRAME\n" + b"\0" * 64
    for decode, payload, seed in (
        (image_dimensions_payload, jpg, 4),
        (audio_probe_payload, wav, 5),
        (video_probe_payload, y4m, 6),
    ):
        ok, err = _fuzz(decode, payload, 100, seed=seed)
        assert ok + err == 100


def test_fuzz_through_spark_quarantine(spark):
    """End-to-end: a batch of mutated payloads through the operators —
    every row lands as either a decoded row or an error row, the job
    itself never fails."""
    from soda_spark_spark.operators.multimodal import image_dimensions
    from soda_spark_spark.operators.pdf_text import pdf_text

    jpg = encode_jpeg_baseline(9, 7, bytes(9 * 7 * 3), quality=70)
    pdf = write_simple_pdf(["quarantine fuzz"])
    rows = [(i, bytearray(m)) for i, m in enumerate(_mutations(jpg, 40, 7))]
    df = spark.createDataFrame(rows, "id long, payload binary")
    got = image_dimensions(df, "id", "payload").collect()
    assert len(got) == 40
    assert all((r.width is not None) or (r.error is not None) for r in got)
    rows = [(i, bytearray(m)) for i, m in enumerate(_mutations(pdf, 40, 8))]
    df = spark.createDataFrame(rows, "id long, payload binary")
    got = pdf_text(df, "id", "payload").collect()
    assert len(got) == 40
    assert all((r.text is not None) or (r.error is not None) for r in got)
