"""Hypothesis property pins for the round-13 kernels: GIF LZW, PNG
depth/interlace round-trips, HTML whitespace contract, quantile-sketch
rank bars. Pure-Python properties — no Spark session, so the search
budget is cheap."""
from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from soda_spark_spark.operators.multimodal import (
    _gif_lzw_decode,
    _gif_lzw_encode,
    _gif_raster,
    _png_raster,
    encode_gif,
    encode_png,
)
from soda_spark_spark.operators.html_text import html_to_text

GRAY256 = bytes(b for i in range(256) for b in (i, i, i))


@settings(max_examples=40, deadline=None)
@given(
    min_code=st.integers(2, 8),
    data=st.binary(min_size=0, max_size=400),
)
def test_lzw_round_trip_property(min_code, data):
    data = bytes(b % (1 << min_code) for b in data)
    assert bytes(_gif_lzw_decode(_gif_lzw_encode(data, min_code),
                                 min_code)) == data


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 17),
    h=st.integers(1, 17),
    interlace=st.booleans(),
    data=st.data(),
)
def test_gif_round_trip_property(w, h, interlace, data):
    idx = bytes(data.draw(st.lists(
        st.integers(0, 255), min_size=w * h, max_size=w * h)))
    gif = encode_gif(w, h, idx, GRAY256, interlace=interlace)
    gw, gh, ch, samples = _gif_raster(gif)
    assert (gw, gh, ch) == (w, h, 3)
    assert bytes(samples.tobytes()) == bytes(
        b for i in idx for b in (i, i, i)
    )


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    ctype=st.sampled_from([0, 2, 4, 6]),
    depth=st.sampled_from([8, 16]),
    interlace=st.booleans(),
    filters=st.lists(st.integers(0, 4), min_size=1, max_size=5),
    data=st.data(),
)
def test_png_depth_round_trip_property(w, h, ctype, depth, interlace,
                                       filters, data):
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    n = w * h * ch * (2 if depth == 16 else 1)
    samples = bytes(data.draw(st.lists(
        st.integers(0, 255), min_size=n, max_size=n)))
    png = encode_png(w, h, samples, color_type=ctype, depth=depth,
                     filters=filters, interlace=interlace)
    pw, ph, pch, got = _png_raster(png)
    assert (pw, ph, pch) == (w, h, ch)
    want = samples if depth == 8 else samples[0::2]
    assert bytes(got.tobytes()) == want


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    depth=st.sampled_from([1, 2, 4]),
    interlace=st.booleans(),
    data=st.data(),
)
def test_png_packed_round_trip_property(w, h, depth, interlace, data):
    vals = bytes(data.draw(st.lists(
        st.integers(0, (1 << depth) - 1), min_size=w * h,
        max_size=w * h)))
    png = encode_png(w, h, vals, color_type=0, depth=depth,
                     interlace=interlace)
    _, _, _, got = _png_raster(png)
    scale = 255 // ((1 << depth) - 1)
    assert bytes(got.tobytes()) == bytes(v * scale for v in vals)


_SAFE = st.text(
    alphabet=st.sampled_from(
        list("abcXYZ09 .,!\t\n") + ["é", "中"]
    ),
    max_size=60,
)


@settings(max_examples=50, deadline=None)
@given(t=_SAFE)
def test_html_extract_whitespace_contract(t):
    """For markup-free text, extraction == the pinned per-line ASCII
    whitespace collapse (escaping round-trips, so this extends to any
    text via html-escaping)."""
    import re

    got = html_to_text(f"<body><p>{t}</p></body>")
    want = re.sub(r"[ \t\r\n\f\v]+", " ", t).strip(" ")
    assert got == want


@settings(max_examples=50, deadline=None)
@given(t=st.text(max_size=60))
def test_html_extract_escape_round_trip(t):
    """ANY text survives the escape -> extract loop modulo the pinned
    whitespace collapse (entity decoding is exact)."""
    import html as _html
    import re

    got = html_to_text(f"<p>{_html.escape(t)}</p>")
    want = re.sub(r"[ \t\r\n\f\v]+", " ", t).strip(" ")
    assert got == want


@settings(max_examples=20, deadline=None)
@given(
    members=st.lists(
        st.tuples(
            st.text(
                alphabet=st.sampled_from(list(
                    "abcdefgh0123456789_-")),
                min_size=1, max_size=12,
            ),
            st.binary(max_size=200),
        ),
        min_size=0, max_size=12,
        unique_by=lambda t: t[0],
    ),
)
def test_tar_shard_round_trip_property(tmp_path_factory, members):
    """Arbitrary member names/payloads survive the tar write twin ->
    parse loop byte-exactly, and the writer is deterministic."""
    from soda_spark_spark.sources.tar_shards import write_tar_shard

    import io
    import tarfile

    d = tmp_path_factory.mktemp("tarprop")
    rows = [dict(member=f"{k}.bin", payload=v) for k, v in members]
    p = str(d / "s.tar")
    write_tar_shard(rows, p)
    write_tar_shard(rows, str(d / "s2.tar"))
    assert open(p, "rb").read() == open(str(d / "s2.tar"), "rb").read()
    with tarfile.open(p) as tf:
        got = {m.name: tf.extractfile(m).read() for m in tf
               if m.isreg()}
    assert got == {f"{k}.bin": v for k, v in members}


@settings(max_examples=30, deadline=None)
@given(data=st.binary(min_size=0, max_size=300))
def test_g711_round_trip_monotonicity(data):
    """G.711 expansion is sign-correct and bounded: every expanded
    sample sits in [-32768, 32767] and the mu-law/A-law LUTs are
    odd-symmetric around their zero codes."""
    from soda_spark_spark.operators.multimodal import (
        _alaw_to_linear, _ulaw_to_linear,
    )

    for b in data:
        u = _ulaw_to_linear(b)
        a = _alaw_to_linear(b)
        assert -32768 <= u <= 32767 and -32768 <= a <= 32767
        # flipping the sign bit negates the sample exactly
        assert _ulaw_to_linear(b ^ 0x80) == -u
        assert _alaw_to_linear(b ^ 0x80) == -a
