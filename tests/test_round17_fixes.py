"""Round-17 fix regressions: the driver-found exif_census signed-zero
divergence, and the four round-16 ADVICE items (Rust-lifetime
apostrophes in the c-family comment lexer, multi-member gzip in the
wiki-dump decompressor, APP14 preservation in the JPEG metadata
scrub, wiki iterparse root trimming)."""

from __future__ import annotations

import gzip
import math

import pytest

from soda_spark_spark.operators.code_dedup import strip_code_comments
from soda_spark_spark.operators.exif import (
    exif_extract,
    strip_jpeg_metadata,
    write_exif_app1,
)
from soda_spark_spark.operators.jpeg import encode_jpeg_baseline
from soda_spark_spark.sources.wiki_dump import _decompress, _parse_pages


# ------------------------------------------------ exif signed zero


def _dress(app1: bytes) -> bytes:
    base = encode_jpeg_baseline(8, 8, bytes([90]) * (8 * 8 * 3))
    return base[:2] + app1 + base[2:]


def test_exif_negative_zero_longitude_decodes_positive():
    # Exif GPS = hemisphere ref + unsigned DMS: -0.0 is
    # unrepresentable, so the round-trip must yield +0.0 (the
    # driver's value-hash stringifies cells, so '-0.0' vs '0.0' is a
    # certification failure — CORRECTNESS_r16 exif_census).
    for order in ("II", "MM"):
        m = exif_extract(_dress(write_exif_app1(
            gps=(0.0, -0.0), byte_order=order
        )))
        assert m["gps_lon"] == 0.0
        assert math.copysign(1.0, m["gps_lon"]) == 1.0
        assert m["gps_lat"] == 0.0


def test_oracle_check_flags_signed_zero():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "oracle_check", "/root/repo/tools/oracle_check.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    ok, detail = mod.compare_values([(1, -0.0)], [(1, 0.0)])
    assert not ok and "signed-zero" in detail
    ok, _ = mod.compare_values([(1, 0.0)], [(1, 0.0)])
    assert ok


# ------------------------------------- c-family apostrophe handling


def test_rust_lifetime_does_not_open_phantom_string():
    src = "fn f<'a, 'b>(x: &'a str) -> &'b str { x } // note"
    out = strip_code_comments(src, "c")
    assert "note" not in out
    assert out.startswith("fn f<'a, 'b>(x: &'a str) -> &'b str { x }")


def test_lifetime_then_block_comment_still_strips():
    # the old lexer swallowed the /* */ inside the phantom string, so
    # two files differing only in that comment got different keys
    a = "let s: &'a str = x; /* only in a */ y();"
    b = "let s: &'a str = x;  y();"
    assert strip_code_comments(a, "c") == "let s: &'a str = x;   y();"
    assert "only in a" not in strip_code_comments(a, "c")
    assert strip_code_comments(b, "c") == b


@pytest.mark.parametrize("lit", [
    "'a'", "'\\n'", "'\\''", "'\\\\'", "'\\x41'", "'\\u0041'",
    "'\\u{1F600}'",
])
def test_char_literals_survive_verbatim(lit):
    src = f"c = {lit}; // drop"
    out = strip_code_comments(src, "c")
    assert lit in out and "drop" not in out


def test_comment_marker_inside_char_literal_stays():
    # '/' as a char literal must not fuse with a following '/' into a
    # line comment
    src = "a = '/'; b = '/'; // real"
    assert strip_code_comments(src, "c") == "a = '/'; b = '/'; "


# ------------------------------------------- gzip multistream chain


def test_gzip_multimember_chains_all_members():
    a = gzip.compress(b"<doc>first</doc>", mtime=0)
    b = gzip.compress(b"<doc>second</doc>", mtime=0)
    got = _decompress(a + b, "f.gz", 1 << 20)
    assert got == b"<doc>first</doc><doc>second</doc>"


def test_gzip_truncated_member_raises():
    a = gzip.compress(b"x" * 1000, mtime=0)
    with pytest.raises(ValueError, match="truncated gzip"):
        _decompress(a[: len(a) // 2], "f.gz", 1 << 20)


def test_gzip_multimember_bomb_guard_is_cumulative():
    member = gzip.compress(b"y" * 600, mtime=0)
    with pytest.raises(ValueError, match="exceeds"):
        _decompress(member + member, "f.gz", 1000)


def test_gzip_single_member_unchanged():
    payload = b"plain single member"
    assert _decompress(gzip.compress(payload, mtime=0), "f.gz", 1 << 20) \
        == payload


# ------------------------------------------------ APP14 preservation


def test_strip_jpeg_metadata_keeps_app14_drops_app1():
    base = encode_jpeg_baseline(8, 8, bytes([90]) * (8 * 8 * 3))
    app1 = write_exif_app1(make="Cam", byte_order="II")
    adobe = b"Adobe\x00\x64\x00\x00\x00\x00\x00"  # APP14 body
    app14 = b"\xff\xee" + (len(adobe) + 2).to_bytes(2, "big") + adobe
    dressed = base[:2] + app1 + app14 + base[2:]
    stripped = strip_jpeg_metadata(dressed)
    assert app14 in stripped          # color transform survives
    assert b"Cam" not in stripped     # PII gone
    assert stripped == base[:2] + app14 + base[2:]


def test_strip_jpeg_metadata_scrub_law_unchanged_without_app14():
    base = encode_jpeg_baseline(8, 8, bytes([120]) * (8 * 8 * 3))
    app1 = write_exif_app1(gps=(1.5, -2.25), byte_order="MM")
    assert strip_jpeg_metadata(base[:2] + app1 + base[2:]) == base


# ------------------------------------------- wiki iterparse trimming


def test_parse_pages_yields_all_and_trims_root():
    body = "".join(
        f"<page><title>T{i}</title><ns>0</ns><id>{i}</id>"
        f"<revision><id>{i}</id><text>body {i}</text></revision>"
        f"</page>"
        for i in range(200)
    )
    data = f"<mediawiki>{body}</mediawiki>".encode()
    rows = list(_parse_pages(data, "f.xml"))
    assert len(rows) == 200
    assert rows[7]["title"] == "T7" and rows[7]["text"] == "body 7"
    assert rows[199]["page_id"] == 199
