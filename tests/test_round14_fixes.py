"""Round-14 regression tests: the three r13 ADVICE defects plus the
media_curation oracle-robustness fix (the one red driver row of r13).

1. quantile_sketch silently poisoned by NaN input (ADVICE medium):
   floor(NaN) bucketed the row while min/max propagated NaN into
   lo_v/hi_v, so quantile_query returned NaN and a gate calibrated off
   it kept ZERO rows. NaN is now excluded exactly like NULL.
2. WARC `_http_fields` only recognized CRLF-CRLF (ADVICE low): LF-only
   HTTP messages got NULL status (silently failing the http_status ==
   200 gate) and header bytes as body. Now the earliest CRLF-CRLF /
   LF-LF terminator wins and header lines split on either ending.
3. html_to_text unclosed `<head>` swallowed the document (ADVICE low):
   `<body>` (or any block-level content tag) now implies `</head>`,
   and a stray drop-element close tag closes through to its nearest
   matching open instead of decrementing a bare counter.
4. media_curation driver row (158 vs 137 rows in CORRECTNESS_r13): the
   oracle assumed every 4-id group contains its `%4 == 0` member (the
   PGM), but `image_dedup` keeps the minimum PRESENT id — on a
   documents table with gapped doc_ids the two disagreed. The oracle
   now replays min-of-present; this test runs the full Spark pipeline
   AND the DuckDB oracle on a deliberately gapped id set.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# 1. quantile_sketch NaN exclusion
# ---------------------------------------------------------------------------


def test_quantile_sketch_skips_nan(spark):
    from soda_spark_spark.operators.cardinality import (
        quantile_query, quantile_sketch,
    )

    df = spark.createDataFrame(
        [(1.0,), (2.0,), (float("nan"),), (None,), (3.0,), (float("nan"),)],
        "v double",
    )
    sk = quantile_sketch(df, "v", lo=0.0, hi=4.0, n_buckets=4).collect()
    assert sum(r.n for r in sk) == 3  # NaNs and NULL all excluded
    for r in sk:
        assert not math.isnan(r.lo_v) and not math.isnan(r.hi_v)
    est = {
        r.q: r.estimate
        for r in quantile_query(
            quantile_sketch(df, "v", lo=0.0, hi=4.0, n_buckets=4),
            [0.5, 1.0],
        ).collect()
    }
    assert est[0.5] == 2.0 and est[1.0] == 3.0  # finite, NaN-free


def test_quantile_sketch_all_nan_is_empty(spark):
    from soda_spark_spark.operators.cardinality import quantile_sketch

    df = spark.createDataFrame([(float("nan"),), (None,)], "v double")
    assert quantile_sketch(df, "v", lo=0.0, hi=1.0).count() == 0


def test_quantile_gate_calibrates_past_nan(spark, tmp_path):
    """The live-repro scenario from ADVICE: NaN rows in the calibration
    batch must not poison the cut (cut=NaN kept zero rows before)."""
    from soda_spark_spark.operators.cardinality import (
        quantile_query, quantile_sketch, quantile_sketch_compact,
        quantile_sketch_merge,
    )

    clean = spark.range(1, 101).select(F.col("id").cast("double").alias("v"))
    dirty = clean.unionByName(
        spark.createDataFrame([(float("nan"),)] * 7, "v double")
    )
    a = quantile_sketch(clean, "v", lo=0.0, hi=100.0, n_buckets=50)
    b = quantile_sketch(dirty, "v", lo=0.0, hi=100.0, n_buckets=50)
    merged = quantile_sketch_compact(quantile_sketch_merge(a, b))
    [row] = quantile_query(merged, [0.75]).collect()
    cut = row.hi_v
    assert not math.isnan(cut)
    kept = dirty.filter(F.col("v") <= cut).count()
    assert kept > 0  # the silent-total-data-loss mode


# ---------------------------------------------------------------------------
# 2. WARC LF-only HTTP messages
# ---------------------------------------------------------------------------


def test_http_fields_lf_only():
    from soda_spark_spark.sources.warc import _http_fields

    msg = (b"HTTP/1.1 200 OK\n"
           b"Content-Type: text/html; charset=utf-8\n"
           b"\n"
           b"<html>body bytes</html>")
    status, ct, body = _http_fields("application/http; msgtype=response", msg)
    assert status == 200
    assert ct == "text/html; charset=utf-8"
    assert body == b"<html>body bytes</html>"


def test_http_fields_crlf_unchanged():
    from soda_spark_spark.sources.warc import _http_fields

    msg = (b"HTTP/1.1 404 Not Found\r\n"
           b"Content-Type: text/plain\r\n"
           b"\r\n"
           b"gone")
    status, ct, body = _http_fields("application/http", msg)
    assert (status, ct, body) == (404, "text/plain", b"gone")


def test_http_fields_lf_head_crlf_in_body():
    """Earliest terminator wins: an LF-only head whose BODY contains
    CRLF-CRLF must still split at the header end."""
    from soda_spark_spark.sources.warc import _http_fields

    msg = (b"HTTP/1.1 200 OK\n"
           b"Content-Type: text/plain\n"
           b"\n"
           b"part1\r\n\r\npart2")
    status, ct, body = _http_fields("application/http", msg)
    assert (status, ct) == (200, "text/plain")
    assert body == b"part1\r\n\r\npart2"


def test_http_fields_mixed_line_endings():
    from soda_spark_spark.sources.warc import _http_fields

    # CRLF status line, LF header lines, LF-LF terminator first
    msg = (b"HTTP/1.1 301 Moved\r\n"
           b"Content-Type: text/html\n"
           b"Location: https://example.com/\n"
           b"\n"
           b"moved")
    status, ct, body = _http_fields("application/http", msg)
    assert (status, ct, body) == (301, "text/html", b"moved")


def test_http_fields_no_terminator_passthrough():
    from soda_spark_spark.sources.warc import _http_fields

    msg = b"HTTP/1.1 200 OK\r\nContent-Type: text/plain"
    assert _http_fields("application/http", msg) == (None, None, msg)


# ---------------------------------------------------------------------------
# 3. html_to_text implied </head> + end-tag recovery
# ---------------------------------------------------------------------------


def test_html_unclosed_head_body_recovers():
    from soda_spark_spark.operators.html_text import html_to_text

    html = ("<html><head><title>T</title><meta charset='utf-8'>"
            "<body><p>Hello crawl</p></body></html>")
    assert html_to_text(html) == "Hello crawl"


def test_html_unclosed_head_block_tag_recovers():
    from soda_spark_spark.operators.html_text import html_to_text

    # no <body> at all: the first block-level content tag implies </head>
    html = "<head><title>T</title><div>kept text</div>"
    assert html_to_text(html) == "kept text"


def test_html_closed_head_unchanged():
    from soda_spark_spark.operators.html_text import html_to_text

    html = ("<html><head><title>T</title><style>p{color:red}</style></head>"
            "<body><p>only this</p></body></html>")
    assert html_to_text(html) == "only this"


def test_html_unclosed_nav_inside_body_still_drops():
    """Only head gets the implied close — an unclosed nav keeps
    swallowing (documented behavior, matches an unterminated CDATA)."""
    from soda_spark_spark.operators.html_text import html_to_text

    html = "<body><p>seen</p><nav><a href='/'>chrome</a><p>menu</p>"
    assert html_to_text(html) == "seen"


def test_html_stray_close_recovery():
    from soda_spark_spark.operators.html_text import html_to_text

    # </nav> closes through the unclosed <svg> inside it (spec
    # end-tag recovery) -> 'after' is visible again
    html = "<body><nav><svg><circle/></nav><p>after</p>"
    assert html_to_text(html) == "after"
    # a stray close with no matching open is a no-op, never underflows
    assert html_to_text("</nav></head><p>x</p>") == "x"


def test_html_head_inside_nav_keeps_dropping():
    from soda_spark_spark.operators.html_text import html_to_text

    # implied </head> inside an unclosed nav: the nav still drops
    html = "<body><nav><head><p>menu</p><p>menu2</p>"
    assert html_to_text(html) == ""


# ---------------------------------------------------------------------------
# 4. media_curation oracle on gapped doc_ids
# ---------------------------------------------------------------------------


def test_media_curation_matches_oracle_on_gapped_ids(spark, tmp_path):
    import duckdb
    import pandas as pd

    import __spark_entry__ as E

    # ids with holes: 21 groups lose their %4==0 member (the r13 driver
    # signature), one group loses everything BUT its junk doc (id 279:
    # 279 % 40 == 39), one group is a singleton
    ids = [i for i in range(0, 500)
           if not (i % 4 == 0 and 100 <= i < 184)      # 21 missing PGMs
           and not (i % 4 != 3 and 276 <= i < 280)]    # junk-only group
    doc = pd.DataFrame({"doc_id": pd.array(ids, dtype="int64")})
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(doc).write.parquet(str(sf / "documents.parquet"))

    got = (
        E.q_media_curation(spark, str(sf))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", doc)
    want = (
        con.execute(E.oracle_sql()["media_curation"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert list(got["doc_id"]) == [int(x) for x in want["doc_id"]]
    assert list(got["status"]) == list(want["status"])
    gs = [None if v is None else int(v)
          for v in got["sum_value"].astype(object).where(
              got["sum_value"].notna(), None)]
    ws = [None if v is None else int(v)
          for v in want["sum_value"].astype(object).where(
              want["sum_value"].notna(), None)]
    assert gs == ws
    # the structural property that broke r13: survivors where the PGM
    # slot is absent are the minimum PRESENT id, not %4 == 0
    non_pgm = [i for i in got["doc_id"] if i % 4 != 0 and i % 40 != 39]
    assert non_pgm, "fixture must exercise gapped groups"
