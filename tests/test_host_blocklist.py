"""Host-scoped boilerplate stripping (`text.host_boilerplate_strip`) and
the C4-style whole-word content blocklist (`text.term_blocklist`)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from soda_spark_spark.operators.text import host_boilerplate_strip, term_blocklist
from soda_spark_spark.pipeline import curate


def _hosted_docs(spark):
    rows = [
        # site-a: NAV line on all 3 docs, footer on 2 of 3
        (1, "NAV MENU\nbody one\nFooter Inc", "https://www.Site-A.com/1"),
        (2, "NAV MENU\nbody two\nFooter Inc", "http://site-a.com/2"),
        (3, "NAV MENU\nbody three", "https://site-a.com./3"),
        # site-b: the SAME NAV line, but in only 1 of 3 docs
        (4, "NAV MENU\nbee one", "https://site-b.org/1"),
        (5, "bee two\nonly here", "https://site-b.org/2"),
        (6, "bee three", "https://site-b.org/3"),
        # no host: passes through byte-identical
        (7, "NAV MENU\nno host", None),
        # NULL / empty text with a host
        (8, None, "https://site-a.com/null"),
        (9, "", "https://site-a.com/empty"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, url string")


def _strip(spark, **kw):
    out = host_boilerplate_strip(
        _hosted_docs(spark), "doc_id", "text", url_col="url", **kw
    )
    return {r.doc_id: r.text for r in out.collect()}


def test_host_scoped_verdict(spark):
    # site-a has 5 docs (incl. the NULL/empty ones); NAV appears in 3/5
    # (600000 ppm) and the footer in 2/5 (400000 ppm)
    got = _strip(spark, min_doc_ppm=500_000)
    assert got[1] == "body one\nFooter Inc"
    assert got[2] == "body two\nFooter Inc"
    assert got[3] == "body three"
    # same NAV line survives on site-b (1/3 of its docs)
    assert got[4] == "NAV MENU\nbee one"
    assert got[5] == "bee two\nonly here"


def test_ppm_threshold_includes_footer(spark):
    got = _strip(spark, min_doc_ppm=400_000)
    assert got[1] == "body one"
    assert got[3] == "body three"


def test_no_host_and_null_rows(spark):
    got = _strip(spark)
    assert got[7] == "NAV MENU\nno host"  # byte-identical
    assert got[8] is None
    assert got[9] == ""


def test_min_doc_count_floor(spark):
    # with an impossible doc-count floor nothing is stripped
    got = _strip(spark, min_doc_count=10, min_doc_ppm=0)
    assert got[1] == "NAV MENU\nbody one\nFooter Inc"


def test_min_line_chars_protects_short_lines(spark):
    rows = [
        (1, "--\nunique a\n--", "https://h.com/1"),
        (2, "--\nunique b\n--", "https://h.com/2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, url string")
    out = host_boilerplate_strip(
        df, "doc_id", "text", url_col="url", min_line_chars=3
    )
    got = {r.doc_id: r.text for r in out.collect()}
    assert got[1] == "--\nunique a\n--"  # '--' below the floor: never stripped


def test_host_col_mode(spark):
    rows = [
        (1, "SAME\nx", "H.example"),
        (2, "SAME\ny", "h.example."),
        (3, "SAME\nz", None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, host string")
    out = host_boilerplate_strip(df, "doc_id", "text", host_col="host")
    got = {r.doc_id: r.text for r in out.collect()}
    assert got[1] == "x" and got[2] == "y"  # canonicalized hosts agree
    assert got[3] == "SAME\nz"  # NULL host: untouched


def test_text_url_mode(spark):
    rows = [
        (1, "see https://w.example/a\nPROMO\nalpha"),
        (2, "see https://w.example/b\nPROMO\nbeta"),
        (3, "no url\nPROMO\ngamma"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = host_boilerplate_strip(df, "doc_id", "text")
    got = {r.doc_id: r.text for r in out.collect()}
    assert "PROMO" not in got[1] and "PROMO" not in got[2]
    assert got[3] == "no url\nPROMO\ngamma"


def test_validation(spark):
    df = _hosted_docs(spark)
    with pytest.raises(ValueError, match="min_doc_count"):
        host_boilerplate_strip(df, "doc_id", "text", min_doc_count=0)
    with pytest.raises(ValueError, match="min_doc_ppm"):
        host_boilerplate_strip(df, "doc_id", "text", min_doc_ppm=2_000_000)


def test_curate_step(spark):
    # dropping the NULL-text doc leaves site-a with 4 docs, so the
    # footer (2/4 = 500000 ppm) now meets the threshold too
    df = _hosted_docs(spark).filter(F.col("text").isNotNull())
    out, _ = curate(
        df,
        [{"kind": "host_boilerplate_strip", "url_col": "url",
          "min_doc_ppm": 500_000}],
        id_col="doc_id",
    )
    got = {r.doc_id: r.text for r in out.collect()}
    assert got[1] == "body one"
    assert got[4] == "NAV MENU\nbee one"


# ---------------------------------------------------------------------------
# term_blocklist
# ---------------------------------------------------------------------------


def _bl_docs(spark):
    rows = [
        (1, "a perfectly clean document"),
        (2, "contains SPAM right here"),
        (3, "spammy is not the word spam-like either"),  # tokens: spam, like
        (4, "buy now while stocks last"),
        (5, "buy it now"),  # 'buy now' NOT consecutive
        (6, "password reset"),  # 'word' must not match inside 'password'
        (7, None),
        (8, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _terms(spark):
    return spark.createDataFrame(
        [("spam",), ("Buy-Now",), ("word",)], "term string"
    )


def test_whole_word_drop(spark):
    kept = term_blocklist(_bl_docs(spark), _terms(spark), "doc_id")
    ids = sorted(r.doc_id for r in kept.collect())
    # 2: SPAM (case-insensitive); 3: 'spam-like' tokenizes to 'spam';
    # 4: 'buy now' consecutive via 'Buy-Now'; 6 SURVIVES: 'word' is not
    # a whole token of 'password reset'
    assert ids == [1, 5, 6, 7, 8]


def test_flag_mode_parity(spark):
    flagged = term_blocklist(
        _bl_docs(spark), _terms(spark), "doc_id", mode="flag"
    )
    got = {r.doc_id: r.blocked for r in flagged.collect()}
    assert got == {1: False, 2: True, 3: True, 4: True,
                   5: False, 6: False, 7: False, 8: False}


def test_substring_never_matches(spark):
    terms = spark.createDataFrame([("pass",)], "term string")
    kept = term_blocklist(_bl_docs(spark), terms, "doc_id")
    assert sorted(r.doc_id for r in kept.collect()) == [1, 2, 3, 4, 5, 6, 7, 8]


def test_term_col_inference(spark):
    docs = _bl_docs(spark)
    one_col = spark.createDataFrame([("spam",)], "anything string")
    assert term_blocklist(docs, one_col, "doc_id").count() == 6  # drops 2,3
    two_col = spark.createDataFrame([("spam", 1)], "a string, b int")
    with pytest.raises(ValueError, match="term_col"):
        term_blocklist(docs, two_col, "doc_id")
    with pytest.raises(ValueError, match="mode"):
        term_blocklist(docs, one_col, "doc_id", mode="bogus")


def test_empty_and_punct_only_terms_ignored(spark):
    terms = spark.createDataFrame([("!!!",), ("",), ("spam",)], "term string")
    kept = term_blocklist(_bl_docs(spark), terms, "doc_id")
    assert sorted(r.doc_id for r in kept.collect()) == [1, 4, 5, 6, 7, 8]


def test_curate_term_blocklist_step(spark):
    out, _ = curate(
        _bl_docs(spark),
        [{"kind": "term_blocklist", "terms": _terms(spark)}],
        id_col="doc_id",
    )
    assert sorted(r.doc_id for r in out.collect()) == [1, 5, 6, 7, 8]


def test_blocklist_gate_stream_matches_batch(spark, tmp_path):
    from soda_spark_spark.streaming.scan_stream import (
        blocklist_gate_batch_writer,
    )

    docs = _bl_docs(spark).filter(F.col("text").isNotNull())
    src = str(tmp_path / "src")
    # two files -> two micro-batches under maxFilesPerTrigger=1: the
    # per-document verdict must not care about batch boundaries
    docs.filter("doc_id <= 3").write.parquet(src)
    docs.filter("doc_id > 3").write.mode("append").parquet(src)
    out = str(tmp_path / "sink")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            blocklist_gate_batch_writer(_terms(spark), "doc_id", "text", out)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    want = sorted(
        r.doc_id
        for r in term_blocklist(docs, _terms(spark), "doc_id").collect()
    )
    assert got == want == [1, 5, 6, 8]
