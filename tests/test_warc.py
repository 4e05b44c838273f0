"""WARC reader: round-trip parse, gzip members, record-type filter,
and the malformed-file error channel."""

import pytest
from pyspark.sql import functions as F

from soda_spark_spark.sources.warc import (
    read_warc,
    write_warc_records,
)


def _records():
    return [
        dict(record_id=f"<urn:uuid:{i:04d}>", warc_type="response",
             target_uri=f"http://example.com/page/{i}",
             warc_date="2026-01-01T00:00:00Z",
             content_type="application/http; msgtype=response",
             payload=(f"HTTP/1.1 200 OK\r\n\r\nbody {i} "
                      + "x\r\n\r\ny" * i).encode())
        for i in range(5)
    ] + [
        dict(record_id="<urn:uuid:meta>", warc_type="warcinfo",
             target_uri=None, warc_date="2026-01-01T00:00:00Z",
             content_type="application/warc-fields",
             payload=b"software: test\r\n"),
    ]


@pytest.mark.parametrize("suffix", ["warc", "warc.gz"])
def test_warc_round_trip(spark, tmp_path, suffix):
    path = str(tmp_path / f"crawl-00000.{suffix}")
    recs = _records()
    write_warc_records(recs, path)
    rows = read_warc(spark, path).orderBy("record_id").collect()
    assert [r.parse_error for r in rows] == [None] * len(recs)
    by_id = {r.record_id: r for r in rows}
    for rec in recs:
        got = by_id[rec["record_id"]]
        assert got.warc_type == rec["warc_type"]
        assert got.target_uri == rec["target_uri"]
        assert got.content_length == len(rec["payload"])
        assert bytes(got.payload) == rec["payload"]  # binary-exact,
        # even with \r\n\r\n INSIDE the payload (length-delimited)


def test_warc_record_type_filter(spark, tmp_path):
    path = str(tmp_path / "crawl.warc")
    write_warc_records(_records(), path)
    out = read_warc(spark, path, record_types=["response"])
    assert out.count() == 5
    assert {r.warc_type for r in out.collect()} == {"response"}


def test_warc_malformed_error_channel(spark, tmp_path):
    good = str(tmp_path / "good.warc")
    write_warc_records(_records()[:2], good)
    bad = str(tmp_path / "bad.warc")
    with open(bad, "wb") as f:
        f.write(b"WARC/1.0\r\nWARC-Type: response\r\n"
                b"Content-Length: 99999\r\n\r\nshort")
    garbage = str(tmp_path / "junk.warc")
    with open(garbage, "wb") as f:
        f.write(b"this is not a warc file")
    out = read_warc(spark, str(tmp_path) + "/*.warc").collect()
    errs = {r.file.split("/")[-1]: r.parse_error
            for r in out if r.parse_error is not None}
    assert "truncated payload" in errs["bad.warc"]
    assert "malformed record header" in errs["junk.warc"]
    # good file unaffected
    assert sum(1 for r in out if r.parse_error is None) == 2
    # error rows survive a record_types filter (quarantine contract)
    filt = read_warc(spark, str(tmp_path) + "/*.warc",
                     record_types=["response"]).collect()
    assert any(r.parse_error for r in filt)


def test_warc_feeds_text_pipeline(spark, tmp_path):
    """The ingestion composition: WARC -> payload utf-8 -> documents
    frame ready for the curation operators."""
    path = str(tmp_path / "c.warc")
    write_warc_records(_records(), path)
    docs = (
        read_warc(spark, path, record_types=["response"])
        .filter(F.col("parse_error").isNull())
        .select(
            F.col("target_uri").alias("url"),
            F.decode(F.col("payload"), "UTF-8").alias("text"),
        )
    )
    rows = docs.collect()
    assert len(rows) == 5 and all("body" in r.text for r in rows)


def test_warc_to_shards_end_to_end(spark, tmp_path):
    """The full ingestion path in one test: WARC file -> parse ->
    curate (quality-ish gates + containment dedup + split) -> packed
    training shards on disk. Every stage is an oracle-certified
    operator; this pins that they actually COMPOSE."""
    from soda_spark_spark.operators.packing import assign_shards
    from soda_spark_spark.pipeline import curate

    def body(d):
        return " ".join(f"d{d}tok{i} w{(d * i) % 11}" for i in range(80))

    recs = [
        dict(record_id=f"<urn:doc:{i}>", warc_type="response",
             target_uri=f"http://example.com/p/{i}",
             payload=body(i).encode())
        for i in range(12)
    ]
    # an excerpt page (contained in doc 0) and a tiny junk page
    recs.append(dict(record_id="<urn:doc:90>", warc_type="response",
                     target_uri="http://example.com/quote",
                     payload=" ".join(body(0).split()[:30]).encode()))
    recs.append(dict(record_id="<urn:doc:91>", warc_type="response",
                     target_uri="http://example.com/junk",
                     payload=b"x"))
    path = str(tmp_path / "crawl-0.warc.gz")
    write_warc_records(recs, path)

    docs = (
        read_warc(spark, path, record_types=["response"])
        .filter(F.col("parse_error").isNull())
        .select(
            F.monotonically_increasing_id().alias("tmp_id"),
            F.col("target_uri").alias("url"),
            F.decode(F.col("payload"), "UTF-8").alias("text"),
        )
        .withColumn("doc_id", F.xxhash64("url"))
        .select("doc_id", "url", "text")
    )
    curated, report = curate(
        docs,
        [
            {"kind": "length_filter", "min_chars": 50},
            {"kind": "containment_dedup", "threshold_ppm": 900_000},
            {"kind": "split", "weights": {"train": 0.9, "val": 0.1}},
        ],
        report=True,
    )
    curated = curated.withColumn(
        "n_tokens", F.size(F.split(F.trim("text"), r"\s+"))
    )
    sharded = assign_shards(curated, "doc_id", "n_tokens",
                            shard_tokens=400)
    out_dir = str(tmp_path / "shards")
    sharded.write.partitionBy("shard_id").parquet(out_dir)
    back = spark.read.parquet(out_dir)
    # junk page cut by length, excerpt cut by containment; all 12 full
    # docs survive with split + shard assignments
    assert back.count() == 12
    assert back.select("split").distinct().count() <= 2
    assert back.select("shard_id").distinct().count() >= 2
    assert [r["kind"] for r in report] == [
        "length_filter", "containment_dedup", "split"]


def test_warc_http_message_split(spark, tmp_path):
    """application/http payloads (the real Common Crawl response shape)
    split into status / Content-Type header / entity body; other
    records pass through with body == payload."""
    from soda_spark_spark.sources.warc import (
        http_response_payload,
        read_warc,
        write_warc_records,
    )

    path = str(tmp_path / "h.warc")
    write_warc_records(
        [dict(record_id="<urn:a>", warc_type="response",
              target_uri="http://example.com/a",
              content_type="application/http; msgtype=response",
              payload=http_response_payload(
                  b"<html><body><h1>A</h1><p>one two</p></body></html>")),
         dict(record_id="<urn:b>", warc_type="response",
              target_uri="http://example.com/b",
              content_type="application/http; msgtype=response",
              payload=http_response_payload(
                  b"gone", status=404, reason="Not Found",
                  content_type="text/plain")),
         dict(record_id="<urn:c>", warc_type="response",
              target_uri="http://example.com/c",
              content_type="text/plain",
              payload=b"bare, not an HTTP message")],
        path,
    )
    out = read_warc(spark, path, record_types=["response"],
                    html_to_text=True)
    got = {r.target_uri: r for r in out.collect()}
    a = got["http://example.com/a"]
    assert (a.http_status, a.http_content_type) == (
        200, "text/html; charset=utf-8")
    assert bytes(a.body).startswith(b"<html>")
    assert a.text == "A\none two"  # extraction ran on the BODY
    b = got["http://example.com/b"]
    assert (b.http_status, b.text) == (404, "gone")
    c = got["http://example.com/c"]
    assert c.http_status is None and bytes(c.body) == bytes(c.payload)
    assert c.text == "bare, not an HTTP message"


def test_warc_http_malformed_header_block(spark, tmp_path):
    """An application/http payload without the header terminator keeps
    body == payload and NULL status (observable, never dropped)."""
    from soda_spark_spark.sources.warc import read_warc, write_warc_records

    path = str(tmp_path / "m.warc")
    write_warc_records(
        [dict(record_id="<urn:x>", warc_type="response",
              target_uri="http://example.com/x",
              content_type="application/http; msgtype=response",
              payload=b"HTTP/1.1 200 OK\r\nno-terminator")],
        path,
    )
    r = read_warc(spark, path).collect()[0]
    assert r.http_status is None
    assert bytes(r.body) == bytes(r.payload)
