"""Round-13 features: domain_blocklist gate (+ curate step), perceptual
image hashing / near-dup dedup."""
from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from soda_spark_spark.operators.multimodal import (
    image_dedup,
    image_hash_payload,
    image_hashes,
    image_near_dup_pairs,
)
from soda_spark_spark.operators.text import domain_blocklist


def _pgm(pixels: bytes, w: int = 9, h: int = 8) -> bytes:
    assert len(pixels) == w * h
    return f"P5\n{w} {h}\n255\n".encode() + pixels


def test_image_hash_known_values():
    # strictly ascending rows: every horizontal gradient is "up" -> all
    # 64 dhash bits set -> signed two's-complement -1
    asc = _pgm(bytes(range(72)))
    assert image_hash_payload(asc) == -1
    # strictly descending: no bit set
    desc = _pgm(bytes(reversed(range(72))))
    assert image_hash_payload(desc) == 0
    # constant image: ahash strictly-above-mean never fires
    flat = _pgm(bytes([77] * 64), w=8, h=8)
    assert image_hash_payload(flat, method="ahash") == 0


def test_image_hash_brightness_invariant_and_png_parity():
    from soda_spark_spark.operators.multimodal import encode_png

    base = bytes(
        hashlib.md5(f"img{i}".encode()).digest()[0] % 200 for i in range(72)
    )
    brighter = bytes(b + 20 for b in base)  # max 219+20 < 256, no clip
    assert image_hash_payload(_pgm(base)) == image_hash_payload(
        _pgm(brighter)
    )
    # the SAME raster through the PNG channel hashes identically
    png = encode_png(9, 8, base, color_type=0)
    assert image_hash_payload(png) == image_hash_payload(_pgm(base))


def test_image_hash_rgb_luma_and_errors():
    rgb = b"".join(bytes([r, 2 * r % 256, 3 * r % 256]) for r in range(72))
    ppm = b"P6\n9 8\n255\n" + rgb
    v = image_hash_payload(ppm)
    assert isinstance(v, int) and -(1 << 63) <= v < (1 << 63)
    # jpeg decodes for real as of round 15: garbage with a jpeg
    # signature is now a PARSE error; unknown formats stay the
    # NotImplementedError boundary
    with pytest.raises(ValueError):
        image_hash_payload(b"\xff\xd8\xffJPEGish")
    with pytest.raises(NotImplementedError):
        image_hash_payload(b"RIFFxxxxWEBPish")
    with pytest.raises(ValueError, match="method"):
        image_hash_payload(_pgm(bytes(72)), method="phash")


@pytest.fixture()
def image_corpus(spark):
    """Three near-dup variants of one picture (ids 1-3), one distinct
    picture (10), one undecodable payload (99)."""
    base = bytearray(
        hashlib.md5(f"pix{i}".encode()).digest()[0] for i in range(72)
    )
    v2 = bytearray(base)
    v2[9] = 255 - v2[9]     # one byte of row 1 -> <= 2 gradient bits
    v3 = bytearray(b + 1 if b < 255 else b for b in base)  # near-identity
    other = bytearray(
        hashlib.md5(f"other{i}".encode()).digest()[0] for i in range(72)
    )
    rows = [
        (1, _pgm(bytes(base))), (2, _pgm(bytes(v2))), (3, _pgm(bytes(v3))),
        (10, _pgm(bytes(other))), (99, b"not an image"),
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_image_hashes_quarantine(spark, image_corpus):
    got = {r.id: (r.hash, r.error)
           for r in image_hashes(image_corpus, "doc_id", "payload").collect()}
    assert got[99][0] is None and got[99][1] is not None
    assert all(got[i][0] is not None for i in (1, 2, 3, 10))


def test_image_near_dup_pairs_and_dedup(spark, image_corpus):
    pairs = image_near_dup_pairs(
        image_corpus, "doc_id", "payload", max_hamming=4
    )
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    assert set(got) == {(1, 2), (1, 3), (2, 3)}
    assert got[(1, 3)] == 0  # +1 brightness preserves every gradient
    assert 0 < got[(1, 2)] <= 2
    out = image_dedup(image_corpus, "doc_id", "payload", max_hamming=4)
    kept = sorted(r.doc_id for r in out.collect())
    # cluster {1,2,3} -> min id 1; distinct 10 and undecodable 99 survive
    assert kept == [1, 10, 99]


def test_image_dedup_precomputed_hashes(spark, image_corpus):
    h = image_hashes(image_corpus, "doc_id", "payload")
    out = image_dedup(
        image_corpus, "doc_id", "payload", hashes=h, max_hamming=4
    )
    assert sorted(r.doc_id for r in out.collect()) == [1, 10, 99]


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, "ref: https://WWW.Spam.Example/x1 end"),          # exact block
        (2, "ref: http://cdn.ads.spam.example/y2 end"),       # subdomain
        (3, "ref: https://good.example.org/z3 end"),          # clean
        (4, "plain note without links"),                      # no host
        (5, "ref: https://notspam.example/w5 end"),           # NOT a suffix
        (6, "ref: https://tracker.example.com./t6 end"),      # trailing dot
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def blocklist(spark):
    # blocklist side canonicalizes too: case, www., trailing dot
    return spark.createDataFrame(
        [("Spam.Example",), ("www.tracker.example.com.",)], "host string"
    )


def test_domain_blocklist_subdomains(spark, corpus, blocklist):
    out = domain_blocklist(corpus, blocklist, "doc_id")
    assert sorted(r.doc_id for r in out.collect()) == [3, 4, 5]
    # schema untouched
    assert out.columns == ["doc_id", "text"]


def test_domain_blocklist_exact_only(spark, corpus, blocklist):
    out = domain_blocklist(
        corpus, blocklist, "doc_id", include_subdomains=False
    )
    # the subdomain doc (2) survives without suffix expansion
    assert sorted(r.doc_id for r in out.collect()) == [2, 3, 4, 5]


def test_domain_blocklist_keep_missing_false(spark, corpus, blocklist):
    out = domain_blocklist(
        corpus, blocklist, "doc_id", keep_missing=False
    )
    assert sorted(r.doc_id for r in out.collect()) == [3, 5]


def test_domain_blocklist_url_col(spark, blocklist):
    df = spark.createDataFrame(
        [(1, "https://spam.example/a"), (2, "https://ok.example/b"),
         (3, None)],
        "doc_id long, url string",
    )
    out = domain_blocklist(df, blocklist, "doc_id", url_col="url")
    assert sorted(r.doc_id for r in out.collect()) == [2, 3]


def test_domain_blocklist_host_col_resolution(spark, corpus):
    single = spark.createDataFrame([("spam.example",)], "h string")
    out = domain_blocklist(corpus, single, "doc_id")
    assert 1 not in {r.doc_id for r in out.collect()}
    two = spark.createDataFrame([("spam.example", 1)], "a string, b int")
    with pytest.raises(ValueError, match="host_col"):
        domain_blocklist(corpus, two, "doc_id")


def test_domain_blocklist_curate_step(spark, corpus, blocklist):
    from soda_spark_spark.pipeline import curate

    out, _ = curate(
        corpus, [{"kind": "domain_blocklist", "hosts": blocklist}]
    )
    assert sorted(r.doc_id for r in out.collect()) == [3, 4, 5]


def test_domain_blocklist_broadcasts_blocklist(spark, corpus, blocklist):
    out = domain_blocklist(corpus, blocklist, "doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# quantile sketch family
# ---------------------------------------------------------------------------


def test_quantile_sketch_and_query(spark):
    from soda_spark_spark.operators.cardinality import (
        quantile_query,
        quantile_sketch,
    )

    df = spark.range(1, 1001).select(F.col("id").cast("double").alias("v"))
    sk = quantile_sketch(df, "v", lo=0.0, hi=1000.0, n_buckets=100)
    rows = sk.collect()
    assert len(rows) <= 100 and sum(r.n for r in rows) == 1000
    got = {r.q: r for r in quantile_query(sk, [0.25, 0.5, 0.9]).collect()}
    for q in (0.25, 0.5, 0.9):
        exact = max(1, -(-int(q * 1000) // 1))  # rank = ceil(q*N)
        r = got[q]
        assert r.rank == exact
        # the true rank-th value (== rank here) sits inside the bar
        assert r.lo_v <= exact <= r.hi_v
        assert r.hi_v - r.lo_v <= 10.0  # one bucket wide


def test_quantile_sketch_merge_law(spark):
    from soda_spark_spark.operators.cardinality import (
        quantile_sketch,
        quantile_sketch_merge,
    )

    df = spark.range(0, 500).select(
        (F.col("id") * 17 % 1000).cast("double").alias("v")
    )
    a = df.filter(F.col("v") < 300)
    b = df.filter(F.col("v") >= 300)
    merged = {
        r.bucket: (r.n, r.lo_v, r.hi_v)
        for r in quantile_sketch_merge(
            quantile_sketch(a, "v", lo=0.0, hi=1000.0, n_buckets=64),
            quantile_sketch(b, "v", lo=0.0, hi=1000.0, n_buckets=64),
        ).collect()
    }
    oneshot = {
        r.bucket: (r.n, r.lo_v, r.hi_v)
        for r in quantile_sketch(
            df, "v", lo=0.0, hi=1000.0, n_buckets=64
        ).collect()
    }
    assert merged == oneshot


def test_quantile_sketch_clamp_and_validation(spark):
    from soda_spark_spark.operators.cardinality import (
        quantile_query,
        quantile_sketch,
    )

    df = spark.createDataFrame(
        [(-5.0,), (0.5,), (99.0,), (250.0,), (None,)], "v double"
    )
    sk = quantile_sketch(df, "v", lo=0.0, hi=100.0, n_buckets=10)
    rows = {r.bucket: r for r in sk.collect()}
    assert sum(r.n for r in rows.values()) == 4  # NULL skipped
    assert rows[0].lo_v == -5.0       # clamped but true value recorded
    assert rows[9].hi_v == 250.0
    with pytest.raises(ValueError, match="hi > lo"):
        quantile_sketch(df, "v", lo=1.0, hi=1.0)
    with pytest.raises(ValueError, match="fractions"):
        quantile_query(sk, [])
    with pytest.raises(ValueError, match="fractions"):
        quantile_query(sk, [1.5])


def test_quantile_sketch_compact_idempotent(spark):
    from soda_spark_spark.operators.cardinality import (
        quantile_sketch,
        quantile_sketch_compact,
    )

    df = spark.range(0, 100).select(F.col("id").cast("double").alias("v"))
    sk = quantile_sketch(df, "v", lo=0.0, hi=100.0, n_buckets=8)
    tagged = sk.withColumn("batch_id", F.lit(0))
    # a replayed batch appends identical rows; compact collapses them
    doubled = tagged.unionByName(tagged)
    got = {r.bucket: r.n for r in quantile_sketch_compact(doubled).collect()}
    want = {r.bucket: r.n for r in sk.collect()}
    assert got == want


def test_quantile_sketch_stream(spark, tmp_path):
    import uuid

    from soda_spark_spark.operators.cardinality import (
        quantile_sketch,
        quantile_sketch_compact,
    )
    from soda_spark_spark.streaming.scan_stream import (
        quantile_sketch_batch_writer,
    )

    df = spark.range(0, 400).select(
        (F.col("id") % 97).cast("double").alias("v")
    )
    src = str(tmp_path / "src")
    df.repartition(4).write.parquet(src)
    sketch_dir = str(tmp_path / "sketch")
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            quantile_sketch_batch_writer(
                sketch_dir, "v", lo=0.0, hi=100.0, n_buckets=20
            )
        )
        .option("checkpointLocation",
                str(tmp_path / f"ckpt_{uuid.uuid4().hex[:6]}"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {
        r.bucket: (r.n, r.lo_v, r.hi_v)
        for r in quantile_sketch_compact(
            spark.read.parquet(sketch_dir)
        ).collect()
    }
    want = {
        r.bucket: (r.n, r.lo_v, r.hi_v)
        for r in quantile_sketch(
            df, "v", lo=0.0, hi=100.0, n_buckets=20
        ).collect()
    }
    assert got == want


def test_quantile_gate_stream(spark, tmp_path):
    import uuid

    from soda_spark_spark.operators.cardinality import quantile_sketch
    from soda_spark_spark.streaming.scan_stream import (
        quantile_gate_batch_writer,
    )

    df = spark.range(1, 101).select(F.col("id").cast("double").alias("v"))
    sk = quantile_sketch(df, "v", lo=0.0, hi=100.0, n_buckets=100)
    src = str(tmp_path / "src")
    df.repartition(3).write.parquet(src)
    out_dir = str(tmp_path / "kept")
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            quantile_gate_batch_writer(sk, "v", out_dir, fraction=0.9)
        )
        .option("checkpointLocation",
                str(tmp_path / f"ckpt_{uuid.uuid4().hex[:6]}"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    kept = sorted(r.v for r in spark.read.parquet(out_dir).collect())
    # rank = ceil(0.9*100) = 90; value 90 sits alone in bucket 90
    # (width 1.0), so cut = hi_v = 90.0 and exactly 1..90 pass
    assert kept == [float(x) for x in range(1, 91)]


def test_quantile_gate_sides_and_validation(spark, tmp_path):
    from soda_spark_spark.operators.cardinality import quantile_sketch
    from soda_spark_spark.streaming.scan_stream import (
        quantile_gate_batch_writer,
    )

    df = spark.range(1, 11).select(F.col("id").cast("double").alias("v"))
    sk = quantile_sketch(df, "v", lo=0.0, hi=10.0, n_buckets=10)
    with pytest.raises(ValueError, match="side"):
        quantile_gate_batch_writer(sk, "v", str(tmp_path), fraction=0.5,
                                   side="between")
    # side='ge' keeps the upper tail, from the bucket's lo_v
    w = quantile_gate_batch_writer(
        sk, "v", str(tmp_path / "hi"), fraction=0.5, side="ge"
    )
    w(df, 0)
    kept = sorted(
        r.v for r in df.sparkSession.read.parquet(
            str(tmp_path / "hi")).collect()
    )
    assert kept == [5.0, 6.0, 7.0, 8.0, 9.0, 10.0]
    empty = quantile_sketch(
        df.filter(F.col("v") > 99), "v", lo=0.0, hi=10.0
    )
    with pytest.raises(ValueError, match="empty"):
        quantile_gate_batch_writer(empty, "v", str(tmp_path), fraction=0.5)


# ---------------------------------------------------------------------------
# plan-shape pins for the round-13 operators (the 100-TB story, asserted)
# ---------------------------------------------------------------------------


def test_html_extract_plan_shape(spark, tmp_path):
    """Extraction must not break Catalyst around it: exactly one Arrow
    UDF stage, a filter on another column still reaches the parquet
    scan as a pushed filter, and the plan has NO shuffle."""
    from soda_spark_spark.operators.html_text import extract_html_text

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, f"<p>doc {i}</p>") for i in range(50)],
        "doc_id long, text string",
    ).write.parquet(src)
    out = extract_html_text(spark.read.parquet(src)).filter(
        F.col("doc_id") < 10
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    assert "Exchange" not in plan
    assert "LessThan(doc_id,10)" in plan  # pushed to the scan


def test_quantile_sketch_plan_shape(spark, tmp_path):
    """The sketch is ONE map-side-combined aggregation: no Sort
    anywhere, a single Exchange (the bucket groupBy), and the scan
    pruned to the sketched column."""
    from soda_spark_spark.operators.cardinality import quantile_sketch

    src = str(tmp_path / "vals")
    spark.createDataFrame(
        [(float(i), f"junk{i}") for i in range(100)],
        "v double, other string",
    ).write.parquet(src)
    sk = quantile_sketch(
        spark.read.parquet(src), "v", lo=0.0, hi=100.0, n_buckets=16
    )
    plan = sk._jdf.queryExecution().executedPlan().toString()
    assert "Sort" not in plan
    assert plan.count("Exchange") == 1
    assert plan.count("HashAggregate") == 2  # partial + final
    assert "other" not in plan.split("ReadSchema")[1][:120]


def test_domain_blocklist_uppercase_scheme(spark, blocklist):
    """'HTTPS://' must not smuggle a blocked host past a case-sensitive
    scheme match: extraction runs on the lowercased source."""
    df = spark.createDataFrame(
        [(1, "ref: HTTPS://SPAM.EXAMPLE/x end"),
         (2, "ref: HtTpS://cdn.spam.example/y end"),
         (3, "ref: https://fine.example.org/z end")],
        "doc_id long, text string",
    )
    out = domain_blocklist(df, blocklist, "doc_id")
    assert sorted(r.doc_id for r in out.collect()) == [3]
    df2 = spark.createDataFrame(
        [(1, "HTTP://spam.example/a"), (2, "http://ok.example/b")],
        "doc_id long, url string",
    )
    out2 = domain_blocklist(df2, blocklist, "doc_id", url_col="url")
    assert sorted(r.doc_id for r in out2.collect()) == [2]


# ---------------------------------------------------------------------------
# G.711 mu-law / A-law WAV decoding
# ---------------------------------------------------------------------------


def _wav(fmt_code: int, data: bytes, *, channels=1, rate=8000, bits=8):
    import struct

    fmt = struct.pack("<HHIIHH", fmt_code, channels, rate,
                      rate * channels * bits // 8,
                      channels * bits // 8, bits)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
            + (b"\x00" if len(data) % 2 else b""))
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_g711_expansion_matches_reference():
    """Pin the mu-law/A-law LUTs against the stdlib reference
    (audioop, while this Python still ships it) or golden values."""
    from soda_spark_spark.operators.multimodal import (
        _alaw_to_linear, _ulaw_to_linear,
    )

    try:
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            import audioop  # deprecated, removed in 3.13

        for b in range(256):
            want_u = int.from_bytes(
                audioop.ulaw2lin(bytes([b]), 2), "little", signed=True
            )
            assert _ulaw_to_linear(b) == want_u, ("ulaw", b)
            want_a = int.from_bytes(
                audioop.alaw2lin(bytes([b]), 2), "little", signed=True
            )
            assert _alaw_to_linear(b) == want_a, ("alaw", b)
    except ImportError:
        pass
    # golden anchors from the published G.711 tables either way
    assert _ulaw_to_linear(0xFF) == 0        # positive zero
    assert _ulaw_to_linear(0x7F) == 0        # negative zero
    assert _ulaw_to_linear(0x80) == 32124    # max positive
    assert _ulaw_to_linear(0x00) == -32124   # max negative
    assert _alaw_to_linear(0xD5) == 8        # smallest positive
    assert _alaw_to_linear(0x55) == -8
    assert _alaw_to_linear(0xAA) == 32256    # max positive
    assert _alaw_to_linear(0x2A) == -32256


def test_g711_wav_through_decode_and_stream(spark):
    import hashlib

    from soda_spark_spark.operators.multimodal import (
        _ulaw_to_linear, decode_audio_stats,
    )

    data = bytes(hashlib.md5(f"ul{i}".encode()).digest()[0]
                 for i in range(160))
    rows = [(1, bytearray(_wav(7, data))),         # mu-law
            (2, bytearray(_wav(6, data))),         # A-law
            (3, bytearray(_wav(3, data)))]         # float: quarantined
    df = spark.createDataFrame(rows, "id long, payload binary")
    got = {r.id: r for r in decode_audio_stats(df, "id", "payload").collect()}
    assert got[1].error is None and got[2].error is None
    assert got[3].error is not None
    assert got[1].n_samples == 160
    assert got[1].sum_value == sum(_ulaw_to_linear(b) for b in data)
    assert got[1].sample_rate == 8000


def test_quantile_query_tolerates_uncompacted_log(spark):
    """quantile_query canonicalizes defensively: feeding it the raw
    append-only batch log gives the same answer as the compacted
    sketch."""
    from soda_spark_spark.operators.cardinality import (
        quantile_query,
        quantile_sketch,
    )

    df = spark.range(0, 300).select(F.col("id").cast("double").alias("v"))
    a = quantile_sketch(df.filter(F.col("v") < 150), "v",
                        lo=0.0, hi=300.0, n_buckets=30)
    b = quantile_sketch(df.filter(F.col("v") >= 150), "v",
                        lo=0.0, hi=300.0, n_buckets=30)
    log = (a.withColumn("batch_id", F.lit(0))
           .unionByName(b.withColumn("batch_id", F.lit(1))))
    direct = quantile_sketch(df, "v", lo=0.0, hi=300.0, n_buckets=30)
    got = {r.q: (r.rank, r.lo_v, r.hi_v, r.estimate)
           for r in quantile_query(log, [0.25, 0.9]).collect()}
    want = {r.q: (r.rank, r.lo_v, r.hi_v, r.estimate)
            for r in quantile_query(direct, [0.25, 0.9]).collect()}
    assert got == want
