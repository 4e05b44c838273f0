"""Round-9 regression tests for the five ADVICE.md items:

1. url_dedup passes NULL-url rows through untouched (they were being
   collapsed into a single survivor).
2. duplicate_spans scope='any' honors min_doc_count (was hardcoded >= 2).
3. decode_image raises on 16-bit netpbm (maxval > 255) instead of
   silently mis-decoding half the raster; the stats wrapper quarantines.
4. decode_*_stats derive the id column type from the input frame
   (string ids no longer crash the mapInPandas schema).
5. _merged_spans docstring no longer contains invalid escape sequences
   (DeprecationWarning on import / future SyntaxError).
"""
from __future__ import annotations

import pyspark.sql.functions as F
import pytest


def test_url_dedup_null_urls_pass_through(spark):
    from soda_spark_spark.operators.text import url_dedup

    rows = [
        (1, "https://a.com/x"),
        (2, "https://A.com/x/"),
        (3, None),
        (4, None),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    out = url_dedup(df, "id", "url").collect()
    kept = sorted(r.id for r in out)
    # 1 survives the a.com/x group; ALL THREE null-url rows survive
    assert kept == [1, 3, 4, 5]
    by_id = {r.id: r.canonical_url for r in out}
    assert by_id[3] is None and by_id[4] is None and by_id[5] is None

    out_any = url_dedup(df, "id", "url", keep="any").collect()
    assert len(out_any) == 4
    assert sum(1 for r in out_any if r.canonical_url is None) == 3


def test_duplicate_spans_any_scope_honors_min_doc_count(spark):
    from soda_spark_spark.operators.dedup import duplicate_spans

    # "x y z" appears twice total (doc 1 twice); threshold 3 must NOT
    # flag it, threshold 2 must.
    rows = [(1, "x y z q q q x y z"), (2, "totally different words here")]
    df = spark.createDataFrame(rows, "id long, text string")
    lo = duplicate_spans(df, "id", "text", window=3, scope="any",
                         min_doc_count=2).collect()
    hi = duplicate_spans(df, "id", "text", window=3, scope="any",
                         min_doc_count=3).collect()
    assert len(lo) > 0
    assert len(hi) == 0


def test_decode_image_rejects_16bit_netpbm(spark):
    from soda_spark_spark.operators.multimodal import (
        decode_image,
        decode_image_stats,
    )

    # maxval 65535 → 2-byte samples; must raise, not half-decode
    payload = b"P5\n2 1\n65535\n" + bytes([0, 1, 0, 2])
    with pytest.raises(NotImplementedError, match="16-bit netpbm"):
        decode_image(payload)

    # and the Arrow wrapper routes it to the quarantine channel
    df = spark.createDataFrame([(1, bytearray(payload))],
                               "id long, payload binary")
    row = decode_image_stats(df, "id", "payload").collect()[0]
    assert row.error is not None and "16-bit netpbm" in row.error
    assert row.sum_value is None

    # 8-bit PGM still decodes exactly
    ok = b"P5\n3 1\n255\n" + bytes([1, 2, 3])
    m = decode_image(ok)
    assert (m["width"], m["height"], m["sum_value"]) == (3, 1, 6)


def test_decode_stats_string_id_col(spark):
    from soda_spark_spark.operators.multimodal import (
        decode_audio_stats,
        decode_image_stats,
        decode_video_stats,
    )

    img = b"P5\n3 1\n255\n" + bytes([10, 20, 30])
    df = spark.createDataFrame([("doc-a", bytearray(img))],
                               "id string, payload binary")
    r = decode_image_stats(df, "id", "payload").collect()[0]
    assert r.id == "doc-a" and r.sum_value == 60

    # audio/video wrappers accept the string id too (payloads invalid →
    # quarantine rows, but the schema must bind)
    ra = decode_audio_stats(df, "id", "payload").collect()[0]
    rv = decode_video_stats(df, "id", "payload").collect()[0]
    assert ra.id == "doc-a" and ra.error is not None
    assert rv.id == "doc-a" and rv.error is not None


def test_merged_spans_docstring_has_no_bad_escapes():
    from soda_spark_spark.operators.dedup import _merged_spans

    assert "\\_" not in (_merged_spans.__doc__ or "")


# ---------------------------------------------------------------------------
# gram_key_sketch / novelty_scores persisted-key path (VERDICT r8 item 2)
# ---------------------------------------------------------------------------

_NOVELTY_DOCS = [
    (1, "alpha beta gamma delta epsilon zeta"),
    (2, "alpha beta gamma completely different tail here"),
    (3, "unrelated words in this one entirely thanks"),
    (4, None),
]


def test_gram_key_sketch_matches_band_tags_derivation(spark):
    from soda_spark_spark.operators.dedup import (
        gram_key_sketch,
        minhash_band_tags,
    )

    df = spark.createDataFrame(_NOVELTY_DOCS, "id long, text string")
    from_docs = {r[0] for r in gram_key_sketch(df, "id", "text").collect()}
    tags_h = minhash_band_tags(df, "id", "text", gram_storage="hash")
    tags_t = minhash_band_tags(df, "id", "text", gram_storage="text")
    assert {r[0] for r in gram_key_sketch(tags_h).collect()} == from_docs
    assert {r[0] for r in gram_key_sketch(tags_t).collect()} == from_docs
    assert len(from_docs) > 0


def test_novelty_scores_key_table_matches_band_tags(spark, tmp_path):
    from soda_spark_spark.operators.dedup import (
        gram_key_sketch,
        minhash_band_tags,
        novelty_scores,
    )

    df = spark.createDataFrame(_NOVELTY_DOCS, "id long, text string")
    seen = df.filter(F.col("id") != 2)
    new = df.filter(F.col("id") == 2)
    via_tags = novelty_scores(
        new, minhash_band_tags(seen, "id", "text"), "id", "text"
    ).collect()
    path = str(tmp_path / "keys")
    gram_key_sketch(seen, "id", "text").write.parquet(path)
    via_keys = novelty_scores(
        new, spark.read.parquet(path), "id", "text"
    ).collect()
    assert sorted(map(tuple, via_tags)) == sorted(map(tuple, via_keys))
    # doc 2 shares the "alpha beta gamma" gram with history -> partial novelty
    row = via_keys[0]
    assert 0.0 < row.novelty < 1.0


def test_novelty_key_table_plan_has_no_sketch_side_aggregate(spark, tmp_path):
    """With a persisted gram_key_sketch the per-batch novelty plan must
    contain exactly ONE logical aggregate (the per-doc groupBy — two
    physical HashAggregate nodes, partial + final): no distinct over
    the sketch side. The legacy band-tags path pays an extra pair."""
    from soda_spark_spark.operators.dedup import gram_key_sketch, novelty_scores

    df = spark.createDataFrame(_NOVELTY_DOCS, "id long, text string")
    path = str(tmp_path / "keys")
    gram_key_sketch(df, "id", "text").write.parquet(path)
    out = novelty_scores(df, spark.read.parquet(path), "id", "text")
    plan = spark._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    # the tree section lists each physical node as "HashAggregate (N)";
    # the per-doc groupBy contributes its partial+final pair and nothing else
    assert plan.count("HashAggregate (") == 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# bpe_train_counts incremental rewrite (VERDICT r8 "What's wrong" #3)
# ---------------------------------------------------------------------------


def _naive_bpe_train_counts(counts, n_merges):
    """The pre-round-9 reference algorithm: full-vocab affected scan +
    O(|stats|) argmax per merge. Kept here as the equivalence oracle for
    the index+heap rewrite."""
    from soda_spark_spark.operators.tokenizer import END, _merge_word

    vocab = {}
    for w, c in counts:
        syms = tuple(w) + (END,)
        vocab[syms] = vocab.get(syms, 0) + c
    stats = {}
    for syms, c in vocab.items():
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            stats[p] = stats.get(p, 0) + c
    merges = []
    for rank in range(n_merges):
        if not stats:
            break
        best = min(stats, key=lambda p: (-stats[p], p))
        if stats[best] < 1:
            break
        merges.append((rank, best[0], best[1]))
        affected = [s for s in vocab if best in zip(s, s[1:])]
        for syms in affected:
            c = vocab.pop(syms)
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                stats[p] -= c
                if stats[p] <= 0:
                    del stats[p]
            new = _merge_word(syms, best)
            vocab[new] = vocab.get(new, 0) + c
            for i in range(len(new) - 1):
                p = (new[i], new[i + 1])
                stats[p] = stats.get(p, 0) + c
    return merges


def test_bpe_train_counts_matches_naive_reference():
    import random

    from soda_spark_spark.operators.tokenizer import bpe_train_counts

    rng = random.Random(7)
    alphabet = "abcdef"
    for trial in range(20):
        n_words = rng.randint(1, 60)
        vocab = {}
        for _ in range(n_words):
            w = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 9)))
            vocab[w] = rng.randint(1, 50)
        counts = sorted(vocab.items())
        n_merges = rng.randint(1, 80)
        assert bpe_train_counts(counts, n_merges) == _naive_bpe_train_counts(
            counts, n_merges
        ), f"divergence at trial {trial}"


def test_bpe_train_counts_exhausts_gracefully():
    from soda_spark_spark.operators.tokenizer import bpe_train_counts

    # more merges requested than pairs exist: must stop, not loop/crash
    merges = bpe_train_counts([("ab", 3)], 1000)
    assert [m[0] for m in merges] == list(range(len(merges)))
    assert 1 <= len(merges) <= 3
    assert bpe_train_counts([], 10) == []


def test_novelty_scores_rejects_unknown_sketch_schema(spark):
    from soda_spark_spark.operators.dedup import novelty_scores

    df = spark.createDataFrame(_NOVELTY_DOCS, "id long, text string")
    bad = spark.createDataFrame([(1,)], "other long")
    with pytest.raises(ValueError, match="grams.*__h|__h.*grams"):
        novelty_scores(df, bad, "id", "text")


# ---------------------------------------------------------------------------
# pluggable decoder registry (VERDICT r8 Missing #1)
# ---------------------------------------------------------------------------

_JPEG_MAGIC = b"\xff\xd8\xff"


def _make_fake_jpeg_decoder():
    # defined NESTED so cloudpickle ships it by value (a test module is
    # not importable on executors; real registrants live in importable
    # modules and pickle by reference)
    magic = _JPEG_MAGIC

    def fake_jpeg_decoder(payload: bytes) -> dict:
        if not payload.startswith(magic):
            raise ValueError("not a jpeg")
        body = payload[len(magic):]
        return {
            "format": "jpeg", "width": 2, "height": 1,
            "n_bytes": len(payload), "sum_value": sum(body),
            "mean_value": sum(body) / max(1, len(body)),
        }

    return fake_jpeg_decoder


def test_register_decoder_applies_through_stats_operator(spark):
    from soda_spark_spark.operators import multimodal as mm

    # jpeg decodes FOR REAL as of round 15 (png since round 12), so
    # the registry-miss message now belongs to genuinely unknown
    # formats; a custom decoder still OVERRIDES the built-in, and
    # unregistering restores it
    jpeg = _JPEG_MAGIC + bytes([10, 20])  # truncated: real parse error
    df = spark.createDataFrame([(1, bytearray(jpeg))], "id long, payload binary")
    unknown = spark.createDataFrame(
        [(1, bytearray(b"WEBPISH new codec"))], "id long, payload binary"
    )

    # unknown format: honest raise -> quarantine row naming the hook
    row = mm.decode_image_stats(unknown, "id", "payload").collect()[0]
    assert row.error is not None and "register_decoder" in row.error
    assert row.sum_value is None

    # built-in jpeg path: a truncated stream is a PARSE error, not a
    # registry miss
    row = mm.decode_image_stats(df, "id", "payload").collect()[0]
    assert row.error is not None and "register_decoder" not in row.error
    assert row.format == "jpeg" and row.sum_value is None

    mm.register_decoder("image", "jpeg", _make_fake_jpeg_decoder())
    try:
        row = mm.decode_image_stats(df, "id", "payload").collect()[0]
        assert row.error is None
        assert (row.format, row.width, row.sum_value) == ("jpeg", 2, 30)
    finally:
        mm.unregister_decoder("image", "jpeg")

    # unregistering restores the BUILT-IN decoder (parse error again)
    row = mm.decode_image_stats(df, "id", "payload").collect()[0]
    assert row.error is not None and "register_decoder" not in row.error
    from soda_spark_spark.operators.multimodal import _decode_jpeg
    assert mm._DECODERS[("image", "jpeg")] is _decode_jpeg


def test_register_decoder_rejects_unknown_media_kind():
    from soda_spark_spark.operators import multimodal as mm

    with pytest.raises(ValueError, match="media kind"):
        mm.register_decoder("hologram", "jpeg", _make_fake_jpeg_decoder())


def test_builtin_trio_are_default_registrants():
    from soda_spark_spark.operators import multimodal as mm

    for key in (("image", "ppm"), ("image", "pgm"), ("image", "bmp"),
                ("image", "png"), ("audio", "wav"), ("video", "y4m")):
        assert key in mm._DECODERS


def test_audio_video_sniffers_name_compressed_formats():
    from soda_spark_spark.operators import multimodal as mm

    assert mm.sniff_audio_format(b"ID3\x04" + b"\x00" * 8) == "mp3"
    assert mm.sniff_audio_format(b"\xff\xfb\x90\x00") == "mp3"
    assert mm.sniff_video_format(b"\x00\x00\x00\x18ftypisom" + b"\x00" * 4) == "mp4"
    with pytest.raises(NotImplementedError, match="register_decoder"):
        mm.decode_audio(b"\xff\xfb\x90\x00" + b"\x00" * 64)
    with pytest.raises(NotImplementedError, match="register_decoder"):
        mm.decode_video(b"\x00\x00\x00\x18ftypisom" + b"\x00" * 64)


# ---------------------------------------------------------------------------
# canonical_url vs an independent pure-Python reference
# ---------------------------------------------------------------------------


def _py_canonical_url(url):
    """Independent reference canonicalizer (stdlib string ops, no regex
    sharing with the implementation): strip fragment; lowercase
    scheme://host; drop default ports and leading www.; drop tracking
    params; sort survivors; strip trailing path slashes."""
    import re

    if url is None:
        return None
    u = url.split("#", 1)[0]
    m = re.match(r"^([^/?#]+://[^/?#]+)(.*)$", u, re.S)
    if m:
        prefix, rest = m.group(1).lower(), m.group(2)
    else:
        # no scheme://host: empty prefix, the whole string is path?query —
        # scheme-less URLs keep DISTINCT canonical forms (collapsing them
        # all to '' would fabricate duplicates)
        prefix, rest = "", u
    if prefix.startswith("http://") and prefix.endswith(":80"):
        prefix = prefix[: -len(":80")]
    if prefix.startswith("https://") and prefix.endswith(":443"):
        prefix = prefix[: -len(":443")]
    for scheme in ("http://", "https://"):
        if prefix.startswith(scheme + "www."):
            prefix = scheme + prefix[len(scheme) + 4:]
    path, _, query = rest.partition("?")
    path = path.rstrip("/")
    tracking = re.compile(r"^(utm_[^=]*|fbclid|gclid|msclkid|mc_eid|ref|ref_src)=")
    params = sorted(p for p in query.split("&") if p and not tracking.match(p))
    return prefix + path + ("?" + "&".join(params) if params else "")


def test_canonical_url_matches_python_reference_corpus(spark):
    import random

    from soda_spark_spark.operators.text import canonical_url

    rng = random.Random(99)
    schemes = ["http://", "https://", "HTTPS://", "ftp://"]
    hosts = ["Example.com", "www.example.com", "a.b.co.uk:8080",
             "example.com:443", "example.com:80", "WWW.X.IO"]
    paths = ["", "/", "/Path/To/Page", "/p//", "/a/b/", "/%7Euser"]
    queries = ["", "?a=1", "?utm_source=x", "?b=2&a=1", "?a=1&utm_medium=m&z=9",
               "?fbclid=f&ref=r", "?ref_src=t&x=y", "?gclid=1&a="]
    frags = ["", "#", "#frag", "#a/b?c=1"]
    urls = [None, "", "no-scheme/path?a=1"]
    for _ in range(400):
        urls.append(rng.choice(schemes) + rng.choice(hosts)
                    + rng.choice(paths) + rng.choice(queries) + rng.choice(frags))
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               "i long, url string")
    got = {r.i: r.c for r in
           df.select("i", canonical_url(F.col("url")).alias("c")).collect()}
    for i, u in enumerate(urls):
        assert got[i] == _py_canonical_url(u), f"divergence on {u!r}: {got[i]!r} vs {_py_canonical_url(u)!r}"
