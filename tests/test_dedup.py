"""Unit tests for dedup operators (exact, minhash LSH, simhash, n-gram)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from soda_spark_spark.operators.dedup import (
    dedup_keep_first,
    drop_exact_duplicates,
    duplicate_clusters,
    minhash_near_dup_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
    word_shingles,
)

DOC = (
    "the quick brown fox jumps over the lazy dog and runs far away into the woods "
    "while the hunter watches quietly from a distance near the old river bank"
)
DOC_NEAR = DOC.replace("quietly", "silently")  # one word differs
DOC_OTHER = (
    "completely different content about spark query engines and distributed "
    "aggregation pipelines running on very large clusters with many executors"
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, DOC), (2, DOC_NEAR), (3, DOC_OTHER), (4, DOC)],
        "doc_id long, text string",
    )


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",), ("",)], "t string")
    out = df.select(word_shingles(F.col("t"), 3).alias("s")).collect()
    assert out[0].s == ["a b c", "b c d"]
    assert out[1].s == []
    assert out[2].s == []


def test_word_shingles_dedups(spark):
    df = spark.createDataFrame([("x y x y x y",)], "t string")
    out = df.select(word_shingles(F.col("t"), 2).alias("s")).first()
    assert sorted(out.s) == ["x y", "y x"]


def test_drop_exact_duplicates(docs):
    assert drop_exact_duplicates(docs, ["text"]).count() == 3


def test_dedup_keep_first_deterministic(docs):
    kept = dedup_keep_first(docs, ["text"], ["doc_id"])
    ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert ids == {1, 2, 3}  # doc 4 (dup of 1) dropped, min doc_id kept


def test_duplicate_clusters(docs):
    rows = duplicate_clusters(docs, ["text"], "doc_id").collect()
    assert len(rows) == 1
    assert rows[0].cluster_size == 2
    assert rows[0].member_ids == [1, 4]


def test_ngram_jaccard_exact_pair(docs):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5).collect()
    }
    assert (1, 4) in pairs and pairs[(1, 4)] == 1.0  # identical docs
    assert (1, 2) in pairs and 0.5 < pairs[(1, 2)] < 1.0  # near-dup
    assert not any(3 in p for p in pairs)  # unrelated doc matches nothing


def test_minhash_identical_docs_have_identical_signatures(docs):
    sigs = {r["id"]: r["sig"] for r in minhash_signatures(docs, "doc_id", "text", num_hashes=16).collect()}
    assert all(len(s) == 16 for s in sigs.values())
    assert sigs[1] == sigs[4]
    # near-dup shares most minhashes, unrelated shares few
    near = sum(a == b for a, b in zip(sigs[1], sigs[2]))
    far = sum(a == b for a, b in zip(sigs[1], sigs[3]))
    assert near >= 8 and far <= 4


def test_minhash_near_dup_pipeline(docs):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_near_dup_pairs(
            docs, "doc_id", "text", threshold=0.8, num_hashes=64, bands=16
        ).collect()
    }
    assert (1, 4) in pairs and pairs[(1, 4)] == 1.0
    assert all(j >= 0.8 for j in pairs.values())


def test_minhash_matches_exact_jaccard(docs):
    """LSH-verified pairs == exact pairwise pairs at the same threshold
    (recall sanity on a corpus where every pair is either >0.8 or <0.2)."""
    exact = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.8).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in minhash_near_dup_pairs(docs, "doc_id", "text", threshold=0.8).collect()
    }
    assert lsh == exact


def test_simhash_near_dup(docs):
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_dup_pairs(docs, "doc_id", "text", max_hamming=3).collect()
    }
    assert pairs.get((1, 4)) == 0  # identical -> distance 0
    assert (1, 2) in pairs  # one-word swap stays within 3 bits
    assert not any(3 in p for p in pairs)


def test_gram_frequency_cap(spark):
    """max_doc_freq drops grams shared by too many docs (join-blowup guard)."""
    df = spark.createDataFrame(
        [(i, "common shared gram unique" + str(i) + " tail words here") for i in range(10)],
        "doc_id long, text string",
    )
    capped = ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.01, max_doc_freq=5)
    uncapped = ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.01)
    assert uncapped.count() == 45  # all pairs share 'common shared gram'
    assert capped.count() == 0  # the shared gram exceeds the cap


def test_simhash_md5_variant_matches_semantics(docs):
    """hash_fn='md5' (60-bit, externally-replayable) preserves the simhash
    semantics: identical docs at distance 0, near-dups within the radius."""
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_dup_pairs(
            docs, "doc_id", "text", max_hamming=3, bits=60, hash_fn="md5"
        ).collect()
    }
    assert pairs.get((1, 4)) == 0
    assert not any(3 in p for p in pairs)


def test_simhash_md5_bits_cap(docs):
    import pytest as _pytest

    from soda_spark_spark.operators.dedup import simhash_signatures

    with _pytest.raises(ValueError, match="60 bits"):
        simhash_signatures(docs, "doc_id", "text", bits=64, hash_fn="md5")


def test_connected_components_transitive(spark):
    from soda_spark_spark.operators.dedup import connected_components

    # chain 1-2-3, pair 10-11, isolated pairs form their own components
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "id_a long, id_b long",
    )
    cc = connected_components(pairs)
    comp = {r.id: r.comp for r in cc.collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
                    20: 20, 21: 20, 22: 20, 23: 20}
    cc.unpersist()


def test_near_dup_clusters_pick_min_representative(docs):
    from soda_spark_spark.operators.dedup import near_dup_clusters

    out = near_dup_clusters(docs, "doc_id", "text", num_hashes=32, bands=8)
    rows = {r.doc_id: (r.component, r.is_representative) for r in out.collect()}
    # docs 1 and 4 are identical; 2 is a near-dup of both -> one cluster {1,2,4}
    assert rows[1] == (1, True)
    assert rows[4][0] == 1 and rows[4][1] is False
    assert 3 not in rows  # the unrelated doc joins no cluster


def test_star_cc_matches_label_propagation_on_random_graphs(spark):
    import random

    from soda_spark_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(7)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(80)]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    cc_prop = connected_components(pairs)
    cc_star = connected_components_star(pairs)
    a = {r.id: r.comp for r in cc_prop.collect()}
    b = {r.id: r.comp for r in cc_star.collect()}
    cc_prop.unpersist()
    cc_star.unpersist()
    assert a == b


def test_star_cc_handles_long_chain(spark):
    from soda_spark_spark.operators.dedup import connected_components_star

    # a 300-node path: diameter 300, far beyond label-prop's default rounds;
    # large/small-star needs only O(log n)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(300)], "id_a long, id_b long"
    )
    cc = connected_components_star(pairs)
    comps = {r.comp for r in cc.collect()}
    assert comps == {0}
    assert cc.count() == 301
    cc.unpersist()


def test_label_prop_warns_when_not_converged(spark):
    import pytest as _pytest

    from soda_spark_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a long, id_b long"
    )
    with _pytest.warns(RuntimeWarning, match="did not converge"):
        cc = connected_components(pairs, max_iterations=3, driver_threshold=None)
    cc.unpersist()


def test_near_dedup_keeps_one_representative_per_cluster(docs):
    from soda_spark_spark.operators.dedup import near_dedup

    out = near_dedup(docs, "doc_id", "text", num_hashes=32, bands=8)
    ids = {r.doc_id for r in out.select("doc_id").collect()}
    # docs 1, 2, 4 form one near-dup cluster -> only min id 1 survives;
    # unclustered doc 3 is untouched
    assert 1 in ids and 3 in ids
    assert 2 not in ids and 4 not in ids


def test_dedup_against_fingerprint(spark):
    from soda_spark_spark.operators.dedup import dedup_against

    seen = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, "alpha beta gamma"),      # exact dup of seen doc 1 -> dropped
            (11, "completely fresh text"),  # survives
            (12, "completely fresh text"),  # new-vs-new dup: NOT removed here
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"] for r in dedup_against(new, seen, "doc_id", "text").collect()}
    assert out == {11, 12}


def test_dedup_against_minhash(spark):
    from soda_spark_spark.operators.dedup import dedup_against

    base = " ".join(f"w{i}" for i in range(40))
    near = " ".join(("CHANGED" if i == 17 else f"w{i}") for i in range(40))
    seen = spark.createDataFrame([(1, base)], "doc_id long, text string")
    new = spark.createDataFrame(
        [(10, near), (11, " ".join(f"x{i}" for i in range(40)))],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]
        for r in dedup_against(
            new, seen, "doc_id", "text", method="minhash", threshold=0.7
        ).collect()
    }
    assert out == {11}


def test_dedup_against_unknown_method(spark):
    import pytest as _pytest

    from soda_spark_spark.operators.dedup import dedup_against

    df = spark.createDataFrame([(1, "t")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="unknown method"):
        dedup_against(df, df, "doc_id", "text", method="nope")


def _sketch_corpus(spark, n_docs=30):
    """Corpus with engineered near-dups: doc i and doc i+100 share 39/40
    words for i % 3 == 0 (jaccard well above 0.8), others are disjoint."""
    rows = []
    for i in range(n_docs):
        words = [f"w{i}_{j}" for j in range(40)]
        rows.append((i, " ".join(words)))
        if i % 3 == 0:
            near = list(words)
            near[17] = "CHANGED"
            rows.append((i + 100, " ".join(near)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_band_tags_schema_and_values(spark):
    from soda_spark_spark.operators.dedup import (
        _band_tags, minhash_band_tags, minhash_signatures,
    )

    docs = _sketch_corpus(spark, n_docs=6)
    sketch = minhash_band_tags(docs, "doc_id", "text", num_hashes=32, bands=8)
    assert set(sketch.columns) == {"id", "tags", "grams"}
    # exploded sketch tags == the internal _band_tags rows, value for value
    from_sketch = {
        (r["id"], r["k"]["band"], r["k"]["bh"])
        for r in sketch.select("id", F.explode("tags").alias("k")).collect()
    }
    direct = {
        (r["id"], r["band"], r["bh"])
        for r in _band_tags(
            minhash_signatures(docs, "doc_id", "text", num_hashes=32),
            bands=8, rows_per_band=4,
        ).collect()
    }
    assert from_sketch == direct


def test_dedup_against_sketched_matches_direct(spark, tmp_path):
    from soda_spark_spark.operators.dedup import dedup_against, minhash_band_tags

    docs = _sketch_corpus(spark)
    seen = docs.filter(F.col("doc_id") < 100)
    new = docs.filter(F.col("doc_id") >= 100)

    direct = {
        r["doc_id"]
        for r in dedup_against(
            new, seen, "doc_id", "text", method="minhash"
        ).collect()
    }
    # persist the sketch to parquet and reload — the production shape
    path = str(tmp_path / "sketch")
    minhash_band_tags(seen, "doc_id", "text").write.parquet(path)
    sketched = {
        r["doc_id"]
        for r in dedup_against(
            new, None, "doc_id", "text", method="minhash",
            seen_tags=spark.read.parquet(path),
        ).collect()
    }
    assert sketched == direct
    # and the fixture is non-trivial: every i%3==0 near-dup is dropped
    assert direct == set()


def test_dedup_against_sketched_keeps_fresh_docs(spark, tmp_path):
    from soda_spark_spark.operators.dedup import dedup_against, minhash_band_tags

    seen = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(40)))], "doc_id long, text string"
    )
    near = " ".join(("CHANGED" if i == 17 else f"w{i}") for i in range(40))
    new = spark.createDataFrame(
        [(10, near), (11, " ".join(f"x{i}" for i in range(40)))],
        "doc_id long, text string",
    )
    path = str(tmp_path / "sketch")
    minhash_band_tags(seen, "doc_id", "text").write.parquet(path)
    out = {
        r["doc_id"]
        for r in dedup_against(
            new, None, "doc_id", "text", method="minhash", threshold=0.7,
            seen_tags=spark.read.parquet(path),
        ).collect()
    }
    assert out == {11}


def test_band_tags_gram_storage_variants(spark, tmp_path):
    """hash (default) and text sketches must produce identical survivors,
    and the hashed sketch's grams are the sorted xxhash64 of the text
    sketch's grams."""
    from soda_spark_spark.operators.dedup import dedup_against, minhash_band_tags

    docs = _sketch_corpus(spark)
    seen = docs.filter(F.col("doc_id") < 100)
    new = docs.filter(F.col("doc_id") >= 100)

    p_hash = str(tmp_path / "sk_hash")
    p_text = str(tmp_path / "sk_text")
    minhash_band_tags(seen, "doc_id", "text").write.parquet(p_hash)
    minhash_band_tags(
        seen, "doc_id", "text", gram_storage="text"
    ).write.parquet(p_text)

    sk_h = spark.read.parquet(p_hash)
    sk_t = spark.read.parquet(p_text)
    assert dict(sk_h.dtypes)["grams"] == "array<bigint>"
    assert dict(sk_t.dtypes)["grams"] == "array<string>"
    # hashed grams == sorted xxhash64 of the raw grams, row for row
    rehashed = sk_t.select(
        "id",
        F.array_sort(F.transform("grams", lambda g: F.xxhash64(g))).alias("grams"),
    )
    got = {r["id"]: r["grams"] for r in sk_h.collect()}
    exp = {r["id"]: r["grams"] for r in rehashed.collect()}
    assert got == exp

    out_h = {
        r["doc_id"]
        for r in dedup_against(
            new, None, "doc_id", "text", method="minhash", seen_tags=sk_h
        ).collect()
    }
    out_t = {
        r["doc_id"]
        for r in dedup_against(
            new, None, "doc_id", "text", method="minhash", seen_tags=sk_t
        ).collect()
    }
    assert out_h == out_t

    with pytest.raises(ValueError, match="gram_storage"):
        minhash_band_tags(seen, "doc_id", "text", gram_storage="zstd")
    bad = sk_h.withColumn("grams", F.lit(1.5))
    with pytest.raises(ValueError, match="grams must be array"):
        dedup_against(
            new, None, "doc_id", "text", method="minhash", seen_tags=bad
        )


def test_dedup_against_seen_tags_validation(spark):
    import pytest as _pytest

    from soda_spark_spark.operators.dedup import dedup_against

    df = spark.createDataFrame([(1, "t")], "doc_id long, text string")
    bad = spark.createDataFrame([(1,)], "id long")
    with _pytest.raises(ValueError, match="missing column"):
        dedup_against(df, None, "doc_id", "text", method="minhash", seen_tags=bad)
    with _pytest.raises(ValueError, match="requires method"):
        dedup_against(df, None, "doc_id", "text", seen_tags=bad)
    with _pytest.raises(ValueError, match="seen is required"):
        dedup_against(df, None, "doc_id", "text", method="minhash")


def test_lsh_bucket_stats_counts_cap_drops(spark):
    """The max_bucket_size recall trade is observable: lsh_bucket_stats
    reports how many buckets (and member rows) a cap drops."""
    from soda_spark_spark.operators.dedup import (
        lsh_bucket_stats, lsh_candidate_pairs, minhash_signatures,
    )

    # 5 exact copies -> every band bucket holds all 5 ids
    text = " ".join(f"w{i}" for i in range(30))
    df = spark.createDataFrame(
        [(i, text) for i in range(5)], "doc_id long, text string"
    )
    sigs = minhash_signatures(df, "doc_id", "text", num_hashes=32)

    r = lsh_bucket_stats(sigs, bands=8, rows_per_band=4, max_bucket_size=4).first()
    assert r["pair_buckets"] == 8          # one hot bucket per band
    assert r["max_bucket_len"] == 5
    assert r["capped_buckets"] == 8        # all of them exceed cap=4
    assert r["capped_member_rows"] == 40
    # and the enumerator indeed drops them all under that cap
    assert lsh_candidate_pairs(
        sigs, bands=8, rows_per_band=4, max_bucket_size=4
    ).count() == 0

    r2 = lsh_bucket_stats(sigs, bands=8, rows_per_band=4, max_bucket_size=100).first()
    assert r2["capped_buckets"] == 0 and r2["capped_member_rows"] == 0
    assert lsh_candidate_pairs(
        sigs, bands=8, rows_per_band=4, max_bucket_size=100
    ).count() == 10  # C(5,2)

    # max_bucket_size=None (exact recall): nothing counted as capped
    r3 = lsh_bucket_stats(sigs, bands=8, rows_per_band=4, max_bucket_size=None).first()
    assert r3["capped_buckets"] == 0 and r3["pair_buckets"] == 8


def test_simhash_bucket_stats(spark):
    from soda_spark_spark.operators.dedup import (
        simhash_bucket_stats, simhash_near_dup_pairs,
    )

    text = " ".join(f"w{i}" for i in range(30))
    df = spark.createDataFrame(
        [(i, text) for i in range(6)], "doc_id long, text string"
    )
    r = simhash_bucket_stats(df, "doc_id", "text", max_bucket_size=5).first()
    assert r["capped_buckets"] == 4  # max_hamming=3 -> 4 chunks, all size 6
    assert r["capped_member_rows"] == 24
    assert simhash_near_dup_pairs(
        df, "doc_id", "text", max_bucket_size=5
    ).count() == 0


def test_minhash_band_tags_incremental_append(spark, tmp_path):
    """The production ingestion loop: sketch snapshot A, APPEND snapshot
    B's sketch to the same parquet table, dedup snapshot C against the
    combined history — equals the direct dedup against A union B."""
    from soda_spark_spark.operators.dedup import dedup_against, minhash_band_tags

    snap_a = _sketch_corpus(spark, n_docs=12).filter(F.col("doc_id") < 100)
    snap_b = snap_a.select((F.col("doc_id") + 500).alias("doc_id"), "text")
    path = str(tmp_path / "history_sketch")
    minhash_band_tags(snap_a, "doc_id", "text").write.mode("append").parquet(path)
    minhash_band_tags(snap_b, "doc_id", "text").write.mode("append").parquet(path)

    new = _sketch_corpus(spark, n_docs=12).filter(F.col("doc_id") >= 100)
    sketched = {
        r["doc_id"]
        for r in dedup_against(
            new, None, "doc_id", "text", method="minhash",
            seen_tags=spark.read.parquet(path),
        ).collect()
    }
    direct = {
        r["doc_id"]
        for r in dedup_against(
            new, snap_a.unionByName(snap_b), "doc_id", "text", method="minhash"
        ).collect()
    }
    assert sketched == direct


def test_dedup_lines_removes_cross_doc_boilerplate(spark):
    from soda_spark_spark.operators.dedup import dedup_lines

    banner = "ACCEPT COOKIES TO CONTINUE"
    df = spark.createDataFrame(
        [
            (1, f"{banner}\nunique body one\n\nfooter one"),
            (2, f"{banner}\nunique body two"),
            (3, "standalone doc\nno boilerplate here"),
            (4, banner),            # only the boilerplate -> becomes empty
            (5, None),              # null passes through
            (6, f"{banner}\n{banner}\nsolo text"),  # in-doc repeat still removed
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text"] for r in dedup_lines(df, "doc_id", "text").collect()}
    assert out[1] == "unique body one\n\nfooter one"  # blank line survives
    assert out[2] == "unique body two"
    assert out[3] == "standalone doc\nno boilerplate here"
    assert out[4] == ""
    assert out[5] is None
    assert out[6] == "solo text"


def test_dedup_lines_min_doc_count_and_floor(spark):
    from soda_spark_spark.operators.dedup import dedup_lines

    df = spark.createDataFrame(
        [
            (1, "aa\nxx\nbody1"),
            (2, "aa\nxx\nbody2"),
            (3, "aa\nbody3"),
        ],
        "doc_id long, text string",
    )
    # 'aa' in 3 docs, 'xx' in 2: min_doc_count=3 removes only 'aa'
    out = {
        r["doc_id"]: r["text"]
        for r in dedup_lines(df, "doc_id", "text", min_doc_count=3).collect()
    }
    assert out == {1: "xx\nbody1", 2: "xx\nbody2", 3: "body3"}
    # min_line_chars above len('aa') protects it even at min_doc_count=2
    out2 = {
        r["doc_id"]: r["text"]
        for r in dedup_lines(df, "doc_id", "text", min_line_chars=3).collect()
    }
    assert out2 == {1: "aa\nxx\nbody1", 2: "aa\nxx\nbody2", 3: "aa\nbody3"}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="min_doc_count"):
        dedup_lines(df, "doc_id", "text", min_doc_count=1)


# ---------------------------------------------------------------------------
# exact-substring (duplicate-span) dedup
# ---------------------------------------------------------------------------


def test_duplicate_spans_merges_overlapping_windows(spark):
    from soda_spark_spark.operators.dedup import duplicate_spans

    rows = [
        (1, "alpha beta gamma delta epsilon unique1 tail1"),
        (2, "head2 alpha beta gamma delta epsilon tail2 x"),
        (3, "totally different words here indeed"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicate_spans(df, "doc_id", "text", window=3).collect()
    )
    # shared 5-token run -> 3-token windows at 0..2 (doc1) / 1..3 (doc2)
    # merge into ONE maximal span per doc
    assert spans == [(1, 0, 4), (2, 1, 5)]


def test_dedup_spans_rewrites_and_normalizes(spark):
    from soda_spark_spark.operators.dedup import dedup_spans

    rows = [
        (1, "alpha beta gamma delta epsilon unique1 tail1"),
        (2, "head2  alpha beta\tgamma delta epsilon tail2 x"),
        (3, "totally different words here indeed"),
        (4, None),
        (5, "short"),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r.text
        for r in dedup_spans(df, "doc_id", "text", window=3).collect()
    }
    assert out[1] == "unique1 tail1"
    # doc 2's mixed whitespace tokenizes identically -> same span removed,
    # output whitespace-normalized
    assert out[2] == "head2 tail2 x"
    assert out[3] == "totally different words here indeed"
    assert out[4] is None
    assert out[5] == "short"
    assert out[6] == ""


def test_dedup_spans_scope_any_catches_within_doc_repeats(spark):
    from soda_spark_spark.operators.dedup import dedup_spans, duplicate_spans

    rows = [(1, "a b c x y z a b c q r s")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # cross_doc scope: one doc only -> nothing duplicated
    assert duplicate_spans(df, "doc_id", "text", window=3).count() == 0
    out = dedup_spans(df, "doc_id", "text", window=3, scope="any").collect()
    # 'a b c' repeats within the doc -> BOTH occurrences removed
    assert out[0].text == "x y z q r s"


def test_dedup_spans_hash_fns_agree(spark):
    from soda_spark_spark.operators.dedup import dedup_spans

    rows = [
        (i, f"common run of exactly ten tokens here for doc pad{i % 3} "
            f"unique{i} trailer{i}")
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    outs = []
    for fn in ("text", "md5", "xxhash64"):
        outs.append(
            sorted(
                (r.doc_id, r.text)
                for r in dedup_spans(
                    df, "doc_id", "text", window=4, hash_fn=fn
                ).collect()
            )
        )
    assert outs[0] == outs[1] == outs[2]


def test_dedup_keep_best_selects_by_score(spark):
    from soda_spark_spark.operators.dedup import dedup_keep_best

    docs = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 99), (3, "c", 99), (4, "d", 5), (5, "e", 7)],
        "doc_id long, text string, score long",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4)], "doc_id long, component long"
    )
    out = dedup_keep_best(docs, clusters, "doc_id", "score")
    got = {r.doc_id: r.component for r in out.collect()}
    # cluster 1: top score 99 tie between ids 2,3 -> lowest id 2 wins
    # cluster 4: singleton cluster keeps its only member
    # id 5: unclustered -> passes through with NULL component
    assert got == {2: 1, 4: 4, 5: None}
    asc = dedup_keep_best(docs, clusters, "doc_id", "score", ascending=True)
    assert {r.doc_id for r in asc.collect()} == {1, 4, 5}


def test_dedup_spans_keep_one_preserves_canonical_copy(spark):
    from soda_spark_spark.operators.dedup import dedup_spans, duplicate_spans

    d = spark.createDataFrame([
        (1, "a b c d e f one"),
        (2, "x a b c d e f two"),
        (3, "y z a b c d e f three"),
    ], "doc_id long, text string")
    spans = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicate_spans(d, "doc_id", "text", window=3, keep="one").collect()
    )
    # doc 1 holds the canonical (lowest id, pos) occurrences -> exempt
    assert spans == [(2, 1, 6), (3, 2, 7)]
    kept = {r.doc_id: r.text for r in
            dedup_spans(d, "doc_id", "text", window=3, keep="one").collect()}
    assert kept == {1: "a b c d e f one", 2: "x two", 3: "y z three"}


def test_dedup_lines_paragraph_granularity(spark):
    from soda_spark_spark.operators.dedup import dedup_lines

    banner = "SHARED BANNER\nPARA SECOND LINE"
    rows = [
        (1, banner + "\n\nunique one\nbody line\n\ntail one"),
        (2, banner + "\n\n\nunique two"),
        (3, "standalone doc\n\nno shared paragraphs"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.text
        for r in dedup_lines(
            df, "doc_id", "text", granularity="paragraph"
        ).collect()
    }
    # the multi-line banner paragraph (shared by docs 1,2) is removed as a
    # UNIT; intra-paragraph newlines elsewhere survive byte-exact
    assert got[1] == "unique one\nbody line\n\ntail one"
    assert got[2] == "unique two"
    assert got[3] == "standalone doc\n\nno shared paragraphs"
    # line granularity would instead remove the two banner lines separately
    lg = {r.doc_id: r.text for r in dedup_lines(df, "doc_id", "text").collect()}
    assert "SHARED BANNER" not in lg[1] and "PARA SECOND LINE" not in lg[1]


def test_novelty_scores_against_sketch(spark):
    from soda_spark_spark.operators.dedup import minhash_band_tags, novelty_scores

    seen = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "one two three four five six")],
        "doc_id long, text string",
    )
    tags = minhash_band_tags(seen, "doc_id", "text")
    new = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta"),   # exact copy -> 0
         (11, "wholly fresh words never seen anywhere"),  # -> 1
         # 4 tokens: grams 'one two three','two three four','three four NEW'
         (12, "one two three four NEW")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in
           novelty_scores(new, tags, "doc_id", "text", n=3).collect()}
    assert got[10].novelty == 0.0 and got[10].unseen_grams == 0
    assert got[11].novelty == 1.0
    assert got[12].n_grams == 3 and got[12].unseen_grams == 1
    assert got[12].novelty == pytest.approx(1 / 3)
    # text-storage sketches produce identical scores
    tags_text = minhash_band_tags(seen, "doc_id", "text", gram_storage="text")
    alt = {r.doc_id: (r.n_grams, r.unseen_grams) for r in
           novelty_scores(new, tags_text, "doc_id", "text", n=3).collect()}
    assert alt == {k: (v.n_grams, v.unseen_grams) for k, v in got.items()}


def test_dedup_spans_against_history(spark, tmp_path):
    from soda_spark_spark.operators.dedup import (
        dedup_spans_against,
        window_hash_sketch,
    )

    seen = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, "intro quick brown fox jumps outro bits"),  # 4-run overlap
            (11, "wholly new content nothing shared here"),
            (12, "quick brown fox jumps over the lazy dog extra"),
        ],
        "doc_id long, text string",
    )
    direct = {
        r.doc_id: r.text
        for r in dedup_spans_against(
            new, seen, "doc_id", "text", window=3
        ).collect()
    }
    assert direct[10] == "intro outro bits"
    assert direct[11] == "wholly new content nothing shared here"
    assert direct[12] == "extra"
    # persisted-sketch path is identical and never touches seen text
    p = str(tmp_path / "wsketch")
    window_hash_sketch(seen, "doc_id", "text", window=3).write.parquet(p)
    sk = spark.read.parquet(p)
    sketched = {
        r.doc_id: r.text
        for r in dedup_spans_against(
            new, None, "doc_id", "text", window=3, seen_hashes=sk
        ).collect()
    }
    assert sketched == direct
    # within-new duplication is NOT removed by the cross-corpus pass
    dup_new = spark.createDataFrame(
        [(20, "aa bb cc xx"), (21, "aa bb cc yy")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r.text
        for r in dedup_spans_against(
            dup_new, seen, "doc_id", "text", window=3
        ).collect()
    }
    assert out == {20: "aa bb cc xx", 21: "aa bb cc yy"}


def test_dedup_lines_against_history(spark, tmp_path):
    from soda_spark_spark.operators.dedup import (
        dedup_lines_against,
        line_hash_sketch,
    )

    seen = spark.createDataFrame(
        [(1, "COOKIE BANNER\nold body line\n\nfooter text")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, "COOKIE BANNER\nfresh body\n\nfooter text"),
            (11, "all new\nlines here"),
            (12, None),
        ],
        "doc_id long, text string",
    )
    direct = {
        r.doc_id: r.text
        for r in dedup_lines_against(new, seen, "doc_id", "text").collect()
    }
    # history lines removed; the empty separator line survives (below
    # the min_line_chars floor it is never counted nor removed)
    assert direct[10] == "fresh body\n"
    assert direct[11] == "all new\nlines here"
    assert direct[12] is None
    p = str(tmp_path / "lsketch")
    line_hash_sketch(seen, "doc_id", "text").write.parquet(p)
    sk = spark.read.parquet(p)
    sketched = {
        r.doc_id: r.text
        for r in dedup_lines_against(
            new, None, "doc_id", "text", seen_hashes=sk
        ).collect()
    }
    assert sketched == direct


def test_dedup_lines_against_paragraph_granularity(spark):
    from soda_spark_spark.operators.dedup import dedup_lines_against

    seen = spark.createDataFrame(
        [(1, "SHARED BANNER\nSECOND LINE\n\nhistory body")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(10, "SHARED BANNER\nSECOND LINE\n\nnew body\nstays intact")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.text
        for r in dedup_lines_against(
            new, seen, "doc_id", "text", granularity="paragraph"
        ).collect()
    }
    # the multi-line banner PARAGRAPH is removed as a unit; intra-
    # paragraph newlines in the surviving body are preserved
    assert out[10] == "new body\nstays intact"


def test_containment_pairs_asymmetric(spark):
    """A verbatim excerpt is ~fully contained in its source while the
    symmetric Jaccard stays low — the signal this operator adds."""
    from soda_spark_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    body = " ".join(f"w{i}" for i in range(60))
    quote = " ".join(f"w{i}" for i in range(10))  # first 10 tokens
    df = spark.createDataFrame(
        [(1, body), (2, quote), (3, "totally different text entirely here")],
        "doc_id long, text string",
    )
    rows = {(r.id, r.container_id): r for r in containment_pairs(
        df, "doc_id", "text", n=3, threshold_ppm=500_000).collect()}
    assert (2, 1) in rows
    got = rows[(2, 1)]
    assert got.containment_ppm == 1_000_000  # all 8 trigram shingles hit
    assert got.n_grams == 8 and got.inter_grams == 8
    assert (1, 2) not in rows  # body is NOT contained in the quote
    jac = ngram_jaccard_pairs(df, "doc_id", "text", n=3,
                              threshold=0.5).collect()
    assert not any({r.id_a, r.id_b} == {1, 2} for r in jac)  # Jaccard misses it
    import pytest as _pt
    with _pt.raises(ValueError, match="threshold_ppm"):
        containment_pairs(df, "doc_id", "text", threshold_ppm=0)


def test_dedup_contained_keeps_container(spark):
    from soda_spark_spark.operators.dedup import dedup_contained

    body = " ".join(f"w{i}" for i in range(60))
    quote = " ".join(f"w{i}" for i in range(12))
    other = "completely separate content with its own words here now"
    df = spark.createDataFrame(
        [(1, body), (2, quote), (3, other), (4, body)],  # 4 == 1 verbatim
        "doc_id long, text string",
    )
    kept = {r.doc_id for r in dedup_contained(
        df, "doc_id", "text", threshold_ppm=900_000).collect()}
    # quote dropped (contained in bigger 1/4); of the identical pair the
    # LOWEST id survives; unrelated doc untouched
    assert kept == {1, 3}


def test_curate_containment_dedup_step(spark):
    from soda_spark_spark.pipeline import curate

    body = " ".join(f"w{i}" for i in range(60))
    quote = " ".join(f"w{i}" for i in range(12))
    df = spark.createDataFrame(
        [(1, body), (2, quote)], "doc_id long, text string")
    out, _ = curate(df, [{"kind": "containment_dedup",
                          "threshold_ppm": 900_000}])
    assert {r.doc_id for r in out.collect()} == {1}


def test_dedup_lines_sentence_granularity(spark):
    from soda_spark_spark.operators.dedup import dedup_lines

    docs = spark.createDataFrame(
        [
            (1, "Unique alpha text. Subscribe to our newsletter! More body."),
            (2, "Different beta words? Subscribe to our newsletter! A tail."),
            (3, "Solo document. Nothing shared at all."),
            (4, None),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    out = dedup_lines(docs, "doc_id", "text", granularity="sentence")
    got = {r.doc_id: r.text for r in out.collect()}
    # the mid-paragraph boilerplate SENTENCE is stripped — invisible to
    # line or paragraph identity — and survivors rejoin with spaces
    assert got[1] == "Unique alpha text. More body."
    assert got[2] == "Different beta words? A tail."
    assert got[3] == "Solo document. Nothing shared at all."
    assert got[4] is None and got[5] == ""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="granularity"):
        dedup_lines(docs, "doc_id", "text", granularity="word")
