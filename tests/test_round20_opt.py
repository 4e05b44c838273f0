"""Round-20 optimization regression tests.

Pins the behavior of internals restructured for performance this round:
`stats._order_statistics` (the batched multi-rank order-statistic
refinement that replaced per-rank probe loops) must agree exactly with
the sorted ground truth — and with the single-rank wrapper — across
refinement depths, tie patterns, duplicate ranks, and degenerate
ranges; the catalyst `semantic_dedup` meta/full argmin split keeps its
plan shape and kernel parity; and the bulk-scan rewrites of the RTF
and PDF text kernels preserve their byte-wise decode laws.
"""

import math
import random

import pytest

from soda_spark_spark.operators.stats import (
    _order_statistic,
    _order_statistics,
)


def _ground_truth(vals, ranks):
    s = sorted(vals)
    return [s[r - 1] for r in ranks]


def test_multi_rank_matches_sorted(spark):
    rng = random.Random(20)
    vals = [rng.uniform(-1000, 1000) for _ in range(5000)]
    # heavy ties: a quarter of the values collapse onto 10 points
    for i in range(0, 5000, 4):
        vals[i] = float(i % 10)
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    ranks = [1, 2, 500, 1250, 2500, 3750, 4999, 5000]
    got = _order_statistics(df, "x", ranks, min(vals), max(vals))
    assert got == _ground_truth(vals, ranks)


def test_multi_rank_deep_refinement_matches_single(spark):
    """Tiny exact_rows forces several shared refinement levels; the
    batched path must produce bit-identical values to refining each
    rank alone (the equivalence the docstring claims)."""
    rng = random.Random(7)
    vals = [rng.gauss(0, 1) for _ in range(4000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    lo, hi = min(vals), max(vals)
    ranks = [1, 100, 1000, 2000, 3000, 3999]
    batched = _order_statistics(
        df, "x", ranks, lo, hi, n_buckets=8, exact_rows=16, max_refine=4
    )
    single = [
        _order_statistic(
            df, "x", r, lo, hi, n_buckets=8, exact_rows=16, max_refine=4
        )
        for r in ranks
    ]
    assert batched == single == _ground_truth(vals, ranks)


def test_multi_rank_duplicate_and_adjacent_ranks(spark):
    vals = [float(i % 97) for i in range(2000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    ranks = [500, 500, 501, 1999, 2000, 2000]
    got = _order_statistics(df, "x", ranks, 0.0, 96.0)
    assert got == _ground_truth(vals, ranks)


def test_multi_rank_degenerate_range(spark):
    df = spark.createDataFrame([(5.0,)] * 64, "x double")
    assert _order_statistics(df, "x", [1, 32, 64], 5.0, 5.0) == [
        5.0,
        5.0,
        5.0,
    ]


def test_multi_rank_fraction_ranks_match_exact_quantiles_convention(spark):
    """The exact_quantiles rank convention (ceil(q*N), ties land low)
    rides the batched path unchanged."""
    vals = [float(v) for v in range(1, 101)] * 3  # 300 rows, ties of 3
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    n = len(vals)
    fr = [0.0, 0.25, 0.5, 0.75, 1.0]
    ranks = [max(1, math.ceil(q * n)) for q in fr]
    got = _order_statistics(df, "x", ranks, 1.0, 100.0)
    assert got == _ground_truth(vals, ranks)


def test_multi_rank_rank_out_of_range_raises(spark):
    df = spark.createDataFrame([(1.0,), (2.0,)], "x double")
    with pytest.raises(ValueError, match="exceeds rows"):
        _order_statistics(df, "x", [1, 5], 1.0, 2.0)


def test_semantic_dedup_catalyst_literal_argmin_plan_shape(spark):
    """The catalyst `semantic_dedup` assignment is a map-side literal-array
    argmin (round 21): centroids are a bounded collect folded into ONE
    `transform` lambda + `array_min`, so the plan has NO window argmin,
    NO nested-loop centroid join, and the embedding payload crosses only
    the pair stage's cluster_id exchange."""
    from soda_spark_spark.operators.similarity import semantic_dedup

    df = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 5), 1.0]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    out = semantic_dedup(df, n_clusters=4, threshold=0.9, impl="catalyst")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # assignment needs no window at all (old shape: ranked-window argmin)
    assert "windowspecdefinition" not in plan
    # the literal-array argmin is inlined (presence, not count — robust
    # to engine-version plan-printing changes)
    assert "array_min" in plan
    # no centroid cross/nested-loop join survives anywhere
    assert "Nested" not in plan and "Cross" not in plan
    # results unchanged vs the kernel reference path
    kern = semantic_dedup(df, n_clusters=4, threshold=0.9, impl="kernel")
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, kern.collect())
    )


def test_dedup_against_candidate_only_verification(spark):
    """`dedup_against` verification shingles only docs that survived the
    band join: candidates are aggregated per new-doc id (collect_set of
    seen ids) before the text join, and the per-doc gram projection sits
    above it, exploded per matched pair. Pins the round-20 restructure:
    a new doc colliding with MANY near-identical history docs is dropped
    exactly once; a colliding-but-below-threshold doc survives the exact
    Jaccard verify; and the plan carries the candidate aggregation."""
    from pyspark.sql import functions as F  # noqa: F401

    from soda_spark_spark.operators.dedup import dedup_against

    base = [f"w{i}" for i in range(40)]
    mid = list(base)
    for j in (10, 20, 30):  # 3 scattered edits: gram jaccard ~0.6 < 0.8
        mid[j] = f"EDIT{j}"
    seen = spark.createDataFrame(
        [
            (1, " ".join(base)),
            (2, " ".join(["X0"] + base[1:])),       # near-dup of doc 1
            (3, " ".join(base[:-1] + ["X39"])),     # near-dup of doc 1
            (4, " ".join(f"z{i}" for i in range(40))),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, " ".join(["Y0"] + base[1:])),  # collides with 1,2,3 -> dropped once
            (11, " ".join(mid)),                # LSH-collides, verify fails -> kept
            (12, " ".join(f"q{i}" for i in range(40))),  # fresh -> kept
        ],
        "doc_id long, text string",
    )
    out = dedup_against(new, seen, "doc_id", "text", method="minhash")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "collect_set" in plan  # per-nid candidate aggregation shape
    assert {r["doc_id"] for r in out.collect()} == {11, 12}


def test_rtf_bulk_text_run_equivalence():
    """The bulk plain-ASCII run scan in rtf_to_text must behave exactly
    like the byte-wise loop it replaces: pending \\uN fallback skips
    consume from the front of a run, CR/LF never consume skips, skipped
    groups drop whole runs, and high bytes still decode through the
    scoped codepage."""
    from soda_spark_spark.operators.office_text import rtf_to_text

    # \u with uc=2 swallows the first TWO fallback chars of the run
    assert rtf_to_text(b"{\\rtf1\\uc2\\u9731??snowman}") == "☃snowman"
    # CR/LF inside the fallback region do not count as fallback chars
    assert rtf_to_text(b"{\\rtf1\\uc2\\u9731\r\n??rest}") == "☃rest"
    # pending skip longer than the first run spills into the next one
    assert rtf_to_text(b"{\\rtf1\\uc3\\u9731?\r\n??tail}") == "☃tail"
    # a skipped destination group drops its whole text run
    assert rtf_to_text(b"{\\rtf1{\\*\\gen Microsoft}visible}") == "visible"
    # codepage escapes and high raw bytes still decode per scope
    assert rtf_to_text(b"{\\rtf1{\\ansicpg1251\\'e0}Z}") == "аZ"
    # plain run split by control word keeps both halves
    assert rtf_to_text(b"{\\rtf1left\\tab right}") == "left\tright"


def test_pdf_unescape_and_decode_bulk_equivalence():
    """The bulk span-copy in _pdf_unescape and the translate-table
    _decode_codes must preserve PDF 7.3.4.2 semantics exactly."""
    from soda_spark_spark.operators.pdf_text import (
        _decode_codes,
        _pdf_unescape,
    )

    # escapes: named, octal (1-3 digits, overflow wraps), continuation
    assert _pdf_unescape(rb"a\nb\tc") == b"a\nb\tc"
    assert _pdf_unescape(rb"\101\40\7x") == b"A \x07x"
    assert _pdf_unescape(rb"\400") == b"\x00"  # 0o400 & 0xFF
    assert _pdf_unescape(b"a\\\r\nb\\\rc\\\nd") == b"abcd"
    assert _pdf_unescape(rb"\q") == b"q"  # unknown: char stands
    assert _pdf_unescape(b"trailing\\") == b"trailing"
    assert _pdf_unescape(b"no escapes") == b"no escapes"
    # decode: printable + latin-1 kept, CR/LF -> \n, rest -> U+FFFD
    assert _decode_codes(b"Az\xa0\xff") == "Az\xa0\xff"
    assert _decode_codes(b"a\rb\nc\x01\x7f\x9f") == "a\nb\nc���"


def test_avro_compiled_field_decoders_match_interpreted():
    """_compile_field must agree with _decode_field on values, final
    positions, AND error messages for every hot scalar kind, both
    union orders, and garbage/truncated payloads."""
    import json
    import os
    import random
    import tempfile

    from soda_spark_spark.sources.avro_ocf import (
        _compile_field,
        _decode_field,
        _parse_schema,
        _zigzag_decode,
        parse_avro_header,
        write_avro,
    )

    rnd = random.Random(3)
    for kind in ["long", "int", "string", "double", "boolean", "bytes"]:
        schema = json.dumps(
            {"type": "record", "name": "R",
             "fields": [{"name": "x", "type": ["null", kind]}]}
        )
        vals = []
        for _ in range(60):
            if rnd.random() < 0.3:
                v = None
            elif kind in ("long", "int"):
                v = rnd.randint(-(2**31) + 1, 2**31 - 2)
            elif kind == "string":
                v = "".join(rnd.choice("aé☃ b\n") for _ in range(8))
            elif kind == "double":
                v = round(rnd.uniform(-1e6, 1e6), 3)
            elif kind == "boolean":
                v = rnd.random() < 0.5
            else:
                v = bytes(rnd.randrange(256) for _ in range(8))
            vals.append({"x": v})
        p = os.path.join(tempfile.mkdtemp(), "f.avro")
        write_avro(vals, schema, p)
        data = open(p, "rb").read()
        sj, codec, sync, pos = parse_avro_header(data)
        d = _parse_schema(sj)[0][1]
        dec = _compile_field(d)
        n, pos = _zigzag_decode(data, pos)
        size, pos = _zigzag_decode(data, pos)
        payload = data[pos : pos + size]
        r1 = r2 = 0
        for _ in range(n):
            v1, r1 = _decode_field(payload, r1, d)
            v2, r2 = dec(payload, r2)
            assert v1 == v2 and r1 == r2
        # error parity on garbage
        for _ in range(300):
            junk = bytes(rnd.randrange(256) for _ in range(rnd.randint(0, 6)))
            try:
                a, ea = _decode_field(junk, 0, d), None
            except Exception as ex:
                a, ea = None, str(ex)
            try:
                b, eb = dec(junk, 0), None
            except Exception as ex:
                b, eb = None, str(ex)
            assert a == b and ea == eb


def test_retention_single_pass_no_joins(spark):
    """Round-20 `_retention_core` restructure: the cohort week rides a
    min() window and the cohort size is the report's own offset-0 row,
    so the plan contains NO joins and the distinct activity set is
    derived once. Values must match the hand-computed cohort report."""
    import datetime as dt

    from soda_spark_spark.operators.joins import retention_cohorts

    D = lambda d, h=0: dt.datetime(2026, 1, d, h)  # noqa: E731
    rows = [
        (1, D(5)), (1, D(12)), (1, D(26)),
        (2, D(6)), (2, D(13)),
        (3, D(14)),
        (1, D(5, 23)),
        (None, D(5)), (4, None),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = retention_cohorts(ev)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan
    # exactly two windows: per-user cohort min + per-cohort size pull
    assert plan.count("windowspecdefinition") == 2
    got = {
        (str(r.cohort_week), r.week_offset): (r.users, r.retention_ppm)
        for r in out.collect()
    }
    assert got == {
        ("2026-01-05", 0): (2, 1_000_000),
        ("2026-01-05", 1): (2, 1_000_000),
        ("2026-01-05", 3): (1, 500_000),
        ("2026-01-12", 0): (1, 1_000_000),
    }


def test_token_corpus_stats_single_explode(spark):
    """Round-20 `token_corpus_stats` restructure: one corpus explode
    feeding a pair-grain join (corpus frequency aggregates FROM the
    per-doc tf table), not two explodes and an occurrence-grain join.
    Values must match the brute-force Python computation exactly."""
    from soda_spark_spark.operators.text import token_corpus_stats

    docs = [
        (1, "A a b the the the"),
        (2, "b c RARE"),
        (3, "  "),
        (4, None),
        (5, "the unique"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = token_corpus_stats(df, "doc_id", "text")
    rows = out.collect()
    # Both consumers of the per-doc tf table (the join side and the
    # corpus-frequency aggregate) hang off the SAME (id, token) exchange,
    # so the executed plan carries a ReusedExchange and the corpus is
    # exploded once. The old two-explode shape (occurrence-grain join)
    # had no reusable exchange: its executed plan showed zero.
    ex = out._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in ex
    # brute force
    from collections import Counter

    corpus = Counter(
        w
        for _, t in docs
        if t and t.strip()
        for w in t.lower().split()
    )
    got = {r.doc_id: r for r in rows}
    assert set(got) == {1, 2, 5}
    for did, text in ((1, docs[0][1]), (2, docs[1][1]), (5, docs[4][1])):
        toks = text.lower().split()
        r = got[did]
        assert r.n_tokens == len(toks)
        assert r.n_distinct_tokens == len(set(toks))
        assert r.avg_token_corpus_freq == pytest.approx(
            sum(corpus[w] for w in toks) / len(toks), abs=1e-12
        )
        assert r.rare_token_fraction == pytest.approx(
            sum(1 for w in toks if corpus[w] <= 1) / len(toks), abs=1e-12
        )


def test_winnowing_overlap_sizes_ride_melt(spark):
    """Round-20 `winnowing_overlap_pairs` restructure: per-doc sketch
    sizes travel on the melted (id, fp) rows and collapse via min() in
    the pair aggregate — the plan's only join is the fp self-join, with
    no post-aggregate size attachments. Values (including the
    max_fp_freq-capped branch, where sizes count SURVIVING fingerprints)
    must be unchanged."""
    from soda_spark_spark.operators.text import (
        winnowing_fingerprints,
        winnowing_overlap_pairs,
    )

    base = " ".join(f"tok{i}" for i in range(30))
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base + " extra tail here"),
            (3, " ".join(f"other{i}" for i in range(30))),
        ],
        "doc_id long, text string",
    )
    out = winnowing_overlap_pairs(df, "doc_id", "text", min_shared=1)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Join") == 1
    pairs = {(r.id_a, r.id_b): (r.shared, r.overlap) for r in out.collect()}
    assert (1, 2) in pairs and (1, 3) not in pairs and (2, 3) not in pairs
    # brute-force replay: shared is the multiset join count, overlap
    # divides by the MIN raw sketch size of the pair
    from collections import Counter

    fps = {
        r.doc_id: list(r.fingerprints)
        for r in winnowing_fingerprints(df, "doc_id", "text").collect()
    }

    def joined_count(xa, xb):
        ca, cb = Counter(xa), Counter(xb)
        return sum(ca[f] * cb[f] for f in ca.keys() & cb.keys())

    sh, ov = pairs[(1, 2)]
    assert sh == joined_count(fps[1], fps[2]) >= 1
    assert ov == pytest.approx(sh / min(len(fps[1]), len(fps[2])), abs=1e-12)
    # capped branch: per-doc sizes must count SURVIVING fp rows only
    capped = winnowing_overlap_pairs(
        df, "doc_id", "text", min_shared=1, max_fp_freq=2
    )
    cpairs = {
        (r.id_a, r.id_b): (r.shared, r.overlap) for r in capped.collect()
    }
    freq = Counter(f for v in fps.values() for f in set(v))
    surv = {d: [f for f in v if freq[f] <= 2] for d, v in fps.items()}
    exp = {}
    for a_, b_ in ((1, 2), (1, 3), (2, 3)):
        s_ = joined_count(surv[a_], surv[b_])
        if s_ >= 1:
            exp[(a_, b_)] = (s_, s_ / min(len(surv[a_]), len(surv[b_])))
    assert set(cpairs) == set(exp)
    for k, (s_, o_) in exp.items():
        assert cpairs[k][0] == s_
        assert cpairs[k][1] == pytest.approx(o_, abs=1e-12)


def test_gram_pair_sizes_ride_melt(spark):
    """Round-20 `ngram_jaccard_pairs` / `containment_pairs` /
    `dedup_contained` restructure: per-doc gram-set sizes ride the
    melted (id, gram) rows and collapse via min() in the pair aggregate,
    and dedup_contained reads the container's size straight off the
    (internal) pair columns instead of re-shingling the corpus. Plans
    carry only the fp self-join (plus dedup_contained's anti-join);
    values replay the brute-force Python computation exactly, capped
    and uncapped."""
    from collections import Counter

    from soda_spark_spark.operators.dedup import (
        containment_pairs,
        dedup_contained,
        ngram_jaccard_pairs,
        word_shingles,  # noqa: F401 (documents the gram source)
    )

    texts = {
        1: "a b c d e f g h",
        2: "a b c d e f g X",      # near-dup of 1
        3: "a b c d",              # contained in 1
        4: "p q r s t u v w",      # unrelated
        5: "a b c d",              # identical to 3 (tie: lower id wins)
    }
    df = spark.createDataFrame(
        sorted(texts.items()), "doc_id long, text string"
    )

    def shingles(t, n=3):
        toks = t.split()
        return set(
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        )

    # --- jaccard: plan has exactly the one self-join
    jp = ngram_jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.0)
    assert jp._jdf.queryExecution().optimizedPlan().toString().count("Join") == 1
    got = {(r.id_a, r.id_b): r.jaccard for r in jp.collect()}
    for (ia, ib), jac in got.items():
        sa, sb = shingles(texts[ia]), shingles(texts[ib])
        assert jac == len(sa & sb) / len(sa | sb)
    assert (1, 2) in got and (1, 3) in got and (3, 5) in got

    # --- jaccard with a doc-freq cap: sizes count SURVIVING grams
    jc = ngram_jaccard_pairs(
        df, "doc_id", "text", n=3, threshold=0.0, max_doc_freq=2
    )
    freq = Counter(g for t in texts.values() for g in shingles(t))
    surv = {d: {g for g in shingles(t) if freq[g] <= 2}
            for d, t in texts.items()}
    exp = {}
    for ia in texts:
        for ib in texts:
            if ia < ib and surv[ia] & surv[ib]:
                exp[(ia, ib)] = len(surv[ia] & surv[ib]) / len(
                    surv[ia] | surv[ib]
                )
    capped = {(r.id_a, r.id_b): r.jaccard for r in jc.collect()}
    assert capped == exp

    # --- containment: directional rows, exact ppm, one self-join
    cp = containment_pairs(df, "doc_id", "text", n=3, threshold_ppm=1)
    plan = cp._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Join") == 2  # the self-join, once per union leg
    crows = {(r.id, r.container_id): (r.n_grams, r.inter_grams,
                                      r.containment_ppm)
             for r in cp.collect()}
    import math
    for (i, c), (ng, ig, ppm) in crows.items():
        si, sc = shingles(texts[i]), shingles(texts[c])
        assert ng == len(si) and ig == len(si & sc)
        assert ppm == math.floor(1e6 * (ig / ng))
    assert crows[(3, 1)][2] == 1_000_000  # 3 fully contained in 1

    # --- dedup_contained: container size from the pair rows; tie rule
    kept = {r.doc_id for r in
            dedup_contained(df, "doc_id", "text", n=3,
                            threshold_ppm=900_000).collect()}
    # 3 and 5 are identical (mutual containment, equal sizes): lowest id
    # (3) survives; both are contained in 1, which has more grams, so
    # actually BOTH drop in favor of container 1.
    assert 1 in kept and 4 in kept
    assert 3 not in kept and 5 not in kept


def test_minhash_batch_verify_shingles_candidates_only(spark):
    """Round-20 `minhash_near_dup_pairs` restructure (the dedup_against
    #16 pattern on the batch path): exact-Jaccard verification joins raw
    text to the per-doc candidate-pair set and shingles ABOVE the join —
    the word-shingle HOF never runs over the unmatched corpus bulk, and
    a doc colliding with many others is shingled once (the pair list is
    collect_list-aggregated per doc before the text join). Pair set and
    jaccard values are unchanged."""
    from soda_spark_spark.operators.dedup import minhash_near_dup_pairs

    base = [f"w{i}" for i in range(40)]
    rows = [(1, " ".join(base)),
            (2, " ".join(["X0"] + base[1:])),
            (3, " ".join(base[:-1] + ["X39"])),
            (4, " ".join(f"z{i}" for i in range(40)))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = minhash_near_dup_pairs(df, "doc_id", "text", threshold=0.5)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # the per-doc candidate aggregation sits below the text join
    assert "collect_list(__p" in plan
    got = {(r.id_a, r.id_b): r.jaccard for r in out.collect()}
    assert set(got) == {(1, 2), (1, 3), (2, 3)}

    def sh(t, n=3):
        toks = t.split()
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    texts = dict(rows)
    for (a, b), j in got.items():
        sa, sb = sh(texts[a]), sh(texts[b])
        assert j == len(sa & sb) / len(sa | sb)


def test_sparse_cosine_norms_ride_melt(spark):
    """Round-20 `sparse_cosine_pairs` restructure: per-doc squared norms
    ride the melted (id, tok, tf) rows as a window sum and collapse via
    min() in the pair aggregate — no post-aggregate norm joins on the
    pair-grain result. Cosines must replay the exact
    BIGINT-dot / (sqrt * sqrt) law bit-for-bit."""
    import math

    from collections import Counter

    from soda_spark_spark.operators.similarity import sparse_cosine_pairs

    texts = {
        1: "a a b c",
        2: "a b b d",
        3: "x y z",
        4: "a a b c",   # identical to 1 -> cosine 1.0
    }
    df = spark.createDataFrame(sorted(texts.items()),
                               "doc_id long, text string")
    out = sparse_cosine_pairs(df, "doc_id", "text", min_cosine=0.0,
                              max_df=None)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Join") == 1  # only the tok self-join remains
    got = {(r.id_a, r.id_b): r.cosine for r in out.collect()}

    def cosine(ta, tb):
        ca, cb = Counter(ta.split()), Counter(tb.split())
        dot = sum(ca[t] * cb[t] for t in ca.keys() & cb.keys())
        na = sum(v * v for v in ca.values())
        nb = sum(v * v for v in cb.values())
        return float(dot) / (math.sqrt(float(na)) * math.sqrt(float(nb)))

    for (a, b), c in got.items():
        assert c == cosine(texts[a], texts[b])
    # identical docs: exactly the replayed dot/(sqrt*sqrt) value (which
    # is 1.0000000000000002 here — sqrt(6)^2 != 6 in IEEE doubles, and
    # the engine must NOT "helpfully" round it)
    assert got[(1, 4)] == cosine(texts[1], texts[4]) == pytest.approx(1.0)
    assert (1, 3) not in got  # no shared tokens -> no pair row
