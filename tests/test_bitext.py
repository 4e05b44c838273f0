"""Margin-based bitext mining (`similarity.margin_scores` /
`similarity.bitext_mine`) — pinned against an independent Python
reference implementing the same quantize -> rank -> integer-division
semantics."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from soda_spark_spark.operators.similarity import bitext_mine, margin_scores


def _vecs(n, dim, salt):
    # deterministic LCG floats in [-1, 1)
    out = []
    state = salt
    for i in range(n):
        v = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            v.append((state >> 11) / float(1 << 53) * 2.0 - 1.0)
        out.append((i, v))
    return out


def _cos_ppm(a, b):
    dot = 0.0
    for x, y in zip(a, b):
        dot += x * y
    na = 0.0
    nb = 0.0
    for x in a:
        na += x * x
    for y in b:
        nb += y * y
    return math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 1_000_000)


def _ref_margins(src, tgt, k):
    scored = []
    for sid, sv in src:
        for tid, tv in tgt:
            c = _cos_ppm(sv, tv)
            if c >= 0:
                scored.append((sid, tid, c))
    sden = {}
    tden = {}
    for sid, _ in src:
        mine = sorted(
            [t for t in scored if t[0] == sid], key=lambda t: (-t[2], t[1])
        )[:k]
        if mine:
            sden[sid] = (sum(t[2] for t in mine), len(mine))
    for tid, _ in tgt:
        mine = sorted(
            [t for t in scored if t[1] == tid], key=lambda t: (-t[2], t[0])
        )[:k]
        if mine:
            tden[tid] = (sum(t[2] for t in mine), len(mine))
    out = {}
    for sid, tid, c in scored:
        sd, sm = sden[sid]
        td, tm = tden[tid]
        den = sd * tm + td * sm
        margin = (2 * c * sm * tm * 1_000_000) // den if den > 0 else None
        out[(sid, tid)] = (c, margin)
    return out


def _ref_forward(src, tgt, k, thr):
    margins = _ref_margins(src, tgt, k)
    best = {}
    for (sid, tid), (c, m) in margins.items():
        if m is None:
            continue
        cur = best.get(sid)
        if cur is None or (-m, tid) < (-cur[1], cur[0]):
            best[sid] = (tid, m, c)
    return {
        (sid, tid): (c, m)
        for sid, (tid, m, c) in best.items()
        if m >= thr
    }


@pytest.fixture(scope="module")
def sides(spark):
    src = _vecs(12, 6, salt=99)
    tgt = _vecs(10, 6, salt=1234)
    sdf = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in src],
        "vec_id long, embedding array<double>",
    )
    tdf = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in tgt],
        "vec_id long, embedding array<double>",
    )
    return src, tgt, sdf, tdf


def test_margin_scores_match_reference(spark, sides):
    src, tgt, sdf, tdf = sides
    got = {
        (r.src_id, r.tgt_id): (r.cos_ppm, r.margin_ppm)
        for r in margin_scores(sdf, tdf, k=3).collect()
    }
    assert got == _ref_margins(src, tgt, 3)


def test_forward_mining_matches_reference(spark, sides):
    src, tgt, sdf, tdf = sides
    got = {
        (r.src_id, r.tgt_id): (r.cos_ppm, r.margin_ppm)
        for r in bitext_mine(sdf, tdf, k=3, threshold_ppm=1_000_000).collect()
    }
    assert got == _ref_forward(src, tgt, 3, 1_000_000)


def test_mutual_subset_of_forward(spark, sides):
    _, _, sdf, tdf = sides
    fwd = {
        (r.src_id, r.tgt_id)
        for r in bitext_mine(sdf, tdf, k=3, threshold_ppm=1_000_000).collect()
    }
    mut = {
        (r.src_id, r.tgt_id)
        for r in bitext_mine(
            sdf, tdf, k=3, threshold_ppm=1_000_000, strategy="mutual"
        ).collect()
    }
    assert mut <= fwd


def test_candidates_restrict_scoring(spark, sides):
    src, tgt, sdf, tdf = sides
    cand = spark.createDataFrame(
        [(s, t) for s in range(12) for t in range(10) if (s + t) % 2 == 0],
        "src_id long, tgt_id long",
    )
    got = margin_scores(sdf, tdf, k=3, candidates=cand).collect()
    assert got and all((r.src_id + r.tgt_id) % 2 == 0 for r in got)


def test_margin_beats_cosine_on_hub(spark):
    # tgt 0 is a HUB: moderately close to every src; tgt 1 is the true
    # match of src 0. Raw cosine prefers the hub; the margin, which
    # divides by the hub's high neighborhood average, prefers the match.
    srcs = [
        (0, [1.0, 0.0, 0.3]),
        (1, [0.0, 1.0, 0.3]),
        (2, [0.7, -0.7, 0.3]),
        (3, [-0.7, 0.7, 0.3]),
    ]
    tgts = [(0, [0.05, 0.05, 1.0]), (1, [0.95, 0.05, 0.33])]
    sdf = spark.createDataFrame(srcs, "vec_id long, embedding array<double>")
    tdf = spark.createDataFrame(tgts, "vec_id long, embedding array<double>")
    m = {
        (r.src_id, r.tgt_id): (r.cos_ppm, r.margin_ppm)
        for r in margin_scores(sdf, tdf, k=2).collect()
    }
    # margin separates: src0's margin to its true match exceeds its
    # margin to the hub
    assert m[(0, 1)][1] > m[(0, 0)][1]


def test_negative_cosines_dropped(spark):
    sdf = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    tdf = spark.createDataFrame(
        [(1, [-1.0, 0.0]), (2, [1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    got = margin_scores(sdf, tdf, k=2).collect()
    assert [(r.src_id, r.tgt_id) for r in got] == [(0, 2)]


def test_validation_and_guard(spark, sides):
    _, _, sdf, tdf = sides
    with pytest.raises(ValueError, match="k must be"):
        margin_scores(sdf, tdf, k=0)
    with pytest.raises(ValueError, match="strategy"):
        bitext_mine(sdf, tdf, strategy="both")
    with pytest.raises(ValueError, match="max_query_rows"):
        margin_scores(sdf, tdf, k=2, max_broadcast_rows=3)


def test_knn_join_numpy_impl_parity(spark):
    from pyspark.sql import functions as F

    from soda_spark_spark.operators.similarity import knn_join_lsh

    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in _vecs(80, 16, salt=5)],
        "vec_id long, embedding array<double>",
    )
    src = emb.filter(F.col("vec_id") % 2 == 0)
    tgt = emb.filter(F.col("vec_id") % 2 == 1)
    cat = {(r.query_id, r.neighbor_id) for r in
           knn_join_lsh(tgt, src, dim=16, k=4, planes=6, tables=4).collect()}
    npy = {(r.query_id, r.neighbor_id) for r in
           knn_join_lsh(tgt, src, dim=16, k=4, planes=6, tables=4,
                        impl="numpy").collect()}
    # identical geometry; summation order differs only AT the sign
    # boundary — on this fixture the result sets coincide exactly
    assert cat == npy and len(cat) > 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="impl"):
        knn_join_lsh(tgt, src, dim=16, impl="fast")
