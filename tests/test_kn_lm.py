"""Interpolated Kneser-Ney scoring: float-channel parity with an
independent plain-Python implementation, ppm-channel determinism, OOV
behavior, and the shared-artifact contract with ngram_lm."""

import collections
import math

import pytest
from pyspark.sql import functions as F

from soda_spark_spark.operators.lm import kn_lm_score, ngram_lm

DOCS = [
    (1, "san francisco is in california"),
    (2, "new york is in new york state"),
    (3, "san francisco and new york and chicago"),
    (4, "the california coast is near san francisco"),
    (5, "chicago is windy and new york is big"),
]
HELD = [(10, "san francisco is windy"), (11, "totally unseen tokens here")]


def _py_kn(train_texts, score_texts, d=0.75):
    """Independent interpolated-KN bigram scorer (the docstring formula,
    written from the Chen & Goodman definition, not from the Spark
    code)."""
    big = collections.Counter()
    for t in train_texts:
        w = t.split()
        for a, b in zip(w, w[1:]):
            big[(a, b)] += 1
    cu = collections.Counter()
    n1u = collections.Counter()
    n1w = collections.Counter()
    for (a, b), c in big.items():
        cu[a] += c
        n1u[a] += 1
        n1w[b] += 1
    ndd = len(big)
    v = len({b for _, b in big}) + 1
    dv = ndd + v
    out = {}
    for i, t in score_texts:
        w = t.split()
        logs = []
        ppms = []
        oov = 0
        for a, b in zip(w, w[1:]):
            if n1w.get(b) is None:
                oov += 1
            cont = (n1w.get(b, 0) + 1) / dv
            if cu.get(a, 0) > 0:
                p = (max(big.get((a, b), 0) - d, 0)
                     + d * n1u[a] * cont) / cu[a]
            else:
                p = cont
            logs.append(math.log(p))
            ppms.append(p)
        out[i] = (len(logs), oov, sum(logs) / len(logs))
    return out


@pytest.fixture(scope="module")
def model(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    return ngram_lm(docs, "doc_id", "text", n=2).persist()


def test_kn_matches_independent_reference(spark, model):
    allrows = DOCS + HELD
    df = spark.createDataFrame(allrows, "doc_id long, text string")
    got = {r.doc_id: r for r in kn_lm_score(
        df, model, "doc_id", "text").collect()}
    want = _py_kn([t for _, t in DOCS], allrows)
    for i, (n, oov, avg_lp) in want.items():
        assert got[i].n_grams == n
        assert got[i].oov_grams == oov
        assert abs(got[i].avg_logprob - avg_lp) < 1e-9, i
        assert abs(got[i].perplexity - math.exp(-avg_lp)) < 1e-6


def test_kn_probabilities_sum_below_one(spark, model):
    """Sanity: for a seen prefix, summing p(w|u) over the model
    vocabulary stays <= 1 (a smoothing-correctness canary)."""
    rows = model.filter(F.col("word").isNotNull()).collect()
    vocab = sorted({r.word for r in rows})
    probe = spark.createDataFrame(
        [(j, f"is {w}") for j, w in enumerate(vocab)],
        "doc_id long, text string",
    )
    out = kn_lm_score(probe, model, "doc_id", "text").collect()
    total = sum(math.exp(r.avg_logprob) for r in out)  # 1 gram per doc
    assert total <= 1.0 + 1e-9


def test_kn_ppm_channel_deterministic(spark, model):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = sorted((r.doc_id, r.sum_score_ppm) for r in kn_lm_score(
        df, model, "doc_id", "text").collect())
    b = sorted((r.doc_id, r.sum_score_ppm) for r in kn_lm_score(
        df, model, "doc_id", "text", broadcast_model=False).collect())
    assert a == b  # join strategy cannot change the certified channel


def test_kn_validation(spark, model):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError, match="discount"):
        kn_lm_score(df, model, "doc_id", "text", discount=1.5)


def test_kn_sharper_than_laplace_on_zipf_text(spark):
    """The reason KN exists: on Zipf-ish text with a 'Francisco'-shaped
    word (frequent, single context), held-out perplexity under KN beats
    Laplace."""
    from soda_spark_spark.operators.lm import ngram_lm_score

    train = [(i, "going to san francisco " * 3 + "the cat sat on the mat")
             for i in range(6)]
    train += [(10, "the dog sat on a rug"), (11, "a cat ate the fish")]
    held = [(100, "the fish sat on the rug")]
    tdf = spark.createDataFrame(train, "doc_id long, text string")
    hdf = spark.createDataFrame(held, "doc_id long, text string")
    m = ngram_lm(tdf, "doc_id", "text", n=2)
    kn = kn_lm_score(hdf, m, "doc_id", "text").first().perplexity
    lap = ngram_lm_score(hdf, m, "doc_id", "text", n=2).first().perplexity
    assert kn < lap, (kn, lap)


def test_perplexity_buckets_kn_smoothing(spark, model):
    from soda_spark_spark.operators.lm import perplexity_buckets

    docs = spark.createDataFrame(DOCS + HELD, "doc_id long, text string")
    out = perplexity_buckets(
        docs, model, "doc_id", "text", n=2, smoothing="kn")
    rows = out.collect()
    avgs = sorted(r.avg_score_ppm for r in rows)
    n = len(avgs)
    cut_lo = avgs[-(-n // 3) - 1]
    cut_mid = avgs[-(-2 * n // 3) - 1]
    for r in rows:
        want = ("tail" if r.avg_score_ppm <= cut_lo
                else "middle" if r.avg_score_ppm <= cut_mid else "head")
        assert r.bucket == want
    kn_scores = {r.doc_id: r.avg_score_ppm for r in rows}
    direct = {r.doc_id: r.avg_score_ppm for r in kn_lm_score(
        docs, model, "doc_id", "text").collect()}
    assert kn_scores == direct  # the kn channel really drives the tiers
    out._cached_scores.unpersist()
    with pytest.raises(ValueError, match="smoothing"):
        perplexity_buckets(docs, model, "doc_id", "text",
                           smoothing="bogus")
    with pytest.raises(ValueError, match="n=2"):
        perplexity_buckets(docs, model, "doc_id", "text", n=3,
                           smoothing="kn")
