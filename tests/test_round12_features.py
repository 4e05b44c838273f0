"""Round-12 feature tests: the `link_prior` curate() step (crawl-graph
centrality as a pre-content quality gate) and the `cache_scores`
pass-through on the `perplexity_tier` step."""
from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from soda_spark_spark.pipeline import curate


def _docs(spark):
    return spark.createDataFrame(
        [(i, f"doc number {i} with some text tokens") for i in range(20)],
        "doc_id long, text string",
    )


def _edges(spark):
    # docs 1..9 all link to doc 0 (a hub); docs 10..19 are OUT of the
    # graph entirely (no link evidence either way)
    return spark.createDataFrame(
        [(i, 0) for i in range(1, 10)], "src long, dst long"
    )


def test_link_prior_keeps_missing_by_default(spark):
    docs, edges = _docs(spark), _edges(spark)
    out, _ = curate(
        docs,
        [{"kind": "link_prior", "edges": edges,
          "min_rank_ppt": 100_000_000_000, "n_iter": 3}],
    )
    ids = {r.doc_id for r in out.select("doc_id").collect()}
    # hub 0 ranks high and survives; spokes 1..9 rank low and drop;
    # 10..19 are absent from the graph and survive (no link evidence)
    assert 0 in ids
    assert ids.isdisjoint(set(range(1, 10)))
    assert set(range(10, 20)) <= ids


def test_link_prior_keep_missing_false_drops_unranked(spark):
    docs, edges = _docs(spark), _edges(spark)
    out, _ = curate(
        docs,
        [{"kind": "link_prior", "edges": edges,
          "min_rank_ppt": 100_000_000_000, "n_iter": 3,
          "keep_missing": False}],
    )
    ids = {r.doc_id for r in out.select("doc_id").collect()}
    assert ids == {0}


def test_link_prior_kwargs_pass_through_to_pagerank(spark):
    docs, edges = _docs(spark), _edges(spark)
    # a bogus pagerank kwarg must surface, not be swallowed
    with pytest.raises(TypeError):
        curate(
            docs,
            [{"kind": "link_prior", "edges": edges, "min_rank_ppt": 1,
              "bogus_kwarg": 1}],
        )


def test_curate_checkpoint_every_identical_results(spark):
    """checkpoint_every bounds the doubling-per-gate plan growth on
    deep pipelines (each keep-set gate references the running frame
    twice); results must be bit-identical to the lazy chain."""
    docs = spark.createDataFrame(
        [(i, f"some sufficiently long document text number {i} "
             f"with several words " * 2) for i in range(40)],
        "doc_id long, text string",
    )
    steps = [{"kind": "quality_filter", "min_score": 0.0}] * 6 + [
        {"kind": "length_filter", "min_chars": 10},
        {"kind": "fingerprint_dedup"},
    ]
    lazy, _ = curate(docs, [dict(s) for s in steps])
    ck, rep = curate(docs, [dict(s) for s in steps], checkpoint_every=3,
                     report=True)
    a = sorted((r.doc_id, r.text) for r in lazy.collect())
    b = sorted((r.doc_id, r.text) for r in ck.collect())
    assert a == b and len(a) == 40
    assert len(rep) == len(steps)  # report still counts every step


def test_pagerank_superstep_checkpointing_linear_and_exact(spark):
    """The r12 Pregel fix: each iteration references the prior ranks
    twice, so the fully lazy chain is O(2^n_iter) in both execution
    and Catalyst analysis (n_iter=6 did not finish in 8 minutes on the
    fixture graph). With default cache_iterations=True each superstep
    is eagerly localCheckpoint'ed — n_iter=16 must now finish inside
    the test budget, bit-identical to the lazy reference chain, with
    the static edge/degree/node caches released on return."""
    from soda_spark_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(i, (i * 3 + 1) % 40) for i in range(1, 120) if i % 4 != 0]
        + [(i, i % 7) for i in range(1, 120, 2)],
        "src long, dst long",
    )
    jsc = spark.sparkContext._jsc.sc()
    # other tests in the shared session may hold their own caches —
    # assert the DELTA of persisted (non-checkpoint) RDDs, not totals
    n_before = jsc.getPersistentRDDs().size()
    deep = pagerank(edges, n_iter=16)
    total = deep.agg(F.sum("rank_ppt")).collect()[0][0]
    assert 0 < total <= 1_000_000_000_000
    a = sorted((r.node, r.rank_ppt)
               for r in pagerank(edges, n_iter=4).collect())
    b = sorted((r.node, r.rank_ppt)
               for r in pagerank(edges, n_iter=4,
                                 cache_iterations=False).collect())
    assert a == b  # superstep checkpoints change nothing but cost
    # the loop's static e/nodes/deg persists are released on return;
    # what remains is Spark-managed localCheckpoint storage, bounded
    # by the checkpoints of the three calls above (<= 24), reclaimed
    # asynchronously by the ContextCleaner — assert bounded, not zero
    n_after = jsc.getPersistentRDDs().size()
    assert n_after - n_before <= 24


@pytest.fixture(scope="module")
def lm_model(spark):
    from soda_spark_spark.operators.lm import ngram_lm

    docs = spark.createDataFrame(
        [(i, "the quick brown fox " * (1 + i % 3)) for i in range(30)],
        "doc_id long, text string",
    )
    return ngram_lm(docs, "doc_id", "text", n=2)


def _tier_docs(spark):
    return spark.createDataFrame(
        [(i, "the quick brown fox " * (1 + i % 3)) for i in range(30)]
        + [(100 + i, "zz qq xx vv " * 2) for i in range(6)],
        "doc_id long, text string",
    )


def test_perplexity_tier_cache_through_materialization(spark, lm_model):
    docs = _tier_docs(spark)
    out, _ = curate(
        docs,
        [{"kind": "perplexity_tier", "model": lm_model, "keep": ["head"],
          "cache_scores": "through_materialization"}],
    )
    caches = getattr(out, "_perplexity_score_caches", None)
    assert caches and len(caches) == 1
    # the score frame is still persisted when curate returns — the
    # caller owns the release
    assert caches[0].storageLevel.useMemory or caches[0].storageLevel.useDisk
    out.count()  # materialize against the live cache
    for c in caches:
        c.unpersist()
    assert not (
        caches[0].storageLevel.useMemory or caches[0].storageLevel.useDisk
    )


def test_perplexity_tier_default_has_no_cache_handle(spark, lm_model):
    docs = _tier_docs(spark)
    out, _ = curate(
        docs,
        [{"kind": "perplexity_tier", "model": lm_model, "keep": ["head"]}],
    )
    assert getattr(out, "_perplexity_score_caches", None) is None
    out.count()


def test_perplexity_tier_cache_scores_validated(spark, lm_model):
    docs = _tier_docs(spark)
    with pytest.raises(ValueError, match="cache_scores"):
        curate(
            docs,
            [{"kind": "perplexity_tier", "model": lm_model,
              "cache_scores": "bogus"}],
        )


def test_perplexity_gate_batch_writer(spark, lm_model, tmp_path):
    """The CCNet perplexity gate as a stream writer: in-domain docs
    (modeled by the LM) clear the cut, out-of-domain docs don't, and
    the decision rides pure BIGINT arithmetic per batch."""
    from soda_spark_spark.streaming.scan_stream import (
        perplexity_gate_batch_writer,
    )

    docs = spark.createDataFrame(
        [(i, "the quick brown fox " * 4) for i in range(5)]
        + [(100 + i, "zz qq xx vv ww yy " * 3) for i in range(5)],
        "doc_id long, text string",
    )
    out = str(tmp_path / "sink")
    # tiny 4-word vocab: Laplace gives OOV grams ~1/V = 250k ppm and
    # in-domain grams ~900k+ ppm — the cut sits between
    writer = perplexity_gate_batch_writer(
        lm_model, "doc_id", "text", out, min_avg_score_ppm=500_000, n=2
    )
    # two batches with the same cut — batch boundaries can't move it
    writer(docs.filter(F.col("doc_id") < 100), 0)
    writer(docs.filter(F.col("doc_id") >= 100), 1)
    kept = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert kept == set(range(5))  # in-domain only


def test_perplexity_gate_writer_validates_smoothing(spark, lm_model,
                                                    tmp_path):
    from soda_spark_spark.streaming.scan_stream import (
        perplexity_gate_batch_writer,
    )

    with pytest.raises(ValueError, match="smoothing"):
        perplexity_gate_batch_writer(
            lm_model, "doc_id", "text", str(tmp_path),
            min_avg_score_ppm=1, smoothing="bogus")
    with pytest.raises(ValueError, match="n=2"):
        perplexity_gate_batch_writer(
            lm_model, "doc_id", "text", str(tmp_path),
            min_avg_score_ppm=1, smoothing="kn", n=3)


def test_perplexity_tier_smoothing_kn_passes_through(spark, lm_model):
    docs = _tier_docs(spark)
    out, _ = curate(
        docs,
        [{"kind": "perplexity_tier", "model": lm_model,
          "keep": ["head", "middle"], "smoothing": "kn"}],
    )
    assert out.count() > 0
