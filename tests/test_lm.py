"""Tests for n-gram LM scoring and DSIR importance weighting.

Parity strategy: the float channels (avg_logprob, log_weight) are pinned
against a pure-Python reference implementation; the exact-ppm channels are
additionally covered by the DuckDB oracle in `__spark_entry__.oracle_sql`.
"""

from __future__ import annotations

import hashlib
import math

import pytest

from soda_spark_spark.operators import lm


DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the log"),
    (3, "a cat and a dog"),
    (4, "completely novel tokens here"),
    (5, "the the the the"),
    (6, ""),
    (7, "   "),
    (8, "single"),
    (9, "\tthe cat\n"),  # \t\n borders: trim strips only spaces — the
    # empty-token filter (array_remove) must drop the phantom '' fields
]


def _py_grams(text: str, n: int) -> list[tuple[str, str]]:
    # str.split() drops empty fields — the behavior the Spark side now
    # matches via array_remove(split(...), '')
    toks = text.strip().lower().split()
    out = []
    for i in range(len(toks) - n + 1):
        out.append((" ".join(toks[i : i + n - 1]), toks[i + n - 1]))
    return out


def _data_rows(model_rows):
    """Model rows minus the (NULL, NULL, V) metadata row."""
    return [r for r in model_rows if r["word"] is not None]


def _py_model(rows, n):
    counts: dict[tuple[str, str], int] = {}
    for _id, text in rows:
        for g in _py_grams(text, n):
            counts[g] = counts.get(g, 0) + 1
    return counts


class TestNgramLM:
    def test_model_counts_match_python(self, spark):
        df = spark.createDataFrame(DOCS, ["doc_id", "text"])
        model = lm.ngram_lm(df, "doc_id", "text", n=2)
        rows = model.collect()
        got = {(r["prefix"], r["word"]): r["c"] for r in _data_rows(rows)}
        exp = _py_model(DOCS, 2)
        assert got == exp
        meta = [r for r in rows if r["word"] is None]
        assert len(meta) == 1 and meta[0]["prefix"] is None
        assert meta[0]["c"] == len({w for (_, w) in exp})

    def test_with_meta_false_bare_table(self, spark):
        df = spark.createDataFrame(DOCS, ["doc_id", "text"])
        model = lm.ngram_lm(df, "doc_id", "text", n=2, with_meta=False)
        rows = model.collect()
        assert all(r["word"] is not None for r in rows)
        # meta-less model + no vocab_size -> raise_error at execution
        with pytest.raises(Exception, match="vocab"):
            lm.ngram_lm_score(df, model, "doc_id", "text", n=2).collect()
        # explicit vocab_size works on the bare table
        V = len({w for (_, w) in _py_model(DOCS, 2)})
        out = lm.ngram_lm_score(
            df, model, "doc_id", "text", n=2, vocab_size=V
        ).collect()
        assert len(out) > 0

    def test_score_is_lazy_no_eager_job(self, spark, monkeypatch):
        """Plan construction must trigger ZERO Spark actions (the old
        implementation ran model.distinct().count() per call)."""
        from pyspark.sql import DataFrame as SparkDF

        df = spark.createDataFrame(DOCS, ["doc_id", "text"])
        model = lm.ngram_lm(df, "doc_id", "text", n=2)

        def _boom(*a, **k):
            raise AssertionError("eager action during plan construction")

        for action in ("collect", "count", "take", "head", "toPandas"):
            monkeypatch.setattr(SparkDF, action, _boom)
        out = lm.ngram_lm_score(df, model, "doc_id", "text", n=2)
        monkeypatch.undo()
        assert len(out.collect()) > 0

    def test_whitespace_border_docs(self, spark):
        """\\t/\\n-bordered text must not produce phantom ''-token grams."""
        df = spark.createDataFrame(
            [(1, "\tthe cat\n"), (2, "\n\nthe cat sat\t \t")],
            ["doc_id", "text"],
        )
        model = lm.ngram_lm(df, "doc_id", "text", n=2)
        grams = {(r["prefix"], r["word"]) for r in _data_rows(model.collect())}
        assert grams == {("the", "cat"), ("cat", "sat")}
        uni = lm.ngram_lm(df, "doc_id", "text", n=1)
        words = {r["word"] for r in _data_rows(uni.collect())}
        assert "" not in words and words == {"the", "cat", "sat"}

    def test_score_matches_python_reference(self, spark):
        n = 2
        df = spark.createDataFrame(DOCS, ["doc_id", "text"])
        model_rows = _py_model(DOCS, n)
        vocab = {w for (_, w) in model_rows}
        prefix_tot: dict[str, int] = {}
        for (p, _w), c in model_rows.items():
            prefix_tot[p] = prefix_tot.get(p, 0) + c
        V = len(vocab)

        model = lm.ngram_lm(df, "doc_id", "text", n=n)
        out = lm.ngram_lm_score(df, model, "doc_id", "text", n=n).collect()
        # docs 6/7 (empty -> zero tokens) and 8 (one token) have no
        # bigrams, so they produce no score row; 9 has one
        assert {r["doc_id"] for r in out} == {1, 2, 3, 4, 5, 9}
        for r in out:
            grams = _py_grams(dict(DOCS)[r["doc_id"]], n)
            assert r["n_grams"] == len(grams)
            exp_sum_ppm = 0
            exp_logp = 0.0
            exp_oov = 0
            for g in grams:
                c = model_rows.get(g, 0)
                pc = prefix_tot.get(g[0], 0)
                if g not in model_rows:
                    exp_oov += 1
                p_num = float(c + 1)
                p_den = float(pc + V)
                exp_sum_ppm += math.floor(1e6 * p_num / p_den)
                exp_logp += math.log(p_num / p_den)
            assert r["oov_grams"] == exp_oov
            assert r["sum_score_ppm"] == exp_sum_ppm
            assert r["avg_logprob"] == pytest.approx(exp_logp / len(grams), rel=1e-12)
            assert r["perplexity"] == pytest.approx(
                math.exp(-exp_logp / len(grams)), rel=1e-12
            )

    def test_unseen_docs_score_low(self, spark):
        train = spark.createDataFrame(DOCS[:3], ["doc_id", "text"])
        model = lm.ngram_lm(train, "doc_id", "text", n=2)
        test = spark.createDataFrame(
            [(10, "the cat sat on the mat"), (11, "zzz qqq vvv www")],
            ["doc_id", "text"],
        )
        out = {r["doc_id"]: r for r in
               lm.ngram_lm_score(test, model, "doc_id", "text", n=2).collect()}
        assert out[10]["avg_logprob"] > out[11]["avg_logprob"]
        assert out[11]["oov_grams"] == out[11]["n_grams"]

    def test_min_count_prunes(self, spark):
        df = spark.createDataFrame(DOCS, ["doc_id", "text"])
        model = lm.ngram_lm(df, "doc_id", "text", n=2, min_count=2)
        data = _data_rows(model.collect())
        assert all(r["c"] >= 2 for r in data)
        # meta V reflects the POST-pruning vocabulary
        meta = [r for r in model.collect() if r["word"] is None]
        assert meta[0]["c"] == len({r["word"] for r in data})

    def test_unigram_model(self, spark):
        df = spark.createDataFrame(DOCS, ["doc_id", "text"])
        model = lm.ngram_lm(df, "doc_id", "text", n=1)
        rows = _data_rows(model.collect())
        assert all(r["prefix"] == "" for r in rows)
        got = {r["word"]: r["c"] for r in rows}
        assert got["the"] == 9  # doc 9 adds one 'the'
        assert "" not in got  # empty-token filter


class TestNgramLMMerge:
    def test_merge_equals_train_on_union(self, spark):
        a = spark.createDataFrame(DOCS[:4], ["doc_id", "text"])
        b = spark.createDataFrame(DOCS[4:], ["doc_id", "text"])
        union = spark.createDataFrame(DOCS, ["doc_id", "text"])
        merged = lm.ngram_lm_merge(
            lm.ngram_lm(a, "doc_id", "text", n=2),
            lm.ngram_lm(b, "doc_id", "text", n=2),
        )
        full = lm.ngram_lm(union, "doc_id", "text", n=2)
        key = lambda r: (r["prefix"], r["word"])  # noqa: E731
        got = {key(r): r["c"] for r in merged.collect()}
        want = {key(r): r["c"] for r in full.collect()}
        assert got == want  # incl. the rebuilt (None, None, V) meta row

    def test_merged_model_scores_and_persists(self, spark, tmp_path):
        a = spark.createDataFrame(DOCS[:4], ["doc_id", "text"])
        b = spark.createDataFrame(DOCS[4:], ["doc_id", "text"])
        p1, p2 = str(tmp_path / "m1"), str(tmp_path / "m2")
        lm.ngram_lm(a, "doc_id", "text", n=2).write.parquet(p1)
        lm.ngram_lm(b, "doc_id", "text", n=2).write.parquet(p2)
        merged = lm.ngram_lm_merge(
            spark.read.parquet(p1), spark.read.parquet(p2)
        )
        docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
        got = lm.ngram_lm_score(docs, merged, "doc_id", "text", n=2)
        want = lm.ngram_lm_score(
            docs, lm.ngram_lm(docs, "doc_id", "text", n=2),
            "doc_id", "text", n=2,
        )
        k = lambda r: r["doc_id"]  # noqa: E731
        assert sorted(
            (r["doc_id"], r["sum_score_ppm"]) for r in got.collect()
        ) == sorted((r["doc_id"], r["sum_score_ppm"]) for r in want.collect())

    def test_merge_validation(self, spark):
        with pytest.raises(ValueError, match="at least one"):
            lm.ngram_lm_merge()


def _py_bucket(gram: str, seed: int, buckets: int) -> int:
    h = hashlib.md5(f"{gram}|{seed}".encode()).hexdigest()
    return int(h[:15], 16) % buckets


class TestDSIR:
    def test_hashed_counts_match_python(self, spark):
        df = spark.createDataFrame(DOCS, ["doc_id", "text"])
        got = {
            r["bucket"]: r["c"]
            for r in lm.hashed_ngram_counts(
                df, "doc_id", "text", n=2, buckets=64, seed=7
            ).collect()
        }
        exp: dict[int, int] = {}
        for _id, text in DOCS:
            for p, w in _py_grams(text, 2):
                g = f"{p} {w}"
                b = _py_bucket(g, 7, 64)
                exp[b] = exp.get(b, 0) + 1
        assert got == exp

    def test_importance_weights_match_python(self, spark):
        raw_docs = DOCS
        target_docs = [(100, "the cat sat on the mat"), (101, "a cat and a dog")]
        B, seed, n = 64, 7, 2
        raw = spark.createDataFrame(raw_docs, ["doc_id", "text"])
        tgt = spark.createDataFrame(target_docs, ["doc_id", "text"])
        rc = lm.hashed_ngram_counts(raw, "doc_id", "text", n=n, buckets=B, seed=seed)
        tc = lm.hashed_ngram_counts(tgt, "doc_id", "text", n=n, buckets=B, seed=seed)
        out = {
            r["doc_id"]: r
            for r in lm.importance_weights(
                raw, rc, tc, "doc_id", "text", n=n, buckets=B, seed=seed
            ).collect()
        }

        def dist(docs):
            d: dict[int, int] = {}
            for _id, text in docs:
                for p, w in _py_grams(text, n):
                    b = _py_bucket(f"{p} {w}", seed, B)
                    d[b] = d.get(b, 0) + 1
            return d

        dr, dt = dist(raw_docs), dist(target_docs)
        nr, nt = sum(dr.values()), sum(dt.values())
        for doc_id, text in raw_docs:
            grams = _py_grams(text, n)
            if not grams:
                assert doc_id not in out
                continue
            exp_ppm = 0
            exp_logw = 0.0
            for p, w in grams:
                b = _py_bucket(f"{p} {w}", seed, B)
                num = float(dt.get(b, 0) + 1) * float(nr + B)
                den = float(dr.get(b, 0) + 1) * float(nt + B)
                exp_ppm += math.floor(1e6 * (num / den))
                exp_logw += math.log(num / den)
            r = out[doc_id]
            assert r["n_grams"] == len(grams)
            assert r["sum_ratio_ppm"] == exp_ppm
            assert r["log_weight"] == pytest.approx(exp_logw, rel=1e-12)

    def test_target_like_docs_rank_higher(self, spark):
        raw = spark.createDataFrame(DOCS, ["doc_id", "text"])
        tgt = spark.createDataFrame(
            [(100, "the cat sat on the mat the cat sat")], ["doc_id", "text"]
        )
        rc = lm.hashed_ngram_counts(raw, "doc_id", "text", buckets=256)
        tc = lm.hashed_ngram_counts(tgt, "doc_id", "text", buckets=256)
        w = {
            r["doc_id"]: r["log_weight"]
            for r in lm.importance_weights(
                raw, rc, tc, "doc_id", "text", buckets=256
            ).collect()
        }
        # doc 1 is the target text; doc 4 shares nothing with it
        assert w[1] > w[4]

    def test_importance_sample_threshold(self, spark):
        raw = spark.createDataFrame(DOCS, ["doc_id", "text"])
        tgt = spark.createDataFrame([(100, "the cat sat on the mat")], ["doc_id", "text"])
        rc = lm.hashed_ngram_counts(raw, "doc_id", "text", buckets=256)
        tc = lm.hashed_ngram_counts(tgt, "doc_id", "text", buckets=256)
        w = lm.importance_weights(raw, rc, tc, "doc_id", "text", buckets=256)
        cut = int(
            sorted(r["avg_ratio_ppm"] for r in w.collect())[len(DOCS) // 2]
        )
        kept = lm.importance_sample(raw, w, "doc_id", min_avg_ratio_ppm=cut)
        kept_ids = {r["doc_id"] for r in kept.collect()}
        exp = {
            r["doc_id"] for r in w.collect() if r["avg_ratio_ppm"] >= cut
        }
        assert kept_ids == exp
        # gram-less docs (6/7 empty, 8 single-token: no bigram) are
        # dropped by default...
        assert {6, 7, 8}.isdisjoint(kept_ids)
        # ...and retained with keep_unscored=True, on top of the same set
        kept_u = lm.importance_sample(
            raw, w, "doc_id", min_avg_ratio_ppm=cut, keep_unscored=True
        )
        assert {r["doc_id"] for r in kept_u.collect()} == exp | {6, 7, 8}


class TestQualityClassifier:
    LABELED = [
        (1, "the quick brown fox jumps over the lazy dog", True),
        (2, "a quick brown cat naps near the warm dog", True),
        (3, "the lazy brown dog sleeps by the quick fox", True),
        (4, "buy cheap pills now click here win prizes", False),
        (5, "click now cheap prizes win here buy buy", False),
        (6, "", True),
    ]

    def _train(self, spark, B=64, seed=7, n=1):
        df = spark.createDataFrame(self.LABELED, ["doc_id", "text", "good"])
        return df, lm.quality_classifier_train(
            df, "doc_id", "text", "good", n=n, buckets=B, seed=seed
        )

    def test_model_table_shape_and_counts(self, spark):
        B, seed = 64, 7
        _, model = self._train(spark, B, seed)
        rows = {r["bucket"]: (r["pos_c"], r["neg_c"]) for r in model.collect()}
        pos_exp: dict[int, int] = {}
        neg_exp: dict[int, int] = {}
        for _id, text, good in self.LABELED:
            for _p, w in _py_grams(text, 1):
                b = _py_bucket(w, seed, B)
                d = pos_exp if good else neg_exp
                d[b] = d.get(b, 0) + 1
        for b in set(pos_exp) | set(neg_exp):
            assert rows[b] == (pos_exp.get(b, 0), neg_exp.get(b, 0))
        assert rows[-1] == (sum(pos_exp.values()), sum(neg_exp.values()))
        assert rows[-2] == (4, 2)  # doc counts (empty doc still counts)

    def test_score_matches_python_reference(self, spark):
        B, seed = 64, 7
        df, model = self._train(spark, B, seed)
        got = {
            r["doc_id"]: r
            for r in lm.quality_classifier_score(
                df, model, "doc_id", "text", buckets=B, seed=seed
            ).collect()
        }
        pos_c: dict[int, int] = {}
        neg_c: dict[int, int] = {}
        for _id, text, good in self.LABELED:
            for _p, w in _py_grams(text, 1):
                b = _py_bucket(w, seed, B)
                d = pos_c if good else neg_c
                d[b] = d.get(b, 0) + 1
        npos, nneg = sum(pos_c.values()), sum(neg_c.values())
        for _id, text, good in self.LABELED:
            grams = _py_grams(text, 1)
            if not grams:
                assert _id not in got
                continue
            sum_ppm = 0
            log_odds = math.log(5 / 3)  # (4+1)/(2+1) prior
            for _p, w in grams:
                b = _py_bucket(w, seed, B)
                lr = ((pos_c.get(b, 0) + 1) * float(nneg + B)) / (
                    (neg_c.get(b, 0) + 1) * float(npos + B)
                )
                sum_ppm += math.floor(1e6 * lr)
                log_odds += math.log(lr)
            r = got[_id]
            assert r["n_grams"] == len(grams)
            assert r["sum_lr_ppm"] == sum_ppm
            assert r["log_odds"] == pytest.approx(log_odds, rel=1e-12)
            assert r["prob"] == pytest.approx(
                1.0 / (1.0 + math.exp(-log_odds)), rel=1e-12
            )

    def test_separates_classes(self, spark):
        df, model = self._train(spark)
        scored = lm.quality_classifier_score(
            df, model, "doc_id", "text", buckets=64, seed=7
        ).collect()
        by_id = {r["doc_id"]: r["prob"] for r in scored}
        assert min(by_id[1], by_id[2], by_id[3]) > max(by_id[4], by_id[5])

    def test_model_persists_and_scores_unseen(self, spark, tmp_path):
        df, model = self._train(spark)
        p = str(tmp_path / "qc_model")
        model.write.parquet(p)
        reread = spark.read.parquet(p)
        unseen = spark.createDataFrame(
            [(10, "quick brown fox again"), (11, "cheap prizes click")],
            ["doc_id", "text"],
        )
        got = {
            r["doc_id"]: r["prob"]
            for r in lm.quality_classifier_score(
                unseen, reread, "doc_id", "text", buckets=64, seed=7
            ).collect()
        }
        assert got[10] > got[11]


def test_classifier_gate_stream_matches_batch(spark, tmp_path):
    """Streaming/batch parity of the classifier ingestion gate: the
    availableNow stream through `classifier_gate_batch_writer` keeps
    exactly the docs the batch score keeps at the same threshold."""
    from pyspark.sql import functions as F

    from soda_spark_spark.streaming import classifier_gate_batch_writer

    rows = [
        (i, ("good solid prose tokens here " * 3) if i % 2 == 0
            else "spam buy click now win", i % 2 == 0)
        for i in range(20)
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, "doc_id long, text string, good boolean") \
        .write.parquet(src)
    docs = spark.read.parquet(src)
    model_dir = str(tmp_path / "model")
    lm.quality_classifier_train(
        docs, "doc_id", "text", "good", buckets=256, seed=3
    ).write.parquet(model_dir)
    model = spark.read.parquet(model_dir)

    batch_scored = lm.quality_classifier_score(
        docs, model, "doc_id", "text", buckets=256, seed=3
    )
    th = 1_000_000
    batch_keep = {
        r.doc_id for r in batch_scored.filter(
            F.col("avg_lr_ppm") >= th).collect()
    }
    assert 0 < len(batch_keep) < 20

    out_dir = str(tmp_path / "sink")
    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = (
        stream.writeStream.foreachBatch(
            classifier_gate_batch_writer(
                model, "doc_id", "text", out_dir,
                min_avg_lr_ppm=th, buckets=256, seed=3,
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {r.doc_id for r in spark.read.parquet(out_dir).collect()}
    assert got == batch_keep


def test_importance_weights_is_lazy_no_eager_job(spark, monkeypatch):
    """Plan construction must trigger ZERO Spark actions (the old
    implementation ran two eager sum-collects for the corpus totals)."""
    from pyspark.sql import DataFrame as SparkDF

    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    rc = lm.hashed_ngram_counts(df, "doc_id", "text", n=2, buckets=64, seed=7)
    tc = lm.hashed_ngram_counts(
        df.filter("doc_id % 2 = 0"), "doc_id", "text", n=2, buckets=64, seed=7
    )

    def _boom(*a, **k):
        raise AssertionError("eager action during plan construction")

    for action in ("collect", "count", "take", "head", "toPandas"):
        monkeypatch.setattr(SparkDF, action, _boom)
    out = lm.importance_weights(
        df, rc, tc, "doc_id", "text", n=2, buckets=64, seed=7
    )
    monkeypatch.undo()
    assert len(out.collect()) > 0


class TestPerplexityBuckets:
    def test_tiers_and_cuts(self, spark):
        from soda_spark_spark.operators import lm

        docs = spark.createDataFrame(
            [(i, "a b " * (i + 2)) for i in range(9)]
            + [(100, "x y x y")],  # OOV-heavy doc -> lowest score
            "doc_id long, text string",
        )
        model = lm.ngram_lm(docs.filter("doc_id < 9"), "doc_id", "text", n=2)
        out = lm.perplexity_buckets(docs, model, "doc_id", "text", n=2)
        rows = {r.doc_id: r for r in out.collect()}
        assert len(rows) == 10
        counts = {}
        for r in rows.values():
            counts[r.bucket] = counts.get(r.bucket, 0) + 1
        # equal-size tiers up to tie mass; every bucket non-empty here
        assert set(counts) == {"head", "middle", "tail"}
        # the OOV-heavy doc has the lowest avg score -> tail
        assert rows[100].bucket == "tail"
        # bucket ordering is consistent with score ordering
        by_score = sorted(rows.values(), key=lambda r: r.avg_score_ppm)
        seen = [r.bucket for r in by_score]
        order = {"tail": 0, "middle": 1, "head": 2}
        assert [order[b] for b in seen] == sorted(order[b] for b in seen)

    def test_empty_corpus(self, spark):
        from soda_spark_spark.operators import lm

        docs = spark.createDataFrame([], "doc_id long, text string")
        model_src = spark.createDataFrame(
            [(1, "a b c")], "doc_id long, text string"
        )
        model = lm.ngram_lm(model_src, "doc_id", "text", n=2)
        out = lm.perplexity_buckets(docs, model, "doc_id", "text", n=2)
        assert out.count() == 0
        assert "bucket" in out.columns

    def test_single_doc_all_head_or_tail(self, spark):
        from soda_spark_spark.operators import lm

        docs = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
        model = lm.ngram_lm(docs, "doc_id", "text", n=2)
        rows = lm.perplexity_buckets(docs, model, "doc_id", "text", n=2).collect()
        # N=1: cut_lo == cut_mid == the doc's own score -> 'tail' by the
        # ties-go-low rule
        assert len(rows) == 1 and rows[0].bucket == "tail"
