"""Tests for the Gopher quality-rule flags/filter and temperature
mixture resampling (round 8).

Float-channel parity for temperature rates is pinned against a pure-
Python reference; the alpha=0.5 sqrt path is additionally covered by
the DuckDB oracle (`temperature_mixture` in `__spark_entry__`).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from soda_spark_spark.operators.packing import (
    temperature_mixture_rates, temperature_mixture_sample,
)
from soda_spark_spark.operators.text import (
    GOPHER_REQUIRED_WORDS, gopher_filter, gopher_quality_flags,
)


GOOD = (
    "the quick brown fox jumps over the lazy dog and runs to be with "
    "friends of that pack which have gathered near the river bank today "
    "while many other animals watch from the shade of tall green trees "
    "that line the water and sway gently with the evening wind as birds "
    "call out from above and the day slowly turns to dusk over the hills"
)


class TestGopherFlags:
    def test_good_doc_keeps(self, spark):
        df = spark.createDataFrame([(1, GOOD)], "doc_id long, text string")
        r = gopher_quality_flags(df, "doc_id", "text").collect()[0]
        assert r["keep"] is True
        assert r["n_words"] >= 50

    def test_each_rule_fails_independently(self, spark):
        filler = " ".join(["steady"] * 60)  # keeps word_count_ok true
        docs = [
            # too short (under 50 words)
            (1, "too short"),
            # mean word length too high
            (2, " ".join(["extraordinarily"] * 60)),
            # symbol ratio: >10% '#'
            (3, filler + " " + " ".join(["#"] * 20)),
            # bullet lines: every line is a bullet
            (4, "\n".join(f"- item {i} ok" for i in range(60))),
            # ellipsis lines: every line ends with ...
            (5, "\n".join(f"line {i} trails off..." for i in range(60))),
            # alpha words: mostly numbers
            (6, " ".join(str(i) for i in range(60)) + " few words here"),
            # required words: none of the/be/to/of/and/that/have/with
            (7, " ".join(f"w{i}" for i in range(60))),
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        flags = {r["doc_id"]: r for r in
                 gopher_quality_flags(df, "doc_id", "text").collect()}
        assert not flags[1]["word_count_ok"]
        assert not flags[2]["mean_word_len_ok"]
        assert not flags[3]["symbol_ratio_ok"]
        assert not flags[4]["bullet_lines_ok"]
        assert not flags[5]["ellipsis_lines_ok"]
        assert not flags[6]["alpha_words_ok"]
        assert not flags[7]["required_words_ok"]
        assert all(not r["keep"] for r in flags.values())

    def test_empty_doc(self, spark):
        df = spark.createDataFrame(
            [(1, ""), (2, "   \n\t ")], "doc_id long, text string"
        )
        rows = {r["doc_id"]: r for r in
                gopher_quality_flags(df, "doc_id", "text").collect()}
        for r in rows.values():
            assert r["n_words"] == 0
            assert not r["word_count_ok"]
            assert not r["keep"]
            # line-free docs pass the line rules vacuously
            assert r["bullet_lines_ok"] and r["ellipsis_lines_ok"]

    def test_python_reference_fractions(self, spark):
        """Cross-check the regex-count fractions against a plain Python
        implementation on mixed fixture docs."""
        docs = [
            (1, GOOD),
            (2, "- bullet one x\nplain line here\n* bullet two y\n"),
            (3, "ends with dots...\nnormal\nalso dots…\n\n"),
            (4, "a1 22 three £$% four-5 # ..."),
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {r["doc_id"]: r for r in gopher_quality_flags(
            df, "doc_id", "text",
            min_words=1, max_words=10**6, min_required_word_hits=0,
        ).collect()}
        import re

        for doc_id, text in docs:
            words = text.split()
            lines = [ln for ln in text.split("\n") if ln.strip()]
            bullets = sum(
                1 for ln in lines
                if re.match(r"^[ \t]*(•|\*|-|[0-9]+[.)])[ \t]", ln)
            )
            ell = sum(
                1 for ln in lines if re.search(r"(\.\.\.|…)[ \t]*$", ln)
            )
            alpha = sum(1 for w in words if re.search("[A-Za-z]", w))
            r = got[doc_id]
            assert r["n_words"] == len(words)
            exp_bull_ok = (not lines) or bullets / len(lines) <= 0.9
            exp_ell_ok = (not lines) or ell / len(lines) <= 0.3
            assert r["bullet_lines_ok"] == exp_bull_ok
            assert r["ellipsis_lines_ok"] == exp_ell_ok
            if words:
                assert r["alpha_words_ok"] == (alpha / len(words) >= 0.8)

    def test_filter_form(self, spark):
        df = spark.createDataFrame(
            [(1, GOOD), (2, "too short")], "doc_id long, text string"
        )
        out = gopher_filter(df, "doc_id", "text")
        assert [r["doc_id"] for r in out.collect()] == [1]
        assert out.columns == df.columns


class TestCleanLines:
    def test_c4_rules(self, spark):
        from soda_spark_spark.operators.text import clean_lines

        text = "\n".join([
            "This is a proper sentence with enough words.",   # keep
            "No terminal punctuation here at all",            # drop (punct)
            "Too short.",                                     # drop (words)
            "Enable javascript to view this page properly.",  # drop (block)
            "",                                               # keep (blank)
            'He said "this one ends with a quote."',          # keep
            "Ends with a question mark after several words?",  # keep
        ])
        df = spark.createDataFrame([(1, text), (2, None)],
                                   "doc_id long, text string")
        out = {r["doc_id"]: r["text"] for r in
               clean_lines(df, "doc_id", "text").collect()}
        assert out[1].split("\n") == [
            "This is a proper sentence with enough words.",
            "",
            'He said "this one ends with a quote."',
            "Ends with a question mark after several words?",
        ]
        assert out[2] is None

    def test_all_lines_removed_and_options(self, spark):
        from soda_spark_spark.operators.text import clean_lines

        df = spark.createDataFrame(
            [(1, "no punct line\nshort.")], "doc_id long, text string"
        )
        out = clean_lines(df, "doc_id", "text", keep_blank=False).collect()
        assert out[0]["text"] == ""
        # relaxed thresholds keep everything
        relaxed = clean_lines(
            df, "doc_id", "text",
            require_terminal_punct=False, min_words=0, blocklist=(),
        ).collect()
        assert relaxed[0]["text"] == "no punct line\nshort."

    def test_line_order_preserved(self, spark):
        from soda_spark_spark.operators.text import clean_lines

        lines = [f"sentence number {i} has plenty of words." for i in range(50)]
        df = spark.createDataFrame(
            [(1, "\n".join(lines))], "doc_id long, text string"
        ).repartition(8)
        out = clean_lines(df, "doc_id", "text").collect()[0]["text"]
        assert out.split("\n") == lines


class TestVocabDrift:
    def test_summary_matches_python(self, spark):
        from collections import Counter

        from soda_spark_spark.operators.text import vocab_drift

        a_docs = ["the cat sat", "the dog ran", "a bird flew high"]
        b_docs = ["the cat sat", "the fox ran far", "new words appear here"]
        a = spark.createDataFrame([(i, t) for i, t in enumerate(a_docs)],
                                  "doc_id long, text string")
        b = spark.createDataFrame([(i, t) for i, t in enumerate(b_docs)],
                                  "doc_id long, text string")
        r = vocab_drift(a, b, "text").collect()[0]

        fa = Counter(w for t in a_docs for w in t.lower().split())
        fb = Counter(w for t in b_docs for w in t.lower().split())
        na, nb = sum(fa.values()), sum(fb.values())
        shared = set(fa) & set(fb)
        assert r["n_tokens_a"] == na and r["n_tokens_b"] == nb
        assert r["vocab_a"] == len(fa) and r["vocab_b"] == len(fb)
        assert r["shared_vocab"] == len(shared)
        assert r["gained_vocab"] == len(set(fb) - set(fa))
        assert r["lost_vocab"] == len(set(fa) - set(fb))
        assert r["vocab_jaccard"] == len(shared) / len(set(fa) | set(fb))
        l1 = sum(abs(fa.get(t, 0) / na - fb.get(t, 0) / nb)
                 for t in set(fa) | set(fb))
        assert r["l1_freq_drift"] == pytest.approx(l1, rel=1e-12)

    def test_identical_corpora_zero_drift(self, spark):
        from soda_spark_spark.operators.text import vocab_drift

        df = spark.createDataFrame(
            [(1, "same text every time"), (2, "more of the same")],
            "doc_id long, text string",
        )
        r = vocab_drift(df, df, "text").collect()[0]
        assert r["gained_vocab"] == 0 and r["lost_vocab"] == 0
        assert r["vocab_jaccard"] == 1.0
        assert r["l1_freq_drift"] == 0.0

    def test_top_k_movers(self, spark):
        from soda_spark_spark.operators.text import vocab_drift

        a = spark.createDataFrame([(1, "x x x x y")], "doc_id long, text string")
        b = spark.createDataFrame([(1, "y y y y z")], "doc_id long, text string")
        rows = vocab_drift(a, b, "text", top_k=2).collect()
        assert [r["token"] for r in rows] == ["x", "y"]
        assert rows[0]["c_a"] == 4 and rows[0]["c_b"] == 0
        assert rows[0]["share_a"] == 0.8 and rows[0]["share_b"] == 0.0


class TestStreamingCuration:
    def test_quality_gate_stream_matches_batch(self, spark, tmp_path):
        from soda_spark_spark.operators.text import gopher_filter
        from soda_spark_spark.streaming.scan_stream import quality_gate_stream

        docs = spark.createDataFrame(
            [(1, GOOD), (2, "too short"), (3, GOOD + " extra tail words.")],
            "doc_id long, text string",
        )
        path = str(tmp_path / "docs")
        docs.write.parquet(path)
        stream = spark.readStream.schema(docs.schema).parquet(path)
        out = quality_gate_stream(stream, "text")
        q = (
            out.writeStream.format("memory").queryName("qgate_t")
            .outputMode("append").trigger(availableNow=True).start()
        )
        assert q.awaitTermination(60)
        got = {r["doc_id"] for r in spark.table("qgate_t").collect()}
        want = {r["doc_id"]
                for r in gopher_filter(docs, "doc_id", "text").collect()}
        assert got == want == {1, 3}

    def test_curate_batch_writer_matches_batch(self, spark, tmp_path):
        from soda_spark_spark.operators.text import clean_lines, gopher_filter
        from soda_spark_spark.streaming.scan_stream import curate_batch_writer

        docs = spark.createDataFrame(
            [
                (1, GOOD + ".\njunk line no punct"),
                (2, "way too short.\nalso junk"),
            ],
            "doc_id long, text string",
        )
        src = str(tmp_path / "src")
        docs.repartition(1).write.parquet(src)
        out_dir = str(tmp_path / "out")
        stream = spark.readStream.schema(docs.schema).parquet(src)
        q = (
            stream.writeStream.foreachBatch(
                curate_batch_writer("doc_id", "text", out_dir)
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        got = {(r["doc_id"], r["text"]) for r in
               spark.read.parquet(out_dir).collect()}
        want = {(r["doc_id"], r["text"]) for r in gopher_filter(
            clean_lines(docs, "doc_id", "text"), "doc_id", "text"
        ).collect()}
        assert got == want
        assert {d for d, _ in got} == {1}
        # the junk line was cleaned away before the gate
        assert all("junk" not in t for _, t in got)


class TestTemperatureMixture:
    def _corpus(self, spark):
        # skewed: 800 / 150 / 50 rows across three sources
        rows = [(i, "a") for i in range(800)]
        rows += [(1000 + i, "b") for i in range(150)]
        rows += [(2000 + i, "c") for i in range(50)]
        return spark.createDataFrame(rows, "doc_id long, source string")

    def test_rates_match_python(self, spark):
        df = self._corpus(spark)
        got = {r["source"]: r for r in temperature_mixture_rates(
            df, "source", alpha=0.5, target_rows=300
        ).collect()}
        ns = {"a": 800, "b": 150, "c": 50}
        N = sum(ns.values())
        pa = {g: math.sqrt(n / N) for g, n in ns.items()}
        Z = sum(pa.values())
        for g, n in ns.items():
            q = pa[g] / Z
            rate = min(1.0, 300 * q / n)
            assert got[g]["n"] == n
            assert got[g]["p"] == n / N
            assert got[g]["q"] == pytest.approx(q, rel=1e-15)
            assert got[g]["rate"] == pytest.approx(rate, rel=1e-15)
        # alpha < 1 flattens: small group's target share > natural share
        assert got["c"]["q"] > got["c"]["p"]
        assert got["a"]["q"] < got["a"]["p"]

    def test_generic_alpha_pow(self, spark):
        df = self._corpus(spark)
        got = {r["source"]: r["q"] for r in temperature_mixture_rates(
            df, "source", alpha=0.7, target_rows=100
        ).collect()}
        ns = {"a": 800, "b": 150, "c": 50}
        N = sum(ns.values())
        pa = {g: (n / N) ** 0.7 for g, n in ns.items()}
        Z = sum(pa.values())
        for g in ns:
            assert got[g] == pytest.approx(pa[g] / Z, rel=1e-12)

    def test_sample_is_deterministic_and_near_target(self, spark):
        df = self._corpus(spark)
        s1 = temperature_mixture_sample(
            df, "doc_id", "source", alpha=0.5, target_rows=300, seed=7
        )
        s2 = temperature_mixture_sample(
            df.repartition(13), "doc_id", "source", alpha=0.5,
            target_rows=300, seed=7,
        )
        ids1 = sorted(r["doc_id"] for r in s1.collect())
        ids2 = sorted(r["doc_id"] for r in s2.collect())
        assert ids1 == ids2  # partitioning-invariant
        n = len(ids1)
        assert 200 <= n <= 400  # expectation 300, binomial spread
        # saturated group: rate for 'c' caps at 1 -> every c row kept
        got_c = sum(1 for i in ids1 if i >= 2000)
        rates = {r["source"]: r["rate"] for r in temperature_mixture_rates(
            df, "source", alpha=0.5, target_rows=300
        ).collect()}
        if rates["c"] == 1.0:
            assert got_c == 50

    def test_ppm_channel_matches_python_exactly(self, spark):
        """The certified channel must be bit-exact vs the same fixed-order
        float ops in Python (what the DuckDB oracle replays)."""
        df = self._corpus(spark)
        got = {r["source"]: r for r in temperature_mixture_rates(
            df, "source", alpha=0.5, target_rows=300, ppm=True
        ).collect()}
        ns = {"a": 800, "b": 150, "c": 50}
        N = sum(ns.values())
        pa = {g: math.floor(1_000_000.0 * math.sqrt(n / N))
              for g, n in ns.items()}
        Z = sum(pa.values())
        for g, n in ns.items():
            q = float(pa[g]) / float(Z)
            rate = min(1.0, (300.0 * q) / float(n))
            assert got[g]["q"] == q  # exact, not approx
            assert got[g]["rate"] == rate

    def test_validation(self, spark):
        df = self._corpus(spark)
        with pytest.raises(ValueError, match="target_rows"):
            temperature_mixture_rates(df, "source", target_rows=-1)
        with pytest.raises(ValueError, match="alpha"):
            temperature_mixture_rates(df, "source", alpha=-0.1, target_rows=10)
