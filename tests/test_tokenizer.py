"""BPE tokenizer induction: merge learning vs an independent from-scratch
reference, deterministic ties, distributed encode parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from soda_spark_spark.operators.tokenizer import (
    END,
    bpe_encode,
    bpe_train,
    bpe_train_counts,
    word_counts,
)


def _naive_bpe(counts, n_merges):
    """From-scratch reference: recompute pair stats every iteration (no
    incremental bookkeeping) — validates bpe_train_counts' updates."""
    vocab = {}
    for w, c in counts:
        syms = tuple(w) + (END,)
        vocab[syms] = vocab.get(syms, 0) + c
    merges = []
    for rank in range(n_merges):
        stats = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                stats[p] = stats.get(p, 0) + c
        if not stats:
            break
        best = min(stats, key=lambda p: (-stats[p], p))
        merges.append((rank, best[0], best[1]))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + c
        vocab = new_vocab
    return merges


def test_incremental_matches_naive_reference():
    counts = [
        ("low", 5), ("lower", 2), ("newest", 6), ("widest", 3),
        ("newer", 4), ("wide", 2), ("west", 1),
    ]
    assert bpe_train_counts(counts, 25) == _naive_bpe(counts, 25)


def test_merge_learning_finds_common_suffix():
    counts = [("newest", 10), ("widest", 10), ("tallest", 10)]
    merges = bpe_train_counts(counts, 6)
    built = {l + r for _, l, r in merges}
    # 'est</w>' (or a superstring of it) must emerge from 30 occurrences
    assert any("est" in b for b in built)


def test_word_counts_topk_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "b b b a a c"), (2, "a c d")], "doc_id long, text string"
    )
    got = {
        (r.word, r.c)
        for r in word_counts(df, "text", max_words=3).collect()
    }
    # counts: a=3 b=3 c=2 d=1; top-3 with lexicographic ties -> a, b, c
    assert got == {("a", 3), ("b", 3), ("c", 2)}


def test_train_encode_roundtrip(spark):
    docs = spark.createDataFrame(
        [(i, "the newest widest things the newest") for i in range(4)]
        + [(99, None)],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, "text", n_merges=30, min_count=1)
    out = {r.doc_id: r for r in
           bpe_encode(docs, "doc_id", "text", merges).collect()}
    assert out[99].bpe_tokens is None and out[99].n_bpe_tokens is None
    toks = out[0].bpe_tokens
    # reconstruction: concatenating tokens and splitting on END gives words
    text = "".join(toks).replace(END, " ").strip()
    assert text == "the newest widest things the newest"
    # enough merges: frequent words collapse to single tokens
    assert "the" + END in toks
    # deterministic: retrain yields identical table
    again = bpe_train(docs, "text", n_merges=30, min_count=1)
    assert sorted(map(tuple, merges.collect())) == sorted(map(tuple, again.collect()))


def test_encode_respects_rank_order(spark):
    # merges: ('a','b') rank 0 -> 'ab'; ('ab','c') rank 1 -> 'abc'
    merges = spark.createDataFrame(
        [(0, "a", "b"), (1, "ab", "c")], "rank int, left string, right string"
    )
    df = spark.createDataFrame([(1, "abc ab x")], "doc_id long, text string")
    r = bpe_encode(df, "doc_id", "text", merges).collect()[0]
    assert r.bpe_tokens == ["abc", END, "ab", END, "x", END]
    assert r.n_bpe_tokens == 6
