"""Property tests: the round-6 operators must agree with straightforward
Python reference implementations on arbitrary corpora (hypothesis-driven,
batched — one Spark job per example)."""

from __future__ import annotations

import re

import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

token_chars = st.text(alphabet="abcXYZ019._ \t", min_size=0, max_size=40)
corpora = st.lists(token_chars, min_size=1, max_size=12)


def _tokens(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.strip(), flags=re.ASCII) if t]


def _ref_chunks(text: str, ct: int, ov: int) -> list[tuple[int, int, str]]:
    toks = _tokens(text)
    if not toks:
        return []
    stride = ct - ov
    out, idx, start = [], 0, 0
    while True:
        chunk = toks[start : start + ct]
        out.append((idx, len(chunk), " ".join(chunk)))
        if start + ct >= len(toks):  # this chunk reaches the doc end: no
            break  # redundant overlap-only tail chunks after it
        idx += 1
        start += stride
    return out


@settings(max_examples=5, deadline=None)
@given(corpora, st.integers(2, 6), st.integers(0, 3))
def test_chunk_documents_matches_python_reference(spark, texts, ct, ov):
    if ov >= ct:
        ov = ct - 1
    from soda_spark_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = sorted(
        (r["doc_id"], r["chunk_idx"], r["n_chunk_tokens"], r["chunk_text"])
        for r in chunk_documents(
            docs, "doc_id", "text", chunk_tokens=ct, overlap=ov
        ).collect()
    )
    want = sorted(
        (i, idx, n, txt)
        for i, text in enumerate(texts)
        for (idx, n, txt) in _ref_chunks(text, ct, ov)
    )
    assert got == want


@settings(max_examples=5, deadline=None)
@given(corpora, corpora)
def test_dedup_against_fingerprint_matches_set_difference(spark, new_texts, seen_texts):
    from soda_spark_spark.operators.dedup import dedup_against

    new = spark.createDataFrame(
        list(enumerate(new_texts)), "doc_id long, text string"
    )
    seen = spark.createDataFrame(
        list(enumerate(seen_texts)), "doc_id long, text string"
    )
    got = {r["doc_id"] for r in dedup_against(new, seen, "doc_id", "text").collect()}
    seen_set = set(seen_texts)
    want = {i for i, t in enumerate(new_texts) if t not in seen_set}
    assert got == want


line_texts = st.lists(
    st.text(alphabet="abX1. \n", min_size=0, max_size=40),
    min_size=1,
    max_size=10,
)


def _ref_dedup_lines(texts, min_doc_count=2, min_line_chars=1):
    counts: dict[str, set] = {}
    for i, t in enumerate(texts):
        for line in set(t.split("\n")):
            if len(line) >= min_line_chars:
                counts.setdefault(line, set()).add(i)
    boiler = {l for l, s in counts.items() if len(s) >= min_doc_count}
    return {
        i: "\n".join(l for l in t.split("\n") if l not in boiler)
        for i, t in enumerate(texts)
    }


@settings(max_examples=5, deadline=None)
@given(line_texts, st.integers(2, 3), st.integers(1, 3))
def test_dedup_lines_matches_python_reference(spark, texts, mdc, mlc):
    from soda_spark_spark.operators.dedup import dedup_lines

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["text"]
        for r in dedup_lines(
            docs, "doc_id", "text", min_doc_count=mdc, min_line_chars=mlc
        ).collect()
    }
    assert got == _ref_dedup_lines(texts, mdc, mlc)
