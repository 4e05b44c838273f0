"""Property-based coverage for the round-17 parsers and projections
(hypothesis): total functions on arbitrary input (parse or raise,
never hang or corrupt), round-trip laws for the mail stack, and the
markdown projection's invariants. Deterministic profile — fixed
seeds, no flaky examples."""

from __future__ import annotations

import string
from html import escape

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from soda_spark_spark.operators.html_markdown import html_to_markdown
from soda_spark_spark.operators.mime import eml_parse
from soda_spark_spark.sources.mbox import split_mbox, write_mbox

_SET = settings(max_examples=150, deadline=None)

text_s = st.text(alphabet=string.printable + "é€— ", max_size=400)
binary_s = st.binary(max_size=400)


# ----------------------------------------------------------------- mime


@_SET
@given(binary_s)
def test_eml_parse_total_on_arbitrary_bytes(payload):
    # parse to a census dict or raise — never hang, never corrupt
    try:
        m = eml_parse(payload)
    except Exception:
        return
    assert isinstance(m, dict) and "body_text" in m
    assert m["n_parts"] is None or m["n_parts"] >= 0


@_SET
@given(st.text(alphabet=string.ascii_letters + string.digits + " ",
               min_size=1, max_size=60),
       st.text(alphabet=string.ascii_letters + string.digits + " .,\n",
               max_size=300))
def test_eml_subject_and_body_roundtrip(subject, body):
    subject = subject.strip()
    raw = (
        f"From: u@example.com\nSubject: {subject}\n\n{body}\n"
    ).encode()
    m = eml_parse(raw)
    # header whitespace folding collapses interior runs; pin the
    # common case (single-space subjects) exactly
    if "  " not in subject:
        assert (m["subject"] or "") == subject
    assert m["body_text"] == body.rstrip("\n")
    assert m["body_source"] == "plain"


# ----------------------------------------------------------------- mbox


_msg_body = st.text(
    alphabet=string.ascii_letters + string.digits + " >\n",
    max_size=200,
)


@_SET
@given(st.lists(_msg_body, min_size=1, max_size=5))
def test_mbox_roundtrip_any_bodies(bodies):
    import os
    import tempfile

    msgs = [
        (f"From: u{i}@example.com\nSubject: S{i}\n\n{b}\n").encode()
        for i, b in enumerate(bodies)
    ]
    fd, p = tempfile.mkstemp()
    os.close(fd)
    try:
        write_mbox(msgs, p)
        back = split_mbox(open(p, "rb").read())
    finally:
        os.unlink(p)
    assert len(back) == len(msgs)
    for raw, orig in zip(back, msgs):
        # framing newlines are the writer's; content lines must
        # survive byte-exactly (the mboxrd escape law)
        assert raw.rstrip(b"\n") == orig.rstrip(b"\n")


@_SET
@given(binary_s)
def test_split_mbox_total(data):
    try:
        msgs = split_mbox(data)
    except ValueError:
        return
    assert isinstance(msgs, list) and msgs


# ------------------------------------------------------------- markdown


@_SET
@given(text_s)
def test_markdown_total_on_arbitrary_text(s):
    out = html_to_markdown(s)
    assert out is not None


@_SET
@given(st.text(alphabet=string.ascii_letters + string.digits + " .,!?",
               max_size=200))
def test_markdown_of_escaped_text_roundtrips(s):
    # html-escape arbitrary plain text, wrap in a paragraph: the
    # projection must give the text back (whitespace-collapsed)
    out = html_to_markdown(f"<p>{escape(s)}</p>")
    import re

    expected = re.sub(r"[ \t\r\n\f\v]+", " ", s).strip(" ")
    assert out == expected


@_SET
@given(st.lists(st.sampled_from([
    "<h2>h</h2>", "<p>para</p>", "<ul><li>a</li></ul>",
    "<pre>x</pre>", "<blockquote>q</blockquote>", "<hr>",
    "<table><tr><td>c</td></tr></table>", "plain",
]), max_size=8))
def test_markdown_block_structure_no_triple_blank(parts):
    out = html_to_markdown("".join(parts))
    # blocks are separated by exactly one blank line: no run of 3+
    # newlines can appear
    assert "\n\n\n" not in out


@_SET
@given(st.text(alphabet=string.ascii_letters + " \n", max_size=150))
def test_markdown_pre_verbatim(code):
    # fence content is byte-verbatim modulo the outer newline trim
    out = html_to_markdown("<pre>" + escape(code) + "</pre>")
    inner = code.strip("\n")
    if inner:
        assert out == f"```\n{inner}\n```"
