"""Property-based coverage for the round-16 parsers and projections
(hypothesis): total functions on arbitrary input (parse or raise,
never hang or corrupt), and the algebraic laws each contract
promises. Deterministic profile — fixed seeds, no flaky examples."""

from __future__ import annotations

import json
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from soda_spark_spark.operators.code_dedup import (
    normalize_code,
    strip_code_comments,
)
from soda_spark_spark.operators.email_text import _SIG_LINE  # noqa: F401
from soda_spark_spark.operators.notebook_text import ipynb_cells
from soda_spark_spark.operators.subtitles import parse_subtitles
from soda_spark_spark.operators.wikitext import wikitext_to_text

_SET = settings(max_examples=150, deadline=None)

text_s = st.text(
    alphabet=string.printable + "é€— ", max_size=400
)


# ------------------------------------------------------------- wikitext


@_SET
@given(text_s)
def test_wikitext_total_and_idempotent_on_plain(s):
    out = wikitext_to_text(s)
    assert out is not None
    # projection output contains no blank lines (the empty document
    # projects to the empty string, which has no lines to check)
    if out != "":
        for ln in out.split("\n"):
            assert ln.strip() == ln and ln != ""


@_SET
@given(st.lists(st.sampled_from(
    ["'''b'''", "[[A|b]]", "{{t|x}}", "== h ==", "<ref>r</ref>",
     "plain words", "{|\n|c\n|}", "[http://x.example l]"],
), min_size=0, max_size=8))
def test_wikitext_idempotent_after_first_pass(parts):
    s = "\n".join(parts)
    once = wikitext_to_text(s)
    # a second projection of already-projected text is a fixpoint
    assert wikitext_to_text(once) == once


# ------------------------------------------------------------ notebooks


@_SET
@given(st.binary(max_size=300))
def test_ipynb_total(payload):
    try:
        cells = ipynb_cells(payload)
    except ValueError:
        return
    assert all(isinstance(c["text"], str) for c in cells)


@_SET
@given(st.lists(st.one_of(
    st.fixed_dictionaries({"cell_type": st.sampled_from(
        ["code", "markdown", "raw"]),
        "source": st.one_of(st.text(max_size=50),
                            st.lists(st.text(max_size=20),
                                     max_size=5))}),
), max_size=6))
def test_ipynb_valid_notebooks_roundtrip(cells):
    payload = json.dumps(dict(nbformat=4, cells=cells)).encode()
    got = ipynb_cells(payload)
    assert len(got) == len(cells)
    for i, (inp, out) in enumerate(zip(cells, got)):
        src = inp["source"]
        want = src if isinstance(src, str) else "".join(src)
        assert out == dict(cell_index=i, cell_type=inp["cell_type"],
                           text=want)


# ------------------------------------------------------------ subtitles


@_SET
@given(st.binary(max_size=400))
def test_subtitles_total(payload):
    try:
        cues, bad = parse_subtitles(payload)
    except ValueError:
        return
    assert bad >= 0
    for c in cues:
        assert isinstance(c["start_ms"], int)
        assert isinstance(c["end_ms"], int)


@_SET
@given(st.lists(st.tuples(
    st.integers(min_value=0, max_value=59),
    st.text(alphabet=string.ascii_letters + " ", min_size=1,
            max_size=30),
), min_size=1, max_size=6))
def test_srt_generated_cues_all_parse(cues):
    blocks = []
    for i, (sec, body) in enumerate(cues):
        blocks.append(
            f"{i + 1}\n00:00:{sec:02d},000 --> 00:01:{sec:02d},000\n"
            f"{body.strip() or 'x'}\n"
        )
    parsed, bad = parse_subtitles("\n".join(blocks).encode())
    assert bad == 0 and len(parsed) == len(cues)
    for (sec, _b), c in zip(cues, parsed):
        assert c["start_ms"] == sec * 1000
        assert c["end_ms"] == 60_000 + sec * 1000


# ------------------------------------------------------- comment lexer


@_SET
@given(text_s, st.sampled_from(["c", "hash", None]))
def test_comment_strip_total_and_no_growth(s, fam):
    out = strip_code_comments(s, fam)
    assert out is not None
    # stripping never grows the text by more than the one
    # anti-fusion space per block comment (bounded by input length)
    assert len(out) <= 2 * len(s) + 1


@_SET
@given(st.text(alphabet=string.ascii_letters + " \n", max_size=120))
def test_comment_strip_is_identity_without_markers(s):
    # no quote/comment characters at all -> byte-identical
    assert strip_code_comments(s, "c") == s
    assert strip_code_comments(s, "hash") == s


@_SET
@given(st.text(alphabet=string.ascii_letters + " ", max_size=40))
def test_c_string_contents_survive(body):
    src = f'x = "{body}"; // comment'
    out = strip_code_comments(src, "c")
    assert f'"{body}"' in out and "comment" not in out


@_SET
@given(text_s)
def test_normalize_code_idempotent(s):
    once = normalize_code(s)
    assert normalize_code(once) == once


# ------------------------------------------------------------ wiki dump


@_SET
@given(st.lists(st.tuples(
    st.integers(min_value=0, max_value=10**6),
    st.text(alphabet=string.ascii_letters + " '&<>\"", max_size=60),
), min_size=1, max_size=5, unique_by=lambda t: t[0]))
def test_wiki_dump_writer_parser_roundtrip(pages):
    import io

    from soda_spark_spark.sources.wiki_dump import (
        _parse_pages,
        write_wiki_dump,
    )

    built = [
        dict(title=f"T{pid}", ns=0, page_id=pid, rev_id=pid + 1,
             text=body)
        for pid, body in pages
    ]
    buf = io.BytesIO()
    import tempfile, os  # noqa: E401

    path = tempfile.mktemp()
    write_wiki_dump(built, path)
    try:
        rows = list(_parse_pages(open(path, "rb").read(), path))
    finally:
        os.unlink(path)
    assert [(r["page_id"], r["text"]) for r in rows] == pages