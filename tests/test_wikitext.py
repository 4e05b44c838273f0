"""Wikitext -> plain text (`operators/wikitext.py`) and MediaWiki
dump ingestion (`sources/wiki_dump.py`): per-rule coverage of the
projection contract, streaming dump parse, compression handling, and
the quarantine/bomb guards."""

from __future__ import annotations

import bz2

import pytest

from soda_spark_spark.operators.wikitext import (
    wikitext_strip,
    wikitext_to_text,
)
from soda_spark_spark.sources.wiki_dump import (
    read_wiki_dump,
    write_wiki_dump,
)


def test_bold_italic_and_headers():
    assert wikitext_to_text("'''b''' ''i'' '''''both'''''") == "b i both"
    assert wikitext_to_text("== History ==\n=== Sub ===\ntext") == (
        "History\nSub\ntext"
    )


def test_wikilinks():
    assert wikitext_to_text("[[Target]]") == "Target"
    assert wikitext_to_text("[[Target|label]]") == "label"
    # rendered text is the LAST pipe field; empty label falls back
    assert wikitext_to_text("[[a|b|c]]") == "c"
    assert wikitext_to_text("[[Target|]]") == "Target"
    # file/image/category drop whole, even with nested links inside
    assert wikitext_to_text(
        "[[File:F.jpg|thumb|cap [[x|y]] tail]] body [[Category:C]]"
    ) == "body"
    # interlanguage links drop case-SENSITIVELY ([[ISO: ..]] lives)
    assert wikitext_to_text("[[fr:Titre]] a [[ISO:Std]]") == "a ISO:Std"


def test_templates_tables_nesting_and_unbalanced():
    assert wikitext_to_text("x {{cite|a={{n|1}}}} y") == "x y"
    assert wikitext_to_text("{|\n|a||b\n{|\n|inner\n|}\n|}\nafter") == (
        "after"
    )
    # unbalanced braces stay as literal residue (never data loss)
    assert wikitext_to_text("open {{tpl stays") == "open {{tpl stays"


def test_refs_comments_and_keep_spans():
    s = "<!-- gone -->a<ref>cite</ref> b<ref name=x/> c"
    assert wikitext_to_text(s) == "a b c"
    # an unterminated comment drops to EOD (MediaWiki behavior)
    assert wikitext_to_text("keep<!-- open\nmore") == "keep"
    # nowiki/pre/code/source content survives VERBATIM — even text
    # that looks like a template
    assert wikitext_to_text("<nowiki>{{not tpl}}</nowiki>") == (
        "{{not tpl}}"
    )
    assert wikitext_to_text(
        "<syntaxhighlight lang=py>x = {{1}}</syntaxhighlight>"
    ) == "x = {{1}}"
    assert wikitext_to_text("<math>x^2</math>gone") == "gone"


def test_external_links_entities_lists_magic():
    assert wikitext_to_text("[http://x.example lbl] [http://bare.x]") == (
        "lbl"
    )
    assert wikitext_to_text("a &amp; b &#65;&#x42;&nbsp;c") == "a & b AB c"
    assert wikitext_to_text("* one\n# two\n:ind\n;def\n----\nend") == (
        "one\ntwo\nind\ndef\nend"
    )
    assert wikitext_to_text("__TOC__ x __NOTOC__") == "x"
    assert wikitext_to_text(None) is None


def test_wikitext_strip_dataframe(spark):
    df = spark.createDataFrame(
        [(1, "'''A''' [[b|c]] {{t}}"), (2, None)], "id long, wt string"
    )
    out = wikitext_strip(df, "wt", "text").orderBy("id").collect()
    assert out[0].text == "A c"
    assert out[1].text is None


def test_read_wiki_dump_roundtrip(spark, tmp_path):
    pages = [
        dict(title="Alpha", ns=0, page_id=1, rev_id=10,
             timestamp="2001-01-15T00:00:00Z",
             text="'''Alpha''' is [[a|b]]."),
        dict(title="Beta", ns=0, page_id=2, rev_id=11,
             redirect="Alpha", text="#REDIRECT [[Alpha]]"),
        dict(title="Talk:Alpha", ns=1, page_id=3, rev_id=12,
             text="talk & <escaped>"),
    ]
    for comp, name in ((None, "a.xml"), ("bz2", "b.xml.bz2"),
                       ("gzip", "c.xml.gz")):
        write_wiki_dump(pages, str(tmp_path / name), compress=comp)
    df = read_wiki_dump(spark, str(tmp_path / "*"))
    rows = {(r.file.rsplit("/", 1)[-1], r.page_id): r
            for r in df.collect()}
    assert len(rows) == 9
    a = rows[("b.xml.bz2", 1)]
    assert a.title == "Alpha" and a.ns == 0 and a.rev_id == 10
    assert a.model == "wikitext" and a.error is None
    assert a.text == "'''Alpha''' is [[a|b]]."
    assert rows[("a.xml", 2)].redirect == "Alpha"
    assert rows[("c.xml.gz", 3)].text == "talk & <escaped>"


def test_read_wiki_dump_multistream_bz2(spark, tmp_path):
    # the multistream layout: independent bz2 members concatenated —
    # member 2's pages must not vanish
    import xml.etree.ElementTree as ET  # noqa: F401  (parse sanity)

    p1 = tmp_path / "m1.xml"
    p2 = tmp_path / "m2.xml"
    write_wiki_dump(
        [dict(title="One", ns=0, page_id=1, rev_id=1, text="x")], str(p1)
    )
    write_wiki_dump(
        [dict(title="Two", ns=0, page_id=2, rev_id=2, text="y")], str(p2)
    )
    # wrap each XML *fragment-as-document* pair is invalid XML when
    # concatenated raw, so concatenate page-level: build one valid
    # document per member and parse members independently is the real
    # multistream contract — but iterparse sees ONE document. Emulate
    # the real layout: the decompressed stream is two <mediawiki>
    # docs; MediaWiki multistream readers parse per member. Our
    # reader concatenates, so craft members whose concatenation is
    # still one well-formed page stream: member 1 without the closing
    # root tag, member 2 without the opening one.
    raw1 = open(p1, "rb").read()
    raw2 = open(p2, "rb").read()
    head1 = raw1.rsplit(b"</mediawiki>", 1)[0]
    body2 = raw2.split(b">", 1)[1].rsplit(b"</mediawiki>", 1)[0]
    blob = bz2.compress(head1) + bz2.compress(body2 + b"</mediawiki>")
    out = tmp_path / "multi.xml.bz2"
    out.write_bytes(blob)
    df = read_wiki_dump(spark, str(out))
    got = {r.title for r in df.collect()}
    assert got == {"One", "Two"}


def test_read_wiki_dump_quarantine_and_bomb(spark, tmp_path):
    (tmp_path / "bad.xml").write_bytes(b"<mediawiki><page>")
    big = bz2.compress(b"\x00" * 4_000_000)
    (tmp_path / "bomb.xml.bz2").write_bytes(big)
    df = read_wiki_dump(
        spark, str(tmp_path / "*"), max_bytes=1_000_000
    )
    rows = {r.file.rsplit("/", 1)[-1]: r for r in df.collect()}
    assert rows["bad.xml"].error is not None
    assert "exceeds" in rows["bomb.xml.bz2"].error
    assert rows["bad.xml"].text is None


@pytest.mark.parametrize("junk", [b"not xml", b"BZh9junk", b"\x1f\x8bxx"])
def test_corrupt_compression_quarantines(spark, tmp_path, junk):
    (tmp_path / "j.xml.bz2").write_bytes(junk)
    rows = read_wiki_dump(spark, str(tmp_path / "j.xml.bz2")).collect()
    assert len(rows) == 1 and rows[0].error is not None


def test_empty_file_skipped_by_source(spark, tmp_path):
    # Spark's binaryFile source emits no row for a 0-byte file — there
    # is nothing to quarantine; pinned so a behavior change surfaces
    (tmp_path / "e.xml").write_bytes(b"")
    assert read_wiki_dump(spark, str(tmp_path / "e.xml")).count() == 0
