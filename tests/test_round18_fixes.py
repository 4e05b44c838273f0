"""Round-18 regression tests — one class per ADVICE/VERDICT item fixed
this round:

- mime.py: message/rfc822 (and any attachment-disposition multipart)
  parts are censused as ONE attachment and their subtree never reaches
  body selection (r17 ADVICE, medium);
- mime.py: In-Reply-To / References extraction + the derived
  `parent_ref` threading key with the JWZ References fallback
  (r17 VERDICT missing #1);
- html_markdown.py: unmatched inline close tags emit nothing; dangling
  emphasis/link state closes at block end instead of half-rendering
  (r17 ADVICE, low);
- packing.length_buckets: token-count column names that need backtick
  quoting (dots, spaces, hyphens) work like every sibling operator
  (r17 ADVICE, low);
- chat.validate_tool_calls: a tool result is answered only by a call
  in an earlier ASSISTANT turn — a malformed tool turn carrying
  tool_calls no longer satisfies the orphan scan (r17 VERDICT wrong #1);
- evals: outcome vocabulary is case-insensitive ('A'/'TIE' count)
  (r17 VERDICT wrong #2);
- wiki_dump._decompress: raw-zlib-framed streams (TFRecordOptions
  ZLIB — 0x78 header, no gzip wrapper) unwrap instead of
  quarantining wholesale (r17 VERDICT missing #2).
"""

from __future__ import annotations

import zlib

import pytest

from soda_spark_spark.operators.mime import eml_parse


def _fwd_fixture() -> bytes:
    """HTML message with a forwarded .eml attachment — the exact
    repro from the r17 ADVICE: before the fix, body_source='plain'
    came from the ATTACHMENT and n_attachments stayed 0."""
    inner = (
        "From: inner@example.com\n"
        "Subject: inner\n"
        "Content-Type: text/plain\n\n"
        "INNER BODY MUST NOT WIN\n"
    )
    return (
        "From: outer@example.com\n"
        "Subject: fwd\n"
        "MIME-Version: 1.0\n"
        'Content-Type: multipart/mixed; boundary="B"\n\n'
        "--B\nContent-Type: text/html\n\n<p>Real outer body</p>\n"
        "--B\nContent-Type: message/rfc822\n"
        'Content-Disposition: attachment; filename="fwd.eml"\n\n'
        + inner
        + "--B--\n"
    ).encode()


class TestRfc822AttachmentCensus:
    def test_forwarded_message_does_not_hijack_body(self):
        m = eml_parse(_fwd_fixture())
        assert m["body_source"] == "html"
        assert m["body_text"] == "Real outer body"

    def test_forwarded_message_is_one_attachment_one_part(self):
        m = eml_parse(_fwd_fixture())
        assert m["n_attachments"] == 1
        assert m["attachment_types"] == "message/rfc822"
        # html leaf + the attached message container = 2 parts; the
        # inner text/plain leaf is the attachment's internals
        assert m["n_parts"] == 2
        assert m["attachment_bytes"] > 0

    def test_inline_rfc822_still_counts_as_attachment(self):
        # maintype 'message' is an attached document whatever the
        # disposition says (forwarded mail is usually inline)
        raw = _fwd_fixture().replace(
            b'Content-Disposition: attachment; filename="fwd.eml"\n', b""
        )
        m = eml_parse(raw)
        assert m["n_attachments"] == 1
        assert m["body_text"] == "Real outer body"

    def test_plain_attachment_census_unchanged(self):
        raw = (
            "From: u@example.com\nMIME-Version: 1.0\n"
            'Content-Type: multipart/mixed; boundary="B"\n\n'
            "--B\nContent-Type: text/plain\n\nreal body\n"
            "--B\nContent-Type: text/plain\n"
            'Content-Disposition: attachment; filename="x.txt"\n\n'
            "attached text\n--B--\n"
        ).encode()
        m = eml_parse(raw)
        assert m["body_text"] == "real body"
        assert m["n_attachments"] == 1 and m["n_parts"] == 2


class TestThreadingHeaders:
    def test_in_reply_to_extracted_and_parent_ref(self):
        raw = (
            b"From: u@example.com\n"
            b"Message-ID: <b@x>\n"
            b"In-Reply-To: <a@x>\n"
            b"References: <root@x> <a@x>\n\nhi\n"
        )
        m = eml_parse(raw)
        assert m["in_reply_to"] == "<a@x>"
        assert m["references"] == "<root@x> <a@x>"
        assert m["parent_ref"] == "<a@x>"

    def test_references_fallback_uses_last_id(self):
        # old archives: References present, In-Reply-To absent — the
        # chain's LAST id is the immediate parent (JWZ)
        raw = (
            b"From: u@example.com\nMessage-ID: <c@x>\n"
            b"References: <root@x> <mid@x> <b@x>\n\nhi\n"
        )
        m = eml_parse(raw)
        assert m["in_reply_to"] is None
        assert m["parent_ref"] == "<b@x>"

    def test_no_threading_headers_is_root(self):
        m = eml_parse(b"From: u@example.com\nMessage-ID: <a@x>\n\nhi\n")
        assert m["in_reply_to"] is None
        assert m["references"] is None
        assert m["parent_ref"] is None

    def test_self_reference_pruned(self):
        raw = (
            b"From: u@example.com\nMessage-ID: <a@x>\n"
            b"In-Reply-To: <a@x>\n\nhi\n"
        )
        assert eml_parse(raw)["parent_ref"] is None

    def test_in_reply_to_first_token_wins(self):
        raw = (
            b"From: u@example.com\nMessage-ID: <c@x>\n"
            b"In-Reply-To: <p1@x> <p2@x>\n\nhi\n"
        )
        assert eml_parse(raw)["parent_ref"] == "<p1@x>"

    def test_mbox_roundtrips_threading_headers(self, spark, tmp_path):
        from soda_spark_spark.sources.mbox import read_mbox, write_mbox

        msgs = [
            b"From: a@x\nMessage-ID: <m0@x>\nSubject: s0\n\nroot\n",
            (
                b"From: b@x\nMessage-ID: <m1@x>\n"
                b"In-Reply-To: <m0@x>\nSubject: s1\n\nreply\n"
            ),
        ]
        write_mbox(msgs, str(tmp_path / "t.mbox"))
        rows = {
            r.message_id: r
            for r in read_mbox(spark, str(tmp_path / "t.mbox")).collect()
        }
        assert rows["<m1@x>"].parent_ref == "<m0@x>"
        assert rows["<m0@x>"].parent_ref is None


class TestMarkdownInlineStack:
    def test_stray_close_emits_nothing(self):
        from soda_spark_spark.operators.html_markdown import html_to_markdown

        assert html_to_markdown("<p>hello</b> world</p>") == "hello world"
        assert html_to_markdown("<p>a</i>b</code>c</p>") == "abc"

    def test_unclosed_emphasis_closes_at_block_end(self):
        from soda_spark_spark.operators.html_markdown import html_to_markdown

        assert html_to_markdown("<p><b>hello</p><p>next</p>") == (
            "**hello**\n\nnext"
        )

    def test_unclosed_link_keeps_url(self):
        from soda_spark_spark.operators.html_markdown import html_to_markdown

        assert html_to_markdown('<p><a href="u">link</p>') == "[link](u)"

    def test_interleaved_tags_close_inner_first(self):
        from soda_spark_spark.operators.html_markdown import html_to_markdown

        # HTML recovery: </b> implicitly closes the inner <i>
        assert html_to_markdown("<p><b>a<i>b</b>c</p>") == "**a*b***c"

    def test_matched_tags_unchanged(self):
        from soda_spark_spark.operators.html_markdown import html_to_markdown

        assert html_to_markdown(
            '<p><b>bold</b> and <a href="u">link</a></p>'
        ) == "**bold** and [link](u)"


class TestLengthBucketsQuotedNames:
    @pytest.mark.parametrize(
        "name", ["n tokens", "n.tokens", "n-tokens", "select"]
    )
    def test_weird_column_names(self, spark, name):
        from soda_spark_spark.operators.packing import length_buckets

        df = spark.createDataFrame(
            [(17,), (100,), (None,)], f"`{name}` long"
        )
        got = {
            r.bucket: r.n_docs
            for r in length_buckets(df, name).collect()
        }
        assert got == {32: 1, 128: 1, None: 1}


class TestToolcallOrphanRoleLaw:
    def _validate(self, spark, conv: str):
        from soda_spark_spark.operators.chat import validate_tool_calls

        df = spark.createDataFrame([(1, conv)], "id long, conv string")
        return validate_tool_calls(df, "id", "conv").collect()[0]

    def test_tool_turn_carrying_calls_does_not_answer(self, spark):
        # a (malformed) tool-role turn carrying tool_calls used to
        # satisfy the orphan exists-scan; the law is: only an earlier
        # ASSISTANT turn's call answers a result
        conv = (
            '[{"role":"tool","content":"x",'
            '"tool_calls":[{"id":"c1","name":"f","arguments":"{}"}]},'
            '{"role":"tool","content":"y","tool_call_id":"c1"}]'
        )
        row = self._validate(spark, conv)
        # BOTH tool turns are orphans: the result (its call lives in a
        # tool turn, not an assistant turn) and the malformed carrier
        # itself (a tool turn with no tool_call_id answers nothing)
        assert row.n_orphan_results == 2
        assert not row.valid

    def test_assistant_call_still_answers(self, spark):
        conv = (
            '[{"role":"assistant","content":"",'
            '"tool_calls":[{"id":"c1","name":"f","arguments":"{}"}]},'
            '{"role":"tool","content":"y","tool_call_id":"c1"}]'
        )
        row = self._validate(spark, conv)
        assert row.n_orphan_results == 0
        assert row.n_unanswered == 0


class TestEvalsCaseInsensitive:
    def test_upper_case_outcomes_count(self, spark):
        from soda_spark_spark.operators.evals import pairwise_win_rates

        df = spark.createDataFrame(
            [("m0", "m1", "A"), ("m0", "m1", "a"),
             ("m1", "m0", "B"), ("m0", "m1", "TIE"),
             ("m0", "m1", "junk")],
            "ma string, mb string, o string",
        )
        row = pairwise_win_rates(df, "ma", "mb", "o").collect()[0]
        assert (row.model_lo, row.model_hi) == ("m0", "m1")
        # 'A','a' -> lo wins; 'B' from the flipped row -> lo wins too
        assert row.wins_lo == 3 and row.ties == 1
        assert row.n_invalid == 1


class TestZlibDecompress:
    def test_raw_zlib_stream_unwraps(self):
        from soda_spark_spark.sources.wiki_dump import _decompress

        plain = b"tfrecord shard bytes " * 100
        z = zlib.compress(plain, 6)
        assert z[:1] == b"\x78"
        assert _decompress(z, "f", 1 << 20) == plain

    def test_all_zlib_levels(self):
        from soda_spark_spark.sources.wiki_dump import _decompress

        plain = b"payload " * 50
        for level in (0, 1, 6, 9):
            c = zlib.compressobj(level)
            z = c.compress(plain) + c.flush()
            assert _decompress(z, "f", 1 << 20) == plain

    def test_truncated_zlib_quarantines(self):
        from soda_spark_spark.sources.wiki_dump import _decompress

        z = zlib.compress(b"x" * 1000)
        with pytest.raises(ValueError, match="truncated"):
            _decompress(z[: len(z) // 2], "f", 1 << 20)

    def test_zlib_bomb_guard(self):
        from soda_spark_spark.sources.wiki_dump import _decompress

        z = zlib.compress(b"\x00" * 100_000)
        with pytest.raises(ValueError, match="exceeds"):
            _decompress(z, "f", 1_000)

    def test_plain_text_starting_with_x_not_mangled(self):
        from soda_spark_spark.sources.wiki_dump import _decompress

        # 'x' followed by a byte that fails the zlib header checksum
        # must pass through untouched
        data = b"xylophone corpus line\n"
        assert _decompress(data, "f", 1 << 20) == data


class TestZlibChaining:
    """Concatenated raw-zlib streams must chain like gzip members —
    silent tail loss is the one unacceptable failure mode."""

    def test_concatenated_streams_chain(self):
        import zlib

        from soda_spark_spark.sources.wiki_dump import _decompress

        data = zlib.compress(b"first ") + zlib.compress(b"second")
        assert _decompress(data, "x.zz", 1 << 20) == b"first second"

    def test_trailing_garbage_raises(self):
        import zlib

        import pytest

        from soda_spark_spark.sources.wiki_dump import _decompress

        data = zlib.compress(b"payload") + b"GARBAGE TAIL"
        with pytest.raises(ValueError, match="trailing data"):
            _decompress(data, "x.zz", 1 << 20)

    def test_nul_padding_after_stream_ok(self):
        import zlib

        from soda_spark_spark.sources.wiki_dump import _decompress

        data = zlib.compress(b"payload") + b"\x00" * 16
        assert _decompress(data, "x.zz", 1 << 20) == b"payload"

    def test_bomb_guard_spans_members(self):
        import zlib

        import pytest

        from soda_spark_spark.sources.wiki_dump import _decompress

        data = zlib.compress(b"a" * 600) + zlib.compress(b"b" * 600)
        with pytest.raises(ValueError, match="exceeds"):
            _decompress(data, "x.zz", 1000)


class TestMessageIdNormalization:
    def test_garnished_message_id_token_extracted(self):
        from soda_spark_spark.operators.mime import eml_parse

        raw = (
            b"From: a@x\n"
            b"Message-ID: <m1@x> (added by gateway)\n\nhi\n"
        )
        assert eml_parse(raw)["message_id"] == "<m1@x>"

    def test_self_reference_pruned_despite_garnish(self):
        from soda_spark_spark.operators.mime import eml_parse

        raw = (
            b"From: a@x\n"
            b"Message-ID: <m1@x> (gateway)\n"
            b"In-Reply-To: <m1@x>\n\nhi\n"
        )
        m = eml_parse(raw)
        assert m["message_id"] == "<m1@x>" and m["parent_ref"] is None

    def test_bracketless_message_id_stripped_not_dropped(self):
        from soda_spark_spark.operators.mime import eml_parse

        raw = b"From: a@x\nMessage-ID: plain-id@x\n\nhi\n"
        assert eml_parse(raw)["message_id"] == "plain-id@x"
