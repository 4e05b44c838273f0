"""EML/MIME parsing (`operators/mime.py`) and mbox ingestion
(`sources/mbox.py`): header decoding, body selection, transfer
encodings, attachment census, the quarantine contract, mboxrd
escaping, and the distributed read."""

from __future__ import annotations

import base64
import gzip

import pytest

from soda_spark_spark.operators.mime import eml_extract, eml_parse
from soda_spark_spark.sources.mbox import (
    read_mbox,
    split_mbox,
    write_mbox,
)


def _simple(d: int, body: str = "") -> bytes:
    return (
        f'From: "User {d}" <u{d}@example.com>\n'
        f"To: a{d}@example.com, b{d}@example.com\n"
        f"Subject: Msg {d}\n"
        f"Date: Wed, 01 Jan 2020 00:{d % 60:02d}:{(d * 7) % 60:02d} +0000\n"
        f"Message-ID: <m{d}@example.com>\n"
        "\n"
        f"{body or f'Body {d}'}\n"
    ).encode()


def test_eml_headers_and_plain_body():
    m = eml_parse(_simple(7))
    assert m["from_addr"] == "u7@example.com"
    assert m["from_name"] == "User 7"
    assert m["to_addrs"] == "a7@example.com, b7@example.com"
    assert m["subject"] == "Msg 7"
    assert m["date_iso"] == "2020-01-01T00:07:49+00:00"
    assert m["message_id"] == "<m7@example.com>"
    assert m["body_text"] == "Body 7"
    assert m["body_source"] == "plain"
    assert m["n_parts"] == 1 and m["n_attachments"] == 0


def test_eml_rfc2047_subject_and_qp_body():
    raw = (
        b"From: u@example.com\n"
        b"Subject: =?utf-8?q?Caf=C3=A9_9?=\n"
        b"Content-Type: text/plain; charset=utf-8\n"
        b"Content-Transfer-Encoding: quoted-printable\n"
        b"\nCaf=C3=A9 body 9\n"
    )
    m = eml_parse(raw)
    assert m["subject"] == "Café 9"
    assert m["body_text"] == "Café body 9"


def test_eml_base64_body_and_crlf_normalization():
    enc = base64.b64encode("ligne un\r\nligne deux\r\n".encode()).decode()
    raw = (
        "From: u@example.com\nSubject: b\n"
        "Content-Type: text/plain; charset=utf-8\n"
        "Content-Transfer-Encoding: base64\n\n" + enc + "\n"
    ).encode()
    assert eml_parse(raw)["body_text"] == "ligne un\nligne deux"


def test_eml_multipart_plain_wins_over_html():
    raw = (
        b"From: u@example.com\nMIME-Version: 1.0\n"
        b'Content-Type: multipart/alternative; boundary="B"\n\n'
        b"--B\nContent-Type: text/plain\n\nplain wins\n"
        b"--B\nContent-Type: text/html\n\n<p>html loses</p>\n--B--\n"
    )
    m = eml_parse(raw)
    assert m["body_text"] == "plain wins"
    assert m["body_source"] == "plain" and m["n_parts"] == 2


def test_eml_html_fallback_and_attachment_census():
    att = base64.b64encode(b"X" * 17).decode()
    raw = (
        "From: u@example.com\nMIME-Version: 1.0\n"
        'Content-Type: multipart/mixed; boundary="B"\n\n'
        "--B\nContent-Type: text/html\n\n<p>Html body</p>\n"
        "--B\nContent-Type: application/octet-stream\n"
        'Content-Disposition: attachment; filename="a.bin"\n'
        "Content-Transfer-Encoding: base64\n\n" + att + "\n--B--\n"
    ).encode()
    m = eml_parse(raw)
    assert m["body_text"] == "Html body" and m["body_source"] == "html"
    assert m["n_attachments"] == 1
    assert m["attachment_bytes"] == 17
    assert m["attachment_types"] == "application/octet-stream"


def test_eml_quarantine_on_headerless_junk():
    with pytest.raises(ValueError, match="no headers"):
        eml_parse(b"\x00\x01 not a message")


def test_eml_missing_date_and_bad_date():
    m = eml_parse(b"From: u@example.com\n\nx\n")
    assert m["date_iso"] is None
    m = eml_parse(b"From: u@example.com\nDate: not a date\n\nx\n")
    assert m["date_iso"] is None


def test_eml_extract_operator(spark):
    rows = [(1, bytearray(_simple(1))), (2, bytearray(b"\x00junk"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.id: r for r in eml_extract(df, "doc_id", "payload").collect()}
    assert got[1].subject == "Msg 1" and got[1].error is None
    assert got[2].error is not None and got[2].subject is None


# ------------------------------------------------------------- mbox


def test_mbox_roundtrip_with_mboxrd_escaping():
    msgs = [_simple(1, body="From the top\nBody 1"), _simple(2)]
    import tempfile

    p = tempfile.mktemp()
    write_mbox(msgs, p)
    data = open(p, "rb").read()
    assert b"\n>From the top\n" in data
    back = split_mbox(data)
    assert len(back) == 2
    assert back[0].rstrip(b"\n") == msgs[0].rstrip(b"\n")
    assert back[1].rstrip(b"\n") == msgs[1].rstrip(b"\n")


def test_mbox_not_an_mbox_raises():
    with pytest.raises(ValueError, match="not an mbox"):
        split_mbox(b"plain text file\n")
    with pytest.raises(ValueError, match="not an mbox"):
        split_mbox(b"")


def test_mbox_double_escape_sheds_one_level():
    raw = (
        b"From sep\n"
        b"From: u@example.com\n\n"
        b">>From deep\n"
    )
    assert split_mbox(raw)[0].endswith(b">From deep\n")


def test_read_mbox_distributed(spark, tmp_path):
    msgs1 = [_simple(d) for d in (0, 3)]
    msgs2 = [_simple(d) for d in (1, 4)]
    write_mbox(msgs1, str(tmp_path / "a.mbox"))
    write_mbox(msgs2, str(tmp_path / "b.mbox.gz"), compress="gzip")
    # a non-mbox file must quarantine as one row, not vanish
    (tmp_path / "c.mbox").write_bytes(b"not mail\n")
    out = read_mbox(spark, str(tmp_path / "*.mbox*")).collect()
    good = [r for r in out if r.error is None]
    bad = [r for r in out if r.error is not None]
    assert len(good) == 4 and len(bad) == 1
    assert {(r.subject, r.msg_index) for r in good} == {
        ("Msg 0", 0), ("Msg 3", 1), ("Msg 1", 0), ("Msg 4", 1),
    }
    assert "not an mbox" in bad[0].error


def test_read_mbox_gzip_multimember(spark, tmp_path):
    # two gzip members concatenated: the round-17 _decompress chain
    # must surface messages from BOTH
    import io

    msgs = [_simple(5)], [_simple(6)]
    bufs = []
    for group in msgs:
        q = io.BytesIO()
        write_mbox(group, str(tmp_path / "tmp.mbox"))
        bufs.append(gzip.compress(
            (tmp_path / "tmp.mbox").read_bytes(), mtime=0
        ))
    (tmp_path / "multi.mbox.gz").write_bytes(b"".join(bufs))
    (tmp_path / "tmp.mbox").unlink()
    out = read_mbox(spark, str(tmp_path / "multi.mbox.gz")).collect()
    assert {r.subject for r in out} == {"Msg 5", "Msg 6"}


# -------------------------------------------------------- threading


def test_thread_emails_chains_and_dangling(spark):
    from soda_spark_spark.operators.mime import thread_emails

    rows = [
        (0, "<m0>", None), (1, "<m1>", "<m0>"), (2, "<m2>", "<m1>"),
        (3, "<m3>", None),                       # singleton
        (4, "<m4>", "<gone>"),                   # dangling ref
        (5, "<m5>", None), (6, "<m6>", "<m5>"),
    ]
    df = spark.createDataFrame(rows, "id long, mid string, irt string")
    got = {r.id: r for r in thread_emails(df, "id", "mid", "irt").collect()}
    assert got[2].parent_id == 1 and got[2].thread_id == 0
    assert got[0].is_root and got[0].thread_size == 3
    assert got[3].thread_id == 3 and got[3].thread_size == 1
    # a dangling reference roots its own thread, honestly flagged
    assert got[4].dangling_ref and got[4].is_root
    assert got[4].parent_id is None and got[4].thread_id == 4
    assert got[6].thread_id == 5 and got[5].thread_size == 2
    assert not got[0].dangling_ref


def test_thread_emails_forest_merges_via_shared_root(spark):
    from soda_spark_spark.operators.mime import thread_emails

    # two siblings replying to one root: one thread of 3
    rows = [(10, "<a>", None), (11, "<b>", "<a>"), (12, "<c>", "<a>")]
    df = spark.createDataFrame(rows, "id long, mid string, irt string")
    got = {r.id: r for r in thread_emails(df, "id", "mid", "irt").collect()}
    assert {got[i].thread_id for i in (10, 11, 12)} == {10}
    assert got[10].thread_size == 3


def test_thread_emails_duplicate_message_ids_no_fanout(spark):
    # two messages claim the same Message-ID: a reply to it must
    # resolve to ONE deterministic parent (min row id), never two rows
    from soda_spark_spark.operators.mime import thread_emails

    rows = [
        (1, "<dup>", None), (2, "<dup>", None), (3, "<m3>", "<dup>"),
    ]
    df = spark.createDataFrame(rows, "id long, mid string, irt string")
    out = thread_emails(df, "id", "mid", "irt").collect()
    assert len(out) == 3  # no fan-out
    got = {r.id: r for r in out}
    assert got[3].parent_id == 1 and got[3].thread_id == 1


# ---------------------------------------------- round-18: split read


def _mk_messages(n: int) -> list[bytes]:
    msgs = []
    for i in range(n):
        body = f"From line {i}\nBody {i} " + "x" * (i % 37) + "\n"
        msgs.append(
            (
                f"From: u{i}@example.com\nSubject: Msg {i}\n"
                f"Message-ID: <m{i}@x>\n\n{body}"
            ).encode()
        )
    return msgs


def _rows_key(df):
    return sorted(
        (r.msg_index, r.subject, r.body_text, r.error)
        for r in df.collect()
    )


def test_read_mbox_split_equals_whole(spark, tmp_path):
    from soda_spark_spark.sources.mbox import (
        read_mbox,
        read_mbox_split,
        write_mbox,
    )

    p = tmp_path / "big.mbox"
    write_mbox(_mk_messages(40), str(p))
    whole = read_mbox(spark, str(p))
    # 256-byte chunks force MANY boundaries, including mid-message
    split = read_mbox_split(spark, str(p), chunk_bytes=256)
    assert _rows_key(split) == _rows_key(whole)


def test_plan_chunks_parallelism_and_compressed_fallback():
    from soda_spark_spark.sources.mbox import _plan_chunks

    chunks = _plan_chunks("f", 10_000, b"From", 256)
    assert len(chunks) == 40  # real byte-range parallelism
    assert chunks[0][1:3] == (0, 256) and chunks[-1][2] == 10_000
    assert all(not c[4] for c in chunks)
    # gzip/bz2/zlib heads -> ONE whole-file chunk
    for head in (b"\x1f\x8b\x08\x00", b"BZh9", b"\x78\x9c\x01\x02"):
        assert _plan_chunks("f", 10_000, head, 256) == [
            ("f", 0, 10_000, 10_000, True)
        ]


def test_read_mbox_split_boundary_never_cuts_message(spark, tmp_path):
    from soda_spark_spark.sources.mbox import read_mbox_split, write_mbox

    # one message far larger than the chunk size: the owning chunk
    # must stitch forward across many chunk ends
    msgs = [
        b"From: a@x\nSubject: small\n\nhi\n",
        (
            b"From: b@x\nSubject: big\n\n" + b"y" * 5000 + b"\n"
        ),
        b"From: c@x\nSubject: tail\n\nbye\n",
    ]
    write_mbox(msgs, str(tmp_path / "m.mbox"))
    out = read_mbox_split(
        spark, str(tmp_path / "m.mbox"), chunk_bytes=512
    )
    rows = {r.msg_index: r for r in out.collect()}
    assert len(rows) == 3
    assert rows[1].subject == "big" and len(rows[1].body_text) == 5000
    assert all(r.error is None for r in rows.values())


def test_read_mbox_split_compressed_falls_back_whole(spark, tmp_path):
    from soda_spark_spark.sources.mbox import (
        read_mbox,
        read_mbox_split,
        write_mbox,
    )

    write_mbox(
        _mk_messages(7), str(tmp_path / "c.mbox.gz"), compress="gzip"
    )
    whole = read_mbox(spark, str(tmp_path / "c.mbox.gz"))
    split = read_mbox_split(
        spark, str(tmp_path / "c.mbox.gz"), chunk_bytes=64
    )
    assert _rows_key(split) == _rows_key(whole)


def test_read_mbox_split_mboxrd_escape_at_boundary(spark, tmp_path):
    from soda_spark_spark.sources.mbox import read_mbox_split, write_mbox

    # bodies full of 'From ' lines (escaped on disk as '>From '):
    # no chunk may mistake an escaped line for a separator
    msgs = [
        (
            f"From: u{i}@x\nSubject: s{i}\n\n"
            + "From the desk\n" * 10
        ).encode()
        for i in range(6)
    ]
    write_mbox(msgs, str(tmp_path / "e.mbox"))
    out = read_mbox_split(
        spark, str(tmp_path / "e.mbox"), chunk_bytes=128
    )
    rows = sorted(out.collect(), key=lambda r: r.msg_index)
    assert len(rows) == 6
    for r in rows:
        assert r.body_text.count("From the desk") == 10


def test_read_mbox_split_not_an_mbox_error_row(spark, tmp_path):
    from soda_spark_spark.sources.mbox import read_mbox_split

    (tmp_path / "junk.mbox").write_bytes(b"just some text\nno seps\n")
    rows = read_mbox_split(
        spark, str(tmp_path / "junk.mbox"), chunk_bytes=8
    ).collect()
    assert len(rows) == 1
    assert rows[0].msg_index is None and "bad mbox" in rows[0].error


def test_read_mbox_split_glob_multiple_files(spark, tmp_path):
    from soda_spark_spark.sources.mbox import (
        read_mbox,
        read_mbox_split,
        write_mbox,
    )

    write_mbox(_mk_messages(5), str(tmp_path / "a.mbox"))
    write_mbox(_mk_messages(9)[5:], str(tmp_path / "b.mbox"))
    whole = read_mbox(spark, str(tmp_path / "*.mbox"))
    split = read_mbox_split(
        spark, str(tmp_path / "*.mbox"), chunk_bytes=200
    )
    def key(df):
        return sorted(
            (r.msg_index, r.subject, r.body_text) for r in df.collect()
        )
    assert key(split) == key(whole)


def test_read_mbox_split_bad_head_poisons_whole_file(spark, tmp_path):
    """A garbage head must quarantine the WHOLE multi-chunk file as
    ONE error row — later chunks' messages must not leak (round-18
    self-review: they used to, breaking the split law)."""
    from soda_spark_spark.sources.mbox import (
        read_mbox,
        read_mbox_split,
        write_mbox,
    )

    write_mbox(_mk_messages(12), str(tmp_path / "tmp.mbox"))
    good = (tmp_path / "tmp.mbox").read_bytes()
    (tmp_path / "bad.mbox").write_bytes(b"GARBAGE not a sep\n" + good)
    whole = read_mbox(spark, str(tmp_path / "bad.mbox")).collect()
    split = read_mbox_split(
        spark, str(tmp_path / "bad.mbox"), chunk_bytes=512
    ).collect()
    assert len(whole) == len(split) == 1
    assert split[0].msg_index is None
    assert split[0].error == whole[0].error
    assert "content before first" in split[0].error


def test_read_mbox_split_leading_whitespace_is_legal(spark, tmp_path):
    """Blank lines before the first separator are fine (split_mbox's
    .strip() law) — even when the first separator sits past the first
    chunk boundary, which the forward head-scan must tolerate."""
    from soda_spark_spark.sources.mbox import (
        read_mbox,
        read_mbox_split,
        write_mbox,
    )

    write_mbox(_mk_messages(6), str(tmp_path / "tmp.mbox"))
    good = (tmp_path / "tmp.mbox").read_bytes()
    (tmp_path / "ws.mbox").write_bytes(b"\n\n   \n\n" + good)
    assert _rows_key(
        read_mbox_split(spark, str(tmp_path / "ws.mbox"), chunk_bytes=3)
    ) == _rows_key(read_mbox(spark, str(tmp_path / "ws.mbox")))


def test_read_mbox_split_empty_file_yields_no_rows(spark, tmp_path):
    """A zero-byte file produces NO rows from read_mbox (binaryFile
    skips it) — the split planner must plan no chunks for it."""
    from soda_spark_spark.sources.mbox import read_mbox_split, write_mbox

    (tmp_path / "empty.mbox").write_bytes(b"")
    write_mbox(_mk_messages(3), str(tmp_path / "a.mbox"))
    rows = read_mbox_split(spark, str(tmp_path / "*.mbox")).collect()
    assert len(rows) == 3
    assert all(r.file.endswith("a.mbox") for r in rows)
