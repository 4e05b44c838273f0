"""RFC-5322 / MIME email parsing — the EML entry point of the corpus
family. Mail archives (mailing lists, support desks, Enron-style
corpora) arrive as raw RFC-5322 messages: headers with RFC-2047
encoded words, multipart MIME trees, base64 / quoted-printable
transfer encodings, and attachments that a text pipeline must census
but never inline. `operators/email_text.py` owns the PLAIN-TEXT
cleanup (quote/signature stripping); this module owns the byte->text
boundary in front of it.

Contract (`eml_parse` / `eml_extract`):

- headers: `from_addr` + `from_name` (RFC-2047-decoded, address
  split via the stdlib address parser), `to_addrs` (the decoded To
  header verbatim — recipient-list normalization is a downstream
  policy), `subject` (decoded), `date_iso` (the Date header parsed
  to an ISO-8601 string, None when absent or unparseable — the
  weekday name is ignored, per the stdlib parser), `message_id`
  (verbatim, angle brackets kept).
- threading headers (round 18 — the columns that let
  `thread_emails` run from PARSED mail instead of synthesized
  fixtures): `in_reply_to` and `references` verbatim (decoded,
  whitespace-folded by the stdlib), plus the derived `parent_ref` —
  the effective parent Message-ID for threading: the FIRST
  `<msg-id>` token of In-Reply-To when present, else the LAST token
  of References (the RFC 5322 ancestor chain ends at the immediate
  parent — the JWZ-threading fallback old archives need, where
  clients set References but not In-Reply-To). A `parent_ref` equal
  to the message's own Message-ID is a broken-client self-reference
  and nulls out (JWZ prunes self-loops).
- body: the FIRST `text/plain` leaf wins (`body_source='plain'`);
  otherwise the first `text/html` leaf routed through the existing
  HTML extractor (`body_source='html'`); otherwise None. The
  transfer encoding (base64 / quoted-printable / 7bit/8bit) and
  charset are decoded by the stdlib policy machinery; trailing
  newlines are stripped (transport artifact, not content).
- attachments are censused, never inlined: a part counts as an
  attachment when its Content-Disposition is `attachment` OR its
  content maintype is `message` (a forwarded message/rfc822 is an
  attached document whatever its disposition says). The ENTIRE
  subtree of an attachment is skipped — a forwarded message's inner
  text/plain must never hijack body selection, and its nested
  leaves are the attachment's internals, not this message's parts
  (round-18 fix; previously a message/rfc822 container passed the
  is_multipart() skip before the disposition check, so its inner
  body won body selection while n_attachments stayed 0).
  `n_attachments`, `attachment_bytes` (decoded payload bytes; for a
  message/rfc822 part, the embedded message's serialized bytes),
  `attachment_types` (sorted unique content types, comma-joined — a
  string, not an array, so the census stays SQL-comparable).
- `n_parts` counts LEAF parts plus attachment containers (an
  attached message is ONE part; multipart structure is not
  content).
- quarantine: a payload with no parseable header line at all raises
  ValueError -> the operator's `error` column; the stdlib parser is
  deliberately tolerant beyond that (a truncated body is a short
  message, not a crash).

Scale shape: `eml_extract` is Arrow-batched `mapInPandas` over a
two-column pruned select — identical plumbing to the PDF/office
extractors; per-message Python parsing is inherent to RFC-5322 (the
grammar is not columnar), and the stdlib parser is C-accelerated
where it matters (base64/QP codecs).

Derived from RFC 5322 / RFC 2045-2047 via the Python stdlib `email`
package (public). The reference (src/sodaspark/scan.py:441) scans
already-loaded frames — mail ingestion is additive surface.
"""

from __future__ import annotations

import re
from typing import Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["eml_parse", "eml_extract", "thread_emails", "EML_SCHEMA"]

EML_SCHEMA = (
    " from_addr string, from_name string, to_addrs string,"
    " subject string, date_iso string, message_id string,"
    " in_reply_to string, references string, parent_ref string,"
    " body_text string, body_source string, n_parts int,"
    " n_attachments int, attachment_bytes long,"
    " attachment_types string, error string"
)

_MSGID = re.compile(r"<[^<>]+>")


def _attachment_nbytes(part) -> int:
    raw = part.get_payload(decode=True)
    if raw is not None:
        return len(raw)
    try:
        # message/rfc822: the payload is the embedded message object;
        # the attachment's size is that message serialized
        payload = part.get_payload()
        if isinstance(payload, list):
            return sum(len(p.as_bytes()) for p in payload)
    except Exception:
        pass
    return 0


def _decode_text_part(part) -> str | None:
    try:
        return part.get_content()
    except Exception:
        # undecodable charset / broken CTE: fall back to the raw
        # payload bytes decoded permissively — a mangled body is
        # still corpus text, not a quarantine
        raw = part.get_payload(decode=True)
        if raw is None:
            return None
        return raw.decode("utf-8", errors="replace")


def eml_parse(payload: bytes) -> dict[str, Any]:
    """One census dict per message (module contract). ValueError on
    a payload with no parseable headers at all."""
    import email
    import email.policy
    import email.utils

    msg = email.message_from_bytes(bytes(payload), policy=email.policy.default)
    if not msg.keys():
        raise ValueError("not an RFC-5322 message: no headers")

    # each msg[...] access re-runs the full RFC 5322 header parser
    # (policy.default does not cache) — fetch every header exactly once
    h_from = msg["From"]
    h_date = msg["Date"]
    h_mid = msg["Message-ID"]
    h_irt = msg["In-Reply-To"]
    h_refs = msg["References"]
    h_to = msg["To"]
    h_subj = msg["Subject"]

    from_name, from_addr = (None, None)
    if h_from is not None:
        from_name, from_addr = email.utils.parseaddr(str(h_from))
        from_name = from_name or None
        from_addr = from_addr or None

    date_iso = None
    if h_date is not None:
        try:
            dt = email.utils.parsedate_to_datetime(str(h_date))
            date_iso = dt.isoformat() if dt is not None else None
        except (TypeError, ValueError):
            date_iso = None

    message_id = str(h_mid) if h_mid is not None else None
    if message_id is not None:
        # normalize to the <...> token: real archives garnish the
        # header ("<a@x> (added by gateway)", folded whitespace) and
        # thread_emails joins message_id == parent_ref, which is
        # always a clean token (round-18 self-review)
        mid_tokens = _MSGID.findall(message_id)
        message_id = mid_tokens[0] if mid_tokens else message_id.strip()
    in_reply_to = str(h_irt) if h_irt is not None else None
    references = str(h_refs) if h_refs is not None else None
    ref_ids = _MSGID.findall(in_reply_to or "")
    if ref_ids:
        parent_ref = ref_ids[0]
    else:
        # JWZ fallback: References is the root->parent ancestor chain,
        # so its LAST msg-id is the immediate parent
        chain = _MSGID.findall(references or "")
        parent_ref = chain[-1] if chain else None
    if parent_ref is not None and parent_ref == message_id:
        parent_ref = None  # broken-client self-reference

    st = dict(plain=None, html=None, n_parts=0, n_att=0, att_bytes=0)
    attachment_types: set[str] = set()

    def census(container) -> None:
        for part in container.iter_parts():
            ctype = part.get_content_type()
            # get_content_maintype() is defined as the '/' split of
            # get_content_type() — derive it instead of re-running the
            # content-type header parse a second time per part
            if (
                part.get_content_disposition() == "attachment"
                or ctype.partition("/")[0] == "message"
            ):
                # attachment (incl. forwarded message/rfc822): census
                # as ONE part, skip the whole subtree — its internals
                # must not reach body selection
                st["n_parts"] += 1
                st["n_att"] += 1
                attachment_types.add(ctype)
                st["att_bytes"] += _attachment_nbytes(part)
                continue
            if part.is_multipart():
                census(part)
                continue
            st["n_parts"] += 1
            if ctype == "text/plain" and st["plain"] is None:
                st["plain"] = _decode_text_part(part)
            elif ctype == "text/html" and st["html"] is None:
                st["html"] = _decode_text_part(part)

    root_ctype = msg.get_content_type()
    if (
        msg.get_content_disposition() == "attachment"
        or root_ctype.partition("/")[0] == "message"
    ):
        # the child-level attachment rule applies at depth 0 too: a
        # TOP-LEVEL message/rfc822 wrapper (a bare forwarded message)
        # or an attachment-disposition root is ONE attachment — its
        # embedded parts must not reach body selection (round-19
        # advice: is_multipart() is True for message/rfc822, so the
        # plain recursion let the inner text/plain hijack the body)
        st["n_parts"] = 1
        st["n_att"] = 1
        attachment_types.add(root_ctype)
        st["att_bytes"] += _attachment_nbytes(msg)
    elif msg.is_multipart():
        census(msg)
    else:
        st["n_parts"] = 1
        ctype = root_ctype
        if ctype == "text/plain":
            st["plain"] = _decode_text_part(msg)
        elif ctype == "text/html":
            st["html"] = _decode_text_part(msg)

    plain_body = st["plain"]
    html_body = st["html"]

    body_text: str | None = None
    body_source: str | None = None
    if plain_body is not None:
        body_text, body_source = plain_body, "plain"
    elif html_body is not None:
        from soda_spark_spark.operators.html_text import html_to_text

        body_text, body_source = html_to_text(html_body), "html"
    if body_text is not None:
        # CRLF is the wire framing, trailing newlines the transport
        # artifact — neither is content
        body_text = body_text.replace("\r\n", "\n").rstrip("\n")

    return dict(
        from_addr=from_addr,
        from_name=from_name,
        to_addrs=str(h_to) if h_to is not None else None,
        subject=str(h_subj) if h_subj is not None else None,
        date_iso=date_iso,
        message_id=message_id,
        in_reply_to=in_reply_to,
        references=references,
        parent_ref=parent_ref,
        body_text=body_text,
        body_source=body_source,
        n_parts=st["n_parts"],
        n_attachments=st["n_att"],
        attachment_bytes=st["att_bytes"],
        attachment_types=",".join(sorted(attachment_types)) or None,
    )


def eml_extract(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """One census row per message; unparseable payloads quarantine
    via the error column. Arrow-batched, two-column pruned scan."""
    from soda_spark_spark.operators.multimodal import _with_id_type

    schema = _with_id_type("id long," + EML_SCHEMA, df, id_col)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        cols = [
            "id", "from_addr", "from_name", "to_addrs", "subject",
            "date_iso", "message_id", "in_reply_to", "references",
            "parent_ref", "body_text", "body_source",
            "n_parts", "n_attachments", "attachment_bytes",
            "attachment_types", "error",
        ]
        for pdf in batches:
            rows = []
            for rid, payload in zip(
                pdf[id_col].values, pdf[payload_col].values
            ):
                rid = int(rid)
                try:
                    m = eml_parse(bytes(payload))
                    rows.append(
                        (rid,) + tuple(m[c] for c in cols[1:-1]) + (None,)
                    )
                except Exception as exc:  # quarantine, never crash
                    rows.append(
                        (rid,) + (None,) * (len(cols) - 2)
                        + (f"{type(exc).__name__}: {exc}"[:500],)
                    )
            out = pd.DataFrame(rows, columns=cols)
            for c in ("n_parts", "n_attachments"):
                out[c] = pd.array(out[c], dtype="Int32")
            out["attachment_bytes"] = pd.array(
                out["attachment_bytes"], dtype="Int64"
            )
            yield out

    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)


def thread_emails(
    df: DataFrame,
    id_col: str,
    message_id_col: str,
    in_reply_to_col: str,
    *,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Reconstruct mail threads from In-Reply-To references — thread
    structure is what turns a mail corpus into CONVERSATIONS
    (`operators/chat.py` consumes the result). Parent resolution is
    one self-equi-join on the Message-ID key; thread membership is
    the transitive closure over resolved parent edges, delegated to
    `dedup.connected_components` (min-row-id labels, superstep
    materialization, driver union-find below its adaptive cutoff —
    the same certified machinery the near-dup graphs ride).

    Output per message: `parent_id` (the parent's row id, null when
    the message replies to nothing we hold), `dangling_ref` (it
    NAMED a parent we don't hold — common in partial archives; such
    a message roots its own sub-thread, honestly flagged),
    `thread_id` (min row id in the connected thread; singletons
    label themselves), `is_root` (no resolved parent), and
    `thread_size`. One equi-join + the closure + one thread-size
    groupBy; every shuffle keys on message/thread ids."""
    from soda_spark_spark.operators.dedup import connected_components

    mid, irt = F.col(message_id_col), F.col(in_reply_to_col)
    msgs = df.select(
        F.col(id_col).alias("id"),
        mid.alias("_mid"),
        irt.alias("_irt"),
    )
    parents = msgs.select(
        F.col("id").alias("parent_id"), F.col("_mid").alias("_pmid")
    )
    # duplicate Message-IDs exist in real archives (resent mail,
    # broken clients): resolve to the MINIMUM candidate row id so a
    # child never fans out into two rows and re-runs are identical.
    # A row never parents itself (duplicate-mid self-hit).
    resolved = msgs.join(
        parents,
        (msgs["_irt"] == parents["_pmid"]) & (msgs["id"] != parents["parent_id"]),
        "left",
    ).groupBy("id", "_mid", "_irt").agg(
        F.min("parent_id").alias("parent_id")
    ).select(
        "id", "_mid", "_irt", "parent_id",
        (F.col("_irt").isNotNull() & F.col("parent_id").isNull())
        .alias("dangling_ref"),
    )
    edges = resolved.filter(F.col("parent_id").isNotNull()).select(
        F.col("id").alias("id_a"), F.col("parent_id").alias("id_b")
    )
    labels = connected_components(
        edges, checkpoint_dir=checkpoint_dir
    ).withColumnRenamed("comp", "thread_id")
    out = resolved.join(labels, "id", "left").select(
        "id",
        F.col("_mid").alias(message_id_col),
        "parent_id",
        "dangling_ref",
        # a message with no resolved edges is its own thread
        F.coalesce(F.col("thread_id"), F.col("id")).alias("thread_id"),
        F.col("parent_id").isNull().alias("is_root"),
    )
    sizes = out.groupBy("thread_id").agg(
        F.count(F.lit(1)).cast("long").alias("thread_size")
    )
    return out.join(sizes, "thread_id").select(
        "id", message_id_col, "parent_id", "dangling_ref",
        "thread_id", "is_root", "thread_size",
    )
