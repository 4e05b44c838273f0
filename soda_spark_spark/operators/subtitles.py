"""Subtitle / caption extraction (SubRip .srt and WebVTT .vtt),
stdlib-only — video corpora carry their text layer as caption files
(ASR output, human subs), and a video-text pretraining pipeline wants
time-aligned cues: per-cue text for alignment/windowing, the joined
transcript for dedup/quality/LM.

Contract (`parse_subtitles`) — deterministic:

- format by content, not extension: a `WEBVTT` header line (optional
  BOM) means VTT, else SRT;
- cues are blank-line-separated blocks with a timing line
  `HH:MM:SS,mmm --> HH:MM:SS.mmm` (SRT comma, VTT dot — BOTH
  accepted in both formats; VTT allows the hour field absent:
  `MM:SS.mmm`); times parse to integer milliseconds;
- the SRT numeric counter line above the timing line drops (it is
  sequencing, not text); a VTT cue identifier line likewise;
- VTT cue settings after the end time (`position:...`, `line:...`)
  drop; VTT `NOTE`/`STYLE`/`REGION` blocks drop whole;
- cue text keeps its internal newlines; inline tags (`<i>`, `<b>`,
  `<c.classname>`, VTT `<00:00:01.000>` word timestamps) strip;
  `&amp;`/`&lt;`/`&gt;`/`&nbsp;` decode;
- a block with no parseable timing line is SKIPPED and counted
  (`n_bad_cues`) — subtitle files in the wild are sloppy and one
  mangled cue must not quarantine a two-hour transcript; a file
  whose HEADER is unparseable (VTT without cues, empty input) just
  yields zero cues;
- cues emit in file order with a 0-based index; overlapping or
  out-of-order timings pass through (they are real and downstream
  alignment owns policy).

Spark surface: `subtitle_cues(df, id_col, payload_col)` -> one row
per cue (id, cue_index, start_ms, end_ms, text) plus per-file
`n_bad_cues`, Arrow-batched `mapInPandas`; UTF-8 with BOM tolerated,
undecodable bytes quarantine via the error row.

Derived from the public SubRip conventions and the W3C WebVTT spec;
the reference (src/sodaspark/scan.py:441) scans already-loaded
frames — caption ingestion is additive surface.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = ["parse_subtitles", "subtitle_cues", "SUBTITLE_SCHEMA"]

SUBTITLE_SCHEMA = (
    "id long, cue_index int, start_ms long, end_ms long, text string,"
    " n_bad_cues int, error string"
)

_TIME = r"(?:(\d{1,2}):)?(\d{2}):(\d{2})[.,](\d{3})"
_TIMING = re.compile(
    rf"^[ \t]*{_TIME}[ \t]+-->[ \t]+{_TIME}(?:[ \t]+(?P<settings>.*))?$"
)
_TAG = re.compile(r"</?[A-Za-z][^>]*>|<\d{2}:\d{2}:\d{2}[.,]\d{3}>")
_ENTITIES = {"&amp;": "&", "&lt;": "<", "&gt;": ">", "&nbsp;": " "}


def _ms(h, m, s, ms) -> int:
    return (
        (int(h) if h else 0) * 3600_000
        + int(m) * 60_000
        + int(s) * 1000
        + int(ms)
    )


def _clean_text(lines: list[str]) -> str:
    out = []
    for ln in lines:
        ln = _TAG.sub("", ln)
        for ent, ch in _ENTITIES.items():
            ln = ln.replace(ent, ch)
        out.append(ln.rstrip())
    return "\n".join(out).strip("\n")


def parse_subtitles(payload: bytes | str) -> tuple[list[dict], int]:
    """Module contract: ([{cue_index, start_ms, end_ms, text}, ...],
    n_bad_cues). Raises ValueError on undecodable bytes."""
    if isinstance(payload, (bytes, bytearray)):
        raw = bytes(payload)
        if raw[:3] == b"\xef\xbb\xbf":
            raw = raw[3:]
        try:
            payload = raw.decode("utf-8")
        except UnicodeDecodeError as e:
            raise ValueError(f"subtitles are not UTF-8: {e}") from None
    text = payload.replace("\r\n", "\n").replace("\r", "\n")
    lines = text.split("\n")
    is_vtt = bool(lines) and lines[0].strip().startswith("WEBVTT")
    if is_vtt:
        lines = lines[1:]
    # split into blank-line-separated blocks
    blocks: list[list[str]] = []
    cur: list[str] = []
    for ln in lines:
        if ln.strip() == "":
            if cur:
                blocks.append(cur)
                cur = []
        else:
            cur.append(ln)
    if cur:
        blocks.append(cur)
    cues: list[dict] = []
    bad = 0
    for block in blocks:
        head = block[0].strip()
        if is_vtt and head.split(" ")[0] in ("NOTE", "STYLE", "REGION"):
            continue
        timing_at = None
        m = None
        for i, ln in enumerate(block[:2]):
            m = _TIMING.match(ln)
            if m:
                timing_at = i
                break
        if timing_at is None:
            bad += 1
            continue
        start = _ms(*m.groups()[0:4])
        end = _ms(*m.groups()[4:8])
        body = _clean_text(block[timing_at + 1 :])
        cues.append(dict(
            cue_index=len(cues), start_ms=start, end_ms=end, text=body,
        ))
    return cues, bad


def subtitle_cues(
    df: DataFrame, id_col: str, payload_col: str
) -> DataFrame:
    """One row per cue; a file with zero parseable cues still yields
    one row (null cue fields) carrying its n_bad_cues, so sloppy
    files stay visible to the census."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for rid, payload in zip(
                pdf[id_col].values, pdf[payload_col].values
            ):
                rid = int(rid)
                try:
                    cues, bad = parse_subtitles(payload)
                    if not cues:
                        rows.append((rid, None, None, None, None,
                                     bad, None))
                    for c in cues:
                        rows.append((
                            rid, c["cue_index"], c["start_ms"],
                            c["end_ms"], c["text"], bad, None,
                        ))
                except ValueError as e:
                    rows.append((rid, None, None, None, None, None,
                                 str(e)))
            yield pd.DataFrame(
                rows,
                columns=["id", "cue_index", "start_ms", "end_ms",
                         "text", "n_bad_cues", "error"],
            ).astype({
                "cue_index": "Int32", "start_ms": "Int64",
                "end_ms": "Int64", "n_bad_cues": "Int32",
            })

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=SUBTITLE_SCHEMA
    )
