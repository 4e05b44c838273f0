"""Office / ebook text extraction, stdlib-only — the remaining
document formats a real corpus ingest meets after HTML
(`html_text.py`) and PDF (`pdf_text.py`): WordprocessingML (.docx),
EPUB, and RTF. All three are fully decodable with the standard
library (zipfile + ElementTree for the OOXML/EPUB zip containers, a
byte-level group parser for RTF), so the text layer of the world's
office documents and ebooks is extractable without a document
library — books and office documents are prime LLM training text
(books corpora, enterprise/government document dumps).

Scope:

- `docx_to_text`: the main document part (`word/document.xml`) of a
  WordprocessingML package — paragraphs (`w:p`, one line each; table
  cells contain their own `w:p` so tables linearize row-major), runs'
  text nodes (`w:t`, entity-decoded by the XML parser), explicit tabs
  (`w:tab`) and breaks (`w:br`/`w:cr`). Headers/footers/footnotes
  live in other package parts and are out of scope (documented, same
  as pdf_text's annotation scope).
- `epub_to_text`: OCF container walk — `META-INF/container.xml` names
  the OPF package document; the OPF `<manifest>` maps ids to hrefs
  and `<spine>` gives reading order; each spine item's (X)HTML is
  extracted with `html_text.html_to_text` (one extractor for all
  HTML in the repo), chapters joined by blank lines.
- `rtf_to_text`: RTF 1.x group/control-word parser — `\\par`/`\\line`
  line breaks, `\\tab`, `\\'xx` codepage escapes (default cp1252,
  `\\ansicpgN` switches), `\\uN` unicode with `\\ucN` fallback
  skipping, ignorable destinations (`{\\*...}`) and the classic
  non-text destinations (fonttbl/colortbl/stylesheet/info/pict/
  fldinst...) skipped as groups.

Explicit quarantine (the `pdf_text` observable-malformedness
contract): OLE/CFB payloads (legacy `.doc` or ENCRYPTED OOXML — both
start with the compound-file magic) raise NotImplementedError; EPUBs
carrying `META-INF/encryption.xml` (DRM) raise NotImplementedError;
truncated/bad zip containers, missing mandatory parts, and malformed
XML raise ValueError. Text-less but well-formed documents yield ''
(the honest answer), never an error.

`write_simple_docx` / `write_simple_epub` / `write_simple_rtf` are
the deterministic fixture halves (the `write_simple_pdf` pattern):
byte-stable writers (fixed zip timestamps, sorted parts) whose output
exercises the real parse path so registry oracles can replay the
expected text closed-form in SQL.

Derived from the public ECMA-376 (OOXML), the IDPF/W3C EPUB OCF/OPF
specs, and the public RTF 1.9.1 specification; the reference
(src/sodaspark/scan.py:441) scans already-loaded frames — binary
document ingestion is additive surface.
"""

from __future__ import annotations

import io
import posixpath
import re
import zipfile
from collections.abc import Iterator
from xml.etree import ElementTree as ET

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "docx_to_text",
    "epub_to_text",
    "rtf_to_text",
    "xlsx_to_cells",
    "xlsx_to_text",
    "pptx_to_text",
    "write_simple_xlsx",
    "write_simple_pptx",
    "docx_text",
    "epub_text",
    "rtf_text",
    "sniff_document_format",
    "sniff_compression",
    "decompress_payload",
    "any_document_to_text",
    "document_text_any",
    "write_simple_docx",
    "write_simple_epub",
    "write_simple_rtf",
]

# compound-file (OLE/CFB) magic: legacy .doc AND password-protected
# OOXML both ship in this container — neither has a readable zip
_OLE_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

# SubRip sniff: an optional numeric counter line, then a timing line —
# the first cue is always within the head
_SRT_HEAD = re.compile(
    rb"^(?:\d{1,6}\s*\n)?\d{1,2}:\d{2}:\d{2},\d{3}\s*-->"
)

OFFICE_TEXT_SCHEMA = "id long, text string, n_chars long, error string"


def _open_zip(payload: bytes, kind: str) -> zipfile.ZipFile:
    if payload[:8] == _OLE_MAGIC:
        raise NotImplementedError(
            f"OLE/CFB container (legacy binary or encrypted {kind}) "
            "is not supported"
        )
    if payload[:2] != b"PK":
        raise ValueError(f"not a ZIP container (no {kind} here)")
    try:
        return zipfile.ZipFile(io.BytesIO(payload))
    except zipfile.BadZipFile as exc:
        raise ValueError(f"bad ZIP container: {exc}") from None


def _local(tag: str) -> str:
    """Namespace-agnostic local name ('{ns}p' -> 'p')."""
    return tag.rsplit("}", 1)[-1]


def _iter_local(root, name: str):
    """All elements under (and including) `root` whose LOCAL tag is
    `name`, in document order — the `{*}` wildcard runs the tag match
    in C instead of a per-element Python `_local` comparison; the root
    check keeps parity with `root.iter()` (iterfind's `.//` never
    yields the root itself)."""
    if _local(root.tag) == name:
        yield root
    yield from root.iterfind(f".//{{*}}{name}")


def docx_to_text(payload: bytes) -> str:
    """Extract the text of a WordprocessingML (.docx) main document
    part (module docstring has the exact scope)."""
    zf = _open_zip(payload, "docx")
    names = set(zf.namelist())
    if "word/document.xml" not in names:
        raise ValueError("zip has no word/document.xml — not a DOCX")
    try:
        root = ET.fromstring(zf.read("word/document.xml"))
    except ET.ParseError as exc:
        raise ValueError(f"malformed document.xml: {exc}") from None
    paragraphs: list[str] = []
    for p in root.iter():
        if _local(p.tag) != "p":
            continue
        parts: list[str] = []
        for el in p.iter():
            ln = _local(el.tag)
            if ln == "t":
                parts.append(el.text or "")
            elif ln == "tab":
                parts.append("\t")
            elif ln in ("br", "cr"):
                parts.append("\n")
        paragraphs.append("".join(parts))
    return "\n".join(paragraphs)


def _xlsx_shared_strings(zf: zipfile.ZipFile, names: set[str]) -> list[str]:
    if "xl/sharedStrings.xml" not in names:
        return []
    try:
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    except ET.ParseError as exc:
        raise ValueError(f"malformed sharedStrings.xml: {exc}") from None
    out = []
    for si in root:
        if _local(si.tag) != "si":
            continue
        out.append("".join(
            el.text or "" for el in si.iter() if _local(el.tag) == "t"
        ))
    return out


def _xlsx_sheet_targets(zf: zipfile.ZipFile, names: set[str]) -> list[tuple[str, str]]:
    """[(sheet_name, member_path)] in workbook order; falls back to
    sorted worksheet members when the rels are absent/odd."""
    try:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
    except ET.ParseError as exc:
        raise ValueError(f"malformed workbook.xml: {exc}") from None
    rels: dict[str, str] = {}
    if "xl/_rels/workbook.xml.rels" in names:
        try:
            rroot = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        except ET.ParseError as exc:
            raise ValueError(
                f"malformed workbook.xml.rels: {exc}"
            ) from None
        for rel in rroot:
            rid = rel.get("Id")
            tgt = rel.get("Target", "")
            if rid:
                # relative targets resolve against xl/; ABSOLUTE
                # targets ('/xl/worksheets/sheet1.xml' — some
                # producers emit them) are package-rooted already
                rels[rid] = (
                    tgt.lstrip("/") if tgt.startswith("/")
                    else "xl/" + tgt
                )
    out: list[tuple[str, str]] = []
    for el in wb.iter():
        if _local(el.tag) != "sheet":
            continue
        name = el.get("name", f"sheet{len(out) + 1}")
        rid = next(
            (v for k, v in el.attrib.items() if _local(k) == "id"), None
        )
        target = rels.get(rid)
        if target and target in names:
            out.append((name, target))
    if not out:
        out = [
            (m.rsplit("/", 1)[-1].rsplit(".", 1)[0], m)
            for m in sorted(names)
            if m.startswith("xl/worksheets/") and m.endswith(".xml")
        ]
    return out


def xlsx_to_cells(payload: bytes) -> list[dict]:
    """Extract a SpreadsheetML (.xlsx) workbook as one dict per cell:
    {sheet, row, cell_ref, value} in sheet/row/document order. Cell
    types: shared strings resolve through sharedStrings.xml
    (including rich-text runs), inline strings through <is>, booleans
    render TRUE/FALSE, everything else keeps the stored <v> string
    verbatim (numbers stay as written — no float round-trip). The
    CACHED formula value is emitted (a text pipeline has no
    evaluator, and the cached value is what the author saw)."""
    zf = _open_zip(payload, "xlsx")
    names = set(zf.namelist())
    if "xl/workbook.xml" not in names:
        raise ValueError("zip has no xl/workbook.xml — not an XLSX")
    shared = _xlsx_shared_strings(zf, names)
    out: list[dict] = []
    for sheet_name, member in _xlsx_sheet_targets(zf, names):
        try:
            root = ET.fromstring(zf.read(member))
        except ET.ParseError as exc:
            raise ValueError(f"malformed {member}: {exc}") from None
        for row in root.iter():
            if _local(row.tag) != "row":
                continue
            rix = int(row.get("r", "0") or 0)
            for c in row:
                if _local(c.tag) != "c":
                    continue
                t = c.get("t", "n")
                v = None
                for el in c:
                    ln = _local(el.tag)
                    if ln == "v":
                        v = el.text or ""
                    elif ln == "is":
                        v = "".join(
                            e.text or "" for e in el.iter()
                            if _local(e.tag) == "t"
                        )
                if v is None:
                    continue
                if t == "s":
                    try:
                        v = shared[int(v)]
                    except (ValueError, IndexError):
                        raise ValueError(
                            f"bad shared-string index {v!r}"
                        ) from None
                elif t == "b":
                    v = "TRUE" if v == "1" else "FALSE"
                out.append(dict(
                    sheet=sheet_name, row=rix,
                    cell_ref=c.get("r", ""), value=v,
                ))
    return out


def xlsx_to_text(payload: bytes) -> str:
    """Text projection of a workbook: per sheet, the sheet name on
    its own line, then one line per row with cell values
    tab-separated in document order; sheets joined by newline."""
    cells = xlsx_to_cells(payload)
    lines: list[str] = []
    cur: tuple[str, int] | None = None
    row_vals: list[str] = []
    seen_sheets: set[str] = set()

    def flush():
        if row_vals:
            lines.append("\t".join(row_vals))

    for c in cells:
        key = (c["sheet"], c["row"])
        if c["sheet"] not in seen_sheets:
            flush()
            row_vals = []
            seen_sheets.add(c["sheet"])
            lines.append(c["sheet"])
            cur = None
        if key != cur:
            flush()
            row_vals = []
            cur = key
        row_vals.append(c["value"])
    flush()
    return "\n".join(lines)


def pptx_to_text(payload: bytes) -> str:
    """Extract a PresentationML (.pptx) deck's text: slides in
    numeric order (slide1, slide2, ...), one line per non-empty
    paragraph (`a:p`, runs concatenated), slides joined by
    newline."""
    zf = _open_zip(payload, "pptx")
    names = set(zf.namelist())
    if "ppt/presentation.xml" not in names:
        raise ValueError("zip has no ppt/presentation.xml — not a PPTX")
    import re as _re

    slides = sorted(
        (m for m in names
         if _re.fullmatch(r"ppt/slides/slide\d+\.xml", m)),
        key=lambda m: int(_re.search(r"(\d+)\.xml$", m).group(1)),
    )
    lines: list[str] = []
    for member in slides:
        try:
            root = ET.fromstring(zf.read(member))
        except ET.ParseError as exc:
            raise ValueError(f"malformed {member}: {exc}") from None
        for p in root.iter():
            if _local(p.tag) != "p":
                continue
            text = "".join(
                el.text or "" for el in p.iter()
                if _local(el.tag) == "t"
            )
            if text.strip():
                lines.append(text)
    return "\n".join(lines)


def epub_to_text(payload: bytes) -> str:
    """Extract an EPUB's reading-order text (container.xml -> OPF
    manifest/spine -> html_to_text per chapter)."""
    from .html_text import html_to_text

    zf = _open_zip(payload, "epub")
    names = zf.NameToInfo  # membership only — skip building a set
    if "META-INF/encryption.xml" in names:
        raise NotImplementedError(
            "DRM-protected EPUB (META-INF/encryption.xml) is not "
            "supported"
        )
    if "META-INF/container.xml" not in names:
        raise ValueError("zip has no META-INF/container.xml — not an EPUB")
    try:
        container = ET.fromstring(zf.read("META-INF/container.xml"))
    except ET.ParseError as exc:
        raise ValueError(f"malformed container.xml: {exc}") from None
    opf_path = None
    for el in _iter_local(container, "rootfile"):
        opf_path = el.get("full-path")
        break
    if not opf_path or opf_path not in names:
        raise ValueError("container.xml names no readable OPF rootfile")
    try:
        opf = ET.fromstring(zf.read(opf_path))
    except ET.ParseError as exc:
        raise ValueError(f"malformed OPF: {exc}") from None
    hrefs: dict[str, str] = {}
    order: list[str] = []
    for el in _iter_local(opf, "item"):
        if el.get("id") and el.get("href"):
            hrefs[el.get("id")] = el.get("href")
    for el in _iter_local(opf, "itemref"):
        if el.get("idref"):
            order.append(el.get("idref"))
    base = posixpath.dirname(opf_path)
    chapters: list[str] = []
    for idref in order:
        href = hrefs.get(idref)
        if not href:
            continue
        path = posixpath.normpath(posixpath.join(base, href))
        if path not in names:
            raise ValueError(f"spine item {path!r} missing from zip")
        t = html_to_text(zf.read(path).decode("utf-8", "replace"))
        if t:
            chapters.append(t)
    return "\n\n".join(chapters)


# RTF control words that emit text-equivalent characters
_RTF_CHAR = {
    b"par": "\n", b"line": "\n", b"sect": "\n", b"page": "\n",
    b"row": "\n", b"tab": "\t", b"cell": "\t",
    b"emdash": "\u2014", b"endash": "\u2013", b"bullet": "\u2022",
    b"lquote": "\u2018", b"rquote": "\u2019",
    b"ldblquote": "\u201c", b"rdblquote": "\u201d",
    b"emspace": " ", b"enspace": " ", b"qmspace": " ",
    b"~": "\u00a0", b"-": "", b"_": "\u2011",
}

# destination control words whose whole group is non-text
_RTF_SKIP_DESTS = frozenset(
    b"fonttbl colortbl stylesheet info pict object header footer "
    b"headerl headerr headerf footerl footerr footerf footnote "
    b"ftnsep ftnsepc aftnsep comment annotation fldinst themedata "
    b"colorschememapping datastore xmlnstbl listtable listoverridetable "
    b"revtbl rsidtbl generator".split()
)

_RTF_CW = re.compile(rb"([a-zA-Z]+)(-?\d+)? ?")
# Any byte the byte-wise loop treats specially: group delimiters,
# escapes, raw CR/LF/NUL, and non-ASCII (codepage-decoded). Everything
# between two such bytes is a plain ASCII text run.
_RTF_SPECIAL = re.compile(rb"[\\{}\x00\x0d\x0a\x80-\xff]")


def rtf_to_text(payload: bytes) -> str:
    """Extract text from an RTF byte stream (module docstring has the
    exact scope). The group stack carries (codepage, uc-skip) state so
    `\\ansicpg`/`\\uc` scope correctly."""
    if not payload.startswith(b"{\\rtf"):
        raise ValueError("not an RTF header")
    out: list[str] = []
    # stack frames: [codepage, uc_skip, skipping]
    stack: list[list] = []
    cp, uc, skipping = "cp1252", 1, False
    i, n = 0, len(payload)
    pending_skip = 0  # bytes/escapes to swallow after \uN
    while i < n:
        c = payload[i]
        if c not in (0x7B, 0x7D, 0x5C, 0x0D, 0x0A, 0x00) and c < 0x80:
            # Plain ASCII text run: process in bulk up to the next
            # special byte. Equivalent to the byte-wise tail below —
            # pending_skip consumes from the front (CR/LF/NUL never
            # reach here), skipped groups drop the rest.
            m = _RTF_SPECIAL.search(payload, i + 1)
            j = m.start() if m else n
            if pending_skip > 0:
                k = min(pending_skip, j - i)
                pending_skip -= k
                i += k
                if i >= j:
                    continue
            if not skipping:
                out.append(payload[i:j].decode("ascii"))
            i = j
            continue
        if c == 0x7B:  # {
            stack.append([cp, uc, skipping])
            i += 1
            # {\* ...}: ignorable destination unless we know it —
            # we know none of the \* destinations, so skip the group
            if payload[i : i + 2] == b"\\*":
                skipping = True
                i += 2
            continue
        if c == 0x7D:  # }
            if stack:
                cp, uc, skipping = stack.pop()
            i += 1
            continue
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = payload[i]
            if e == 0x27:  # \'xx codepage escape
                hx = payload[i + 1 : i + 3]
                i += 3
                if pending_skip > 0:
                    pending_skip -= 1
                    continue
                if not skipping:
                    try:
                        out.append(bytes.fromhex(hx.decode()).decode(cp))
                    except (ValueError, UnicodeDecodeError):
                        out.append("\ufffd")
                continue
            if not (0x41 <= e <= 0x5A or 0x61 <= e <= 0x7A):
                # control symbol: \\ \{ \} and the specials
                i += 1
                if pending_skip > 0:
                    pending_skip -= 1
                    continue
                if skipping:
                    continue
                if e in (0x5C, 0x7B, 0x7D):
                    out.append(chr(e))
                else:
                    out.append(_RTF_CHAR.get(bytes([e]), ""))
                continue
            m = _RTF_CW.match(payload, i)
            word = m.group(1)
            param = m.group(2)
            i = m.end()
            if word == b"u":  # \uN unicode escape
                if pending_skip > 0:
                    pending_skip -= 1
                    pending_skip += uc  # its own fallback also skips
                    continue
                code = int(param or 0)
                if code < 0:
                    code += 65536
                if not skipping:
                    out.append(chr(code))
                pending_skip = uc  # swallow the fallback rendering
                continue
            if pending_skip > 0:
                pending_skip -= 1
                continue
            if word == b"uc":
                uc = int(param or 1)
            elif word == b"ansicpg":
                try:
                    cp = f"cp{int(param)}"
                    b"\x41".decode(cp)  # unknown codepage -> LookupError
                except (LookupError, TypeError, ValueError):
                    cp = "cp1252"
            elif word == b"bin":
                i += max(0, int(param or 0))  # raw binary: skip bytes
            elif word in _RTF_SKIP_DESTS:
                skipping = True
            elif not skipping and word in _RTF_CHAR:
                out.append(_RTF_CHAR[word])
            continue
        i += 1
        if c in (0x0D, 0x0A, 0x00):
            continue  # raw CR/LF/NUL are not RTF text
        if pending_skip > 0:
            pending_skip -= 1
            continue
        if not skipping:
            out.append(chr(c) if c < 0x80 else bytes([c]).decode(cp))
    return "".join(out)


def _text_operator(decode_fn, label: str):
    """Shared (id, text, n_chars, error) mapInPandas runner — the
    `pdf_text` operator shape: Arrow-batched, per-payload Python
    decode (inherent to binary parsing), pruned two-column select,
    quarantine on the error channel, never a dropped row."""

    def op(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
        import pandas as pd

        def run(
            batches: Iterator["pd.DataFrame"],
        ) -> Iterator["pd.DataFrame"]:
            for pdf in batches:
                rows = []
                for rid, payload in zip(
                    pdf[id_col].values, pdf[payload_col].values
                ):
                    payload = (
                        bytes(payload) if payload is not None else b""
                    )
                    try:
                        text = decode_fn(payload)
                        rows.append((rid, text, len(text), None))
                    except Exception as exc:  # noqa: BLE001 — quarantine
                        rows.append((rid, None, None, str(exc)[:200]))
                yield pd.DataFrame(
                    rows, columns=["id", "text", "n_chars", "error"]
                )

        schema = OFFICE_TEXT_SCHEMA.replace(
            "id long", f"id {dict(df.dtypes)[id_col]}", 1
        )
        return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
            run, schema=schema
        )

    op.__name__ = label
    return op


docx_text = _text_operator(docx_to_text, "docx_text")
epub_text = _text_operator(epub_to_text, "epub_text")
rtf_text = _text_operator(rtf_to_text, "rtf_text")


def sniff_document_format(payload: bytes) -> str | None:
    """Magic-byte document sniffer for the formats the repo can
    extract: pdf / docx / epub / rtf / html / ipynb / srt / vtt /
    txt, plus 'ole' for compound-file payloads (legacy office,
    encrypted OOXML — named so the quarantine message can say WHY).
    Zip containers are discriminated by their mandatory members; a
    leading '<' (after an optional UTF-8 BOM) reads as markup; a JSON
    object with notebook keys is ipynb; a WEBVTT header / leading SRT
    cue reads as captions; anything else that decodes as UTF-8 is
    plain text. None = unknown binary."""
    if not payload:
        return None
    p = payload[3:] if payload[:3] == b"\xef\xbb\xbf" else payload
    if p[:5] == b"%PDF-":
        return "pdf"
    if p[:5] == b"{\\rtf":
        return "rtf"
    if payload[:8] == _OLE_MAGIC:
        return "ole"
    if payload[:2] == b"PK":
        try:
            with zipfile.ZipFile(io.BytesIO(payload)) as zf:
                names = set(zf.namelist())
        except (zipfile.BadZipFile, OSError):
            return None
        if "word/document.xml" in names:
            return "docx"
        if "META-INF/container.xml" in names:
            return "epub"
        if "xl/workbook.xml" in names:
            return "xlsx"
        if "ppt/presentation.xml" in names:
            return "pptx"
        return None
    head = p[:256].lstrip(b" \t\r\n")
    if head[:1] == b"<":
        return "html"
    if head[:6] == b"WEBVTT":
        return "vtt"
    if head[:1] == b"{" and (
        b'"nbformat"' in p or b'"worksheets"' in p
        or (b'"cells"' in p and b'"cell_type"' in p)
    ):
        # notebooks keep "nbformat" at the END of the JSON, so the
        # probe scans the payload, not a fixed head (linear, cheap
        # next to the decode the txt arm does anyway)
        return "ipynb"
    if _SRT_HEAD.match(head):
        return "srt"
    try:
        p.decode("utf-8")
        return "txt"
    except UnicodeDecodeError:
        return None


# decompression-bomb guard for the router's transparent compression
# layer: a 100-TB pipeline cannot let one crafted member inflate an
# executor to death. 256 MiB decompressed is far above any real
# document; beyond it the payload quarantines.
MAX_DECOMPRESSED_BYTES = 256 * 1024 * 1024

_COMPRESSION_MAGIC: list[tuple[bytes, str]] = [
    (b"\x1f\x8b", "gzip"),
    (b"BZh", "bzip2"),
    (b"\xfd7zXZ\x00", "xz"),
]


def sniff_compression(payload: bytes) -> str | None:
    """gzip / bzip2 / xz magic — the single-member compression
    wrappers corpora apply per document (distinct from zip/tar
    ARCHIVES, which `sources.tar_shards` reads shard-per-task)."""
    for magic, name in _COMPRESSION_MAGIC:
        if payload[: len(magic)] == magic:
            return name
    return None


def decompress_payload(
    payload: bytes, *, limit: int = MAX_DECOMPRESSED_BYTES
) -> bytes:
    """Bounded single-member decompression (gzip/bzip2/xz by magic).
    Streaming decompressors with max_length enforce the bomb guard
    WITHOUT materializing the overflow; non-compressed payloads return
    unchanged. Truncated/corrupt streams raise ValueError."""
    kind = sniff_compression(payload)
    if kind is None:
        return payload
    import bz2
    import lzma
    import zlib

    if kind == "gzip":
        dec = zlib.decompressobj(wbits=31)
    elif kind == "bzip2":
        dec = bz2.BZ2Decompressor()
    else:
        dec = lzma.LZMADecompressor()
    try:
        out = dec.decompress(payload, limit + 1)
    except Exception as exc:  # zlib.error / OSError / LZMAError
        raise ValueError(f"bad {kind} stream: {exc}") from None
    if len(out) > limit:
        raise ValueError(
            f"{kind} payload inflates past the {limit}-byte safety "
            "limit (decompression-bomb guard)"
        )
    if kind == "gzip" and not dec.eof:
        raise ValueError("truncated gzip stream")
    return out


def any_document_to_text(payload: bytes) -> tuple[str, str]:
    """Route one payload of UNKNOWN format to the right extractor —
    the mixed-corpus primitive: a real document lake arrives as a blob
    column, not pre-sorted by format. A gzip/bzip2/xz wrapper is
    transparently (and boundedly — see MAX_DECOMPRESSED_BYTES)
    removed first; the returned format names the INNER document.
    Returns (format, text); raises through the usual quarantine
    contract (per-format errors keep their messages; OLE and unknown
    binaries quarantine here)."""
    payload = decompress_payload(payload)
    fmt = sniff_document_format(payload)
    if fmt == "pdf":
        from .pdf_text import pdf_to_text

        return "pdf", pdf_to_text(payload)
    if fmt == "docx":
        return "docx", docx_to_text(payload)
    if fmt == "epub":
        return "epub", epub_to_text(payload)
    if fmt == "xlsx":
        return "xlsx", xlsx_to_text(payload)
    if fmt == "pptx":
        return "pptx", pptx_to_text(payload)
    if fmt == "rtf":
        return "rtf", rtf_to_text(payload)
    if fmt == "html":
        from .html_text import html_to_text

        p = payload[3:] if payload[:3] == b"\xef\xbb\xbf" else payload
        return "html", html_to_text(p.decode("utf-8", "replace")) or ""
    if fmt == "txt":
        p = payload[3:] if payload[:3] == b"\xef\xbb\xbf" else payload
        return "txt", p.decode("utf-8")
    if fmt == "ipynb":
        from .notebook_text import ipynb_cells

        cells = ipynb_cells(payload)
        return "ipynb", "\n\n".join(
            c["text"] for c in cells if c["text"]
        )
    if fmt in ("srt", "vtt"):
        from .subtitles import parse_subtitles

        cues, _bad = parse_subtitles(payload)
        return fmt, "\n".join(c["text"] for c in cues if c["text"])
    if fmt == "ole":
        raise NotImplementedError(
            "OLE/CFB container (legacy binary office or encrypted "
            "OOXML) is not supported"
        )
    raise NotImplementedError("unknown document format")


DOCUMENT_ANY_SCHEMA = (
    "id long, format string, text string, n_chars long, error string"
)


def document_text_any(
    df: DataFrame, id_col: str, payload_col: str
) -> DataFrame:
    """`any_document_to_text` over a binary column: (id, format, text,
    n_chars, error) — the router operator for mixed-format corpora.
    Arrow-batched mapInPandas; quarantined rows keep the sniffed
    format (when sniffable) so the census can still count them."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(
                pdf[id_col].values, pdf[payload_col].values
            ):
                payload = bytes(payload) if payload is not None else b""
                try:
                    fmt, text = any_document_to_text(payload)
                    rows.append((rid, fmt, text, len(text), None))
                except Exception as exc:  # noqa: BLE001 — quarantine
                    rows.append(
                        (
                            rid,
                            sniff_document_format(payload),
                            None,
                            None,
                            str(exc)[:200],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["id", "format", "text", "n_chars", "error"],
            )

    schema = DOCUMENT_ANY_SCHEMA.replace(
        "id long", f"id {dict(df.dtypes)[id_col]}", 1
    )
    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, schema=schema
    )


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;")
        .replace(">", "&gt;").replace('"', "&quot;")
    )


def _write_zip(parts: list[tuple[str, bytes, bool]]) -> bytes:
    """Byte-stable zip writer: fixed DOS timestamp, caller-ordered
    entries, `stored` flag per part (EPUB's mimetype must be STORED
    and first)."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data, stored in parts:
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = (
                zipfile.ZIP_STORED if stored else zipfile.ZIP_DEFLATED
            )
            zf.writestr(zi, data)
    return buf.getvalue()


def write_simple_docx(paragraphs: list[str]) -> bytes:
    """Deterministic minimal DOCX (the fixture half): one `w:p` per
    input string; embedded tabs/newlines become `w:tab`/`w:br` runs so
    the parser's run machinery is exercised."""
    ns = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    body = []
    for p in paragraphs:
        runs = []
        for piece in re.split(r"([\t\n])", p):
            if piece == "\t":
                runs.append("<w:r><w:tab/></w:r>")
            elif piece == "\n":
                runs.append("<w:r><w:br/></w:r>")
            elif piece:
                runs.append(
                    '<w:r><w:t xml:space="preserve">'
                    f"{_xml_escape(piece)}</w:t></w:r>"
                )
        body.append(f"<w:p>{''.join(runs)}</w:p>")
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{ns}"><w:body>{"".join(body)}</w:body>'
        "</w:document>"
    ).encode()
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/word/document.xml" ContentType="application'
        '/vnd.openxmlformats-officedocument.wordprocessingml.document.'
        'main+xml"/></Types>'
    ).encode()
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package'
        '/2006/relationships"><Relationship Id="rId1" Type="http://'
        "schemas.openxmlformats.org/officeDocument/2006/relationships/"
        'officeDocument" Target="word/document.xml"/></Relationships>'
    ).encode()
    return _write_zip(
        [
            ("[Content_Types].xml", content_types, False),
            ("_rels/.rels", rels, False),
            ("word/document.xml", document, False),
        ]
    )


def write_simple_xlsx(sheets: list[tuple[str, list[list[str]]]]) -> bytes:
    """Deterministic minimal XLSX (the fixture half): one sheet per
    (name, rows) pair. All-digit cell values are written as NUMBER
    cells, everything else through sharedStrings (deduplicated), so
    both read paths are exercised."""
    shared: list[str] = []
    index: dict[str, int] = {}

    def sid(s: str) -> int:
        if s not in index:
            index[s] = len(shared)
            shared.append(s)
        return index[s]

    def col_letter(i: int) -> str:
        out = ""
        i += 1
        while i:
            i, rem = divmod(i - 1, 26)
            out = chr(65 + rem) + out
        return out

    sheet_xml: list[bytes] = []
    for _name, rows in sheets:
        body = []
        for ri, row in enumerate(rows, start=1):
            cells = []
            for ci, val in enumerate(row):
                ref = f"{col_letter(ci)}{ri}"
                if val.isdigit():
                    cells.append(f'<c r="{ref}"><v>{val}</v></c>')
                else:
                    cells.append(
                        f'<c r="{ref}" t="s"><v>{sid(val)}</v></c>'
                    )
            body.append(f'<row r="{ri}">{"".join(cells)}</row>')
        sheet_xml.append((
            '<?xml version="1.0" encoding="UTF-8"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main"><sheetData>'
            + "".join(body) + "</sheetData></worksheet>"
        ).encode())
    wb_sheets = "".join(
        f'<sheet name="{_xml_escape(n)}" sheetId="{k + 1}" '
        f'r:id="rId{k + 1}"/>'
        for k, (n, _r) in enumerate(sheets)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main" xmlns:r="http://schemas.'
        'openxmlformats.org/officeDocument/2006/relationships">'
        f"<sheets>{wb_sheets}</sheets></workbook>"
    ).encode()
    rels = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/'
        'package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{k + 1}" Type="http://schemas.'
            "openxmlformats.org/officeDocument/2006/relationships/"
            f'worksheet" Target="worksheets/sheet{k + 1}.xml"/>'
            for k in range(len(sheets))
        )
        + "</Relationships>"
    ).encode()
    sst = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/'
        f'2006/main" count="{len(shared)}" uniqueCount="{len(shared)}">'
        + "".join(f"<si><t>{_xml_escape(s)}</t></si>" for s in shared)
        + "</sst>"
    ).encode()
    parts: list[tuple[str, bytes, bool]] = [
        ("xl/workbook.xml", workbook, False),
        ("xl/_rels/workbook.xml.rels", rels, False),
        ("xl/sharedStrings.xml", sst, False),
    ]
    for k, xml in enumerate(sheet_xml):
        parts.append((f"xl/worksheets/sheet{k + 1}.xml", xml, False))
    return _write_zip(parts)


def write_simple_pptx(slides: list[list[str]]) -> bytes:
    """Deterministic minimal PPTX (the fixture half): one slide per
    paragraph list."""
    parts: list[tuple[str, bytes, bool]] = [
        (
            "ppt/presentation.xml",
            (
                '<?xml version="1.0" encoding="UTF-8"?>'
                '<p:presentation xmlns:p="http://schemas.'
                'openxmlformats.org/presentationml/2006/main"/>'
            ).encode(),
            False,
        ),
    ]
    for k, paras in enumerate(slides, start=1):
        body = "".join(
            "<a:p><a:r><a:t>" + _xml_escape(p) + "</a:t></a:r></a:p>"
            for p in paras
        )
        xml = (
            '<?xml version="1.0" encoding="UTF-8"?>'
            '<p:sld xmlns:p="http://schemas.openxmlformats.org/'
            'presentationml/2006/main" xmlns:a="http://schemas.'
            'openxmlformats.org/drawingml/2006/main"><p:cSld>'
            f"<p:spTree>{body}</p:spTree></p:cSld></p:sld>"
        ).encode()
        parts.append((f"ppt/slides/slide{k}.xml", xml, False))
    return _write_zip(parts)


def write_simple_epub(chapters: list[tuple[str, str]]) -> bytes:
    """Deterministic minimal EPUB (the fixture half): one XHTML file
    per (title, body) chapter — body lines become `<p>` blocks — with
    a spine in input order."""
    parts: list[tuple[str, bytes, bool]] = [
        ("mimetype", b"application/epub+zip", True),
        (
            "META-INF/container.xml",
            (
                '<?xml version="1.0"?>'
                '<container version="1.0" xmlns="urn:oasis:names:tc:'
                'opendocument:xmlns:container"><rootfiles>'
                '<rootfile full-path="OEBPS/content.opf" media-type='
                '"application/oebps-package+xml"/></rootfiles>'
                "</container>"
            ).encode(),
            False,
        ),
    ]
    manifest, spine = [], []
    for k, (title, text) in enumerate(chapters):
        fname = f"chap{k:03d}.xhtml"
        paras = "".join(
            f"<p>{_xml_escape(ln)}</p>"
            for ln in text.split("\n") if ln
        )
        xhtml = (
            '<?xml version="1.0" encoding="UTF-8"?>'
            '<html xmlns="http://www.w3.org/1999/xhtml"><head><title>'
            f"{_xml_escape(title)}</title></head><body>"
            f"<h1>{_xml_escape(title)}</h1>{paras}</body></html>"
        ).encode()
        parts.append((f"OEBPS/{fname}", xhtml, False))
        manifest.append(
            f'<item id="c{k}" href="{fname}" '
            'media-type="application/xhtml+xml"/>'
        )
        spine.append(f'<itemref idref="c{k}"/>')
    opf = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<package xmlns="http://www.idpf.org/2007/opf" version="3.0" '
        'unique-identifier="uid"><metadata xmlns:dc="http://purl.org/'
        'dc/elements/1.1/"><dc:identifier id="uid">fixture</dc:identifier>'
        "<dc:title>fixture</dc:title></metadata>"
        f"<manifest>{''.join(manifest)}</manifest>"
        f"<spine>{''.join(spine)}</spine></package>"
    ).encode()
    parts.insert(2, ("OEBPS/content.opf", opf, False))
    return _write_zip(parts)


def write_simple_rtf(paragraphs: list[str]) -> bytes:
    """Deterministic minimal RTF (the fixture half): cp1252 +
    `\\ansicpg1252`, one `\\par`-terminated paragraph per input,
    `\\'xx` escapes for non-ASCII-cp1252 and `\\uN?` for the rest —
    exercising every escape family the parser supports."""
    out = [b"{\\rtf1\\ansi\\ansicpg1252\\deff0"]
    out.append(b"{\\fonttbl{\\f0 Helvetica;}}")
    for k, p in enumerate(paragraphs):
        if k:
            out.append(b"\\par\n")
        for ch in p:
            if ch == "\n":
                out.append(b"\\line ")
            elif ch == "\t":
                out.append(b"\\tab ")
            elif ch in "\\{}":
                out.append(b"\\" + ch.encode())
            elif " " <= ch <= "~":
                out.append(ch.encode())
            else:
                try:
                    out.append(b"\\'" + ch.encode("cp1252").hex().encode())
                except UnicodeEncodeError:
                    out.append(
                        b"\\u" + str(ord(ch)).encode() + b"?"
                    )
    out.append(b"}")
    return b"".join(out)
