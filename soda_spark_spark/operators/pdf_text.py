"""PDF text extraction, stdlib-only — the other document format every
real corpus ingest meets (scientific/legal/government text lives in
PDF; peS2o, FineWeb-Edu-style pipelines all carry a PDF branch).
DEFLATE ships in the stdlib (zlib), so classic text-layer PDFs are
extractable without a PDF library, exactly like `html_text.py` closed
HTML and `jpeg.py` closed JPEG.

Scope (`pdf_to_text`): classic unencrypted PDFs with simple
(one-byte) font encodings —

- object scan: `N G obj ... endobj` pairs located by a tolerant
  byte-level scan (no xref dependence: real-world files carry broken
  xref tables constantly; linearized and incrementally-updated files
  parse the same way),
- streams: raw, /FlateDecode (zlib), /LZWDecode, /ASCIIHexDecode and
  /ASCII85Decode — chained in declaration order when /Filter is an
  array — plus PNG predictors (/DecodeParms /Predictor >= 10, the
  object-stream convention) and TIFF predictor 2 for 8-bit samples;
  image/crypt filters (DCTDecode, JPXDecode, Crypt) quarantine the
  stream,
- content text operators: BT/ET blocks with Tj, ' (quote), " and TJ
  (array form; kerning adjustments <= -180 milli-em are treated as a
  word space, the standard heuristic), Td/TD/T*/Tm line moves emit
  newlines (negative or reset y-movement),
- string syntax: literal strings with the full escape set (\\n \\r
  \\t \\b \\f \\( \\) \\\\ \\ooo octal, line continuations) and
  balanced unescaped parens, plus hex strings <...>,
- bytes->text: one-byte code points mapped per PDFDocEncoding /
  WinAnsi's shared Latin-1 core (codes 0x20-0x7E ASCII, 0xA0-0xFF
  Latin-1; others map to U+FFFD REPLACEMENT so mojibake is VISIBLE,
  never silently dropped).

Explicit quarantine (`NotImplementedError` -> the operator's error
channel): encrypted documents (/Encrypt in a trailer dictionary),
composite Type0/CID fonts selected in a text block (2-byte codes —
decoding them as bytes would silently emit garbage; the
observable-malformedness contract), and unsupported stream filters.
Scanned-image-only PDFs yield empty text (there IS no text layer —
that is the honest answer, and the n_chars=0 signal is exactly what a
corpus pipeline routes to an OCR branch).

`write_simple_pdf` is the fixture half (the `encode_png` /
`encode_jpeg_baseline` pattern): a deterministic one-font
Flate-compressed writer whose output exercises the real parse path,
so the `pdf_text_extract` registry row's oracle can replay the
expected text closed-form in SQL.

Derived from the public PDF 1.7 spec (ISO 32000-1); the reference
(src/sodaspark/scan.py:441) scans already-loaded frames — ingestion
of binary document formats is additive surface.
"""

from __future__ import annotations

import base64
import re
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pdf_to_text", "pdf_text", "write_simple_pdf"]

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_STREAM_RE = re.compile(rb"stream\r?\n")
_LIT_SPECIAL = re.compile(rb"[\\()]")


def _pdf_unescape(body: bytes) -> bytes:
    """Literal-string unescape per PDF 7.3.4.2."""
    if 0x5C not in body:  # no backslash: the common case, nothing to do
        return bytes(body)
    out = bytearray()
    i, n = 0, len(body)
    while i < n:
        j = body.find(b"\\", i)
        if j < 0:  # no further escapes: copy the tail in one slice
            out += body[i:]
            break
        out += body[i:j]  # plain span before the escape, in bulk
        i = j + 1
        if i >= n:
            break
        e = body[i]
        if e in b"nrtbf":
            out.append({0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}[e])
            i += 1
        elif e in b"()\\":
            out.append(e)
            i += 1
        elif 0x30 <= e <= 0x37:  # up to 3 octal digits
            val = 0
            for _ in range(3):
                if i < n and 0x30 <= body[i] <= 0x37:
                    val = val * 8 + (body[i] - 0x30)
                    i += 1
                else:
                    break
            out.append(val & 0xFF)
        elif e in b"\r\n":  # line continuation
            i += 1
            if e == 0x0D and i < n and body[i] == 0x0A:
                i += 1
        else:  # unknown escape: the char stands for itself
            out.append(e)
            i += 1
    return bytes(out)


# codepoint -> replacement for everything outside the printable ASCII +
# Latin-1 high ranges: CR/LF map to '\n', the rest to U+FFFD (visible,
# never dropped). latin-1 decode is the identity on byte values, so
# str.translate over this table is exactly the per-byte mapping.
_CODE_XLAT = {
    b: ("\n" if b in (10, 13) else "�")
    for b in range(256)
    if not (0x20 <= b <= 0x7E or 0xA0 <= b <= 0xFF)
}


def _decode_codes(raw: bytes) -> str:
    """One-byte string bytes -> text: ASCII + Latin-1 high range;
    control/undefined codes become U+FFFD (visible, never dropped)."""
    return raw.decode("latin-1").translate(_CODE_XLAT)


class _ContentLexer:
    """Token stream over a decoded content stream: strings, hex
    strings, arrays, numbers, names, operators. Only what the text
    machinery needs — inline images (BI..EI) are skipped."""

    def __init__(self, data: bytes):
        self.data = data
        self.i = 0
        self.n = len(data)

    def _skip_ws(self):
        while self.i < self.n:
            c = self.data[self.i]
            if c in b"\x00\t\n\x0c\r ":
                self.i += 1
            elif c == 0x25:  # % comment
                while self.i < self.n and self.data[self.i] not in b"\r\n":
                    self.i += 1
            else:
                return

    def tokens(self):
        while True:
            self._skip_ws()
            if self.i >= self.n:
                return
            c = self.data[self.i]
            if c == 0x28:  # ( literal string
                yield ("str", self._literal())
            elif c == 0x3C:  # < hex string or << dict
                if self.i + 1 < self.n and self.data[self.i + 1] == 0x3C:
                    self.i += 2
                    yield ("op", b"<<")
                else:
                    yield ("str", self._hex())
            elif c == 0x3E and self.i + 1 < self.n and \
                    self.data[self.i + 1] == 0x3E:
                self.i += 2
                yield ("op", b">>")
            elif c in b"[]":
                self.i += 1
                yield ("op", bytes([c]))
            elif c == 0x2F:  # /Name
                j = self.i + 1
                while j < self.n and self.data[j] not in \
                        b"\x00\t\n\x0c\r %()<>[]{}/":
                    j += 1
                yield ("name", self.data[self.i + 1 : j])
                self.i = j
            elif c in b"+-.0123456789":
                j = self.i + 1
                while j < self.n and self.data[j] in b"+-.0123456789":
                    j += 1
                try:
                    num = float(self.data[self.i : j])
                except ValueError:
                    num = 0.0
                yield ("num", num)
                self.i = j
            else:  # operator keyword
                j = self.i
                while j < self.n and self.data[j] not in \
                        b"\x00\t\n\x0c\r %()<>[]{}/":
                    j += 1
                if j == self.i:
                    self.i += 1  # stray delimiter
                    continue
                yield ("op", self.data[self.i : j])
                self.i = j

    def _literal(self) -> bytes:
        # balanced parens, backslash escapes; jump between the only
        # three bytes that matter instead of stepping every character
        depth = 0
        data, n = self.data, self.n
        j = self.i
        out_start = j + 1
        while j < n:
            m = _LIT_SPECIAL.search(data, j)
            if m is None:
                break
            j = m.start()
            c = data[j]
            if c == 0x5C:
                j += 2
                continue
            if c == 0x28:
                depth += 1
            else:  # 0x29
                depth -= 1
                if depth == 0:
                    body = data[out_start:j]
                    self.i = j + 1
                    return _pdf_unescape(body)
            j += 1
        self.i = self.n
        return _pdf_unescape(data[out_start:])

    def _hex(self) -> bytes:
        j = self.data.find(b">", self.i + 1)
        if j < 0:
            j = self.n
        hx = self.data[self.i + 1 : j].translate(None, b"\x00\t\n\x0c\r ")
        self.i = min(j + 1, self.n)
        if len(hx) % 2:
            hx += b"0"  # the spec: odd final digit implies trailing 0
        try:
            return bytes.fromhex(hx.decode("ascii"))
        except ValueError:
            return b""


# The \b after the digits is load-bearing: without it the regex engine
# backtracks on an indirect reference — for `/Length 50 0 R` it retries
# with (\d+)="5" so the lookahead sees "0 0 R" and PASSES, misparsing
# the indirect ref as a direct length of 5 (truncating the stream). The
# word boundary forbids the digit-splitting retry, so indirect refs
# correctly fall through to the endstream-search path.
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)\b(?!\s+\d+\s+R)")


def _extract_objects(payload: bytes) -> dict[int, bytes]:
    """`num gen obj ... endobj` bodies by object number — a tolerant
    byte scan (no xref dependence) that is STREAM-EXTENT AWARE:
    compressed stream bytes can coincidentally contain `N G obj`,
    `endobj`, or `endstream` sequences, so each object's scan cursor
    jumps over its stream data using the dictionary's direct /Length
    when present (indirect `/Length N 0 R` falls back to the
    endstream search)."""
    objs: dict[int, bytes] = {}
    i = 0
    n = len(payload)
    while i < n:
        m = _OBJ_RE.search(payload, i)
        if m is None:
            break
        start = m.end()
        eo = payload.find(b"endobj", start)
        sm = _STREAM_RE.search(payload, start)
        if sm is not None and (eo < 0 or sm.start() < eo):
            head = payload[start : sm.start()]
            lm = _LENGTH_RE.search(head)
            if lm:
                data_end = sm.end() + int(lm.group(1))
                eo = payload.find(b"endobj", min(data_end, n))
            else:
                es = payload.find(b"endstream", sm.end())
                eo = payload.find(
                    b"endobj", es if es >= 0 else sm.end()
                )
        if eo < 0:
            objs[int(m.group(1))] = payload[start:]
            break
        objs[int(m.group(1))] = payload[start:eo]
        i = eo + 6
    # PDF 1.5+ compressed object streams (/Type /ObjStm): non-stream
    # objects (font/page dictionaries among them) live INSIDE a Flate
    # stream — unpack them so e.g. a Type0 font hidden in an ObjStm
    # still triggers the CID quarantine instead of mojibake. The
    # stream header is N pairs of (obj number, offset) followed by the
    # concatenated object bodies at /First.
    for body in list(objs.values()):
        sm = _STREAM_RE.search(body)
        # the /ObjStm type lives in the dictionary HEAD — checking the
        # whole body would false-positive on compressed stream bytes
        head = body[: sm.start()] if sm is not None else body
        if b"/ObjStm" not in head:
            continue
        # an ObjStm that cannot be decoded MUST quarantine the
        # document: the objects hidden inside (font dictionaries among
        # them) are invisible, so e.g. a Type0 font defined there would
        # escape the CID quarantine and 2-byte codes would emit as
        # mojibake — the exact silent-wrong-answer this unpack exists
        # to prevent. NotImplementedError/ValueError propagate.
        data = _object_stream_data(body)
        if data is None:
            continue
        nm = re.search(rb"/N\s+(\d+)", head)
        fm = re.search(rb"/First\s+(\d+)", head)
        if not nm or not fm:
            raise ValueError("ObjStm missing /N or /First")
        count, first = int(nm.group(1)), int(fm.group(1))
        header = data[:first].split()
        if len(header) < 2 * count:
            raise ValueError("ObjStm offset table shorter than /N pairs")
        try:
            pairs = [
                (int(header[2 * i]), int(header[2 * i + 1]))
                for i in range(count)
            ]
        except ValueError:
            raise ValueError("ObjStm offset table is not integer pairs")
        for idx, (num, off) in enumerate(pairs):
            end = (
                first + pairs[idx + 1][1]
                if idx + 1 < count else len(data)
            )
            objs.setdefault(num, data[first + off : end])
    return objs


def _ascii_hex_decode(data: bytes) -> bytes:
    """/ASCIIHexDecode per ISO 32000-1 §7.4.2: hex pairs, whitespace
    ignored, `>` is EOD, an odd final digit implies a trailing 0."""
    end = data.find(b">")
    if end >= 0:
        data = data[:end]
    hx = bytes(ch for ch in data if ch not in b"\x00\t\n\x0c\r ")
    if len(hx) % 2:
        hx += b"0"
    try:
        return bytes.fromhex(hx.decode("ascii"))
    except (ValueError, UnicodeDecodeError):
        raise ValueError("bad ASCIIHexDecode stream") from None


def _ascii85_decode(data: bytes) -> bytes:
    """/ASCII85Decode per §7.4.3: `~>` is EOD (PDF streams carry no
    Adobe `<~` prefix, so adobe=False + explicit terminator strip)."""
    end = data.find(b"~>")
    if end >= 0:
        data = data[:end]
    try:
        return base64.a85decode(
            data, adobe=False, ignorechars=b"\x00\t\n\x0c\r \x0b"
        )
    except ValueError as exc:
        raise ValueError(f"bad ASCII85Decode stream: {exc}") from None


def _lzw_decode(data: bytes, early_change: int = 1) -> bytes:
    """/LZWDecode per §7.4.4: MSB-first variable-width codes (9→12
    bits), 256=ClearTable, 257=EOD. EarlyChange (default 1) widens the
    code one entry before the table actually fills — the TIFF/PDF
    convention."""
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    out = bytearray()
    width = 9
    prev: bytes | None = None
    acc = 0
    nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            nbits -= width
            code = (acc >> nbits) & ((1 << width) - 1)
            if code == 256:  # ClearTable
                table = table[:258]
                width = 9
                prev = None
                continue
            if code == 257:  # EOD
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise ValueError("bad LZWDecode stream: first code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("bad LZWDecode stream: code gap")
            out += entry
            prev = entry
            if len(table) + early_change >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _png_unpredict(data: bytes, colors: int, bpc: int, columns: int) -> bytes:
    """PNG predictors (/Predictor >= 10) over decompressed bytes: each
    row is a filter-type byte + (colors*bpc*columns+7)//8 sample bytes;
    un-filter with the left/up/average/Paeth recurrences (RFC 2083)."""
    bpp = max(1, (colors * bpc + 7) // 8)
    rowlen = (colors * bpc * columns + 7) // 8
    if rowlen <= 0:
        raise ValueError("bad predictor geometry")
    out = bytearray()
    prev = bytes(rowlen)
    i, n = 0, len(data)
    while i < n:
        ft = data[i]
        row = bytearray(data[i + 1 : i + 1 + rowlen])
        i += 1 + rowlen
        if len(row) < rowlen:
            row.extend(bytes(rowlen - len(row)))
        if ft == 1:  # Sub
            for x in range(bpp, rowlen):
                row[x] = (row[x] + row[x - bpp]) & 0xFF
        elif ft == 2:  # Up
            for x in range(rowlen):
                row[x] = (row[x] + prev[x]) & 0xFF
        elif ft == 3:  # Average
            for x in range(rowlen):
                a = row[x - bpp] if x >= bpp else 0
                row[x] = (row[x] + (a + prev[x]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(rowlen):
                a = row[x - bpp] if x >= bpp else 0
                c = prev[x - bpp] if x >= bpp else 0
                b = prev[x]
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                row[x] = (row[x] + pred) & 0xFF
        elif ft != 0:
            raise ValueError(f"bad PNG predictor filter type {ft}")
        out += row
        prev = bytes(row)
    return bytes(out)


def _object_stream_data(body: bytes) -> bytes | None:
    """Decode an object's stream payload (None if the object has no
    stream). Supported filters, chained in declaration order: raw,
    /ASCIIHexDecode, /ASCII85Decode, /LZWDecode, /FlateDecode — plus
    PNG predictors (/DecodeParms /Predictor >= 10, the xref/ObjStm
    convention) and TIFF predictor 2 for 8-bit samples on the
    decompressing filter. Image/crypt filters (DCTDecode, Crypt, ...)
    raise NotImplementedError."""
    sm = _STREAM_RE.search(body)
    if sm is None:
        return None
    data = body[sm.end() :]
    es = data.rfind(b"endstream")
    if es >= 0:
        data = data[:es]
        # the spec puts an EOL before `endstream`
        if data.endswith(b"\r\n"):
            data = data[:-2]
        elif data.endswith((b"\n", b"\r")):
            data = data[:-1]
    head = body[: sm.start()]
    lm = _LENGTH_RE.search(head)
    if lm and int(lm.group(1)) <= len(body) - sm.end():
        # direct /Length bounds the data exactly — immune to
        # `endstream` look-alikes inside compressed bytes
        data = body[sm.end() : sm.end() + int(lm.group(1))]
    filters = re.findall(rb"/([A-Za-z0-9]+Decode|Crypt)\b", head)
    # single /DecodeParms dictionary applied to the decompressing
    # filter (the only place predictors occur in classic text PDFs:
    # Flate/LZW xref and object streams). A DecodeParms ARRAY with
    # per-filter entries is out of scope and would misparse only if a
    # chain had several predictor-bearing members — not a classic-PDF
    # shape.
    pm = re.search(rb"/Predictor\s+(\d+)", head)
    predictor = int(pm.group(1)) if pm else 1
    cm = re.search(rb"/Columns\s+(\d+)", head)
    columns = int(cm.group(1)) if cm else 1
    km = re.search(rb"/Colors\s+(\d+)", head)
    colors = int(km.group(1)) if km else 1
    bm = re.search(rb"/BitsPerComponent\s+(\d+)", head)
    bpc = int(bm.group(1)) if bm else 8
    em = re.search(rb"/EarlyChange\s+(\d+)", head)
    early_change = int(em.group(1)) if em else 1
    for name in filters:
        if name == b"ASCIIHexDecode":
            data = _ascii_hex_decode(data)
            continue
        if name == b"ASCII85Decode":
            data = _ascii85_decode(data)
            continue
        if name == b"FlateDecode":
            try:
                data = zlib.decompress(data)
            except zlib.error as exc:
                raise ValueError(
                    f"bad FlateDecode stream: {exc}"
                ) from None
        elif name == b"LZWDecode":
            data = _lzw_decode(data, early_change)
        else:
            raise NotImplementedError(
                "unsupported PDF stream filter "
                f"{name.decode()}; raw/ASCIIHex/ASCII85/LZW/Flate only"
            )
        # predictor applies to the output of the decompressing filter
        if predictor >= 10:
            data = _png_unpredict(data, colors, bpc, columns)
        elif predictor == 2:
            if bpc != 8:
                raise NotImplementedError(
                    "TIFF predictor with BitsPerComponent != 8"
                )
            data = _tiff_unpredict(data, colors, columns)
        elif predictor != 1:
            raise ValueError(f"bad /Predictor {predictor}")
    return data


def _tiff_unpredict(data: bytes, colors: int, columns: int) -> bytes:
    """TIFF predictor 2 (horizontal differencing), 8-bit samples."""
    rowlen = colors * columns
    out = bytearray(data)
    for r0 in range(0, len(out), rowlen):
        end = min(r0 + rowlen, len(out))
        for x in range(r0 + colors, end):
            out[x] = (out[x] + out[x - colors]) & 0xFF
    return bytes(out)


def _is_type0_font(objs: dict[int, bytes], ref: int) -> bool:
    body = objs.get(ref, b"")
    return b"/Type0" in body or b"/CIDFont" in body


def _page_font_refs(objs: dict[int, bytes]) -> dict[bytes, int]:
    """Font name -> object ref from every /Font resource dictionary
    (flattened across pages — names are per-page but fixture-grade and
    real simple PDFs rarely collide with CONFLICTING types; a name
    mapped to ANY Type0 ref is treated as Type0, erring toward
    quarantine, never toward mojibake)."""
    fonts: dict[bytes, int] = {}
    for body in objs.values():
        for m in re.finditer(rb"/(\w+)\s+(\d+)\s+\d+\s+R", body):
            name, ref = m.group(1), int(m.group(2))
            target = objs.get(ref, b"")
            if b"/Font" in target or b"/BaseFont" in target:
                if name not in fonts or _is_type0_font(objs, ref):
                    fonts[name] = ref
    return fonts


def pdf_to_text(payload: bytes) -> str:
    """Extract the text layer of a classic PDF (module docstring has
    the exact scope). Returns '' for PDFs with no text operators (e.g.
    scan-only); raises ValueError/NotImplementedError for encrypted,
    CID-font, or unsupported-filter documents."""
    if not payload.startswith(b"%PDF-"):
        raise ValueError("not a PDF header")
    objs = _extract_objects(payload)
    # encryption: /Encrypt lives in the trailer dict(s)
    for tm in re.finditer(rb"trailer", payload):
        tail = payload[tm.end() : tm.end() + 512]
        if b"/Encrypt" in tail:
            raise NotImplementedError(
                "encrypted PDF is not supported (no decryption here)"
            )
    fonts = _page_font_refs(objs)
    pieces: list[str] = []
    for num in sorted(objs):
        body = objs[num]
        try:
            data = _object_stream_data(body)
        except NotImplementedError:
            # non-content streams (images) commonly use DCTDecode etc;
            # only fail the DOCUMENT if the stream holds text operators
            continue
        if data is None or b"BT" not in data:
            continue
        pieces.append(_content_text(data, objs, fonts))
    return "\n".join(p for p in pieces if p)


def _content_text(data: bytes, objs, fonts) -> str:
    out: list[str] = []
    stack: list = []
    in_text = False
    cid_font = False
    line_open = False

    def emit(raw: bytes):
        if cid_font:
            raise NotImplementedError(
                "Type0/CID font text (2-byte codes) is not supported; "
                "plug a full PDF library for composite-font documents"
            )
        nonlocal line_open
        out.append(_decode_codes(raw))
        line_open = True

    def newline():
        nonlocal line_open
        if line_open:
            out.append("\n")
            line_open = False

    lex = _ContentLexer(data)
    arr: list | None = None
    for kind, val in lex.tokens():
        if kind == "op" and val == b"[":
            arr = []
            continue
        if kind == "op" and val == b"]":
            stack.append(arr if arr is not None else [])
            arr = None
            continue
        if arr is not None:
            if kind in ("str", "num"):
                arr.append((kind, val))
            continue
        if kind in ("str", "num", "name"):
            stack.append((kind, val))
            continue
        op = val
        if op == b"BT":
            in_text = True
        elif op == b"ET":
            in_text = False
            newline()
        elif op == b"Tf" and len(stack) >= 2:
            fname = stack[-2]
            if fname[0] == "name":
                ref = fonts.get(fname[1])
                cid_font = ref is not None and _is_type0_font(objs, ref)
        elif in_text and op == b"Tj" and stack:
            k, v = stack[-1]
            if k == "str":
                emit(v)
        elif in_text and op in (b"'", b'"') and stack:
            k, v = stack[-1]
            newline()
            if k == "str":
                emit(v)
        elif in_text and op == b"TJ" and stack:
            items = stack[-1]
            if isinstance(items, list):
                for k, v in items:
                    if k == "str":
                        emit(v)
                    elif k == "num" and v <= -180:
                        # large negative kerning == a word space
                        out.append(" ")
                        pass
        elif in_text and op in (b"Td", b"TD", b"T*", b"Tm"):
            newline()
        stack = []
    newline()
    text = "".join(out)
    # canonicalize: strip trailing spaces per line, collapse 3+ breaks
    lines = [ln.rstrip() for ln in text.split("\n")]
    return re.sub(r"\n{3,}", "\n\n", "\n".join(lines)).strip("\n")


PDF_TEXT_SCHEMA = "id long, text string, n_chars long, error string"


def pdf_text(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """`pdf_to_text` over a binary column: (id, text, n_chars, error),
    Arrow-batched mapInPandas with the quarantine contract —
    encrypted/CID/unsupported-filter documents surface on the error
    channel with NULL text; text-less documents yield text='' (the
    route-to-OCR signal), never an error."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(
                pdf[id_col].values, pdf[payload_col].values
            ):
                payload = bytes(payload) if payload is not None else b""
                try:
                    text = pdf_to_text(payload)
                    rows.append((rid, text, len(text), None))
                except Exception as exc:  # noqa: BLE001 — quarantine
                    rows.append((rid, None, None, str(exc)[:200]))
            yield pd.DataFrame(
                rows, columns=["id", "text", "n_chars", "error"]
            )

    schema = PDF_TEXT_SCHEMA.replace(
        "id long", f"id {dict(df.dtypes)[id_col]}", 1
    )
    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, schema=schema
    )


def write_simple_pdf(pages: list[str], *, compress: bool = True) -> bytes:
    """Deterministic single-font PDF writer (the fixture half): one
    Helvetica page per input string, lines split on '\\n', literal
    strings with the escape set the extractor must invert,
    Flate-compressed content streams by default. Input must be
    Latin-1-encodable (the simple-encoding scope)."""
    objs: list[bytes] = []

    def content_for(page: str) -> bytes:
        ops = [b"BT /F1 11 Tf 50 770 Td 14 TL"]
        for i, line in enumerate(page.split("\n")):
            try:
                raw = line.encode("latin-1")
            except UnicodeEncodeError as exc:
                raise ValueError(
                    "write_simple_pdf is Latin-1-scoped (simple one-"
                    f"byte font encodings): {exc}"
                ) from None
            esc = (
                raw.replace(b"\\", b"\\\\")
                .replace(b"(", b"\\(")
                .replace(b")", b"\\)")
            )
            ops.append((b"(" + esc + b") Tj") if i == 0
                       else (b"0 -14 Td (" + esc + b") Tj"))
        ops.append(b"ET")
        return b"\n".join(ops)

    npages = len(pages)
    # 1 catalog, 2 pages root, 3 font; then per page: page obj, stream
    page_refs = b" ".join(
        b"%d 0 R" % (4 + 2 * i) for i in range(npages)
    )
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        b"<< /Type /Pages /Kids [" + page_refs
        + b"] /Count %d >>" % npages
    )
    objs.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    for i, page in enumerate(pages):
        cnum = 5 + 2 * i
        objs.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> "
            b"/Contents %d 0 R >>" % cnum
        )
        data = content_for(page)
        if compress:
            z = zlib.compress(data, 9)
            objs.append(
                b"<< /Length %d /Filter /FlateDecode >>\nstream\n"
                % len(z) + z + b"\nendstream"
            )
        else:
            objs.append(
                b"<< /Length %d >>\nstream\n" % len(data)
                + data + b"\nendstream"
            )
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for num, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % num + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)
