"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched pandas iterators.

Decoding is REAL for the formats numpy + stdlib can handle — binary
PPM/PGM, uncompressed 24/32-bit BMP, 8-bit non-interlaced PNG
(stdlib zlib + full None/Sub/Up/Average/Paeth defiltering), and
GIF87a/89a incl. interlaced (a from-scratch variable-width LZW
decoder + four-pass row deinterlace + palette expansion) (`decode_image`, `decode_image_stats`), WAV/PCM
audio, YUV4MPEG2 video — and PLUGGABLE for the rest: `register_decoder(media, fmt, fn)`
routes jpeg/mp3/mp4/... payloads through the same Arrow batch loop and
quarantine contract when a deployment ships PIL/librosa/ffmpeg
(unregistered compressed formats raise NotImplementedError —
entropy decoding needs a library this container does not ship;
`fake_decoder=True` supplies a deterministic fake). Everything
Spark-side is real and tested either way: the schema convention, the
mapInPandas batch shape, the metadata extraction, the quarantine error
channel, and the partition sizing story (binary payloads make rows
heavy — repartition by byte budget, not row count).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# schema convention: one binary payload column + a typed metadata struct
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("format", T.StringType(), True),      # png|wav|mp4|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def as_media_table(
    df: DataFrame, payload_col: str, media_type: str, fmt: str
) -> DataFrame:
    """Normalize an arbitrary binary column into the engine's media-table
    shape: (payload: binary, meta: struct)."""
    return df.withColumn(
        "payload", F.col(payload_col).cast("binary")
    ).withColumn(
        "meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


def binary_stats(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Cheap JVM-side payload stats: byte length + md5 digest. Use this to
    plan partition sizes (bytes per partition) before heavy decode stages."""
    return df.select(
        F.col(id_col),
        F.length(F.col(payload_col).cast("binary")).alias("n_bytes"),
        F.md5(F.col(payload_col).cast("binary")).alias("digest"),
    )


def sniff_image_format(payload: bytes) -> str | None:
    """Magic-byte sniffer for the formats this module can name."""
    if not payload:
        return None
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"P5":
        return "pgm"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        return "webp"
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    return None


def sniff_audio_format(payload: bytes) -> str | None:
    """Magic-byte sniffer for audio formats this module can name."""
    if not payload or len(payload) < 4:
        return None
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:3] == b"ID3" or (
        payload[0] == 0xFF and (payload[1] & 0xE0) == 0xE0
    ):
        return "mp3"
    if payload[:4] == b"fLaC":
        return "flac"
    if payload[:4] == b"OggS":
        return "ogg"
    if len(payload) >= 12 and payload[4:8] == b"ftyp" and \
            payload[8:12] in (b"M4A ", b"M4B ", b"M4P "):
        # ISOBMFF with an unambiguous audio major brand; generic mp42/
        # isom brands stay with the video sniffer (a box walk would be
        # needed to tell audio-only apart — not a sniffer's job)
        return "m4a"
    return None


def sniff_video_format(payload: bytes) -> str | None:
    """Magic-byte sniffer for video formats this module can name."""
    if not payload or len(payload) < 4:
        return None
    if payload.startswith(b"YUV4MPEG2"):
        return "y4m"
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        return "mp4"
    if payload[:4] == b"\x1aE\xdf\xa3":
        return "webm"
    return None


# ---------------------------------------------------------------------------
# pluggable decoder registry
# ---------------------------------------------------------------------------
#
# Maps (media_kind, format) -> callable(payload: bytes) -> stats dict.
# The built-in library-free decoders (netpbm/BMP/PNG images, WAV/PCM
# audio, Y4M video) are the default registrants; deployments with
# PIL/librosa/ffmpeg register the remaining compressed codecs through
# the SAME hook and get the same Arrow batch loop + quarantine
# contract — no module edits:
#
#     from soda_spark_spark.operators import multimodal as mm
#     def decode_jpeg(payload: bytes) -> dict:   # top-level = picklable
#         img = PIL.Image.open(io.BytesIO(payload)); ...
#         return {"format": "jpeg", "width": ..., "height": ...,
#                 "n_bytes": len(payload), "sum_value": ..., "mean_value": ...}
#     mm.register_decoder("image", "jpeg", decode_jpeg)
#
# The decode_*_stats operators SNAPSHOT the registry when the plan is
# built and ship it inside the mapInPandas closure, so registration on
# the driver reaches every executor (a bare module-global would be
# re-imported fresh on workers and silently miss driver registrations).
# Registered callables must therefore be picklable (module top-level).

_DECODERS: dict[tuple[str, str], Any] = {}


def register_decoder(media: str, fmt: str, fn) -> None:
    """Register `fn(payload: bytes) -> dict` as the decoder for
    (`media`, `fmt`). The dict must carry the keys the corresponding
    built-in emits (see DECODE_STATS_SCHEMA / DECODE_AUDIO_SCHEMA /
    DECODE_VIDEO_SCHEMA); raise inside `fn` to route a payload to the
    quarantine channel."""
    if media not in ("image", "audio", "video"):
        raise ValueError(f"unknown media kind: {media!r}")
    _DECODERS[(media, fmt)] = fn


def unregister_decoder(media: str, fmt: str) -> None:
    """Remove a registered decoder. If the format has a BUILT-IN
    decoder (png/gif/jpeg/...), it is restored — a custom decoder
    OVERRIDES a built-in, it does not permanently delete it."""
    _DECODERS.pop((media, fmt), None)
    if (media, fmt) in _BUILTIN_DECODERS:
        _DECODERS[(media, fmt)] = _BUILTIN_DECODERS[(media, fmt)]


def _ppm_header(payload: bytes) -> tuple[int, int, int, int]:
    """Parse a P5/P6 header: returns (width, height, maxval, data_offset).
    Handles '#' comments and arbitrary whitespace per the netpbm spec."""
    pos, fields = 2, []
    n = len(payload)
    while len(fields) < 3 and pos < n:
        c = payload[pos : pos + 1]
        if c == b"#":
            while pos < n and payload[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while pos < n and not payload[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    if len(fields) != 3:
        raise ValueError("truncated netpbm header")
    w, h, maxval = fields
    return w, h, maxval, pos


def _netpbm_raster(payload: bytes, fmt: str):
    """Binary PPM (P6) / PGM (P5) decode to a raster: returns
    (width, height, channels, samples) with samples a uint8 ndarray of
    shape (height, width*channels)."""
    import numpy as np

    w, h, maxval, off = _ppm_header(payload)
    if maxval > 255:
        # netpbm maxval > 255 means 2-byte big-endian samples;
        # decoding them as uint8 would silently halve the raster.
        # Quarantine instead of mis-decoding.
        raise NotImplementedError(
            f"16-bit netpbm (maxval={maxval}) is not supported; "
            "only 1-byte-per-sample PPM/PGM decodes here"
        )
    channels = 3 if fmt == "ppm" else 1
    need = w * h * channels
    data = np.frombuffer(payload, dtype=np.uint8, count=need, offset=off)
    return w, h, channels, data.reshape(h, w * channels)


def _decode_netpbm(payload: bytes, fmt: str) -> dict[str, Any]:
    """Binary PPM (P6) / PGM (P5): header parse + exact numpy pixel sums."""
    import numpy as np

    w, h, channels, data = _netpbm_raster(payload, fmt)
    need = w * h * channels
    s = int(data.astype(np.int64).sum())
    return {
        "format": fmt, "width": w, "height": h,
        "n_bytes": len(payload), "sum_value": s,
        "mean_value": s / need if need else None,
    }


from .jpeg import (  # noqa: E402,F401
    _decode_jpeg, _jpeg_raster, encode_jpeg_baseline,
    encode_jpeg_progressive,
)


def _decode_ppm(payload: bytes) -> dict[str, Any]:
    return _decode_netpbm(payload, "ppm")


def _decode_pgm(payload: bytes) -> dict[str, Any]:
    return _decode_netpbm(payload, "pgm")


def _decode_bmp(payload: bytes) -> dict[str, Any]:
    """Uncompressed 24/32-bit BMP: struct header parse + numpy pixel sums
    (row padding excluded)."""
    import struct

    import numpy as np

    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w = struct.unpack_from("<i", payload, 18)[0]
    h_raw = struct.unpack_from("<i", payload, 22)[0]
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            "only uncompressed 24/32-bit BMP is decodable without an "
            "imaging library"
        )
    h = abs(h_raw)
    bytes_pp = bpp // 8
    row = (w * bytes_pp + 3) // 4 * 4  # rows pad to 4-byte boundaries
    data = np.frombuffer(
        payload, dtype=np.uint8, count=row * h, offset=data_off
    ).reshape(h, row)[:, : w * bytes_pp]
    s = int(data.astype(np.int64).sum())
    need = w * h * bytes_pp
    return {
        "format": "bmp", "width": w, "height": h,
        "n_bytes": len(payload), "sum_value": s,
        "mean_value": s / need if need else None,
    }


def _bmp_raster(payload: bytes):
    """Raster of an uncompressed 24/32-bit BMP NORMALIZED to the shared
    channel convention: top-down rows, RGB(A) order — BMP natively
    stores bottom-up BGR(A) with 4-byte row padding, so this reverses
    rows (when height is positive = bottom-up) and swaps B<->R. Lets
    BMP payloads ride `resize_image_payload` / `image_hash_payload`
    like every other raster format. Returns (w, h, channels, flat
    uint8 ndarray)."""
    import struct

    import numpy as np

    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w = struct.unpack_from("<i", payload, 18)[0]
    h_raw = struct.unpack_from("<i", payload, 22)[0]
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            "only uncompressed 24/32-bit BMP is decodable without an "
            "imaging library"
        )
    h = abs(h_raw)
    ch = bpp // 8
    row = (w * ch + 3) // 4 * 4
    if data_off + row * h > len(payload):
        raise ValueError("truncated BMP pixel data")
    px = np.frombuffer(
        payload, dtype=np.uint8, count=row * h, offset=data_off
    ).reshape(h, row)[:, : w * ch].reshape(h, w, ch)
    if h_raw > 0:
        px = px[::-1]  # bottom-up -> top-down
    px = px[:, :, [2, 1, 0] + ([3] if ch == 4 else [])]  # BGR(A) -> RGB(A)
    return w, h, ch, np.ascontiguousarray(px).reshape(-1)


# Adam7 pass geometry: (x0, y0, dx, dy) per pass. Pass p covers pixels
# (x0 + i*dx, y0 + j*dy); its scanlines are filtered WITHIN the pass.
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_defilter(arr, stride: int, bpp: int):
    """Reverse PNG row filters over `arr` of shape (rows, stride+1)
    (filter byte + filtered data per row) -> (rows, stride) uint8.
    Sub is a per-lane cumsum mod 256, Up one vectorized add;
    Average/Paeth rows fall back to the spec's sequential recurrence.
    Shared by the sequential and Adam7 (per-pass) paths."""
    import numpy as np

    rows = arr.shape[0]
    recon = np.zeros((rows, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(rows):
        f = int(arr[r, 0])
        d = arr[r, 1:]
        if f == 0:
            row = d.copy()
        elif f == 1:  # Sub: per-lane prefix sum mod 256
            row = np.empty(stride, dtype=np.uint8)
            for o in range(bpp):
                lane = d[o::bpp].astype(np.int64)
                row[o::bpp] = (np.cumsum(lane) % 256).astype(np.uint8)
        elif f == 2:  # Up: one vectorized add
            row = ((d.astype(np.int64) + prev) % 256).astype(np.uint8)
        elif f in (3, 4):  # Average/Paeth: sequential recurrence
            dl = d.tolist()
            pl = prev.tolist()
            out = [0] * stride
            for i in range(stride):
                a = out[i - bpp] if i >= bpp else 0
                b = pl[i]
                c = pl[i - bpp] if i >= bpp else 0
                pred = (a + b) // 2 if f == 3 else _paeth_predict(a, b, c)
                out[i] = (dl[i] + pred) % 256
            row = np.asarray(out, dtype=np.uint8)
        else:
            raise ValueError(f"invalid PNG filter type {f}")
        recon[r] = row
        prev = row
    return recon


def _paeth_predict(a: int, b: int, c: int) -> int:
    """The Paeth predictor (PNG filter type 4): nearest of left/up/
    up-left to the linear estimate a + b - c, ties broken left, up,
    up-left — the spec's exact tie order matters for byte parity."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_raster(payload: bytes):
    """Real stdlib-only PNG decode to a raster: critical-chunk walk,
    zlib inflate, per-row defiltering (None/Sub/Up/Average/Paeth) —
    closing the one compressed image format decodable without an
    imaging library (DEFLATE ships in the stdlib; JPEG's entropy
    coding does not). Returns (width, height, channels, samples) with
    samples a uint8 ndarray of shape (height, width*channels);
    palette images come back PLTE-expanded to RGB.

    Supported: bit depth 8, color types 0 (grayscale), 2 (RGB),
    3 (palette), 4 (gray+alpha), 6 (RGBA), sequential AND
    Adam7-interlaced (seven per-pass-filtered sub-images defiltered
    independently and scattered onto the pixel grid). 16-bit and
    packed 1/2/4-bit depths quarantine via NotImplementedError rather
    than mis-decoding. Defiltering (`_png_defilter`): Sub is a
    per-lane cumsum mod 256 (the left dependency is a prefix sum
    within each byte lane) and Up is one vectorized add, so the common
    filters stay numpy-vectorized; Average/Paeth rows fall back to the
    spec's sequential recurrence."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG signature")
    pos, n = 8, len(payload)
    ihdr = None
    plte = None
    idat = []
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc32
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("unknown PNG compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"invalid PNG interlace method {interlace}")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"invalid PNG color type {color_type}")
    valid_depths = {
        0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
        4: (8, 16), 6: (8, 16),
    }[color_type]
    if depth not in valid_depths:
        raise ValueError(
            f"invalid PNG depth {depth} for color type {color_type}"
        )
    if color_type == 3 and (
        plte is None or len(plte) % 3 or not 3 <= len(plte) <= 768
    ):
        # the spec bounds PLTE to 1..256 RGB triples; an empty palette
        # would only fail later ("palette index out of range")
        raise ValueError("palette PNG missing a valid PLTE chunk")
    raw = zlib.decompress(b"".join(idat))

    def _unpack(rows, width):
        """Defiltered scanline BYTES (rows, sw) -> 8-bit samples
        (rows, width*channels): 16-bit takes the MSB (the spec's
        sample-depth-rescaling approximation into the uint8 raster
        channel), packed 1/2/4-bit unpacks big-endian-first and
        rescales grayscale by 255/(2^depth-1) exactly (palette
        indices stay raw)."""
        if depth == 8:
            return rows[:, : width * channels]
        if depth == 16:
            return rows.reshape(rows.shape[0], -1, 2)[
                :, : width * channels, 0
            ]
        per_byte = 8 // depth
        bits = np.unpackbits(rows, axis=1)
        vals = np.zeros(
            (rows.shape[0], rows.shape[1] * per_byte), dtype=np.uint8
        )
        for k in range(depth):  # big-endian within each packed byte
            vals = (vals << 1) | bits[:, k::depth]
        vals = vals[:, :width]
        if color_type == 0:
            vals = (
                vals.astype(np.int64) * 255 // ((1 << depth) - 1)
            ).astype(np.uint8)
        return vals

    def _scan_width(width):
        return (width * channels * depth + 7) // 8

    # bytes-per-pixel for the filter recurrence: filters act on BYTES,
    # offset by the pixel's byte width (>= 1 for packed depths)
    fbpp = max(1, (channels * depth) // 8)
    stride = w * channels
    if interlace == 0:
        sw = _scan_width(w)
        if len(raw) != h * (sw + 1):
            raise ValueError("PNG raster size mismatch")
        arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, sw + 1)
        recon = _unpack(_png_defilter(arr, sw, fbpp), w)
    else:
        # Adam7: seven sub-images concatenated in the stream, each
        # filtered WITHIN its own pass; empty passes contribute no
        # scanlines. Defilter + unpack each pass and scatter it onto
        # the (y0::dy, x0::dx) grid.
        recon = np.zeros((h, stride), dtype=np.uint8)
        img = recon.reshape(h, w, channels)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            psw = _scan_width(pw)
            need = ph * (psw + 1)
            if off + need > len(raw):
                raise ValueError("PNG raster size mismatch (Adam7)")
            parr = np.frombuffer(
                raw[off:off + need], dtype=np.uint8
            ).reshape(ph, psw + 1)
            off += need
            prec = _unpack(_png_defilter(parr, psw, fbpp), pw)
            img[y0::dy, x0::dx] = prec.reshape(ph, pw, channels)
        if off != len(raw):
            raise ValueError("PNG raster size mismatch (Adam7)")
    if color_type == 3:
        table = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = recon.reshape(-1)
        if int(idx.max(initial=0)) >= table.shape[0]:
            raise ValueError("palette index out of range")
        samples = table[idx.astype(np.int64)].reshape(h, w * 3)
        return w, h, 3, samples
    return w, h, channels, recon.reshape(h, stride)


def _decode_png(payload: bytes) -> dict[str, Any]:
    """See `_png_raster` for the decode itself; this is the stats
    projection over the reconstructed samples (palette images sum
    their PLTE-expanded RGB)."""
    import numpy as np  # noqa: F401  (raster comes back as ndarray)

    w, h, channels, samples = _png_raster(payload)
    need = w * h * channels
    s = int(samples.astype("int64").sum())
    return {
        "format": "png", "width": w, "height": h,
        "n_bytes": len(payload), "sum_value": s,
        "mean_value": s / need if need else None,
    }


def encode_png(
    width: int,
    height: int,
    samples: bytes,
    *,
    color_type: int = 2,
    filters: int | list[int] = 0,
    palette: bytes | None = None,
    interlace: bool = False,
    depth: int = 8,
) -> bytes:
    """Encode raw samples as a PNG — the write-side twin of
    `_decode_png`, useful for thumbnail/artifact sinks and for
    building certification fixtures. `samples` is row-major: one byte
    per sample at depth 8 (channel-expanded; palette indices for
    color_type=3), TWO big-endian bytes per sample at depth 16, and
    one byte per sample VALUE (< 2^depth; the encoder packs the bits)
    at depths 1/2/4 (grayscale or palette only, per the spec).
    `filters` is a single PNG filter type or a cycle (0=None 1=Sub
    2=Up 3=Average 4=Paeth) indexed by the emitted scanline counter —
    the encoder applies the forward byte recurrence, so any choice
    round-trips through the decoder bit-exactly. `interlace=True`
    writes Adam7: samples split into the seven passes, each pass
    filtered independently (prev-row state resets per pass, per the
    spec)."""
    import struct
    import zlib

    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"invalid PNG color type {color_type}")
    valid_depths = {
        0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
        4: (8, 16), 6: (8, 16),
    }[color_type]
    if depth not in valid_depths:
        raise ValueError(
            f"invalid PNG depth {depth} for color type {color_type}"
        )
    bps = 2 if depth == 16 else 1  # input bytes per sample
    need = width * height * channels * bps
    if len(samples) != need:
        raise ValueError(
            f"need {need} sample bytes, got {len(samples)}"
        )
    if depth < 8 and samples and max(samples) >= (1 << depth):
        raise ValueError(f"sample value out of range for depth {depth}")
    if color_type == 3 and (
        palette is None
        or len(palette) % 3
        or not 3 <= len(palette) <= 768
    ):
        # 1..256 RGB triples, per the PNG spec — an empty palette
        # encodes a PNG that _png_raster correctly rejects
        raise ValueError(
            "palette PNG needs a PLTE byte string of 1..256 RGB triples"
        )
    fl = [filters] * height if isinstance(filters, int) else list(filters)
    fbpp = max(1, (channels * depth) // 8)  # filter offset, in bytes

    def _chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    def _row_bytes(y: int, xs: list[int]) -> list[int]:
        """Raw scanline bytes for pixels (xs, y) — per-pass column
        selection happens here, BEFORE packing, as the spec's pass
        extraction requires."""
        if depth >= 8:
            out: list[int] = []
            step = channels * bps
            for x in xs:
                base = (y * width + x) * step
                out.extend(samples[base:base + step])
            return out
        acc = nb = 0
        out = []
        for x in xs:
            acc = (acc << depth) | samples[y * width + x]
            nb += depth
            if nb == 8:
                out.append(acc)
                acc = nb = 0
        if nb:
            out.append(acc << (8 - nb))
        return out

    raster = bytearray()
    scanline = 0  # global emitted-scanline counter indexes the cycle

    def _filter_pass(rows: list[list[int]]) -> None:
        nonlocal scanline
        prev = [0] * (len(rows[0]) if rows else 0)
        for row in rows:
            f = fl[scanline % len(fl)]
            scanline += 1
            if f not in (0, 1, 2, 3, 4):
                raise ValueError(f"invalid PNG filter type {f}")
            raster.append(f)
            for i, x in enumerate(row):
                a = row[i - fbpp] if i >= fbpp else 0
                b = prev[i]
                c = prev[i - fbpp] if i >= fbpp else 0
                pred = (0, a, b, (a + b) // 2, _paeth_predict(a, b, c))[f]
                raster.append((x - pred) % 256)
            prev = row

    if not interlace:
        _filter_pass(
            [_row_bytes(y, list(range(width))) for y in range(height)]
        )
    else:
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            xs = [x0 + i * dx for i in range(pw)]
            _filter_pass(
                [_row_bytes(y0 + j * dy, xs) for j in range(ph)]
            )
    ihdr = struct.pack(
        ">IIBBBBB", width, height, depth, color_type, 0, 0,
        1 if interlace else 0,
    )
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _chunk(b"PLTE", palette)
    return out + _chunk(b"IDAT", zlib.compress(bytes(raster))) + _chunk(
        b"IEND", b""
    )


def _gif_lzw_decode(data: bytes, min_code_size: int) -> bytearray:
    """Full variable-width GIF LZW decode (the real thing, not a
    shortcut): LSB-first bit stream, CLEAR/END control codes, KwKwK
    case, width growth when the table reaches 2^width, 12-bit cap with
    deferred-clear (table full -> stop adding, keep emitting). Raises
    ValueError on out-of-range codes; a stream that exhausts its bits
    without an END code returns what it decoded (browser tolerance —
    wild GIFs sometimes omit END; `_gif_raster`'s pixel-count check
    still rejects genuinely short rasters)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad GIF LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    base = [bytes([i]) for i in range(clear)]
    table: list[bytes] = list(base)
    code_size = min_code_size + 1
    big = int.from_bytes(data, "little")
    nbits = len(data) * 8
    pos = 0
    prev: bytes | None = None
    out = bytearray()
    # table indexes clear/end implicitly: entries beyond `clear-1` start
    # at code end+1, so table list position i maps to code i for
    # literals and code i+2 for composites
    comp: list[bytes] = []  # composite entries, code = end + 1 + idx

    def entry_for(code: int) -> bytes | None:
        if code < clear:
            return base[code]
        i = code - end - 1
        if 0 <= i < len(comp):
            return comp[i]
        return None

    while True:
        if pos + code_size > nbits:
            return out  # no END code — tolerate, caller checks length
        code = (big >> pos) & ((1 << code_size) - 1)
        pos += code_size
        if code == clear:
            comp = []
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            return out
        nxt = end + 1 + len(comp)  # the code the next composite gets
        if prev is None:
            entry = entry_for(code)
            if entry is None:
                raise ValueError(f"bad first GIF LZW code {code}")
        elif code < nxt:
            entry = entry_for(code)
            if entry is None:
                raise ValueError(f"bad GIF LZW code {code}")
            if nxt < 4096:
                comp.append(prev + entry[:1])
        elif code == nxt and nxt < 4096:
            entry = prev + prev[:1]
            comp.append(entry)
        else:
            raise ValueError(f"GIF LZW code {code} beyond table")
        out += entry
        prev = entry
        if end + 1 + len(comp) == (1 << code_size) and code_size < 12:
            code_size += 1


def _gif_lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Real GIF LZW compression (dictionary growth, width bumps in
    decoder lockstep — width rises when next_code-1 hits 2^width, i.e.
    exactly when the decoder's table does — CLEAR+reset at the 4096
    cap). Returns the packed LSB-first byte stream."""
    clear = 1 << min_code_size
    end = clear + 1
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width

    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code_size + 1
    emit(clear, code_size)
    w = b""
    for c in indices:
        wc = w + bytes([c])
        if wc in table:
            w = wc
            continue
        emit(table[w], code_size)
        table[wc] = next_code
        next_code += 1
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code == 4096:
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        w = bytes([c])
    if w:
        emit(table[w], code_size)
    emit(end, code_size)
    return acc.to_bytes((nbits + 7) // 8, "little")


def _gif_raster(payload: bytes):
    """Raster of the FIRST image block of a GIF87a/GIF89a payload as
    (width, height, 3, rgb ndarray) — palette indices LZW-decoded
    (`_gif_lzw_decode`) and expanded through the active (local-else-
    global) color table. Extensions (including GCE transparency — a
    transparent index decodes as its palette color; stills have no
    background to composite) are skipped block-correctly. Interlaced
    images ARE supported: GIF interlacing is a pure four-pass row
    permutation (rows 0,8,16.. / 4,12.. / 2,6.. / odd — no column
    subsampling, unlike Adam7 PNG), undone with one numpy row
    scatter."""
    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    packed = payload[10]
    pos = 13
    gct = None
    if packed & 0x80:
        sz = 3 * (2 << (packed & 0x07))
        gct = payload[pos:pos + sz]
        if len(gct) < sz:
            raise ValueError("truncated GIF global color table")
        pos += sz
    while pos < len(payload):
        block = payload[pos]
        if block == 0x21:  # extension: label + data sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            if pos + 10 > len(payload):
                raise ValueError("truncated GIF image descriptor")
            w = int.from_bytes(payload[pos + 5:pos + 7], "little")
            h = int.from_bytes(payload[pos + 7:pos + 9], "little")
            ipacked = payload[pos + 9]
            pos += 10
            ct = gct
            if ipacked & 0x80:
                sz = 3 * (2 << (ipacked & 0x07))
                ct = payload[pos:pos + sz]
                if len(ct) < sz:
                    raise ValueError("truncated GIF local color table")
                pos += sz
            interlaced = bool(ipacked & 0x40)
            if ct is None:
                raise ValueError("GIF image block without a color table")
            if w < 1 or h < 1:
                raise ValueError("empty GIF image block")
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            while True:
                if pos >= len(payload):
                    raise ValueError("unterminated GIF data sub-blocks")
                n = payload[pos]
                pos += 1
                if n == 0:
                    break
                data += payload[pos:pos + n]
                pos += n
            idx = _gif_lzw_decode(bytes(data), min_code)
            if len(idx) < w * h:
                raise ValueError(
                    f"GIF raster short: {len(idx)} < {w * h} pixels"
                )
            arr = np.frombuffer(bytes(idx[:w * h]), dtype=np.uint8)
            if interlaced:
                # GIF interlacing reorders whole ROWS across four passes
                # (rows 0,8,16.. then 4,12.. then 2,6.. then odd) —
                # unlike Adam7 it never subsamples columns, so decode
                # is a pure row permutation
                rows = arr.reshape(h, w)
                order = (
                    list(range(0, h, 8)) + list(range(4, h, 8))
                    + list(range(2, h, 4)) + list(range(1, h, 2))
                )
                deinter = np.empty_like(rows)
                deinter[np.asarray(order, dtype=np.int64)] = rows
                arr = deinter.reshape(-1)
            n_colors = len(ct) // 3
            if int(arr.max()) >= n_colors:
                raise ValueError("GIF pixel index out of palette range")
            lut = np.frombuffer(ct[:n_colors * 3], dtype=np.uint8).reshape(
                -1, 3
            )
            return w, h, 3, lut[arr].reshape(-1)
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image data")


def _decode_gif(payload: bytes) -> dict[str, Any]:
    """Stats projection over `_gif_raster`'s palette-expanded RGB."""
    w, h, channels, samples = _gif_raster(payload)
    need = w * h * channels
    s = int(samples.astype("int64").sum())
    return {
        "format": "gif", "width": w, "height": h,
        "n_bytes": len(payload), "sum_value": s,
        "mean_value": s / need if need else None,
    }


def encode_gif(
    width: int,
    height: int,
    indices: bytes,
    palette: bytes,
    *,
    interlace: bool = False,
) -> bytes:
    """Encode one GIF89a still: `indices` = width*height palette
    indexes (top-down row order — `interlace=True` stores them in the
    four-pass interlaced order and sets the flag), `palette` = 3n RGB
    bytes (n a power of two in 2..256 — GIF color tables only come in
    power-of-two sizes). Real LZW compression (`_gif_lzw_encode`). The
    certification/test writer for `_gif_raster`, like `encode_png` for
    the PNG path."""
    if width < 1 or height < 1:
        raise ValueError("GIF dimensions must be >= 1x1")
    n = len(palette) // 3
    if len(palette) % 3 or n not in (2, 4, 8, 16, 32, 64, 128, 256):
        raise ValueError(
            "palette must be 3n bytes with n a power of two in 2..256"
        )
    if len(indices) != width * height:
        raise ValueError(
            f"need {width * height} index bytes, got {len(indices)}"
        )
    if indices and max(indices) >= n:
        raise ValueError("pixel index out of palette range")
    if interlace:
        order = (
            list(range(0, height, 8)) + list(range(4, height, 8))
            + list(range(2, height, 4)) + list(range(1, height, 2))
        )
        indices = b"".join(
            indices[r * width:(r + 1) * width] for r in order
        )
    size_bits = n.bit_length() - 2  # n = 2 -> 0, 256 -> 7
    min_code = max(2, (n - 1).bit_length())
    out = bytearray(b"GIF89a")
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out += bytes([0x80 | size_bits, 0, 0])  # GCT flag+size, bg, aspect
    out += palette
    out += b"\x2c" + b"\x00" * 4  # image at (0, 0)
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out += bytes([0x40 if interlace else 0x00])  # no LCT; interlace flag
    out += bytes([min_code])
    stream = _gif_lzw_encode(indices, min_code)
    for i in range(0, len(stream), 255):
        chunk = stream[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def decode_image(
    payload: bytes,
    fmt: str | None = None,
    *,
    decoders: dict[tuple[str, str], Any] | None = None,
) -> dict[str, Any]:
    """Decode an image payload via the decoder registry. Built-in (REAL,
    library-free) formats: binary PPM (P6), PGM (P5), uncompressed
    24/32-bit BMP, 8-bit non-interlaced PNG (stdlib zlib inflate +
    full defiltering — see `_decode_png`), and GIF incl. interlaced
    (from-scratch LZW — see `_gif_raster`) — width, height, n_bytes,
    plus exact integer `sum_value` and `mean_value` over the pixel
    samples, and JPEG — baseline AND progressive, from-scratch Huffman
    + integer IDCT (see `jpeg.py`). Remaining
    compressed variants raise NotImplementedError unless a decoder
    was plugged in via `register_decoder("image", fmt, fn)`.
    `fmt` overrides magic-byte sniffing; `decoders` overrides the
    module registry (the stats operators pass their snapshot here)."""
    fmt = fmt or sniff_image_format(payload)
    fn = (decoders if decoders is not None else _DECODERS).get(("image", fmt))
    if fn is not None:
        return fn(payload)
    raise NotImplementedError(
        f"decoding {fmt or 'unknown'} requires an imaging library not "
        "present in this container; register_decoder('image', "
        f"{fmt!r}, fn) to plug one in, use fake_decoder=True for the "
        "deterministic test fake, or feed PPM/PGM/uncompressed-BMP"
    )


def _fake_decode(payload: bytes) -> dict[str, Any]:
    """Deterministic fake decode: derives pseudo-dimensions from the payload
    digest so tests exercise the full plumbing with stable outputs."""
    digest = hashlib.md5(payload or b"").digest()
    return {
        "width": 1 + digest[0] % 64,
        "height": 1 + digest[1] % 64,
        "n_bytes": len(payload or b""),
    }


FEATURE_SCHEMA = "id long, n_bytes long, width int, height int, feature double"


def extract_image_features(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    *,
    fake_decoder: bool = False,
) -> DataFrame:
    """Arrow-batched decode + feature extraction via mapInPandas.

    Batch shape: pandas DataFrames with a bytes column; each batch decodes
    row-wise in Python (the genuinely non-vectorizable step) and emits a
    fixed-schema feature frame. Output partitioning follows the input, so
    repartition the input by byte budget beforehand for heavy media.
    """
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            # zip over raw numpy values: iterrows() constructs a pandas
            # Series per row (~10x overhead) in the only per-row Python
            # loop in the engine — the decode itself is the hot path
            for rid, payload in zip(pdf[id_col].values, pdf[payload_col].values):
                payload = bytes(payload) if payload is not None else b""
                if fake_decoder:
                    meta = _fake_decode(payload)
                else:
                    meta = decode_image(payload)
                out.append(
                    (
                        rid,
                        meta["n_bytes"],
                        meta["width"],
                        meta["height"],
                        # fake feature: aspect ratio (deterministic)
                        meta["width"] / meta["height"],
                    )
                )
            yield pd.DataFrame(out, columns=["id", "n_bytes", "width", "height", "feature"])

    return df.select(F.col(id_col).alias(id_col), F.col(payload_col)).mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def repartition_by_bytes(
    df: DataFrame, payload_col: str, *, target_bytes_per_partition: int = 128 << 20
) -> DataFrame:
    """Size partitions by payload bytes instead of row count — media rows are
    orders of magnitude heavier than the table average, so row-count-based
    splits under- or over-shoot executor memory at scale."""
    total = df.select(
        F.sum(F.length(F.col(payload_col).cast("binary")))
    ).first()[0] or 0
    parts = max(1, int(total / target_bytes_per_partition) + 1)
    return df.repartition(parts)


def decode_video_frames(payload: bytes, fmt: str, n_frames: int) -> list[dict[str, Any]]:
    """REAL DECODER STUB — video libraries are not available in this
    environment. Cite: would use pyav/opencv frame extraction via
    mapInPandas in production."""
    raise NotImplementedError(
        "video decoding requires a media library not present in this "
        "container; use fake_decoder=True for the deterministic test fake"
    )


def _fake_frames(payload: bytes, n_frames: int) -> list[dict[str, Any]]:
    """Deterministic fake frame sampler: derives per-frame pseudo-content
    from the payload digest + frame index so tests exercise the full
    explode/batch plumbing with stable outputs."""
    digest = hashlib.md5(payload or b"").digest()
    out = []
    for i in range(n_frames):
        out.append(
            {
                "frame_idx": i,
                "width": 1 + digest[(2 * i) % 16] % 64,
                "height": 1 + digest[(2 * i + 1) % 16] % 64,
                # i+1, not i: keeps the suffix byte non-NUL so external
                # engines whose md5 takes text (DuckDB) reproduce it
                "frame_digest": hashlib.md5(
                    (payload or b"") + bytes([i + 1])
                ).hexdigest(),
            }
        )
    return out


FRAME_SCHEMA = (
    "id long, frame_idx int, width int, height int, frame_digest string"
)


def sample_frames(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    *,
    n_frames: int = 4,
    fake_decoder: bool = False,
) -> DataFrame:
    """Frame sampling for video payloads via mapInPandas: each input row
    (one video) yields `n_frames` output rows (one per sampled frame).

    The fan-out happens INSIDE the Arrow batch — one Python round-trip per
    batch, not per frame — and output partitioning follows the input, so
    `repartition_by_bytes` beforehand keeps frame extraction balanced when
    payload sizes are skewed (the usual case for video)."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for rid, payload in zip(pdf[id_col].values, pdf[payload_col].values):
                payload = bytes(payload) if payload is not None else b""
                if fake_decoder:
                    frames = _fake_frames(payload, n_frames)
                else:
                    frames = decode_video_frames(payload, "mp4", n_frames)
                for fr in frames:
                    out.append(
                        (rid, fr["frame_idx"], fr["width"], fr["height"],
                         fr["frame_digest"])
                    )
            yield pd.DataFrame(
                out,
                columns=["id", "frame_idx", "width", "height", "frame_digest"],
            )

    return df.select(F.col(id_col).alias(id_col), F.col(payload_col)).mapInPandas(
        run, schema=FRAME_SCHEMA
    )


DECODE_STATS_SCHEMA = (
    "id long, format string, width int, height int, n_bytes long, "
    "sum_value long, mean_value double, error string"
)

IMAGE_DIMENSIONS_SCHEMA = (
    "id long, format string, width int, height int, orientation int, "
    "n_bytes long, error string"
)


def _exif_orientation(payload: bytes, pos: int, seglen: int) -> int | None:
    """Orientation (tag 0x0112) from a JPEG APP1 Exif segment: TIFF
    byte-order header, IFD0 entry walk — header bytes only."""
    seg = payload[pos + 4 : pos + 2 + seglen]
    if not seg.startswith(b"Exif\x00\x00"):
        return None
    t = seg[6:]
    if len(t) < 14:
        return None
    if t[:2] == b"II":
        end = "<"
    elif t[:2] == b"MM":
        end = ">"
    else:
        return None
    if struct.unpack_from(end + "H", t, 2)[0] != 42:
        return None
    (ifd0,) = struct.unpack_from(end + "I", t, 4)
    if ifd0 + 2 > len(t):
        return None
    (count,) = struct.unpack_from(end + "H", t, ifd0)
    for i in range(count):
        off = ifd0 + 2 + 12 * i
        if off + 12 > len(t):
            return None
        tag, typ = struct.unpack_from(end + "HH", t, off)
        if tag == 0x0112 and typ == 3:
            (v,) = struct.unpack_from(end + "H", t, off + 8)
            return v if 1 <= v <= 8 else None
    return None


def image_dimensions_payload(payload: bytes) -> dict[str, Any]:
    """HEADER-ONLY image dimensions — the 100-TB triage primitive: a
    size/aspect/format census or a too-small/too-large pre-filter over
    a crawl's images should read a few dozen header bytes per file,
    never entropy-decode pixels (~10^3-10^5x less work than
    `decode_image`). Parses: netpbm P5/P6 text headers, PNG IHDR, GIF
    logical screen, BMP BITMAPINFOHEADER, WebP (all three container
    flavors: lossy VP8 frame tag, lossless VP8L packed 14-bit,
    extended VP8X 24-bit canvas), TIFF (IFD ImageWidth/ImageLength
    tags, both byte orders), and JPEG SOFn frame headers —
    INCLUDING the variants the pixel decoder quarantines (arithmetic
    SOF9+, 12-bit; progressive decodes for real since round 15): the
    dimensions live in the plain marker stream, so triage covers
    strictly more of a real crawl than decode does. Unknown formats raise NotImplementedError
    (the registry-boundary contract)."""
    fmt = sniff_image_format(payload)
    if fmt in ("ppm", "pgm"):
        w, h, _maxval, _off = _ppm_header(payload)
        return {"format": fmt, "width": w, "height": h}
    if fmt == "png":
        if len(payload) < 24 or payload[12:16] != b"IHDR":
            raise ValueError("truncated PNG header")
        w, h = struct.unpack_from(">II", payload, 16)
        return {"format": "png", "width": w, "height": h}
    if fmt == "gif":
        if len(payload) < 10:
            raise ValueError("truncated GIF header")
        w, h = struct.unpack_from("<HH", payload, 6)
        return {"format": "gif", "width": w, "height": h}
    if fmt == "bmp":
        if len(payload) < 26:
            raise ValueError("truncated BMP header")
        w = struct.unpack_from("<i", payload, 18)[0]
        h = abs(struct.unpack_from("<i", payload, 22)[0])
        return {"format": "bmp", "width": w, "height": h}
    if fmt == "tiff":
        # classic TIFF 6.0: byte-order mark, magic 42, first-IFD
        # offset; the IFD's ImageWidth (256) / ImageLength (257) tags
        # carry the dims as SHORT or LONG values inline
        end = "<" if payload[:2] == b"II" else ">"
        if len(payload) < 8:
            raise ValueError("truncated TIFF header")
        (ifd_off,) = struct.unpack_from(end + "I", payload, 4)
        if ifd_off + 2 > len(payload):
            raise ValueError("TIFF IFD offset out of range")
        (cnt,) = struct.unpack_from(end + "H", payload, ifd_off)
        w = h = None
        for k in range(cnt):
            off = ifd_off + 2 + 12 * k
            if off + 12 > len(payload):
                break
            tag, typ = struct.unpack_from(end + "HH", payload, off)
            if tag in (256, 257):
                if typ == 3:  # SHORT
                    (v,) = struct.unpack_from(end + "H", payload, off + 8)
                elif typ == 4:  # LONG
                    (v,) = struct.unpack_from(end + "I", payload, off + 8)
                else:
                    continue
                if tag == 256:
                    w = v
                else:
                    h = v
        if w is None or h is None:
            raise ValueError("TIFF IFD has no dimension tags")
        return {"format": "tiff", "width": w, "height": h}
    if fmt == "webp":
        # RIFF(4) riff-size(4) WEBP(4), first chunk fourcc at 12, chunk
        # size at 16, chunk data at 20 — all three container flavors
        # carry dimensions in the first chunk (RIFF container spec +
        # the public WebP container/VP8/VP8L bitstream docs)
        if len(payload) < 30:
            raise ValueError("truncated WebP header")
        fourcc = payload[12:16]
        d = payload[20:]
        if fourcc == b"VP8 ":
            # lossy: 3-byte frame tag, keyframe start code 9D 01 2A,
            # then 14-bit width/height in two u16le (upper bits scale)
            if len(d) < 10 or d[3:6] != b"\x9d\x01\x2a":
                raise ValueError("bad VP8 keyframe start code")
            w = struct.unpack_from("<H", d, 6)[0] & 0x3FFF
            h = struct.unpack_from("<H", d, 8)[0] & 0x3FFF
        elif fourcc == b"VP8L":
            # lossless: 0x2F signature then width-1/height-1 packed as
            # 14+14 bits little-endian
            if len(d) < 5 or d[0] != 0x2F:
                raise ValueError("bad VP8L signature")
            bits = struct.unpack_from("<I", d, 1)[0]
            w = (bits & 0x3FFF) + 1
            h = ((bits >> 14) & 0x3FFF) + 1
        elif fourcc == b"VP8X":
            # extended: flags(1) reserved(3) then 24-bit LE canvas
            # width-1 / height-1
            w = 1 + int.from_bytes(d[4:7], "little")
            h = 1 + int.from_bytes(d[7:10], "little")
        else:
            raise ValueError(f"unknown leading WebP chunk {fourcc!r}")
        return {"format": "webp", "width": w, "height": h}
    if fmt == "jpeg":
        pos, n = 2, len(payload)
        orientation = None
        while pos + 4 <= n:
            if payload[pos] != 0xFF:
                raise ValueError("JPEG marker sync lost")
            # T.81 B.1.1.2: skip optional 0xFF fill bytes before the
            # marker code (a valid image may pad any marker this way)
            while pos + 1 < n and payload[pos + 1] == 0xFF:
                pos += 1
            if pos + 4 > n:
                break
            marker = payload[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            if marker == 0xD9:
                break
            (seglen,) = struct.unpack_from(">H", payload, pos + 2)
            if marker == 0xE1 and orientation is None:
                orientation = _exif_orientation(payload, pos, seglen)
            # every SOFn frame header (C0-CF minus DHT C4 / JPG C8 /
            # DAC CC) carries precision, height, width at a fixed
            # offset — progressive and arithmetic included
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                _prec, h, w = struct.unpack_from(">BHH", payload, pos + 4)
                out = {"format": "jpeg", "width": w, "height": h}
                if orientation is not None:
                    # 5-8 are the transposed orientations: the DISPLAY
                    # dimensions swap — surface both signals
                    out["orientation"] = orientation
                return out
            pos += 2 + seglen
        raise ValueError("JPEG stream has no SOF frame header")
    raise NotImplementedError(
        f"dimension parsing for {fmt or 'unknown'} is not supported"
    )


def image_dimensions(
    df: DataFrame,
    id_col: str,
    payload_col: str,
) -> DataFrame:
    """`image_dimensions_payload` over a binary column: one row per
    payload with (format, width, height, n_bytes) from HEADER BYTES
    only (see the payload docstring for why this is the triage path at
    scale). Arrow-batched mapInPandas; unparseable payloads surface on
    the `error` channel with NULL dimensions — never dropped, never
    decoded."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for rid, payload in zip(
                pdf[id_col].values, pdf[payload_col].values
            ):
                payload = bytes(payload) if payload is not None else b""
                try:
                    m = image_dimensions_payload(payload)
                    out.append(
                        (rid, m["format"], m["width"], m["height"],
                         m.get("orientation"), len(payload), None)
                    )
                except Exception as exc:  # noqa: BLE001 — quarantine
                    out.append(
                        (rid, sniff_image_format(payload), None, None,
                         None, len(payload), str(exc)[:200])
                    )
            frame = pd.DataFrame(
                out,
                columns=["id", "format", "width", "height",
                         "orientation", "n_bytes", "error"],
            )
            # nullable ints must be built explicitly: positional
            # construction infers float64 for int+None columns (the
            # r14 image-hash mantissa lesson)
            for col in ("width", "height", "orientation"):
                frame[col] = pd.array(frame[col], dtype="Int32")
            yield frame

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, schema=_with_id_type(IMAGE_DIMENSIONS_SCHEMA, df, id_col)
    )


def _with_id_type(schema: str, df: DataFrame, id_col: str) -> str:
    """The DECODE_*_SCHEMA constants document the default (long-id)
    shape; the wrappers substitute the INPUT frame's actual id type so
    string/int ids work too (mirrors bpe_encode's schema derivation)."""
    return schema.replace("id long", f"id {dict(df.dtypes)[id_col]}", 1)


def decode_image_stats(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    *,
    on_error: str = "null",
) -> DataFrame:
    """REAL image decode over a binary column for the formats decodable
    without an imaging library (binary PPM/PGM, uncompressed 24/32-bit
    BMP — see `decode_image`): one row per payload with format, decoded
    dimensions, and exact integer/mean pixel statistics. Arrow-batched
    `mapInPandas`; the per-row Python loop is the decode itself (the
    genuinely non-vectorizable step), numpy does the pixel arithmetic.

    on_error='null' (default, the pipeline behavior): undecodable or
    compressed payloads yield NULL stats plus the error message in the
    `error` column — a 100-TB media sweep must not die on one corrupt
    file; filter `error IS NOT NULL` for the quarantine set.
    on_error='raise' fails fast instead (debugging).

    The decoder registry is SNAPSHOT here (plan-build time, driver
    side) and shipped in the closure, so `register_decoder` calls made
    before building the plan apply on every executor."""
    import pandas as pd

    if on_error not in ("null", "raise"):
        raise ValueError(f"unknown on_error: {on_error!r}")
    decoders = dict(_DECODERS)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for rid, payload in zip(pdf[id_col].values, pdf[payload_col].values):
                payload = bytes(payload) if payload is not None else b""
                try:
                    m = decode_image(payload, decoders=decoders)
                    out.append(
                        (rid, m["format"], m["width"], m["height"],
                         m["n_bytes"], m["sum_value"], m["mean_value"], None)
                    )
                except Exception as exc:  # noqa: BLE001 — quarantine channel
                    if on_error == "raise":
                        raise
                    out.append(
                        (rid, sniff_image_format(payload), None, None,
                         len(payload), None, None, str(exc)[:200])
                    )
            yield pd.DataFrame(
                out,
                columns=["id", "format", "width", "height", "n_bytes",
                         "sum_value", "mean_value", "error"],
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, schema=_with_id_type(DECODE_STATS_SCHEMA, df, id_col)
    )


def resize_image_payload(
    payload: bytes,
    width: int,
    height: int,
    *,
    out_format: str = "png",
) -> dict[str, Any]:
    """Nearest-neighbor resize of one decodable image payload (binary
    PPM/PGM or 8-bit non-interlaced PNG in; 'png' or 'ppm' out). The
    index mapping is pure integer floor arithmetic —
    src_row = (dst_row * src_h) DIV dst_h, src_col likewise — so the
    resampled raster is bit-deterministic and ENGINE-REPLAYABLE (the
    `multimodal_resize` oracle recomputes the selected source bytes in
    SQL). BMP input is normalized to top-down RGB first
    (`_bmp_raster`); JPEG (baseline + progressive) decodes via
    `_jpeg_raster`. Returns
    {format, width, height, n_bytes, payload}."""
    import numpy as np

    if width < 1 or height < 1:
        raise ValueError("resize target must be >= 1x1")
    fmt = sniff_image_format(payload)
    if fmt in ("ppm", "pgm"):
        w, h, ch, raster = _netpbm_raster(payload, fmt)
    elif fmt == "png":
        w, h, ch, raster = _png_raster(payload)
    elif fmt == "gif":
        w, h, ch, raster = _gif_raster(payload)
    elif fmt == "bmp":
        w, h, ch, raster = _bmp_raster(payload)
    elif fmt == "jpeg":
        w, h, ch, raster = _jpeg_raster(payload)
    else:
        raise NotImplementedError(
            f"resize supports ppm/pgm/png/gif/bmp/jpeg inputs, not"
            f" {fmt or 'unknown'}"
        )
    px = raster.reshape(h, w, ch)
    rows = (np.arange(height, dtype=np.int64) * h) // height
    cols = (np.arange(width, dtype=np.int64) * w) // width
    out = px[rows][:, cols]
    samples = out.reshape(height, width * ch).tobytes()
    if out_format == "png":
        ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
        new_payload = encode_png(width, height, samples, color_type=ctype)
        ofmt = "png"
    elif out_format == "ppm":
        if ch == 3:
            hdr, ofmt = f"P6\n{width} {height}\n255\n".encode(), "ppm"
        elif ch == 1:
            hdr, ofmt = f"P5\n{width} {height}\n255\n".encode(), "pgm"
        else:
            raise ValueError(
                "netpbm output supports 1 or 3 channels; use"
                " out_format='png' for alpha rasters"
            )
        new_payload = hdr + samples
    else:
        raise ValueError(f"unknown out_format {out_format!r}")
    return {
        "format": ofmt, "width": width, "height": height,
        "n_bytes": len(new_payload), "payload": new_payload,
    }


RESIZE_SCHEMA = (
    "id long, format string, width int, height int, n_bytes long, "
    "payload binary, error string"
)


def resize_images(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    *,
    width: int,
    height: int,
    out_format: str = "png",
    on_error: str = "null",
) -> DataFrame:
    """REAL image resizing over a binary column — the thumbnail /
    normalize-resolution stage of a multimodal training pipeline:
    nearest-neighbor resample (`resize_image_payload`, exact integer
    index arithmetic) of every decodable payload to (width, height),
    re-encoded as PNG (default) or netpbm. Arrow-batched `mapInPandas`
    with the `decode_image_stats` quarantine contract: on_error='null'
    emits NULL payload + the error message for undecodable inputs
    (filter `error IS NOT NULL` for the quarantine set);
    on_error='raise' fails fast. Partitioning follows the input —
    repartition by byte budget first for heavy media
    (`repartition_by_bytes`)."""
    import pandas as pd

    if on_error not in ("null", "raise"):
        raise ValueError(f"unknown on_error: {on_error!r}")
    if width < 1 or height < 1:
        raise ValueError("resize target must be >= 1x1")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for rid, payload in zip(pdf[id_col].values, pdf[payload_col].values):
                payload = bytes(payload) if payload is not None else b""
                try:
                    m = resize_image_payload(
                        payload, width, height, out_format=out_format
                    )
                    out.append(
                        (rid, m["format"], m["width"], m["height"],
                         m["n_bytes"], m["payload"], None)
                    )
                except Exception as exc:  # noqa: BLE001 — quarantine channel
                    if on_error == "raise":
                        raise
                    out.append(
                        (rid, sniff_image_format(payload), None, None,
                         None, None, str(exc)[:200])
                    )
            yield pd.DataFrame(
                out,
                columns=["id", "format", "width", "height", "n_bytes",
                         "payload", "error"],
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, schema=_with_id_type(RESIZE_SCHEMA, df, id_col)
    )


# ---------------------------------------------------------------------------
# perceptual image hashing + near-dup dedup
# ---------------------------------------------------------------------------


def image_hash_payload(payload: bytes, *, method: str = "dhash") -> int:
    """64-bit perceptual hash of one decodable image payload (binary
    PPM/PGM or 8-bit non-interlaced PNG — the real raster channel).
    Every step is EXACT integer arithmetic, so the hash is
    bit-deterministic and engine-replayable (the `image_dedup` oracle
    recomputes it from pixel bytes in SQL):

    - grayscale: integer luma (299*R + 587*G + 114*B) DIV 1000 for
      >= 3 channels; channel 0 for gray(+alpha);
    - downsample: the nearest-neighbor index map shared with
      `resize_image_payload` (src = (dst * src_dim) DIV dst_dim) to
      9x8 for dhash, 8x8 for ahash;
    - method='dhash' (default, the robust one): bit r*8+c is set when
      px[r][c] < px[r][c+1] — 64 horizontal gradient signs. Brightness
      and contrast shifts preserve gradient ORDER, so re-encoded /
      resized / slightly-filtered copies land within a few bits.
    - method='ahash': bit r*8+c is set when 64*px[r][c] > sum(px) —
      strictly-above-mean, kept multiplicative so no division rounding
      enters the replay.

    The unsigned 64-bit value is returned as its SIGNED two's-complement
    BIGINT (Spark LongType)."""
    import numpy as np

    fmt = sniff_image_format(payload)
    if fmt in ("ppm", "pgm"):
        w, h, ch, raster = _netpbm_raster(payload, fmt)
    elif fmt == "png":
        w, h, ch, raster = _png_raster(payload)
    elif fmt == "gif":
        w, h, ch, raster = _gif_raster(payload)
    elif fmt == "bmp":
        w, h, ch, raster = _bmp_raster(payload)
    elif fmt == "jpeg":
        w, h, ch, raster = _jpeg_raster(payload)
    else:
        raise NotImplementedError(
            f"image hash supports ppm/pgm/png/gif/bmp/jpeg inputs, not"
            f" {fmt or 'unknown'}"
        )
    px = raster.reshape(h, w, ch).astype(np.int64)
    if ch >= 3:
        gray = (
            299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]
        ) // 1000
    else:
        gray = px[:, :, 0]
    if method == "dhash":
        tw, th = 9, 8
    elif method == "ahash":
        tw, th = 8, 8
    else:
        raise ValueError(f"unknown method {method!r}")
    rows = (np.arange(th, dtype=np.int64) * h) // th
    cols = (np.arange(tw, dtype=np.int64) * w) // tw
    g = gray[rows][:, cols]
    if method == "dhash":
        bits = g[:, :-1] < g[:, 1:]
    else:
        bits = (g * 64) > g.sum()
    v = 0
    for k, b in enumerate(bits.reshape(-1)):
        if b:
            v |= 1 << k
    if v >= 1 << 63:
        v -= 1 << 64
    return v


IMAGE_HASH_SCHEMA = "id long, hash long, error string"


def image_hashes(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    *,
    method: str = "dhash",
    on_error: str = "null",
) -> DataFrame:
    """(id, hash, error): 64-bit perceptual hash (`image_hash_payload`)
    of every payload, Arrow-batched `mapInPandas` under the standard
    quarantine contract — undecodable payloads emit NULL hash + the
    error string under on_error='null' (the default; 'raise' fails
    fast). Row-local, no shuffle; partitioning follows the input
    (`repartition_by_bytes` first for heavy media)."""
    import pandas as pd

    if on_error not in ("null", "raise"):
        raise ValueError(f"unknown on_error: {on_error!r}")
    if method not in ("dhash", "ahash"):
        raise ValueError(f"unknown method {method!r}")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, hs, errs = [], [], []
            for rid, payload in zip(pdf[id_col].values, pdf[payload_col].values):
                payload = bytes(payload) if payload is not None else b""
                try:
                    h = image_hash_payload(payload, method=method)
                    err = None
                except Exception as exc:  # noqa: BLE001 — quarantine channel
                    if on_error == "raise":
                        raise
                    h, err = None, str(exc)[:200]
                ids.append(rid)
                hs.append(h)
                errs.append(err)
            # the hash column MUST be nullable Int64, never inferred: a
            # single None in the batch would otherwise flip pandas to
            # float64, silently rounding every 64-bit hash to the
            # 53-bit mantissa — equal pictures in different batches
            # then hash "differently" and cross-set Hamming matching
            # loses true near-dups (round-14 regression)
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype=object),
                    "hash": pd.array(hs, dtype="Int64"),
                    "error": pd.Series(errs, dtype=object),
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, schema=_with_id_type(IMAGE_HASH_SCHEMA, df, id_col)
    )


def image_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    *,
    method: str = "dhash",
    max_hamming: int = 4,
    max_bucket_size: int | None = None,
    hashes: DataFrame | None = None,
) -> DataFrame:
    """(id_a, id_b, hamming) image pairs whose perceptual hashes sit
    within `max_hamming` bits — re-encoded thumbnails, brightness
    tweaks, format conversions of the same picture. Candidate
    generation NEVER goes all-pairs: the pigeonhole banding from the
    SimHash machinery (`dedup.hamming_near_dup_pairs`) buckets on
    signature chunks with 100% recall. Pass `hashes=` (an
    `image_hashes` result, e.g. persisted parquet) to skip re-decoding
    — the production shape, where hashing runs once per ingest and
    dedup reruns cheaply. `max_bucket_size` defaults to None here
    (exact recall); set it when a corpus carries pathological
    constant-hash floods. Undecodable payloads (NULL hash) never pair."""
    from .dedup import hamming_near_dup_pairs

    if hashes is None:
        hashes = image_hashes(df, id_col, payload_col, method=method)
        hashes = hashes.select(F.col("id").alias(id_col), "hash")
    elif id_col not in hashes.columns and "id" in hashes.columns:
        # an image_hashes() result names its key 'id'
        hashes = hashes.withColumnRenamed("id", id_col)
    sigs = hashes.select(id_col, "hash").filter(F.col("hash").isNotNull())
    return hamming_near_dup_pairs(
        sigs, id_col, "hash",
        bits=64, max_hamming=max_hamming, max_bucket_size=max_bucket_size,
    )


def image_dedup(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    *,
    method: str = "dhash",
    max_hamming: int = 4,
    max_bucket_size: int | None = None,
    hashes: DataFrame | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Perceptual image near-dup removal: close `image_near_dup_pairs`
    into connected components and keep exactly ONE image (the minimum
    id) per cluster — the text `near_dedup` contract on the raster
    channel. Undecodable payloads always survive (a hash that cannot
    be computed is "unknown", not "duplicate") — quarantine them
    separately via `image_hashes`' error column. Returns the input
    columns, filtered. `checkpoint_dir` upgrades the CC rounds to
    reliable checkpoints (`_util.materialize_step`)."""
    from .dedup import connected_components

    pairs = image_near_dup_pairs(
        df, id_col, payload_col,
        method=method, max_hamming=max_hamming,
        max_bucket_size=max_bucket_size, hashes=hashes,
    )
    cc = connected_components(pairs, checkpoint_dir=checkpoint_dir)
    to_drop = cc.filter(F.col("id") != F.col("comp")).select(
        F.col("id").alias(id_col)
    )
    return df.join(to_drop, id_col, "left_anti")


def image_hash_sketch(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    *,
    method: str = "dhash",
) -> DataFrame:
    """The WRITE side of incremental image dedup: (id, hash) for every
    DECODABLE payload — the persistable perceptual-hash sketch of an
    image corpus (16 bytes/row; a billion-image history is ~16 GB of
    parquet). The contract mirrors `dedup.minhash_band_tags`: hash each
    ingested snapshot ONCE, append the result to a parquet sketch
    table, and pass that table to `image_dedup_against(seen_hashes=)` —
    history raw bytes are never re-read or re-decoded. Quarantined
    payloads (hash NULL) are excluded: an uncomputable hash carries no
    match information, and the sketch stays a pure signature log."""
    return (
        image_hashes(df, id_col, payload_col, method=method)
        .filter(F.col("hash").isNotNull())
        .select("id", "hash")
    )


def image_dedup_against(
    new: DataFrame,
    id_col: str,
    payload_col: str,
    *,
    seen_hashes: DataFrame,
    method: str = "dhash",
    max_hamming: int = 4,
) -> DataFrame:
    """Incremental image-corpus update: keep only the NEW images whose
    perceptual hash is NOT within `max_hamming` bits of any history
    hash — `dedup.dedup_against`'s contract on the raster channel, with
    the history side served entirely from a persisted
    `image_hash_sketch` table (per-snapshot cost is O(new batch)
    decode+hash plus a banded join against 16-byte signature rows,
    never O(history) bytes). Candidates come from the cross-set
    pigeonhole banding (`dedup.hamming_matches_against` — 100% recall,
    never all-pairs). New-vs-new duplicates are deliberately NOT
    removed here (same rule as `dedup_against`): run `image_dedup` over
    the survivors. Undecodable new payloads always survive — unknown is
    not duplicate; quarantine them separately via `image_hashes`."""
    from .dedup import hamming_matches_against

    hx = image_hashes(new, id_col, payload_col, method=method).select(
        F.col("id").alias(id_col), "hash"
    )
    if "hash" not in seen_hashes.columns:
        raise ValueError("seen_hashes must be an image_hash_sketch table "
                         "with a 'hash' column")
    dup_ids = hamming_matches_against(
        hx, seen_hashes, id_col=id_col, sig_col="hash",
        bits=64, max_hamming=max_hamming,
    ).select(F.col("id").alias(id_col))
    return new.join(dup_ids, id_col, "left_anti")


def _ulaw_to_linear(u: int) -> int:
    """ITU-T G.711 mu-law byte -> 16-bit linear sample (the classic
    public CCITT expansion)."""
    u = ~u & 0xFF
    t = ((u & 0x0F) << 3) + 0x84
    t <<= (u & 0x70) >> 4
    return 0x84 - t if u & 0x80 else t - 0x84


def _alaw_to_linear(a: int) -> int:
    """ITU-T G.711 A-law byte -> 16-bit linear sample."""
    a ^= 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    # NB: A-law's sign convention is the opposite of mu-law's — a SET
    # sign bit means positive
    return t if a & 0x80 else -t


def _g711_lut(kind: str):
    import numpy as np

    fn = _ulaw_to_linear if kind == "ulaw" else _alaw_to_linear
    return np.asarray([fn(b) for b in range(256)], dtype=np.int16)


def _wav_frames(payload: bytes):
    """RIFF/WAVE decode to samples: returns (channels, rate, bits,
    samples) with samples an interleaved ndarray — int16/uint8 for PCM
    (formats 1), and G.711 mu-law (format 7) / A-law (format 6) bytes
    EXPANDED to int16 linear through the ITU lookup (the telephony
    encodings call-center / voice corpora arrive in); `bits` reports
    the stored width (8 for G.711)."""
    import struct

    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt_chunk, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_chunk = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt_chunk is None or data is None:
        raise ValueError("truncated WAV: missing fmt or data chunk")
    audio_format, channels, rate = struct.unpack_from("<HHI", fmt_chunk, 0)
    bits = struct.unpack_from("<H", fmt_chunk, 14)[0]
    if audio_format in (6, 7):
        if bits != 8:
            raise ValueError(f"G.711 WAV must be 8-bit, got {bits}")
        lut = _g711_lut("alaw" if audio_format == 6 else "ulaw")
        return int(channels), int(rate), 8, lut[
            np.frombuffer(data, np.uint8)
        ]
    if audio_format != 1 or bits not in (8, 16):
        raise NotImplementedError(
            "only PCM (8/16-bit) and G.711 mu-law/A-law WAV are "
            "decodable without an audio library"
        )
    if bits == 16:
        samples = np.frombuffer(data[: len(data) - len(data) % 2], "<i2")
    else:
        samples = np.frombuffer(data, np.uint8)
    return int(channels), int(rate), int(bits), samples


def _decode_wav(payload: bytes) -> dict[str, Any]:
    """RIFF/WAVE PCM audio (8/16-bit): walks the chunk list, reads the
    fmt chunk (channels, sample rate, bit depth), and computes exact
    integer sample statistics over the data chunk (int16 LE / uint8)."""
    import numpy as np

    channels, rate, bits, samples = _wav_frames(payload)
    n = int(samples.size)
    frames = n // channels if channels else 0
    s = int(samples.astype(np.int64).sum())
    return {
        "format": "wav", "channels": int(channels), "sample_rate": int(rate),
        "bits": int(bits), "n_samples": n,
        "duration_ms": (frames * 1000.0 / rate) if rate else None,
        "sum_value": s, "mean_value": (s / n) if n else None,
    }


def resample_audio_payload(payload: bytes, target_rate: int) -> dict[str, Any]:
    """Nearest-sample resample of one PCM WAV payload to `target_rate`
    — the sample-rate-normalization stage an audio training pipeline
    runs before feature extraction. Pure integer index arithmetic:
    n_out = (frames * target_rate) DIV rate, and output frame i copies
    source frame (i * rate) DIV target_rate — bit-deterministic and
    engine-replayable (the `multimodal_resample` oracle selects the
    same source samples in SQL). Channels and bit depth are preserved;
    the result is re-encoded as a canonical 44-byte-header PCM WAV.
    Returns {format, channels, sample_rate, bits, n_samples, n_bytes,
    payload}."""
    import struct

    import numpy as np

    if target_rate < 1:
        raise ValueError("target_rate must be >= 1")
    if sniff_audio_format(payload) != "wav":
        raise NotImplementedError("resample supports PCM WAV input only")
    channels, rate, bits, samples = _wav_frames(payload)
    if rate < 1:
        raise ValueError("source WAV has no sample rate")
    frames = samples.size // channels if channels else 0
    n_out = (frames * target_rate) // rate
    if n_out < 1:
        raise ValueError(
            f"resampling {frames} frames from {rate} to {target_rate} Hz "
            "yields no output frames"
        )
    idx = (np.arange(n_out, dtype=np.int64) * rate) // target_rate
    out = samples.reshape(frames, channels)[idx]
    data = (
        out.astype("<i2").tobytes() if bits == 16
        else out.astype(np.uint8).tobytes()
    )
    block = channels * bits // 8
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack(
            "<IHHIIHH", 16, 1, channels, target_rate,
            target_rate * block, block, bits,
        )
        + b"data" + struct.pack("<I", len(data))
    )
    return {
        "format": "wav", "channels": channels, "sample_rate": target_rate,
        "bits": bits, "n_samples": n_out * channels,
        "n_bytes": len(hdr) + len(data), "payload": hdr + data,
    }


RESAMPLE_SCHEMA = (
    "id long, format string, channels int, sample_rate int, bits int, "
    "n_samples long, n_bytes long, payload binary, error string"
)


def resample_audio(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    *,
    target_rate: int,
    on_error: str = "null",
) -> DataFrame:
    """REAL audio resampling over a binary column (`resize_images`'
    audio twin): nearest-sample resample every PCM WAV payload to
    `target_rate` (`resample_audio_payload`, exact integer index
    arithmetic), re-encoded as canonical PCM WAV. Arrow-batched
    `mapInPandas` with the decode_*_stats quarantine contract
    (on_error='null' routes undecodable payloads to the `error`
    column; 'raise' fails fast)."""
    import pandas as pd

    if on_error not in ("null", "raise"):
        raise ValueError(f"unknown on_error: {on_error!r}")
    if target_rate < 1:
        raise ValueError("target_rate must be >= 1")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for rid, payload in zip(pdf[id_col].values, pdf[payload_col].values):
                payload = bytes(payload) if payload is not None else b""
                try:
                    m = resample_audio_payload(payload, target_rate)
                    out.append(
                        (rid, m["format"], m["channels"], m["sample_rate"],
                         m["bits"], m["n_samples"], m["n_bytes"],
                         m["payload"], None)
                    )
                except Exception as exc:  # noqa: BLE001 — quarantine channel
                    if on_error == "raise":
                        raise
                    out.append(
                        (rid, sniff_audio_format(payload), None, None,
                         None, None, None, None, str(exc)[:200])
                    )
            yield pd.DataFrame(
                out,
                columns=["id", "format", "channels", "sample_rate", "bits",
                         "n_samples", "n_bytes", "payload", "error"],
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, schema=_with_id_type(RESAMPLE_SCHEMA, df, id_col)
    )


def decode_audio(
    payload: bytes,
    fmt: str | None = None,
    *,
    decoders: dict[tuple[str, str], Any] | None = None,
) -> dict[str, Any]:
    """Decode an audio payload via the decoder registry. Built-in (REAL,
    library-free): RIFF/WAVE PCM 8/16-bit (see `_decode_wav`). Lossy
    codecs (mp3/aac/...) raise NotImplementedError unless plugged in
    via `register_decoder("audio", fmt, fn)` — they need an audio
    library this container does not ship."""
    fmt = fmt or sniff_audio_format(payload)
    fn = (decoders if decoders is not None else _DECODERS).get(("audio", fmt))
    if fn is not None:
        return fn(payload)
    raise NotImplementedError(
        f"decoding {fmt or 'unknown'} audio requires a library not "
        f"present in this container; register_decoder('audio', {fmt!r}, "
        "fn) to plug one in, or feed RIFF/WAVE PCM"
    )


DECODE_AUDIO_SCHEMA = (
    "id long, format string, channels int, sample_rate int, bits int, "
    "n_samples long, duration_ms double, sum_value long, mean_value double, "
    "error string"
)


def decode_audio_stats(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    *,
    on_error: str = "null",
) -> DataFrame:
    """`decode_image_stats`' audio twin: REAL WAV/PCM decoding over a
    binary column (see `decode_audio`), Arrow-batched, with the same
    quarantine error channel (`on_error='null'` default) so corrupt or
    lossy-codec payloads degrade to NULL-stats rows instead of killing
    a corpus sweep. Registry snapshot semantics as `decode_image_stats`."""
    import pandas as pd

    if on_error not in ("null", "raise"):
        raise ValueError(f"unknown on_error: {on_error!r}")
    decoders = dict(_DECODERS)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for rid, payload in zip(pdf[id_col].values, pdf[payload_col].values):
                payload = bytes(payload) if payload is not None else b""
                try:
                    m = decode_audio(payload, decoders=decoders)
                    out.append(
                        (rid, m["format"], m["channels"], m["sample_rate"],
                         m["bits"], m["n_samples"], m["duration_ms"],
                         m["sum_value"], m["mean_value"], None)
                    )
                except Exception as exc:  # noqa: BLE001 — quarantine channel
                    if on_error == "raise":
                        raise
                    out.append(
                        (rid, None, None, None, None, None, None, None, None,
                         str(exc)[:200])
                    )
            yield pd.DataFrame(
                out,
                columns=["id", "format", "channels", "sample_rate", "bits",
                         "n_samples", "duration_ms", "sum_value",
                         "mean_value", "error"],
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, schema=_with_id_type(DECODE_AUDIO_SCHEMA, df, id_col)
    )


def _decode_y4m(payload: bytes) -> dict[str, Any]:
    """YUV4MPEG2 (.y4m) — uncompressed video with a text header and raw
    YUV frames: dimensions, frame rate, frame count, duration, and exact
    integer statistics over the raw frame bytes."""
    import numpy as np

    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.index(b"\n")
    w = h = None
    fps_n, fps_d = 25, 1
    colorspace = "420"
    for tok in payload[9:nl].split():
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            fps_n, fps_d = (int(x) for x in val.split(b":"))
        elif tag == b"C":
            colorspace = val.decode("ascii", "replace")
    if not w or not h:
        raise ValueError("y4m header missing W/H")
    if colorspace.startswith("420"):
        frame_bytes = w * h * 3 // 2
    elif colorspace.startswith("422"):
        frame_bytes = w * h * 2
    elif colorspace.startswith("444"):
        frame_bytes = w * h * 3
    elif colorspace.startswith("mono"):
        frame_bytes = w * h
    else:
        raise NotImplementedError(f"y4m colorspace {colorspace!r}")
    pos, n_frames, total = nl + 1, 0, 0
    while pos < len(payload):
        if not payload.startswith(b"FRAME", pos):
            raise ValueError(f"bad FRAME marker at byte {pos}")
        pos = payload.index(b"\n", pos) + 1
        frame = np.frombuffer(payload, np.uint8, count=frame_bytes, offset=pos)
        total += int(frame.astype(np.int64).sum())
        n_frames += 1
        pos += frame_bytes
    fps = fps_n / fps_d
    return {
        "format": "y4m", "width": w, "height": h, "n_frames": n_frames,
        "fps": fps, "duration_ms": n_frames * 1000.0 / fps if fps else None,
        "sum_value": total,
        "mean_value": (
            total / (n_frames * frame_bytes) if n_frames else None
        ),
    }


def decode_video(
    payload: bytes,
    fmt: str | None = None,
    *,
    decoders: dict[tuple[str, str], Any] | None = None,
) -> dict[str, Any]:
    """Decode a video payload via the decoder registry. Built-in (REAL,
    library-free): YUV4MPEG2 (see `_decode_y4m`). Compressed containers
    (mp4/webm/...) raise NotImplementedError unless plugged in via
    `register_decoder("video", fmt, fn)` — they need a codec library
    this container does not ship."""
    fmt = fmt or sniff_video_format(payload)
    fn = (decoders if decoders is not None else _DECODERS).get(("video", fmt))
    if fn is not None:
        return fn(payload)
    raise NotImplementedError(
        f"decoding {fmt or 'unknown'} video requires a codec library not "
        f"present in this container; register_decoder('video', {fmt!r}, "
        "fn) to plug one in, or feed YUV4MPEG2 (.y4m)"
    )


# the built-in library-free decoders are ordinary registrants — the
# remaining compressed codecs plug in beside them through the same hook
_DECODERS.update(
    {
        ("image", "ppm"): _decode_ppm,
        ("image", "pgm"): _decode_pgm,
        ("image", "bmp"): _decode_bmp,
        ("image", "png"): _decode_png,
        ("image", "gif"): _decode_gif,
        ("image", "jpeg"): _decode_jpeg,
        ("audio", "wav"): _decode_wav,
        ("video", "y4m"): _decode_y4m,
    }
)
# snapshot for unregister_decoder's restore-the-built-in contract
_BUILTIN_DECODERS = dict(_DECODERS)


DECODE_VIDEO_SCHEMA = (
    "id long, format string, width int, height int, n_frames long, "
    "fps double, duration_ms double, sum_value long, mean_value double, "
    "error string"
)


def decode_video_stats(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    *,
    on_error: str = "null",
) -> DataFrame:
    """`decode_image_stats`' video twin: REAL YUV4MPEG2 decoding over a
    binary column (see `decode_video`), Arrow-batched, with the same
    quarantine error channel. Registry snapshot semantics as
    `decode_image_stats`."""
    import pandas as pd

    if on_error not in ("null", "raise"):
        raise ValueError(f"unknown on_error: {on_error!r}")
    decoders = dict(_DECODERS)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for rid, payload in zip(pdf[id_col].values, pdf[payload_col].values):
                payload = bytes(payload) if payload is not None else b""
                try:
                    m = decode_video(payload, decoders=decoders)
                    out.append(
                        (rid, m["format"], m["width"], m["height"],
                         m["n_frames"], m["fps"], m["duration_ms"],
                         m["sum_value"], m["mean_value"], None)
                    )
                except Exception as exc:  # noqa: BLE001 — quarantine channel
                    if on_error == "raise":
                        raise
                    out.append(
                        (rid, None, None, None, None, None, None, None, None,
                         str(exc)[:200])
                    )
            yield pd.DataFrame(
                out,
                columns=["id", "format", "width", "height", "n_frames",
                         "fps", "duration_ms", "sum_value", "mean_value",
                         "error"],
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, schema=_with_id_type(DECODE_VIDEO_SCHEMA, df, id_col)
    )


AUDIO_PROBE_SCHEMA = (
    "id long, format string, sample_rate int, channels int, "
    "duration_ms long, bitrate_kbps int, n_bytes long, error string"
)

# MPEG-1 Layer III bitrate (kbps) and sample-rate tables (public ISO
# 11172-3 values); index 0 and 15 are free/forbidden
_MP3_BITRATES_V1L3 = [
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0,
]
_MP3_BITRATES_V2L3 = [
    0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0,
]
_MP3_RATES = {  # by version bits (00=2.5, 10=2, 11=1)
    3: [44100, 48000, 32000, 0],
    2: [22050, 24000, 16000, 0],
    0: [11025, 12000, 8000, 0],
}


def audio_probe_payload(payload: bytes) -> dict[str, Any]:
    """HEADER-ONLY audio metadata — the audio analog of
    `image_dimensions_payload`: a duration/rate/channel census over a
    speech/music corpus should read a few dozen header bytes per
    file, never decode samples. Parses:

    - WAV: RIFF chunk walk — fmt (channels, rate, bits) + data size
      -> exact duration;
    - FLAC: the mandatory STREAMINFO metadata block (rate 20 bits,
      channels 3, total samples 36) — exact duration;
    - MP3: ID3v2 skip (syncsafe size), first frame header (version/
      layer/bitrate/rate via the ISO tables), then a Xing/Info/VBRI
      frame-count header when present (exact VBR duration) or the
      CBR estimate (audio_bytes * 8 / bitrate) — flagged by
      `duration_exact`;
    - OGG: the identification page (Vorbis: rate+channels; Opus:
      channels, 48 kHz clock) and the LAST page's granule position
      scanned from the tail -> exact duration;
    - M4A (ISOBMFF audio brands M4A/M4B/M4P): moov/mvhd timescale +
      duration (exact), channels/rate from the stsd audio sample
      entry; bitrate stays NULL (esds not chased).

    Raises ValueError/NotImplementedError for truncated or unknown
    payloads (the quarantine contract)."""
    fmt = sniff_audio_format(payload)
    if fmt == "wav":
        return _probe_wav(payload)
    if fmt == "flac":
        return _probe_flac(payload)
    if fmt == "mp3":
        return _probe_mp3(payload)
    if fmt == "ogg":
        return _probe_ogg(payload)
    if fmt == "m4a":
        return _probe_m4a(payload)
    raise NotImplementedError(
        f"audio probe for {fmt or 'unknown'} is not supported"
    )


def _probe_wav(payload: bytes) -> dict[str, Any]:
    if len(payload) < 12 or payload[8:12] != b"WAVE":
        raise ValueError("truncated WAV header")
    pos, n = 12, len(payload)
    channels = rate = bits = None
    data_size = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        if cid == b"fmt ":
            _fmt, channels, rate = struct.unpack_from(
                "<HHI", payload, pos + 8
            )
            bits = struct.unpack_from("<H", payload, pos + 22)[0]
        elif cid == b"data":
            data_size = min(size, n - pos - 8)
        pos += 8 + size + (size & 1)  # chunks pad to even
    if not channels or not rate or data_size is None:
        raise ValueError("WAV missing fmt or data chunk")
    bytes_per_frame = channels * max(1, (bits or 8) // 8)
    frames = data_size // bytes_per_frame
    return {
        "format": "wav", "sample_rate": int(rate),
        "channels": int(channels),
        "duration_ms": frames * 1000 // rate,
        "bitrate_kbps": rate * bytes_per_frame * 8 // 1000,
        "duration_exact": True,
    }


def _probe_flac(payload: bytes) -> dict[str, Any]:
    # fLaC, then metadata blocks: 1-byte (last<<7|type), 3-byte size;
    # STREAMINFO (type 0) is mandatory-first per the spec
    if len(payload) < 8 + 34:
        raise ValueError("truncated FLAC header")
    btype = payload[4] & 0x7F
    if btype != 0:
        raise ValueError("FLAC STREAMINFO block not first")
    si = payload[8 : 8 + 34]
    rate = (si[10] << 12) | (si[11] << 4) | (si[12] >> 4)
    channels = ((si[12] >> 1) & 0x07) + 1
    total = ((si[13] & 0x0F) << 32) | struct.unpack_from(">I", si, 14)[0]
    if rate == 0:
        raise ValueError("FLAC invalid sample rate")
    return {
        "format": "flac", "sample_rate": rate, "channels": channels,
        "duration_ms": total * 1000 // rate if total else None,
        "bitrate_kbps": None, "duration_exact": bool(total),
    }


def _probe_mp3(payload: bytes) -> dict[str, Any]:
    pos = 0
    if payload[:3] == b"ID3":  # syncsafe 28-bit size + 10-byte header
        if len(payload) < 10:
            raise ValueError("truncated ID3 header")
        sz = (
            (payload[6] << 21) | (payload[7] << 14)
            | (payload[8] << 7) | payload[9]
        )
        pos = 10 + sz
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] == 0xFF and (payload[pos + 1] & 0xE0) == 0xE0:
            break
        pos += 1
    else:
        raise ValueError("no MP3 frame sync found")
    h1, h2, h3 = payload[pos + 1], payload[pos + 2], payload[pos + 3]
    version = (h1 >> 3) & 0x03  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    layer = (h1 >> 1) & 0x03    # 1=Layer III
    if version == 1 or layer != 1:
        raise NotImplementedError(
            "only MPEG Layer III audio frames are probed"
        )
    bidx = (h2 >> 4) & 0x0F
    ridx = (h2 >> 2) & 0x03
    rate = _MP3_RATES[version][ridx]
    table = _MP3_BITRATES_V1L3 if version == 3 else _MP3_BITRATES_V2L3
    kbps = table[bidx]
    if rate == 0 or kbps == 0:
        raise ValueError("invalid MP3 bitrate/samplerate index")
    channels = 1 if ((h3 >> 6) & 0x03) == 3 else 2
    spf = 1152 if version == 3 else 576  # samples per L3 frame
    audio_bytes = n - pos
    # Xing/Info (VBR) frame count sits after the side info, whose
    # size depends on version/mode: MPEG1 32/17, MPEG2(.5) 17/9
    side = (32 if channels == 2 else 17) if version == 3 else (
        17 if channels == 2 else 9
    )
    xing_at = pos + 4 + side
    dur_exact = False
    duration_ms = audio_bytes * 8 // kbps  # CBR estimate (ms: /1000*1000)
    if payload[xing_at : xing_at + 4] in (b"Xing", b"Info") and \
            xing_at + 12 <= n:
        (flags,) = struct.unpack_from(">I", payload, xing_at + 4)
        if flags & 1:  # frame count present
            (nframes,) = struct.unpack_from(">I", payload, xing_at + 8)
            duration_ms = nframes * spf * 1000 // rate
            dur_exact = True
    # Fraunhofer VBRI: fixed 32 bytes after the frame header (not
    # side-info-relative); VBRI + ver(2) delay(2) quality(2) bytes(4)
    # then the frame count at +14
    vbri_at = pos + 4 + 32
    if not dur_exact and payload[vbri_at : vbri_at + 4] == b"VBRI" \
            and vbri_at + 18 <= n:
        (nframes,) = struct.unpack_from(">I", payload, vbri_at + 14)
        if nframes > 0:
            duration_ms = nframes * spf * 1000 // rate
            dur_exact = True
    return {
        "format": "mp3", "sample_rate": rate, "channels": channels,
        "duration_ms": int(duration_ms), "bitrate_kbps": kbps,
        "duration_exact": dur_exact,
    }


def _probe_ogg(payload: bytes) -> dict[str, Any]:
    if len(payload) < 58:
        raise ValueError("truncated OGG page")
    nseg = payload[26]
    body = payload[27 + nseg :]
    if body.startswith(b"\x01vorbis"):
        channels = body[11]
        (rate,) = struct.unpack_from("<I", body, 12)
        clock = rate
        fmt = "ogg-vorbis"
    elif body.startswith(b"OpusHead"):
        channels = body[9]
        rate = 48000  # Opus granule clock is always 48 kHz
        clock = 48000
        fmt = "ogg-opus"
    else:
        raise NotImplementedError(
            "unknown OGG codec (vorbis/opus identification expected)"
        )
    if not rate or not channels:
        raise ValueError("invalid OGG identification header")
    # last page granule position: scan the tail for the final OggS
    last = payload.rfind(b"OggS")
    duration_ms = None
    exact = False
    if last >= 0 and last + 14 <= len(payload):
        (granule,) = struct.unpack_from("<q", payload, last + 6)
        if granule > 0:
            duration_ms = granule * 1000 // clock
            exact = True
    return {
        "format": fmt, "sample_rate": int(rate),
        "channels": int(channels), "duration_ms": duration_ms,
        "bitrate_kbps": None, "duration_exact": exact,
    }


def audio_probe(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """`audio_probe_payload` over a binary column: one row per payload
    with (format, sample_rate, channels, duration_ms, bitrate_kbps)
    from HEADER bytes only — the audio-corpus census/triage pass.
    Arrow-batched mapInPandas with the quarantine error channel."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for rid, payload in zip(
                pdf[id_col].values, pdf[payload_col].values
            ):
                payload = bytes(payload) if payload is not None else b""
                try:
                    m = audio_probe_payload(payload)
                    out.append(
                        (rid, m["format"], m["sample_rate"],
                         m["channels"], m["duration_ms"],
                         m["bitrate_kbps"], len(payload), None)
                    )
                except Exception as exc:  # noqa: BLE001 — quarantine
                    out.append(
                        (rid, sniff_audio_format(payload), None, None,
                         None, None, len(payload), str(exc)[:200])
                    )
            frame = pd.DataFrame(
                out,
                columns=["id", "format", "sample_rate", "channels",
                         "duration_ms", "bitrate_kbps", "n_bytes",
                         "error"],
            )
            for col in ("sample_rate", "channels", "bitrate_kbps"):
                frame[col] = pd.array(frame[col], dtype="Int32")
            frame["duration_ms"] = pd.array(
                frame["duration_ms"], dtype="Int64"
            )
            yield frame

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, schema=_with_id_type(AUDIO_PROBE_SCHEMA, df, id_col)
    )


VIDEO_PROBE_SCHEMA = (
    "id long, format string, width int, height int, duration_ms long, "
    "fps double, n_tracks int, n_bytes long, error string"
)


def video_probe_payload(payload: bytes) -> dict[str, Any]:
    """HEADER-ONLY video metadata — the third leg of the census triad
    (image_dimensions / audio_probe / this): dimensions, duration,
    and frame rate from container headers, never decoded frames.

    - Y4M: the YUV4MPEG2 parameter line (W/H/F tags) — dimensions and
      exact fps; duration needs a frame count, so it stays None (the
      stream is headerless-per-frame by design);
    - MP4/MOV: top-level box walk to moov/mvhd (version 0 and 1) —
      timescale + duration -> exact duration_ms; trak boxes counted;
      dimensions from the first non-zero tkhd width/height (16.16
      fixed point);
    - WebM/Matroska: an EBML element walk (variable-length-integer
      IDs/sizes, unknown-size streamed Segments) to Info
      (TimecodeScale + Duration) and Tracks (entry count, first
      Video PixelWidth/Height).

    Raises ValueError/NotImplementedError for truncated or unknown
    payloads (the quarantine contract)."""
    fmt = sniff_video_format(payload)
    if fmt == "y4m":
        header = payload.split(b"\n", 1)[0].decode("ascii", "replace")
        w = h = None
        fps = None
        for tag in header.split(" ")[1:]:
            if tag.startswith("W"):
                w = int(tag[1:])
            elif tag.startswith("H"):
                h = int(tag[1:])
            elif tag.startswith("F"):
                num, den = tag[1:].split(":")
                fps = int(num) / int(den)
        if not w or not h:
            raise ValueError("Y4M header missing W/H")
        return {
            "format": "y4m", "width": w, "height": h,
            "duration_ms": None, "fps": fps, "n_tracks": 1,
        }
    if fmt == "mp4":
        return _probe_mp4(payload)
    if fmt == "webm":
        return _probe_ebml(payload)
    raise NotImplementedError(
        f"video probe for {fmt or 'unknown'} is not supported"
    )


def _ebml_vint(data: bytes, pos: int, keep_marker: bool):
    """EBML variable-length integer at `pos`: returns (value,
    next_pos). Element IDs keep the length-marker bit; sizes strip
    it. An all-ones size payload means 'unknown size'."""
    if pos >= len(data):
        raise ValueError("truncated EBML vint")
    first = data[pos]
    if first == 0:
        raise ValueError("invalid EBML vint")
    length = 8 - first.bit_length() + 1
    if pos + length > len(data):
        raise ValueError("truncated EBML vint")
    v = first if keep_marker else first & ((1 << (8 - length)) - 1)
    unknown = (first & ((1 << (8 - length)) - 1)) == (1 << (8 - length)) - 1
    for i in range(1, length):
        b = data[pos + i]
        v = (v << 8) | b
        unknown = unknown and b == 0xFF
    if not keep_marker and unknown:
        v = -1  # unknown size (streamed Segment)
    return v, pos + length


_EBML_SEGMENT = 0x18538067
_EBML_INFO = 0x1549A966
_EBML_TRACKS = 0x1654AE6B
_EBML_TRACK_ENTRY = 0xAE
_EBML_VIDEO = 0xE0
_EBML_TIMESCALE = 0x2AD7B1
_EBML_DURATION = 0x4489
_EBML_PIXEL_W = 0xB0
_EBML_PIXEL_H = 0xBA
_EBML_CONTAINERS = frozenset(
    {_EBML_SEGMENT, _EBML_INFO, _EBML_TRACKS, _EBML_TRACK_ENTRY,
     _EBML_VIDEO}
)


def _probe_ebml(payload: bytes) -> dict[str, Any]:
    """WebM/Matroska header walk: Segment > Info (TimecodeScale +
    Duration) and Segment > Tracks (TrackEntry count, first Video
    PixelWidth/Height). Containers recurse; everything else skips by
    size; unknown-size containers (streamed files) parse children to
    the enclosing bound."""
    state = {
        "scale": 1_000_000, "dur": None, "w": None, "h": None,
        "tracks": 0,
    }

    def walk(pos: int, end: int):
        while pos < end:
            try:
                eid, pos = _ebml_vint(payload, pos, keep_marker=True)
                size, pos = _ebml_vint(payload, pos, keep_marker=False)
            except ValueError:
                # tolerate malformed/truncated children: stop walking
                # THIS container; the top-level no-headers check still
                # quarantines streams with nothing parseable
                return
            body_end = end if size < 0 else min(end, pos + size)
            if eid == _EBML_TRACK_ENTRY:
                state["tracks"] += 1
            if eid in _EBML_CONTAINERS:
                walk(pos, body_end)
            elif eid == _EBML_TIMESCALE:
                state["scale"] = int.from_bytes(
                    payload[pos:body_end], "big"
                )
            elif eid == _EBML_DURATION:
                raw = payload[pos:body_end]
                if len(raw) == 4:
                    state["dur"] = struct.unpack(">f", raw)[0]
                elif len(raw) == 8:
                    state["dur"] = struct.unpack(">d", raw)[0]
            elif eid == _EBML_PIXEL_W and state["w"] is None:
                state["w"] = int.from_bytes(payload[pos:body_end], "big")
            elif eid == _EBML_PIXEL_H and state["h"] is None:
                state["h"] = int.from_bytes(payload[pos:body_end], "big")
            pos = body_end

    walk(0, len(payload))
    if state["dur"] is None and state["tracks"] == 0:
        raise ValueError("EBML stream has no Info/Tracks headers")
    duration_ms = None
    if state["dur"] is not None and state["scale"]:
        duration_ms = int(
            state["dur"] * state["scale"] // 1_000_000
        )
    return {
        "format": "webm", "width": state["w"], "height": state["h"],
        "duration_ms": duration_ms, "fps": None,
        "n_tracks": state["tracks"],
    }


def _mp4_boxes(data: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) over a box range."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        btype = data[pos + 4 : pos + 8]
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                return
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body = pos + 16
        elif size == 0:  # to end of file
            size = end - pos
            body = pos + 8
        else:
            body = pos + 8
        if size < 8 or pos + size > end:
            return
        yield btype, body, pos + size
        pos += size


def _probe_mp4(payload: bytes) -> dict[str, Any]:
    duration_ms = None
    n_tracks = 0
    width = height = None
    for btype, b0, b1 in _mp4_boxes(payload, 0, len(payload)):
        if btype != b"moov":
            continue
        for ctype, c0, c1 in _mp4_boxes(payload, b0, b1):
            if ctype == b"mvhd":
                ver = payload[c0]
                if ver == 1:
                    ts, dur = struct.unpack_from(">IQ", payload, c0 + 20)
                else:
                    ts, dur = struct.unpack_from(">II", payload, c0 + 12)
                if ts:
                    duration_ms = dur * 1000 // ts
            elif ctype == b"trak":
                n_tracks += 1
                for ttype, t0, _t1 in _mp4_boxes(payload, c0, c1):
                    if ttype == b"tkhd" and width is None:
                        ver = payload[t0]
                        # v0: 4 fullbox + 4+4+4+4+4 + 8 reserved +
                        # 2+2+2+2 + 36 matrix = 76; v1 adds 12 for
                        # the three 64-bit times/duration
                        off = t0 + (88 if ver == 1 else 76)
                        if off + 8 <= len(payload):
                            w16, h16 = struct.unpack_from(
                                ">II", payload, off
                            )
                            if w16 and h16:  # 16.16 fixed point
                                width = w16 >> 16
                                height = h16 >> 16
    if duration_ms is None and n_tracks == 0:
        raise ValueError("MP4 has no moov/mvhd box")
    return {
        "format": "mp4", "width": width, "height": height,
        "duration_ms": duration_ms, "fps": None, "n_tracks": n_tracks,
    }


def _probe_m4a(payload: bytes) -> dict[str, Any]:
    """ISOBMFF audio (M4A/AAC/ALAC — ISO 14496-12): reuse the
    `_mp4_boxes` walk — moov/mvhd timescale+duration give the exact
    movie duration, and the first trak's stbl/stsd audio sample entry
    carries channelcount and the 16.16 sample rate. The esds bitrate
    descriptor is not chased (bitrate_kbps stays NULL — the census
    fields a corpus triage needs are rate/channels/duration)."""
    duration_ms = None
    sample_rate = channels = None
    saw_moov = False
    for btype, b0, b1 in _mp4_boxes(payload, 0, len(payload)):
        if btype != b"moov":
            continue
        saw_moov = True
        for ctype, c0, c1 in _mp4_boxes(payload, b0, b1):
            if ctype == b"mvhd":
                ver = payload[c0]
                if ver == 1:
                    ts, dur = struct.unpack_from(">IQ", payload, c0 + 20)
                else:
                    ts, dur = struct.unpack_from(">II", payload, c0 + 12)
                if ts:
                    duration_ms = dur * 1000 // ts
            elif ctype == b"trak" and sample_rate is None:
                sample_rate, channels = _m4a_sample_entry(payload, c0, c1)
    if not saw_moov:
        raise ValueError("M4A has no moov box")
    return {
        "format": "m4a", "sample_rate": sample_rate,
        "channels": channels, "duration_ms": duration_ms,
        "bitrate_kbps": None,
        "duration_exact": duration_ms is not None,
    }


def _m4a_sample_entry(
    payload: bytes, t0: int, t1: int
) -> tuple[int | None, int | None]:
    """(sample_rate, channels) from trak→mdia→minf→stbl→stsd's first
    audio sample entry. AudioSampleEntry layout (14496-12 §12.2.3):
    6 reserved + 2 data_reference_index, 2+2+4 version/revision/
    vendor, channelcount(2) at +16, samplesize(2), 2+2 pre_defined/
    reserved, then samplerate as 16.16 fixed at +24."""
    rng = (t0, t1)
    for name in (b"mdia", b"minf", b"stbl"):
        for btype, b0, b1 in _mp4_boxes(payload, rng[0], rng[1]):
            if btype == name:
                rng = (b0, b1)
                break
        else:
            return None, None
    for btype, b0, b1 in _mp4_boxes(payload, rng[0], rng[1]):
        if btype != b"stsd":
            continue
        # stsd is a fullbox: version/flags (4) + entry_count (4), then
        # the sample-entry boxes
        for etype, e0, e1 in _mp4_boxes(payload, b0 + 8, b1):
            if etype in (
                b"mp4a", b"alac", b"ac-3", b"ec-3", b"Opus", b"fLaC"
            ) and e0 + 28 <= e1:
                (ch,) = struct.unpack_from(">H", payload, e0 + 16)
                (sr,) = struct.unpack_from(">I", payload, e0 + 24)
                return (sr >> 16) or None, ch or None
            return None, None
    return None, None


def video_probe(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """`video_probe_payload` over a binary column — Arrow-batched
    mapInPandas with the quarantine error channel (the
    image_dimensions / audio_probe contract)."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for rid, payload in zip(
                pdf[id_col].values, pdf[payload_col].values
            ):
                payload = bytes(payload) if payload is not None else b""
                try:
                    m = video_probe_payload(payload)
                    out.append(
                        (rid, m["format"], m["width"], m["height"],
                         m["duration_ms"], m["fps"], m["n_tracks"],
                         len(payload), None)
                    )
                except Exception as exc:  # noqa: BLE001 — quarantine
                    out.append(
                        (rid, sniff_video_format(payload), None, None,
                         None, None, None, len(payload),
                         str(exc)[:200])
                    )
            frame = pd.DataFrame(
                out,
                columns=["id", "format", "width", "height",
                         "duration_ms", "fps", "n_tracks", "n_bytes",
                         "error"],
            )
            for col in ("width", "height", "n_tracks"):
                frame[col] = pd.array(frame[col], dtype="Int32")
            frame["duration_ms"] = pd.array(
                frame["duration_ms"], dtype="Int64"
            )
            yield frame

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, schema=_with_id_type(VIDEO_PROBE_SCHEMA, df, id_col)
    )
