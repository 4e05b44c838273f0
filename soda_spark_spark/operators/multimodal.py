"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched pandas iterators.

The decode step itself is STUBBED (the image/audio libraries are not in this
container — `decode_image` raises NotImplementedError unless
`fake_decoder=True` supplies a deterministic fake), but everything Spark-side
is real and tested: the schema convention, the mapInPandas batch shape, the
metadata extraction, and the partition sizing story (binary payloads make
rows heavy — repartition by byte budget, not row count).
"""

from __future__ import annotations

import hashlib
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


def decode_image(payload: bytes, fmt: str) -> dict[str, Any]:
    """REAL DECODER STUB — image libraries are not available in this
    environment. Cite: would use PIL/opencv via mapInPandas in production."""
    raise NotImplementedError(
        "image decoding requires an imaging library not present in this "
        "container; use fake_decoder=True for the deterministic test fake"
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
                    meta = decode_image(payload, "png")
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
