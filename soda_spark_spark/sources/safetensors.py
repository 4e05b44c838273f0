"""SafeTensors shard ingestion — the HuggingFace tensor-shard
container (model weights, embedding dumps, dataset tensors) into
census rows and vector rows.

Format (public spec, github.com/huggingface/safetensors README +
the reference Rust implementation's validation rules):

- bytes 0..8: little-endian u64 ``N`` = byte length of the header;
- bytes 8..8+N: a strict JSON object ``{tensor_name: {"dtype": ...,
  "shape": [...], "data_offsets": [begin, end]}, ...}`` plus an
  optional ``"__metadata__"`` entry whose value is a string->string
  map;
- bytes 8+N..EOF: the byte buffer; ``data_offsets`` are relative to
  the buffer start.

The format's safety point is that the header fully describes the
layout and can be VALIDATED before any byte of tensor data is
touched. Laws enforced here (each failure quarantines the file as
ONE error row — never a crash, never silent truncation):

- the header length must fit the file and a sanity bound (100 MB,
  the HF implementation's limit);
- the header must parse as a JSON object; every tensor entry needs
  string dtype from the known table, a non-negative integer shape,
  and a 2-element ``data_offsets``;
- ``end - begin`` must equal ``prod(shape) * dtype_size`` exactly;
- tensors must tile the buffer CONTIGUOUSLY: sorted by begin, the
  first starts at 0, each next begins where the previous ended, and
  the last ends at the buffer's end — no holes, no overlaps (the
  anti-aliasing rule the reference validator enforces);
- ``__metadata__`` must map strings to strings.

`read_safetensors_index` emits one census row per tensor WITHOUT
reading tensor bytes (header-only: right at 100 TB, where shards are
multi-GB and the census must not drag the buffers through Python).
`read_safetensors_vectors` decodes numeric 1-D/2-D tensors into
(row_index, array<float>) rows — float32 canonical width, the same
stance as the .npy reader; BF16 is decoded by widening each 16-bit
pattern into the top half of a float32 word (bfloat16 IS the top
half of binary32, so the widening is exact).

Scale shape: one binaryFile task per shard; header parse is one
json.loads, vector decode is numpy frombuffer + one cast — no
per-element Python. Shard count is the parallelism unit, as with
TFRecord/NPY/WARC.

Derived from the public safetensors format description; the
reference (src/sodaspark/scan.py:441-442) scans already-loaded
frames — container ingestion is additive surface.
"""

from __future__ import annotations

import json
import struct

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "SAFETENSORS_INDEX_SCHEMA",
    "SAFETENSORS_VECTOR_SCHEMA",
    "parse_safetensors_header",
    "read_safetensors_index",
    "read_safetensors_vectors",
    "write_safetensors",
]

SAFETENSORS_INDEX_SCHEMA = (
    "file string, tensor string, dtype string, shape array<long>,"
    " n_elements long, nbytes long, offset_begin long,"
    " offset_end long, metadata string, error string"
)

SAFETENSORS_VECTOR_SCHEMA = (
    "file string, tensor string, row_index int,"
    " embedding array<float>, dim int, error string"
)

_MAX_HEADER = 100 * 1024 * 1024  # the HF implementation's bound

_DTYPE_SIZE = {
    "F64": 8, "F32": 4, "F16": 2, "BF16": 2,
    "I64": 8, "I32": 4, "I16": 2, "I8": 1,
    "U64": 8, "U32": 4, "U16": 2, "U8": 1,
    "BOOL": 1, "F8_E4M3": 1, "F8_E5M2": 1,
}

# numpy view used by the vector decoder (BF16/F8 handled separately)
_NUMPY_DTYPE = {
    "F64": "<f8", "F32": "<f4", "F16": "<f2",
    "I64": "<i8", "I32": "<i4", "I16": "<i2", "I8": "<i1",
    "U64": "<u8", "U32": "<u4", "U16": "<u2", "U8": "<u1",
    "BOOL": "<u1",
}


def parse_safetensors_header(data: bytes) -> tuple[dict, str | None, int]:
    """Validate and parse one shard's header (module contract).

    Returns (tensors, metadata_json, buffer_start) where `tensors` is
    {name: (dtype, shape, begin, end)} and `metadata_json` is the
    canonical (sorted-keys) JSON of __metadata__ or None. Raises
    ValueError on every law violation listed in the module docstring.
    """
    if len(data) < 8:
        raise ValueError("file shorter than the 8-byte header length")
    (n,) = struct.unpack("<Q", data[:8])
    if n > _MAX_HEADER:
        raise ValueError(f"header length {n} exceeds {_MAX_HEADER}")
    if 8 + n > len(data):
        raise ValueError("header length exceeds file size")
    try:
        header = json.loads(data[8 : 8 + n].decode("utf-8"))
    except (UnicodeDecodeError, json.JSONDecodeError) as e:
        raise ValueError(f"header is not valid JSON: {e}") from None
    if not isinstance(header, dict):
        raise ValueError("header JSON is not an object")

    metadata_json = None
    meta = header.pop("__metadata__", None)
    if meta is not None:
        if not isinstance(meta, dict) or not all(
            isinstance(k, str) and isinstance(v, str)
            for k, v in meta.items()
        ):
            raise ValueError("__metadata__ must map strings to strings")
        metadata_json = json.dumps(meta, sort_keys=True)

    buf_len = len(data) - 8 - n
    tensors: dict[str, tuple[str, list, int, int]] = {}
    for name, entry in header.items():
        if not isinstance(entry, dict):
            raise ValueError(f"tensor {name!r}: entry is not an object")
        dtype = entry.get("dtype")
        shape = entry.get("shape")
        offsets = entry.get("data_offsets")
        if dtype not in _DTYPE_SIZE:
            raise ValueError(f"tensor {name!r}: unknown dtype {dtype!r}")
        if not isinstance(shape, list) or not all(
            isinstance(s, int) and not isinstance(s, bool) and s >= 0
            for s in shape
        ):
            raise ValueError(f"tensor {name!r}: bad shape {shape!r}")
        if (
            not isinstance(offsets, list)
            or len(offsets) != 2
            or not all(
                isinstance(o, int) and not isinstance(o, bool)
                for o in offsets
            )
        ):
            raise ValueError(
                f"tensor {name!r}: bad data_offsets {offsets!r}"
            )
        begin, end = offsets
        n_elem = 1
        for s in shape:
            n_elem *= s
        want = n_elem * _DTYPE_SIZE[dtype]
        if begin < 0 or end < begin or end > buf_len:
            raise ValueError(
                f"tensor {name!r}: offsets [{begin}, {end}) outside "
                f"the {buf_len}-byte buffer"
            )
        if end - begin != want:
            raise ValueError(
                f"tensor {name!r}: {end - begin} bytes for "
                f"{n_elem} x {dtype} (= {want})"
            )
        tensors[name] = (dtype, list(shape), begin, end)

    # contiguity: tensors tile the buffer exactly (no hole/overlap)
    spans = sorted((b, e) for _, _, b, e in tensors.values())
    pos = 0
    for b, e in spans:
        if b != pos:
            raise ValueError(
                f"buffer not contiguous: tensor begins at {b}, "
                f"expected {pos}"
            )
        pos = e
    if pos != buf_len:
        raise ValueError(
            f"buffer not covered: tensors end at {pos} of {buf_len}"
        )
    return tensors, metadata_json, 8 + n


def write_safetensors(tensors: dict, path: str, *, metadata=None) -> None:
    """Fixture writer: {name: numpy array} -> one shard. Tensors are
    laid out in sorted-name order (deterministic offsets); arrays are
    written little-endian C-contiguous, matching the spec."""
    import numpy as np

    _NP_TO_ST = {
        "float64": "F64", "float32": "F32", "float16": "F16",
        "int64": "I64", "int32": "I32", "int16": "I16", "int8": "I8",
        "uint64": "U64", "uint32": "U32", "uint16": "U16",
        "uint8": "U8", "bool": "BOOL",
    }
    header: dict = {}
    if metadata is not None:
        header["__metadata__"] = dict(metadata)
    chunks = []
    pos = 0
    for name in sorted(tensors):
        arr = np.ascontiguousarray(tensors[name])
        if arr.dtype.name not in _NP_TO_ST:
            raise ValueError(f"unsupported numpy dtype {arr.dtype}")
        raw = arr.astype(arr.dtype.newbyteorder("<"), copy=False).tobytes()
        header[name] = {
            "dtype": _NP_TO_ST[arr.dtype.name],
            "shape": list(arr.shape),
            "data_offsets": [pos, pos + len(raw)],
        }
        chunks.append(raw)
        pos += len(raw)
    hjson = json.dumps(header, sort_keys=True).encode("utf-8")
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        f.write(b"".join(chunks))


def read_safetensors_index(spark: SparkSession, path: str) -> DataFrame:
    """Header-only census: one row per tensor (module contract);
    a law violation quarantines the whole file as one error row."""
    src = spark.read.format("binaryFile").load(path)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for fname, content in zip(pdf["path"], pdf["content"]):
                try:
                    tensors, meta, _ = parse_safetensors_header(
                        bytes(content)
                    )
                    for name in sorted(tensors):
                        dtype, shape, b, e = tensors[name]
                        n_elem = 1
                        for s in shape:
                            n_elem *= s
                        rows.append((
                            fname, name, dtype, shape, n_elem,
                            e - b, b, e, meta, None,
                        ))
                except ValueError as err:
                    rows.append((
                        fname, None, None, None, None, None, None,
                        None, None, f"bad safetensors: {err}"[:500],
                    ))
            out = pd.DataFrame(rows, columns=[
                "file", "tensor", "dtype", "shape", "n_elements",
                "nbytes", "offset_begin", "offset_end", "metadata",
                "error",
            ])
            for c in ("n_elements", "nbytes", "offset_begin",
                      "offset_end"):
                out[c] = pd.array(out[c], dtype="Int64")
            yield out

    return src.select("path", "content").mapInPandas(
        run, schema=SAFETENSORS_INDEX_SCHEMA
    )


def _tensor_rows(name: str, dtype: str, shape, raw: bytes):
    """Decode one numeric tensor's bytes into float32 vector rows."""
    import numpy as np

    if dtype == "BF16":
        # bfloat16 is the TOP half of binary32: widen each 16-bit
        # pattern into bits 16..32 of a float32 word — exact, no
        # rounding involved
        u16 = np.frombuffer(raw, dtype="<u2")
        mat = (u16.astype(np.uint32) << 16).view(np.float32)
    elif dtype in ("F8_E4M3", "F8_E5M2"):
        raise ValueError(f"tensor {name!r}: {dtype} decode not supported")
    else:
        mat = np.frombuffer(raw, dtype=_NUMPY_DTYPE[dtype])
        mat = mat.astype(np.float32)
    if len(shape) == 1:
        mat = mat.reshape(1, -1)
    elif len(shape) == 2:
        mat = mat.reshape(shape[0], shape[1])
    else:
        raise ValueError(
            f"tensor {name!r}: rank {len(shape)} unsupported for "
            f"vector decode"
        )
    mat = np.ascontiguousarray(mat, dtype=np.float32)
    dim = int(mat.shape[1])
    for i in range(mat.shape[0]):
        yield i, [float(x) for x in mat[i]], dim


def read_safetensors_vectors(
    spark: SparkSession, path: str, *, tensor: str | None = None
) -> DataFrame:
    """Decode numeric 1-D/2-D tensors into one row per matrix row
    (module contract). `tensor` narrows to one named tensor; default
    decodes every decodable tensor in the shard. Rank>2 or F8 dtypes
    quarantine that TENSOR (one error row), not the file — the
    header already validated, so other tensors are trustworthy."""
    src = spark.read.format("binaryFile").load(path)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for fname, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                try:
                    tensors, _, buf0 = parse_safetensors_header(data)
                except ValueError as err:
                    rows.append((
                        fname, None, None, None, None,
                        f"bad safetensors: {err}"[:500],
                    ))
                    continue
                for name in sorted(tensors):
                    if tensor is not None and name != tensor:
                        continue
                    dtype, shape, b, e = tensors[name]
                    try:
                        for i, vec, dim in _tensor_rows(
                            name, dtype, shape, data[buf0 + b : buf0 + e]
                        ):
                            rows.append((fname, name, i, vec, dim, None))
                    except ValueError as err:
                        rows.append((
                            fname, name, None, None, None,
                            str(err)[:500],
                        ))
            out = pd.DataFrame(rows, columns=[
                "file", "tensor", "row_index", "embedding", "dim",
                "error",
            ])
            for c in ("row_index", "dim"):
                out[c] = pd.array(out[c], dtype="Int32")
            yield out

    return src.select("path", "content").mapInPandas(
        run, schema=SAFETENSORS_VECTOR_SCHEMA
    )
