"""NumPy array-shard ingestion — .npy / .npz embedding files into
vector rows. Embedding dumps from training and indexing jobs very
often land as .npy matrices (one shard = one (n, d) float array) or
.npz bundles (a zip of named members); the ANN / semantic-dedup
operators want them as (row, array<float>) DataFrame rows.

Contract (`read_npy_embeddings`):
- one row per matrix row: `file`, `member` (the .npz member name,
  or 'arr' for a bare .npy), `row_index`, `embedding`
  (array<float>), `dim`;
- accepts 1-D (a single vector -> one row) and 2-D arrays; any
  other rank, non-numeric dtype, or object/pickled payload
  QUARANTINES as one error row — `np.load` runs with
  allow_pickle=False, so a pickle-bearing file is an error by
  construction, never code execution;
- floats arrive as float32 lists regardless of on-disk dtype
  (float16/float64/int* upcast or downcast explicitly — one
  documented canonical width, the same stance as
  `quantize_embeddings`' int8 channel).

Scale shape: one binaryFile task per shard; the decode is a single
`np.load` per file (C-speed) and one float32 cast — no per-element
Python. Shard count is the parallelism unit, as with TFRecord/WARC.

Derived from the public .npy format spec (numpy NEP 1 / format.py
docs); the reference (src/sodaspark/scan.py:441) scans already-loaded
frames — array ingestion is additive surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_npy_embeddings", "NPY_SCHEMA", "write_npy", "write_npz"]

NPY_SCHEMA = (
    "file string, member string, row_index int,"
    " embedding array<float>, dim int, error string"
)


def _rows_of(arr, member: str):
    import numpy as np

    if arr.dtype == object:
        raise ValueError(f"member {member}: object dtype not supported")
    if not (np.issubdtype(arr.dtype, np.floating)
            or np.issubdtype(arr.dtype, np.integer)):
        raise ValueError(f"member {member}: non-numeric dtype {arr.dtype}")
    mat = arr.astype(np.float32, copy=False)
    if mat.ndim == 1:
        mat = mat.reshape(1, -1)
    if mat.ndim != 2:
        raise ValueError(f"member {member}: rank {arr.ndim} unsupported")
    dim = int(mat.shape[1])
    for i in range(mat.shape[0]):
        yield member, i, [float(x) for x in mat[i]], dim


def write_npy(arr, path: str) -> None:
    """Fixture writer: one bare .npy file."""
    import numpy as np

    np.save(path, arr, allow_pickle=False)


def write_npz(arrays: dict, path: str) -> None:
    """Fixture writer: one .npz bundle (uncompressed, deterministic)."""
    import numpy as np

    np.savez(path, **arrays)


def read_npy_embeddings(spark: SparkSession, path: str) -> DataFrame:
    """Read .npy / .npz shard(s) at `path` (glob ok) into one row per
    vector (module contract)."""
    src = spark.read.format("binaryFile").load(path)

    def run(batches):
        import io
        import zipfile

        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for fname, content in zip(pdf["path"], pdf["content"]):
                buf = io.BytesIO(bytes(content))
                try:
                    if bytes(content[:4]) == b"PK\x03\x04":  # .npz
                        with np.load(buf, allow_pickle=False) as z:
                            for member in sorted(z.files):
                                for m, i, vec, dim in _rows_of(
                                    z[member], member
                                ):
                                    rows.append((fname, m, i, vec,
                                                 dim, None))
                    else:
                        arr = np.load(buf, allow_pickle=False)
                        for m, i, vec, dim in _rows_of(arr, "arr"):
                            rows.append((fname, m, i, vec, dim, None))
                except Exception as e:  # quarantine, never crash
                    rows.append((
                        fname, None, None, None, None,
                        f"{type(e).__name__}: {e}"[:500],
                    ))
            out = pd.DataFrame(rows, columns=[
                "file", "member", "row_index", "embedding", "dim",
                "error",
            ])
            for c in ("row_index", "dim"):
                out[c] = pd.array(out[c], dtype="Int32")
            yield out

    return src.select("path", "content").mapInPandas(run, schema=NPY_SCHEMA)
