"""Jupyter notebook (.ipynb) text extraction, stdlib-only — notebooks
are a major slice of real code corpora (The Stack carries millions),
and the payload is JSON wrapping the actual code/markdown: a code
pipeline wants the cells, not the envelope (execution counts, output
blobs, kernel metadata, base64 images).

Contract (`ipynb_cells`) — deterministic:

- nbformat 4 (`cells` at top level) and nbformat 3 (`worksheets[*]
  .cells`) both parse;
- `source` (v4) / `input` (v3 code cells) may be a string or a list
  of line strings (the on-disk convention) — both join verbatim;
- cell_type passes through (`code`, `markdown`, `raw`, v3 `heading`
  normalizes to `markdown`); OUTPUTS ARE NEVER EMITTED (stdout blobs
  and base64 images are not corpus text);
- one row per cell with its 0-based index, so callers can rebuild
  document order or keep only code cells;
- a payload that is not JSON, not a dict, or has no recognizable
  cell list raises ValueError (quarantine — filter or alert, never
  silently vanish; same contract as pdf_text/office_text).

Spark surface: `notebook_cells(df, id_col, payload_col)` -> one row
per cell (id, cell_index, cell_type, text, error) through an
Arrow-batched mapInPandas; a malformed notebook yields ONE row with
`error` set and null cell fields. Scale: per-payload Python JSON
parse is inherent (the format is JSON), the batch plumbing prunes to
two columns and stays in Arrow.

Derived from the public nbformat spec (nbformat.readthedocs.io,
versions 3/4); the reference (src/sodaspark/scan.py:441) scans
already-loaded frames — notebook ingestion is additive surface.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (API symmetry)

__all__ = ["ipynb_cells", "notebook_cells", "NOTEBOOK_SCHEMA"]

NOTEBOOK_SCHEMA = (
    "id long, cell_index int, cell_type string, text string,"
    " error string"
)


def _join_source(src) -> str:
    if src is None:
        return ""
    if isinstance(src, str):
        return src
    if isinstance(src, list) and all(isinstance(s, str) for s in src):
        return "".join(src)
    raise ValueError("cell source is neither string nor list of strings")


def ipynb_cells(payload: bytes | str) -> list[dict]:
    """Parse one notebook into [{cell_index, cell_type, text}, ...]
    (module contract). Raises ValueError on malformed payloads."""
    if isinstance(payload, (bytes, bytearray)):
        try:
            payload = bytes(payload).decode("utf-8")
        except UnicodeDecodeError as e:
            raise ValueError(f"ipynb is not UTF-8: {e}") from None
    try:
        nb = json.loads(payload)
    except json.JSONDecodeError as e:
        raise ValueError(f"ipynb is not JSON: {e}") from None
    if not isinstance(nb, dict):
        raise ValueError("ipynb top level is not an object")
    if isinstance(nb.get("cells"), list):
        raw = nb["cells"]  # nbformat 4
    elif isinstance(nb.get("worksheets"), list):
        raw = [
            c
            for ws in nb["worksheets"]
            if isinstance(ws, dict) and isinstance(ws.get("cells"), list)
            for c in ws["cells"]
        ]  # nbformat 3
    else:
        raise ValueError("ipynb has neither cells nor worksheets")
    out = []
    for i, cell in enumerate(raw):
        if not isinstance(cell, dict):
            raise ValueError(f"cell {i} is not an object")
        ctype = cell.get("cell_type")
        if not isinstance(ctype, str):
            raise ValueError(f"cell {i} has no cell_type")
        # v3 code cells carry `input`; v3 headings are markdown-ish
        src = cell.get("source", cell.get("input"))
        if ctype == "heading":
            level = int(cell.get("level", 1))
            text = "#" * level + " " + _join_source(src)
            ctype = "markdown"
        else:
            text = _join_source(src)
        out.append(dict(cell_index=i, cell_type=ctype, text=text))
    return out


def notebook_cells(
    df: DataFrame, id_col: str, payload_col: str
) -> DataFrame:
    """One row per notebook cell; malformed notebooks quarantine as
    one error row. Arrow-batched, two-column pruned scan."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for rid, payload in zip(
                pdf[id_col].values, pdf[payload_col].values
            ):
                rid = int(rid)
                try:
                    for c in ipynb_cells(payload):
                        rows.append(
                            (rid, c["cell_index"], c["cell_type"],
                             c["text"], None)
                        )
                except ValueError as e:
                    rows.append((rid, None, None, None, str(e)))
            yield pd.DataFrame(
                rows,
                columns=["id", "cell_index", "cell_type", "text",
                         "error"],
            ).astype({"cell_index": "Int32"})

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=NOTEBOOK_SCHEMA
    )
