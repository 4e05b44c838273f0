"""Arrow IPC *file* (Feather v2) ingestion — batch-parallel off the
IPC footer.

The Arrow IPC file format is the ML ecosystem's interchange and cache
container: HuggingFace `datasets` materializes every cached split as
`*.arrow` IPC files, pandas/polars `to_feather` writes it, and Arrow
Flight dumps land in it. A training-data pipeline that can read
TFRecord/Avro/SafeTensors but not `.arrow` stops one step short of
the most common local corpus cache.

Format (Arrow columnar spec, "IPC File Format",
arrow.apache.org/docs/format/Columnar.html#ipc-file-format):

    ARROW1\\x00\\x00 <stream of encapsulated messages> <footer>
    <int32 footer_len> ARROW1

The footer carries the schema plus one (offset, metadata_len,
body_len) block per record batch — so a reader can jump straight to
ANY batch without scanning its predecessors. That is the property the
whole module leans on:

- `arrow_ipc_census` reads ONLY the tail (footer length + footer) per
  file: a corpus-cache audit over 100 TB of `.arrow` shards moves a
  few KB per file. Witnessed by a counting-filesystem test (pyarrow
  issues `seek` + `read_buffer` pairs; the census is asserted to read
  tail bytes only, never a batch body).
- `read_arrow_ipc` fans out one task per (file, record batch): a
  single multi-GB cache file with N batches decodes as N independent
  ranged reads (pyarrow's `get_batch(i)` seeks to the block offset
  and reads exactly metadata_len + body_len). Parallelism within one
  file is the same discipline as `read_avro_split` / the mbox chunk
  reader — no ~2 GiB `binaryFile` cap, no single-task serialization.

Laws (each pinned by a test):
- HEAD-MAGIC: pyarrow validates only the TAIL magic at open; a file
  whose first 6 bytes are not `ARROW1` is not an Arrow file per spec
  and quarantines here even though its footer parses.
- SCHEMA ELECTION: the output schema is driven by the FIRST file in
  sorted order (the documented `read_avro_records` election); a file
  whose (selected) fields diverge in name or type quarantines
  wholesale as ONE error row.
- QUARANTINE: any unreadable/invalid file is ONE error row with the
  data columns null — the contract every reader in `sources/` keeps.
- REC_INDEX: `rec_index` numbers the DECODED records of a file in
  (batch_index, row_index) order, rebuilt with a per-file window
  (the `read_avro_split` discipline). If a mid-file batch fails to
  decode (one error row), later indices count decoded rows only —
  stated, not hidden.

Column pruning (`columns=`) selects fields after the batch body is
read: the IPC block is the I/O granule here. (Finer pruning is
possible in principle — the batch metadata records per-buffer
offsets — but is out of scope; stated honestly.)

The *stream* format (round 20): `read_arrow_stream` reads the
footer-less IPC STREAM grammar (Flight dumps, `ipc.new_stream`
pipes) into the same row shape — but as ONE SEQUENTIAL TASK PER
FILE, because the stream format has no footer and no resync marker;
the splittability contrast with the file format is the design
lesson, documented on the function.

Supported field types (everything else raises at the driver during
election, or quarantines a divergent later file): bool, int8/16/32/64,
uint8/16/32, float16/32/64, string/large_string, binary/large_binary,
date32, timestamp(s/ms/us, tz-naive), dictionary-encoded values of a
supported scalar type (decoded), and list/large_list of a supported
scalar type. uint64 and timestamp-ns are rejected rather than
silently narrowed/truncated.

Derived from the public Arrow columnar spec via the pyarrow API; the
reference (src/sodaspark/scan.py:441) scans already-loaded frames —
container ingestion is additive surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = [
    "read_arrow_ipc", "arrow_ipc_census", "write_arrow_ipc",
    "read_arrow_stream", "write_arrow_stream",
]

_BOOKKEEPING = ("file", "batch_index", "rec_index", "row_index", "error")

ARROW_IPC_CENSUS_SCHEMA = (
    "file string, size_bytes long, num_batches int, num_fields int,"
    " schema_ddl string, error string"
)

_HEAD_MAGIC = b"ARROW1"


def _map_type(t) -> tuple[str, str | None]:
    """(spark DDL type, pandas nullable dtype or None=object) for a
    supported pyarrow type; ValueError for anything outside the
    committed set (never silently narrowed)."""
    import pyarrow as pa

    if pa.types.is_dictionary(t):
        # to_pylist() decodes dictionary arrays to their values
        return _map_type(t.value_type)
    if pa.types.is_boolean(t):
        return "boolean", "boolean"
    if pa.types.is_int8(t) or pa.types.is_int16(t) or pa.types.is_int32(t):
        return "int", "Int32"
    if pa.types.is_uint8(t) or pa.types.is_uint16(t):
        return "int", "Int32"
    if pa.types.is_int64(t) or pa.types.is_uint32(t):
        return "bigint", "Int64"
    if pa.types.is_float16(t) or pa.types.is_float32(t):
        return "float", "Float32"
    if pa.types.is_float64(t):
        return "double", "Float64"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string", None
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary", None
    if pa.types.is_date32(t):
        return "date", None
    if pa.types.is_timestamp(t):
        if t.unit == "ns" or t.tz is not None:
            raise ValueError(
                f"unsupported Arrow type {t} (ns precision / tz-aware"
                " timestamps are rejected, not narrowed)"
            )
        return "timestamp", None
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        inner = t.value_type
        if pa.types.is_list(inner) or pa.types.is_large_list(inner):
            raise ValueError(f"unsupported Arrow type {t} (nested list)")
        ddl, _ = _map_type(inner)
        if ddl in ("date", "timestamp", "binary"):
            raise ValueError(f"unsupported Arrow list element {inner}")
        return f"array<{ddl}>", None
    raise ValueError(f"unsupported Arrow type {t}")


def _open_footer(fname: str, check_head: bool = True):
    """Open `fname` through pyarrow.fs and return the IPC file reader
    (footer-only I/O at this point). Pins the HEAD-MAGIC law pyarrow
    itself skips."""
    import pyarrow.ipc as ipc

    from soda_spark_spark.sources.safetensors import _open_input

    f = _open_input(fname)
    if check_head:
        f.seek(0)
        head = f.read(len(_HEAD_MAGIC))
        if head != _HEAD_MAGIC:
            f.close()
            raise ValueError(
                "not an Arrow IPC file: bad head magic "
                f"{head[:6]!r}"
            )
    return f, ipc.open_file(f)


def _open_stream_head(fname: str):
    """Open `fname` as an Arrow IPC *stream* and parse its schema
    message (the stream's head — bounded I/O; the spec's stream
    grammar is `<schema message> <batches...> <EOS|EOF>`, so the
    schema costs one message, never a batch body)."""
    import pyarrow.ipc as ipc

    from soda_spark_spark.sources.safetensors import _open_input

    f = _open_input(fname)
    try:
        return f, ipc.open_stream(f)
    except Exception:
        f.close()
        raise


def _elect_schema(
    head_file: str, columns: list[str] | None, *, stream: bool = False
) -> list[tuple[str, str, str, str | None]]:
    """Read the FIRST file's footer (or, for the stream format, its
    schema message) and commit the output fields:
    [(name, arrow_type_str, spark_ddl, pandas_dtype)]. Raises at the
    driver (caller error) for unknown/unsupported selections."""
    f, reader = (_open_stream_head if stream else _open_footer)(head_file)
    try:
        schema = reader.schema
    finally:
        f.close()
    names = list(schema.names)
    if columns is None:
        picked = names
    else:
        if not columns:
            raise ValueError("columns must be a non-empty list or None")
        missing = [c for c in columns if c not in names]
        if missing:
            raise ValueError(
                f"columns {missing} not in the elected schema of "
                f"{head_file} (fields: {names})"
            )
        picked = list(columns)
    clash = [c for c in picked if c in _BOOKKEEPING]
    if clash:
        raise ValueError(
            f"field names {clash} collide with bookkeeping columns "
            f"{_BOOKKEEPING}; project them out via `columns=`"
        )
    fields = []
    for name in picked:
        t = schema.field(name).type
        ddl, pd_dtype = _map_type(t)
        fields.append((name, str(t), ddl, pd_dtype))
    return fields


def arrow_ipc_census(spark: SparkSession, path: str) -> DataFrame:
    """One row per `.arrow` file: (file, size_bytes, num_batches,
    num_fields, schema_ddl, error). Footer-only I/O — the batch row
    counts live in each batch's message header, NOT the footer, so a
    census that promised them would have to read every batch header;
    this one stays honest and reads the tail alone."""
    from soda_spark_spark.sources.safetensors import _plan_files

    plan = _plan_files(path)
    plan_df = spark.createDataFrame(
        plan, "file string, size long"
    ).repartition(max(len(plan), 1))

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for fname, size in zip(pdf["file"], pdf["size"]):
                try:
                    f, reader = _open_footer(fname)
                    try:
                        schema = reader.schema
                        nb = reader.num_record_batches
                    finally:
                        f.close()
                    ddl = ", ".join(
                        f"{n} {_map_type(schema.field(n).type)[0]}"
                        if _supported(schema.field(n).type)
                        else f"{n} UNSUPPORTED<{schema.field(n).type}>"
                        for n in schema.names
                    )
                    rows.append((
                        fname, int(size), nb, len(schema.names),
                        ddl, None,
                    ))
                except (ValueError, OSError) as err:
                    rows.append((
                        fname, int(size), None, None, None,
                        f"bad arrow ipc: {err}"[:500],
                    ))
            out = pd.DataFrame(rows, columns=[
                "file", "size_bytes", "num_batches", "num_fields",
                "schema_ddl", "error",
            ])
            out["num_batches"] = pd.array(out["num_batches"], dtype="Int32")
            out["num_fields"] = pd.array(out["num_fields"], dtype="Int32")
            yield out

    return plan_df.mapInPandas(run, schema=ARROW_IPC_CENSUS_SCHEMA)


def _supported(t) -> bool:
    try:
        _map_type(t)
        return True
    except ValueError:
        return False


def read_arrow_ipc(
    spark: SparkSession,
    path: str,
    *,
    columns: list[str] | None = None,
) -> DataFrame:
    """Decode Arrow IPC files at `path` (glob ok) into one row per
    record, one TASK per (file, record batch) — module contract.
    The elected first-file schema drives the typed output columns;
    bookkeeping columns: file, batch_index, rec_index, row_index,
    error."""
    from soda_spark_spark.sources.safetensors import _plan_files

    plan = _plan_files(path)
    fields = _elect_schema(plan[0][0], columns)
    elected = [(n, t) for n, t, _, _ in fields]

    span_schema = "file string, batch_index int, error string"

    plan_df = spark.createDataFrame(
        plan, "file string, size long"
    ).repartition(max(len(plan), 1))

    def plan_spans(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for fname in pdf["file"]:
                try:
                    f, reader = _open_footer(fname)
                    try:
                        schema = reader.schema
                        nb = reader.num_record_batches
                    finally:
                        f.close()
                    got = [
                        (n, str(schema.field(n).type))
                        for n, _ in elected
                        if n in schema.names
                    ]
                    if got != elected:
                        raise ValueError(
                            "schema diverges from the elected "
                            f"schema: {got} != {elected}"
                        )
                    rows.extend((fname, i, None) for i in range(nb))
                except (ValueError, OSError) as err:
                    rows.append(
                        (fname, None, f"bad arrow ipc: {err}"[:500])
                    )
            out = pd.DataFrame(
                rows, columns=["file", "batch_index", "error"]
            )
            out["batch_index"] = pd.array(
                out["batch_index"], dtype="Int32"
            )
            yield out

    spans = plan_df.mapInPandas(plan_spans, schema=span_schema)
    spans = spans.repartition("file", "batch_index")

    names = [n for n, _, _, _ in fields]
    dtypes = {n: pdt for n, _, _, pdt in fields}
    out_schema = (
        "file string, batch_index int, row_index int, "
        + ", ".join(f"`{n}` {ddl}" for n, _, ddl, _ in fields)
        + ", error string"
    )

    def _frame(fname, bidx, n, cols, err):
        import pandas as pd

        data = {
            "file": [fname] * n,
            "batch_index": pd.array([bidx] * n, dtype="Int32"),
            "row_index": pd.array(
                list(range(n)) if err is None else [None] * n,
                dtype="Int32",
            ),
        }
        for name in names:
            vals = cols[name] if err is None else [None] * n
            pdt = dtypes[name]
            data[name] = (
                pd.array(vals, dtype=pdt) if pdt else
                pd.Series(vals, dtype="object")
            )
        data["error"] = [err] * n
        return pd.DataFrame(data)

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            frames = []
            open_file = None
            open_name = None
            try:
                for fname, bidx, err in zip(
                    pdf["file"], pdf["batch_index"], pdf["error"]
                ):
                    if err is not None:
                        frames.append(_frame(fname, None, 1, {}, err))
                        continue
                    try:
                        if open_name != fname:
                            if open_file is not None:
                                open_file[0].close()
                            open_file = _open_footer(
                                fname, check_head=False
                            )
                            open_name = fname
                        rb = open_file[1].get_batch(int(bidx))
                        rb = rb.select(names)
                        cols = {
                            n: rb.column(j).to_pylist()
                            for j, n in enumerate(names)
                        }
                        frames.append(_frame(
                            fname, int(bidx), rb.num_rows, cols, None
                        ))
                    except (ValueError, OSError) as err2:
                        frames.append(_frame(
                            fname, int(bidx), 1, {},
                            f"bad arrow ipc batch: {err2}"[:500],
                        ))
            finally:
                if open_file is not None:
                    open_file[0].close()
            if frames:
                yield pd.concat(frames, ignore_index=True)
            else:
                yield _frame(None, None, 0, {}, None)

    raw = spans.mapInPandas(decode, schema=out_schema)

    # REC_INDEX law: number the decoded records of each file in
    # (batch_index, row_index) order — one per-file window shuffle,
    # the read_avro_split discipline; error rows carry null AND do
    # not consume an index (a mid-file failed batch's error row
    # sorts before that batch's would-be rows, so the running
    # error count is subtracted — the read_avro_split n_err_before
    # pattern; round 20).
    w = Window.partitionBy("file").orderBy("batch_index", "row_index")
    n_err_before = F.coalesce(
        F.sum(F.col("error").isNotNull().cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    rec = F.when(
        F.col("error").isNull(),
        (F.row_number().over(w) - 1 - n_err_before).cast("long"),
    )
    cols = (
        ["file", "batch_index", rec.alias("rec_index"), "row_index"]
        + [F.col(f"`{n}`") for n in names]
        + ["error"]
    )
    return raw.select(*cols)


def write_arrow_ipc(table, path: str, *, batch_rows: int | None = None):
    """Write `table` (a pyarrow Table, or a dict of equal-length
    lists) to `path` as an Arrow IPC file, split into record batches
    of `batch_rows` rows (None = pyarrow's default chunking). Local
    paths only — the fixture/test writer, mirroring `write_avro`."""
    import pyarrow as pa
    import pyarrow.ipc as ipc

    if isinstance(table, dict):
        table = pa.table(table)
    with pa.OSFile(path, "wb") as sink:
        with ipc.new_file(sink, table.schema) as w:
            if batch_rows is None:
                w.write_table(table)
            else:
                for b in table.to_batches(max_chunksize=batch_rows):
                    w.write_batch(b)


def read_arrow_stream(
    spark: SparkSession,
    path: str,
    *,
    columns: list[str] | None = None,
) -> DataFrame:
    """Decode Arrow IPC *stream*-format files at `path` (glob ok) —
    Flight dumps, `datasets.to_iterable_dataset` pipes, anything
    written by `ipc.new_stream` — into the SAME row shape as
    `read_arrow_ipc`: bookkeeping (file, batch_index, rec_index,
    row_index, error) plus the elected typed columns, so the two
    formats compose in one pipeline.

    SPLITTABILITY CONTRAST (the design point, stated honestly): the
    stream grammar is `<schema message> <batches...> <EOS|EOF>` with
    NO footer and NO resync marker — a batch's byte position is only
    discoverable by walking every message before it. So this reader
    is ONE SEQUENTIAL TASK PER FILE, and a single multi-GB stream
    file decodes serially; parallelism comes from file count alone.
    The FILE format (`read_arrow_ipc`) fans out one ranged task per
    (file, batch) off its footer block index. At 100 TB that is the
    difference between a pipe format and an archive format: streams
    are for transport, re-materialize long-lived corpora as IPC
    *files* (or parquet) before scale-out reads.

    One upside of sequential decode: `rec_index` is assigned
    IN-TASK in arrival order (decoded rows only — the REC_INDEX
    law), with no per-file window shuffle.

    Laws (shared with the file reader unless noted):
    - SCHEMA ELECTION: first file in sorted order commits the
      output fields; a stream whose schema message diverges in the
      selected (name, type) set quarantines wholesale as ONE error
      row.
    - QUARANTINE: an unopenable/invalid stream is ONE error row.
    - SEQUENTIAL CORRUPTION (differs from the file format, which
      retries every batch independently off the footer): a corrupt
      message STOPS the file there — everything decoded before it
      is kept, one error row marks the stop position, and nothing
      after it is trusted (no resync point exists; the TFRecord /
      Avro-sync stance).
    - EOS-less streams (writer died before the 0-length terminator)
      decode to their last complete batch, then quarantine the tail
      with the same stop-position error row only if the final
      message is torn mid-bytes.
    """
    from soda_spark_spark.sources.safetensors import _plan_files

    plan = _plan_files(path)
    fields = _elect_schema(plan[0][0], columns, stream=True)
    elected = [(n, t) for n, t, _, _ in fields]
    names = [n for n, _, _, _ in fields]
    dtypes = {n: pdt for n, _, _, pdt in fields}

    out_schema = (
        "file string, batch_index int, rec_index long, row_index int, "
        + ", ".join(f"`{n}` {ddl}" for n, _, ddl, _ in fields)
        + ", error string"
    )

    plan_df = spark.createDataFrame(
        plan, "file string, size long"
    ).repartition(max(len(plan), 1))

    def _frame(fname, bidx, rec0, n, cols, err):
        import pandas as pd

        data = {
            "file": [fname] * n,
            "batch_index": pd.array([bidx] * n, dtype="Int32"),
            "rec_index": pd.array(
                list(range(rec0, rec0 + n)) if err is None
                else [None] * n,
                dtype="Int64",
            ),
            "row_index": pd.array(
                list(range(n)) if err is None else [None] * n,
                dtype="Int32",
            ),
        }
        for name in names:
            vals = cols[name] if err is None else [None] * n
            pdt = dtypes[name]
            data[name] = (
                pd.array(vals, dtype=pdt) if pdt else
                pd.Series(vals, dtype="object")
            )
        data["error"] = [err] * n
        return pd.DataFrame(data)

    def run(batches):
        import pandas as pd
        import pyarrow as pa

        for pdf in batches:
            frames = []
            for fname in pdf["file"]:
                f = reader = None
                try:
                    f, reader = _open_stream_head(fname)
                    schema = reader.schema
                    got = [
                        (n, str(schema.field(n).type))
                        for n, _ in elected
                        if n in schema.names
                    ]
                    if got != elected:
                        raise ValueError(
                            "schema diverges from the elected "
                            f"schema: {got} != {elected}"
                        )
                except (ValueError, OSError, pa.ArrowInvalid) as err:
                    if f is not None:
                        f.close()
                    frames.append(_frame(
                        fname, None, 0, 1, {},
                        f"bad arrow ipc stream: {err}"[:500],
                    ))
                    continue
                bidx, rec = 0, 0
                try:
                    while True:
                        try:
                            rb = reader.read_next_batch()
                        except StopIteration:
                            break
                        rb = rb.select(names)
                        cols = {
                            n: rb.column(j).to_pylist()
                            for j, n in enumerate(names)
                        }
                        frames.append(_frame(
                            fname, bidx, rec, rb.num_rows, cols, None
                        ))
                        rec += rb.num_rows
                        bidx += 1
                except (ValueError, OSError) as err:
                    # sequential corruption: keep what decoded, mark
                    # the stop, trust nothing after (no resync point)
                    frames.append(_frame(
                        fname, bidx, rec, 1, {},
                        f"bad arrow ipc stream batch: {err}"[:500],
                    ))
                finally:
                    f.close()
            if frames:
                yield pd.concat(frames, ignore_index=True)
            else:
                yield _frame(None, None, 0, 0, {}, None)

    return plan_df.select("file").mapInPandas(run, schema=out_schema)


def write_arrow_stream(table, path: str, *,
                       batch_rows: int | None = None,
                       eos: bool = True):
    """Write `table` as an Arrow IPC *stream* to `path` (schema
    message, then batches of `batch_rows`, then EOS unless
    `eos=False` — torn-tail fixtures). The fixture/test writer
    mirroring `write_arrow_ipc`."""
    import pyarrow as pa
    import pyarrow.ipc as ipc

    if isinstance(table, dict):
        table = pa.table(table)
    import io as _io

    buf = _io.BytesIO()
    with ipc.new_stream(buf, table.schema) as w:
        if batch_rows is None:
            w.write_table(table)
        else:
            for b in table.to_batches(max_chunksize=batch_rows):
                w.write_batch(b)
    data = buf.getvalue()
    if not eos:
        data = data[:-8]  # strip the 8-byte EOS marker
    with open(path, "wb") as out:
        out.write(data)
