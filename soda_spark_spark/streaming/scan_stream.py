"""Streaming scans: reuse the batch MetricCompiler per micro-batch via
foreachBatch, plus watermarked windowed rollups for event tables.

The reference has no streaming surface (SURVEY.md §2.4); this is the additive
Structured-Streaming path: the same ScanDefinition drives a per-micro-batch
scan (exactly the batch semantics, incrementally), and `windowed_rollup`
gives the watermark/window aggregation a training-data event pipeline needs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.executor import run_scan
from ..plans.definition import ScanDefinition, create_scan_definition
from ..results import ScanResult


def _error_condition(e: Exception) -> str | None:
    """Structured error class of a Spark exception, version-tolerant.

    Prefers `getCondition()` (Spark 4 name) over the deprecated
    `getErrorClass()`; returns None when neither yields a class (a
    non-Spark exception, or an old build without error classes), so
    callers comparing against known conditions fall through to re-raise.
    """
    for attr in ("getCondition", "getErrorClass"):
        fn = getattr(e, attr, None)
        if fn is None:
            continue
        try:
            cond = fn()
        except Exception:
            continue
        if cond:
            return cond
    return None


def _has_committed_parts(spark, path: str) -> bool:
    """True when `path` holds at least one COMMITTED data file.

    Disambiguates UNABLE_TO_INFER_SCHEMA: an interrupted first write
    leaves only `_temporary`/`_SUCCESS`-class markers (no committed
    part files → genuinely "first batch"), while a directory whose
    committed part files exist but cannot be read is data loss or
    corruption and must propagate. Walks the Hadoop FileSystem (not
    os.listdir) so the check holds for HDFS/S3 paths on a real
    cluster; a filesystem error degrades to False (the prior,
    lenient behavior) rather than wedging the stream on the probe.
    """
    try:
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.exists(jpath):
            return False
        for st in fs.listStatus(jpath):
            name = st.getPath().getName()
            if st.isFile() and not name.startswith(("_", ".")):
                return True
        return False
    except Exception:
        return False


def scan_stream(
    stream_df: DataFrame,
    definition: ScanDefinition | str | dict,
    on_result: Callable[[int, ScanResult], None],
    *,
    trigger: dict | None = None,
    checkpoint_dir: str | None = None,
) -> StreamingQuery:
    """Run a scan on every micro-batch of a streaming DataFrame.

    `on_result(batch_id, scan_result)` receives each batch's ScanResult —
    push to a metrics sink, alert on failed tests, etc. The batch compiler is
    reused unchanged; each micro-batch is one fused .agg() job.
    """
    if not isinstance(definition, ScanDefinition):
        definition = create_scan_definition(definition)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        on_result(batch_id, run_scan(batch_df, definition))

    writer = stream_df.writeStream.foreachBatch(process)
    if trigger:
        writer = writer.trigger(**trigger)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


# slot kinds that merge across micro-batches (counts/sums add, mins min,
# maxes max); everything else (percentiles, approx_distinct sketches) is
# batch-scope and excluded from the incremental fused aggregation
_MERGE_ADD = {"row_count", "missing_count", "valid_count", "len_sum", "num_sum", "num_cnt", "num_sumsq"}
_MERGE_MIN = {"len_min", "raw_min", "num_min"}
_MERGE_MAX = {"len_max", "raw_max", "num_max"}


class IncrementalScan:
    """Cumulative scan state across micro-batches.

    Instead of recomputing each batch's metrics from scratch, every batch
    runs ONE fused aggregation of mergeable sufficient statistics (counts,
    mins, maxes, exact DECIMAL sums and sums-of-squares) and merges them
    into O(columns) driver-side scalars; the full metric set — including
    avg / variance / stddev via the exact-sum derivation — is re-derived
    from the merged state after each batch. State size is independent of
    both batch size and stream length, which is the property a 100 TB/day
    stream needs.

    DISTINCT counts ARE produced when the definition sets
    `approx_distinct: true`: each batch aggregates an HLL sketch per
    distinct-requested column (`hll_sketch_agg`), sketches union across
    batches (`hll_union` — the whole point of HLL is mergeability), and the
    cumulative estimate feeds the `distinct` metric. State stays O(columns x
    sketch bytes), independent of cardinality. Values are sketched via
    their string form (double -> string is injective), matching distinctness
    on values. Exact distinct (plus percentiles, profiling, sql_metrics,
    samples) remains batch-scope — use `scan_stream` for per-batch full
    scans.
    """

    def __init__(self, definition: ScanDefinition | str | dict) -> None:
        if not isinstance(definition, ScanDefinition):
            definition = create_scan_definition(definition)
        self.definition = definition
        self.raw: dict[tuple[str, str], object] | None = None
        # (column, "approx_distinct") -> merged HLL sketch bytes
        self._sketches: dict[tuple[str, str], bytes] = {}
        self._estimates: dict[tuple[str, str], int] = {}
        self._executor = None

    def update(self, batch_df: DataFrame) -> ScanResult:
        """Merge one batch's statistics; return the cumulative ScanResult."""
        from ..operators.executor import ScanExecutor

        ex = ScanExecutor(batch_df, self.definition)
        mergeable = {
            key: alias
            for key, alias in ex.compiled.slots.items()
            if key[1] in (_MERGE_ADD | _MERGE_MIN | _MERGE_MAX)
        }
        # compile_scan's invariant: agg_exprs[i] is aliased f"s{i}"
        aliased = {f"s{i}": c for i, c in enumerate(ex.compiled.agg_exprs)}
        exprs = [aliased[alias] for alias in mergeable.values()]
        # HLL sketches make approx-distinct a MERGEABLE statistic: one
        # sketch per distinct-requested column rides the same fused agg
        sketch_cols = [
            name for (name, kind) in ex.compiled.slots if kind == "approx_distinct"
        ]
        for name in sketch_cols:
            plan = ex.compiled.columns[name]
            val = F.when(~plan.miss, F.col(name).cast("string"))
            exprs.append(F.hll_sketch_agg(val).alias(f"__hll_{name}"))
        row = batch_df.agg(*exprs).first().asDict()
        batch_raw = {key: row[alias] for key, alias in mergeable.items()}
        self._merge_sketches(batch_df, sketch_cols, row)

        if self.raw is None:
            self.raw = dict(batch_raw)
        else:
            for key, v in batch_raw.items():
                old = self.raw.get(key)
                kind = key[1]
                if v is None:
                    continue
                if old is None:
                    self.raw[key] = v
                elif kind in _MERGE_ADD:
                    self.raw[key] = old + v
                elif kind in _MERGE_MIN:
                    self.raw[key] = min(old, v)
                else:
                    self.raw[key] = max(old, v)
        self._executor = ex
        merged = dict(self.raw)
        merged.update(self._estimates)
        return ex.derive_from_raw(merged)

    def _merge_sketches(
        self, batch_df: DataFrame, sketch_cols: list[str], row: dict
    ) -> None:
        """Union this batch's HLL sketches into the cumulative state and
        refresh the distinct estimates — ONE tiny driver-side job for all
        columns (rows = columns, bytes = sketch size)."""
        pairs = []
        for name in sketch_cols:
            b = row.get(f"__hll_{name}")
            if b is None:
                continue
            old = self._sketches.get((name, "approx_distinct"))
            pairs.append((name, bytes(old) if old is not None else None, bytes(b)))
        if not pairs:
            return
        sdf = batch_df.sparkSession.createDataFrame(
            pairs, "name string, old binary, new binary"
        ).select(
            "name",
            F.when(F.col("old").isNull(), F.col("new"))
            .otherwise(F.hll_union("old", "new"))
            .alias("u"),
        ).select("name", "u", F.hll_sketch_estimate("u").alias("est"))
        for r in sdf.collect():
            key = (r["name"], "approx_distinct")
            self._sketches[key] = bytes(r["u"])
            self._estimates[key] = int(r["est"])


def scan_stream_incremental(
    stream_df: DataFrame,
    definition: ScanDefinition | str | dict,
    on_result: Callable[[int, ScanResult], None],
    *,
    trigger: dict | None = None,
    checkpoint_dir: str | None = None,
) -> StreamingQuery:
    """Streaming scan with metrics that ACCUMULATE across micro-batches.

    `on_result(batch_id, cumulative_result)` receives the metrics of all
    data seen so far (one fused agg per batch + O(columns) driver merge) —
    the incremental counterpart of `scan_stream`'s per-batch recompute.
    """
    state = IncrementalScan(definition)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        on_result(batch_id, state.update(batch_df))

    writer = stream_df.writeStream.foreachBatch(process)
    if trigger:
        writer = writer.trigger(**trigger)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def windowed_rollup(
    stream_df: DataFrame,
    *,
    ts_col: str,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: list[str] | None = None,
    agg_col: str | None = None,
) -> DataFrame:
    """Watermarked tumbling-window rollup: count + optional sum/avg per
    window (and group columns). Late rows beyond the watermark are dropped;
    state size stays bounded by (windows in watermark horizon x groups)."""
    groups = [F.window(F.col(ts_col), window_duration).alias("window")]
    if group_cols:
        groups += [F.col(c) for c in group_cols]
    aggs = [F.count(F.lit(1)).alias("n")]
    if agg_col:
        aggs += [
            F.sum(agg_col).alias(f"sum_{agg_col}"),
            F.avg(agg_col).alias(f"avg_{agg_col}"),
        ]
    return stream_df.withWatermark(ts_col, watermark).groupBy(*groups).agg(*aggs)


def dedup_stream(
    stream_df: DataFrame,
    keys: list[str],
    *,
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: emit each key's FIRST row, drop later
    duplicates. With `ts_col`, a watermark bounds the dedup state — keys
    older than the horizon are evicted, so state is O(keys within the
    watermark window) instead of O(all keys ever seen). Omit `ts_col` only
    for bounded backfills (state then grows without bound).

    This is the streaming counterpart of `operators.dedup
    .drop_exact_duplicates`; the engine keys state by the dedup columns —
    the same shuffle key as the batch path."""
    if ts_col is not None:
        return stream_df.withWatermark(
            ts_col, watermark
        ).dropDuplicatesWithinWatermark(keys)
    return stream_df.dropDuplicates(keys)


def enrich_stream(
    stream_df: DataFrame,
    dim_df: DataFrame,
    on,
    *,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static dimension enrichment: join a stream against a batch
    dimension table (the per-event "attach customer/session/document
    metadata" step every event pipeline has).

    Spark re-evaluates the static side on EVERY micro-batch; with
    `broadcast_dim` (default) the join is a stateless broadcast hash join —
    no state store, no shuffle of the stream, and the dim re-read stays a
    local scan (cache the dim upstream if even that scan is too hot). Set
    `broadcast_dim=False` only when the dimension is too large to broadcast;
    the stream side then shuffles every micro-batch — prefer pre-bucketing
    both sides on the key at that point (`sources/bucketing.py`).
    """
    from pyspark.sql import functions as _F

    d = _F.broadcast(dim_df) if broadcast_dim else dim_df
    return stream_df.join(d, on, how)


def dedup_against_stream(
    stream_df: DataFrame,
    seen_df: DataFrame,
    text_col: str,
    *,
    broadcast_seen: bool = True,
) -> DataFrame:
    """Streaming incremental-ingestion dedup: drop stream rows whose
    content fingerprint already exists in the ingested corpus — the
    streaming face of `operators.dedup.dedup_against` (stream-static LEFT
    ANTI join, stateless, no state store). Spark re-evaluates the static
    side per micro-batch, so newly committed history is picked up without
    restarting the query.

    Fingerprints are md5 of the content column (uniform join key by
    construction); with `broadcast_seen` (default) the probe is a
    broadcast hash join and the stream never shuffles — turn it off only
    when the distinct-fingerprint set outgrows broadcast, at which point
    the anti-join shuffles on the fingerprint. This removes
    stream-vs-history duplicates ONLY; in-stream duplicates within the
    watermark are `dedup_stream`'s job — compose both for full ingestion
    dedup.
    """
    from pyspark.sql import functions as _F

    seen_fp = seen_df.select(_F.md5(_F.col(text_col)).alias("__fp")).distinct()
    if broadcast_seen:
        seen_fp = _F.broadcast(seen_fp)
    return (
        stream_df.withColumn("__fp", _F.md5(_F.col(text_col)))
        .join(seen_fp, "__fp", "left_anti")
        .drop("__fp")
    )


def sketched_dedup_batch_writer(
    seen_tags: DataFrame,
    id_col: str,
    text_col: str,
    output_path: str,
    **dedup_kwargs,
):
    """foreachBatch writer for NEAR-duplicate incremental ingestion dedup
    against a persisted `minhash_band_tags` sketch table: each micro-batch
    runs the full batch `dedup_against(..., seen_tags=)` pipeline (band
    candidates + exact-Jaccard verification + anti-join) and appends the
    survivors to `output_path` as parquet.

    The banding/verification aggregations are unsupported inside an
    append-mode streaming plan, so this is the Spark-idiomatic shape for
    the minhash mode: stream -> foreachBatch(batch operator) -> sink.
    (`dedup_against_stream` remains the fully-stateless EXACT-fingerprint
    transform.) The static sketch is re-read per micro-batch, so sketch
    rows appended by upstream snapshots are picked up without a restart::

        q = (stream.writeStream
             .foreachBatch(sketched_dedup_batch_writer(
                 spark.read.parquet(sketch_path), "doc_id", "text", out_dir))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True)
             .start())
    """
    from ..operators.dedup import dedup_against

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        out = dedup_against(
            batch_df, None, id_col, text_col,
            method="minhash", seen_tags=seen_tags, **dedup_kwargs,
        )
        out.write.mode("append").parquet(output_path)

    return _write


def image_dedup_batch_writer(
    id_col: str,
    payload_col: str,
    sketch_path: str,
    output_path: str,
    *,
    method: str = "dhash",
    max_hamming: int = 4,
    within_batch: bool = True,
):
    """foreachBatch writer for incremental PERCEPTUAL image dedup — the
    raster-channel analogue of `sketched_dedup_batch_writer`, but
    self-maintaining: each micro-batch (a) drops images whose dHash
    sits within `max_hamming` bits of the persisted
    `multimodal.image_hash_sketch` log at `sketch_path`, (b) optionally
    collapses new-vs-new near-dups (`within_batch=True` runs
    `image_dedup` over the survivors — min id per cluster), (c) appends
    the surviving rows to `output_path`, and (d) appends ONLY the
    survivors' hashes to the sketch — so later batches dedup against
    earlier batches without any restart, history raw bytes are never
    re-read or re-decoded, and per-batch cost is O(batch) decode+hash
    plus a banded join against 16-byte signature rows. Undecodable
    payloads pass through every batch (unknown is not duplicate).

    First-batch detection matches STRUCTURED error classes exactly like
    `kmv_sketch_batch_writer` (r12 fix heritage): only "no committed
    sketch data yet" seeds an empty history; a committed-but-corrupt
    artifact propagates::

        q = (stream.writeStream
             .foreachBatch(image_dedup_batch_writer(
                 "doc_id", "payload", sketch_dir, out_dir, max_hamming=2))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True)
             .start())
    """
    from ..operators.multimodal import (
        image_dedup, image_dedup_against, image_hash_sketch,
    )

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            seen = spark.read.parquet(sketch_path).select("hash")
            out = image_dedup_against(
                batch_df, id_col, payload_col,
                seen_hashes=seen, method=method, max_hamming=max_hamming,
            )
        except AnalysisException as e:
            cond = _error_condition(e)
            if cond not in ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"):
                raise
            if cond == "UNABLE_TO_INFER_SCHEMA" and _has_committed_parts(
                spark, sketch_path
            ):
                raise
            out = batch_df
        if within_batch:
            out = image_dedup(
                out, id_col, payload_col,
                method=method, max_hamming=max_hamming,
            )
        # materialize once: survivors feed BOTH the output append and
        # the sketch append, and recomputing would re-decode the batch
        out = out.localCheckpoint(eager=True)
        out.write.mode("append").parquet(output_path)
        image_hash_sketch(out, id_col, payload_col, method=method).write.mode(
            "append"
        ).parquet(sketch_path)
        out.unpersist()

    return _write


def quality_gate_stream(stream_df: DataFrame, text_col: str, **thresholds) -> DataFrame:
    """Streaming Gopher quality gate: drop low-quality documents from an
    ingestion stream. `gopher_filter`'s rules are row-local predicates
    (no aggregation, no state), so the gate is a fully STATELESS
    streaming transform — it composes into any append-mode plan, adds
    zero state-store footprint, and runs at scan speed inside
    whole-stage codegen per micro-batch. Thresholds kwargs as in
    `operators.text.gopher_quality_flags` (published Gopher defaults).
    """
    from ..operators.text import gopher_filter

    # id_col is unused by the direct-predicate filter; pass text_col
    return gopher_filter(stream_df, text_col, text_col, **thresholds)


def curate_batch_writer(
    id_col: str,
    text_col: str,
    output_path: str,
    *,
    clean_kwargs: dict | None = None,
    gopher_kwargs: dict | None = None,
):
    """foreachBatch writer for the full per-batch curation recipe:
    C4 line correction (`clean_lines`) then the Gopher document gate
    (`gopher_filter`), appending survivors to `output_path` as parquet.

    `clean_lines` rebuilds documents with a per-doc groupBy — an
    aggregation append-mode streaming cannot host — so this takes the
    same stream -> foreachBatch(batch operator) -> sink shape as
    `sketched_dedup_batch_writer`. The stateless `quality_gate_stream`
    is the in-plan alternative when line correction is not needed::

        q = (stream.writeStream
             .foreachBatch(curate_batch_writer("doc_id", "text", out_dir))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True)
             .start())
    """
    from ..operators.text import clean_lines, gopher_filter

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        cleaned = clean_lines(batch_df, id_col, text_col, **(clean_kwargs or {}))
        kept = gopher_filter(cleaned, id_col, text_col, **(gopher_kwargs or {}))
        kept.write.mode("append").parquet(output_path)

    return _write


def classifier_gate_batch_writer(
    model: DataFrame,
    id_col: str,
    text_col: str,
    output_path: str,
    *,
    min_avg_lr_ppm: int,
    n: int = 1,
    buckets: int = 10_000,
    seed: int = 42,
    lowercase: bool = True,
):
    """foreachBatch writer gating an ingestion stream on the hashed-BoW
    quality classifier (`lm.quality_classifier_score`): each micro-batch
    is scored against the PERSISTED model table (broadcast joins,
    O(batch) — the model trains once per snapshot, never inside the
    stream) and only documents whose exact-ppm likelihood-ratio channel
    clears `min_avg_lr_ppm` are appended to `output_path` as parquet.

    Scoring needs a per-document groupBy, which append-mode streaming
    cannot host without a watermarked aggregation — so this takes the
    stream -> foreachBatch(batch operator) -> sink shape of
    `sketched_dedup_batch_writer`/`curate_batch_writer`; the threshold
    rides the deterministic integer channel so the gate decision is
    bit-reproducible across engines and batch boundaries. Documents with
    zero grams score no row and are dropped (gate semantics: unscorable
    docs carry no evidence of quality)::

        q = (stream.writeStream
             .foreachBatch(classifier_gate_batch_writer(
                 spark.read.parquet(model_dir), "doc_id", "text", out_dir,
                 min_avg_lr_ppm=940_000))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True)
             .start())
    """
    from pyspark.sql import functions as F

    from ..operators.lm import quality_classifier_score

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        scored = quality_classifier_score(
            batch_df, model, id_col, text_col,
            n=n, buckets=buckets, seed=seed, lowercase=lowercase,
        )
        keep = scored.filter(
            F.col("avg_lr_ppm") >= F.lit(float(min_avg_lr_ppm))
        ).select(F.col(id_col))
        batch_df.join(F.broadcast(keep), id_col, "left_semi").write.mode(
            "append"
        ).parquet(output_path)

    return _write


def blocklist_gate_batch_writer(
    terms: DataFrame,
    id_col: str,
    text_col: str,
    output_path: str,
    *,
    term_col: str | None = None,
):
    """foreachBatch writer gating an ingestion stream on the whole-word
    content blocklist (`text.term_blocklist`, the C4 badwords pass):
    each micro-batch drops documents containing ANY blocklisted term
    as a token-aligned match and appends survivors to `output_path` as
    parquet. The match needs a token explode + broadcast join — not a
    row-local predicate — so this takes the stream -> foreachBatch
    (batch operator) -> sink shape of `curate_batch_writer`. The terms
    table is the classic static broadcast dimension: O(batch) work per
    trigger, zero state-store footprint, and the verdict is
    deterministic per document, so batch boundaries never change the
    surviving set (streaming/batch parity — the certification
    contract)::

        q = (stream.writeStream
             .foreachBatch(blocklist_gate_batch_writer(
                 terms_df, "doc_id", "text", out_dir))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True)
             .start())
    """
    from ..operators.text import term_blocklist

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        kept = term_blocklist(
            batch_df, terms, id_col, text_col=text_col, term_col=term_col
        )
        kept.write.mode("append").parquet(output_path)

    return _write


def activity_week_batch_writer(
    activity_path: str,
    user_col: str,
    ts_col: str,
):
    """foreachBatch writer maintaining the persisted (user, week)
    activity set that `joins.retention_from_activity` reports over —
    streaming cohort retention without ever retaining raw events.
    Retention's sufficient statistics are exactly mergeable: the
    cohort is min(week) per user and activity is a set union, both
    order-free, so appending each micro-batch's DISTINCT
    (user, week) rows — idempotent by value: a replayed batch appends
    byte-identical rows that the report's distinct collapses — keeps
    the artifact equal (post-distinct) to the one-shot aggregation of
    every event ever ingested, regardless of batch order or overlap.
    Per-batch cost never grows with history; artifact rows are
    bounded by |users| x |weeks|::

        q = (stream.writeStream
             .foreachBatch(activity_week_batch_writer(
                 act_dir, "user_id", "ts"))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True)
             .start())
    """
    from pyspark.sql import functions as F

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        part = (
            batch_df.select(
                F.col(user_col).alias("user_id"),
                F.to_date(
                    F.date_trunc("week", F.col(ts_col))
                ).alias("week"),
            )
            .filter(
                F.col("user_id").isNotNull() & F.col("week").isNotNull()
            )
            .distinct()
        )
        part.write.mode("append").parquet(activity_path)

    return _write


def perplexity_gate_batch_writer(
    model: DataFrame,
    id_col: str,
    text_col: str,
    output_path: str,
    *,
    min_avg_score_ppm: int,
    n: int = 2,
    lowercase: bool = True,
    vocab_size: int | None = None,
    smoothing: str = "laplace",
):
    """foreachBatch writer gating an ingestion stream on LM perplexity —
    the CCNet filter (Wenzek et al. 2019) as a stream: each micro-batch
    is scored under the PERSISTED reference `ngram_lm` artifact
    (`lm.ngram_lm_score`, or `kn_lm_score` with smoothing='kn' — the
    smoothing KenLM actually uses) and only documents the reference LM
    models WELL — avg_score_ppm >= min_avg_score_ppm, i.e. perplexity
    low enough — are appended to `output_path` as parquet. The model
    trains once per snapshot, never inside the stream; scoring is
    broadcast joins, O(batch).

    The threshold rides the exact integer channel
    (`sum_score_ppm >= min_avg_score_ppm * n_grams` — both BIGINTs), so
    the gate decision is bit-reproducible across engines and batch
    boundaries, with no double rounding at the cut. Documents with
    < n tokens score no row and are dropped (gate semantics: unscorable
    docs carry no evidence the LM models them). Scoring needs a per-doc
    groupBy, which append-mode streaming cannot host, hence the
    stream -> foreachBatch(batch operator) -> sink shape of the other
    gate writers. Unlike `perplexity_buckets` (corpus-relative tertile
    cuts, meaningless per micro-batch), the gate takes an ABSOLUTE
    ppm threshold — calibrate it once against the batch tiering (e.g.
    a committed cut from a corpus snapshot) and every micro-batch
    applies the same cut::

        q = (stream.writeStream
             .foreachBatch(perplexity_gate_batch_writer(
                 spark.read.parquet(lm_dir), "doc_id", "text", out_dir,
                 min_avg_score_ppm=1_500))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True)
             .start())
    """
    from pyspark.sql import functions as F

    from ..operators.lm import kn_lm_score, ngram_lm_score

    if smoothing not in ("laplace", "kn"):
        raise ValueError(f"unknown smoothing {smoothing!r}")
    if smoothing == "kn" and n != 2:
        raise ValueError("smoothing='kn' supports n=2 only")

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        if smoothing == "laplace":
            scored = ngram_lm_score(
                batch_df, model, id_col, text_col, n=n,
                lowercase=lowercase, vocab_size=vocab_size,
            )
        else:
            scored = kn_lm_score(
                batch_df, model, id_col, text_col, lowercase=lowercase
            )
        keep = scored.filter(
            F.col("sum_score_ppm")
            >= F.lit(int(min_avg_score_ppm)) * F.col("n_grams")
        ).select(F.col(id_col))
        batch_df.join(F.broadcast(keep), id_col, "left_semi").write.mode(
            "append"
        ).parquet(output_path)

    return _write


def novelty_gate_batch_writer(
    seen_keys: DataFrame,
    id_col: str,
    text_col: str,
    output_path: str,
    *,
    min_novelty_ppm: int,
    n: int = 3,
):
    """foreachBatch writer gating an ingestion stream on NOVELTY vs the
    persisted history gram-key sketch (`dedup.gram_key_sketch` +
    `dedup.novelty_scores`): each micro-batch is scored against the
    sketch (one membership join, no sketch-side aggregate — the
    persisted-key fast path) and only documents whose novelty clears
    `min_novelty_ppm` are appended to `output_path` as parquet. This is
    the graded middle ground the batch operator's docstring describes,
    as an ingestion gate: near-zero-novelty docs (rehashes of known
    content) are dropped BEFORE the expensive downstream stages.

    The threshold rides exact integer arithmetic
    (`unseen_grams * 1_000_000 >= min_novelty_ppm * n_grams`) so the
    gate decision is bit-reproducible across engines and batch
    boundaries — no double rounding at the boundary. Documents with no
    n-grams score no row and are dropped (gate semantics: unscorable
    docs carry no novelty evidence). Novelty scoring needs a per-doc
    groupBy, which append-mode streaming cannot host, hence the
    stream -> foreachBatch(batch operator) -> sink shape of the other
    gate writers; the static sketch is re-read per micro-batch, so keys
    appended by upstream snapshots apply without a restart::

        q = (stream.writeStream
             .foreachBatch(novelty_gate_batch_writer(
                 spark.read.parquet(sketch_dir), "doc_id", "text", out_dir,
                 min_novelty_ppm=500_000))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True)
             .start())
    """
    from pyspark.sql import functions as F

    from ..operators.dedup import novelty_scores

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        scored = novelty_scores(batch_df, seen_keys, id_col, text_col, n=n)
        keep = scored.filter(
            F.col("unseen_grams") * F.lit(1_000_000)
            >= F.lit(int(min_novelty_ppm)) * F.col("n_grams")
        ).select(F.col(id_col))
        batch_df.join(F.broadcast(keep), id_col, "left_semi").write.mode(
            "append"
        ).parquet(output_path)

    return _write


def kmv_sketch_batch_writer(
    sketch_path: str,
    cols: list[str] | str,
    *,
    k: int = 1024,
    group_by: list[str] | None = None,
    hash_fn: str = "xxhash64",
):
    """foreachBatch writer maintaining a persisted KMV cardinality
    sketch (`cardinality.kmv_sketch`) across an ingestion stream:
    each micro-batch is reduced to its own k-smallest distinct key
    hashes, anti-joined against the hashes already in `sketch_path`,
    and ONLY the genuinely new rows are appended — the same
    append-only O(new-keys) contract as `dedup.append_sketch`, so the
    artifact is never rewritten and a batch's cost never grows with
    history. The file may therefore hold MORE than k rows (supersets
    preserve the k-smallest invariant); read it back through
    `kmv_compact` before `kmv_estimate`. Because
    merge(sketch(A), sketch(B)) == sketch(A ++ B) (pytest + oracle
    certified), the compacted artifact after any number of batches
    equals the one-shot sketch of the full stream::

        q = (stream.writeStream
             .foreachBatch(kmv_sketch_batch_writer(
                 sketch_dir, ["token"], k=1024, hash_fn='md5'))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True)
             .start())
    """
    from ..operators.cardinality import kmv_sketch

    groups = list(group_by or [])

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_sk = kmv_sketch(
            batch_df, cols, k=k, group_by=group_by, hash_fn=hash_fn
        ).select(*groups, "h")
        try:
            existing = spark.read.parquet(sketch_path).select(*groups, "h")
            new_rows = batch_sk.join(existing, groups + ["h"], "left_anti")
        except AnalysisException as e:
            # Only "no committed sketch data yet" means "first batch" —
            # a corrupt or schema-drifted artifact must propagate, not
            # silently skip the anti-join and append duplicate rows.
            # Matched on the STRUCTURED error class (message substrings
            # vary across Spark versions/locales):
            # - PATH_NOT_FOUND: the directory does not exist.
            # - UNABLE_TO_INFER_SCHEMA: the directory exists but holds
            #   no readable parquet data file (e.g. an interrupted
            #   first write left only _temporary) — semantically still
            #   "no sketch rows committed", so treat as first batch; a
            #   committed-but-corrupt footer raises a different error
            #   class at read time and still propagates.
            cond = _error_condition(e)
            if cond not in ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"):
                raise
            if cond == "UNABLE_TO_INFER_SCHEMA" and _has_committed_parts(
                spark, sketch_path
            ):
                # the directory DOES hold committed part files, so
                # "can't infer schema" is data loss/corruption (e.g.
                # footers wiped), NOT an interrupted first write —
                # re-seeding here would silently append duplicates
                raise
            new_rows = batch_sk
        new_rows.write.mode("append").parquet(sketch_path)

    return _write


def quantile_sketch_batch_writer(
    sketch_path: str,
    col: str,
    *,
    lo: float,
    hi: float,
    n_buckets: int = 4096,
):
    """foreachBatch writer maintaining a persisted quantile sketch
    (`cardinality.quantile_sketch`) across an ingestion stream: each
    micro-batch appends its OWN partial sketch (<= n_buckets rows,
    tagged with batch_id) — counts are additive, so no read-back,
    no anti-join, and a batch's cost never grows with history. Read
    the artifact through `quantile_sketch_compact` (which also makes a
    replayed batch idempotent: per-batch sketches are deterministic,
    so duplicate (batch_id, bucket) rows collapse) and query with
    `quantile_query`. Because merge == sketch-of-union (pytest +
    oracle certified), the compacted artifact after any batch split
    equals the one-shot sketch of the full stream — streaming gates
    can cut on percentiles without ever recomputing the corpus::

        q = (stream.writeStream
             .foreachBatch(quantile_sketch_batch_writer(
                 sketch_dir, "score", lo=0.0, hi=1.0, n_buckets=512))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True)
             .start())
    """
    from ..operators.cardinality import quantile_sketch

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        sk = quantile_sketch(
            batch_df, col, lo=lo, hi=hi, n_buckets=n_buckets
        )
        sk.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(sketch_path)

    return _write


def quantile_gate_batch_writer(
    sketch: DataFrame,
    col: str,
    output_path: str,
    *,
    fraction: float,
    side: str = "le",
):
    """foreachBatch writer gating an ingestion stream on a PERCENTILE
    cut read from a persisted quantile sketch
    (`cardinality.quantile_sketch`, compacted) — the point of the
    mergeable rank sketch: the corpus-relative threshold (p90 length,
    p75 price, p99 perplexity...) is calibrated ONCE against the
    sketch artifact, never recomputed per micro-batch.

    The cut resolves at writer CONSTRUCTION time with one tiny job
    over the <= n_buckets sketch rows: the `fraction`-quantile's
    containing bucket's TRUE value bound — hi_v for side='le' (keep
    rows <= cut; every value at or below the true quantile passes, so
    the keep rate is >= fraction, overshooting by at most the bucket's
    residents), lo_v for side='ge' (keep rows >= cut, rate >=
    1-fraction). Cutting on a TRUE data value (not an interpolated
    estimate) keeps the gate decision exact-comparable and
    engine-replayable. Each batch then runs ONE whole-stage-codegen
    literal filter — zero joins, zero state, O(batch) forever. NULLs
    never pass (unknown is not below any cut)::

        sk = quantile_sketch_compact(spark.read.parquet(sketch_dir))
        q = (stream.writeStream
             .foreachBatch(quantile_gate_batch_writer(
                 sk, "score", out_dir, fraction=0.9, side="le"))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True)
             .start())
    """
    from ..operators.cardinality import quantile_query

    if side not in ("le", "ge"):
        raise ValueError(f"unknown side {side!r}; use 'le' or 'ge'")
    row = quantile_query(sketch, [fraction]).first()
    if row is None:
        raise ValueError("empty quantile sketch — nothing to calibrate on")
    cut = row["hi_v"] if side == "le" else row["lo_v"]

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        v = F.col(col).cast("double")
        pred = (v <= F.lit(cut)) if side == "le" else (v >= F.lit(cut))
        batch_df.filter(pred).write.mode("append").parquet(output_path)

    return _write


def moment_sketch_batch_writer(
    sketch_path: str,
    id_col: str,
    vec_col: str,
    *,
    run_id: str,
):
    """foreachBatch writer maintaining persisted integer embedding
    moments (`similarity.int_moments`) across an ingestion stream —
    the streaming half of continuous PCA/OPQ retraining and of
    embedding DRIFT watching (compare a day's compacted moments
    against the trailing corpus'). Integer moments are EXACTLY
    mergeable (every entry is an order-free BIGINT sum, so per-batch
    partials simply add), which makes the maintenance trivial-by-
    construction: each micro-batch appends its own (i, j, s) partial
    rows tagged with batch_id, and `moment_sketch_compact` reduces the
    log back to d*(d+1)/2 + d + 1 rows equal to the one-shot moments
    of everything ingested. Append-only — a batch's cost never grows
    with history; replays dedup on (run_id, batch_id, i, j)::

        q = (stream.writeStream
             .foreachBatch(moment_sketch_batch_writer(
                 sketch_dir, "vec_id", "qvec", run_id="day1"))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True)
             .start())

    `run_id` is REQUIRED and must be unique per streaming query
    (checkpoint): Structured Streaming batch ids are only unique
    within ONE query, so two distinct queries appending to the same
    artifact would both emit batch_id=0 and the (batch_id, i, j)
    replay-dedup in `moment_sketch_compact` would silently collapse
    distinct real partials — the batch_id-collision data-loss
    pattern. Tagging every partial with the query's run_id scopes the
    dedup to (run_id, batch_id, i, j), which is collision-free."""
    from ..operators.similarity import int_moments

    if not run_id:
        raise ValueError(
            "run_id is required and must be unique per streaming "
            "query: batch ids are only unique within one query, so "
            "untagged partials from two queries would collide and "
            "the replay-dedup would collapse real data"
        )

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        part = int_moments(batch_df, id_col, vec_col).withColumn(
            "batch_id", F.lit(batch_id).cast("long")
        ).withColumn("run_id", F.lit(run_id))
        part.write.mode("append").parquet(sketch_path)

    return _write


def moment_sketch_compact(sketch: DataFrame) -> DataFrame:
    """Reduce an append-only moment log back to canonical (i, j, s)
    rows — counts add exactly. A replayed micro-batch appends
    byte-identical partials, so the (batch_id, i, j) dedup makes
    compaction effectively exactly-once (the `quantile_sketch_compact`
    contract)."""
    keys = [c for c in ("run_id", "batch_id") if c in sketch.columns]
    if keys:
        sketch = sketch.dropDuplicates(keys + ["i", "j"])
    return sketch.groupBy("i", "j").agg(
        F.sum("s").cast("long").alias("s")
    )
