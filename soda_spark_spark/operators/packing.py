"""Sequence-packing and corpus-mixture operators for training pipelines.

A pre-training pipeline ends by (a) choosing WHICH documents go in (mixture
weighting over sources/domains) and (b) laying tokens out into fixed-size
training sequences (GPT-style concatenate-and-chunk). Both are deterministic
layout/selection problems, so both are exactly replayable by the DuckDB
oracle — no approximation variants needed.

Scale design (100 TB):
- `pack_chunks` needs a GLOBAL prefix sum over the corpus in id order. A
  bare `Window.orderBy(id)` collapses to ONE partition — the classic Spark
  scale trap. Instead: monotone range-bucket the ids, cumsum within each
  bucket (shuffle on bucket), roll the tiny per-bucket totals into bucket
  offsets (few-hundred-row window), and broadcast them back. One real
  shuffle, one broadcast; no single-partition stage, no driver collect of
  row data.
- `weighted_mixture_sample` is a narrow per-row filter (content-hash
  acceptance, as `operators/sampling.py`) — no shuffle at any scale.
- `top_k_per_group` is one hash shuffle on the group key plus a per-group
  ranked window; output is bounded by k×groups.

Reference parity: the reference engine (soda-spark, a soda-sql adapter) has
no packing/mixture surface — these are §"LLM-data-pipeline" extensions, same
tier as dedup/ANN (see README extension tables).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _persist_narrow(rows: DataFrame) -> DataFrame:
    """Persist an operator's internal narrow frame (id/tokens/axis — a
    few fixed-width columns, never the text) MEMORY_AND_DISK. The
    multi-pass layout operators (`select_by_budget`, `assign_shards`)
    re-read this frame 3-4x; without the persist, an expensive upstream
    lineage (dedup -> encode -> count) re-executes per pass (measured
    4x on PLANS §25's composition). The cache is left registered when
    the operator returns — the RETURNED frame still reads it lazily, so
    an unpersist-on-return would silently void the cache (the classic
    trap); Spark evicts LRU under pressure and the narrow columns bound
    the footprint. Callers managing their own caching pass
    cache_input=False."""
    return rows.persist(StorageLevel.MEMORY_AND_DISK)

from .sampling import _uniform


def pack_chunks(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    chunk_tokens: int,
    *,
    num_buckets: int = 256,
    max_id: int | None = None,
) -> DataFrame:
    """Assign every document its token-offset layout in the concatenated
    corpus: documents are laid end-to-end in ascending `id_col` order and the
    stream is cut every `chunk_tokens` tokens (GPT-style pack-and-chunk).

    Returns the input ids plus:
      - ``start_offset``  first token position of the doc in the stream
      - ``first_chunk`` / ``last_chunk``  chunk indices the doc touches
      - ``n_chunks``  how many training sequences contain a piece of the doc
        (0 for empty documents)

    Determinism: pure integer arithmetic over a total order — bit-exact
    across engines, partitionings, and cluster sizes. The distributed prefix
    sum buckets ids by range (monotone, so bucket boundaries never reorder
    documents), cumsums within buckets, and adds broadcast bucket offsets.

    `max_id` skips the max-scan when the caller already knows the id domain
    (e.g. a stable snapshot); pass it in incremental pipelines so appends
    don't re-scan.
    """
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    if num_buckets < 1:
        raise ValueError("num_buckets must be >= 1")
    ident, toks = F.col(id_col), F.col(tokens_col).cast("long")
    if max_id is None:
        row = df.agg(F.max(ident).alias("m")).collect()[0]
        max_id = row["m"] if row["m"] is not None else 0
    # monotone range bucket: floor(id * B / (max_id + 1)); ids beyond max_id
    # (caller-supplied stale domain) clamp into the last bucket
    span = int(max_id) + 1
    bucket = F.least(
        F.floor(F.col("__id").cast("long") * num_buckets / F.lit(span)),
        F.lit(num_buckets - 1),
    ).cast("int")
    rows = df.select(ident.alias("__id"), toks.alias("__tok")).withColumn(
        "__bkt", bucket
    )
    # tiny per-bucket totals -> exclusive prefix offsets (<= num_buckets rows;
    # the single-partition window here is over the TOTALS, not the data)
    offsets = (
        rows.groupBy("__bkt")
        .agg(F.sum("__tok").alias("__bkt_total"))
        .withColumn(
            "__bkt_offset",
            F.coalesce(
                F.sum("__bkt_total").over(
                    Window.orderBy("__bkt").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .drop("__bkt_total")
    )
    w = (
        Window.partitionBy("__bkt")
        .orderBy("__id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    laid = (
        rows.join(F.broadcast(offsets), "__bkt")
        .withColumn("__cum", F.sum("__tok").over(w))
        .withColumn("start_offset", F.col("__bkt_offset") + F.col("__cum") - F.col("__tok"))
    )
    first = F.floor(F.col("start_offset") / chunk_tokens).cast("long")
    last = F.floor((F.col("start_offset") + F.col("__tok") - 1) / chunk_tokens).cast("long")
    return laid.select(
        F.col("__id").alias(id_col),
        F.col("__tok").alias("n_tokens"),
        F.col("start_offset").cast("long").alias("start_offset"),
        first.alias("first_chunk"),
        F.when(F.col("__tok") > 0, last).otherwise(first).alias("last_chunk"),
        F.when(F.col("__tok") > 0, last - first + 1)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_chunks"),
    )


def select_by_budget(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    score_col: str,
    budget: int,
    *,
    descending: bool = True,
    num_buckets: int = 256,
    cache_input: bool = True,
) -> DataFrame:
    """Greedy score-ordered corpus selection under a token budget — the
    'fill the training mix with the best documents first' step: rank the
    corpus by (`score_col` desc [or asc], `id_col` asc) and keep the
    maximal PREFIX whose running token total stays within `budget`.
    Prefix rule, not knapsack: once the budget is crossed, every later
    doc is excluded even if a smaller one would still fit — that keeps
    the selection a pure function of the total order (bit-deterministic
    across engines and partitionings).

    Distributed exactly like `pack_chunks`: range-bucket the SCORE axis
    (monotone in the sort order, reverse-numbered for descending),
    cumsum within each bucket, broadcast the tiny per-bucket offsets —
    no single-partition window over the data. A constant score column
    degenerates to one bucket (the global order genuinely is one
    sequence then); null scores are excluded up front (they have no
    rank); null token counts count as 0.

    Returns the input rows that made the cut, plus `cum_tokens` — the
    running total through each kept doc.

    The selection passes re-read the internal (id, tokens, score)
    frame several times (the eager min/max score probe, the bucket
    offsets, the in-bucket cumsum); `cache_input=True` (default)
    persists that NARROW frame MEMORY_AND_DISK — the eager probe
    populates the cache, so an expensive upstream lineage executes
    once for all selection passes instead of 3x (PLANS §22/§28;
    18.1 s -> ~2 s on the 100k-doc composition probe without any
    caller-side `.cache()`). The final join back to `df` still reads
    `df` once for the full output columns — `.cache()` `df` itself to
    elide that too. Pass cache_input=False to manage caching yourself
    (the internal cache stays registered after return, since the
    returned frame reads it lazily)."""
    if budget < 0:
        raise ValueError("budget must be >= 0")
    if num_buckets < 1:
        raise ValueError("num_buckets must be >= 1")
    rows = df.select(
        F.col(id_col).alias("__id"),
        F.coalesce(F.col(tokens_col).cast("long"), F.lit(0)).alias("__tok"),
        F.col(score_col).cast("double").alias("__score"),
    ).filter(F.col("__score").isNotNull())
    if cache_input:
        rows = _persist_narrow(rows)
    lo, hi = rows.agg(F.min("__score"), F.max("__score")).first()
    if lo is None or not hi > lo:
        tagged = rows.withColumn("__bkt", F.lit(0))
    else:
        width = (hi - lo) / num_buckets
        idx = F.least(
            F.floor((F.col("__score") - F.lit(lo)) / F.lit(width)),
            F.lit(num_buckets - 1),
        ).cast("int")
        tagged = rows.withColumn(
            "__bkt", (F.lit(num_buckets - 1) - idx) if descending else idx
        )
    offsets = (
        tagged.groupBy("__bkt")
        .agg(F.sum("__tok").alias("__t"))
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__t").over(
                    Window.orderBy("__bkt").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .drop("__t")
    )
    order = (
        F.desc("__score") if descending else F.asc("__score"),
        F.asc("__id"),
    )
    w = (
        Window.partitionBy("__bkt")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sel = (
        tagged.join(F.broadcast(offsets), "__bkt")
        .withColumn("__cum", F.col("__off") + F.sum("__tok").over(w))
        .filter(F.col("__cum") <= budget)
        .select(
            F.col("__id").alias(id_col),
            F.col("__cum").cast("long").alias("cum_tokens"),
        )
    )
    return df.join(sel, id_col)


def weighted_mixture_sample(
    df: DataFrame,
    key_col: str,
    group_col: str,
    rates: dict[str, float],
    *,
    default_rate: float = 0.0,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Resample a corpus toward a target source mixture: keep each row with
    its group's acceptance rate, decided by hash(key) — the per-domain
    up/down-weighting step of a pre-training data recipe.

    Deterministic and engine-replayable like `deterministic_sample` (a row's
    fate depends only on its key + its group's rate), and a pure narrow
    filter — no shuffle, no sampling pass, safe at any scale. Groups absent
    from `rates` use `default_rate`. hash_fn='md5' is the oracle-replayable
    configuration.
    """
    for g, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {g!r} must be in [0, 1]")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError("default_rate must be in [0, 1]")
    from .sampling import _DENOM

    u = _uniform(F.col(key_col), seed, hash_fn)
    cut = None
    for g, r in rates.items():
        branch = F.when(F.col(group_col) == g, F.lit(int(r * _DENOM)))
        cut = branch if cut is None else cut.when(
            F.col(group_col) == g, F.lit(int(r * _DENOM))
        )
    cut = (
        F.lit(int(default_rate * _DENOM))
        if cut is None
        else cut.otherwise(F.lit(int(default_rate * _DENOM)))
    )
    return df.filter(u < cut)


def temperature_mixture_rates(
    df: DataFrame,
    group_col: str,
    *,
    alpha: float = 0.5,
    target_rows: int,
    ppm: bool = False,
) -> DataFrame:
    """Per-group acceptance rates that resample a corpus toward a
    temperature-flattened source mixture — the multilingual/multi-source
    rebalancing rule q_i ∝ p_i^alpha (Lample & Conneau 2019, "Cross-
    lingual Language Model Pretraining", public arXiv:1901.07291; the
    same rule reweights source corpora in LLM pre-training mixes).
    alpha < 1 upweights small groups, alpha = 1 keeps natural
    proportions, alpha = 0 is uniform.

    Returns one row per group: (group_col, n, p, q, rate) where
    p = n/N (natural share), q = p^alpha / sum_j p_j^alpha (target
    share) and rate = min(1, target_rows * q / n) (per-row acceptance
    probability that realizes the target in expectation; groups whose
    target exceeds their size saturate at 1 — no upsampling).

    One tiny groupBy (|groups| rows); everything downstream broadcasts.

    Channels (the repo's standard float-vs-exact split): the default
    float channel normalizes by Z = sum(p^alpha) — a sum of doubles
    whose rounding depends on aggregation order, so it is deterministic
    within an engine but not bit-portable; parity is pytest-pinned
    against a Python reference. `ppm=True` is the CERTIFIED channel:
    each p^alpha is floored to parts-per-million first (for alpha=0.5,
    div + sqrt + mul + floor are each single correctly-rounded IEEE-754
    ops), Z becomes an order-free BIGINT sum, and the rate derives from
    exact integers in fixed order — bit-identical in any engine (the
    DuckDB oracle replays it)."""
    if target_rows < 0:
        raise ValueError("target_rows must be >= 0")
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("__N"))
    p = F.col("n").cast("double") / F.col("__N").cast("double")
    palpha = F.sqrt(p) if alpha == 0.5 else F.pow(p, F.lit(float(alpha)))
    if ppm:
        palpha = F.floor(F.lit(1_000_000.0) * palpha).cast("long")
    scored = counts.crossJoin(F.broadcast(total)).select(
        group_col, "n", p.alias("p"), palpha.alias("__pa")
    )
    z = scored.agg(F.sum("__pa").alias("__Z"))
    q = F.col("__pa").cast("double") / F.col("__Z").cast("double")
    rate = F.least(
        F.lit(1.0), F.lit(float(target_rows)) * q / F.col("n").cast("double")
    )
    return scored.crossJoin(F.broadcast(z)).select(
        group_col, "n", "p", q.alias("q"), rate.alias("rate")
    )


def temperature_mixture_sample(
    df: DataFrame,
    key_col: str,
    group_col: str,
    *,
    alpha: float = 0.5,
    target_rows: int,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    ppm: bool = False,
) -> DataFrame:
    """Resample toward the temperature-flattened mixture in one lazy
    plan: `temperature_mixture_rates` -> broadcast-join the (tiny)
    rate table on the group -> keep rows whose deterministic
    hash(key) uniform falls under the group's rate. Same determinism
    contract as `weighted_mixture_sample` (a row's fate is a pure
    function of its key, its group's rate and the seed — partitioning-
    invariant); hash_fn='md5' + ppm=True is the oracle-replayable
    configuration (see `temperature_mixture_rates` on the channels).
    No corpus shuffle: the only aggregation is over |groups| rows.

    NOTE: the input lineage executes twice (the rate aggregation and
    the filtered output). Free over a plain scan; when composing after
    an expensive upstream (clean_lines -> gopher_filter -> here),
    `.cache()` the upstream frame first — measured 19.0 s -> 4.2 s on
    the 100k-doc recipe probe (PLANS §23)."""
    from .sampling import _DENOM

    rates = temperature_mixture_rates(
        df, group_col, alpha=alpha, target_rows=target_rows, ppm=ppm
    ).select(group_col, "rate")
    u = _uniform(F.col(key_col), seed, hash_fn)
    cut = F.floor(F.col("rate") * F.lit(float(_DENOM))).cast("long")
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(u < cut)
        .drop("rate")
    )


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    *,
    id_col: str,
    descending: bool = True,
    rank_col: str = "rank",
) -> DataFrame:
    """Keep the best `k` rows per group by `order_col` (ties broken by
    `id_col` ascending, so the selection is total-order deterministic) —
    the "top-quality documents per domain" selection step of a curation
    pipeline.

    One hash shuffle on the group key; the per-group sort is window-local.
    Output is bounded by k × |groups| regardless of input size. Skewed
    groups sort more rows in one task — for pathological skew pre-filter
    with an approximate per-group threshold first.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    ordc = F.col(order_col).desc() if descending else F.col(order_col).asc()
    w = Window.partitionBy(*group_cols).orderBy(ordc, F.col(id_col).asc())
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    chunk_tokens: int,
    overlap: int = 0,
) -> DataFrame:
    """Split each document into token-bounded chunks with optional overlap
    — the per-document complement to `pack_chunks` (which lays documents
    into a corpus-level stream): RAG indexing and long-context training
    prep both want bounded windows WITH provenance.

    Chunks start every `chunk_tokens - overlap` tokens (whitespace
    tokenization, consistent with the library's token_count) and carry
    `chunk_tokens` tokens except the final remainder; a document shorter
    than one chunk yields exactly one chunk. Empty/whitespace-only
    documents yield no rows. Returns (id, chunk_idx, n_chunk_tokens,
    chunk_text).

    Pure Catalyst: split -> sequence(0, n_chunks-1) explode -> slice +
    array_join per chunk. Embarrassingly parallel (no shuffle, no UDF);
    output row count is sum(ceil((tokens - overlap) / stride)) and each
    task's memory is bounded by one document's token array.
    """
    if chunk_tokens < 1:
        raise ValueError("chunk_tokens must be >= 1")
    if overlap < 0 or overlap >= chunk_tokens:
        raise ValueError("overlap must satisfy 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    # trim ALL whitespace, not F.trim (spaces only): a doc edged with
    # tabs/newlines would otherwise split into empty edge tokens
    # (hypothesis-caught). After a full trim, \s+ splitting of non-empty
    # text never produces an empty token — so instead of scrubbing
    # empties with a per-token lambda F.filter (an interpreted HOF, the
    # PLANS §14 hazard class), the explode is simply gated on a
    # non-empty trimmed doc.
    trimmed = F.regexp_replace(F.col(text_col), r"^\s+|\s+$", "")
    toks = F.split(trimmed, r"\s+")
    n = F.size(toks)
    # 1 chunk covers the first chunk_tokens tokens; every further stride
    # starts one more. (sequence() must be guarded NULL for empty docs —
    # Spark's sequence(0, -1) would DESCEND, not produce an empty array.)
    n_chunks = (
        F.lit(1)
        + F.ceil(F.greatest(n - chunk_tokens, F.lit(0)) / F.lit(stride))
    ).cast("int")
    return (
        df.select(
            F.col(id_col),
            toks.alias("__toks"),
            F.explode(
                F.when(F.length(trimmed) > 0, F.sequence(F.lit(0), n_chunks - 1))
            ).alias("chunk_idx"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.slice(
                F.col("__toks"),
                F.col("chunk_idx") * stride + 1,
                chunk_tokens,
            ).alias("__chunk"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.size("__chunk").cast("long").alias("n_chunk_tokens"),
            F.array_join("__chunk", " ").alias("chunk_text"),
        )
    )


def assign_shards(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    shard_tokens: int,
    *,
    order: str = "hash",
    seed: int = 42,
    num_buckets: int = 256,
    cache_input: bool = True,
) -> DataFrame:
    """Assign every document to a fixed-token-budget training SHARD —
    the last step of a curation pipeline before the trainer reads the
    corpus: documents are laid out in a deterministic total order and
    shard k owns the token range [k*shard_tokens, (k+1)*shard_tokens);
    a document belongs to the shard where its FIRST token lands, so
    assignment is a pure function of the order and the token counts
    (bit-identical across engines, partitionings, and re-runs — a
    re-generated corpus shards identically, which is what makes
    training resumable against rebuilt data).

    order='hash' (default) lays documents out in seeded-md5 order — a
    DETERMINISTIC shuffle, so every shard is an unbiased corpus sample
    (the property trainers want: no shard is 'all of one source');
    order='id' keeps ascending id order (locality-preserving layout
    for debugging / curriculum experiments).

    Distributed like `select_by_budget`: range-bucket the order axis,
    cumsum within buckets, broadcast per-bucket offsets — no global
    single-partition window. The hash axis is uniform by construction,
    so its fixed-width buckets are balanced regardless of data skew.
    Null token counts count as 0. Returns the input columns plus
    `shard_id` and `start_offset` (the document's first-token global
    offset).

    Pair with `write_training_shards` to materialize
    `partitionBy(shard_id)` parquet.

    Like `select_by_budget`, the layout passes re-read the internal
    (id, tokens, axis) frame more than once (bucket offsets, in-bucket
    cumsum); `cache_input=True` (default) persists that NARROW frame
    MEMORY_AND_DISK so an expensive upstream (e.g. `bpe_encode` token
    counts) executes once for the layout passes instead of per pass
    (PLANS §25/§28 — 29.9 s -> near-encode-once without any
    caller-side `.cache()`). The final join back to `df` still reads
    `df` once for the full output columns; `.cache()` `df` itself to
    elide that too. cache_input=False opts out (the internal cache
    stays registered after return — the returned frame reads it
    lazily)."""
    if shard_tokens < 1:
        raise ValueError("shard_tokens must be >= 1")
    if num_buckets < 1:
        raise ValueError("num_buckets must be >= 1")
    if order not in ("hash", "id"):
        raise ValueError(f"unknown order: {order!r}")
    rows = df.select(
        F.col(id_col).alias("__id"),
        F.coalesce(F.col(tokens_col).cast("long"), F.lit(0)).alias("__tok"),
    )
    if order == "hash":
        axis = F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.col("__id").cast("string"), F.lit(seed))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
    else:
        axis = F.col("__id").cast("long")
    rows = rows.withColumn("__axis", axis)
    if cache_input:
        rows = _persist_narrow(rows)
    # fixed-width range buckets over the axis; the md5 axis is uniform in
    # [0, 16^15), so fixed width is balanced. For order='id' fall back to
    # min/max-scaled widths (ids may be arbitrary).
    if order == "hash":
        width = (16 ** 15) // num_buckets + 1
        tagged = rows.withColumn(
            "__bkt", (F.col("__axis") / F.lit(width)).cast("int")
        )
    else:
        lo, hi = rows.agg(F.min("__axis"), F.max("__axis")).first()
        if lo is None or hi == lo:
            tagged = rows.withColumn("__bkt", F.lit(0))
        else:
            w_ = (hi - lo) / num_buckets
            tagged = rows.withColumn(
                "__bkt",
                F.least(
                    F.floor((F.col("__axis") - F.lit(lo)) / F.lit(w_)),
                    F.lit(num_buckets - 1),
                ).cast("int"),
            )
    offsets = (
        tagged.groupBy("__bkt")
        .agg(F.sum("__tok").alias("__t"))
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__t").over(
                    Window.orderBy("__bkt").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .drop("__t")
    )
    w = (
        Window.partitionBy("__bkt")
        .orderBy(F.asc("__axis"), F.asc("__id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    assigned = (
        tagged.join(F.broadcast(offsets), "__bkt")
        .withColumn("__cum", F.col("__off") + F.sum("__tok").over(w))
        .select(
            "__id",
            (F.col("__cum") - F.col("__tok")).alias("start_offset"),
        )
        .withColumn(
            "shard_id",
            F.floor(F.col("start_offset") / F.lit(shard_tokens)).cast("long"),
        )
    )
    return df.join(
        assigned, df[id_col] == assigned["__id"], "inner"
    ).drop("__id")


def write_training_shards(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    shard_tokens: int,
    path: str,
    *,
    order: str = "hash",
    seed: int = 42,
    mode: str = "error",
) -> None:
    """Materialize `assign_shards` as `partitionBy(shard_id)` parquet:
    one directory per fixed-token-budget shard, rows repartitioned by
    shard so each shard writes from one task (one file per shard at
    typical shard sizes — the trainer-friendly layout). Deterministic
    end to end: rebuilding the corpus reproduces byte-identical shard
    membership."""
    out = assign_shards(
        df, id_col, tokens_col, shard_tokens, order=order, seed=seed
    )
    (
        out.repartition(F.col("shard_id"))
        .write.mode(mode)
        .partitionBy("shard_id")
        .parquet(path)
    )


# ---------------------------------------------------------------------------
# Z-order layout keys
# ---------------------------------------------------------------------------

_INTEGRAL_TYPES = ("tinyint", "smallint", "int", "bigint")


def zorder_key(
    df: DataFrame,
    cols: list[str] | tuple[str, ...],
    *,
    bits: int = 8,
    key_col: str = "zorder_key",
    stats: dict[str, tuple[int, int]] | None = None,
) -> DataFrame:
    """Multi-column Z-order (Morton) layout key — the Delta `ZORDER BY` /
    Iceberg sort-order primitive: map each column to a 2^bits-bucket
    grid by global min/max, then bit-interleave the bucket numbers so
    rows close in EVERY dimension get close keys. Writing a table
    range-partitioned + sorted by this key clusters multi-predicate
    scans: a filter on any subset of the z-ordered columns prunes most
    files, which no single-column sort can do for the trailing columns.

    Bucketing is pure integer arithmetic — bucket = ((x - min) << bits)
    DIV (max - min + 1), in [0, 2^bits) — so keys are deterministic and
    exactly replayable by an external SQL engine. Integral columns
    only (layout grids for doubles/strings should be derived
    explicitly — quantile-bucket them first); any NULL coordinate
    yields a NULL key (Spark range-partitioning clusters NULLs
    together anyway). `bits * len(cols)` must fit a signed 64-bit key
    (<= 62 enforced).

    `stats` pins {col: (min, max)} explicitly — pass it when keys must
    stay stable across incremental runs (a grown max would silently
    re-grid every key); values outside a pinned range clamp to the
    edge buckets. By default the grid comes from one global min/max
    aggregate over `df`, collected EAGERLY at call time (one row of
    2n longs — bounded driver state): the span validation fails fast
    here instead of per-row mid-job, and the bounds become literals
    the key projection folds. An all-null column (or empty input)
    has no range; its keys NULL out rather than raising.

    Plan shape (100-TB audit): stats agg is map-side-combinable and
    column-pruned to `cols`; the key itself is a narrow projection in
    whole-stage codegen (shift/AND/OR only — min/max are literals,
    there is no broadcast-join node). The expensive step — the range
    shuffle — belongs to the caller's write
    (`df.repartitionByRange(n, key).sortWithinPartitions(key)`), where
    it is the point of the operation.
    """
    cols = list(cols)
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if bits < 1 or bits * len(cols) > 62:
        raise ValueError(
            f"bits * len(cols) must be in [1, 62], got {bits} * {len(cols)}"
        )
    for c in cols:
        dt = dict(df.dtypes).get(c)
        if dt not in _INTEGRAL_TYPES:
            raise ValueError(
                f"zorder_key needs integral columns; {c!r} is {dt} — "
                "quantile-bucket non-integral columns first"
            )
    n = len(cols)
    scale = 1 << bits
    # (clamped - lo) * 2^bits and hi - lo + 1 run in non-ANSI long
    # arithmetic: a wide bigint column (hash-valued keys spanning most
    # of int64) would overflow SILENTLY and wrap to wrong/negative
    # buckets — a corrupt layout key with no error. Bound the span so
    # both products provably fit: span * 2^bits <= Long.MAX.
    max_span = ((1 << 63) - 1 >> bits) - 1
    span_msg = (
        f"zorder_key column span exceeds 2^{63 - bits} - the bucket "
        f"arithmetic ((x - min) * 2^{bits}) would overflow int64 and "
        "silently corrupt layout keys; quantile-bucket the column "
        "first (stats.quantile_buckets) and z-order the bucket ids"
    )
    if stats is None:
        # Derived stats: the min/max agg was ALWAYS its own stage (it
        # fed a broadcast cross join before round 16) — collecting its
        # one row (2n longs, bounded driver state) instead costs no
        # extra pass over the data and buys three things at scale:
        # the span validation fails FAST at call time instead of
        # per-row mid-job, the broadcast-join node disappears from
        # every z-order plan, and min/max become literals whole-stage
        # codegen folds. The interleaved A/B that motivated this
        # (PLANS §81) read the per-row guard at ~6% of the layout
        # query. Trade-off, documented: zorder_key with derived stats
        # is now EAGER (triggers the agg at call time).
        row = df.agg(
            *[F.min(F.col(c).cast("long")).alias(f"__lo_{i}")
              for i, c in enumerate(cols)],
            *[F.max(F.col(c).cast("long")).alias(f"__hi_{i}")
              for i, c in enumerate(cols)],
        ).collect()[0]
        stats = {}
        for i, c in enumerate(cols):
            lo_v, hi_v = row[f"__lo_{i}"], row[f"__hi_{i}"]
            # empty input / all-null column: no range exists; (0, 0)
            # keeps the arithmetic valid and every key NULLs out
            # through the any_null channel below
            stats[c] = (0, 0) if lo_v is None else (lo_v, hi_v)
    missing = [c for c in cols if c not in stats]
    if missing:
        raise ValueError(f"stats missing columns: {missing}")
    for c in cols:
        s_lo, s_hi = int(stats[c][0]), int(stats[c][1])
        if not 0 <= s_hi - s_lo <= max_span:
            raise ValueError(f"{c!r}: {span_msg}")
    lo = {c: F.lit(int(stats[c][0])) for c in cols}
    hi = {c: F.lit(int(stats[c][1])) for c in cols}
    # integral `div` keeps the bucket math exact (no double division);
    # (x - lo) * 2^bits must fit int64 — the span guard above
    # enforces it for pinned and derived stats alike
    any_null = F.lit(False)
    tmp = df
    for ci, c in enumerate(cols):
        x = F.col(c).cast("long")
        any_null = any_null | x.isNull()
        # clamp handles values outside a pinned/derived stats range
        clamped = F.least(F.greatest(x, lo[c]), hi[c])
        zn = (clamped - lo[c]) * F.lit(scale)
        zs = hi[c] - lo[c] + F.lit(1)
        tmp = tmp.withColumn(f"__zn_{ci}", zn).withColumn(
            f"__zs_{ci}", zs
        )
    key = F.lit(0).cast("long")
    for ci in range(n):
        bucket = F.least(
            F.expr(f"__zn_{ci} div __zs_{ci}"), F.lit(scale - 1)
        )
        for bi in range(bits):
            bit = F.shiftright(bucket, bi).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, bi * n + ci)
    out_key = F.when(any_null, F.lit(None).cast("long")).otherwise(key)
    drop = [f"__zn_{i}" for i in range(n)] + [
        f"__zs_{i}" for i in range(n)
    ]
    return tmp.withColumn(key_col, out_key).drop(*drop)


def apply_zorder(
    df: DataFrame,
    cols: list[str] | tuple[str, ...],
    *,
    num_partitions: int,
    bits: int = 8,
    stats: dict[str, tuple[int, int]] | None = None,
) -> DataFrame:
    """Materialize a Z-ordered layout: compute `zorder_key`, range-
    partition on it (one range shuffle — the write's clustering step),
    sort within each partition, and drop the key. The returned frame,
    written as-is, gives every file a tight min/max envelope on EVERY
    z-ordered column — the file-skipping property ZORDER exists for."""
    keyed = zorder_key(df, cols, bits=bits, stats=stats)
    return (
        keyed.repartitionByRange(num_partitions, F.col("zorder_key"))
        .sortWithinPartitions("zorder_key")
        .drop("zorder_key")
    )


def zone_map(
    df: DataFrame,
    zone_cols: list[str] | tuple[str, ...],
    cols: list[str] | tuple[str, ...],
) -> DataFrame:
    """Zone-map statistics — per-zone (file/shard/partition) min, max,
    and null count for each pruning column, plus the zone row count:
    the metadata that makes a clustered layout actually skip I/O (a
    parquet reader prunes a file when the predicate range misses the
    file's min/max envelope; `apply_zorder` exists to SHRINK these
    envelopes, and this operator is how you measure that it did).
    Feed it the shard/file-group column of `compaction_plan`,
    `assign_shards`, or the `layout_recipe` shard split, and compare
    envelope widths before/after re-layout.

    One hash aggregation on the zone key with map-side partial combine;
    output bounded by zones. Returns zone_cols + n + per-col
    `<col>_min` / `<col>_max` / `<col>_nulls`.
    """
    if not zone_cols:
        raise ValueError("zone_map needs at least one zone column")
    if not cols:
        raise ValueError("zone_map needs at least one stats column")
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for c in cols:
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}_nulls")
        )
    return df.groupBy(*[F.col(z) for z in zone_cols]).agg(*aggs)


def length_buckets(
    df: DataFrame,
    tokens_col: str,
    *,
    min_bucket: int = 16,
) -> DataFrame:
    """Power-of-two length bucketing + padding-waste accounting — the
    batching-layout report an inference/training fleet wants before
    it pads: bucket every example to the smallest power of two >= its
    token count (floored at `min_bucket`), then per bucket report
    `n_docs`, `total_tokens`, `total_padding` (bucket minus tokens,
    summed) and `padding_ppm` (integer ppm of the padded volume that
    is waste). All integer arithmetic: the roundup uses the
    bit-length of (tokens-1) via base-2 string conversion — exact for
    any 64-bit count, no float log2 boundary hazards — and the ppm is
    an integer floor division, so engines agree bit-for-bit. One
    map-side-combinable groupBy on the bucket key.

    Rows with NULL or non-positive token counts land in bucket NULL
    (filter or alert, never silently vanish)."""
    # project the caller's column onto an internal alias FIRST, so the
    # F.expr below never interpolates a raw identifier — the name is
    # backtick-quoted (escaping interior backticks), so dots, spaces,
    # hyphens, and keywords resolve like every sibling operator
    # (round-18 fix)
    quoted = "`" + tokens_col.replace("`", "``") + "`"
    t = F.col("_t")
    base = df.select(F.col(quoted).cast("long").alias("_t"))
    pow2 = F.expr("shiftleft(CAST(1 AS BIGINT), "
                  "length(conv(_t - 1, 10, 2)))")
    bucket = F.when(
        t >= 1,
        F.greatest(
            F.lit(min_bucket).cast("long"),
            F.when(t == 1, F.lit(1).cast("long")).otherwise(pow2),
        ),
    )
    rows = base.select(bucket.alias("bucket"), t.alias("_t"))
    agg = rows.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_t").cast("long").alias("total_tokens"),
        F.sum(F.col("bucket") - F.col("_t")).cast("long").alias("total_padding"),
    )
    padded = F.col("bucket") * F.col("n_docs")
    # integer `div`, not a double divide + cast: Spark's double->long
    # cast truncates while DuckDB's rounds, and the exact-integer
    # channel sidesteps both
    return agg.select(
        "bucket", "n_docs", "total_tokens", "total_padding",
        F.when(
            F.col("bucket").isNotNull() & (padded > 0),
            F.expr("total_padding * 1000000L div (bucket * n_docs)"),
        ).alias("padding_ppm"),
    )
