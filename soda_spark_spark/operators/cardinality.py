"""KMV (k-minimum-values) cardinality sketches — deterministic,
mergeable, engine-replayable distinct-count tracking at corpus scale.

Why not exact COUNT(DISTINCT)? At 100 TB an exact distinct shuffles
every distinct key once per measurement; re-measuring after every
ingestion batch re-pays the whole corpus. Why not HyperLogLog
(`approx_count_distinct`)? Spark's HLL++ is engine-internal state — no
other engine replays it, so it can't ride the repo's oracle
certification channel, and its sketch bytes aren't a documented
artifact. KMV (Bar-Yossef et al. 2002; Beyer et al. 2007) keeps the k
smallest DISTINCT hash values of the key stream: a tiny persistable
artifact (k longs per group) that is

- deterministic: the sketch is a pure function of the key SET (order-
  free, duplicate-free) and the hash;
- mergeable: union two sketches' values, keep the k smallest — exactly
  the sketch of the unioned key sets (the snapshot-accumulation story
  shared with `dedup.gram_key_sketch` / `minhash_band_tags`);
- exactly replayable: with the md5 channel every sketch value is an
  exact integer and the estimator is one fixed, correctly-rounded
  double divide over exactly-representable integers — bit-identical
  in any IEEE-754 engine (registry rows `distinct_sketch` /
  `distinct_sketch_merge`).

Estimator: if the sketch holds n < k values the distinct count is
EXACTLY n (every distinct hash is present, modulo hash collisions in a
~2^60 space). Otherwise est = floor((k-1) * H / h_(k)) where h_(k) is
the k-th smallest hash and H the hash space — the unbiased KMV
estimate, relative error ~ 1/sqrt(k-2).

Reference behavioral anchor: soda-spark's `distinct`/`unique` scan
metrics (reference src/sodaspark/scan.py: metric groups) are exact
single-table aggregates; these operators extend them with the
persisted-sketch path an incremental 100-TB scan needs.

Scale shape (`kmv_sketch`): project keys -> distinct (one hash-shuffle
on the key) -> per-(group, salt-bucket) partial k-smallest window (each
window sorts only its bucket's distinct hashes) -> final k-smallest
window over the <= n_buckets * k surviving candidates per group. No
window ever sees more than max(D/n_buckets, n_buckets*k) rows, so
there is no single-task O(D) sort; driver state is zero.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# md5 channel hash space: first 15 hex digits -> [0, 16^15)
_MD5_SPACE = 16 ** 15


def _key_hash(cols: list[str], hash_fn: str) -> Column:
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols])
    if hash_fn == "md5":
        return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    if hash_fn == "xxhash64":
        return F.xxhash64(key)
    raise ValueError(f"unknown hash_fn {hash_fn!r}; use 'md5' or 'xxhash64'")


def kmv_sketch(
    df: DataFrame,
    cols: list[str] | str,
    *,
    k: int = 1024,
    group_by: list[str] | None = None,
    hash_fn: str = "xxhash64",
    n_buckets: int = 64,
) -> DataFrame:
    """Build the KMV sketch of the distinct (`cols`) tuples, optionally
    per `group_by` group: the k smallest distinct key hashes, one row
    per retained hash — (group_by..., pos, h) with pos = 1..k ascending
    in h. Persist it to parquet and feed later batches through
    `kmv_merge`; `kmv_estimate` reads counts off it without touching
    the corpus.

    hash_fn='xxhash64' (default) is the production channel (signed
    64-bit, cheapest); 'md5' is the oracle-replayable certification
    channel (hash space 16^15, exact integer estimator). NULL key
    components hash as empty strings (concat_ws semantics) — an
    all-NULL tuple still counts one distinct key.

    `n_buckets` bounds the window sorts (module docstring); correctness
    is unaffected (global k-smallest is a subset of the per-bucket
    k-smallest union)."""
    if k < 2:
        raise ValueError("k must be >= 2")
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    cols = [cols] if isinstance(cols, str) else list(cols)
    groups = list(group_by or [])
    d = df.select(
        *groups, _key_hash(cols, hash_fn).alias("__h")
    ).distinct()
    salted = d.withColumn("__s", F.pmod(F.col("__h"), F.lit(n_buckets)))
    w1 = Window.partitionBy(*groups, "__s").orderBy(F.asc("__h"))
    cand = (
        salted.withColumn("__p", F.row_number().over(w1))
        .filter(F.col("__p") <= k)
        .drop("__s", "__p")
    )
    w2 = Window.partitionBy(*groups).orderBy(F.asc("__h"))
    return (
        cand.withColumn("pos", F.row_number().over(w2))
        .filter(F.col("pos") <= k)
        .select(*groups, F.col("pos").cast("long").alias("pos"),
                F.col("__h").alias("h"))
    )


def kmv_merge(
    a: DataFrame,
    b: DataFrame,
    *,
    k: int = 1024,
    group_by: list[str] | None = None,
) -> DataFrame:
    """Merge two KMV sketches (same k, same hash channel): union,
    dedupe, keep the k smallest per group — exactly `kmv_sketch` of the
    unioned key sets. Inputs are sketch-sized (<= k rows per group), so
    one window per group over <= 2k rows."""
    if k < 2:
        raise ValueError("k must be >= 2")
    groups = list(group_by or [])
    u = (
        a.select(*groups, "h")
        .unionByName(b.select(*groups, "h"))
        .distinct()
    )
    w = Window.partitionBy(*groups).orderBy(F.asc("h"))
    return (
        u.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= k)
        .select(*groups, F.col("pos").cast("long").alias("pos"), "h")
    )


def kmv_compact(
    sketch: DataFrame,
    *,
    k: int = 1024,
    group_by: list[str] | None = None,
) -> DataFrame:
    """Canonicalize an OVERSIZED sketch table (e.g. the append-only
    output of `kmv_sketch_batch_writer`, which only ever adds rows) back
    to the k smallest distinct hashes per group — the exact sketch of
    everything ever appended. `kmv_estimate` expects this canonical
    shape."""
    if k < 2:
        raise ValueError("k must be >= 2")
    groups = list(group_by or [])
    u = sketch.select(*groups, "h").distinct()
    w = Window.partitionBy(*groups).orderBy(F.asc("h"))
    return (
        u.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= k)
        .select(*groups, F.col("pos").cast("long").alias("pos"), "h")
    )


def kmv_estimate(
    sketch: DataFrame,
    *,
    k: int = 1024,
    group_by: list[str] | None = None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Distinct-count estimate from a KMV sketch: per group,
    (group_by..., n_sketch, kth_h, distinct_est). n_sketch < k means
    the sketch is exhaustive and distinct_est = n_sketch EXACTLY;
    otherwise the KMV estimator (module docstring). The md5 channel's
    estimator is engine-exact as a fixed correctly-rounded double
    divide over exactly-representable integers — (k-1)*16^15 is
    (k-1) x 2^60 (exact for any sane k) and kth_h < 2^60, so both
    operands convert exactly and IEEE division rounds identically in
    every engine, then one floor (the bm25/kn channel argument; it is
    NOT pure integer arithmetic). The xxhash64 channel normalizes the
    signed kth value to (0, 1] in doubles."""
    if k < 2:
        raise ValueError("k must be >= 2")
    groups = list(group_by or [])
    agg = sketch.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("long").alias("n_sketch"),
        F.max("h").alias("kth_h"),
    )
    if hash_fn == "md5":
        # h uniform in [0, 16^15); est = floor((k-1) * H / kth)
        est = F.floor(
            F.lit(k - 1) * F.lit(float(_MD5_SPACE))
            / F.col("kth_h").cast("double")
        )
    elif hash_fn == "xxhash64":
        # signed 64-bit -> U = (h + 2^63 + 1) / 2^64 in (0, 1]
        u = (F.col("kth_h").cast("double") + F.lit(float(2 ** 63) + 1.0)) / \
            F.lit(float(2 ** 64))
        est = F.floor(F.lit(float(k - 1)) / u)
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}; use 'md5' or 'xxhash64'")
    return agg.select(
        *groups,
        "n_sketch",
        "kth_h",
        F.when(F.col("n_sketch") < k, F.col("n_sketch"))
        .otherwise(est).cast("long").alias("distinct_est"),
    )


def cms_sketch(
    df: DataFrame,
    cols: list[str] | str,
    *,
    depth: int = 4,
    width: int = 2048,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) of the (`cols`)
    key stream: `depth` hash rows x `width` buckets of BIGINT counts —
    the deterministic, mergeable, O(depth*width) frequency summary for
    heavy-hitter tracking at corpus scale. Like `kmv_sketch`, md5 is
    the oracle-replayable channel and xxhash64 the production one; the
    estimate's one-sided error contract (see `cms_query`) holds for
    both.

    Plan: one `depth`-fold explode over the keys, one (row, bucket)
    aggregation (map-side combined — the Zipf head collapses before the
    shuffle). Output <= depth*width rows: (d, w, c). Persist per
    snapshot; `cms_merge` adds sketches entrywise."""
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    cols = [cols] if isinstance(cols, str) else list(cols)
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols])
    rows = df.select(
        key.alias("__k"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    )
    return (
        rows.select("d", _cms_bucket(F.col("__k"), F.col("d"), width,
                                     hash_fn).alias("w"))
        .groupBy("d", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def _cms_bucket(key, d, width: int, hash_fn: str):
    if hash_fn == "md5":
        h = F.conv(
            F.substring(F.md5(F.concat(key, F.lit(":"), d.cast("string"))),
                        1, 15), 16, 10,
        ).cast("long")
    elif hash_fn == "xxhash64":
        h = F.xxhash64(key, d)
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}; use 'md5' or 'xxhash64'")
    return F.pmod(h, F.lit(width)).cast("long")


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Entrywise sum of two count-min sketches (same depth/width/hash):
    exactly the sketch of the concatenated streams."""
    return (
        a.select("d", "w", "c").unionByName(b.select("d", "w", "c"))
        .groupBy("d", "w").agg(F.sum("c").cast("long").alias("c"))
    )


def cms_query(
    sketch: DataFrame,
    keys: DataFrame,
    cols: list[str] | str,
    *,
    depth: int = 4,
    width: int = 2048,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Frequency estimates for a candidate key table against a
    `cms_sketch`: est = min over the `depth` rows of the key's bucket
    count. One-sided error — est >= true count always, and
    est <= true + 2N/width with probability 1 - 2^-depth (the CM
    guarantee), so thresholded heavy-hitter queries never miss a heavy
    key. The sketch (<= depth*width rows) broadcasts; the candidate
    table can be any size (per-key cost is `depth` joined rows).
    Returns the key columns plus `freq_est` (BIGINT)."""
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    cols = [cols] if isinstance(cols, str) else list(cols)
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols])
    probes = keys.select(
        *cols,
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    ).withColumn("w", _cms_bucket(key, F.col("d"), width, hash_fn))
    j = probes.join(F.broadcast(sketch), ["d", "w"], "left")
    return (
        j.groupBy(*cols)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long")
             .alias("freq_est"))
    )


# ---------------------------------------------------------------------------
# Bloom-filter membership sketch — the family's membership member
# ---------------------------------------------------------------------------


def bloom_sketch(
    df: DataFrame,
    cols: list[str] | str,
    *,
    m_bits: int = 8192,
    k_hashes: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Bloom filter (Bloom 1970) of the (`cols`) key set as a persisted
    SET-BIT table — the bounded-memory membership sketch for
    have-we-seen-this-URL/doc/key questions at corpus scale, completing
    the sketch family: membership (this), similarity (minhash band
    tags), cardinality (KMV), frequency (CMS). Each distinct key sets
    `k_hashes` positions pos = hash(key:j) mod m_bits (the `cms_sketch`
    position channel — md5 is the oracle-replayable configuration,
    xxhash64 the production one); the sketch is the DISTINCT set of
    set positions, <= m_bits rows of one BIGINT each.

    Deterministic (pure function of the key set and the hash),
    mergeable (`bloom_merge` = union-distinct == sketch of the unioned
    key sets), and append-friendly: anti-join a new batch's positions
    against the persisted table and append only genuinely new rows
    (the `append_sketch` contract — the artifact is never rewritten).
    NULL key components hash as empty strings (concat_ws semantics).

    Size the filter as usual: false-positive rate ~ (1 - e^{-kn/m})^k;
    m_bits/n ~ 10 with k_hashes=4 gives ~1.2% — and because the hash
    math is deterministic, the EXACT false-positive set is itself
    engine-replayable (the `bloom_membership` oracle reproduces it)."""
    if m_bits < 1:
        raise ValueError("m_bits must be >= 1")
    if k_hashes < 1:
        raise ValueError("k_hashes must be >= 1")
    cols = [cols] if isinstance(cols, str) else list(cols)
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols])
    rows = df.select(
        key.alias("__k"),
        F.explode(F.sequence(F.lit(0), F.lit(k_hashes - 1))).alias("j"),
    )
    return (
        rows.select(
            _cms_bucket(F.col("__k"), F.col("j"), m_bits, hash_fn)
            .alias("pos")
        )
        .distinct()
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union of two Bloom sketches (same m_bits/k_hashes/hash):
    exactly the sketch of the unioned key sets."""
    return a.select("pos").unionByName(b.select("pos")).distinct()


def bloom_query(
    sketch: DataFrame,
    keys: DataFrame,
    cols: list[str] | str,
    *,
    m_bits: int = 8192,
    k_hashes: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Membership probes against a `bloom_sketch`: a key is
    `maybe_present` iff ALL `k_hashes` of its positions are set. The
    Bloom one-sided contract — NO false negatives (a sketched key
    always probes true; pytest-pinned), false positives at the sized
    rate — so a pipeline can gate expensive work (dedup candidate
    joins, re-crawl suppression) on the cheap probe and only pay exact
    verification for the maybe-present survivors. The sketch
    (<= m_bits one-column rows) broadcasts; the probe side can be any
    size (per-key cost is `k_hashes` joined rows). Returns the key
    columns plus `maybe_present` (BOOLEAN)."""
    if m_bits < 1 or k_hashes < 1:
        raise ValueError("m_bits and k_hashes must be >= 1")
    cols = [cols] if isinstance(cols, str) else list(cols)
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols])
    probes = keys.select(
        *cols,
        F.explode(F.sequence(F.lit(0), F.lit(k_hashes - 1))).alias("j"),
    ).withColumn("pos", _cms_bucket(key, F.col("j"), m_bits, hash_fn))
    j = probes.join(
        F.broadcast(sketch.select("pos").distinct().withColumn(
            "__set", F.lit(1))),
        "pos", "left",
    )
    return (
        j.groupBy(*cols)
        .agg((F.min(F.coalesce(F.col("__set"), F.lit(0))) == F.lit(1))
             .alias("maybe_present"))
    )


# ---------------------------------------------------------------------------
# mergeable rank/quantile sketch (fixed-grid range-bucket counts)
# ---------------------------------------------------------------------------


def _qs_bucket(col: str, lo: float, hi: float, n_buckets: int) -> Column:
    """Shared bucket expression: floor((v - lo) / width) clamped into
    [0, n_buckets-1]. width = (hi - lo) / n_buckets in doubles — the
    same IEEE arithmetic any engine replays, so the sketch is
    oracle-certifiable. Out-of-range values clamp into the edge
    buckets (lo_v/hi_v record the TRUE values, so the report never
    lies about the range)."""
    width = (hi - lo) / n_buckets
    return F.least(
        F.greatest(
            F.floor((F.col(col).cast("double") - F.lit(lo)) / F.lit(width)),
            F.lit(0),
        ),
        F.lit(n_buckets - 1),
    ).cast("int")


def quantile_sketch(
    df: DataFrame,
    col: str,
    *,
    lo: float,
    hi: float,
    n_buckets: int = 4096,
) -> DataFrame:
    """Mergeable RANK sketch of numeric `col`: fixed-grid range-bucket
    counts — the `stats._order_statistic` histogram pass persisted as
    an artifact. One row per non-empty bucket:
    (bucket, n, lo_v, hi_v) = count + true min/max of the values that
    landed there; <= n_buckets rows total, one aggregation over the
    frame (map-side partial combine absorbs the volume), zero driver
    state.

    Completes the sketch family (KMV distinct / CMS frequency / Bloom
    membership) with rank queries: `quantile_query` reads quantiles
    off the artifact with rank error ZERO at bucket granularity and
    value error bounded by the bucket's true [lo_v, hi_v] span —
    honest, engine-replayable error bars, unlike an opaque digest.
    `lo`/`hi`/`n_buckets` are the sketch's identity (like KMV's k):
    only same-grid sketches merge. Values outside [lo, hi] clamp into
    the edge buckets; NULLs are skipped, and so are non-finite values
    (NaN and +/-Infinity) — floor(NaN) would bucket the row while
    Spark min/max PROPAGATE NaN into lo_v/hi_v, poisoning every
    downstream quantile_query (and a streaming gate calibrated off it
    would cut at NaN and keep zero rows); an Infinity clamps into an
    edge bucket but then min/max propagates it into lo_v/hi_v, so
    quantile_query returns Infinity and a calibrated gate cuts at
    Infinity — silently keeping ALL rows (+Inf) or none (-Inf), the
    mirror failure. A non-finite value is "no rank information",
    exactly like a NULL.
    Mergeable exactly:
    merge(sketch(A), sketch(B)) == sketch(A ++ B) (counts add, bounds
    min/max — pytest + oracle certified), so per-batch sketches
    accumulate across snapshots and streams
    (`streaming.quantile_sketch_batch_writer`)."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    if not hi > lo:
        raise ValueError("need hi > lo")
    v = F.col(col).cast("double")
    return (
        df.filter(
            v.isNotNull() & ~F.isnan(v)
            & (F.abs(v) != F.lit(float("inf")))
        )
        .groupBy(_qs_bucket(col, lo, hi, n_buckets).alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min(v).alias("lo_v"),
            F.max(v).alias("hi_v"),
        )
    )


def quantile_sketch_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two same-grid quantile sketches: counts add, bounds
    min/max — exactly the sketch of the concatenated data. Inputs are
    sketch-sized (<= n_buckets rows each)."""
    u = a.select("bucket", "n", "lo_v", "hi_v").unionByName(
        b.select("bucket", "n", "lo_v", "hi_v")
    )
    return u.groupBy("bucket").agg(
        F.sum("n").cast("long").alias("n"),
        F.min("lo_v").alias("lo_v"),
        F.max("hi_v").alias("hi_v"),
    )


def quantile_sketch_compact(sketch: DataFrame) -> DataFrame:
    """Canonicalize an append-only quantile-sketch log (the output of
    `streaming.quantile_sketch_batch_writer`, one partial sketch per
    micro-batch) back to <= n_buckets rows. A replayed batch appends
    byte-identical rows (the per-batch sketch is deterministic), so
    the (batch_id, bucket) dedup makes compaction effectively
    exactly-once."""
    if "batch_id" in sketch.columns:
        sketch = sketch.dropDuplicates(["batch_id", "bucket"])
    return sketch.groupBy("bucket").agg(
        F.sum("n").cast("long").alias("n"),
        F.min("lo_v").alias("lo_v"),
        F.max("hi_v").alias("hi_v"),
    )


def quantile_query(
    sketch: DataFrame,
    fractions: list[float],
) -> DataFrame:
    """Quantiles off a (compacted) quantile sketch: for each fraction
    q, rank = max(1, ceil(q * N)) (the `stats.exact_quantiles` rank
    convention), located by cumulative count over bucket order. Emits
    (q, rank, bucket, lo_v, hi_v, estimate): [lo_v, hi_v] is the TRUE
    value interval containing the rank-th value (the sketch's honest
    error bar) and `estimate` interpolates linearly inside it —
    lo_v + (hi_v - lo_v) * (rank - cum_before) / n — a fixed IEEE
    expression, engine-replayable. All work happens on the
    <= n_buckets sketch rows: the window sort is bounded by the grid,
    never by the data."""
    if not fractions:
        raise ValueError("fractions must be non-empty")
    if any(not 0 < q <= 1 for q in fractions):
        raise ValueError("fractions must be in (0, 1]")
    # defensively canonicalize: an uncompacted append log (multiple
    # rows per bucket) would put duplicate bucket values under the
    # cumulative window and misplace ranks; compaction is a no-op on
    # an already-canonical sketch and costs one tiny aggregation
    sketch = quantile_sketch_compact(sketch)
    spark = sketch.sparkSession
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = sketch.select(
        "bucket", "n", "lo_v", "hi_v", F.sum("n").over(w).alias("cum")
    )
    total = cum.agg(F.max("cum").alias("N"))
    qs = spark.createDataFrame([(float(q),) for q in fractions], "q double")
    ranked = qs.crossJoin(F.broadcast(total)).select(
        "q",
        F.greatest(
            F.ceil(F.col("q") * F.col("N")), F.lit(1)
        ).cast("long").alias("rank"),
    )
    hit = (
        ranked.join(
            cum,
            (F.col("cum") >= F.col("rank"))
            & (F.col("cum") - F.col("n") < F.col("rank")),
        )
    )
    within = (F.col("rank") - (F.col("cum") - F.col("n"))).cast("double") / \
        F.col("n").cast("double")
    return hit.select(
        "q", "rank", "bucket", "lo_v", "hi_v",
        (F.col("lo_v") + (F.col("hi_v") - F.col("lo_v")) * within)
        .alias("estimate"),
    )


def kmv_overlap(
    a: DataFrame,
    b: DataFrame,
    *,
    k: int = 1024,
    group_by: list[str] | None = None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Set-OVERLAP estimation from two KMV sketches (same k, same hash
    channel) — the Beyer et al. 2007 multiset-operation estimator, and
    the missing third operation of the sketch algebra (union via
    `kmv_merge`, distinct via `kmv_estimate`, now intersection):
    per group,

      rho        = among the combined sketch's k smallest hashes, how
                   many appear in BOTH input sketches
      jaccard    ~= rho / k'          (k' = combined sketch size)
      |A ∩ B|   ~= jaccard * |A ∪ B|  (union from the KMV estimator)

    The cross-snapshot instrument 100-TB pipelines want weekly: "how
    much of today's crawl is yesterday's" or "how many benchmark keys
    leak into the corpus" WITHOUT touching raw keys — both sides are
    k-row artifacts. Sketches exhaustive below k make every output
    EXACT (the kmv_estimate contract). All derived values are integer
    arithmetic (`div`) over exact longs — plus the one certified
    correctly-rounded double divide inside the union estimator — so
    the md5 channel replays engine-exact.

    Returns (group_by..., k_used, rho, union_est, jaccard_ppm,
    inter_est); groups present in only ONE sketch still report
    (rho = 0, inter_est = 0 — nothing shared)."""
    if k < 2:
        raise ValueError("k must be >= 2")
    groups = list(group_by or [])
    merged = kmv_merge(a, b, k=k, group_by=groups)
    fa = a.select(*groups, "h").distinct().withColumn("__ina", F.lit(1))
    fb = b.select(*groups, "h").distinct().withColumn("__inb", F.lit(1))
    j = (
        merged.join(fa, groups + ["h"], "left")
        .join(fb, groups + ["h"], "left")
    )
    agg = j.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("long").alias("k_used"),
        F.sum(
            (F.col("__ina").isNotNull() & F.col("__inb").isNotNull())
            .cast("long")
        ).cast("long").alias("rho"),
        F.max("h").alias("__kth"),
    )
    if hash_fn == "md5":
        est = F.floor(
            F.lit(k - 1) * F.lit(float(_MD5_SPACE))
            / F.col("__kth").cast("double")
        )
    elif hash_fn == "xxhash64":
        u = (F.col("__kth").cast("double") + F.lit(float(2 ** 63) + 1.0)) / \
            F.lit(float(2 ** 64))
        est = F.floor(F.lit(float(k - 1)) / u)
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}; use 'md5' or 'xxhash64'")
    union_est = F.when(F.col("k_used") < k, F.col("k_used")).otherwise(
        est
    ).cast("long")
    out = agg.select(
        *groups, "k_used", "rho", union_est.alias("union_est")
    )
    return out.select(
        *groups, "k_used", "rho", "union_est",
        F.expr("1000000 * rho div k_used").cast("long").alias("jaccard_ppm"),
        F.expr("rho * union_est div k_used").cast("long").alias("inter_est"),
    )
