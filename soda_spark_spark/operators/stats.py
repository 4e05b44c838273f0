"""Scale-safe exact order statistics and quantiles.

Spark's exact `percentile` aggregate materializes every value of a
group in ONE aggregation buffer — fine at certification scale, an
executor OOM at 100 TB (the scan engine exposes `approx_percentiles`
as its scale escape). These operators compute EXACT order statistics
with bounded state at any size: range-bucket histogram passes (one
tiny-output aggregation each), a driver-side cumsum over <= n_buckets
rows, and a final distinct-value window over one bounded bucket — the
`assign_shards` cumsum idiom (packing.py) applied to quantiles. Used
internally by `lm.perplexity_buckets` for the CCNet tier cuts and
exposed here as `exact_quantiles`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _order_statistic(
    scores: DataFrame,
    col: str,
    rank: int,
    lo: float,
    hi: float,
    *,
    n_buckets: int = 4096,
    exact_rows: int = 65536,
    max_refine: int = 8,
) -> float:
    """Exact `rank`-th smallest value of double column `col` (1-based,
    multiset order statistic) by iterative range-bucket histogram
    refinement — the `assign_shards` cumsum idiom (packing.py) applied
    to quantiles. Each pass is ONE aggregation over the frame: bucket
    the value range into `n_buckets` fixed-width slices, collect the
    tiny (<= n_buckets rows) per-bucket (count, min, max) table, cumsum
    it driver-side to locate the bucket holding the target rank, then
    recurse into that bucket's ACTUAL [min, max] with the residual
    rank. floor((v - lo)/width) is weakly monotone in v for IEEE
    doubles, so buckets are value-ordered and the residual rank is
    exact. Once the boundary bucket holds <= `exact_rows` rows (or
    `max_refine` passes ran), one distinct-value cumsum window over
    that bounded slice finishes exactly. No pass ever materializes
    O(N) rows in one place — per-task state is the n_buckets partial
    map; driver state is n_buckets rows."""
    r = rank
    cur_lo, cur_hi = lo, hi
    for _ in range(max_refine):
        if cur_lo == cur_hi:
            return cur_lo
        width = (cur_hi - cur_lo) / n_buckets
        if not width > 0:
            break  # denormal underflow — adjacent doubles; finish exact
        b = F.least(
            F.greatest(
                F.floor((F.col(col) - F.lit(cur_lo)) / F.lit(width)),
                F.lit(0),
            ),
            F.lit(n_buckets - 1),
        ).cast("int")
        hist = (
            scores.filter(
                (F.col(col) >= F.lit(cur_lo)) & (F.col(col) <= F.lit(cur_hi))
            )
            .groupBy(b.alias("__b"))
            .agg(
                F.count(F.lit(1)).alias("__n"),
                F.min(col).alias("__lo"),
                F.max(col).alias("__hi"),
            )
            .collect()
        )
        hist.sort(key=lambda row: row["__b"])
        cum = 0
        nlo = nhi = None
        ncount = 0
        for row in hist:
            if cum + row["__n"] >= r:
                nlo, nhi, ncount = row["__lo"], row["__hi"], row["__n"]
                r -= cum
                break
            cum += row["__n"]
        if nlo is None:  # defensive: rank beyond range (caller bug)
            raise ValueError(f"rank {rank} exceeds rows in [{lo}, {hi}]")
        if nlo == nhi:
            return nlo
        cur_lo, cur_hi = nlo, nhi
        if ncount <= exact_rows:
            break
    vals = (
        scores.filter(
            (F.col(col) >= F.lit(cur_lo)) & (F.col(col) <= F.lit(cur_hi))
        )
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    w = Window.orderBy(F.asc(col)).rowsBetween(Window.unboundedPreceding, 0)
    return (
        vals.withColumn("__cum", F.sum("__n").over(w))
        .filter(F.col("__cum") >= r)
        .agg(F.min(col).alias("__c"))
        .first()["__c"]
    )

def exact_quantiles(
    df: DataFrame,
    col: str,
    fractions: list[float],
    *,
    n_buckets: int = 4096,
    exact_rows: int = 65536,
) -> DataFrame:
    """EXACT quantiles of a numeric column with bounded state at any
    corpus size. For fraction q the reported value is the order
    statistic at rank max(1, ceil(q * N)) over the N non-null values
    (ties land low — the same deterministic convention as
    `perplexity_buckets`' tier cuts), computed via `_order_statistic`:
    a handful of tiny-output aggregation passes per fraction, never a
    full sort, never an O(N) aggregation buffer (Spark's exact
    `percentile` holds every value of the group in ONE buffer — the
    reason the scan engine's exact path caps out and offers
    `approx_percentiles`; this operator is the exact path that does
    not).

    Each fraction costs ~2-4 aggregation jobs over the column —
    `.persist()` the (narrow) input upstream when its lineage is
    expensive. Values are compared as doubles (cast internally).
    Returns (q double, rank long, value double); empty input returns no
    rows."""
    if not fractions:
        raise ValueError("fractions must be non-empty")
    for q in fractions:
        if not (0 <= q <= 1):
            raise ValueError(f"fraction {q} outside [0, 1]")
    import math

    vals = df.select(F.col(col).cast("double").alias("__x")).filter(
        F.col("__x").isNotNull()
    )
    stats = vals.agg(
        F.count(F.lit(1)).alias("__n"),
        F.min("__x").alias("__lo"),
        F.max("__x").alias("__hi"),
    ).first()
    n = stats["__n"]
    spark = df.sparkSession
    if n == 0:
        return spark.createDataFrame([], "q double, rank long, value double")
    out = []
    for q in fractions:
        rank = max(1, math.ceil(q * n))
        v = _order_statistic(
            vals, "__x", rank, stats["__lo"], stats["__hi"],
            n_buckets=n_buckets, exact_rows=exact_rows,
        )
        out.append((float(q), rank, float(v)))
    return spark.createDataFrame(out, "q double, rank long, value double")


def corr_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pearson correlation for every column pair — the profiling metric
    a data-quality scan reports next to variance (extends the
    reference's numeric metric family, reference
    src/sodaspark/scan.py:292-421, which stops at per-column stats).

    Exactness model (the scan-engine M18/M19 variance contract): all
    sufficient statistics — pairwise n, sums, sums of squares, sum of
    products, each over rows where BOTH columns are non-null (pairwise
    deletion) — accumulate as DECIMAL(38,6) in ONE fused aggregation
    pass (d(d-1)/2 pairs x 6 stats; map-side partial combine; one job,
    no shuffle beyond the final combine). Bit-exact cross-engine replay
    holds for INTEGER-valued (or decimal) inputs, where the per-row
    decimal cast is tie-free; raw DOUBLE inputs are still correct but
    subject to the engines' differing double->decimal tie rounding on
    half-ulp values (quantize first — the certified-row recipe — when
    an external replay must hash-match). The float correlation then
    derives through one pinned expression order,
    (n*Sab - Sa*Sb) / (sqrt(n*Saa - Sa*Sa) * sqrt(n*Sbb - Sb*Sb)),
    so results are bit-replayable in any engine with exact decimal
    sums. Zero-variance columns (or pairs with < 2 complete rows)
    yield NULL, never a division error.

    Returns (col_a, col_b, n, corr) with col_a < col_b in the given
    column order."""
    if len(cols) < 2:
        raise ValueError("corr_matrix needs at least two columns")
    dec = "decimal(38,6)"
    aggs = []
    names = []
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            a, b = cols[i], cols[j]
            both = F.col(a).isNotNull() & F.col(b).isNotNull()
            key = f"{i}_{j}"
            names.append((i, j, a, b))
            aggs += [
                F.sum(F.when(both, 1).otherwise(0)).cast("long")
                .alias(f"n_{key}"),
                F.sum(F.when(both, F.col(a).cast(dec))).alias(f"sa_{key}"),
                F.sum(F.when(both, F.col(b).cast(dec))).alias(f"sb_{key}"),
                F.sum(F.when(both, (F.col(a) * F.col(a)).cast(dec)))
                .alias(f"saa_{key}"),
                F.sum(F.when(both, (F.col(b) * F.col(b)).cast(dec)))
                .alias(f"sbb_{key}"),
                F.sum(F.when(both, (F.col(a) * F.col(b)).cast(dec)))
                .alias(f"sab_{key}"),
            ]
    row = df.agg(*aggs).first()
    out = []
    for i, j, a, b in names:
        key = f"{i}_{j}"
        n = row[f"n_{key}"] or 0
        if n < 2:
            out.append((a, b, n, None))
            continue
        nd = float(n)
        sa = float(row[f"sa_{key}"])
        sb = float(row[f"sb_{key}"])
        saa = float(row[f"saa_{key}"])
        sbb = float(row[f"sbb_{key}"])
        sab = float(row[f"sab_{key}"])
        va = nd * saa - sa * sa
        vb = nd * sbb - sb * sb
        if va <= 0 or vb <= 0:
            out.append((a, b, n, None))
            continue
        import math

        out.append(
            (a, b, n, (nd * sab - sa * sb) / (math.sqrt(va) * math.sqrt(vb)))
        )
    return df.sparkSession.createDataFrame(
        out, "col_a string, col_b string, n long, corr double"
    )


def quantile_buckets(
    df: DataFrame,
    col: str,
    *,
    n_buckets: int,
    bucket_col: str | None = None,
    hist_buckets: int = 4096,
    exact_rows: int = 65536,
) -> DataFrame:
    """Per-row EXACT quantile bucket assignment — the bridge from
    continuous columns to the integer-grid operators (`zorder_key`
    needs integral coordinates; mixture/report tooling needs stable
    deciles): cut the column at the order statistics of integer rank
    ceil(i*N / n_buckets) for i in 1..n_buckets-1 (ties land low, the
    `exact_quantiles` convention, with PURE INTEGER rank arithmetic —
    no float fraction touches the rank), then label each row with the
    count of cuts strictly below its value. Buckets are therefore
    equal-frequency up to ties; a value equal to a cut falls in the
    LOWER bucket, and heavy ties may leave intermediate bucket ids
    empty (the ids stay monotone in the value). NULL values get a
    NULL bucket.

    Scale: the cuts come from `_order_statistic` — bounded-state
    histogram refinement, never a global sort, never an O(N) buffer;
    n_buckets-1 cut probes of a few aggregation jobs each (persist the
    input upstream when its lineage is expensive; n_buckets here is a
    layout knob like 8 or 16, not thousands). The assignment itself is
    a literal-comparison projection in whole-stage codegen — no join,
    no shuffle. Returns the input plus `bucket_col` (int, 0-based,
    default '<col>_qbucket')."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    bucket_col = bucket_col or f"{col}_qbucket"
    from pyspark.storagelevel import StorageLevel

    vals = df.select(F.col(col).cast("double").alias("__x")).filter(
        F.col("__x").isNotNull()
    )
    # every cut is several aggregation passes over `vals` — persist the
    # narrow single-column frame for the probe loop's duration (the
    # probes are eager, so the cache is fully consumed before release)
    vals.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        stats = vals.agg(
            F.count(F.lit(1)).alias("__n"),
            F.min("__x").alias("__lo"),
            F.max("__x").alias("__hi"),
        ).first()
        n = stats["__n"]
        if n == 0:
            return df.withColumn(bucket_col, F.lit(None).cast("int"))
        cuts = []
        for i in range(1, n_buckets):
            rank = max(1, -(-(i * n) // n_buckets))  # ceil(i*N/nb), ints
            cuts.append(
                _order_statistic(
                    vals, "__x", rank, stats["__lo"], stats["__hi"],
                    n_buckets=hist_buckets, exact_rows=exact_rows,
                )
            )
    finally:
        vals.unpersist()
    x = F.col(col).cast("double")
    bucket = F.lit(0)
    for c in cuts:
        bucket = bucket + (x > F.lit(float(c))).cast("int")
    return df.withColumn(
        bucket_col,
        F.when(x.isNotNull(), bucket.cast("int")),
    )


def key_skew(
    df: DataFrame,
    cols: list[str] | tuple[str, ...],
    *,
    k: int = 10,
) -> DataFrame:
    """Hot-key diagnostics for shuffle planning: for each candidate
    join/aggregation key column, the k heaviest values with row count,
    corpus share (integer ppm), and rank. THE question before any
    100-TB join is "does one key own 20% of the table?" — the answer
    decides broadcast vs shuffle vs `salted_join`; this makes it one
    bounded aggregation instead of a failed 4-hour job.

    NULL is reported like any other value (a NULL-heavy key is the
    single most common real-world skew source — NULLs all hash to one
    partition in a plain shuffle join). Values render as strings so
    one report covers heterogeneous columns; share_ppm uses integer
    arithmetic (count * 1e6 div total, total counted over ALL rows
    including NULLs). Ties rank deterministically (count DESC, value
    ASC NULLS FIRST).

    Plan: one groupBy per column (map-side partial combine absorbs the
    hot keys by construction — the aggregation state per task is the
    distinct-value set, and heavy hitters are FEW distinct values) and
    a k-cut window over the per-column counts; output bounded by
    k * len(cols). Returns (column, value, n, share_ppm, rank)."""
    if not cols:
        raise ValueError("key_skew needs at least one column")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    total = df.count()
    parts = []
    for c in cols:
        counts = (
            df.groupBy(F.col(c).cast("string").alias("value"))
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("column", F.lit(c))
        )
        parts.append(counts)
    allc = parts[0]
    for p in parts[1:]:
        allc = allc.unionByName(p)
    w = Window.partitionBy("column").orderBy(
        F.desc("n"), F.asc_nulls_first("value")
    )
    return (
        allc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "column",
            "value",
            "n",
            F.expr(f"n * 1000000 div {max(total, 1)}").alias("share_ppm"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def outlier_report(
    df: DataFrame,
    cols: list[str] | tuple[str, ...],
    *,
    k_iqr: float = 1.5,
) -> DataFrame:
    """Tukey-fence outlier profiling — the scan-adjacent numeric health
    check (the reference's metric family stops at min/max/stddev; the
    question a pipeline owner actually asks is "how many rows sit
    outside the fences, and where are they"): for each column, the
    exact quartiles at integer ranks ceil(N/4) / ceil(3N/4) (ties land
    low — the `exact_quantiles` convention, pure integer rank
    arithmetic), the fences q1 - k*iqr / q3 + k*iqr in one pinned
    double expression order, and the strict-comparison outlier counts.

    Scale: quartiles come from `_order_statistic` (bounded-state
    histogram refinement, 2 probes per column over a persisted
    single-column projection); the outlier counts for EVERY column
    then ride ONE fused aggregation pass (conditional sums, map-side
    combine). Output is len(cols) rows; NULLs don't count as rows or
    outliers; an all-NULL column reports n=0 with NULL quartiles.

    Returns (column, n, q1, q3, lo_fence, hi_fence, n_below, n_above).
    """
    from pyspark.storagelevel import StorageLevel

    if not cols:
        raise ValueError("outlier_report needs at least one column")
    if k_iqr < 0:
        raise ValueError(f"k_iqr must be >= 0, got {k_iqr}")
    fences: dict[str, tuple] = {}
    for c in cols:
        vals = df.select(F.col(c).cast("double").alias("__x")).filter(
            F.col("__x").isNotNull()
        )
        vals.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            st = vals.agg(
                F.count(F.lit(1)).alias("__n"),
                F.min("__x").alias("__lo"),
                F.max("__x").alias("__hi"),
            ).first()
            n = st["__n"]
            if n == 0:
                fences[c] = (0, None, None, None, None)
                continue
            q1 = _order_statistic(
                vals, "__x", (n + 3) // 4, st["__lo"], st["__hi"]
            )
            q3 = _order_statistic(
                vals, "__x", (3 * n + 3) // 4, st["__lo"], st["__hi"]
            )
            iqr = q3 - q1
            fences[c] = (n, q1, q3, q1 - k_iqr * iqr, q3 + k_iqr * iqr)
        finally:
            vals.unpersist()
    aggs = []
    for c in cols:
        n, q1, q3, lo, hi = fences[c]
        x = F.col(c).cast("double")
        if n == 0:
            aggs.append(F.lit(0).cast("long").alias(f"__b_{c}"))
            aggs.append(F.lit(0).cast("long").alias(f"__a_{c}"))
        else:
            aggs.append(
                F.sum((x < F.lit(lo)).cast("long")).alias(f"__b_{c}")
            )
            aggs.append(
                F.sum((x > F.lit(hi)).cast("long")).alias(f"__a_{c}")
            )
    counts = df.agg(*aggs).first()
    spark = df.sparkSession
    rows = []
    for c in cols:
        n, q1, q3, lo, hi = fences[c]
        rows.append(
            (
                c,
                int(n),
                q1,
                q3,
                lo,
                hi,
                int(counts[f"__b_{c}"] or 0),
                int(counts[f"__a_{c}"] or 0),
            )
        )
    return spark.createDataFrame(
        rows,
        "column string, n long, q1 double, q3 double, lo_fence double, "
        "hi_fence double, n_below long, n_above long",
    )
