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
    multiset order statistic). Single-rank convenience wrapper over
    `_order_statistics` — see there for the algorithm and state
    bounds."""
    return _order_statistics(
        scores, col, [rank], lo, hi,
        n_buckets=n_buckets, exact_rows=exact_rows, max_refine=max_refine,
    )[0]


def _order_statistics(
    scores: DataFrame,
    col: str,
    ranks: list[int],
    lo: float,
    hi: float,
    *,
    n_buckets: int = 4096,
    exact_rows: int = 65536,
    max_refine: int = 8,
) -> list[float]:
    """Exact order statistics for EVERY 1-based rank in `ranks` (one
    value each, multiset order) by iterative range-bucket histogram
    refinement — the `assign_shards` cumsum idiom (packing.py) applied
    to quantiles, BATCHED so that each refinement LEVEL is ONE
    aggregation job shared by every still-unresolved rank (a quantile
    caller probing q cuts pays ~2-4 jobs total instead of ~2-4 per
    cut — at any scale each job is a full pass over the frame, so the
    batching is a pass-count, not a constant-factor, win).

    Per level: every unresolved rank owns a value range; ranges of
    different ranks at the same level are IDENTICAL or DISJOINT by
    construction (each is one histogram bucket's actual [min, max] of
    the shared parent range), so identical ranges dedup into segments
    and one CASE expression assigns each row a (segment, bucket) cell.
    One aggregation collects the tiny (count, min, max) table for all
    segments at once; a driver-side cumsum per segment locates each
    rank's bucket and residual rank exactly (floor((v - lo)/width) is
    weakly monotone in v for IEEE doubles, so buckets are
    value-ordered). A rank whose bucket has min == max resolves; one
    whose bucket holds <= `exact_rows` rows freezes for the exact
    finish; the rest refine into their bucket's [min, max].

    The exact finish for ALL frozen ranks is one distinct-value cumsum
    window partitioned by segment over the union of the bounded slices
    plus one conditional-min aggregation — two jobs regardless of how
    many ranks finish. No pass ever materializes O(N) rows in one
    place: per-task state is the (segments x n_buckets) partial map,
    driver state the same count of rows.

    The per-rank arithmetic (initial range, widths, residual ranks,
    tie convention) is bit-identical to refining each rank alone."""
    results: dict[int, float] = {}
    # unresolved rank index -> (cur_lo, cur_hi, residual rank)
    state: dict[int, tuple[float, float, int]] = {
        i: (lo, hi, r) for i, r in enumerate(ranks)
    }
    # ranks whose range is frozen for the bounded exact finish
    frozen: dict[int, tuple[float, float, int]] = {}
    for _ in range(max_refine):
        for i in list(state):
            cur_lo, cur_hi, _r = state[i]
            if cur_lo == cur_hi:
                results[i] = cur_lo
                del state[i]
        if not state:
            break
        # dedup identical ranges into segments; width <= 0 (denormal
        # underflow — adjacent doubles) freezes for the exact finish
        segs: dict[tuple[float, float], list[int]] = {}
        for i, (cur_lo, cur_hi, _r) in state.items():
            segs.setdefault((cur_lo, cur_hi), []).append(i)
        live: list[tuple[float, float, float]] = []  # (lo, hi, width)
        for (seg_lo, seg_hi), idxs in sorted(segs.items()):
            width = (seg_hi - seg_lo) / n_buckets
            if not width > 0:
                for i in idxs:
                    frozen[i] = state.pop(i)
            else:
                live.append((seg_lo, seg_hi, width))
        if not state:
            break
        # ONE histogram aggregation over the union of live segments:
        # cell id = segment * n_buckets + fixed-width bucket in segment
        pred = None
        cell = None
        for sid, (seg_lo, seg_hi, width) in enumerate(live):
            cond = (F.col(col) >= F.lit(seg_lo)) & (
                F.col(col) <= F.lit(seg_hi)
            )
            pred = cond if pred is None else (pred | cond)
            b = F.least(
                F.greatest(
                    F.floor((F.col(col) - F.lit(seg_lo)) / F.lit(width)),
                    F.lit(0),
                ),
                F.lit(n_buckets - 1),
            ).cast("long")
            g = F.lit(sid).cast("long") * F.lit(n_buckets) + b
            cell = F.when(cond, g) if cell is None else cell.when(cond, g)
        hist = (
            scores.filter(pred)
            .groupBy(cell.alias("__g"))
            .agg(
                F.count(F.lit(1)).alias("__n"),
                F.min(col).alias("__lo"),
                F.max(col).alias("__hi"),
            )
            .collect()
        )
        by_seg: dict[int, list[tuple[int, int, float, float]]] = {}
        for row in hist:
            sid, b = divmod(row["__g"], n_buckets)
            by_seg.setdefault(sid, []).append(
                (b, row["__n"], row["__lo"], row["__hi"])
            )
        for sid, (seg_lo, seg_hi, _w) in enumerate(live):
            buckets = sorted(by_seg.get(sid, []))
            for i in segs[(seg_lo, seg_hi)]:
                if i not in state:
                    continue
                _lo, _hi, r = state[i]
                cum = 0
                nlo = nhi = None
                ncount = 0
                for _b, bn, blo, bhi in buckets:
                    if cum + bn >= r:
                        nlo, nhi, ncount = blo, bhi, bn
                        r -= cum
                        break
                    cum += bn
                if nlo is None:  # defensive: rank beyond range (caller bug)
                    raise ValueError(
                        f"rank {ranks[i]} exceeds rows in [{lo}, {hi}]"
                    )
                if nlo == nhi:
                    results[i] = nlo
                    del state[i]
                    continue
                state[i] = (nlo, nhi, r)
                if ncount <= exact_rows:
                    frozen[i] = state.pop(i)
    frozen.update(state)  # max_refine exhausted: finish exact as-is
    if frozen:
        segs = {}
        for i, (cur_lo, cur_hi, _r) in frozen.items():
            segs.setdefault((cur_lo, cur_hi), []).append(i)
        seg_list = sorted(segs)
        pred = None
        sexpr = None
        for sid, (seg_lo, seg_hi) in enumerate(seg_list):
            cond = (F.col(col) >= F.lit(seg_lo)) & (
                F.col(col) <= F.lit(seg_hi)
            )
            pred = cond if pred is None else (pred | cond)
            sexpr = (
                F.when(cond, F.lit(sid))
                if sexpr is None
                else sexpr.when(cond, F.lit(sid))
            )
        vals = (
            scores.filter(pred)
            .groupBy(sexpr.alias("__s"), F.col(col))
            .agg(F.count(F.lit(1)).alias("__n"))
        )
        w = (
            Window.partitionBy("__s")
            .orderBy(F.asc(col))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cum_df = vals.withColumn("__cum", F.sum("__n").over(w))
        flat = [
            (i, sid)
            for sid, key in enumerate(seg_list)
            for i in segs[key]
        ]
        aggs = [
            F.min(
                F.when(
                    (F.col("__s") == F.lit(sid))
                    & (F.col("__cum") >= F.lit(frozen[i][2])),
                    F.col(col),
                )
            ).alias(f"__c{j}")
            for j, (i, sid) in enumerate(flat)
        ]
        row = cum_df.agg(*aggs).first()
        for j, (i, _sid) in enumerate(flat):
            results[i] = row[f"__c{j}"]
    return [results[i] for i in range(len(ranks))]

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
    ranks = [max(1, math.ceil(q * n)) for q in fractions]
    vs = _order_statistics(
        vals, "__x", ranks, stats["__lo"], stats["__hi"],
        n_buckets=n_buckets, exact_rows=exact_rows,
    )
    out = [
        (float(q), rank, float(v))
        for q, rank, v in zip(fractions, ranks, vs)
    ]
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
        ranks = [
            max(1, -(-(i * n) // n_buckets))  # ceil(i*N/nb), ints
            for i in range(1, n_buckets)
        ]
        cuts = _order_statistics(
            vals, "__x", ranks, stats["__lo"], stats["__hi"],
            n_buckets=hist_buckets, exact_rows=exact_rows,
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
            q1, q3 = _order_statistics(
                vals, "__x", [(n + 3) // 4, (3 * n + 3) // 4],
                st["__lo"], st["__hi"],
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
