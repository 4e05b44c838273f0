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
