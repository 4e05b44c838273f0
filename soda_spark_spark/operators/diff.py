"""Snapshot diff: audit two versions of a keyed table.

The iteration loop of a training corpus — recrawl, refilter, rededup —
needs to answer "what changed since the last snapshot" without hand-written
joins: how many rows appeared, vanished, or changed, and WHICH columns
drive the churn. Both operators are single full-outer joins on the key
(one shuffle each side, AQE-broadcast when one snapshot is small) with
null-safe struct comparison — no UDFs, no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sides(
    old: DataFrame, new: DataFrame, key_cols: list[str], compare_cols
) -> tuple[DataFrame, list[str]]:
    if compare_cols is None:
        compare_cols = [
            c
            for c in new.columns
            if c in set(old.columns) and c not in set(key_cols)
        ]
    if not compare_cols:
        raise ValueError("no shared non-key columns to compare")
    o = old.select(
        *key_cols, F.struct(*[F.col(c) for c in compare_cols]).alias("__o")
    )
    n = new.select(
        *key_cols, F.struct(*[F.col(c) for c in compare_cols]).alias("__n")
    )
    return o.join(n, key_cols, "full_outer"), list(compare_cols)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key diff classification between two snapshots.

    Returns (key_cols..., status) with status in
    {'added', 'removed', 'changed', 'unchanged'} — added/removed by key
    presence, changed by null-safe struct inequality over
    `compare_cols` (default: all shared non-key columns). Keys must be
    unique per snapshot (it's a keyed table diff, not a multiset diff).
    """
    j, _ = _sides(old, new, key_cols, compare_cols)
    status = (
        F.when(F.col("__o").isNull(), F.lit("added"))
        .when(F.col("__n").isNull(), F.lit("removed"))
        .when(F.col("__o").eqNullSafe(F.col("__n")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(*key_cols, status.alias("status"))


def snapshot_diff_summary(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """One-row churn summary: counts per status plus, for keys present in
    BOTH snapshots, a per-column changed-count (`changed_<col>`) showing
    which columns drive the churn. Exact integer aggregates only —
    order-independent and engine-exact."""
    j, cols = _sides(old, new, key_cols, compare_cols)
    both = F.col("__o").isNotNull() & F.col("__n").isNotNull()
    aggs = [
        F.sum(F.col("__o").isNull().cast("long")).alias("added"),
        F.sum(F.col("__n").isNull().cast("long")).alias("removed"),
        F.sum(
            (both & ~F.col("__o").eqNullSafe(F.col("__n"))).cast("long")
        ).alias("changed"),
        F.sum(
            (both & F.col("__o").eqNullSafe(F.col("__n"))).cast("long")
        ).alias("unchanged"),
    ]
    for c in cols:
        aggs.append(
            F.sum(
                (
                    both
                    & ~F.col("__o").getField(c).eqNullSafe(
                        F.col("__n").getField(c)
                    )
                ).cast("long")
            ).alias(f"changed_{c}")
        )
    return j.agg(*aggs)
