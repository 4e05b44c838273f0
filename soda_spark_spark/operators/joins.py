"""Temporal join operators Spark lacks natively: as-of join, sessionization.

Both are implemented as compositions of existing DataFrame ops (SURVEY §2.4
extension rule: composition first, Pandas UDF only when semantics demand) —
union + last_value window for as-of, lag/cumsum windows for sessions. Both
shuffle once on the join/session key and scale linearly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by: str | None = None,
    right_by: str | None = None,
    value_cols: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, attach the most recent right row with
    right.on <= left.on (direction='backward'; 'forward' = earliest
    right.on >= left.on), optionally per `by` key.

    Spark-first implementation (no per-key Python, no range cross-join):
    union both sides tagged, then a single `last_value(ignorenulls)` running
    window ordered by (key, time, side) fills each left row with the
    applicable right row. One shuffle on the key; ties between right rows at
    the same timestamp resolve to the LAST in (time, side) order, so
    pre-deduplicate the right side if that matters.

    Scale contract: with a `by` key the window partitions by key and the
    plan scales linearly (one shuffle on the key). WITHOUT a key the running
    window is a single global partition — every row lands on ONE task, which
    is fine for small reference joins but a scale-killer on large inputs, so
    keyless calls emit a RuntimeWarning. `right_by` only renames the right
    side's key column and therefore requires `by`.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if right_by is not None and by is None:
        raise ValueError(
            "right_by requires by: right_by only renames the right side's "
            "join key; without a left-side key the union has no key column"
        )
    if by is None:
        import warnings

        warnings.warn(
            "asof_join without `by` runs the running-fill window in a "
            "single global partition (one task) — only use keyless mode on "
            "small inputs",
            RuntimeWarning,
            stacklevel=2,
        )
    right_by = right_by or by
    value_cols = value_cols or [
        c for c in right.columns if c not in {right_by, on}
    ]

    rval = F.struct(*[F.col(c) for c in value_cols])
    r = right.select(
        *( [F.col(right_by).alias("__by")] if right_by else [] ),
        F.col(on).alias("__t"),
        rval.alias("__rval"),
        F.lit(0).alias("__side"),
    )
    lcols = [c for c in left.columns]
    l = left.select(
        *( [F.col(by).alias("__by")] if by else [] ),
        F.col(on).alias("__t"),
        F.lit(None).cast(r.schema["__rval"].dataType).alias("__rval"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in lcols]).alias("__lrow"),
    )
    r = r.withColumn("__lrow", F.lit(None).cast(l.schema["__lrow"].dataType))
    unioned = r.unionByName(l)

    keys = ["__by"] if by or right_by else []
    if direction == "backward":
        # right rows sort before left at equal time -> inclusive (rt <= lt)
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.asc("__t"), F.asc("__side"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = F.last("__rval", ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.desc("__t"), F.asc("__side"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = F.last("__rval", ignorenulls=True).over(w)

    out = (
        unioned.withColumn("__matched", filled)
        .filter(F.col("__side") == 1)
        .select(
            *[F.col("__lrow")[c].alias(c) for c in lcols],
            *[F.col("__matched")[c].alias(c) for c in value_cols],
        )
    )
    return out


def sessionize(
    events: DataFrame,
    *,
    user_col: str,
    ts_col: str,
    gap: Column | int,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Assign session ids: a new session starts when the gap since the
    user's previous event exceeds `gap` (same units as ts_col — pass an
    integer of nanos/micros for numeric timestamps, or an INTERVAL-producing
    Column expression for timestamp columns).

    Classic lag + cumulative-sum windows: one shuffle on the user key.
    Returns the input plus `session_idx` (0-based per user).
    """
    order = [F.asc(ts_col)] + ([F.asc(order_tiebreak)] if order_tiebreak else [])
    w_lag = Window.partitionBy(user_col).orderBy(*order)
    w_cum = (
        Window.partitionBy(user_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    gap_lit = F.lit(gap) if isinstance(gap, int) else gap
    prev = F.lag(F.col(ts_col)).over(w_lag)
    new_session = F.when(
        prev.isNull() | ((F.col(ts_col) - prev) > gap_lit), 1
    ).otherwise(0)
    return events.withColumn(
        "session_idx", F.sum(new_session).over(w_cum) - 1
    )


def session_stats(
    events: DataFrame,
    *,
    user_col: str,
    ts_col: str,
    gap: Column | int,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Per-session rollup: (user, session_idx, n_events, session_start/end)."""
    s = sessionize(
        events, user_col=user_col, ts_col=ts_col, gap=gap, order_tiebreak=order_tiebreak
    )
    return s.groupBy(user_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    *,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Skew-resistant equi-join: salt the LEFT (large, skewed) side's key
    with a random-free deterministic shard id and EXPLODE the right side
    across all shards, so one hot key's rows spread over `salt` reducers
    instead of landing on a single straggler task.

    Semantics are identical to `left.join(right, on, how)` for 'inner' and
    'left' joins. The right side is replicated `salt` times — use for a
    moderate-size dimension against a skewed fact; for small dimensions use
    `F.broadcast`, and for two huge sides prefer AQE's skew-join handling
    (`spark.sql.adaptive.skewJoin.enabled`) which salts only the skewed
    partitions at runtime. This operator is the EXPLICIT fallback for when
    neither applies (e.g. the skewed key set is known and stable).

    The shard id is xxhash64 of the whole left row (not rand()), keeping the
    join deterministic and retry-safe (a recomputed task re-salts the same
    way; rand() would violate exactly-once under task retries).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left'")
    keys = [on] if isinstance(on, str) else list(on)
    shard = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    l = left.withColumn("__shard", shard)
    r = right.withColumn(
        "__shard", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = l.join(r, keys + ["__shard"], how)
    return out.drop("__shard")
