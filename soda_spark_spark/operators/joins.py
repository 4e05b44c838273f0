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
    num_buckets: int = 64,
    tolerance: int | float | None = None,
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
    plan scales linearly (one shuffle on the key). WITHOUT a key, the fill
    runs as a range-bucketed two-pass over `num_buckets` time buckets
    (fixed-width over [min, max] of the time column): pass 1 computes each
    bucket's boundary right-row and a tiny cross-bucket carry table
    (`num_buckets` rows), pass 2 runs the running fill per bucket seeded
    with the carry — the fill stage is `num_buckets`-way parallel instead
    of one global task, and the result is identical for any bucketing
    (bucket boundaries respect time order, so the carry is exactly the
    latest earlier-bucket right row). Supported time types for keyless
    mode: numeric, timestamp (tz/ntz), date (fixed-width ranges) and
    string (sampled range boundaries); other orderable types fall back
    to the single-partition window with a RuntimeWarning. `right_by`
    only renames the right side's key column and therefore requires `by`.

    `tolerance` (pandas merge_asof parity) bounds the match gap: a
    matched right row further than `tolerance` from the left time yields
    NULL values instead. Units: the `on` column's own units for numeric,
    MICROSECONDS for timestamp columns, DAYS for dates; strings and
    other types raise. Applied as a post-fill predicate — the fill plan
    is unchanged.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if right_by is not None and by is None:
        raise ValueError(
            "right_by requires by: right_by only renames the right side's "
            "join key; without a left-side key the union has no key column"
        )
    right_by = right_by or by
    value_cols = value_cols or [
        c for c in right.columns if c not in {right_by, on}
    ]

    rval = F.struct(*[F.col(c) for c in value_cols], F.col(on).alias("__rt"))
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

    # right rows sort before left at equal time -> inclusive (rt <= lt)
    order = (
        (F.asc("__t"), F.asc("__side"))
        if direction == "backward"
        else (F.desc("__t"), F.asc("__side"))
    )
    if by or right_by:
        w = (
            Window.partitionBy("__by")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled_df = unioned.withColumn(
            "__matched", F.last("__rval", ignorenulls=True).over(w)
        )
    else:
        filled_df = _keyless_range_fill(
            unioned, direction=direction, num_buckets=num_buckets, order=order
        )

    matched = F.col("__matched")
    if tolerance is not None:
        from pyspark.sql import types as T

        dt = dict(left.dtypes)[on]
        lt, rt = F.col("__t"), matched["__rt"]
        field = left.schema[on].dataType
        if isinstance(field, T.NumericType):
            gap = lt - rt if direction == "backward" else rt - lt
        elif isinstance(field, T.TimestampType):
            lt_us, rt_us = F.unix_micros(lt), F.unix_micros(rt)
            gap = lt_us - rt_us if direction == "backward" else rt_us - lt_us
        elif isinstance(field, T.TimestampNTZType):
            # NTZ is a wall clock with no instant: casting through the
            # session-tz TIMESTAMP would collapse/shift values at DST
            # transitions (non-monotonic at fall-back, 1h skew at
            # spring-forward), so the gap near the tolerance boundary
            # would be wrong. Decompose the wall-clock fields instead —
            # tz-independent, exact to the microsecond, pre-epoch safe.
            def _ntz_us(c: Column) -> Column:
                return (
                    F.unix_date(c.cast("date")).cast("long")
                    * F.lit(86_400_000_000)
                    + F.hour(c).cast("long") * F.lit(3_600_000_000)
                    + F.minute(c).cast("long") * F.lit(60_000_000)
                    + F.second(c).cast("long") * F.lit(1_000_000)
                    + F.date_format(c, "SSSSSS").cast("long")
                )

            lt_us, rt_us = _ntz_us(lt), _ntz_us(rt)
            gap = lt_us - rt_us if direction == "backward" else rt_us - lt_us
        elif isinstance(field, T.DateType):
            gap = (
                F.datediff(lt, rt)
                if direction == "backward"
                else F.datediff(rt, lt)
            )
        else:
            raise ValueError(
                f"tolerance is not supported for a {dt} `on` column "
                "(numeric, timestamp, or date required)"
            )
        matched = F.when(matched.isNotNull() & (gap <= tolerance), matched)
    out = (
        filled_df
        .filter(F.col("__side") == 1)
        .select(
            *[F.col("__lrow")[c].alias(c) for c in lcols],
            *[matched[c].alias(c) for c in value_cols],
        )
    )
    return out


def _keyless_range_fill(
    unioned: DataFrame,
    *,
    direction: str,
    num_buckets: int,
    order: tuple,
) -> DataFrame:
    """Distributed running fill for the KEYLESS as-of join.

    Buckets the time axis into `num_buckets` fixed-width ranges (one cheap
    min/max job), then:
    pass 1 — per-bucket boundary: the right row a later bucket would need
    (latest right row per bucket for backward, earliest for forward), and a
    `num_buckets`-row carry table where carry[b] = the boundary row of the
    nearest earlier (backward) / later (forward) non-empty bucket;
    pass 2 — the usual running `last(ignorenulls)` window, partitioned BY
    BUCKET (parallel), seeded via coalesce with the broadcast carry.

    Bucketing is a monotonic map of the time value, so every cross-bucket
    predecessor is correctly summarized by the carry and the output is
    bucketing-invariant. The sources are scanned an extra time for the
    min/max and boundary passes — the price of turning the fill stage from
    one global task into `num_buckets` parallel ones. String time axes
    bucket via sampled boundaries (RangePartitioner-style) instead of
    fixed-width ranges. Degenerate ranges (empty input, single distinct
    time) and remaining time types fall back to the single-partition
    window (with a RuntimeWarning for the latter).
    """
    from pyspark.sql import types as T

    def _single_partition() -> DataFrame:
        w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
        return unioned.withColumn(
            "__matched", F.last("__rval", ignorenulls=True).over(w)
        )

    dt = unioned.schema["__t"].dataType
    tb = None
    if isinstance(dt, T.NumericType):
        tb = F.col("__t").cast("double")
    elif isinstance(dt, T.TimestampType):
        tb = F.unix_micros(F.col("__t")).cast("double")
    elif isinstance(dt, T.TimestampNTZType):
        # session-tz reinterpretation is monotonic, which is all bucketing needs
        tb = F.unix_micros(F.col("__t").cast("timestamp")).cast("double")
    elif isinstance(dt, T.DateType):
        tb = F.datediff(F.col("__t"), F.lit("1970-01-01")).cast("double")
    elif not isinstance(dt, T.StringType):
        import warnings

        warnings.warn(
            f"asof_join without `by` on a {dt.simpleString()} time column "
            "runs the running-fill window in a single global partition "
            "(one task) — use a numeric/timestamp/date/string `on` column "
            "for the distributed keyless path",
            RuntimeWarning,
            stacklevel=3,
        )
        return _single_partition()

    if tb is not None:
        tagged = unioned.withColumn("__tb", tb)
        lo, hi = tagged.agg(F.min("__tb"), F.max("__tb")).first()
        if lo is None or not hi > lo:
            return _single_partition()
        width = (hi - lo) / num_buckets
        tagged = tagged.withColumn(
            "__bkt",
            F.least(
                F.floor((F.col("__tb") - F.lit(lo)) / F.lit(width)),
                F.lit(num_buckets - 1),
            ).cast("int"),
        ).drop("__tb")
    else:
        # String time axis: fixed-width ranges don't exist, so derive the
        # bucket map RangePartitioner-style — sample boundary values, and
        # assign bucket = number of boundaries strictly below the value
        # (Python's and Spark's string orderings agree: both compare by
        # code point / UTF-8 byte order). Correctness never depends on the
        # sample: ANY boundary set yields a monotonic bucket map, so the
        # carry summarizes cross-bucket predecessors exactly; the sample
        # quality only balances bucket sizes.
        nn = unioned.filter(F.col("__t").isNotNull()).select("__t")
        n = nn.count()
        if n < 2:
            return _single_partition()
        frac = min(1.0, (num_buckets * 100.0) / n)
        sampled = sorted(
            {r[0] for r in nn.sample(fraction=frac, seed=42).collect()}
        )
        step = max(1, len(sampled) // num_buckets)
        bounds = sampled[step::step][: num_buckets - 1]
        if not bounds:
            return _single_partition()
        bkt = None
        for b in bounds:
            term = (F.col("__t") > F.lit(b)).cast("int")
            bkt = term if bkt is None else bkt + term
        tagged = unioned.withColumn("__bkt", bkt.cast("int"))

    if direction == "backward":
        wsum = Window.partitionBy("__bkt").orderBy(F.desc("__t"))
        carry_w = Window.orderBy(F.asc("__bkt")).rowsBetween(
            Window.unboundedPreceding, -1
        )
    else:
        wsum = Window.partitionBy("__bkt").orderBy(F.asc("__t"))
        carry_w = Window.orderBy(F.desc("__bkt")).rowsBetween(
            Window.unboundedPreceding, -1
        )
    boundary = (
        tagged.filter(F.col("__side") == 0)
        .select("__bkt", "__t", "__rval")
        .withColumn("__rn", F.row_number().over(wsum))
        .filter(F.col("__rn") == 1)
        .select("__bkt", F.col("__rval").alias("__brv"))
    )
    spine = unioned.sparkSession.range(num_buckets).select(
        F.col("id").cast("int").alias("__bkt")
    )
    carry = (
        spine.join(boundary, "__bkt", "left")
        .withColumn("__carry", F.last("__brv", ignorenulls=True).over(carry_w))
        .select("__bkt", "__carry")
    )
    w = (
        Window.partitionBy("__bkt")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        tagged.join(F.broadcast(carry), "__bkt", "left")
        .withColumn(
            "__matched",
            F.coalesce(
                F.last("__rval", ignorenulls=True).over(w), F.col("__carry")
            ),
        )
        .drop("__bkt", "__carry")
    )


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


def session_stats_window(
    events: DataFrame,
    *,
    user_col: str,
    ts_col: str,
    gap_us: int,
) -> DataFrame:
    """Per-session rollup via Spark's NATIVE `session_window` operator —
    the engine-managed alternative to the lag+cumsum `session_stats`
    (identical output: user, 0-based session_idx, n_events,
    session_start/end as the min/max event time).

    `ts_col` must be a timestamp column. Boundary alignment: Spark's
    session_window starts a new session when an event lands at or after
    `last + gap`, while `session_stats` keeps an event at exactly
    `last + gap` in the running session (`>` rule); passing the gap as
    `gap_us + 1` microseconds makes the native operator match the `>` rule
    exactly for microsecond-resolution timestamps (pinned by test on a
    boundary-exact fixture). session_window handles the grouping in one
    shuffle; a per-user window ranks the sessions for the 0-based index.
    """
    sw = F.session_window(F.col(ts_col), f"{gap_us + 1} microseconds")
    agg = events.groupBy(sw.alias("__w"), F.col(user_col)).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    )
    w = Window.partitionBy(user_col).orderBy(F.col("__w.start"))
    return agg.select(
        F.col(user_col),
        (F.row_number().over(w) - 1).cast("long").alias("session_idx"),
        "n_events",
        "session_start",
        "session_end",
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


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    on: list[str] | str | None = None,
    how: str = "inner",
    max_buckets_per_interval: int = 10_000,
) -> DataFrame:
    """Point-in-interval join: every `points` row pairs with every
    `intervals` row whose [start_col, end_col] (inclusive both ends)
    contains its `point_col`, optionally also matching equi-keys `on`
    (e.g. user_id). The general range join Spark's optimizer turns into
    a broadcast-nested-loop or cartesian product; this is the
    RANGE-BUCKET formulation that stays an equi-join at any scale:

    - each interval EXPLODES to the coarse buckets it covers
      (floor(start/w) .. floor(end/w));
    - each point tags its single bucket floor(p/w);
    - one hash equi-join on (bucket, *on), then the exact containment
      filter. A (point, interval) pair meets in EXACTLY one bucket (the
      point's), so no post-join dedup is needed.

    Both sides shuffle once on the bucket (+key) hash; the join fan-out
    per interval is its covered-bucket count, so pick `bucket_width` ~
    the typical interval length (1 means every axis unit is a bucket).
    Intervals covering more than `max_buckets_per_interval` buckets
    raise (a mis-sized width silently becomes a self-inflicted
    explode-bomb at 100 TB — size the width, don't raise the cap).

    Columns must be integer-valued (cast timestamps via
    `.cast("long")` upstream — epoch seconds); start > end intervals
    match nothing, and so does an interval with a NULL start or end
    (an unknown bound cannot contain any point — same convention as
    the naive BETWEEN join, which is NULL-false for such rows; without
    the explicit branch a NULL bound would fall through every when()
    arm into the guard's raise_error). how='inner'|'left' (left keeps
    pointless points with NULL interval columns). Point/interval
    column name collisions are the caller's to resolve (select/alias
    upstream)."""
    if how not in ("inner", "left"):
        raise ValueError("interval_join supports how='inner'|'left'")
    if bucket_width < 1:
        raise ValueError("bucket_width must be >= 1")
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    w = F.lit(int(bucket_width))
    lo_b = F.floor(F.col(start_col) / w)
    hi_b = F.floor(F.col(end_col) / w)
    nb = hi_b - lo_b + F.lit(1)
    # guard INSIDE the exploded expression — a guard on a separate,
    # otherwise-unused column would be pruned away by the optimizer
    seq = F.when(
        # NULL bound: matches nothing. MUST be the first branch — NULL
        # comparisons are false in every later arm, so without it a
        # NULL-bounded interval falls through to the raise_error guard.
        F.col(start_col).isNull() | F.col(end_col).isNull(),
        F.array().cast("array<bigint>"),
    ).when(
        F.col(start_col) > F.col(end_col),  # empty interval: matches nothing
        F.array().cast("array<bigint>"),    # (sequence() would DESCEND)
    ).when(
        nb <= F.lit(int(max_buckets_per_interval)), F.sequence(lo_b, hi_b)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("interval_join: an interval covers "),
                nb.cast("string"),
                F.lit(
                    " buckets (> max_buckets_per_interval="
                    f"{int(max_buckets_per_interval)}); raise bucket_width"
                ),
            )
        )
    )
    iv = intervals.withColumn("__bkt", F.explode(seq))
    pt = points.withColumn("__bkt", F.floor(F.col(point_col) / w))
    cond = [pt["__bkt"] == iv["__bkt"]]
    for c in keys:
        cond.append(pt[c] == iv[c])
    cond.append(pt[point_col] >= iv[start_col])
    cond.append(pt[point_col] <= iv[end_col])
    joined = pt.join(iv, cond, how)
    out_cols = [pt[c] for c in points.columns] + [
        iv[c] for c in intervals.columns if c not in keys
    ]
    return joined.select(*out_cols)


def funnel_steps(
    events: DataFrame,
    steps: list[str] | tuple[str, ...],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user funnel progression — the product-analytics staple over
    an event stream: for each user who performed `steps[0]`, the
    earliest time of each subsequent step AT OR AFTER the previous
    step's time (min-qualifying-timestamp semantics: step k's time is
    min ts of a step-k event with ts >= step k-1's time — a later
    step occurring only BEFORE the previous step does not count).
    Users who never reach step k carry NULL from that column on;
    NULL-user or NULL-ts events never participate.

    Plan shape (100-TB audit): one filtered min-aggregate per step,
    every shuffle keyed on `user_col` — after the first exchange the
    per-step joins and aggregates reuse the same hash partitioning, so
    a k-step funnel is one real shuffle plus k-1 co-partitioned
    stages. No window over the raw event stream, no per-user event
    collection: state per user is k timestamps.

    Returns (user_col, step1_ts .. stepK_ts).
    """
    if len(steps) < 2:
        raise ValueError("funnel_steps needs at least two steps")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct event types")
    e = events.select(
        F.col(user_col).alias("__u"),
        F.col(type_col).alias("__t"),
        F.col(ts_col).alias("__ts"),
    ).filter(F.col("__u").isNotNull() & F.col("__ts").isNotNull())
    cur = (
        e.filter(F.col("__t") == steps[0])
        .groupBy("__u")
        .agg(F.min("__ts").alias("step1_ts"))
    )
    for i, st in enumerate(steps[1:], start=2):
        prev = f"step{i - 1}_ts"
        nxt = (
            e.filter(F.col("__t") == st)
            .join(
                cur.select("__u", F.col(prev).alias("__prev")), "__u"
            )
            .filter(F.col("__ts") >= F.col("__prev"))
            .groupBy("__u")
            .agg(F.min("__ts").alias(f"step{i}_ts"))
        )
        cur = cur.join(nxt, "__u", "left")
    return cur.withColumnRenamed("__u", user_col)


def funnel_report(
    events: DataFrame,
    steps: list[str] | tuple[str, ...],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Aggregate funnel conversion over `funnel_steps`: one row per
    step with the users reaching it and integer-ppm conversion rates
    against the entry step and against the previous step (the two
    numbers every funnel dashboard shows). Entry users define the
    denominator; steps no user reached report 0 users and 0 ppm.
    Output is bounded by len(steps) rows."""
    per_user = funnel_steps(
        events, steps,
        user_col=user_col, type_col=type_col, ts_col=ts_col,
    )
    aggs = [
        F.count(F.col(f"step{i}_ts")).alias(f"__n{i}")
        for i in range(1, len(steps) + 1)
    ]
    row = per_user.agg(*aggs)
    spark = events.sparkSession
    names = spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)], "step int, event_type string"
    )
    counts = F.array(*[F.col(f"__n{i}") for i in range(1, len(steps) + 1)])
    exploded = row.select(
        F.posexplode(counts).alias("__i", "users"), counts.alias("__all")
    ).select(
        (F.col("__i") + 1).cast("int").alias("step"),
        F.col("users").cast("long").alias("users"),
        F.element_at("__all", 1).alias("__entry"),
        F.when(F.col("__i") > 0, F.element_at("__all", F.col("__i")))
        .alias("__prevn"),
    )
    out = exploded.select(
        "step",
        "users",
        F.when(
            F.col("__entry") > 0,
            F.expr("users * 1000000 div __entry"),
        ).otherwise(F.lit(0)).cast("long").alias("from_entry_ppm"),
        F.when(
            F.col("__prevn").isNull(),
            F.lit(1_000_000),
        ).when(
            F.col("__prevn") > 0, F.expr("users * 1000000 div __prevn")
        ).otherwise(F.lit(0)).cast("long").alias("from_prev_ppm"),
    )
    return out.join(F.broadcast(names), "step").select(
        "step", "event_type", "users", "from_entry_ppm", "from_prev_ppm"
    )


def retention_cohorts(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset: int = 12,
) -> DataFrame:
    """Weekly cohort retention — funnel analysis' sibling and the other
    product-analytics staple over an event stream: users cohort by the
    Monday-truncated week of their FIRST event; week k's retention is
    the fraction of the cohort active (any event) k weeks later.

    All arithmetic is calendar-deterministic and integral: weeks are
    date_trunc('week') (ISO Monday start in both Spark and standard
    SQL engines), the offset is day-difference DIV 7, and retention is
    integer ppm against the cohort size (offset 0 is the cohort week
    itself — always 1e6 by construction, a useful self-check row).
    Offsets beyond `max_offset` are dropped (bounds the report).

    Plan shape (round 20): distinct (user, week) first — the stream
    compresses to at most |users| * weeks rows before anything else —
    then ONE pass: the cohort week is a min() window over the user
    partition (no separate cohort aggregate, no join back), and the
    cohort SIZE is the report's own offset-0 row (every user is active
    in their first week by construction), read via a max(when) window
    over the cohorts x offsets-bounded report instead of a sizes leg.
    The raw event set is scanned once; no joins anywhere.

    Returns (cohort_week date, week_offset int, users long,
    retention_ppm long).
    """
    if max_offset < 0:
        raise ValueError(f"max_offset must be >= 0, got {max_offset}")
    uw = (
        events.select(
            F.col(user_col).alias("__u"),
            F.to_date(F.date_trunc("week", F.col(ts_col))).alias("__wk"),
        )
        .filter(F.col("__u").isNotNull() & F.col("__wk").isNotNull())
        .distinct()
    )
    return _retention_core(uw, max_offset)


def retention_from_activity(
    activity: DataFrame,
    *,
    user_col: str = "user_id",
    week_col: str = "week",
    max_offset: int = 12,
) -> DataFrame:
    """`retention_cohorts` from a PRE-AGGREGATED (user, week) activity
    set instead of raw events — the shape the streaming maintainer
    (`streaming.activity_week_batch_writer`) persists. Because both
    the cohort (min week per user) and the activity set are exactly
    mergeable (min and set-union), a retention report over the
    append-only activity log equals the one-shot report over all
    events ever ingested — duplicate (user, week) rows (idempotent
    replays, overlapping batches) are collapsed here. Same output
    contract as `retention_cohorts`."""
    if max_offset < 0:
        raise ValueError(f"max_offset must be >= 0, got {max_offset}")
    uw = (
        activity.select(
            F.col(user_col).alias("__u"),
            F.col(week_col).cast("date").alias("__wk"),
        )
        .filter(F.col("__u").isNotNull() & F.col("__wk").isNotNull())
        .distinct()
    )
    return _retention_core(uw, max_offset)


def _retention_core(uw: DataFrame, max_offset: int) -> DataFrame:
    # One pass over the distinct activity set (round 20): the cohort
    # week rides a min() window over the user partition instead of a
    # groupBy+join (which consumed `uw` twice — two source scans — and
    # re-shuffled both sides on the user key).
    act = (
        uw.withColumn("__cw", F.min("__wk").over(Window.partitionBy("__u")))
        .withColumn(
            "__off",
            F.expr("datediff(__wk, __cw) div 7").cast("int"),
        )
        .filter(F.col("__off") <= max_offset)
    )
    rep = act.groupBy("__cw", "__off").agg(
        # count_distinct, not count: retention_from_activity accepts
        # arbitrary (not week-truncated) dates, where two distinct
        # weeks of one user can land on the same offset
        F.count_distinct("__u").alias("users")
    )
    # Cohort size == the report's own offset-0 user count (min(__wk) is
    # attained, so every user is active at offset 0 and offset 0 always
    # survives the max_offset >= 0 filter); a max(when) window over the
    # cohorts x offsets-bounded report replaces the old sizes leg
    # (cohort re-aggregate + join), which re-derived the cohort frame —
    # and therefore re-scanned the source — a third time.
    return (
        rep.withColumn(
            "__size",
            F.max(F.when(F.col("__off") == 0, F.col("users"))).over(
                Window.partitionBy("__cw")
            ),
        )
        .select(
            F.col("__cw").alias("cohort_week"),
            F.col("__off").alias("week_offset"),
            F.col("users").cast("long").alias("users"),
            F.expr("users * 1000000 div __size")
            .cast("long")
            .alias("retention_ppm"),
        )
    )
