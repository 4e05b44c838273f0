"""Unit tests for as-of join and sessionization."""

from __future__ import annotations

import pytest

from soda_spark_spark.operators.joins import asof_join, session_stats, sessionize


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [("A", 10, 1), ("A", 25, 2), ("B", 12, 3), ("A", 5, 4)],
        "sym string, t long, trade_id long",
    )


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [("A", 8, 100.0), ("A", 20, 101.0), ("B", 11, 50.0), ("B", 30, 51.0)],
        "sym string, t long, px double",
    )


def test_asof_backward(trades, quotes):
    out = {
        r.trade_id: r.px
        for r in asof_join(
            trades, quotes, on="t", by="sym", value_cols=["px"]
        ).collect()
    }
    assert out == {1: 100.0, 2: 101.0, 3: 50.0, 4: None}


def test_asof_backward_inclusive(spark, quotes):
    left = spark.createDataFrame([("A", 20, 9)], "sym string, t long, trade_id long")
    out = asof_join(left, quotes, on="t", by="sym", value_cols=["px"]).first()
    assert out.px == 101.0  # right row at exactly t=20 matches (<=)


def test_asof_forward(trades, quotes):
    out = {
        r.trade_id: r.px
        for r in asof_join(
            trades, quotes, on="t", by="sym", value_cols=["px"], direction="forward"
        ).collect()
    }
    assert out == {1: 101.0, 2: None, 3: 51.0, 4: 100.0}


def test_asof_without_by_key(spark):
    left = spark.createDataFrame([(15,), (2,)], "t long")
    right = spark.createDataFrame([(10, "x"), (20, "y")], "t long, v string")
    out = sorted(
        asof_join(left, right, on="t", value_cols=["v"]).collect(),
        key=lambda r: r.t,
    )
    assert [r.v for r in out] == [None, "x"]


def test_sessionize_gap_splits(spark):
    ev = spark.createDataFrame(
        [(1, 0, 1), (1, 100, 2), (1, 5000, 3), (2, 0, 4)],
        "user long, t long, eid long",
    )
    out = {
        r.eid: r.session_idx
        for r in sessionize(
            ev, user_col="user", ts_col="t", gap=1000, order_tiebreak="eid"
        ).collect()
    }
    assert out == {1: 0, 2: 0, 3: 1, 4: 0}


def test_session_stats(spark):
    ev = spark.createDataFrame(
        [(1, 0, 1), (1, 100, 2), (1, 5000, 3), (1, 5100, 4)],
        "user long, t long, eid long",
    )
    rows = {
        r.session_idx: r
        for r in session_stats(
            ev, user_col="user", ts_col="t", gap=1000, order_tiebreak="eid"
        ).collect()
    }
    assert rows[0].n_events == 2 and rows[0].session_start == 0 and rows[0].session_end == 100
    assert rows[1].n_events == 2 and rows[1].session_start == 5000


def test_asof_tolerance_numeric(spark):
    left = spark.createDataFrame(
        [(10, 1), (100, 2), (200, 3)], "t long, id long"
    )
    right = spark.createDataFrame([(8, "a"), (90, "b")], "t long, v string")
    got = {
        r["id"]: r["v"]
        for r in asof_join(
            left, right, on="t", value_cols=["v"], tolerance=15
        ).collect()
    }
    # id=1: gap 2 <= 15 -> 'a'; id=2: gap 10 <= 15 -> 'b';
    # id=3: nearest earlier is 90, gap 110 > 15 -> NULL
    assert got == {1: "a", 2: "b", 3: None}


def test_asof_tolerance_keyed_and_forward(spark):
    left = spark.createDataFrame([("u", 50, 1)], "k string, t long, id long")
    right = spark.createDataFrame(
        [("u", 70, "near"), ("u", 500, "far")], "k string, t long, v string"
    )
    got = asof_join(
        left, right, on="t", by="k", value_cols=["v"],
        direction="forward", tolerance=30,
    ).first()
    assert got["v"] == "near"
    got = asof_join(
        left, right, on="t", by="k", value_cols=["v"],
        direction="forward", tolerance=10,
    ).first()
    assert got["v"] is None


def test_asof_tolerance_rejects_string_time(spark):
    import pytest as _pytest

    left = spark.createDataFrame([("b", 1)], "t string, id long")
    right = spark.createDataFrame([("a", 9)], "t string, v long")
    with _pytest.raises(ValueError, match="tolerance is not supported"):
        asof_join(left, right, on="t", value_cols=["v"], tolerance=5)


def test_asof_tolerance_ntz_dst_safe(spark):
    """TIMESTAMP_NTZ tolerance gaps are wall-clock micros, independent of
    the session timezone — a DST spring-forward between left and right
    must not shift the gap (regression: the old cast-through-session-tz
    path computed 3600s here under America/New_York, wrongly keeping the
    match at tolerance=3600)."""
    from soda_spark_spark.operators.joins import asof_join

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        left = spark.sql(
            "SELECT TIMESTAMP_NTZ'2024-03-10 03:30:00' AS t"
        )
        right = spark.sql(
            "SELECT TIMESTAMP_NTZ'2024-03-10 01:30:00' AS t, 1 AS v"
        )
        # true wall-clock gap is 7200s: within 7200, outside 3600
        kept = asof_join(left, right, on="t", value_cols=["v"],
                         tolerance=7_200_000_000).collect()
        assert [r["v"] for r in kept] == [1]
        nulled = asof_join(left, right, on="t", value_cols=["v"],
                           tolerance=3_600_000_000).collect()
        assert [r["v"] for r in nulled] == [None]
        # sub-second precision survives the decomposition
        l2 = spark.sql("SELECT TIMESTAMP_NTZ'2024-01-01 00:00:01.000001' AS t")
        r2 = spark.sql("SELECT TIMESTAMP_NTZ'2024-01-01 00:00:00' AS t, 7 AS v")
        assert [
            r["v"]
            for r in asof_join(l2, r2, on="t", value_cols=["v"],
                               tolerance=1_000_000).collect()
        ] == [None]
        assert [
            r["v"]
            for r in asof_join(l2, r2, on="t", value_cols=["v"],
                               tolerance=1_000_001).collect()
        ] == [7]
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


# ---------------------------------------------------------------------------
# funnel analysis
# ---------------------------------------------------------------------------


def _funnel_events(spark):
    import datetime as dt

    T = lambda s: dt.datetime(2026, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        (1, T(1), "view"), (1, T(2), "click"), (1, T(3), "purchase"),
        (2, T(5), "click"), (2, T(6), "view"),          # click only BEFORE view
        (3, T(1), "view"),                               # view only
        (4, T(1), "purchase"), (4, T(2), "view"), (4, T(3), "click"),
        (5, T(1), "click"), (5, T(2), "purchase"),       # never views
        (6, T(7), "view"), (6, T(7), "click"),           # same-ts (>= counts)
        (None, T(1), "view"), (7, None, "view"),         # NULL user / ts
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )


def test_funnel_steps_semantics(spark):
    from soda_spark_spark.operators.joins import funnel_steps

    got = {
        r.user_id: (r.step1_ts, r.step2_ts, r.step3_ts)
        for r in funnel_steps(
            _funnel_events(spark), ["view", "click", "purchase"]
        ).collect()
    }
    assert set(got) == {1, 2, 3, 4, 6}  # entrants only; NULLs excluded
    assert got[1][2] is not None                       # full conversion
    assert got[2] == (got[2][0], None, None)           # click-before-view
    assert got[4][1] is not None and got[4][2] is None  # purchase-before-click
    assert got[6][1] == got[6][0]                      # same-ts >= counts


def test_funnel_report_counts(spark):
    from soda_spark_spark.operators.joins import funnel_report

    rows = {
        r.step: r
        for r in funnel_report(
            _funnel_events(spark), ["view", "click", "purchase"]
        ).collect()
    }
    assert (rows[1].users, rows[2].users, rows[3].users) == (5, 3, 1)
    assert rows[1].from_entry_ppm == rows[1].from_prev_ppm == 1_000_000
    assert rows[2].from_entry_ppm == 600_000
    assert rows[3].from_entry_ppm == 200_000
    assert rows[3].from_prev_ppm == 333_333
    assert rows[2].event_type == "click"


def test_funnel_unreached_steps_and_validation(spark):
    import datetime as dt

    from soda_spark_spark.operators.joins import funnel_report, funnel_steps

    ev = spark.createDataFrame(
        [(1, dt.datetime(2026, 1, 1), "view")],
        "user_id long, ts timestamp, event_type string",
    )
    rows = {r.step: r for r in
            funnel_report(ev, ["view", "click", "purchase"]).collect()}
    assert rows[2].users == 0 and rows[2].from_entry_ppm == 0
    assert rows[3].from_prev_ppm == 0  # prev step had 0 users
    with pytest.raises(ValueError, match="at least two"):
        funnel_steps(ev, ["view"])
    with pytest.raises(ValueError, match="distinct"):
        funnel_steps(ev, ["view", "view"])


def test_retention_cohorts(spark):
    import datetime as dt

    from soda_spark_spark.operators.joins import retention_cohorts

    D = lambda d, h=0: dt.datetime(2026, 1, d, h)  # noqa: E731
    rows = [
        (1, D(5)), (1, D(12)), (1, D(26)),   # cohort Jan-5 wk; back wk1, wk3
        (2, D(6)), (2, D(13)),               # same cohort; back wk1
        (3, D(14)),                          # cohort Jan-12 wk, never back
        (1, D(5, 23)),                       # same-week duplicate activity
        (None, D(5)), (4, None),             # NULL user / ts excluded
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (str(r.cohort_week), r.week_offset): (r.users, r.retention_ppm)
        for r in retention_cohorts(ev).collect()
    }
    assert got == {
        ("2026-01-05", 0): (2, 1_000_000),
        ("2026-01-05", 1): (2, 1_000_000),
        ("2026-01-05", 3): (1, 500_000),
        ("2026-01-12", 0): (1, 1_000_000),
    }


def test_retention_max_offset_and_validation(spark):
    import datetime as dt

    import pytest as _pytest

    from soda_spark_spark.operators.joins import retention_cohorts

    ev = spark.createDataFrame(
        [(1, dt.datetime(2026, 1, 5)), (1, dt.datetime(2026, 3, 30))],
        "user_id long, ts timestamp",
    )
    offs = {r.week_offset for r in retention_cohorts(ev, max_offset=4).collect()}
    assert offs == {0}  # the 12-week return is beyond the bound
    with _pytest.raises(ValueError, match="max_offset"):
        retention_cohorts(ev, max_offset=-1)


def test_retention_stream_matches_batch(spark, tmp_path):
    import datetime as dt

    from soda_spark_spark.operators.joins import (
        retention_cohorts, retention_from_activity,
    )
    from soda_spark_spark.streaming.scan_stream import (
        activity_week_batch_writer,
    )

    D = lambda d: dt.datetime(2026, 1, d)  # noqa: E731
    rows = [(1, D(5)), (1, D(12)), (2, D(6)), (2, D(13)),
            (3, D(14)), (1, D(26))]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    src = str(tmp_path / "src")
    # two files -> two micro-batches; a user's cohort week may arrive
    # in the SECOND batch (user 3) — merge must still get min right
    ev.filter("user_id < 3").write.parquet(src)
    ev.filter("user_id >= 3").write.mode("append").parquet(src)
    act = str(tmp_path / "act")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            activity_week_batch_writer(act, "user_id", "ts")
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    streamed = sorted(
        map(tuple, retention_from_activity(spark.read.parquet(act)).collect())
    )
    batch = sorted(map(tuple, retention_cohorts(ev).collect()))
    assert streamed == batch and len(batch) >= 3
