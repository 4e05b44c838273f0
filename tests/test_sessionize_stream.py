"""Stateful streaming sessionization: closed sessions must match the batch
sessionizer over the same data."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from soda_spark_spark.operators.joins import session_stats
from soda_spark_spark.streaming import sessionize_stream

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark):
    rows = []
    # user 1: two sessions (gap > 30min between event 2 and 3)
    for i, mins in enumerate((0, 10, 120, 125)):
        rows.append((100 + i, T0 + dt.timedelta(minutes=mins), 1))
    # user 2: one session
    for i, mins in enumerate((5, 15)):
        rows.append((200 + i, T0 + dt.timedelta(minutes=mins), 2))
    # a much-later sentinel event per user advances the watermark so all
    # earlier sessions close via gap or timeout
    rows.append((900, T0 + dt.timedelta(days=2), 1))
    rows.append((901, T0 + dt.timedelta(days=2), 2))
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long"
    )


def test_streaming_sessions_match_batch(spark, tmp_path):
    df = _events(spark)
    src = tmp_path / "events"
    df.write.mode("overwrite").parquet(str(src))

    stream = spark.readStream.schema(df.schema).parquet(str(src))
    sessions = sessionize_stream(stream, gap_minutes=30.0, watermark="0 seconds")
    q = (
        sessions.writeStream.format("memory")
        .queryName("closed_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.user_id, r.session_idx): (r.n_events, r.session_start, r.session_end)
        for r in spark.sql("SELECT * FROM closed_sessions").collect()
    }
    # batch reference over the same data (drop the sentinels' own sessions,
    # which are still OPEN in the stream and therefore unemitted)
    batch = {
        (r.user_id, r.session_idx): (r.n_events, r.session_start, r.session_end)
        for r in session_stats(
            df, user_col="user_id", ts_col="ts",
            gap=F.expr("INTERVAL 30 MINUTES"), order_tiebreak="event_id",
        ).collect()
        if r.session_start < T0 + dt.timedelta(days=1)
    }
    assert got == batch
    assert (1, 0) in got and got[(1, 0)][0] == 2  # first session: 2 events
    assert (1, 1) in got and got[(1, 1)][0] == 2
    assert (2, 0) in got and got[(2, 0)][0] == 2


def test_in_watermark_late_event_does_not_rewind_session(spark, tmp_path):
    """A late event (earlier ts, later micro-batch, inside the watermark)
    must fold into the open session without rewinding its last-event clock:
    sessions come out batch-equal instead of split/shrunk."""
    import time

    schema = "event_id long, ts timestamp, user_id long"
    batch1 = spark.createDataFrame(
        [(1, T0, 7), (2, T0 + dt.timedelta(minutes=10), 7)], schema
    )
    # minute-5 event arrives AFTER the minute-10 event (out of order, within
    # the 1h watermark); sentinel closes the session via timeout
    batch2 = spark.createDataFrame(
        [(3, T0 + dt.timedelta(minutes=5), 7),
         (4, T0 + dt.timedelta(days=2), 7)], schema
    )
    src = tmp_path / "late_events"
    batch1.coalesce(1).write.mode("append").parquet(str(src))
    time.sleep(1.1)  # distinct modTime -> deterministic file->batch order
    batch2.coalesce(1).write.mode("append").parquet(str(src))

    stream = (
        spark.readStream.schema(batch1.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    sessions = sessionize_stream(stream, gap_minutes=30.0, watermark="1 hour")
    q = (
        sessions.writeStream.format("memory")
        .queryName("late_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "late_ckpt"))
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.user_id, r.session_idx): (r.n_events, r.session_start, r.session_end)
        for r in spark.sql("SELECT * FROM late_sessions").collect()
    }
    # batch semantics over the union: one session of 3 events, 0..10min
    assert got == {
        (7, 0): (3, T0, T0 + dt.timedelta(minutes=10)),
    }
