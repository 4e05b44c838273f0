"""Stateful streaming sessionization via applyInPandasWithState.

The batch `operators.joins.sessionize` assigns sessions with lag/cumsum
windows — fine when all data is present. On an unbounded stream, session
assignment needs STATE: each user's open session (start, last event time,
count) lives in the state store across micro-batches, sessions close when
the gap passes or the event-time timeout fires, and only CLOSED sessions
are emitted (append mode). This is the custom-stateful-operator path
Structured Streaming provides for semantics windows can't express
(session windows with per-key emission of aggregates on close).

State is O(1) per active user (5 scalars), partitioned by user — the same
key the batch sessionizer shuffles on — so a 1000-executor cluster holds
state shards locally with no driver involvement.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_idx", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
    ]
)

# (session_idx, n_events, start_us, last_us) of the OPEN session
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_idx", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
    ]
)


def sessionize_stream(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming sessionization: emits one row per CLOSED session.

    A session closes when a later event of the same user arrives more than
    `gap_minutes` after the session's last event, or when the event-time
    timeout (watermark passing last_event + gap) fires for an idle user.
    Late rows beyond the watermark are dropped by the engine.

    Semantics match the batch `sessionize`/`session_stats` pair: same gap
    rule, same 0-based per-user session_idx — pinned by test against the
    batch operator over identical data. In-watermark late events (arriving
    in a later micro-batch with ts at or before the open session's last
    event) are folded into the open session — counted, extending
    session_start backward when earlier — without rewinding the session's
    last-event clock, so out-of-order arrival can never shrink session_end
    or split a session that batch semantics would keep whole. (A late event
    whose batch-semantics home is an ALREADY-EMITTED session is the
    unavoidable streaming/batch divergence; size the watermark to the
    out-of-orderness you need to absorb.)
    """
    import pandas as pd

    gap_us = int(gap_minutes * 60 * 1_000_000)

    def fn(
        key: tuple,
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        user = key[0]
        cols = ["user_id", "session_idx", "n_events", "session_start", "session_end"]

        def to_ts(us: int) -> Any:
            return pd.Timestamp(us, unit="us")

        if state.hasTimedOut:
            if state.exists:
                idx, n, start_us, last_us = state.get
                yield pd.DataFrame(
                    [(user, idx, n, to_ts(start_us), to_ts(last_us))], columns=cols
                )
            state.remove()
            return

        ts_list: list[int] = []
        for pdf in pdfs:
            ts_list.extend(
                int(v.value // 1000) for v in pd.to_datetime(pdf[ts_col])
            )
        ts_list.sort()
        if not ts_list:
            return

        if state.exists:
            idx, n, start_us, last_us = state.get
        else:
            idx, n, start_us, last_us = -1, 0, 0, None

        closed: list[tuple] = []
        for t_us in ts_list:
            if last_us is not None and t_us <= last_us:
                # in-watermark late arrival (only possible across
                # micro-batches: within a batch ts_list is sorted). It
                # belongs to the OPEN session; count it and extend the
                # session start backward if needed, but NEVER rewind
                # last_us — moving it backward would shrink session_end
                # and could split one batch-semantics session in two.
                n += 1
                start_us = min(start_us, t_us)
                continue
            if last_us is None or t_us - last_us > gap_us:
                if last_us is not None:
                    closed.append((user, idx, n, to_ts(start_us), to_ts(last_us)))
                idx += 1
                n = 1
                start_us = t_us
            else:
                n += 1
            last_us = t_us
        state.update((idx, n, start_us, last_us))
        # close the open session once the watermark passes last event + gap
        state.setTimeoutTimestamp(last_us // 1000 + gap_us // 1000)
        if closed:
            yield pd.DataFrame(closed, columns=cols)

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(user_col))
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
