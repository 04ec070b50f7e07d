"""Custom stateful streaming operator: per-user sessionization.

The windowed tile aggregation (streaming/tiles.py) covers built-in
stateful ops; this module covers the *custom* state shape Spark doesn't
ship — gap-based sessions — via ``applyInPandasWithState`` (Arrow
batches per key group, event-time timeout; no per-row Python outside
the batch).  State per user is one open session (start, last, count);
a session closes when the gap is exceeded by a later event or when the
event-time watermark passes last+gap (timeout), which makes results
deterministic under any batch slicing of the same input.

Batch parity: tests compare closed sessions against the batch
operators.events.session_stats on the same input.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", LongType()),  # epoch seconds
        StructField("session_end", LongType()),
        StructField("n_events", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start", LongType()),
        StructField("last", LongType()),
        StructField("n", LongType()),
    ]
)


def _make_session_fn(gap_seconds: int):
    def fn(key, pdf_iter, state: GroupState):
        closed: list[tuple] = []
        user_id = int(key[0])
        if state.exists:
            s_start, s_last, s_n = state.get
        else:
            s_start = s_last = None
            s_n = 0

        if state.hasTimedOut:
            # watermark passed last+gap with no new events: session over
            if s_last is not None:
                closed.append((user_id, s_start, s_last, s_n))
            state.remove()
        else:
            ts_all = []
            for pdf in pdf_iter:
                # tz-aware or naive both arrive as datetime64; epoch secs
                t = pd.to_datetime(pdf["ts"]).astype("int64") // 1_000_000_000
                ts_all.append(t)
            ts = pd.concat(ts_all).sort_values() if ts_all else pd.Series([], dtype="int64")
            for t in ts:
                t = int(t)
                if s_last is None:
                    s_start = s_last = t
                    s_n = 1
                elif t - s_last > gap_seconds:
                    closed.append((user_id, s_start, s_last, s_n))
                    s_start = s_last = t
                    s_n = 1
                else:
                    s_last = max(s_last, t)
                    s_n += 1
            if s_last is not None:
                state.update((int(s_start), int(s_last), int(s_n)))
                # close via event-time timeout once the watermark passes
                state.setTimeoutTimestamp((int(s_last) + gap_seconds) * 1000)

        if closed:
            yield pd.DataFrame(closed, columns=["user_id", "session_start", "session_end", "n_events"])

    return fn


def streaming_sessionize(
    events: DataFrame,
    *,
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
) -> DataFrame:
    """Emit CLOSED sessions (user_id, session_start, session_end,
    n_events) from a stream of (user_id, ts, ...) events.  State is
    partitioned by user (same shuffle key as the batch operator), so a
    hot user is one state entry, not a skew bucket."""
    ev = events.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
        "ts", watermark
    )
    return (
        ev.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_session_fn(gap_seconds),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
