"""Event-stream batch operators: as-of join and sessionization.

Spark has no native as-of join; the scalable construction (no per-group
pandas, no range join) is the classic tagged-union + running-last window:
one shuffle on (key), one sort within partitions — identical cost shape
to a sort-merge join, skew handled by AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_vals: tuple[str, ...] = (),
    suffix: str = "_r",
) -> DataFrame:
    """For each left row, the latest right row with same key and
    right_ts <= left_ts (inclusive).  Left rows with no match keep nulls.

    Plan: union the two sides tagged (_side 0 = right, 1 = left), one
    window `last(..., ignorenulls)` ordered by (ts, _side) — right rows
    at the same timestamp sort first, giving inclusive semantics that
    match DuckDB's ASOF JOIN (>=).
    """
    rcols = [F.col(c).alias(f"{c}{suffix}") for c in (right_ts, *right_vals)]
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(*rcols).alias("_rv"),
    )
    lcols = [c for c in left.columns]
    l = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_rv"].dataType).alias("_rv"),
        F.struct(*[F.col(c) for c in lcols]).alias("_lv"),
    )
    r = r.withColumn("_lv", F.lit(None).cast(l.schema["_lv"].dataType))
    u = r.unionByName(l)
    # Final tiebreak on the right-value struct itself: when several right
    # rows share (key, ts), which one "wins" must not depend on shuffle
    # order (struct ordering is field-wise and total over non-null _rv;
    # left rows' null _rv sorts first, which never changes the winner).
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_rv").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = u.withColumn("_match", F.last("_rv", ignorenulls=True).over(w))
    out = matched.filter(F.col("_side") == 1).select(
        *[F.col(f"_lv.{c}").alias(c) for c in lcols],
        *[
            F.col(f"_match.{c}{suffix}").alias(f"{c}{suffix}")
            for c in (right_ts, *right_vals)
        ],
    )
    return out


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign session ids: a new session starts when the gap to the
    previous event of the same key exceeds gap_seconds.

    Window lag + running count of session starts — one shuffle on key.
    session_id = (key, session_idx) with session_idx 1-based per key.
    """
    w = Window.partitionBy(key).orderBy(F.col(ts).asc())
    prev = F.lag(F.col(ts)).over(w)
    is_new = (
        prev.isNull()
        | ((F.unix_timestamp(F.col(ts)) - F.unix_timestamp(prev)) > gap_seconds)
    ).cast("long")
    return events.withColumn(
        "session_idx",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_stats(
    events: DataFrame, key: str = "user_id", ts: str = "ts", gap_seconds: int = 1800
) -> DataFrame:
    """Per-session aggregates: (key, session_idx, n_events, duration_sec)."""
    s = sessionize(events, key=key, ts=ts, gap_seconds=gap_seconds)
    return s.groupBy(key, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.unix_timestamp(F.max(ts)) - F.unix_timestamp(F.min(ts))
        ).alias("duration_sec"),
    )
