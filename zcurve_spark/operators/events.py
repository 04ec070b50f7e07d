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


def asof_join_tolerance(
    left: DataFrame,
    right: DataFrame,
    key: str,
    tolerance_seconds: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_vals: tuple[str, ...] = (),
    suffix: str = "_r",
) -> DataFrame:
    """As-of join with a bounded lookback: the matched right row must be
    within `tolerance_seconds` at or before the left timestamp, else the
    match is nulled out (left rows survive).  Same one-shuffle plan as
    :func:`asof_join`; the tolerance is a post-window column condition."""
    j = asof_join(
        left, right, key,
        left_ts=left_ts, right_ts=right_ts, right_vals=right_vals, suffix=suffix,
    )
    rts = f"{right_ts}{suffix}"
    within = (
        F.col(rts).isNotNull()
        & (
            F.unix_timestamp(F.col(left_ts)) - F.unix_timestamp(F.col(rts))
            <= tolerance_seconds
        )
    )
    out = j
    for c in (right_ts, *right_vals):
        cc = f"{c}{suffix}"
        out = out.withColumn(cc, F.when(within, F.col(cc)))
    return out


def interval_join_bucketed(
    intervals: DataFrame,
    points: DataFrame,
    *,
    key: str | None = None,
    start_col: str = "start_es",
    end_col: str = "end_es",
    ts_col: str = "ts_es",
    bucket_width: int = 300,
) -> DataFrame:
    """Closed-interval join (start <= ts <= end) WITHOUT a nested loop —
    the 1D-time analog of the curve-bucket spatial join: each interval
    explodes to its covering time buckets (span/width + 1 rows, bounded
    for bounded intervals), each point lands in exactly ONE bucket, the
    join is a plain equi-join on (bucket[, key]) plus exact refinement.
    A point's single bucket meets each interval's cover at most once, so
    qualifying pairs appear exactly once — no dedup pass.  All three
    time columns are epoch-second LONGs (callers convert timestamps),
    keeping the bucket arithmetic engine-exact.

    Naive `a.join(b, a.start <= b.ts & b.ts <= a.end)` compiles to a
    BroadcastNestedLoopJoin — quadratic and undistributable at 10^12
    rows; this is the shuffle-partitionable replacement."""
    w = int(bucket_width)
    ivs = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / w).cast("long"),
                F.floor(F.col(end_col) / w).cast("long"),
            )
        ),
    )
    pts = points.withColumn("_b", F.floor(F.col(ts_col) / w).cast("long"))
    on = ["_b", key] if key else ["_b"]
    return (
        ivs.join(pts, on)
        .filter(F.col(ts_col).between(F.col(start_col), F.col(end_col)))
        .drop("_b")
    )
