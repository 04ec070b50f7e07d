"""As-of join and sessionization unit tests (edge semantics beyond the
sf0.01 oracle harness)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from zcurve_spark.operators.events import asof_join, session_stats, sessionize


def _ts(s):
    return datetime.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def tiny(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 10:00:05")),
            (2, 10, _ts("2024-01-01 10:00:10")),
            (3, 10, _ts("2024-01-01 09:00:00")),  # before any right row
            (4, 20, _ts("2024-01-01 12:00:00")),
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 10:00:05"), 1.0),  # exactly equal ts -> inclusive
            (10, _ts("2024-01-01 10:00:07"), 2.0),
            (20, _ts("2024-01-01 11:59:59"), 3.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    return left, right


class TestAsof:
    def test_inclusive_latest_match(self, tiny):
        left, right = tiny
        out = {
            r.event_id: (r.ts_r, r.value_r)
            for r in asof_join(left, right, key="user_id", right_vals=("value",)).collect()
        }
        assert out[1] == (_ts("2024-01-01 10:00:05"), 1.0)  # ts == right ts: inclusive
        assert out[2] == (_ts("2024-01-01 10:00:07"), 2.0)  # latest prior wins
        assert out[3] == (None, None)  # no earlier right row
        assert out[4] == (_ts("2024-01-01 11:59:59"), 3.0)

    def test_partitioning_invariance(self, tiny):
        left, right = tiny
        a = sorted(map(tuple, asof_join(left, right, key="user_id", right_vals=("value",)).collect()))
        b = sorted(
            map(
                tuple,
                asof_join(
                    left.repartition(7), right.repartition(5), key="user_id", right_vals=("value",)
                ).collect(),
            )
        )
        assert a == b


class TestSessionize:
    def test_gap_splits_sessions(self, spark):
        ev = spark.createDataFrame(
            [
                (1, _ts("2024-01-01 10:00:00")),
                (1, _ts("2024-01-01 10:10:00")),   # same session (gap 600)
                (1, _ts("2024-01-01 10:40:01")),   # gap 1801 > 1800 -> new session
                (1, _ts("2024-01-01 11:10:01")),   # gap exactly 1800 -> same session
                (2, _ts("2024-01-01 00:00:00")),
            ],
            "user_id long, ts timestamp",
        )
        s = sessionize(ev, gap_seconds=1800).collect()
        by_ts = {(r.user_id, str(r.ts)): r.session_idx for r in s}
        assert by_ts[(1, "2024-01-01 10:00:00")] == 1
        assert by_ts[(1, "2024-01-01 10:10:00")] == 1
        assert by_ts[(1, "2024-01-01 10:40:01")] == 2
        assert by_ts[(1, "2024-01-01 11:10:01")] == 2
        assert by_ts[(2, "2024-01-01 00:00:00")] == 1

    def test_session_stats(self, spark):
        ev = spark.createDataFrame(
            [(1, _ts("2024-01-01 10:00:00")), (1, _ts("2024-01-01 10:10:00"))],
            "user_id long, ts timestamp",
        )
        st = session_stats(ev, gap_seconds=1800).collect()
        assert len(st) == 1 and st[0].n_events == 2 and st[0].duration_sec == 600


class TestAsofTolerance:
    def test_nulls_beyond_tolerance(self, spark):
        from zcurve_spark.operators.events import asof_join_tolerance

        clicks = spark.createDataFrame(
            [(10, 1, _ts("2024-01-01 10:00:00")), (11, 1, _ts("2024-01-01 12:00:00"))],
            "event_id long, user_id long, ts timestamp",
        )
        views = spark.createDataFrame(
            [(1, _ts("2024-01-01 09:55:00"), 1.5)],
            "user_id long, ts timestamp, value double",
        )
        j = asof_join_tolerance(
            clicks, views, key="user_id", tolerance_seconds=600, right_vals=("value",)
        )
        rows = {r.event_id: r for r in j.collect()}
        assert rows[10].ts_r is not None and rows[10].value_r == 1.5  # 5 min back
        assert rows[11].ts_r is None and rows[11].value_r is None  # 2h05 back


class TestIntervalJoinBucketed:
    def test_matches_naive_join_and_no_dups(self, spark):
        import random

        from pyspark.sql import functions as F

        from zcurve_spark.operators.events import interval_join_bucketed

        random.seed(3)
        ivs = [(i, random.randrange(0, 100_000)) for i in range(300)]
        intervals = spark.createDataFrame(
            [(i, s, s + random.randrange(0, 2000)) for i, s in ivs],
            "iid long, start_es long, end_es long",
        )
        points = spark.createDataFrame(
            [(j, random.randrange(0, 102_000)) for j in range(500)],
            "pid long, ts_es long",
        )
        got = interval_join_bucketed(
            intervals, points, bucket_width=300
        ).select("iid", "pid")
        naive = intervals.join(
            points,
            (F.col("ts_es") >= F.col("start_es")) & (F.col("ts_es") <= F.col("end_es")),
        ).select("iid", "pid")
        g = sorted(map(tuple, got.collect()))
        n = sorted(map(tuple, naive.collect()))
        assert g == n and len(g) == len(set(g))  # exact AND duplicate-free
