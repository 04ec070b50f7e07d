"""Structured-Streaming tile counts: stream result == batch result on the
same input (the encode path is shared code, so equality is the whole
correctness statement), plus checkpoint/resume."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from zcurve_spark.streaming.tiles import (
    run_stream_from_parquet,
    streaming_tile_counts,
    with_event_geo,
)

SF_DIR = "/root/testdata/sf0.001"


def _batch_equivalent(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    geo = with_event_geo(ev)
    from zcurve_spark.functions.columns import tile_id_col

    tiled = geo.withColumn("tile_id", tile_id_col("zkey", 6, bits=20))
    return (
        tiled.groupBy(F.window("ts", "1 hour").alias("win"), "tile_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 1000).cast("long")).alias("v_milli"),
        )
        .select(F.col("win.start").alias("window_start"), "tile_id", "n_events", "v_milli")
    )


def _rowset(rows):
    return sorted((str(r[0]), r[1], r[2], r[3]) for r in rows)


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    """FileStreamSource needs a *directory* of files."""
    import shutil

    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF_DIR}/events.parquet", d / "part-000.parquet")
    return str(d)


def test_stream_matches_batch(spark, tmp_path, events_dir):
    """Append-mode semantics: emitted windows must exactly equal the batch
    result for every window closed by the final watermark; windows still
    inside the watermark horizon legitimately stay in state."""
    import datetime

    q = run_stream_from_parquet(
        spark, events_dir, str(tmp_path / "ckpt"), query_name="t_s1"
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM t_s1").collect()
    exp = _batch_equivalent(spark).collect()
    gs, es = _rowset(got), _rowset(exp)
    assert set(gs) <= set(es), "stream emitted a row batch never produces"
    max_ts = spark.read.parquet(f"{SF_DIR}/events.parquet").agg(
        F.max(F.col("ts").cast("timestamp"))
    ).collect()[0][0]
    # every window whose end precedes (watermark - 1h slack) must be out
    horizon = max_ts - datetime.timedelta(hours=2 + 1 + 1)
    must_emit = [r for r in es if r[0] <= horizon.strftime("%Y-%m-%d %H:%M:%S")]
    missing = set(map(tuple, must_emit)) - set(gs)
    assert not missing, f"closed windows missing from stream: {sorted(missing)[:5]}"
    assert len(gs) >= len(must_emit) > 0


def test_stream_resume_is_idempotent(spark, tmp_path, events_dir):
    """File sink + checkpoint = exactly-once: restarting over the same
    checkpoint with no new input must add zero rows (memory sink doesn't
    support recovery, so the durable path is what we test)."""
    from zcurve_spark.streaming.tiles import streaming_tile_counts

    ck = str(tmp_path / "ckpt2")
    out = str(tmp_path / "out")

    def start():
        schema = spark.read.parquet(events_dir).schema
        stream = spark.readStream.schema(schema).parquet(events_dir)
        agg = streaming_tile_counts(stream)
        return (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )

    q1 = start()
    q1.awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    assert n1 > 0
    q2 = start()  # resume: offsets committed, no new input
    q2.awaitTermination(120)
    n2 = spark.read.parquet(out).count()
    assert n2 == n1


def test_stateful_sessionize_matches_batch(spark, tmp_path, events_dir):
    """applyInPandasWithState sessionization: every emitted session must
    equal a batch session (operators.events.session_stats boundaries),
    and all sessions that end well before the final watermark must be
    emitted regardless of how files were sliced into batches."""
    import datetime

    from zcurve_spark.operators.events import sessionize
    from zcurve_spark.streaming.sessions import streaming_sessionize

    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    out = streaming_sessionize(stream, gap_seconds=1800)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_sess")
        .option("checkpointLocation", str(tmp_path / "ck_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.sql("SELECT * FROM t_sess").collect()
    }

    ev = spark.read.parquet(events_dir).withColumn("ts", F.col("ts").cast("timestamp"))
    s = sessionize(ev, gap_seconds=1800)
    batch = (
        s.groupBy("user_id", "session_idx")
        .agg(
            F.min(F.unix_timestamp("ts")).alias("session_start"),
            F.max(F.unix_timestamp("ts")).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .collect()
    )
    exp = {(r.user_id, r.session_start, r.session_end, r.n_events) for r in batch}
    assert got <= exp, f"stream emitted non-batch sessions: {sorted(got - exp)[:5]}"
    max_ts = ev.agg(F.max(F.unix_timestamp("ts"))).collect()[0][0]
    # sessions whose close point precedes the final watermark minus slack
    horizon = max_ts - (2 * 3600) - 1800 - 3600
    must = {t for t in exp if t[2] <= horizon}
    missing = must - got
    assert not missing, f"closed sessions missing: {sorted(missing)[:5]}"
    assert len(must) > 0


class TestParquetSinkResume:
    """Production sink shape (r3): parquet append sink + checkpoint.
    Kill/restart with the same checkpoint must be exactly-once — no
    duplicate rows, and new input picked up incrementally."""

    def _split_events(self, spark, d):
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet").orderBy("event_id")
        n = ev.count()
        a = ev.limit(n // 2)
        b = ev.subtract(a)
        a.coalesce(1).write.mode("overwrite").parquet(str(d / "srcA"))
        b.coalesce(1).write.mode("overwrite").parquet(str(d / "srcB"))
        return str(d / "srcA"), str(d / "srcB")

    def test_sessions_sink_resume_no_duplicates(self, spark, tmp_path):
        import os
        import shutil

        from zcurve_spark.streaming.sinks import run_sessions_to_parquet

        src_a, src_b = self._split_events(spark, tmp_path)
        src = str(tmp_path / "src")
        os.makedirs(src)
        for f in os.listdir(src_a):
            if f.endswith(".parquet"):
                shutil.copy(os.path.join(src_a, f), os.path.join(src, "a-" + f))
        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        schema = spark.read.parquet(src).schema

        q = run_sessions_to_parquet(spark, src, out, ckpt, schema=schema)
        assert q.awaitTermination(180)
        n_first = spark.read.parquet(out).count()

        # restart with NO new input: nothing may be re-emitted
        q = run_sessions_to_parquet(spark, src, out, ckpt, schema=schema)
        assert q.awaitTermination(180)
        assert spark.read.parquet(out).count() == n_first

        # add the second half and resume: strictly more sessions, zero dups
        for f in os.listdir(src_b):
            if f.endswith(".parquet"):
                shutil.copy(os.path.join(src_b, f), os.path.join(src, "b-" + f))
        q = run_sessions_to_parquet(spark, src, out, ckpt, schema=schema)
        assert q.awaitTermination(180)
        got = spark.read.parquet(out)
        assert got.count() > n_first
        dups = (
            got.groupBy("user_id", "session_start").count().filter(F.col("count") > 1)
        )
        assert dups.count() == 0

    def test_tiles_sink_resume_no_duplicates(self, spark, tmp_path):
        import os
        import shutil

        from zcurve_spark.streaming.sinks import run_tiles_to_parquet

        src = str(tmp_path / "src")
        os.makedirs(src)
        shutil.copy(f"{SF_DIR}/events.parquet", os.path.join(src, "a.parquet"))
        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        schema = spark.read.parquet(src).schema

        q = run_tiles_to_parquet(spark, src, out, ckpt, schema=schema)
        assert q.awaitTermination(180)
        first = spark.read.parquet(out)
        n_first = first.count()
        # windows are emitted at most once across restarts
        q = run_tiles_to_parquet(spark, src, out, ckpt, schema=schema)
        assert q.awaitTermination(180)
        got = spark.read.parquet(out)
        assert got.count() == n_first
        dups = (
            got.groupBy("window_start", "tile_id").count().filter(F.col("count") > 1)
        )
        assert dups.count() == 0


def test_streaming_exact_dedup(spark, tmp_path):
    """Planted exact duplicates across micro-batches are suppressed; one
    row per distinct text survives into the sink."""
    import os

    from zcurve_spark.streaming.dedup import streaming_exact_dedup

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .limit(50)
        .withColumn("ts", F.to_timestamp(F.lit("2026-01-01 00:00:00")))
    )
    dups = docs.limit(20).withColumn("doc_id", F.col("doc_id") + 10_000).withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 5 MINUTES")
    )
    src = str(tmp_path / "src")
    docs.coalesce(1).write.mode("overwrite").parquet(src)
    dups.coalesce(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    out = str(tmp_path / "out")
    q = (
        streaming_exact_dedup(stream, watermark="1 hour")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = spark.read.parquet(out)
    n_distinct = docs.select("text").distinct().count()
    assert got.count() == n_distinct
    assert got.groupBy("text").count().filter(F.col("count") > 1).count() == 0
