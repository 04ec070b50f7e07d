"""Video sub-clip matching (operators/videohash.py): frame-hash
extraction over both AVI codecs, cross-codec match recall, wrong-video
rejection, and plan shape."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from zcurve_spark.operators.videohash import (
    synth_video_table,
    video_match_join,
    video_phash_frames,
    video_snippet_table,
)


def test_frame_hashes_per_frame_and_codec_invariant(spark):
    """DIB and MJPG encodings of the same frames produce near-identical
    hash sequences (per-frame hamming <= 12), and frames are mutually
    distinct within a video."""
    ids = spark.range(0, 2).select(F.col("id").alias("doc_id"))
    dib = {
        (r["id"], r["t"]): r["ph"]
        for r in video_phash_frames(synth_video_table(ids, n_frames=6)).collect()
    }
    mjpg = {
        (r["id"], r["t"]): r["ph"]
        for r in video_phash_frames(
            synth_video_table(ids, n_frames=6, codec="MJPG")
        ).collect()
    }
    assert len(dib) == 12 and set(dib) == set(mjpg)
    for k in dib:
        assert bin((dib[k] ^ mjpg[k]) & ((1 << 64) - 1)).count("1") <= 12
    phs = [dib[(0, t)] for t in range(6)]
    for a in range(6):
        for b in range(a + 1, 6):
            assert bin((phs[a] ^ phs[b]) & ((1 << 64) - 1)).count("1") > 12


def test_cross_codec_subclip_match(spark):
    """MJPG-re-encoded clips match their DIB source at the planted
    offset with one vote per clip frame."""
    ids = spark.range(0, 12).select(F.col("id").alias("doc_id"))
    vids = synth_video_table(ids)
    snips = video_snippet_table(vids, mod=4, offset=1000, start=8, length=8)
    out = {
        r["snippet_id"]: (r["matched_id"], r["votes"], r["frame_offset"])
        for r in video_match_join(snips, vids).collect()
    }
    assert sorted(out) == [1000, 1004, 1008]
    for sid, (mid, votes, off) in out.items():
        assert mid == sid - 1000 and off == 8 and votes == 8


def test_unrelated_clip_matches_nothing(spark):
    """Clips from videos OUTSIDE the corpus produce no match row (no
    frame-level collisions reach min_votes)."""
    corpus_ids = spark.range(0, 8).select(F.col("id").alias("doc_id"))
    other_ids = spark.range(100, 104).select(F.col("id").alias("doc_id"))
    corpus = synth_video_table(corpus_ids)
    others = synth_video_table(other_ids)
    snips = video_snippet_table(others, mod=1, offset=5000)
    assert video_match_join(snips, corpus).count() == 0


def test_null_blob_skipped(spark):
    ids = spark.range(0, 2).select(F.col("id").alias("doc_id"))
    both = spark.createDataFrame(
        [(99, None)], "video_id long, blob binary"
    ).unionByName(synth_video_table(ids, n_frames=4))
    got = video_phash_frames(both).select("id").distinct().collect()
    assert sorted(r["id"] for r in got) == [0, 1]


def test_match_plan_no_cartesian(spark):
    ids = spark.range(0, 4).select(F.col("id").alias("doc_id"))
    vids = synth_video_table(ids, n_frames=4)
    snips = video_snippet_table(vids, mod=2, offset=1000, start=0, length=4)
    plan = (
        video_match_join(snips, vids)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
