"""Audio landmark fingerprinting + snippet match join
(operators/audiohash.py): kernel determinism, sub-clip alignment,
vote-margin discrimination, end-to-end Spark match vs planted truth,
and the plan shape (hash equi-join, no cartesian, no broadcast of the
corpus side)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from zcurve_spark.operators.audiohash import (
    HOP,
    audio_fingerprints,
    audio_match_join,
    clip_wav_blob,
    landmarks,
    pcm_to_wav_blob,
    snippet_table,
    synth_audio_table,
    synth_chirp_pcm,
    synth_chirp_wav_blob,
    wav_samples,
)


def test_wav_roundtrip_sample_exact():
    x = synth_chirp_pcm(5, n_samples=4096)
    y, sr = wav_samples(pcm_to_wav_blob(x))
    assert sr == 8000 and len(y) == 4096
    # one 16-bit quantization, then exact
    z, _ = wav_samples(pcm_to_wav_blob(y))
    assert np.array_equal(y, z)


def test_landmarks_deterministic_and_packed():
    x = synth_chirp_pcm(7)
    h1, t1 = landmarks(x)
    h2, t2 = landmarks(x)
    assert np.array_equal(h1, h2) and np.array_equal(t1, t2)
    assert len(h1) > 50
    assert (h1 >= 0).all() and (h1 < (1 << 27)).all()


def test_landmarks_short_input_empty():
    h, t = landmarks(np.zeros(600))
    assert len(h) == 0 and len(t) == 0


def test_subclip_votes_align_at_one_offset():
    """An exact HOP-aligned sub-clip shares EVERY landmark with its
    source at offset start//HOP; wrong tracks stay far below."""
    blob = synth_chirp_wav_blob(7)
    h, t = landmarks(wav_samples(blob)[0])
    hs, ts = landmarks(wav_samples(clip_wav_blob(blob, 4096, 8192))[0])
    track: dict[int, set] = {}
    for hh, tt in zip(h, t):
        track.setdefault(int(hh), set()).add(int(tt))
    offs: dict[int, int] = {}
    for hh, tt in zip(hs, ts):
        for tc in track.get(int(hh), ()):
            offs[tc - int(tt)] = offs.get(tc - int(tt), 0) + 1
    best_off, best_votes = max(offs.items(), key=lambda kv: kv[1])
    assert best_off == 4096 // HOP
    assert best_votes == len(hs)  # every snippet landmark aligns
    # discrimination: the same snippet against 20 unrelated tracks
    worst = 0
    for seed in range(100, 120):
        hy, ty = landmarks(synth_chirp_pcm(seed))
        other: dict[int, set] = {}
        for hh, tt in zip(hy, ty):
            other.setdefault(int(hh), set()).add(int(tt))
        co: dict[int, int] = {}
        for hh, tt in zip(hs, ts):
            for tc in other.get(int(hh), ()):
                co[tc - int(tt)] = co.get(tc - int(tt), 0) + 1
        if co:
            worst = max(worst, max(co.values()))
    assert worst < 12 < best_votes


def test_match_join_end_to_end(spark):
    """20 tracks, 4 planted snippets: every snippet matches its own
    track at the planted frame offset, nothing else."""
    ids = spark.range(0, 20).select(F.col("id").alias("doc_id"))
    tracks = synth_audio_table(ids)
    snips = snippet_table(tracks, mod=5, offset=1000, start=4096, length=8192)
    out = {
        r["snippet_id"]: (r["matched_id"], r["votes"], r["frame_offset"])
        for r in audio_match_join(snips, tracks).collect()
    }
    assert sorted(out) == [1000, 1005, 1010, 1015]
    for sid, (mid, votes, off) in out.items():
        assert mid == sid - 1000
        assert off == 4096 // HOP
        assert votes >= 12


def test_fingerprints_null_blob_skipped(spark):
    df = spark.createDataFrame([(1, None)], "track_id long, blob binary")
    ids = spark.range(0, 2).select(F.col("id").alias("doc_id"))
    both = df.unionByName(synth_audio_table(ids))
    got = audio_fingerprints(both).select("id").distinct().collect()
    assert sorted(r["id"] for r in got) == [0, 1]


def test_match_plan_no_cartesian_no_corpus_broadcast(spark):
    ids = spark.range(0, 8).select(F.col("id").alias("doc_id"))
    tracks = synth_audio_table(ids)
    snips = snippet_table(tracks, mod=4, offset=1000)
    plan = (
        audio_match_join(snips, tracks)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
