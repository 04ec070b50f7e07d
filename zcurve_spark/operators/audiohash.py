"""Audio fingerprinting + snippet-to-track matching (Shazam-style).

The audio member of the multimodal near-dup/retrieval family
(text: operators/dedup.py SimHash/MinHash; images:
operators/imagehash.py pHash): each track is reduced to a set of
SPECTRAL LANDMARK hashes — pairs of spectrogram peaks (band-wise
argmax bins) from nearby frames, packed into one int64 — and a query
snippet matches the track whose landmark hashes co-occur at ONE
consistent time offset (the constellation-map construction of
Wang 2003, "An Industrial-Strength Audio Search Algorithm", public).

Scale shape (10^9 tracks): fingerprinting is the one Python stage —
Arrow-batched ``mapInPandas``, vectorized numpy STFT per payload, no
shuffle, output an exploded (id, hash, t) relation (~2 rows per frame,
~60/sec of audio).  Matching is ONE equi-join on the hash column
(AQE skew-splits hot hashes — steady tones), a groupBy vote count on
(snippet, track, offset), and a per-snippet argmax — no broadcast of
the corpus, nothing quadratic.  The fingerprint relation is the thing
a production system materializes once (snapshot store) and probes per
query batch.

WAV parsing uses the stdlib `wave` reader (the repo's real audio
container path, sources/media.py:decode_wav); fingerprint DSP is
deterministic numpy (np.hanning + rfft), so hashes are reproducible
across runs/partitionings — which is what lets the planted-snippet
oracle (entry ``audio_match``) be exact id arithmetic.

No reference counterpart (bmuratshin/zcurve is planar-geometry only).
"""

from __future__ import annotations

import hashlib
import io
import wave
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..util import fan_out

FRAME = 512
HOP = 256
# band edges over the 257 rfft bins (DC excluded): 6 roughly-log bands
BAND_EDGES = (1, 8, 16, 32, 64, 128, 257)
N_BANDS = len(BAND_EDGES) - 1
_SILENCE = 1e-4  # band peaks quieter than this emit no landmark


def wav_samples(blob: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAV -> (mono float64 samples in [-1, 1], sample_rate).
    16-bit PCM only (the repo's WAV writer contract); multi-channel is
    mean-downmixed."""
    with wave.open(io.BytesIO(blob), "rb") as w:
        nch, sw, sr, nframes = (
            w.getnchannels(),
            w.getsampwidth(),
            w.getframerate(),
            w.getnframes(),
        )
        raw = w.readframes(nframes)
    if sw != 2:
        raise ValueError(f"unsupported sample width {sw}")
    x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, sr


def pcm_to_wav_blob(x: np.ndarray, sr: int = 8000) -> bytes:
    """float samples in [-1, 1] -> mono 16-bit PCM WAV bytes.  Scale is
    32768 with round-half-even so decode -> re-encode is SAMPLE-EXACT
    (wav_samples divides by 32768): clip_wav_blob depends on this to
    make snippet frames bit-identical to track frames."""
    pcm = np.clip(np.round(x * 32768.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def synth_chirp_pcm(seed: int, *, n_samples: int = 16384, sr: int = 8000) -> np.ndarray:
    """Deterministic TIME-VARYING test signal: consecutive 512-sample
    blocks each carry one seeded tone in [200, 3400] Hz (plus a quiet
    hash-noise floor).  Unlike sources/media.py:synth_wav_blob (two
    stationary sines — every frame identical, so time offsets carry no
    information), the block-tone sequence is unique per seed, which is
    what makes offset-consistent landmark voting discriminative."""
    n_blocks = -(-n_samples // FRAME)
    # counter-mode digest stream: one digest tiles after 4 uint64s,
    # which made the tone sequence periodic (period 8 frames) and every
    # multiple-of-8 frame offset tie at full votes — the sequence must
    # be aperiodic for the offset vote to be unique
    need = n_blocks * 8
    d = b"".join(
        hashlib.sha256(f"chirp:{seed}:{c}".encode()).digest()
        for c in range(-(-need // 32))
    )
    hs = np.frombuffer(d[:need], dtype=np.uint64)
    freqs = 200.0 + (hs.astype(np.float64) / 2.0**64) * 3200.0
    t = np.arange(n_samples, dtype=np.float64)
    f_per_sample = np.repeat(freqs, FRAME)[:n_samples]
    sig = 0.6 * np.sin(2 * np.pi * f_per_sample * t / sr)
    nneed = n_samples * 8
    nd = b"".join(
        hashlib.sha256(f"noise:{seed}:{c}".encode()).digest()
        for c in range(-(-nneed // 32))
    )
    noise = (
        np.frombuffer(nd[:nneed], dtype=np.uint64).astype(np.float64)
        / 2.0**64
        - 0.5
    ) * 0.02
    return sig + noise


def synth_chirp_wav_blob(seed: int, *, n_samples: int = 16384, sr: int = 8000) -> bytes:
    return pcm_to_wav_blob(synth_chirp_pcm(seed, n_samples=n_samples, sr=sr), sr)


def clip_wav_blob(blob: bytes, start: int, length: int) -> bytes:
    """Exact sub-clip of a WAV payload (sample-precise).  A start that
    is a multiple of HOP makes the clip's STFT frames coincide exactly
    with the source's — landmark hashes then match bit-for-bit at a
    constant frame offset of start // HOP."""
    x, sr = wav_samples(blob)
    return pcm_to_wav_blob(x[start : start + length], sr)


def landmarks(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(hashes int64, frame_times int64) landmark constellation of a
    sample array.  Vectorized: Hann-windowed STFT -> per-frame argmax
    bin in each of N_BANDS log bands -> prominence-gated band-k peak at
    frame t paired with band-k peaks at t+2 and t+4.  Hash packs
    (band, bin1, bin2, dt) into 27 bits — collision-free by
    construction (fields don't overlap)."""
    n = (len(x) - FRAME) // HOP + 1
    if n < 3:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    idx = np.arange(FRAME)[None, :] + HOP * np.arange(n)[:, None]
    spec = np.abs(np.fft.rfft(x[idx] * np.hanning(FRAME)[None, :], axis=1))
    peaks = np.empty((n, N_BANDS), dtype=np.int64)
    mags = np.empty((n, N_BANDS))
    for k in range(N_BANDS):
        lo, hi = BAND_EDGES[k], BAND_EDGES[k + 1]
        a = np.argmax(spec[:, lo:hi], axis=1)
        peaks[:, k] = a + lo
        mags[:, k] = spec[np.arange(n), a + lo]
    # prominence gate: a band emits only if its peak is within 4x of the
    # frame's strongest band — noise-floor argmax bins otherwise produce
    # hash coincidences across unrelated tracks (measured: ungated
    # cross-track single-offset votes reached ~half the true-match
    # votes; gated they drop to ~0 while true matches keep full votes)
    prom = (mags >= 0.25 * mags.max(axis=1, keepdims=True)) & (mags > _SILENCE)
    hs, ts = [], []
    # dt spans chosen to cross spectral-content boundaries (>= 2 hops):
    # a dt=1 pair of a locally-stationary signal hashes (bin, bin) —
    # single-bin information that collides across tracks; pairing
    # frames 2 and 4 hops apart encodes the bin SEQUENCE instead
    for dt in (2, 4):
        b1, b2 = peaks[:-dt], peaks[dt:]
        ok = prom[:-dt] & prom[dt:]
        band = np.arange(N_BANDS, dtype=np.int64)[None, :]
        h = (band << 24) | (b1 << 14) | (b2 << 4) | dt
        t = np.broadcast_to(
            np.arange(n - dt, dtype=np.int64)[:, None], h.shape
        )
        hs.append(h[ok])
        ts.append(t[ok])
    return np.concatenate(hs), np.concatenate(ts)


def audio_fingerprints(
    audio: DataFrame, *, id_col: str = "track_id", blob_col: str = "blob"
) -> DataFrame:
    """(id, h, t): exploded landmark relation, one row per hash.  The
    one Python stage — Arrow-batched, numpy-vectorized per payload,
    embarrassingly parallel (``fan_out`` guards the one-file-one-
    partition parquet gotcha).  NULL blobs yield no rows."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs, ts = [], [], []
            for i, b in zip(pdf["id"], pdf["blob"]):
                if b is None:
                    continue
                x, _sr = wav_samples(bytes(b))
                h, t = landmarks(x)
                ids.append(np.full(len(h), int(i), dtype=np.int64))
                hs.append(h)
                ts.append(t)
            if ids:
                yield pd.DataFrame(
                    {
                        "id": np.concatenate(ids),
                        "h": np.concatenate(hs),
                        "t": np.concatenate(ts),
                    }
                )

    sel = fan_out(audio).select(F.col(id_col).alias("id"), F.col(blob_col).alias("blob"))
    return sel.mapInPandas(op, "id long, h long, t long")


def audio_match_join(
    snippets: DataFrame,
    corpus: DataFrame,
    *,
    min_votes: int = 12,
    id_col: str = "track_id",
    blob_col: str = "blob",
) -> DataFrame:
    """Match each snippet to its best corpus track:
    (snippet_id, matched_id, votes, frame_offset).

    The constellation vote: equi-join snippet and corpus fingerprints
    on the hash, count co-occurrences per (snippet, track, t_corpus -
    t_snippet) — a true sub-clip aligns EVERY shared landmark at one
    offset, while coincidental hash hits scatter across offsets — then
    keep the max-vote (track, offset) per snippet (true sub-clip
    matches align every shared landmark: measured 28/28 snippet
    landmarks at one offset vs <= 6 coincidental votes for any wrong
    track — min_votes=12 splits that margin) (``max_by`` over a
    (votes, -matched_id, -offset) struct: deterministic under ties).
    Tracks below ``min_votes`` yield no row (unmatched snippet).

    Plan: one shuffle for the hash join, one partial-agg groupBy for
    the votes, one final argmax groupBy — no broadcast of either side,
    no cartesian; a 10^9-track corpus fingerprint relation joins by
    hash bucket only."""
    sfp = audio_fingerprints(snippets, id_col=id_col, blob_col=blob_col).select(
        F.col("id").alias("snippet_id"), "h", F.col("t").alias("ts")
    )
    cfp = audio_fingerprints(corpus, id_col=id_col, blob_col=blob_col).select(
        F.col("id").alias("matched_id"), "h", F.col("t").alias("tc")
    )
    votes = (
        sfp.join(cfp, "h")
        .groupBy("snippet_id", "matched_id", (F.col("tc") - F.col("ts")).alias("off"))
        .agg(F.count(F.lit(1)).alias("votes"))
        .filter(F.col("votes") >= min_votes)
    )
    best = votes.groupBy("snippet_id").agg(
        F.max_by(
            F.struct("votes", "matched_id", "off"),
            F.struct(F.col("votes"), -F.col("matched_id"), -F.col("off")),
        ).alias("b")
    )
    return best.select(
        "snippet_id",
        F.col("b.matched_id").alias("matched_id"),
        F.col("b.votes").alias("votes"),
        F.col("b.off").alias("frame_offset"),
    )


def synth_audio_table(
    ids: DataFrame,
    *,
    id_col: str = "doc_id",
    n_samples: int = 16384,
    sr: int = 8000,
) -> DataFrame:
    """(track_id, blob): one deterministic chirp WAV per input id,
    synthesized distributed in Arrow batches (no driver loop)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            tids, blobs = [], []
            for i in pdf["id"]:
                tids.append(int(i))
                blobs.append(
                    synth_chirp_wav_blob(int(i), n_samples=n_samples, sr=sr)
                )
            yield pd.DataFrame(
                {"track_id": pd.Series(tids, dtype="int64"), "blob": blobs}
            )

    sel = fan_out(ids).select(F.col(id_col).alias("id"))
    return sel.mapInPandas(op, "track_id long, blob binary")


def snippet_table(
    tracks: DataFrame,
    *,
    mod: int = 10,
    offset: int = 40_000_000,
    start: int = 4096,
    length: int = 8192,
    id_col: str = "track_id",
    blob_col: str = "blob",
) -> DataFrame:
    """Exact sub-clips of every ``mod``-th track under id + offset —
    the planted query set for the oracle-checked match entry.  `start`
    must be HOP-aligned (asserted) so snippet frames coincide with
    track frames."""
    assert start % HOP == 0, "snippet start must be HOP-aligned"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            tids, blobs = [], []
            for i, b in zip(pdf["id"], pdf["blob"]):
                tids.append(int(i) + offset)
                blobs.append(clip_wav_blob(bytes(b), start, length))
            yield pd.DataFrame(
                {"track_id": pd.Series(tids, dtype="int64"), "blob": blobs}
            )

    sel = fan_out(tracks.filter(F.col(id_col) % mod == 0)).select(
        F.col(id_col).alias("id"), F.col(blob_col).alias("blob")
    )
    return sel.mapInPandas(op, "track_id long, blob binary")
