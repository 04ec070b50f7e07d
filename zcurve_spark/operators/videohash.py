"""Video sub-clip matching by per-frame perceptual hash sequences.

Completes the modality family: text (dedup.py SimHash/MinHash), image
(imagehash.py pHash), audio (audiohash.py landmarks) — video reuses the
image pHash kernel per frame and the audio path's offset-voting match:
a clip matches the video whose frame-hash sequence co-occurs at ONE
consistent frame offset.  Works across containers and codecs — a
Motion-JPEG re-encoded clip still matches its uncompressed (DIB)
source, because per-frame pHash absorbs the JPEG loss (hamming <= 12
measured at q50; the banded join radius covers it) while distinct
frames stay >= 20 apart.

Scale shape (10^9 videos): decode+hash is the one Python stage
(Arrow-batched ``mapInPandas``, one row per frame).  Matching explodes
each frame hash into 16 pigeonhole bands (the imagehash/dedup banding,
radius 12 over 64 bits), equi-joins snippet vs corpus bands, verifies
``bit_count(xor)``, then votes on (snippet, video, frame offset) and
takes a deterministic per-snippet argmax — one shuffle for the join,
two partial-agg groupBys, no broadcast of the corpus, nothing
quadratic.

Containers/codecs are this repo's own (sources/media.py `_avi_frames`:
RIFF/AVI with DIB or Motion-JPEG streams; sources/jpeg.py).  No
reference counterpart (bmuratshin/zcurve is planar-geometry only).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..util import fan_out
from .dedup import simhash_bands_for
from .imagehash import PHASH_BITS, phash64_pixels, synth_patch_pixels


def video_phash_frames(
    videos: DataFrame, *, id_col: str = "video_id", blob_col: str = "blob"
) -> DataFrame:
    """(id, t, ph): one 64-bit frame pHash per decoded frame, t = frame
    index.  AVI parse (DIB or MJPG streams) + pHash, Arrow-batched;
    NULL blobs yield no rows."""
    from ..sources.media import _avi_frames

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ts, phs = [], [], []
            for i, b in zip(pdf["id"], pdf["blob"]):
                if b is None:
                    continue
                frames, _uspf = _avi_frames(bytes(b))
                for t in range(frames.shape[0]):
                    ph = phash64_pixels(frames[t])
                    ids.append(int(i))
                    ts.append(t)
                    phs.append(ph - (1 << 64) if ph >= (1 << 63) else ph)
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "t": pd.Series(ts, dtype="int64"),
                    "ph": pd.Series(phs, dtype="int64"),
                }
            )

    sel = fan_out(videos).select(F.col(id_col).alias("id"), F.col(blob_col).alias("blob"))
    return sel.mapInPandas(op, "id long, t long, ph long")


def video_match_join(
    snippets: DataFrame,
    corpus: DataFrame,
    *,
    max_hamming: int = 12,
    min_votes: int = 4,
    id_col: str = "video_id",
    blob_col: str = "blob",
) -> DataFrame:
    """Match each clip to its best corpus video:
    (snippet_id, matched_id, votes, frame_offset).

    Frame hashes within ``max_hamming`` count as the same frame (so a
    re-compressed clip matches its lossless source); votes accumulate
    per (snippet, video, t_corpus - t_snippet) and the max-vote pair
    wins (``max_by`` over a (votes, -matched_id, -offset) struct —
    deterministic under ties).  Candidate generation is the pigeonhole
    banding of operators/dedup.py:banded_hamming_pairs applied per
    frame row; recall at the radius is exact, so a true sub-clip scores
    one vote per frame while wrong videos need >= min_votes frame-level
    collisions at a single offset."""
    n_bands = simhash_bands_for(max_hamming, PHASH_BITS)
    band_bits = PHASH_BITS // n_bands

    def explode_bands(fp: DataFrame, side: str) -> DataFrame:
        return fp.select(
            F.col("id").alias(f"{side}_id"),
            F.col("t").alias(f"t{side}"),
            F.col("ph").alias(f"ph{side}"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(bidx).alias("band"),
                            F.shiftrightunsigned(F.col("ph"), bidx * band_bits)
                            .bitwiseAND(F.lit((1 << band_bits) - 1))
                            .alias("bb"),
                        )
                        for bidx in range(n_bands)
                    ]
                )
            ).alias("bs"),
        ).select(f"{side}_id", f"t{side}", f"ph{side}", "bs.band", "bs.bb")

    sfp = explode_bands(
        video_phash_frames(snippets, id_col=id_col, blob_col=blob_col), "s"
    )
    cfp = explode_bands(
        video_phash_frames(corpus, id_col=id_col, blob_col=blob_col), "c"
    )
    # (snippet and corpus fingerprints are DIFFERENT subtrees — each
    # Python stage runs once regardless of join strategy, and AQE's
    # broadcast of the small snippet side streams the corpus without a
    # shuffle, which is the right 10^9-video plan)
    cand = (
        sfp.join(cfp, ["band", "bb"])
        .filter(
            F.bit_count(F.col("phs").bitwiseXOR(F.col("phc"))) <= max_hamming
        )
        .select("s_id", "c_id", "ts", "tc")
        .dropDuplicates(["s_id", "c_id", "ts", "tc"])
    )
    votes = (
        cand.groupBy(
            F.col("s_id").alias("snippet_id"),
            F.col("c_id").alias("matched_id"),
            (F.col("tc") - F.col("ts")).alias("off"),
        )
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


def synth_video_table(
    ids: DataFrame,
    *,
    id_col: str = "doc_id",
    n_frames: int = 24,
    width: int = 64,
    height: int = 48,
    codec: str = "DIB",
) -> DataFrame:
    """(video_id, blob): one AVI per input id whose frames are DISTINCT
    seeded patch images (frame j of video v uses seed v * 1009 + j) —
    per-frame-unique low-frequency content, so frame hashes identify
    (video, position) pairs and offset votes are discriminative.
    Distributed synthesis in Arrow batches."""
    from ..sources.media import _avi_encode

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids, blobs = [], []
            for i in pdf["id"]:
                i = int(i)
                frames = [
                    synth_patch_pixels(i * 1009 + j, width=width, height=height)
                    for j in range(n_frames)
                ]
                vids.append(i)
                blobs.append(_avi_encode(frames, codec=codec))
            yield pd.DataFrame(
                {"video_id": pd.Series(vids, dtype="int64"), "blob": blobs}
            )

    sel = fan_out(ids).select(F.col(id_col).alias("id"))
    return sel.mapInPandas(op, "video_id long, blob binary")


def video_snippet_table(
    videos: DataFrame,
    *,
    mod: int = 10,
    offset: int = 50_000_000,
    start: int = 8,
    length: int = 8,
    codec: str = "MJPG",
    id_col: str = "video_id",
    blob_col: str = "blob",
) -> DataFrame:
    """Sub-clips (frames [start, start+length)) of every ``mod``-th
    video under id + offset, RE-ENCODED with ``codec`` — default MJPG,
    so the planted clips are lossy-compressed copies and the match must
    cross the codec boundary (the realistic case)."""
    from ..sources.media import _avi_encode, _avi_frames

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids, blobs = [], []
            for i, b in zip(pdf["id"], pdf["blob"]):
                frames, _uspf = _avi_frames(bytes(b))
                clip = [frames[t] for t in range(start, start + length)]
                vids.append(int(i) + offset)
                blobs.append(_avi_encode(clip, codec=codec))
            yield pd.DataFrame(
                {"video_id": pd.Series(vids, dtype="int64"), "blob": blobs}
            )

    sel = fan_out(videos.filter(F.col(id_col) % mod == 0)).select(
        F.col(id_col).alias("id"), F.col(blob_col).alias("blob")
    )
    return sel.mapInPandas(op, "video_id long, blob binary")
