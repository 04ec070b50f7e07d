"""Perceptual image hashing + near-duplicate image pairs.

The media analog of the SimHash text path (operators/dedup.py): one
64-bit DCT perceptual hash (pHash) per image, then the SAME pigeonhole
banded hamming join finds every pair within a hamming radius — image
near-dup detection for a multimodal training-data pipeline (re-encoded,
re-compressed, and re-sized copies of one image collapse to hamming
<= ~12 while distinct images stay far apart; measured on the synthetic
corpus: twins 0, JPEG-q50 re-encodes 2-12, resizes 0-2, cross-image
>= 20).

Scale shape (10^12 images): decode+hash is the one genuinely-Python
stage — Arrow-batched ``mapInPandas`` over (id, blob), embarrassingly
parallel, no shuffle.  Everything after is a single long per image:
banding explodes ``n_bands`` rows each, the candidate join is an
equi-join on (band, band_bits) that AQE skew-splits hot buckets (blank
/ boilerplate images), and the verify is one ``bit_count(xor)`` on the
joined longs.  Nothing is quadratic, nothing is broadcast.

The decoders are this repo's own stdlib+numpy codecs
(sources/media.py, sources/jpeg.py) — container is auto-detected from
magic bytes, so one table may mix PNG, BMP, and JPEG payloads.  In
production the blob column is fetched from object storage by
media_ref; here payloads are synthesized deterministically
(``synth_patch_pixels``) per the sandbox's no-external-data rule.

No reference counterpart (bmuratshin/zcurve is planar-geometry only);
the banding construction cites the SimHash twin at
operators/dedup.py:simhash_neardup_pairs.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..util import fan_out
from .dedup import banded_hamming_pairs

PHASH_BITS = 64
_RESIZE = 32  # pHash working raster: 32x32 luma
_BLOCK = 8    # low-frequency DCT block: top-left 8x8 -> 64 bits


def _dct_mat(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (type-II, norm='ortho')."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


_D32 = _dct_mat(_RESIZE)


def _area_resize(g: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """Deterministic area-mean resize of a 2-D plane to (oh, ow).

    Bins are integer edge partitions (np.linspace cast to int), means
    via two reduceat passes — no interpolation kernel, so the result is
    identical on every platform/numpy build (required for oracle
    reproducibility).  Planes smaller than the target are integer-
    repeated up first so no bin is empty."""
    h, w = g.shape
    if h < oh:
        g = np.repeat(g, -(-oh // h), axis=0)
        h = g.shape[0]
    if w < ow:
        g = np.repeat(g, -(-ow // w), axis=1)
        w = g.shape[1]
    re = np.linspace(0, h, oh + 1).astype(np.int64)
    ce = np.linspace(0, w, ow + 1).astype(np.int64)
    s = np.add.reduceat(np.add.reduceat(g, re[:-1], axis=0), ce[:-1], axis=1)
    return s / (np.diff(re)[:, None] * np.diff(ce)[None, :])


def phash64_pixels(pix: np.ndarray) -> int:
    """64-bit DCT perceptual hash of an (H, W[, 3]) uint8 pixel array.

    Classic pHash: luma -> 32x32 area resize -> 2-D DCT-II -> top-left
    8x8 low-frequency block -> bit j = coefficient j > median of the
    block excluding DC.  Pure deterministic numpy; ~30 us/image.
    Returned as a Python int in [0, 2^64) (stored in Spark as the
    signed-long bit pattern; hamming = bit_count(xor) is sign-blind)."""
    p = pix.astype(np.float64)
    if p.ndim == 3:
        g = 0.299 * p[..., 0] + 0.587 * p[..., 1] + 0.114 * p[..., 2]
    else:
        g = p
    c = _D32 @ _area_resize(g, _RESIZE, _RESIZE) @ _D32.T
    block = c[:_BLOCK, :_BLOCK].ravel()
    med = np.median(block[1:])  # exclude DC from the threshold
    bits = block > med
    return int(sum(1 << j for j in range(PHASH_BITS) if bits[j]))


def decode_image_pixels(blob: bytes) -> np.ndarray:
    """Container-dispatched pixel decode using this repo's own codecs:
    PNG (inflate + filter reconstruction), BMP, baseline JPEG (Huffman
    + dequant + IDCT).  Raises ValueError on an unknown container."""
    from ..sources.media import _bmp_pixels, _png_pixels

    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        return _png_pixels(blob)
    if blob[:2] == b"BM":
        return _bmp_pixels(blob)
    if blob[:2] == b"\xff\xd8":
        from ..sources.jpeg import jpeg_decode_pixels

        return jpeg_decode_pixels(blob)
    raise ValueError(f"unknown image container: {blob[:8]!r}")


def synth_patch_pixels(
    seed: int, *, width: int = 64, height: int = 48, grid: int = 8
) -> np.ndarray:
    """Deterministic structured test image: a seeded grid x grid RGB
    block pattern upsampled to (height, width).  Unlike the gradient+
    noise images in sources/media.py, the content is LOW-frequency per
    seed, so distinct seeds stay far apart under pHash (cross-image
    hamming >= 20 measured over the test corpus) — the discrimination
    side of the near-dup contract."""
    need = grid * grid * 3
    d = hashlib.sha256(f"patch:{seed}".encode()).digest()
    pat = np.frombuffer(
        (d * (need // len(d) + 1))[:need], dtype=np.uint8
    ).reshape(grid, grid, 3)
    yi = (np.arange(height) * grid) // height
    xi = (np.arange(width) * grid) // width
    return pat[yi][:, xi]


def synth_image_table(
    ids: DataFrame,
    *,
    id_col: str = "doc_id",
    twin_mod: int | None = None,
    twin_offset: int = 30_000_000,
    width: int = 64,
    height: int = 48,
    png_filter: int = 4,
) -> DataFrame:
    """(img_id, blob): one PNG-encoded ``synth_patch_pixels`` image per
    input id, plus — for ids divisible by ``twin_mod`` — a PIXEL-
    IDENTICAL twin in a BMP container under id + twin_offset.  Twins
    hash to hamming 0 by construction (containers are lossless), which
    is what makes the planted-recall oracle exactly SQL-expressible
    (entry ``image_phash_dups``).  Distributed synthesis: encode runs in
    the executors' Arrow batches, never in a driver loop.

    ``png_filter``: scanline filter for the PNG side — 4 (Paeth,
    default) exercises the full codec in the oracle gate; the bench
    corpus uses 0 (filter-0 decode is vectorized numpy, so the measured
    row is hash+join, not the known per-byte Paeth loop)."""
    from ..sources.media import _bmp_encode, png_encode

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            img_ids: list[int] = []
            blobs: list[bytes] = []
            for i in pdf["id"]:
                i = int(i)
                pix = synth_patch_pixels(i, width=width, height=height)
                img_ids.append(i)
                blobs.append(png_encode(pix, filter_type=png_filter))
                if twin_mod is not None and i % twin_mod == 0:
                    img_ids.append(i + twin_offset)
                    blobs.append(_bmp_encode(pix))
            yield pd.DataFrame(
                {"img_id": pd.Series(img_ids, dtype="int64"), "blob": blobs}
            )

    sel = fan_out(ids).select(F.col(id_col).alias("id"))
    return sel.mapInPandas(op, "img_id long, blob binary")


def image_phash(
    images: DataFrame, *, id_col: str = "img_id", blob_col: str = "blob"
) -> DataFrame:
    """(id, ph): 64-bit perceptual hash per image blob.

    The one Python stage of the image near-dup pipeline: Arrow-batched
    ``mapInPandas`` with a per-row codec call inside the batch loop —
    codecs are inherently per-payload; the win is batched transfer and
    pipelined partitions (same rationale as
    sources/media.py:extract_features).  NULL blobs yield no row (like
    NULL texts in simhash_fingerprints).  ``fan_out`` first: a
    single-file parquet scan is ONE input partition and would serialize
    the decode."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, phs = [], []
            for i, b in zip(pdf["id"], pdf["blob"]):
                if b is None:
                    continue
                ids.append(i)
                # store the unsigned hash as its signed-long bit pattern
                ph = phash64_pixels(decode_image_pixels(bytes(b)))
                phs.append(ph - (1 << 64) if ph >= (1 << 63) else ph)
            yield pd.DataFrame({"id": pd.Series(ids, dtype="int64"),
                                "ph": pd.Series(phs, dtype="int64")})

    sel = fan_out(images).select(
        F.col(id_col).alias("id"), F.col(blob_col).alias("blob")
    )
    return sel.mapInPandas(op, "id long, ph long")


def phash_neardup_pairs(
    images: DataFrame,
    *,
    id_col: str = "img_id",
    blob_col: str = "blob",
    max_hamming: int = 12,
    n_bands: int | None = None,
    scheme: str = "auto",
    materialize_fps: bool = False,
) -> DataFrame:
    """All image pairs within pHash hamming distance <= max_hamming —
    (a_id, b_id, hamming), recall 1.0 (pigeonhole, either scheme).
    Decode+hash is the only Python stage; the pair search reuses the
    text-dedup hamming join machinery on a different fingerprint
    column.

    ``scheme``: 'banded' = divisor banding (radius 12 -> 16 tables of
    4-bit keys — fine for moderate corpora and the full JPEG-q50
    robustness radius, but the narrow keys go quadratic on large
    corpora); 'multiblock' = Manku block-combination keys (radius <= 4,
    e.g. r=3 -> 56 tables of 40-bit keys — the 10^12-image
    configuration; covers exact twins and resizes, hamming <= 2-4
    measured, though not deep JPEG re-encodes); 'auto' picks multiblock
    when the radius admits <= 64 tables, else banded.

    ``materialize_fps``: persist() the (id, ph) relation so the Python
    decode+hash stage runs ONCE — the self-join's two sides are
    disambiguated subtrees that Spark's exchange reuse does not
    collapse (2 live MapInPandas nodes, measured).  DEFAULT FALSE:
    on local[32] the block manager serializes concurrent cached reads
    (the repo's known anti-scaling gotcha) and the persist variant
    measured 2.5-12x SLOWER end-to-end than simply decoding twice
    (r3: 6s -> 16-21s; r12 banded: 28s -> 340s).  On a real cluster
    with executor-local storage the persist is the right call for an
    expensive decode — flip it there."""
    fps = image_phash(images, id_col=id_col, blob_col=blob_col)
    if materialize_fps:
        fps = fps.persist()
    if scheme == "auto":
        import math as _math

        viable = any(
            PHASH_BITS % b == 0 and _math.comb(b, max_hamming) <= 64
            for b in range(max_hamming + 1, PHASH_BITS + 1)
        )
        scheme = "multiblock" if viable and n_bands is None else "banded"
    if scheme == "multiblock":
        from .dedup import hamming_pairs_multiblock

        return hamming_pairs_multiblock(
            fps, bits=PHASH_BITS, max_hamming=max_hamming, id_col="id", fp_col="ph"
        )
    return banded_hamming_pairs(
        fps,
        bits=PHASH_BITS,
        max_hamming=max_hamming,
        n_bands=n_bands,
        id_col="id",
        fp_col="ph",
    )
