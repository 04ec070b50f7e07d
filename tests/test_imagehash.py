"""Perceptual image hash (pHash) + banded near-dup pairs
(operators/imagehash.py): kernel determinism, robustness/discrimination
margins, exact recall of the banded join vs brute force, and the plan
shape (no cartesian product — the pair search must stay an equi-join)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from zcurve_spark.operators.imagehash import (
    PHASH_BITS,
    decode_image_pixels,
    image_phash,
    phash64_pixels,
    phash_neardup_pairs,
    synth_image_table,
    synth_patch_pixels,
)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_phash_container_invariance():
    """Pixel-identical PNG / BMP / (lossless-pixel) arrays hash equal —
    the hash is of the IMAGE, not the container bytes."""
    from zcurve_spark.sources.media import _bmp_encode, png_encode

    for seed in range(6):
        pix = synth_patch_pixels(seed)
        h_raw = phash64_pixels(pix)
        h_png = phash64_pixels(decode_image_pixels(png_encode(pix)))
        h_bmp = phash64_pixels(decode_image_pixels(_bmp_encode(pix)))
        assert h_raw == h_png == h_bmp


def test_phash_robust_to_jpeg_and_resize_but_discriminative():
    """The near-dup margin the banding radius relies on: lossy JPEG
    re-encodes and re-renders stay within hamming 12; distinct images
    stay strictly above it."""
    from zcurve_spark.sources.jpeg import jpeg_decode_pixels, jpeg_encode

    hs = {}
    for seed in range(10):
        pix = synth_patch_pixels(seed)
        hs[seed] = phash64_pixels(pix)
        jp = jpeg_decode_pixels(
            jpeg_encode(pix, quality=50, subsample=seed % 2 == 1)
        )
        assert _ham(hs[seed], phash64_pixels(jp)) <= 12
        big = synth_patch_pixels(seed, width=96, height=72)
        assert _ham(hs[seed], phash64_pixels(big)) <= 4
    cross = [
        _ham(hs[a], hs[b]) for a in range(10) for b in range(a + 1, 10)
    ]
    assert min(cross) > 12


def test_phash_grayscale_and_unknown_container():
    g = synth_patch_pixels(3)[..., 0]  # 2-D plane
    assert 0 <= phash64_pixels(g) < (1 << 64)
    with pytest.raises(ValueError, match="unknown image container"):
        decode_image_pixels(b"\x00\x01\x02\x03deadbeef")


def test_banded_pairs_equal_brute_force(spark):
    """Recall 1.0 and precision 1.0: the banded equi-join returns
    EXACTLY the brute-force pair set at the radius, planted twins
    (hamming 0) included."""
    ids = spark.range(0, 40).select(F.col("id").alias("doc_id"))
    imgs = synth_image_table(ids, twin_mod=5, twin_offset=1000)
    fps = {r["id"]: r["ph"] for r in image_phash(imgs, id_col="img_id").collect()}
    assert len(fps) == 48  # 40 base + 8 twins
    brute = sorted(
        (a, b, _ham(fps[a], fps[b]))
        for a in fps
        for b in fps
        if a < b and _ham(fps[a], fps[b]) <= 12
    )
    got = sorted(
        (r["a_id"], r["b_id"], r["hamming"])
        for r in phash_neardup_pairs(imgs, max_hamming=12).collect()
    )
    assert got == brute
    assert sum(1 for a, b, h in got if b == a + 1000 and h == 0) == 8


def test_null_blob_rows_are_skipped(spark):
    df = spark.createDataFrame(
        [(1, None)], "img_id long, blob binary"
    ).unionByName(
        synth_image_table(
            spark.range(0, 3).select(F.col("id").alias("doc_id"))
        )
    )
    out = image_phash(df, id_col="img_id").collect()
    assert sorted(r["id"] for r in out) == [0, 1, 2]


def test_phash_plan_is_equi_join_no_cartesian(spark):
    """Scale-shape guard: the pair search must be a shuffled equi-join
    on (band, band_bits) — never a cartesian/broadcast-nested-loop."""
    ids = spark.range(0, 20).select(F.col("id").alias("doc_id"))
    pairs = phash_neardup_pairs(synth_image_table(ids), max_hamming=12)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
    # any hash/merge EQUI-join is fine (tiny inputs broadcast; at scale
    # AQE picks shuffled variants on the same logical plan)
    assert any(
        j in plan
        for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    )


def test_multiblock_equals_brute_force(spark):
    """The Manku block-combination scheme (r=3 -> 56 tables of 40-bit
    keys) returns exactly the brute-force pair set, twins included."""
    from zcurve_spark.operators.dedup import hamming_pairs_multiblock

    ids = spark.range(0, 30).select(F.col("id").alias("doc_id"))
    imgs = synth_image_table(ids, twin_mod=6, twin_offset=500)
    fps_df = image_phash(imgs, id_col="img_id")
    fps = {r["id"]: r["ph"] for r in fps_df.collect()}
    brute = sorted(
        (a, b, _ham(fps[a], fps[b]))
        for a in fps
        for b in fps
        if a < b and _ham(fps[a], fps[b]) <= 3
    )
    got = sorted(
        (r["a_id"], r["b_id"], r["hamming"])
        for r in hamming_pairs_multiblock(
            fps_df, bits=64, max_hamming=3, fp_col="ph"
        ).collect()
    )
    assert got == brute
    assert sum(1 for a, b, h in got if b == a + 500 and h == 0) == 5


def test_multiblock_sign_bit_and_bad_radius(spark):
    from zcurve_spark.operators.dedup import hamming_pairs_multiblock

    a = (1 << 63) | 0b1011
    b = a ^ (1 << 62) ^ 1       # hamming 2
    c = (1 << 40) - 1           # far away
    rows = [(1, a - (1 << 64)), (2, b - (1 << 64)), (3, c)]
    fps = spark.createDataFrame(rows, "id long, fp long")
    got = sorted(
        (r["a_id"], r["b_id"], r["hamming"])
        for r in hamming_pairs_multiblock(fps, bits=64, max_hamming=3).collect()
    )
    assert got == [(1, 2, 2)]
    with pytest.raises(ValueError, match="use banded_hamming_pairs"):
        hamming_pairs_multiblock(fps, bits=64, max_hamming=12)


def test_scheme_auto_picks_multiblock_for_small_radius(spark):
    """auto at r<=4 must route to multiblock (wide keys); the r=12
    default stays on divisor banding."""
    ids = spark.range(0, 10).select(F.col("id").alias("doc_id"))
    imgs = synth_image_table(ids, twin_mod=5, twin_offset=100)
    p3 = phash_neardup_pairs(imgs, max_hamming=3)
    plan3 = p3._jdf.queryExecution().optimizedPlan().toString()
    assert "tbl" in plan3  # multiblock table column
    p12 = phash_neardup_pairs(imgs, max_hamming=12)
    plan12 = p12._jdf.queryExecution().optimizedPlan().toString()
    assert "band" in plan12 and "tbl" not in plan12
    # both find the planted twins
    twins3 = {(r["a_id"], r["b_id"]) for r in p3.collect() if r["hamming"] == 0}
    assert {(i, i + 100) for i in (0, 5)} <= twins3


def test_full64_bit_fingerprints_band_correctly(spark):
    """Fingerprints with the sign bit set (>= 2^63, stored as negative
    longs) must band and verify identically — shiftrightunsigned is the
    load-bearing detail."""
    from zcurve_spark.operators.dedup import banded_hamming_pairs

    a = (1 << 63) | 0b1011  # negative as signed long
    b = a ^ (1 << 62) ^ 1   # hamming 2 from a
    c = (1 << 40) - 1       # 40 low bits set: hamming 38 from a
    rows = [(1, a - (1 << 64)), (2, b - (1 << 64)), (3, c)]
    fps = spark.createDataFrame(rows, "id long, fp long")
    got = sorted(
        (r["a_id"], r["b_id"], r["hamming"])
        for r in banded_hamming_pairs(
            fps, bits=PHASH_BITS, max_hamming=4
        ).collect()
    )
    assert got == [(1, 2, 2)]
