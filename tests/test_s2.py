"""S2 cell IDs: numpy kernel invariants + the Spark column surface.

No S2 library ships in this container, so correctness is established
by the scheme's defining invariants (all of which a wrong
implementation of the published algorithm breaks):

* cube-face assignment of the six cardinal directions,
* face/(u,v) projection round-trips through xyz,
* st<->uv quadratic transform round-trips,
* per-face Hilbert (i,j)<->pos round-trips and curve continuity,
* leaf-center re-encode is the identity,
* parent ranges contain children and parent centers,
* the signed-long reinterpretation keeps BETWEEN containment exact.

If `s2sphere` is ever installed the bit-exactness test below runs
against it automatically.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from zcurve_spark.functions import s2


@pytest.fixture(scope="module")
def sample():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180.0, 180.0, 20000)
    lat = np.degrees(np.arcsin(rng.uniform(-1.0, 1.0, 20000)))  # area-uniform
    return lon, lat


def test_cardinal_faces():
    pts = np.array(
        [[0, 0], [90, 0], [0, 90], [180, 0], [-90, 0], [0, -90]], dtype=float
    )
    cid = s2.s2_cellid(pts[:, 0], pts[:, 1])
    assert list((cid >> np.uint64(61)).astype(int)) == [0, 1, 2, 3, 4, 5]


def test_face_uv_roundtrip():
    rng = np.random.default_rng(1)
    v = rng.normal(size=(60000, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    face, u, vv = s2._face_uv_from_xyz(v[:, 0], v[:, 1], v[:, 2])
    x, y, z = s2._xyz_from_face_uv(face, u, vv)
    n = np.sqrt(x * x + y * y + z * z)
    assert np.abs(np.stack([x, y, z], 1) / n[:, None] - v).max() < 1e-9


def test_st_uv_roundtrip():
    s = np.linspace(0.0, 1.0, 100001)
    assert np.allclose(s2.uv_to_st(s2.st_to_uv(s)), s, atol=1e-12)
    u = np.linspace(-1.0, 1.0, 100001)
    assert np.allclose(s2.st_to_uv(s2.uv_to_st(u)), u, atol=1e-12)


def test_hilbert_pos_roundtrip_every_face():
    rng = np.random.default_rng(3)
    i = rng.integers(0, 1 << 30, 50000).astype(np.uint64)
    j = rng.integers(0, 1 << 30, 50000).astype(np.uint64)
    for f in range(6):
        fa = np.full_like(i, f)
        i2, j2 = s2._ij_from_pos(fa, s2._pos_from_ij(fa, i, j))
        assert (i2 == i).all() and (j2 == j).all()


def test_hilbert_continuity():
    # walking consecutive level-6 blocks moves exactly one block in ij
    pos = np.arange(4096, dtype=np.uint64) << np.uint64(2 * (30 - 6))
    for f in range(6):
        i, j = s2._ij_from_pos(np.full_like(pos, f), pos)
        ib = (i >> np.uint64(24)).astype(np.int64)
        jb = (j >> np.uint64(24)).astype(np.int64)
        assert (np.abs(np.diff(ib)) + np.abs(np.diff(jb)) == 1).all()


def test_leaf_center_identity(sample):
    lon, lat = sample
    cid = s2.s2_cellid(lon, lat)
    assert (cid & np.uint64(1)).all()
    assert (s2.s2_level(cid) == 30).all()
    clon, clat = s2.s2_cell_center_lonlat(cid)
    assert (s2.s2_cellid(clon, clat) == cid).all()


def test_parent_ranges(sample):
    lon, lat = sample
    cid = s2.s2_cellid(lon, lat)
    for lvl in (0, 5, 12, 20, 29):
        p = s2.s2_parent(cid, lvl)
        assert (s2.s2_level(p) == lvl).all()
        assert (s2.s2_range_min(p) <= cid).all()
        assert (cid <= s2.s2_range_max(p)).all()
        plon, plat = s2.s2_cell_center_lonlat(p)
        leaf = s2.s2_cellid(plon, plat)
        assert (s2.s2_range_min(p) <= leaf).all()
        assert (leaf <= s2.s2_range_max(p)).all()
        # grandparent is consistent whichever path you take
        if lvl >= 5:
            assert (s2.s2_parent(p, lvl - 5) == s2.s2_parent(cid, lvl - 5)).all()


def test_signed_reinterpretation_keeps_between(sample):
    """A cell's leaf range never crosses the uint64 sign boundary (it
    never crosses faces), so two's-complement longs keep BETWEEN exact —
    the property the Spark range joins rely on."""
    lon, lat = sample
    cid = s2.s2_cellid(lon, lat)
    for lvl in (2, 10, 18):
        p = s2.s2_parent(cid, lvl)
        lo = s2.s2_range_min(p).view(np.int64)
        hi = s2.s2_range_max(p).view(np.int64)
        c = cid.view(np.int64)
        assert (lo <= c).all() and (c <= hi).all()
        assert (lo <= hi).all()


def test_bit_exact_vs_s2sphere(sample):
    s2sphere = pytest.importorskip("s2sphere")
    lon, lat = sample
    cid = s2.s2_cellid(lon[:500], lat[:500])
    for k in range(500):
        ref = s2sphere.CellId.from_lat_lng(
            s2sphere.LatLng.from_degrees(lat[k], lon[k])
        ).id()
        assert int(cid[k]) == ref


def test_spark_s2_cells_match_numpy(spark):
    from zcurve_spark.sources.interleaved import (
        explode_spans,
        interleaved_docs,
        with_span_geo,
    )
    from tests.conftest import SF_DIR

    spans = with_span_geo(explode_spans(interleaved_docs(spark, SF_DIR)))
    out = spans.select(
        "doc_id",
        "span_idx",
        "lon",
        "lat",
        s2.s2_cell_col("lon", "lat").alias("leaf"),
        s2.s2_cell_col("lon", "lat", level=8).alias("cell8"),
        s2.s2_level_udf(s2.s2_cell_col("lon", "lat", level=8)).alias("lvl8"),
    ).collect()
    assert len(out) > 0
    lon = np.array([r["lon"] for r in out])
    lat = np.array([r["lat"] for r in out])
    leaf = np.array([r["leaf"] for r in out], dtype=np.int64).view(np.uint64)
    cell8 = np.array([r["cell8"] for r in out], dtype=np.int64).view(np.uint64)
    assert (leaf == s2.s2_cellid(lon, lat)).all()
    assert (cell8 == s2.s2_parent(s2.s2_cellid(lon, lat), 8)).all()
    assert all(r["lvl8"] == 8 for r in out)


def test_spark_s2_containment_join(spark):
    """Level-6 cells contain exactly their own leaves under a signed
    BETWEEN range join — the S2 analog of the curve-interval query."""
    from zcurve_spark.sources.interleaved import (
        explode_spans,
        interleaved_docs,
        with_span_geo,
    )
    from tests.conftest import SF_DIR

    spans = with_span_geo(explode_spans(interleaved_docs(spark, SF_DIR))).select(
        "doc_id", "span_idx", s2.s2_cell_col("lon", "lat").alias("leaf"),
        s2.s2_cell_col("lon", "lat", level=6).alias("cell6"),
    )
    cells = spans.select("cell6").distinct().limit(20).collect()
    ids = np.array([r["cell6"] for r in cells], dtype=np.int64).view(np.uint64)
    lo = s2.s2_range_min(ids).view(np.int64)
    hi = s2.s2_range_max(ids).view(np.int64)
    for k in range(len(cells)):
        got = spans.filter(
            (F.col("leaf") >= int(lo[k])) & (F.col("leaf") <= int(hi[k]))
        )
        expect = spans.filter(F.col("cell6") == int(ids.view(np.int64)[k]))
        assert got.count() == expect.count()
        assert got.exceptAll(expect).count() == 0


def test_cover_rect_superset():
    """Every cell containing a point of the rect is in the cover, for
    rects probing the hard cases: antimeridian-adjacent, near-pole,
    face-corner, face-center."""
    rng = np.random.default_rng(11)
    rects = [
        (10.0, 40.0, 20.0, 45.0),
        (170.0, 179.9, 60.0, 89.0),
        (-30.0, 30.0, 80.0, 89.9),
        (-1.0, 1.0, -1.0, 1.0),
        (44.0, 46.0, 34.0, 36.0),
    ]
    for level in (4, 8):
        for a, b, c, d in rects:
            cover = set(s2.s2_cover_rect(a, b, c, d, level).tolist())
            lon = rng.uniform(a, b, 20000)
            lat = rng.uniform(c, d, 20000)
            cells = set(
                np.unique(s2.s2_parent(s2.s2_cellid(lon, lat), level)).tolist()
            )
            assert cells <= cover, (level, a, b, c, d)
            # and it actually prunes: far fewer cells than the sphere's
            # 6*4^level total
            assert len(cover) < 6 * 4**level / 4


def test_spark_bbox_rows_s2_equals_plain_predicate(spark):
    """The cover pre-filter + refine returns exactly the rows of the
    plain lon/lat predicate (superset property end-to-end in Spark)."""
    from zcurve_spark.entry_queries import S2_BOX, q_bbox_rows_s2
    from zcurve_spark.sources.interleaved import (
        explode_spans,
        interleaved_docs,
        with_span_geo,
    )
    from tests.conftest import SF_DIR

    got = {tuple(r) for r in q_bbox_rows_s2(spark, SF_DIR).collect()}
    lon_lo, lon_hi, lat_lo, lat_hi = S2_BOX
    spans = with_span_geo(explode_spans(interleaved_docs(spark, SF_DIR)))
    want = {
        tuple(r)
        for r in spans.filter(
            (F.col("lon") >= lon_lo)
            & (F.col("lon") <= lon_hi)
            & (F.col("lat") >= lat_lo)
            & (F.col("lat") <= lat_hi)
        )
        .select("doc_id", "span_idx", "lon", "lat")
        .collect()
    }
    assert got == want
    assert len(got) > 0


def test_spark_bbox_rows_s2_pruned_store(spark):
    """Store-backed S2 box query: equals the unpruned S2 query (and so
    the plain predicate), and the cover's merged interval runs actually
    SKIP manifest files."""
    from zcurve_spark.entry_queries import (
        S2_BOX,
        S2_COVER_LEVEL,
        q_bbox_rows_s2,
        q_bbox_rows_s2_pruned,
    )
    from zcurve_spark.sources.manifest import load_manifest, prune_files
    from zcurve_spark.sources.store import s2_spans_store
    from tests.conftest import SF_DIR

    got = {tuple(r) for r in q_bbox_rows_s2_pruned(spark, SF_DIR).collect()}
    want = {tuple(r) for r in q_bbox_rows_s2(spark, SF_DIR).collect()}
    assert got == want
    assert len(got) > 0

    path = s2_spans_store(spark, SF_DIR)
    manifest = load_manifest(path)
    ivs = s2.s2_cover_intervals(*S2_BOX, S2_COVER_LEVEL)
    names = prune_files(manifest, [(int(a), int(b)) for a, b in ivs])
    assert 0 < len(names) < len(manifest["files"])
    # the merged runs are sorted, non-overlapping, and far fewer than
    # the raw cover cells (Hilbert locality)
    assert (ivs[1:, 0] > ivs[:-1, 1]).all()
    assert len(ivs) * 10 < len(s2.s2_cover_rect(*S2_BOX, S2_COVER_LEVEL))


def test_s2_query_plans(spark):
    """Plan shape at scale: the cover joins as a broadcast SEMI join
    (never a nested loop / IN-literal blowup), and the store path
    pushes the sort-key BETWEEN plus both coordinate bounds all the
    way into the parquet scan (row-group pruning)."""
    import io
    from contextlib import redirect_stdout

    from zcurve_spark.entry_queries import q_bbox_rows_s2, q_bbox_rows_s2_pruned
    from tests.conftest import SF_DIR

    buf = io.StringIO()
    with redirect_stdout(buf):
        q_bbox_rows_s2(spark, SF_DIR).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin LeftSemi" in plan, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

    buf = io.StringIO()
    with redirect_stdout(buf):
        q_bbox_rows_s2_pruned(spark, SF_DIR).explain("formatted")
    plan = buf.getvalue()
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed, plan[:2000]
    line = pushed[0]
    for frag in (
        "GreaterThanOrEqual(s2key,",
        "LessThanOrEqual(s2key,",
        "GreaterThanOrEqual(lon,0.0)",
        "LessThanOrEqual(lat,45.0)",
    ):
        assert frag in line, line


def test_block_lut_walk_matches_per_level_steps():
    """r6 optimization guard: the 4-level block-LUT Hilbert walk (and its
    early-stop level-L prefix form) must be bit-identical to the original
    per-level orientation walk."""
    import numpy as np

    from zcurve_spark.functions.s2 import (
        MAX_LEVEL,
        _face_uv_from_xyz,
        _pos_from_ij,
        _pos_from_ij_steps,
        _st_to_ij,
        _xyz_from_lonlat,
        s2_cellid,
        s2_parent,
        uv_to_st,
    )

    rng = np.random.RandomState(7)
    lon = rng.uniform(-180.0, 180.0, 20000)
    lat = rng.uniform(-90.0, 90.0, 20000)
    x, y, z = _xyz_from_lonlat(lon, lat)
    face, u, v = _face_uv_from_xyz(x, y, z)
    i = _st_to_ij(uv_to_st(u))
    j = _st_to_ij(uv_to_st(v))
    assert np.array_equal(_pos_from_ij(face, i, j), _pos_from_ij_steps(face, i, j))
    # early-stop prefix == full walk >> 2*(30-L), and the assembled
    # parent id == s2_parent(leaf, L)
    leaf = s2_cellid(lon, lat)
    full = _pos_from_ij_steps(face, i, j)
    for L in (0, 1, 2, 5, 8, 13, 29):
        pref = _pos_from_ij(face, i, j, level=L)
        assert np.array_equal(pref, full >> np.uint64(2 * (MAX_LEVEL - L)))
        shift = np.uint64(2 * (MAX_LEVEL - L))
        cid = (
            (np.asarray(face, dtype=np.uint64) << np.uint64(61))
            | (pref << (shift + np.uint64(1)))
            | (np.uint64(1) << shift)
        )
        assert np.array_equal(cid, s2_parent(leaf, L))
