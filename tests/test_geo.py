"""Haversine geo distance join vs an independent Python model,
including the r4 VERDICT #5 required cases: high latitude (lon-tile
width must widen with 1/cos(lat)) and the antimeridian (tile indices
wrap modulo the band's tile count)."""

from __future__ import annotations

import math

import pytest

from zcurve_spark.operators.distance import (
    DEG2RAD,
    EARTH_R_M,
    distance_join_geo,
)


def _hav_m(lon1, lat1, lon2, lat2, R=EARTH_R_M):
    p1, p2 = lat1 * DEG2RAD, lat2 * DEG2RAD
    dphi = (lat1 - lat2) * DEG2RAD
    dlmb = (lon1 - lon2) * DEG2RAD
    h = math.sin(dphi / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dlmb / 2) ** 2
    return 2 * R * math.asin(math.sqrt(min(1.0, h)))


def _py_pairs(rows, radius_m):
    out = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = rows[i], rows[j]
            if _hav_m(a[1], a[2], b[1], b[2]) <= radius_m:
                out.add((min(a[0], b[0]), max(a[0], b[0])))
    return out


def _points():
    """Deterministic synthetic set covering the hard geometry:
    mid-lat cluster, 85-degree-lat cluster (high latitude), a pair
    straddling the antimeridian, a near-pole cluster, plus scattered
    background points."""
    pts = []
    pid = 0

    def add(lon, lat):
        nonlocal pid
        pts.append((pid, float(lon), float(lat)))
        pid += 1

    # mid-latitude cluster (~48N): spacings around the 50 km radius
    for k in range(8):
        add(10.0 + 0.13 * k, 48.0 + 0.09 * k)
    # high-latitude cluster (85N): 0.5 deg lon is only ~4.9 km here —
    # a planar-degree tiling would miss these; 1/cos(lat) must widen
    for k in range(8):
        add(-170.0 + 0.61 * k, 85.0 + 0.031 * k)
    # antimeridian pairs: +179.9x vs -179.9x, within ~20 km
    add(179.93, -12.0)
    add(-179.95, -12.05)
    add(179.99, -12.5)
    add(-179.99, 41.0)
    add(179.97, 41.03)
    # near-pole cluster: every lon is close to every other here
    add(0.0, 89.97)
    add(120.0, 89.96)
    add(-120.0, 89.98)
    # background scatter (LCG)
    h = 12345
    for _ in range(60):
        h = (h * 1103515245 + 12345) % (2**31)
        lon = (h % 360000) / 1000.0 - 180.0
        h = (h * 69069 + 1) % (2**31)
        lat = (h % 180000) / 1000.0 - 90.0
        add(lon, lat)
    return pts


@pytest.mark.parametrize("radius_m", [50_000.0, 300_000.0])
def test_matches_python_model(spark, radius_m):
    pts = _points()
    df = spark.createDataFrame(pts, "pid long, lon double, lat double")
    got = distance_join_geo(df, df, radius_m, dedup_pairs=True).toPandas()
    got_pairs = set(map(tuple, got[["a_id", "b_id"]].values.tolist()))
    expect = _py_pairs(pts, radius_m)
    assert got_pairs == expect
    # exactly once: no duplicate pair rows survive the array_distinct
    assert len(got) == len(got_pairs)


def test_high_latitude_pairs_found(spark):
    """At 85N, 0.61 deg lon ~ 5.9 km: all consecutive cluster members
    are within 25 km even though their lon gap would be ~68 km at the
    equator — the latitude-aware tile width must catch them."""
    pts = _points()
    df = spark.createDataFrame(pts, "pid long, lon double, lat double")
    got = distance_join_geo(df, df, 25_000.0, dedup_pairs=True).toPandas()
    got_pairs = set(map(tuple, got[["a_id", "b_id"]].values.tolist()))
    hi = [p for p in pts if p[2] > 84.5 and p[2] < 86]
    assert len(hi) == 8
    for i in range(len(hi) - 1):
        a, b = hi[i], hi[i + 1]
        assert _hav_m(a[1], a[2], b[1], b[2]) <= 25_000.0  # model sanity
        assert (a[0], b[0]) in got_pairs
    assert got_pairs == _py_pairs(pts, 25_000.0)


def test_antimeridian_pair_found(spark):
    pts = _points()
    df = spark.createDataFrame(pts, "pid long, lon double, lat double")
    got = distance_join_geo(df, df, 20_000.0, dedup_pairs=True).toPandas()
    got_pairs = set(map(tuple, got[["a_id", "b_id"]].values.tolist()))
    am = {p[0]: p for p in pts if abs(p[1]) > 179.9 and -12.2 < p[2] < -11.8}
    ids = sorted(am)
    assert len(ids) == 2
    a, b = am[ids[0]], am[ids[1]]
    assert _hav_m(a[1], a[2], b[1], b[2]) <= 20_000.0  # model sanity
    assert (ids[0], ids[1]) in got_pairs
    assert got_pairs == _py_pairs(pts, 20_000.0)


def test_near_pole_ring_collapses_to_one_tile(spark):
    """89.96-89.98N: lon differences of 120 deg are only a few km; the
    band's tile count collapses to 1 and all three pair up."""
    pts = _points()
    df = spark.createDataFrame(pts, "pid long, lon double, lat double")
    got = distance_join_geo(df, df, 10_000.0, dedup_pairs=True).toPandas()
    got_pairs = set(map(tuple, got[["a_id", "b_id"]].values.tolist()))
    polar = sorted(p[0] for p in pts if p[2] > 89.9)
    assert len(polar) == 3
    for i in range(3):
        for j in range(i + 1, 3):
            a = next(p for p in pts if p[0] == polar[i])
            b = next(p for p in pts if p[0] == polar[j])
            if _hav_m(a[1], a[2], b[1], b[2]) <= 10_000.0:
                assert (polar[i], polar[j]) in got_pairs
    assert got_pairs == _py_pairs(pts, 10_000.0)


def test_two_table_join_no_dedup(spark):
    """a != b tables: every (a, b) combination within radius appears,
    including both orientations when ids differ."""
    left = [(1, 10.0, 50.0), (2, 170.0, -40.0)]
    right = [(10, 10.05, 50.02), (20, -170.0, -40.0)]
    la = spark.createDataFrame(left, "pid long, lon double, lat double")
    rb = spark.createDataFrame(right, "pid long, lon double, lat double")
    got = distance_join_geo(la, rb, 10_000.0).toPandas()
    pairs = set(map(tuple, got[["a_id", "b_id"]].values.tolist()))
    assert (1, 10) in pairs  # ~4.6 km
    assert (2, 20) not in pairs  # 170E vs 170W at 40S is ~1700 km


# ---------------------------------------------------------------------------
# geodetic kNN (knn_geo_batch)
# ---------------------------------------------------------------------------

from zcurve_spark.operators.knn import knn_geo_batch  # noqa: E402


def _py_knn(pts, queries, k):
    out = {}
    for qid, qlon, qlat in queries:
        ranked = sorted(
            ((_hav_m(qlon, qlat, lon, lat), pid) for pid, lon, lat in pts)
        )[:k]
        out[qid] = [pid for _, pid in ranked]
    return out


_KNN_QUERIES = [
    (0, 10.2, 48.3),      # inside the mid-lat cluster
    (1, -170.0, 85.05),   # high latitude
    (2, 179.97, -12.2),   # antimeridian
    (3, 60.0, 89.95),     # near pole
    (4, -100.0, -55.0),   # sparse region: forces radius expansion
]


def test_knn_geo_matches_python_model(spark):
    pts = _points()
    df = spark.createDataFrame(pts, "pid long, lon double, lat double")
    qdf = spark.createDataFrame(_KNN_QUERIES, "qid long, lon double, lat double")
    got = knn_geo_batch(qdf, df, 4, n_points_hint=len(pts)).toPandas()
    expect = _py_knn(pts, _KNN_QUERIES, 4)
    assert len(got) == 4 * len(_KNN_QUERIES)
    for qid, pids in expect.items():
        sub = got[got.qid == qid].sort_values("rank")
        assert sub["pid"].tolist() == pids
        assert sub["rank"].tolist() == [1, 2, 3, 4]


def test_knn_geo_forces_multiple_rounds(spark):
    """Tiny r0 forces several expansion rounds; results must not depend
    on the round schedule."""
    pts = _points()
    df = spark.createDataFrame(pts, "pid long, lon double, lat double")
    qdf = spark.createDataFrame(_KNN_QUERIES, "qid long, lon double, lat double")
    got = knn_geo_batch(qdf, df, 3, r0_m=5_000.0).toPandas()
    expect = _py_knn(pts, _KNN_QUERIES, 3)
    for qid, pids in expect.items():
        assert got[got.qid == qid].sort_values("rank")["pid"].tolist() == pids


def test_knn_geo_whole_sphere_termination(spark):
    """k close to |points| needs the whole-sphere cap round; coverage by
    count alone must still terminate and return everything ranked."""
    pts = _points()[:6]
    df = spark.createDataFrame(pts, "pid long, lon double, lat double")
    qdf = spark.createDataFrame([(0, 0.0, 0.0)], "qid long, lon double, lat double")
    got = knn_geo_batch(qdf, df, 6, r0_m=1_000.0).toPandas()
    assert sorted(got["pid"].tolist()) == sorted(p[0] for p in pts)


def test_knn_geo_fewer_than_k_points_returns_all_ranked(spark):
    """Standard top-k semantics: |points| < k returns every point
    ranked (same as the oracle's row_number filter)."""
    pts = _points()[:3]
    df = spark.createDataFrame(pts, "pid long, lon double, lat double")
    qdf = spark.createDataFrame([(0, 0.0, 0.0)], "qid long, lon double, lat double")
    got = knn_geo_batch(qdf, df, 5, r0_m=1_000.0).toPandas()
    assert sorted(got["pid"].tolist()) == sorted(p[0] for p in pts)
    assert sorted(got["rank"].tolist()) == [1, 2, 3]


def test_knn_geo_oracle_margin_sf001(spark):
    """The CORRECTNESS oracle orders by an engine-float hav: assert the
    rank-adjacent hav gaps at every query are far above double ulp, so
    JVM-vs-DuckDB libm differences cannot flip the ranking."""
    from zcurve_spark.entry_queries import (
        GEO_KNN_K,
        GEO_KNN_QUERIES,
        _geo_points,
    )

    geo = _geo_points(spark, "/root/testdata/sf0.001").collect()
    pts = [(r["pid"], r["lon"], r["lat"]) for r in geo]
    for qid, qlon, qlat in GEO_KNN_QUERIES:
        ranked = sorted(
            ((_hav_m(qlon, qlat, lon, lat), pid) for pid, lon, lat in pts)
        )[: GEO_KNN_K + 1]
        for (d1, _), (d2, _) in zip(ranked, ranked[1:]):
            # relative gap: libm implementations agree to ~1 ulp (1e-16)
            assert (d2 - d1) / max(d2, 1e-9) > 1e-9, (qid, d1, d2)
