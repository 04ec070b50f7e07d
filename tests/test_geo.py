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
