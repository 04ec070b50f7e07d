"""kNN and PIP edge cases beyond the sf0.01 oracle harness."""

from __future__ import annotations

import numpy as np
import pytest

from zcurve_spark.operators.knn import knn
from zcurve_spark.operators.pip import _pip_kernel, convex_polygon, pip_join
from zcurve_spark.sources.points import BITS, DOMAIN, points_from_lineitem

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pts(spark):
    df = points_from_lineitem(spark, SF_DIR).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def pdf(pts):
    return pts.toPandas()


def _brute_knn(pdf, q):
    d2 = (pdf.x - q["qx"]) ** 2 + (pdf.y - q["qy"]) ** 2
    t = pdf.assign(d2=d2).sort_values(["d2", "pid", "x", "y"]).head(q["k"])
    return list(map(tuple, t[["pid", "x", "y", "d2"]].values.tolist()))


class TestKnn:
    def test_corner_and_center_queries(self, pts, pdf):
        qs = [
            {"qid": 0, "qx": 0, "qy": 0, "k": 3},                      # domain corner
            {"qid": 1, "qx": DOMAIN - 1, "qy": DOMAIN - 1, "k": 7},    # far corner
            {"qid": 2, "qx": DOMAIN // 2, "qy": DOMAIN // 2, "k": 1},  # k=1
        ]
        got = knn(pts, qs, bits=BITS, domain=DOMAIN).toPandas()
        for q in qs:
            g = got[got.qid == q["qid"]].sort_values("rank")
            assert list(map(tuple, g[["pid", "x", "y", "d2"]].values.tolist())) == _brute_knn(pdf, q)

    def test_k_larger_than_initial_radius_finds_all(self, pts, pdf):
        q = {"qid": 0, "qx": 500_000, "qy": 500_000, "k": 50}
        got = knn(pts, [q], bits=BITS, domain=DOMAIN).toPandas().sort_values("rank")
        assert list(map(tuple, got[["pid", "x", "y", "d2"]].values.tolist())) == _brute_knn(pdf, q)


class TestPipKernel:
    def test_square_boundaries_inclusive(self):
        verts = np.array([(0, 0), (10, 0), (10, 10), (0, 10)], dtype=np.int64)
        px = np.array([5, 0, 10, 5, 11, -1, 0], dtype=np.int64)
        py = np.array([5, 0, 10, 10, 5, 5, 5], dtype=np.int64)
        got = _pip_kernel(px, py, verts)
        assert got.tolist() == [True, True, True, True, False, False, True]

    def test_concave_polygon(self):
        # L-shape: general ray casting must handle concavity
        verts = np.array([(0, 0), (10, 0), (10, 4), (4, 4), (4, 10), (0, 10)], dtype=np.int64)
        inside = [(2, 2), (8, 2), (2, 8), (4, 4)]
        outside = [(8, 8), (5, 5), (11, 2)]
        for (x, y), want in [(p, True) for p in inside] + [(p, False) for p in outside]:
            got = _pip_kernel(np.array([x], np.int64), np.array([y], np.int64), verts)[0]
            assert got == want, (x, y)

    def test_matches_matplotlib_free_model(self, pts, pdf):
        poly = convex_polygon(0, 400_000, 400_000, 150_000, 7, seed=2)
        hits = pip_join(pts, [poly], bits=BITS).toPandas()
        verts = np.array(poly["vertices"], dtype=np.int64)
        exp = _pip_kernel(pdf.x.to_numpy(np.int64), pdf.y.to_numpy(np.int64), verts)
        got_set = sorted(map(tuple, hits[["pid", "x", "y"]].values.tolist()))
        exp_set = sorted(map(tuple, pdf[exp][["pid", "x", "y"]].values.tolist()))
        assert got_set == exp_set


class TestKnnBatch:
    def test_matches_per_query_brute_force(self, spark, pts, pdf):
        from zcurve_spark.operators.knn import knn_batch

        qs = [
            {"qid": 0, "qx": 0, "qy": 0, "k": 3},
            {"qid": 1, "qx": DOMAIN - 1, "qy": DOMAIN - 1, "k": 7},
            {"qid": 2, "qx": DOMAIN // 2, "qy": DOMAIN // 2, "k": 1},
            {"qid": 3, "qx": 500_000, "qy": 500_000, "k": 50},
        ]
        qdf = spark.createDataFrame(
            [(q["qid"], q["qx"], q["qy"], q["k"]) for q in qs],
            "qid long, qx long, qy long, k int",
        )
        got = knn_batch(qdf, points=pts, bits=BITS, domain=DOMAIN).toPandas()
        for q in qs:
            g = got[got.qid == q["qid"]].sort_values("rank")
            assert (
                list(map(tuple, g[["pid", "x", "y", "d2"]].values.tolist()))
                == _brute_knn(pdf, q)
            ), q

    def test_reliable_checkpoint_variant(self, spark, pts, pdf, tmp_path):
        """r3 VERDICT #9: on a real cluster localCheckpoint blocks die
        with their executor; knn_batch accepts a pluggable checkpointer
        so reliable checkpoint() (shared storage) is a drop-in.  Results
        must be identical to the default path."""
        from zcurve_spark.operators.knn import knn_batch

        spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
        qs = [
            {"qid": 0, "qx": 10_000, "qy": 20_000, "k": 4},
            {"qid": 1, "qx": 800_000, "qy": 700_000, "k": 6},
        ]
        qdf = spark.createDataFrame(
            [(q["qid"], q["qx"], q["qy"], q["k"]) for q in qs],
            "qid long, qx long, qy long, k int",
        )
        got = knn_batch(
            qdf,
            points=pts,
            bits=BITS,
            domain=DOMAIN,
            checkpointer=lambda df: df.checkpoint(),
        ).toPandas()
        for q in qs:
            g = got[got.qid == q["qid"]].sort_values("rank")
            assert (
                list(map(tuple, g[["pid", "x", "y", "d2"]].values.tolist()))
                == _brute_knn(pdf, q)
            ), q

    def test_empty_query_batch(self, spark, pts):
        """r3 ADVICE: empty queries DataFrame must return an empty
        result, not crash on int(None)."""
        from zcurve_spark.operators.knn import knn_batch

        qdf = spark.createDataFrame([], "qid long, qx long, qy long, k int")
        got = knn_batch(qdf, points=pts, bits=BITS, domain=DOMAIN)
        assert got.count() == 0
        assert got.columns == ["qid", "rank", "pid", "x", "y", "d2"]

    def test_large_batch_shuffle_join_path(self, spark, pts, pdf):
        """broadcast_threshold=0 forces the shuffle-hash-join shape used
        at 10^5+ queries; results must be identical to brute force."""
        from zcurve_spark.operators.knn import knn_batch

        qs = [
            {"qid": i, "qx": (i * 97_003) % DOMAIN, "qy": (i * 193_007) % DOMAIN, "k": 5}
            for i in range(40)
        ]
        qdf = spark.createDataFrame(
            [(q["qid"], q["qx"], q["qy"], q["k"]) for q in qs],
            "qid long, qx long, qy long, k int",
        )
        got = knn_batch(
            qdf, points=pts, bits=BITS, domain=DOMAIN, broadcast_threshold=0
        ).toPandas()
        for q in qs:
            g = got[got.qid == q["qid"]].sort_values("rank")
            assert (
                list(map(tuple, g[["pid", "x", "y", "d2"]].values.tolist()))
                == _brute_knn(pdf, q)
            ), q


class TestDistanceJoin:
    def test_self_join_matches_brute_force(self, spark, pts, pdf):
        import numpy as np
        from pyspark.sql import functions as F

        from zcurve_spark.operators.distance import distance_join

        sub = pts.filter((F.col("pid") % 7) == 0)
        spdf = pdf[pdf.pid % 7 == 0].reset_index(drop=True)
        r = 20_000
        got = distance_join(sub, sub, r, dedup_pairs=True).toPandas()
        got_set = sorted(map(tuple, got[["a_id", "b_id", "d2"]].values.tolist()))
        X = spdf[["x", "y"]].to_numpy()
        ids = spdf.pid.to_numpy()
        D = ((X[:, None, :] - X[None, :, :]) ** 2).sum(axis=2)
        exp = []
        n = len(ids)
        for i in range(n):
            for j in range(n):
                if ids[i] < ids[j] and D[i, j] <= r * r:
                    exp.append((int(ids[i]), int(ids[j]), int(D[i, j])))
        assert got_set == sorted(exp)

    def test_two_sided_and_radius_edge(self, spark):
        from zcurve_spark.operators.distance import distance_join

        a = spark.createDataFrame([(1, 100, 100), (2, 500, 500)], "pid long, x long, y long")
        # exactly on the radius (d2 == r^2) must be INCLUDED (closed ball)
        b = spark.createDataFrame(
            [(10, 103, 104), (11, 100, 105), (12, 100, 106)], "pid long, x long, y long"
        )
        got = sorted(
            map(tuple, distance_join(a, b, 5).select("a_id", "b_id", "d2").collect())
        )
        assert got == [(1, 10, 25), (1, 11, 25)]

    def test_negative_coordinates(self, spark):
        """r3 ADVICE: shiftrightunsigned mis-tiled negative coords and
        silently dropped cross-sign pairs; floor-division (arithmetic
        shift) tiling must find them."""
        from zcurve_spark.operators.distance import distance_join

        a = spark.createDataFrame(
            [(1, -3, -4), (2, -500, -500)], "pid long, x long, y long"
        )
        b = spark.createDataFrame(
            [(10, 0, 0), (11, -6, -8), (12, 400, 400)], "pid long, x long, y long"
        )
        got = sorted(
            map(tuple, distance_join(a, b, 5).select("a_id", "b_id", "d2").collect())
        )
        assert got == [(1, 10, 25), (1, 11, 25)]

    def test_large_coordinate_exactness(self, spark):
        """d2 uses integer multiply, not float pow: coordinate diffs
        beyond 2^26 must still classify pairs exactly at the radius
        boundary (r3 ADVICE)."""
        from zcurve_spark.operators.distance import distance_join

        big = 1 << 28  # diff magnitude where float64 pow rounding bites
        a = spark.createDataFrame([(1, 0, 0)], "pid long, x long, y long")
        b = spark.createDataFrame(
            [(10, big + 1, 0), (11, big + 2, 0)], "pid long, x long, y long"
        )
        got = sorted(
            map(tuple, distance_join(a, b, big + 1).select("a_id", "b_id").collect())
        )
        assert got == [(1, 10)]

    def test_tile_boundary_pairs_found(self, spark):
        """Pairs straddling a tile boundary are the whole point of the
        3x3 expansion: place points on both sides of a 2^s boundary."""
        from zcurve_spark.operators.distance import distance_join

        r = 100  # s=7, tile=128
        a = spark.createDataFrame([(1, 127, 127)], "pid long, x long, y long")
        b = spark.createDataFrame([(2, 129, 130), (3, 250, 250)], "pid long, x long, y long")
        got = sorted(map(tuple, distance_join(a, b, r).select("a_id", "b_id").collect()))
        assert got == [(1, 2)]
