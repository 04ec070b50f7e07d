"""Grid-DBSCAN (operators/cluster.py) and benchmark decontamination
(operators/dedup.py decontaminate) unit tests.  The sf0.01 entry-level
oracle equivalence lives in test_entry.py; these cover the operator
semantics on constructed inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from zcurve_spark.operators.cluster import (
    CELL_ID_BASE,
    cell_counts,
    cluster_summary,
    dense_cells,
    grid_cluster,
)
from zcurve_spark.operators.dedup import decontaminate


def _pts(spark, cells, per_cell, shift=4):
    """per_cell points inside each (cx, cy) cell of a 2^shift grid."""
    rows = []
    for cx, cy in cells:
        for i in range(per_cell):
            rows.append((cx * (1 << shift) + i % (1 << shift),
                         cy * (1 << shift) + (i * 7) % (1 << shift)))
    return spark.createDataFrame(rows, "x long, y long")


class TestGridCluster:
    def test_two_blobs_absolute_minpts(self, spark):
        # dense L-shape at (0,0)-(0,1)-(1,1); separate blob at (5,5);
        # sparse noise at (3,0) below min_pts
        pts = _pts(spark, [(0, 0), (0, 1), (1, 1), (5, 5)], 10, shift=4).unionByName(
            _pts(spark, [(3, 0)], 2, shift=4)
        )
        lab = grid_cluster(pts, cell_shift=4, min_pts=10).collect()
        assert len(lab) == 4  # noise cell dropped
        comp = {(r["cx"], r["cy"]): r["cluster_id"] for r in lab}
        l_shape = {comp[(0, 0)], comp[(0, 1)], comp[(1, 1)]}
        assert len(l_shape) == 1  # 8-connected (incl. the diagonal)
        assert comp[(5, 5)] != comp[(0, 0)]
        # labels are the min cell id of the component
        assert comp[(0, 0)] == 0 * CELL_ID_BASE + 0
        assert comp[(5, 5)] == 5 * CELL_ID_BASE + 5

    def test_diagonal_is_connected(self, spark):
        pts = _pts(spark, [(0, 0), (1, 1), (2, 2)], 5, shift=4)
        lab = grid_cluster(pts, cell_shift=4, min_pts=5).collect()
        assert len({r["cluster_id"] for r in lab}) == 1

    def test_isolated_dense_cell_labels_itself(self, spark):
        pts = _pts(spark, [(2, 3)], 8, shift=4)
        lab = grid_cluster(pts, cell_shift=4, min_pts=8).collect()
        assert len(lab) == 1
        assert lab[0]["cluster_id"] == 2 * CELL_ID_BASE + 3

    def test_relative_threshold_all_integer(self, spark):
        # 3 cells with counts 10, 10, 40: mean 20; 23/20 x mean = 23
        # -> only the 40 cell is dense
        pts = _pts(spark, [(0, 0)], 10).unionByName(
            _pts(spark, [(4, 4)], 10)
        ).unionByName(_pts(spark, [(8, 8)], 40))
        d = dense_cells(
            cell_counts(pts, cell_shift=4), rel_num=23, rel_den=20
        ).collect()
        assert [(r["cx"], r["cy"], r["cnt"]) for r in d] == [(8, 8, 40)]

    def test_summary_counts_points(self, spark):
        pts = _pts(spark, [(0, 0), (0, 1)], 10, shift=4)
        s = cluster_summary(grid_cluster(pts, cell_shift=4, min_pts=10)).collect()
        assert len(s) == 1
        assert (s[0]["n_cells"], s[0]["n_points"]) == (2, 20)

    def test_single_pass_over_points(self, spark):
        """The point table is scanned exactly once: reuse a pre-built
        cell_counts relation (points never re-read downstream)."""
        pts = _pts(spark, [(0, 0), (5, 5)], 10, shift=4)
        cells = cell_counts(pts, cell_shift=4)
        lab = grid_cluster(cells, min_pts=10)  # accepts the cnt relation
        assert lab.count() == 2


class TestDecontaminate:
    def _corpus(self, spark):
        return spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog"),
                (2, "a totally unrelated document about spark plans"),
                (3, "quick brown fox jumps right over everything else"),
            ],
            "doc_id long, text string",
        )

    def _bench(self, spark):
        return spark.createDataFrame(
            [(100, "we ask about the quick brown fox jumps here")],
            "doc_id long, text string",
        )

    def test_hits_and_counts(self, spark):
        out = {
            r["doc_id"]: r["n_hits"]
            for r in decontaminate(
                self._corpus(spark), self._bench(spark), n=4
            ).collect()
        }
        # doc 1 shares 'the quick brown fox' and 'quick brown fox jumps';
        # doc 3 shares 'quick brown fox jumps'; doc 2 is clean
        assert out == {1: 2, 3: 1}

    def test_min_hits_threshold(self, spark):
        out = decontaminate(
            self._corpus(spark), self._bench(spark), n=4, min_hits=2
        ).collect()
        assert [(r["doc_id"], r["n_hits"]) for r in out] == [(1, 2)]

    def test_return_clean_preserves_schema(self, spark):
        corpus = self._corpus(spark)
        clean = decontaminate(
            corpus, self._bench(spark), n=4, return_clean=True
        )
        assert clean.columns == corpus.columns
        assert [r["doc_id"] for r in clean.collect()] == [2]

    def test_shuffled_join_path_matches_broadcast(self, spark):
        a = decontaminate(
            self._corpus(spark), self._bench(spark), n=4,
            broadcast_benchmark=True,
        ).collect()
        b = decontaminate(
            self._corpus(spark), self._bench(spark), n=4,
            broadcast_benchmark=False,
        ).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_distinct_grams_counted_once(self, spark):
        # the repeated contaminated gram in one doc counts once
        corpus = spark.createDataFrame(
            [(1, "x y z w and then x y z w again")], "doc_id long, text string"
        )
        bench = spark.createDataFrame(
            [(9, "x y z w")], "doc_id long, text string"
        )
        out = decontaminate(corpus, bench, n=4).collect()
        assert [(r["doc_id"], r["n_hits"]) for r in out] == [(1, 1)]

    def test_no_overlap_is_empty(self, spark):
        bench = spark.createDataFrame(
            [(9, "completely disjoint vocabulary only")], "doc_id long, text string"
        )
        assert decontaminate(self._corpus(spark), bench, n=4).count() == 0
