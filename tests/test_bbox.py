"""Differential end-to-end bbox tests mirroring gentest.awk (SURVEY.md
§5.2 item 3): engine row sets == brute-force closed-box predicate, 2D and
3D, single lookups and batched joins, plus partitioning invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from zcurve_spark.operators.bbox import (
    bbox_join,
    bbox_join_bucketed,
    bbox_lookup,
    bucketed_intervals_df,
    count_boxes,
    count_hits,
    intervals_df,
)
from zcurve_spark.sources.points import (
    BITS,
    boxes_df,
    deterministic_boxes,
    points_from_lineitem,
    unaligned_boxes,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pts(spark):
    df = points_from_lineitem(spark, SF_DIR).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def pdf(pts):
    return pts.toPandas()


def _rowset(df):
    return sorted(map(tuple, df.values.tolist()))


def _brute(pdf, b):
    m = np.ones(len(pdf), dtype=bool)
    for c, lo, hi in zip(("x", "y", "z"), b["mins"], b["maxs"]):
        m &= (pdf[c] >= lo) & (pdf[c] <= hi)
    return pdf[m]


# big enough boxes to actually hit rows at sf0.001 (~6k points / 10^12 area)
def _big_boxes(n, ndims=2):
    out = []
    for qid in range(n):
        h = (qid * 2654435761 + 99991) % (2**31)
        mins, maxs = [], []
        for _ in range(ndims):
            h = (h * 1103515245 + 12345) % (2**31)
            lo = h % 800_000
            mins.append(lo)
            maxs.append(lo + 150_000)
        out.append({"qid": qid, "mins": tuple(mins), "maxs": tuple(maxs)})
    return out


class TestBboxLookup:
    def test_2d_exact_vs_brute_force(self, pts, pdf):
        for b in _big_boxes(4) + unaligned_boxes(3):
            got = bbox_lookup(pts, b["mins"], b["maxs"], bits=BITS).toPandas()
            exp = _brute(pdf, b)
            # pid is not unique in the synthetic lineitem -> compare row
            # multisets (matches the driver's order-insensitive hash)
            assert _rowset(got) == _rowset(exp[["pid", "x", "y"]]), b

    def test_3d_exact_vs_brute_force(self, pts, pdf):
        for b in _big_boxes(3, ndims=3):
            got = bbox_lookup(
                pts, b["mins"], b["maxs"], zkey_col="zkey3",
                coord_cols=("x", "y", "z"), bits=BITS,
            ).toPandas()
            exp = _brute(pdf, b)
            assert _rowset(got) == _rowset(exp[["pid", "x", "y", "z"]]), b

    def test_curve_order_variant(self, pts, pdf):
        """*_tidonly parity: no sort -> same row set."""
        b = _big_boxes(1)[0]
        got = bbox_lookup(pts, b["mins"], b["maxs"], bits=BITS, sort_by_id=False).toPandas()
        exp = _brute(pdf, b)
        assert sorted(got.pid) == sorted(exp.pid)

    def test_empty_box(self, pts):
        got = bbox_lookup(pts, (0, 0), (0, 0), bits=BITS).count()
        assert got == 0

    def test_budget_independence(self, pts, pdf):
        b = unaligned_boxes(1)[0]
        exp = _rowset(_brute(pdf, b)[["pid", "x", "y"]])
        for budget in (1, 4, 1024):
            got = bbox_lookup(pts, b["mins"], b["maxs"], bits=BITS, budget=budget).toPandas()
            assert _rowset(got) == exp


class TestBboxBatchJoin:
    def test_counts_match_brute_force(self, spark, pts, pdf):
        boxes = [dict(b, qid=i) for i, b in enumerate(_big_boxes(12) + deterministic_boxes(4))]
        bdf = boxes_df(spark, boxes)
        ivs = intervals_df(spark, boxes, bits=BITS, budget=16)
        got = count_boxes(pts, bdf, ivs).toPandas().set_index("qid").n_hits
        for b in boxes:
            assert got[b["qid"]] == len(_brute(pdf, b)), b

    def test_bucketed_join_matches_nested_loop(self, spark, pts, pdf):
        boxes = [dict(b, qid=i) for i, b in enumerate(_big_boxes(8) + unaligned_boxes(4))]
        bdf = boxes_df(spark, boxes)
        ivs = intervals_df(spark, boxes, bits=BITS, budget=16)
        nl = bbox_join(pts, bdf, ivs).select("qid", "pid").toPandas()
        bivs, shift = bucketed_intervals_df(spark, boxes, bits=BITS, budget=16)
        bk = bbox_join_bucketed(pts, bdf, bivs, shift).select("qid", "pid").toPandas()
        key = lambda d: sorted(map(tuple, d.values.tolist()))
        assert key(nl) == key(bk)
        for b in boxes:
            exp = set(_brute(pdf, b).pid)
            assert set(bk[bk.qid == b["qid"]].pid) == exp

    def test_partitioning_invariance(self, spark, pts, pdf):
        """Results identical under repartition(1|8|32) — SURVEY.md §5.2
        item 6 (scale-out safety)."""
        b = _big_boxes(1)[0]
        exp = _rowset(_brute(pdf, b)[["pid", "x", "y"]])
        for n in (1, 8, 32):
            got = bbox_lookup(pts.repartition(n), b["mins"], b["maxs"], bits=BITS).toPandas()
            assert _rowset(got) == exp


class TestDistributedDecomposition:
    def test_dist_intervals_match_driver_form(self, spark):
        """bucketed_intervals_dist (mapInPandas, r3) must emit EXACTLY
        the rows the driver-side loop emits, at the same bucket shift."""
        boxes = [dict(b, qid=i) for i, b in enumerate(_big_boxes(20) + unaligned_boxes(4))]
        ref, shift_ref = bucketed_intervals_df(spark, boxes, bits=BITS, budget=16)
        from zcurve_spark.operators.bbox import bucketed_intervals_dist

        got, shift = bucketed_intervals_dist(
            boxes_df(spark, boxes), bits=BITS, budget=16, bucket_shift=shift_ref
        )
        key = lambda d: sorted(map(tuple, d.values.tolist()))
        assert key(got.toPandas()) == key(ref.toPandas())

    def test_dist_join_counts_match_brute_force(self, spark, pts, pdf):
        """End-to-end through the distributed decomposition, with the
        non-broadcast (shuffle hash) join path as well."""
        from zcurve_spark.operators.bbox import bucketed_intervals_dist

        boxes = [dict(b, qid=i) for i, b in enumerate(_big_boxes(10))]
        bdf = boxes_df(spark, boxes)
        for bc in (True, False):
            bivs, shift = bucketed_intervals_dist(bdf, bits=BITS, budget=16)
            hits = bbox_join_bucketed(pts, bdf, bivs, shift, broadcast_ivs=bc)
            got = count_hits(bdf, hits).toPandas().set_index("qid").n_hits
            for b in boxes:
                assert got[b["qid"]] == len(_brute(pdf, b)), (bc, b)

    def test_sampled_shift_is_deterministic(self, spark):
        from zcurve_spark.operators.bbox import bucketed_intervals_dist

        boxes = [dict(b, qid=i) for i, b in enumerate(_big_boxes(50))]
        bdf = boxes_df(spark, boxes)
        _, s1 = bucketed_intervals_dist(bdf, bits=BITS, budget=16)
        _, s2 = bucketed_intervals_dist(bdf.repartition(13), bits=BITS, budget=16)
        assert s1 == s2
