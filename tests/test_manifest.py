"""Storage layer: sorted layout, manifest stats, file pruning, resumable
stages — and proof that zkey BETWEEN predicates reach the Parquet scan
(PushedFilters), the Spark analog of the B-tree descent."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from zcurve_spark.functions.columns import interval_filter
from zcurve_spark.plans.decompose import decompose_box
from zcurve_spark.sources.manifest import (
    StageRunner,
    load_manifest,
    prune_files,
    read_pruned,
    write_sorted,
)
from zcurve_spark.sources.points import BITS, points_from_lineitem

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sorted_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("store") / "points_sorted")
    pts = points_from_lineitem(spark, SF_DIR)
    write_sorted(pts, path, zkey_col="zkey", n_partitions=8, lineage={"stage": "t"})
    return path


def test_manifest_stats(spark, sorted_path):
    m = load_manifest(sorted_path)
    assert m["total_rows"] == points_from_lineitem(spark, SF_DIR).count()
    files = m["files"]
    assert len(files) == 8
    # range partitioning -> non-overlapping zkey ranges across files
    spans = sorted((f["zkey_min"], f["zkey_max"]) for f in files)
    for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
        assert a1 <= b0


def test_pruning_correct_and_effective(spark, sorted_path):
    box = ((100_000, 100_000), (150_000, 160_000))
    ivs = decompose_box(*box, bits=BITS, budget=16)
    m = load_manifest(sorted_path)
    kept = prune_files(m, ivs)
    assert 0 < len(kept) < len(m["files"]), "pruning should drop some files"
    full = spark.read.parquet(sorted_path)
    pruned = read_pruned(spark, sorted_path, ivs)
    pred = interval_filter("zkey", ivs) & F.col("x").between(*[box[0][0], box[1][0]]) & F.col(
        "y"
    ).between(box[0][1], box[1][1])
    assert sorted(r.pid for r in pruned.filter(pred).collect()) == sorted(
        r.pid for r in full.filter(pred).collect()
    )


def test_pushed_filters_reach_parquet_scan(spark, sorted_path):
    """On the stored layout, zkey BETWEENs must appear in PushedFilters."""
    ivs = decompose_box((100_000, 100_000), (150_000, 160_000), bits=BITS, budget=8)
    df = spark.read.parquet(sorted_path).filter(interval_filter("zkey", ivs))
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "zkey" in pushed and "GreaterThanOrEqual" in pushed


def test_stage_runner_resume(spark, tmp_path):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return points_from_lineitem(spark, SF_DIR)

    sr = StageRunner(spark, str(tmp_path / "stages"))
    df1 = sr.run("pts", "fp-v1", build)
    n1 = df1.count()
    df2 = sr.run("pts", "fp-v1", build)  # same fingerprint -> resume
    assert calls["n"] == 1
    assert df2.count() == n1
    sr.run("pts", "fp-v2", build)  # changed input -> recompute
    assert calls["n"] == 2


def test_bbox_lookup_pruned_equals_fullscan(spark, sorted_path):
    """The flagship claim: the pruned-storage query path returns exactly
    the full-scan result (VERDICT r1 #1)."""
    from zcurve_spark.operators.bbox import bbox_lookup, bbox_lookup_pruned

    box = ((100_000, 100_000), (220_000, 330_000))
    full = bbox_lookup(
        spark.read.parquet(sorted_path), box[0], box[1], bits=BITS
    ).collect()
    pruned = bbox_lookup_pruned(spark, sorted_path, box[0], box[1], bits=BITS).collect()
    assert sorted(map(tuple, pruned)) == sorted(map(tuple, full))
    assert len(full) > 0


def test_knn_store_path_matches_inmemory(spark, sorted_path):
    """knn(store_path=...) must return the same top-k as the in-memory
    scan path, while reading only manifest-pruned files per round."""
    from zcurve_spark.operators.knn import knn
    from zcurve_spark.sources.points import DOMAIN

    qs = [{"qid": i, "qx": 100_000 + i * 311_111, "qy": 50_000 + i * 271_111, "k": 4} for i in range(3)]
    pts = points_from_lineitem(spark, SF_DIR)
    a = knn(pts, qs, bits=BITS, domain=DOMAIN).collect()
    b = knn(None, qs, bits=BITS, domain=DOMAIN, store_path=sorted_path, spark=spark).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == sum(q["k"] for q in qs)


def test_hilbert_store_pruned_lookup(spark, tmp_path_factory):
    """Curve-agnostic storage: an hkey-sorted layout + hilbert_covers
    intervals returns the same box rows as the coordinate predicate."""
    from pyspark.sql import functions as F

    from zcurve_spark.functions.udfs import hilbert2_udf
    from zcurve_spark.operators.bbox import bbox_lookup_pruned

    path = str(tmp_path_factory.mktemp("hstore") / "points_hsorted")
    pts = points_from_lineitem(spark, SF_DIR).withColumn(
        "hkey", hilbert2_udf(BITS)(F.col("x"), F.col("y"))
    )
    write_sorted(pts, path, zkey_col="hkey", n_partitions=8, lineage={"stage": "h"})
    box = ((200_000, 300_000), (420_000, 500_000))
    got = bbox_lookup_pruned(
        spark, path, box[0], box[1], zkey_col="hkey", bits=BITS, curve="hilbert"
    ).collect()
    exp = (
        points_from_lineitem(spark, SF_DIR)
        .filter(F.col("x").between(*[box[0][0], box[1][0]]) & F.col("y").between(box[0][1], box[1][1]))
        .select("pid", "x", "y")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, exp))
    assert len(exp) > 0
    # and the manifest actually prunes files for a small box
    from zcurve_spark.plans.decompose import hilbert_covers

    ivs = hilbert_covers((200_000, 300_000), (230_000, 330_000), order=BITS, budget=64)
    m = load_manifest(path)
    assert 0 < len(prune_files(m, ivs)) < len(m["files"])


def test_hilbert3_store_pruned_lookup(spark, tmp_path_factory):
    """The last cell of the curve x storage matrix (r3 VERDICT missing
    #3): an hkey3-sorted layout + octree-cover intervals returns the
    same 3D box rows as the coordinate predicate, with files pruned."""
    from pyspark.sql import functions as F

    from zcurve_spark.functions.udfs import hilbert3_udf
    from zcurve_spark.operators.bbox import bbox_lookup_pruned

    path = str(tmp_path_factory.mktemp("h3store") / "points_h3sorted")
    pts = points_from_lineitem(spark, SF_DIR).withColumn(
        "hkey3", hilbert3_udf(BITS)(F.col("x"), F.col("y"), F.col("z"))
    )
    write_sorted(pts, path, zkey_col="hkey3", n_partitions=8, lineage={"stage": "h3"})
    box = ((200_000, 300_000, 0), (420_000, 500_000, 600_000))
    got = bbox_lookup_pruned(
        spark,
        path,
        box[0],
        box[1],
        zkey_col="hkey3",
        coord_cols=("x", "y", "z"),
        bits=BITS,
        curve="hilbert3",
    ).collect()
    exp = (
        points_from_lineitem(spark, SF_DIR)
        .filter(
            F.col("x").between(box[0][0], box[1][0])
            & F.col("y").between(box[0][1], box[1][1])
            & F.col("z").between(box[0][2], box[1][2])
        )
        .select("pid", "x", "y", "z")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, exp))
    assert len(exp) > 0
    # octree covers must actually prune files on a small box
    from zcurve_spark.plans.decompose import hilbert3_covers

    ivs = hilbert3_covers(
        (200_000, 300_000, 100_000), (230_000, 330_000, 200_000), order=BITS, budget=64
    )
    m = load_manifest(path)
    assert 0 < len(prune_files(m, ivs)) < len(m["files"])


class TestCoordinateStats:
    """r3 VERDICT #5: per-dimension coordinate min-max in the manifest
    (the Iceberg-column-stats analog) lets pure-coordinate-predicate
    scans prune files with NO curve-interval decomposition."""

    def test_write_sorted_records_coord_stats_and_bytes(self, spark, sorted_path):
        m = load_manifest(sorted_path)
        for f in m["files"]:
            assert f["bytes"] > 0
            assert "x" in f["stats"] and "y" in f["stats"]
            assert f["stats"]["x"]["min"] <= f["stats"]["x"]["max"]

    def test_coord_pruning_correct_and_effective(self, spark, sorted_path):
        from zcurve_spark.sources.manifest import prune_files_coords

        m = load_manifest(sorted_path)
        boxes = [{"mins": (100_000, 100_000), "maxs": (150_000, 160_000)}]
        kept = prune_files_coords(m, boxes, ("x", "y"))
        assert 0 < len(kept) < len(m["files"]), "coord stats should prune"
        pred = F.col("x").between(100_000, 150_000) & F.col("y").between(
            100_000, 160_000
        )
        full = spark.read.parquet(sorted_path).filter(pred)
        pruned = spark.read.parquet(*[f"{sorted_path}/{n}" for n in kept]).filter(pred)
        assert sorted(r.pid for r in pruned.collect()) == sorted(
            r.pid for r in full.collect()
        )
        assert full.count() > 0

    def test_files_without_stats_conservatively_kept(self):
        from zcurve_spark.sources.manifest import prune_files_coords

        m = {"files": [{"file": "a.parquet", "stats": {}},
                       {"file": "b.parquet",
                        "stats": {"x": {"min": 0, "max": 10},
                                  "y": {"min": 0, "max": 10}}}]}
        boxes = [{"mins": (1000, 1000), "maxs": (2000, 2000)}]
        # a has no stats -> kept; b's ranges exclude the box -> dropped
        assert prune_files_coords(m, boxes) == ["a.parquet"]

    def test_augment_existing_manifest(self, spark, tmp_path):
        """A pre-r4 manifest (no stats/bytes) is upgraded in place from
        parquet footers only — no data rewrite — and idempotently."""
        import json
        import os

        from zcurve_spark.sources.manifest import (
            MANIFEST_NAME,
            augment_manifest_stats,
        )

        p = str(tmp_path / "legacy")
        pts = points_from_lineitem(spark, SF_DIR)
        write_sorted(pts, p, n_partitions=4)
        # strip the stats to simulate a legacy manifest
        m = load_manifest(p)
        for f in m["files"]:
            f.pop("stats", None)
            f.pop("bytes", None)
        with open(os.path.join(p, MANIFEST_NAME), "w") as fh:
            json.dump(m, fh)
        m1 = augment_manifest_stats(p, ("x", "y"))
        assert all("x" in f["stats"] and f["bytes"] > 0 for f in m1["files"])
        t = os.path.getmtime(os.path.join(p, MANIFEST_NAME))
        m2 = augment_manifest_stats(p, ("x", "y"))  # idempotent: no rewrite
        assert os.path.getmtime(os.path.join(p, MANIFEST_NAME)) == t
        assert m2["files"] == m1["files"]


class TestStoreParallelism:
    def test_manifest_carries_target_parallelism(self, spark, tmp_path):
        from zcurve_spark.sources.manifest import load_manifest, write_sorted

        df = spark.range(1000).selectExpr("id as zkey", "id as v")
        write_sorted(df, str(tmp_path / "s"), n_partitions=8)
        m = load_manifest(str(tmp_path / "s"))
        assert m["target_parallelism"] == 8

    def test_read_store_restores_declared_parallelism(self, spark, tmp_path):
        """A store compacted below its declared parallelism is scaled
        back up by read_store — one source of truth (r2 VERDICT #10)."""
        import json
        import os

        from zcurve_spark.sources.manifest import MANIFEST_NAME, load_manifest, write_sorted
        from zcurve_spark.sources.store import read_store

        p = str(tmp_path / "s2")
        df = spark.range(1000).selectExpr("id as zkey", "id as v")
        write_sorted(df, p, n_partitions=2)
        # simulate an externally-compacted layout claiming higher target
        m = load_manifest(p)
        m["target_parallelism"] = 16
        with open(os.path.join(p, MANIFEST_NAME), "w") as fh:
            json.dump(m, fh)
        out = read_store(spark, p)
        assert out.rdd.getNumPartitions() >= 16
        assert out.count() == 1000

    def test_table_store_resumes(self, spark, tmp_path, monkeypatch):
        import os

        monkeypatch.setenv("SPARK_GRAFT_WORK_DIR", str(tmp_path))
        from zcurve_spark.sources.manifest import load_manifest
        from zcurve_spark.sources.store import read_store, table_store

        p1 = table_store(spark, "/root/testdata/sf0.001", "documents", sort_col="doc_id")
        t1 = os.path.getmtime(os.path.join(p1, "_zcurve_manifest.json"))
        p2 = table_store(spark, "/root/testdata/sf0.001", "documents", sort_col="doc_id")
        assert p1 == p2
        assert os.path.getmtime(os.path.join(p2, "_zcurve_manifest.json")) == t1  # resumed
        n_raw = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
        assert read_store(spark, p1).count() == n_raw
        assert load_manifest(p1)["zkey_col"] == "doc_id"


class TestDistributedPruning:
    def test_read_pruned_df_matches_listwise_pruning(self, spark, tmp_path):
        """read_pruned_df (interval DATAFRAME x manifest relation, r3)
        must read exactly the files the driver-side prune_files picks."""
        from pyspark.sql import functions as F

        from zcurve_spark.plans.decompose import Interval
        from zcurve_spark.sources.manifest import (
            load_manifest,
            prune_files,
            read_pruned,
            read_pruned_df,
            write_sorted,
        )

        p = str(tmp_path / "store")
        df = spark.range(100_000).selectExpr("id as zkey", "id % 97 as v")
        write_sorted(df, p, n_partitions=16)
        ivs = [Interval(1000, 2000, False), Interval(50_000, 50_100, False)]
        ref = read_pruned(spark, p, ivs)
        ivs_df = spark.createDataFrame(
            [(iv.lo, iv.hi) for iv in ivs], "lo long, hi long"
        )
        got = read_pruned_df(spark, p, ivs_df)
        assert sorted(got.inputFiles()) == sorted(ref.inputFiles())
        assert got.count() == ref.count()
        m = load_manifest(p)
        assert len(prune_files(m, ivs)) < len(m["files"])  # pruning happened

    def test_read_pruned_df_empty_intervals(self, spark, tmp_path):
        from zcurve_spark.sources.manifest import read_pruned_df, write_sorted

        p = str(tmp_path / "store2")
        write_sorted(spark.range(1000).selectExpr("id as zkey"), p, n_partitions=4)
        ivs_df = spark.createDataFrame([], "lo long, hi long")
        assert read_pruned_df(spark, p, ivs_df).count() == 0
