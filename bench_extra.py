#!/usr/bin/env python
"""Per-operator stage profiler for the r6 optimization round (guide §1).

NOT part of the frozen measurement contract (bench.py is that); this
file exists so OPTIMIZATION_r06.md can cite per-stage numbers: each
mode isolates one expensive query, labels its jobs
(setJobDescription) and times sub-stages with the noop sink
(guide §1.4) so we measure computation, not collect/driver effects.

Usage: python bench_extra.py <mode> [mode...]
Modes: dedup ivf pip phash geo bbox10k knnb tilegen pyr s2 minhash snap dist
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in bench.py.
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F

from zcurve_spark.session import get_spark
from zcurve_spark.sources.points import BITS, DOMAIN, boxes_df, points_from_lineitem
from zcurve_spark.util import fan_out

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

spark = get_spark(app="zcurve-bench-extra", cores=CPUS, shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(name, fn, reps=2):
    spark.sparkContext.setJobDescription(name)
    best = None
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"  {name}: {best:.3f}s  (out={out})", flush=True)
    spark.sparkContext.setJobDescription(None)
    return best


def _docs_corpus(mult=64):
    p = os.path.join("/tmp/zcurve_stage", f"docs_x{mult}")
    return fan_out(spark.read.parquet(p))


def mode_dedup():
    from zcurve_spark.operators.dedup import (
        connected_components,
        distinct_ngrams_arrow,
        minhash_lsh_pairs,
    )

    corpus = _docs_corpus()
    extra = corpus.filter(F.col("doc_id") % 50 == 0).withColumn(
        "doc_id", F.col("doc_id") + 100_000_000
    )
    full = corpus.unionByName(extra)
    print("dedup_pipeline stages (64x corpus):")
    timed("shingle-only", lambda: noop(
        full.select("doc_id", distinct_ngrams_arrow("text", 3).alias("g"))))
    from zcurve_spark.operators.dedup import MERSENNE

    def sig_pass():
        ex = full.select(
            F.col("doc_id").alias("id"),
            F.explode(distinct_ngrams_arrow("text", 3)).alias("gram"),
        ).withColumn("h", F.pmod(F.xxhash64("gram"), F.lit(MERSENNE)))
        aggs = [F.min((F.col("h") * F.lit(2 * i + 1)
                       + F.lit(0x9E3779B9 * (i + 1) & ((1 << 30) - 1))) % F.lit(MERSENNE)).alias(f"_m{i}")
                for i in range(32)]
        noop(ex.groupBy("id").agg(*aggs))

    timed("signature-pass", sig_pass)
    timed("pairs-count", lambda: minhash_lsh_pairs(
        full, verify_min_jaccard_milli=990, verify_semijoin=None).count())
    pairs = minhash_lsh_pairs(
        full, verify_min_jaccard_milli=990, verify_semijoin=None
    ).localCheckpoint()
    timed("components-from-pairs", lambda: connected_components(pairs)
          .filter(F.col("id") == F.col("component")).count(), reps=1)


def mode_ivf():
    from zcurve_spark.operators.similarity import ivf_seeds, ivf_topk_batch

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    e = fan_out(emb)
    amp = 10
    rep = F.explode(F.sequence(F.lit(0), F.lit(amp - 1))).alias("rep")
    big = e.select("vec_id", "embedding", rep).select(
        (F.col("vec_id") * amp + F.col("rep")).alias("vec_id"),
        F.when(F.col("rep") % 2 == 1, F.transform("embedding", lambda x: -x))
        .otherwise(F.col("embedding")).alias("embedding"),
    )
    qdf = big.select(F.col("vec_id").alias("qid")).limit(10000)
    print("ivf_batch_10k stages:")
    seeds = None

    def build_seeds():
        nonlocal seeds
        seeds = ivf_seeds(big, 32)
        return len(seeds)

    timed("seeds-build(2 lloyd)", build_seeds)
    timed("rest-with-prebuilt-seeds", lambda: ivf_topk_batch(
        big, qdf, 10, n_cells=32, nprobe=4, broadcast_queries=False, seeds=seeds
    ).count())
    timed("full(ivf_batch_10k)", lambda: ivf_topk_batch(
        big, qdf, 10, n_cells=32, nprobe=4, broadcast_queries=False
    ).count())


def mode_pip():
    from zcurve_spark.entry_queries import POLYGONS
    from zcurve_spark.operators.pip import pip_join
    from zcurve_spark.sources.store import points_store, read_store

    store = points_store(spark, SF_DIR)
    pts = read_store(spark, store)
    print("pip stages:")
    timed("pip_join-count", lambda: pip_join(pts, POLYGONS, bits=BITS).count(), reps=3)


def mode_phash():
    from zcurve_spark.operators.imagehash import image_phash, phash_neardup_pairs

    p = os.path.join("/tmp/zcurve_stage", "imgs_20000")
    imgs = fan_out(spark.read.parquet(p))
    print("image_phash stages:")
    timed("decode+hash-only", lambda: noop(image_phash(imgs)), reps=3)
    timed("full-pairs-r3", lambda: phash_neardup_pairs(imgs, max_hamming=3).count(), reps=3)


def mode_geo():
    from zcurve_spark.operators.knn import knn_geo_batch
    from zcurve_spark.sources.store import points_store, read_store

    store = points_store(spark, SF_DIR)
    pts = read_store(spark, store)
    n_points = pts.count()
    geo = pts.select(
        "pid",
        (F.col("x") / F.lit(1000000.0) * F.lit(360.0) - F.lit(180.0)).alias("lon"),
        (F.col("y") / F.lit(1000000.0) * F.lit(180.0) - F.lit(90.0)).alias("lat"),
    )
    qdf = spark.range(2000).select(
        F.col("id").alias("qid"),
        (((F.col("id") * 137_777 + 50_000) % DOMAIN) / F.lit(1000000.0) * 360.0 - 180.0).alias("lon"),
        (((F.col("id") * 733_333 + 90_000) % DOMAIN) / F.lit(1000000.0) * 180.0 - 90.0).alias("lat"),
    )
    print("knn_geo_2k:")
    timed("full", lambda: knn_geo_batch(qdf, geo, 10, n_points_hint=n_points).count(), reps=3)


def mode_bbox10k():
    from zcurve_spark.operators.bbox import (
        bbox_join_bucketed,
        bucketed_intervals_dist,
        count_hits,
    )
    from zcurve_spark.sources.store import points_store, read_store
    import bench as _b

    store = points_store(spark, SF_DIR)
    pts = read_store(spark, store)
    big_boxes = _b._boxes(10000)
    bdf = boxes_df(spark, big_boxes)
    print("bbox_batch_10k stages:")
    timed("decompose-dist-only", lambda: noop(bucketed_intervals_dist(bdf, bits=BITS, budget=16)[0]), reps=3)

    def full():
        bivs, shift = bucketed_intervals_dist(bdf, bits=BITS, budget=16)
        hits = count_hits(bdf, bbox_join_bucketed(
            pts, bdf, bivs, shift, broadcast_ivs=False, broadcast_boxes=True))
        return hits.agg(F.sum("n_hits")).collect()[0][0]

    timed("full", full, reps=3)


def mode_knnb():
    from zcurve_spark.operators.knn import knn_batch
    from zcurve_spark.sources.store import points_store

    store = points_store(spark, SF_DIR)
    qdf = spark.range(2000).select(
        F.col("id").alias("qid"),
        ((F.col("id") * 137_777 + 50_000) % DOMAIN).alias("qx"),
        ((F.col("id") * 733_333 + 90_000) % DOMAIN).alias("qy"),
        F.lit(10).alias("k"),
    )
    print("knn_batch_2k:")
    timed("full", lambda: knn_batch(
        qdf, store_path=store, bits=BITS, domain=DOMAIN, budget=16).count(), reps=3)


def mode_tilegen():
    from zcurve_spark.functions.columns import tile_id_col, zkey2_col

    n_gen = 256_000_000
    print("tile_assign_gen stages:")

    def gen_only():
        df = spark.range(0, n_gen, 1, 128)
        qx = ((F.col("id") * 2654435761 + 12345) % (1 << 30)).alias("qx")
        qy = ((F.col("id") * 1013904223 + 54321) % (1 << 30)).alias("qy")
        t = df.select((F.col("id") / 8).cast("long").alias("doc_num"), qx, qy)
        noop(t)

    def gen_zkey():
        df = spark.range(0, n_gen, 1, 128)
        qx = ((F.col("id") * 2654435761 + 12345) % (1 << 30)).alias("qx")
        qy = ((F.col("id") * 1013904223 + 54321) % (1 << 30)).alias("qy")
        t = df.select((F.col("id") / 8).cast("long").alias("doc_num"), qx, qy)
        t = t.withColumn("zkey", zkey2_col("qx", "qy"))
        noop(t.select("doc_num", "zkey"))

    def agg_count_only():
        df = spark.range(0, n_gen, 1, 128)
        qx = ((F.col("id") * 2654435761 + 12345) % (1 << 30)).alias("qx")
        qy = ((F.col("id") * 1013904223 + 54321) % (1 << 30)).alias("qy")
        t = df.select((F.col("id") / 8).cast("long").alias("doc_num"), qx, qy)
        t = t.withColumn("zkey", zkey2_col("qx", "qy"))
        t = t.withColumn("tile_l8", tile_id_col("zkey", 8, bits=30))
        return (t.groupBy("tile_l8").agg(F.count(F.lit(1)).alias("n"))
                .agg(F.sum("n")).collect()[0][0])

    def agg_full():
        df = spark.range(0, n_gen, 1, 128)
        qx = ((F.col("id") * 2654435761 + 12345) % (1 << 30)).alias("qx")
        qy = ((F.col("id") * 1013904223 + 54321) % (1 << 30)).alias("qy")
        t = df.select((F.col("id") / 8).cast("long").alias("doc_num"), qx, qy)
        t = t.withColumn("zkey", zkey2_col("qx", "qy"))
        for level in (4, 8, 12):
            t = t.withColumn(f"tile_l{level}", tile_id_col("zkey", level, bits=30))
        return (t.groupBy("tile_l8")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.approx_count_distinct("doc_num").alias("d"))
                .agg(F.sum("n")).collect()[0][0])

    timed("gen-only", gen_only)
    timed("gen+zkey", gen_zkey)
    timed("agg-count-only", agg_count_only)
    timed("agg-full(approxCD)", agg_full)


def mode_pyr():
    from zcurve_spark.functions.columns import zkey2_col
    from zcurve_spark.operators.tiles import tile_pyramid

    n_pyr = 64_000_000
    print("tile_pyramid_gen:")

    def full():
        df = spark.range(0, n_pyr, 1, 128)
        qx = ((F.col("id") * 2654435761 + 12345) % (1 << 30)).alias("qx")
        qy = ((F.col("id") * 1013904223 + 54321) % (1 << 30)).alias("qy")
        t = df.select(qx, qy).withColumn("zkey", zkey2_col("qx", "qy"))
        pyr = tile_pyramid(t, levels=(4, 8, 12), bits=30)
        return pyr.agg(F.sum("n")).collect()[0][0]

    timed("full", full, reps=3)


def mode_s2():
    from zcurve_spark.functions.s2 import s2_cell_col

    n_s2 = 16_000_000
    print("s2_assign_gen:")

    def full():
        df = spark.range(0, n_s2, 1, 128)
        lon = ((F.col("id") * 2654435761 + 12345) % (1 << 30)) / F.lit(float(1 << 30)) * 360.0 - 180.0
        lat = ((F.col("id") * 1013904223 + 54321) % (1 << 30)) / F.lit(float(1 << 30)) * 180.0 - 90.0
        t = df.select(lon.alias("lon"), lat.alias("lat"))
        return (t.groupBy(s2_cell_col("lon", "lat", level=8).alias("cell"))
                .agg(F.count(F.lit(1)).alias("n")).agg(F.sum("n")).collect()[0][0])

    timed("full", full, reps=3)


def mode_minhash():
    from zcurve_spark.operators.dedup import minhash_lsh_pairs

    d = fan_out(spark.read.parquet(f"{SF_DIR}/documents.parquet"))
    print("minhash_dedup (headline, 5k docs):")
    timed("full", lambda: minhash_lsh_pairs(d, verify_min_jaccard_milli=100).count(), reps=3)


def mode_snap():
    import shutil

    from zcurve_spark.sources.snapshots import SnapshotStore
    from zcurve_spark.sources.store import points_store, read_store

    store = points_store(spark, SF_DIR)
    pts = read_store(spark, store)
    print("snapshot_cycle:")

    def full():
        p = "/tmp/zcurve_stage/bench_snap_extra"
        shutil.rmtree(p, ignore_errors=True)
        st = SnapshotStore(spark, p)
        st.commit(pts.filter(F.col("pid") % 2 == 0), created_unix=1)
        st.commit(pts.filter(F.col("pid") % 2 == 1), created_unix=2)
        return st.compact(created_unix=3)["total_rows"]

    timed("full", full, reps=3)


def mode_dist():
    from zcurve_spark.operators.distance import distance_join
    from zcurve_spark.sources.store import points_store, read_store

    store = points_store(spark, SF_DIR)
    pts = read_store(spark, store)
    print("distance_join_self:")
    timed("full", lambda: distance_join(pts, pts, 2000, dedup_pairs=True).count(), reps=3)


MODES = {
    "dedup": mode_dedup, "ivf": mode_ivf, "pip": mode_pip, "phash": mode_phash,
    "geo": mode_geo, "bbox10k": mode_bbox10k, "knnb": mode_knnb,
    "tilegen": mode_tilegen, "pyr": mode_pyr, "s2": mode_s2,
    "minhash": mode_minhash, "snap": mode_snap, "dist": mode_dist,
}

if __name__ == "__main__":
    for m in sys.argv[1:]:
        MODES[m]()
    spark.stop()
