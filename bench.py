#!/usr/bin/env python
"""Benchmark harness — one JSON line on stdout.

Headline workloads (the north-rule metric is spatial-join +
tile-assignment throughput in docs/sec and spans/sec):

  tile_assign   — interleaved docs -> explode -> geo -> zkey -> tiles ->
                  per-tile agg (flagship pipeline)
  bbox_batch    — 200-box batch spatial join (gentest.awk shape) via the
                  bucketed hash-join path
  knn           — 16 queries, k=10, expanding curve neighborhoods
  pip           — 3-polygon point-in-polygon join
  minhash_dedup — shingle->minhash->LSH band join over documents
  ann_topk      — exact quantized-cosine top-k, 8 query vectors

Extras (reported under "extras", kept OUT of the headline total so the
"value" field stays comparable to BASELINE.md's 10-query reference):

  bbox_batch_10k — 10^4-box batch (full gentest.awk size) through the
                   DISTRIBUTED decomposition + shuffle-hash join path
  knn_batch_2k   — 2000-query set-oriented kNN (queries as a DataFrame)

Env:
  SPARK_GRAFT_SF_DIR  input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[N] (default 32)
  SPARK_GRAFT_MULT    deterministic input amplification factor (default 1).
                      Used by bench_scaling.py so each core has real work:
                      at sf0.1 the raw tables are small enough that task
                      overhead, not compute, dominates a 32-way run.

Shuffle partitions are FIXED (64) regardless of CPUS so that a scaling
comparison runs the identical plan at both parallelism levels.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

from zcurve_spark.entry_queries import POLYGONS
from zcurve_spark.functions.columns import tile_id_col, zkey2_col, zkey3_col
from zcurve_spark.operators.bbox import (
    bbox_join_bucketed,
    bucketed_intervals_df,
    count_hits,
)
from zcurve_spark.operators.bbox import bbox_lookup, bbox_lookup_pruned
from zcurve_spark.operators.dedup import minhash_lsh_pairs
from zcurve_spark.operators.knn import knn
from zcurve_spark.operators.pip import pip_join
from zcurve_spark.operators.similarity import ann_topk
from zcurve_spark.operators.tiles import assign_tiles, tile_pyramid
from zcurve_spark.plans.decompose import decompose_box
from zcurve_spark.session import get_spark
from zcurve_spark.sources.interleaved import explode_spans, interleaved_docs, with_span_geo
from zcurve_spark.sources.points import BITS, DOMAIN, boxes_df, points_from_lineitem
from zcurve_spark.sources.store import points_store
from zcurve_spark.util import fan_out

SHUFFLE_PARTITIONS = 64


def _boxes(n):
    out = []
    for qid in range(n):
        h = (qid * 2654435761 + 99991) % (2**31)
        h = (h * 1103515245 + 12345) % (2**31)
        x0 = h % 900_000
        h = (h * 69069 + 1) % (2**31)
        y0 = h % 900_000
        ext = 1000 + (h % 80_000)
        out.append({"qid": qid, "mins": (x0, y0), "maxs": (min(x0 + ext, DOMAIN - 1), min(y0 + ext, DOMAIN - 1))})
    return out


def amplify_points(pts, mult: int):
    """Deterministically replicate points mult x with shifted coords."""
    if mult <= 1:
        return pts
    rep = F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("rep")
    out = pts.select("pid", "x", "y", "z", rep)
    out = out.select(
        (F.col("pid") * mult + F.col("rep")).alias("pid"),
        ((F.col("x") + F.col("rep") * 40499) % DOMAIN).alias("x"),
        ((F.col("y") + F.col("rep") * 69069) % DOMAIN).alias("y"),
        ((F.col("z") + F.col("rep") * 40503) % DOMAIN).alias("z"),
    )
    return out.withColumn("zkey", zkey2_col("x", "y")).withColumn(
        "zkey3", zkey3_col("x", "y", "z")
    )


def amplify_docs(docs, mult: int):
    """Replicate documents with rep-suffixed tokens (distinct shingle
    sets across replicas, so LSH pair counts scale linearly)."""
    if mult <= 1:
        return docs
    rep = F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("rep")
    out = docs.select("doc_id", "text", "lang", rep)
    toks = F.split(F.col("text"), " ")
    newtext = F.array_join(
        F.transform(toks, lambda w: F.concat(w, F.col("rep").cast("string"))), " "
    )
    return out.select(
        (F.col("doc_id") * mult + F.col("rep")).alias("doc_id"),
        newtext.alias("text"),
        "lang",
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    mult = int(os.environ.get("SPARK_GRAFT_MULT", "1"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1])
    spark = get_spark(app="zcurve-bench", cores=cpus, shuffle_partitions=SHUFFLE_PARTITIONS)
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    counts: dict[str, int] = {}

    warm = os.environ.get("SPARK_GRAFT_WARM", "1") == "1"
    only = os.environ.get("SPARK_GRAFT_QUERIES", "")
    selected = set(q.strip() for q in only.split(",") if q.strip()) if only else None

    reps = int(os.environ.get("SPARK_GRAFT_REPS", "3"))

    # r4 VERDICT #1: headline rows get the SAME protocol that stabilized
    # the storage tiers — queries are only REGISTERED here, then executed
    # at the end of main() as one warm pass plus `reps` ROUND-ROBIN
    # interleaved passes over every live row, with each per-rep wall time
    # emitted in the json ("headline_reps"/"extras_reps").  A host-state
    # swing during the window then shows up as variance inside each row's
    # own rep array instead of silently poisoning whichever row happened
    # to be running (r4: tile_assign recorded 3.86s driver-run vs 1.33s
    # builder same-code because each row ran best-of-2 back to back in
    # its own window).
    headline_rows: list[tuple[str, object]] = []
    extras_rows: list[tuple[str, object]] = []

    def run(name, fn):
        headline_rows.append((name, fn))

    def run_extra(name, fn):
        extras_rows.append((name, fn))

    # --- tile assignment (flagship; docs/sec + spans/sec) ---
    docs = interleaved_docs(spark, sf_dir)
    if mult > 1:
        base_spans = explode_spans(docs)
        rep = F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("rep")
        spans_in = base_spans.select("*", rep).withColumn(
            "_doc_num", F.col("_doc_num") * mult + F.col("rep")
        ).withColumn("doc_id", F.concat("doc_id", F.lit("-"), F.col("rep"))).drop("rep")
    else:
        spans_in = explode_spans(docs)
    spans_in = spans_in.cache()
    n_spans_in = spans_in.count()
    n_docs = spans_in.select("doc_id").distinct().count()

    def tile_assign():
        spans = with_span_geo(spans_in, bits=30)
        tiled = assign_tiles(spans, levels=(4, 8, 12), bits=30)
        agg = tiled.groupBy("tile_l8").agg(
            F.count(F.lit(1)).alias("n_spans"), F.countDistinct("doc_id").alias("n_docs")
        )
        return agg.agg(F.sum("n_spans")).collect()[0][0]

    run("tile_assign", tile_assign)

    # compute-bound twin: the sf0.1 docs table is tiny enough that
    # tile_assign above measures job overhead, not the engine; this row
    # runs the same encode->tile->agg chain over generated spans sized
    # so per-core compute dominates (the number that scales to 100 TB)
    n_gen = int(os.environ.get("SPARK_GRAFT_GEN_SPANS", 256_000_000))

    def tile_assign_gen():
        df = spark.range(0, n_gen, 1, 128)
        qx = ((F.col("id") * 2654435761 + 12345) % (1 << 30)).alias("qx")
        qy = ((F.col("id") * 1013904223 + 54321) % (1 << 30)).alias("qy")
        t = df.select((F.col("id") / 8).cast("long").alias("doc_num"), qx, qy)
        t = t.withColumn("zkey", zkey2_col("qx", "qy"))
        for level in (4, 8, 12):
            t = t.withColumn(f"tile_l{level}", tile_id_col("zkey", level, bits=30))
        return (
            t.groupBy("tile_l8")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.approx_count_distinct("doc_num").alias("d"))
            .agg(F.sum("n")).collect()[0][0]
        )

    run("tile_assign_gen", tile_assign_gen)

    # multi-resolution rollup over generated spans: levels (4, 8, 12)
    # from ONE raw shuffle (finest agg reused across the union
    # branches), vs three independent full-table aggs for the naive
    # plan — the dedicated naive-vs-pyramid comparison is in
    # BASELINE.md; this row tracks the pyramid's absolute throughput.
    # n_gen/4 keeps the row ~2.5s/rep (level-12 partials don't combine
    # much map-side, so the finest shuffle is a real table-sized one —
    # the full-n_gen row measured 10.7s/rep, too heavy for the
    # per-round window at warm+3 reps)
    n_pyr = int(os.environ.get("SPARK_GRAFT_PYR_SPANS", n_gen // 4))

    def tile_pyramid_gen():
        df = spark.range(0, n_pyr, 1, 128)
        qx = ((F.col("id") * 2654435761 + 12345) % (1 << 30)).alias("qx")
        qy = ((F.col("id") * 1013904223 + 54321) % (1 << 30)).alias("qy")
        t = df.select(qx, qy).withColumn("zkey", zkey2_col("qx", "qy"))
        pyr = tile_pyramid(t, levels=(4, 8, 12), bits=30)
        return pyr.agg(F.sum("n")).collect()[0][0]

    run_extra("tile_pyramid_gen", tile_pyramid_gen)

    # REAL S2 cell assignment (cube-face + quadratic-ST + Hilbert,
    # functions/s2.py) over generated lon/lat spans.  The cell id is an
    # Arrow pandas UDF (numpy bit-walk, 30 lookup-table levels), so this
    # row honestly tracks the Python-kernel path's throughput next to
    # the pure-codegen Z-tile rows above; sized to ~2-3s/rep.
    n_s2 = int(os.environ.get("SPARK_GRAFT_S2_SPANS", 16_000_000))

    def s2_assign_gen():
        from zcurve_spark.functions.s2 import s2_cell_col

        df = spark.range(0, n_s2, 1, 128)
        lon = ((F.col("id") * 2654435761 + 12345) % (1 << 30)) / F.lit(
            float(1 << 30)
        ) * 360.0 - 180.0
        lat = ((F.col("id") * 1013904223 + 54321) % (1 << 30)) / F.lit(
            float(1 << 30)
        ) * 180.0 - 90.0
        t = df.select(lon.alias("lon"), lat.alias("lat"))
        return (
            t.groupBy(s2_cell_col("lon", "lat", level=8).alias("cell"))
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.sum("n"))
            .collect()[0][0]
        )

    run_extra("s2_assign_gen", s2_assign_gen)

    # --- the points side: materialized zkey-sorted store (the storage
    # layer IS the query path — VERDICT r1 #1); amplified runs derive
    # in-memory since the layout depends on mult ---
    extra = {}
    if mult == 1:
        from zcurve_spark.sources.store import read_store

        store = points_store(spark, sf_dir)
        pts = read_store(spark, store)
    else:
        store = None
        pts = fan_out(amplify_points(points_from_lineitem(spark, sf_dir), mult)).cache()
    n_points = pts.count()
    boxes = _boxes(200)

    def bbox_batch():
        bdf = boxes_df(spark, boxes)
        bivs, shift = bucketed_intervals_df(spark, boxes, bits=BITS, budget=16)
        # SUM the hit counts, don't count() rows: count() over the left
        # join references no join output, so Catalyst ELIMINATES the
        # entire points subtree and the benchmark measures nothing
        # (verified: the optimized count() plan has no Range scan).
        hits = count_hits(bdf, bbox_join_bucketed(pts, bdf, bivs, shift))
        return hits.agg(F.sum("n_hits")).collect()[0][0]

    run("bbox_batch", bbox_batch)

    # --- pruned vs full-scan lookups (the B-tree-descent win) ---
    # At 600k rows every lookup is job-overhead-bound, so the comparison
    # runs on a 32x-amplified sorted store (~19M rows, built ONCE through
    # StageRunner and resumed on every later bench run) and evaluates all
    # boxes in a single union job per side.
    extras: dict[str, float] = {}
    sel_boxes = []
    for qid in range(8):
        h = (qid * 48271 + 11) % (2**31)
        x0 = h % 950_000
        h = (h * 69069 + 5) % (2**31)
        y0 = h % 950_000
        sel_boxes.append({"mins": (x0, y0), "maxs": (min(x0 + 40_000, DOMAIN - 1), min(y0 + 40_000, DOMAIN - 1))})
    if store is not None:
        import os as _os

        from zcurve_spark.sources.manifest import StageRunner
        from zcurve_spark.sources.store import _input_fingerprint, work_root

        # 1024x -> ~614M rows / ~17 GB: big enough that scans are
        # decode-bound, so both pruning tiers show up as wall-clock.
        # Built ONCE (StageRunner resume makes every later run free).
        big_mult = int(os.environ.get("SPARK_GRAFT_STORE_MULT", "1024"))
        # ~35 MB files: pruning granularity AND scan parallelism.  With 64
        # coarse files a pruned 8-file read ran on 8 of 32 cores — the IO
        # win was masked by lost parallelism on a warm page cache.
        big_parts = int(os.environ.get("SPARK_GRAFT_STORE_PARTS", "512"))
        tag = _os.path.basename(_os.path.normpath(sf_dir))
        sr = StageRunner(spark, _os.path.join(work_root(), f"{tag}_x{big_mult}"))
        fpb = _input_fingerprint(
            sf_dir, "lineitem", bits=BITS, mult=big_mult, parts=big_parts
        )
        big_src = lambda: amplify_points(points_from_lineitem(spark, sf_dir), big_mult)
        sr.run("points_sorted", fpb, big_src, n_partitions=big_parts)
        big = sr.stage_path("points_sorted")
        big_pts = spark.read.parquet(big)

        # Unsorted twin = the no-index baseline (what the data looks like
        # WITHOUT this engine's layout): same rows, hash-scattered, so
        # parquet row-group min/max stats cannot prune anything.
        unsorted = _os.path.join(work_root(), f"{tag}_x{big_mult}", "points_unsorted")
        if not _os.path.exists(_os.path.join(unsorted, "_SUCCESS")):
            big_src().repartition(big_parts, F.col("pid")).write.mode(
                "overwrite"
            ).parquet(unsorted)
        unsorted_pts = spark.read.parquet(unsorted)

        # Four tiers, one batch job per side, all sharing the same exact
        # coordinate refinement (a per-box union of plans blows up the
        # optimizer):
        #   bbox_scan_unsorted — decode everything (seq-scan baseline,
        #                        the reference's non-index plan)
        #   bbox_fullscan      — zkey-sorted layout: parquet row-group
        #                        min/max stats on the clustered x/y prune
        #                        most row groups (in-page binsearch tier)
        #   bbox_coordstats    — + manifest COORDINATE min/max file
        #                        pruning (Iceberg-column-stats analog,
        #                        r3 VERDICT #5): pure x/y predicate, no
        #                        curve-interval decomposition needed
        #   bbox_pruned        — + manifest curve-interval file pruning
        #                        (B-tree descent tier): only files
        #                        intersecting some box's intervals open
        #
        # r3 VERDICT #1 (bench stability): the tiers' reps are ROUND-ROBIN
        # interleaved rather than per-tier best-of-N back to back, every
        # per-rep wall time is emitted, and each tier carries its
        # files/bytes-read so a page-cache swing shows up as rep variance
        # and a depressed scan rate instead of silently biasing one tier.
        from zcurve_spark.operators.bbox import box_refine_predicate
        from zcurve_spark.sources.manifest import (
            augment_manifest_stats,
            prune_files,
            prune_files_coords,
        )

        box_ivs = {
            i: decompose_box(tuple(b["mins"]), tuple(b["maxs"]), bits=BITS, budget=64)
            for i, b in enumerate(sel_boxes)
        }
        # footer-only metadata refresh: adds per-file x/y min-max + bytes
        # to an existing manifest without rebuilding the 17 GB layout
        m = augment_manifest_stats(big, ("x", "y"))
        all_ivs = [iv for ivs in box_ivs.values() for iv in ivs]
        pruned_names = prune_files(m, all_ivs)
        coord_names = prune_files_coords(m, sel_boxes, ("x", "y"))
        fbytes = {f["file"]: f["bytes"] for f in m["files"]}
        unsorted_files = [
            n for n in _os.listdir(unsorted) if n.endswith(".parquet")
        ]
        tier_io = {
            "bbox_scan_unsorted": (
                len(unsorted_files),
                sum(_os.path.getsize(_os.path.join(unsorted, n)) for n in unsorted_files),
            ),
            "bbox_fullscan": (len(m["files"]), sum(fbytes.values())),
            "bbox_coordstats": (len(coord_names), sum(fbytes[n] for n in coord_names)),
            "bbox_pruned": (len(pruned_names), sum(fbytes[n] for n in pruned_names)),
        }

        def _refine(df):
            pred = F.lit(False)
            for b in sel_boxes:
                pred = pred | box_refine_predicate(["x", "y"], b["mins"], b["maxs"])
            return df.filter(pred).count()

        tiers = {
            "bbox_scan_unsorted": lambda: _refine(unsorted_pts),
            "bbox_fullscan": lambda: _refine(big_pts),
            "bbox_coordstats": lambda: _refine(
                spark.read.parquet(*[f"{big}/{n}" for n in coord_names])
            ),
            "bbox_pruned": lambda: _refine(
                spark.read.parquet(*[f"{big}/{n}" for n in pruned_names])
            ),
        }
        store_reps = int(os.environ.get("SPARK_GRAFT_STORE_REPS", "4"))
        live = [n for n in tiers if selected is None or n in selected]
        per_rep: dict[str, list[float]] = {n: [] for n in live}
        if warm:
            for n in live:
                counts[n] = tiers[n]()
        for _ in range(store_reps):
            for n in live:
                t0 = time.time()
                counts[n] = tiers[n]()
                per_rep[n].append(round(time.time() - t0, 3))
        storage_tiers = {}
        for n in live:
            rl = sorted(per_rep[n])
            # coordstats is a NEW tier: kept out of the headline total so
            # "value" stays comparable to BASELINE.md's 10-query reference
            if n == "bbox_coordstats":
                extras[n] = rl[0]
            else:
                timings[n] = rl[0]
            nf, nb = tier_io[n]
            storage_tiers[n] = {
                "reps": per_rep[n],
                "best": rl[0],
                "median": rl[len(rl) // 2],
                "files_read": nf,
                "bytes": nb,
                "scan_mb_per_sec": round(nb / 1e6 / rl[0], 1),
                "rows_out": counts[n],
            }
            print(f"  {n}: best {rl[0]}s median {rl[len(rl)//2]}s reps {per_rep[n]} "
                  f"({nf} files, {nb/1e9:.2f} GB)", file=sys.stderr)
        # all tiers answer the same query: row counts must agree
        tier_rows = {counts[n] for n in live}
        assert len(tier_rows) <= 1, f"storage tiers disagree: { {n: counts[n] for n in live} }"
        extra["storage_tiers"] = storage_tiers
        extra["pruned_files_read"] = len(pruned_names)
        extra["coordstats_files_read"] = len(coord_names)
        extra["pruned_files_total"] = len(m["files"])
        extra["store_rows"] = n_points * big_mult

    # --- EXTRAS (r3): set-oriented large-batch paths.  Reported in the
    # "extras" dict so the headline "value" stays comparable to
    # BASELINE.md's 10-query reference total across rounds. ---
    n_big_boxes = int(os.environ.get("SPARK_GRAFT_BIGBOXES", "10000"))
    big_boxes = _boxes(n_big_boxes)

    def bbox_batch_10k():
        # the gentest.awk workload at full size: 10^4 boxes decomposed
        # DISTRIBUTED (mapInPandas — r2 VERDICT missing #3), interval
        # relation too big to broadcast -> shuffle hash join on bucket
        from zcurve_spark.operators.bbox import bucketed_intervals_dist

        bdf = boxes_df(spark, big_boxes)
        bivs, shift = bucketed_intervals_dist(bdf, bits=BITS, budget=16)
        hits = count_hits(
            bdf,
            bbox_join_bucketed(
                pts, bdf, bivs, shift, broadcast_ivs=False, broadcast_boxes=True
            ),
        )
        return hits.agg(F.sum("n_hits")).collect()[0][0]

    run_extra("bbox_batch_10k", bbox_batch_10k)

    n_knn_batch = int(os.environ.get("SPARK_GRAFT_KNN_BATCH", "2000"))

    def knn_batch_2k():
        from zcurve_spark.operators.knn import knn_batch

        qdf = spark.range(n_knn_batch).select(
            F.col("id").alias("qid"),
            ((F.col("id") * 137_777 + 50_000) % DOMAIN).alias("qx"),
            ((F.col("id") * 733_333 + 90_000) % DOMAIN).alias("qy"),
            F.lit(10).alias("k"),
        )
        kw = dict(bits=BITS, domain=DOMAIN, budget=16)
        if store is not None:
            out = knn_batch(qdf, store_path=store, **kw)
        else:
            out = knn_batch(qdf, points=pts, n_points_hint=n_points, **kw)
        return out.count()

    run_extra("knn_batch_2k", knn_batch_2k)

    def knn_geo_2k():
        # geodetic batch kNN (r5): same batch size as knn_batch_2k but
        # over lon/lat with the lat-banded haversine tile join per round
        from zcurve_spark.operators.knn import knn_geo_batch

        geo = pts.select(
            "pid",
            (F.col("x") / F.lit(1000000.0) * F.lit(360.0) - F.lit(180.0)).alias("lon"),
            (F.col("y") / F.lit(1000000.0) * F.lit(180.0) - F.lit(90.0)).alias("lat"),
        )
        qdf = spark.range(n_knn_batch).select(
            F.col("id").alias("qid"),
            (((F.col("id") * 137_777 + 50_000) % DOMAIN) / F.lit(1000000.0) * 360.0 - 180.0).alias("lon"),
            (((F.col("id") * 733_333 + 90_000) % DOMAIN) / F.lit(1000000.0) * 180.0 - 90.0).alias("lat"),
        )
        return knn_geo_batch(qdf, geo, 10, n_points_hint=n_points).count()

    run_extra("knn_geo_2k", knn_geo_2k)

    def snapshot_cycle():
        # snapshot-store ingestion cycle (r5): two append commits + one
        # compaction over the full points table — the Iceberg-commit
        # analog's write-path overhead (footer-stats scan + atomic
        # manifest swings) on top of the raw parquet writes
        import shutil

        from zcurve_spark.sources.snapshots import SnapshotStore

        p = "/tmp/zcurve_stage/bench_snap"
        shutil.rmtree(p, ignore_errors=True)
        st = SnapshotStore(spark, p)
        st.commit(pts.filter(F.col("pid") % 2 == 0), created_unix=1)
        st.commit(pts.filter(F.col("pid") % 2 == 1), created_unix=2)
        return st.compact(created_unix=3)["total_rows"]

    run_extra("snapshot_cycle", snapshot_cycle)

    def distance_join_self():
        # large-large spatial join: 600k x 600k self-join within radius
        # via the grid-bucketed equi-join (neither side broadcast)
        from zcurve_spark.operators.distance import distance_join

        return distance_join(pts, pts, 2000, dedup_pairs=True).count()

    run_extra("distance_join_self", distance_join_self)

    def distance_join_skew():
        # r3 VERDICT #7: deliberately hot-spotted distribution — ~1% of
        # points (6k) packed into ONE tile (radius 2000 -> tile 2048) —
        # to evidence AQE skew-split behavior on the grid-bucketed join.
        # 1%, not more: the hot tile's OUTPUT is inherently quadratic
        # (6k^2/2 ~ 18M intra-tile pairs); the bench measures how the
        # join handles a ~1000x-denser-than-average key, not how fast it
        # can emit a quadratic result set.
        from zcurve_spark.operators.distance import distance_join

        hot = F.col("pid") % 100 == 0
        skew_pts = pts.select(
            "pid",
            F.when(hot, F.col("x") % 2048).otherwise(F.col("x")).alias("x"),
            F.when(hot, F.col("y") % 2048).otherwise(F.col("y")).alias("y"),
        )
        return distance_join(skew_pts, skew_pts, 2000, dedup_pairs=True).count()

    run_extra("distance_join_skew", distance_join_skew)

    # --- kNN (store-backed: per-round candidate reads are file-pruned) ---
    kq = [
        {"qid": i, "qx": (i * 137_777 + 50_000) % DOMAIN, "qy": (i * 733_333 + 90_000) % DOMAIN, "k": 10}
        for i in range(16)
    ]
    if store is not None:
        run("knn", lambda: knn(None, kq, bits=BITS, domain=DOMAIN, store_path=store, spark=spark).count())
    else:
        run("knn", lambda: knn(pts, kq, bits=BITS, domain=DOMAIN, n_points_hint=n_points).count())

    # --- PIP ---
    run("pip", lambda: pip_join(pts, POLYGONS, bits=BITS).count())

    # --- minhash dedup ---
    d = amplify_docs(fan_out(spark.read.parquet(f"{sf_dir}/documents.parquet")), mult)

    def minhash_dedup():
        # nothing in the r5 pipeline persists or caches (the semi-join
        # rework removed the last persist()), so no clearCache here —
        # a global clearCache would evict the spans_in cache that the
        # interleaved tile_assign reps share
        return minhash_lsh_pairs(d, verify_min_jaccard_milli=100).count()

    run("minhash_dedup", minhash_dedup)

    # --- the full production dedup chain (r4 VERDICT #7): LSH pairs ->
    # connected components -> canonical selection, on an amplified corpus
    # read back from parquet (consuming the amplify expression inside the
    # shingling UDF would re-evaluate its tree per element — see
    # bench_scaling.py).  Default 64x (~320k docs) keeps the driver's
    # per-round window bounded; BASELINE.md records the 512x
    # (bench_scaling-input) throughput from a dedicated run.
    dedup_mult = int(os.environ.get("SPARK_GRAFT_DEDUP_MULT", "64"))

    def dedup_pipeline():
        from zcurve_spark.operators.dedup import connected_components

        p = os.path.join("/tmp/zcurve_stage", f"docs_x{dedup_mult}")
        if not os.path.exists(p + "/_SUCCESS"):
            amplify_docs(
                fan_out(spark.read.parquet(f"{sf_dir}/documents.parquet")), dedup_mult
            ).write.mode("overwrite").parquet(p)
        corpus = fan_out(spark.read.parquet(p))
        # plant exact dups (1/50 docs re-delivered under shifted ids) so
        # the components stage has real clusters to resolve
        extra = corpus.filter(F.col("doc_id") % 50 == 0).withColumn(
            "doc_id", F.col("doc_id") + 100_000_000
        )
        pairs = minhash_lsh_pairs(
            corpus.unionByName(extra), verify_min_jaccard_milli=990, verify_semijoin=None
        )
        comp = connected_components(pairs)
        keep = comp.filter(F.col("id") == F.col("component"))
        return keep.count()

    run_extra("dedup_pipeline", dedup_pipeline)

    # --- benchmark decontamination over the same amplified corpus: the
    # held-out slice (1/199 of the BASE docs) is the eval set; the op is
    # one broadcast gram join + one groupBy over the corpus ---
    def decontam():
        from zcurve_spark.operators.dedup import decontaminate

        p = os.path.join("/tmp/zcurve_stage", f"docs_x{dedup_mult}")
        if not os.path.exists(p + "/_SUCCESS"):
            amplify_docs(
                fan_out(spark.read.parquet(f"{sf_dir}/documents.parquet")), dedup_mult
            ).write.mode("overwrite").parquet(p)
        corpus = fan_out(spark.read.parquet(p))
        bench_set = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
            F.col("doc_id") % 199 == 7
        )
        return decontaminate(corpus, bench_set, n=4).count()

    run_extra("decontam", decontam)

    # --- image pHash near-dup over a synthesized image corpus: the one
    # Python stage (Arrow-batched decode+hash through the repo's own
    # codecs) plus the banded hamming join; planted container twins
    # (1/10) give the join real dup structure ---
    n_phash_imgs = int(os.environ.get("SPARK_GRAFT_PHASH_IMGS", "20000"))

    def image_phash_neardup():
        from zcurve_spark.operators.imagehash import (
            phash_neardup_pairs,
            synth_image_table,
        )

        # corpus synthesized ONCE to parquet (like the amplified docs):
        # reps then measure the operator — blob read + decode + hash +
        # banded join — not repeated synthesis.  filter-0 PNGs keep the
        # decode vectorized (the Paeth loop is a known codec cost,
        # measured separately in the oracle gate).
        p = os.path.join("/tmp/zcurve_stage", f"imgs_{n_phash_imgs}")
        if not os.path.exists(p + "/_SUCCESS"):
            ids = fan_out(
                spark.range(0, n_phash_imgs).select(F.col("id").alias("doc_id"))
            )
            synth_image_table(
                ids, twin_mod=10, twin_offset=100_000_000, png_filter=0
            ).write.mode("overwrite").parquet(p)
        # radius 3 -> the Manku multiblock scheme (56 tables of 40-bit
        # keys): the 10^12-image configuration.  Radius 12 divisor
        # banding has 4-bit keys and went candidate-quadratic on this
        # corpus (2.4x10^8 pairs, measured) — that path stays available
        # for moderate corpora and is exercised by the oracle entry.
        imgs = fan_out(spark.read.parquet(p))
        return phash_neardup_pairs(imgs, max_hamming=3).count()

    run_extra("image_phash", image_phash_neardup)

    # --- audio snippet->track matching: fingerprint a synthesized
    # corpus + planted sub-clips, hash equi-join + offset vote ---
    n_tracks = int(os.environ.get("SPARK_GRAFT_AUDIO_TRACKS", "4000"))

    def audio_match_bench():
        from zcurve_spark.operators.audiohash import (
            audio_match_join,
            snippet_table,
            synth_audio_table,
        )

        p = os.path.join("/tmp/zcurve_stage", f"tracks_{n_tracks}")
        if not os.path.exists(p + "/_SUCCESS"):
            ids = fan_out(
                spark.range(0, n_tracks).select(F.col("id").alias("doc_id"))
            )
            synth_audio_table(ids).write.mode("overwrite").parquet(p)
        tracks = fan_out(spark.read.parquet(p))
        snips = snippet_table(tracks, mod=10, offset=100_000_000)
        return audio_match_join(snips, tracks).count()

    run_extra("audio_match", audio_match_bench)

    # --- video clip->video matching: per-frame pHash + banded join ---
    n_videos = int(os.environ.get("SPARK_GRAFT_VIDEOS", "1000"))

    def video_match_bench():
        from zcurve_spark.operators.videohash import (
            synth_video_table,
            video_match_join,
            video_snippet_table,
        )

        p = os.path.join("/tmp/zcurve_stage", f"videos_{n_videos}")
        if not os.path.exists(p + "/_SUCCESS"):
            ids = fan_out(
                spark.range(0, n_videos).select(F.col("id").alias("doc_id"))
            )
            synth_video_table(ids).write.mode("overwrite").parquet(p)
        vids = fan_out(spark.read.parquet(p))
        snips = video_snippet_table(vids, mod=10, offset=100_000_000)
        return video_match_join(snips, vids).count()

    run_extra("video_match", video_match_bench)

    # --- ANN top-k ---
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    if mult > 1:
        rep = F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("rep")
        emb = emb.select("*", rep).select(
            (F.col("vec_id") * mult + F.col("rep")).alias("vec_id"), "embedding", "label"
        )
    run("ann_topk", lambda: ann_topk(fan_out(emb), list(range(8)), 10).count())

    n_ivf_batch = int(os.environ.get("SPARK_GRAFT_IVF_BATCH", "10000"))

    def ivf_batch_10k():
        # r3 VERDICT #8: the shuffle-hash probe-join fallback
        # (broadcast_queries=False) at 10^4 queries — the shape where the
        # probe relation is too big to broadcast.  The sf0.1 table holds
        # only 2k vectors, so the corpus is amplified deterministically
        # (shifted ids, sign-flipped odd replicas so replicas spread
        # across IVF cells) until >= n_ivf_batch query ids exist.
        from zcurve_spark.operators.similarity import ivf_topk_batch

        e = fan_out(emb)
        amp = -(-n_ivf_batch // 1000)  # ceil; 2k vectors -> >= 10k ids
        rep = F.explode(F.sequence(F.lit(0), F.lit(amp - 1))).alias("rep")
        big = e.select("vec_id", "embedding", rep).select(
            (F.col("vec_id") * amp + F.col("rep")).alias("vec_id"),
            F.when(
                F.col("rep") % 2 == 1,
                F.transform("embedding", lambda x: -x),
            ).otherwise(F.col("embedding")).alias("embedding"),
        )
        qdf = big.select(F.col("vec_id").alias("qid")).limit(n_ivf_batch)
        out = ivf_topk_batch(big, qdf, 10, n_cells=32, nprobe=4, broadcast_queries=False)
        return out.count()

    run_extra("ivf_batch_10k", ivf_batch_10k)

    # --- EXECUTION (r4 VERDICT #1): one warm pass over every live row,
    # then `reps` round-robin interleaved passes — the storage tiers'
    # protocol applied to every headline and extras row.  best + median
    # + the full rep array land in the json.
    live_h = [(n, f) for n, f in headline_rows if selected is None or n in selected]
    live_e = [(n, f) for n, f in extras_rows if selected is None or n in selected]
    live = live_h + live_e
    per_rep: dict[str, list[float]] = {n: [] for n, _ in live}
    if warm:
        for n, f in live:
            counts[n] = f()
    for _ in range(reps):
        for n, f in live:
            t0 = time.time()
            counts[n] = f()
            per_rep[n].append(round(time.time() - t0, 3))
    headline_reps: dict[str, dict] = {}
    extras_reps: dict[str, list[float]] = {}
    for n, _ in live:
        rl = sorted(per_rep[n])
        med = rl[len(rl) // 2]
        if any(n == hn for hn, _ in live_h):
            timings[n] = rl[0]
            headline_reps[n] = {"reps": per_rep[n], "best": rl[0], "median": med}
        else:
            extras[n] = rl[0]
            extras_reps[n] = per_rep[n]
        print(
            f"  {n}: best {rl[0]}s median {med}s reps {per_rep[n]} "
            f"({counts[n]} rows)",
            file=sys.stderr,
        )
    n_spans = counts.get("tile_assign", n_spans_in)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "mult": mult,
        "points": n_points,
        "docs": n_docs,
        "spans": n_spans,
    }
    if "tile_assign" in timings:
        out["docs_per_sec"] = round(n_docs / timings["tile_assign"], 1)
        out["spans_per_sec"] = round(n_spans / timings["tile_assign"], 1)
    if "tile_assign_gen" in timings and timings["tile_assign_gen"] > 0:
        out["gen_spans_per_sec"] = round(n_gen / timings["tile_assign_gen"], 1)
    if "bbox_batch" in timings:
        out["boxes_per_sec"] = round(len(boxes) / timings["bbox_batch"], 1)
    if extras:
        out["extras"] = extras
    if extras_reps:
        out["extras_reps"] = extras_reps
    if headline_reps:
        out["headline_reps"] = headline_reps
    if "bbox_batch_10k" in extras:
        out["boxes10k_per_sec"] = round(n_big_boxes / extras["bbox_batch_10k"], 1)
    if "knn_batch_2k" in extras:
        out["knn_queries_per_sec"] = round(n_knn_batch / extras["knn_batch_2k"], 1)
    if "ivf_batch_10k" in extras and extras["ivf_batch_10k"] > 0:
        out["ivf_queries_per_sec"] = round(n_ivf_batch / extras["ivf_batch_10k"], 1)
    if "tile_pyramid_gen" in extras and extras["tile_pyramid_gen"] > 0:
        out["pyr_spans_per_sec"] = round(n_pyr / extras["tile_pyramid_gen"], 1)
    if "s2_assign_gen" in extras and extras["s2_assign_gen"] > 0:
        out["s2_spans_per_sec"] = round(n_s2 / extras["s2_assign_gen"], 1)
    if "dedup_pipeline" in extras and extras["dedup_pipeline"] > 0:
        n_base_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        n_chain_docs = n_base_docs * dedup_mult + (n_base_docs * dedup_mult) // 50
        out["dedup_mult"] = dedup_mult
        out["dedup_chain_docs"] = n_chain_docs
        out["dedup_docs_per_sec"] = round(n_chain_docs / extras["dedup_pipeline"], 1)
    if "decontam" in extras and extras["decontam"] > 0:
        n_base_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        out["decontam_docs_per_sec"] = round(
            n_base_docs * dedup_mult / extras["decontam"], 1
        )
    if "image_phash" in extras and extras["image_phash"] > 0:
        out["phash_imgs"] = n_phash_imgs + n_phash_imgs // 10
        out["phash_imgs_per_sec"] = round(
            (n_phash_imgs + n_phash_imgs // 10) / extras["image_phash"], 1
        )
    if "audio_match" in extras and extras["audio_match"] > 0:
        out["audio_tracks"] = n_tracks
        out["audio_tracks_per_sec"] = round(n_tracks / extras["audio_match"], 1)
    if "video_match" in extras and extras["video_match"] > 0:
        out["video_count"] = n_videos
        out["video_frames_per_sec"] = round(
            n_videos * 24 / extras["video_match"], 1
        )
    if "bbox_pruned" in timings and "bbox_scan_unsorted" in timings and timings["bbox_pruned"] > 0:
        out["layout_speedup"] = round(
            timings["bbox_scan_unsorted"] / timings["bbox_pruned"], 2
        )
    if "bbox_pruned" in timings and "bbox_fullscan" in timings and timings["bbox_pruned"] > 0:
        out["pruned_speedup"] = round(timings["bbox_fullscan"] / timings["bbox_pruned"], 2)
    out.update(extra)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
